package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shims

/** Embedding-vector column functions (`array<float>` columns).
  *
  * Two tiers:
  *  - built-in compositions (`zip_with` + `aggregate`) — SQL-expressible,
  *    used where oracle parity matters;
  *  - a native codegen'd Catalyst expression ([[CosineSimilarity]]) for the
  *    hot ANN path (one fused loop, no per-element Catalyst eval).
  */
object VectorFunctions {

  /** Dot product in double precision, sequential left-fold — the same
    * accumulation order DuckDB's list functions use, so results are
    * bit-identical for the oracle. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity via built-ins: dot / (|a| * |b|). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine similarity via the native fused-loop expression (codegen). */
  def cosineFast(a: Column, b: Column): Column =
    Shims.column(CosineSimilarity(Shims.expression(a), Shims.expression(b)))

  /** Squared L2 distance via the native fused-loop expression (codegen). */
  def distSqFast(a: Column, b: Column): Column =
    Shims.column(EuclideanDistSq(Shims.expression(a), Shims.expression(b)))

  /** 64-bit SimHash of a token-array column (near-dup sketch). */
  def simhash(tokens: Column): Column =
    Shims.column(SimHash64(Shims.expression(tokens)))

  /** Literal `array<float>` column from a query vector. */
  def floatVec(v: Seq[Float]): Column =
    array(v.map(x => lit(x)): _*).cast("array<float>")

  /** Hamming distance between two 64-bit sketches. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Symmetric int8 quantization scale: max|x| / 127 (1.0 for an all-zero
    * vector so quantization stays total). Double precision. */
  def int8Scale(a: Column): Column = {
    val maxabs = array_max(transform(a, x => abs(x))).cast("double")
    when(maxabs === 0.0, lit(1.0)).otherwise(maxabs / lit(127.0))
  }

  /** Int8-quantized vector: floor(x/scale + 0.5) per element. The explicit
    * floor form pins the rounding rule (half-up toward +inf) so any IEEE
    * engine reproduces it bit-for-bit — `round()` is half-away-from-zero
    * in some engines and half-even in others. */
  def quantizeInt8(a: Column, scale: Column): Column =
    transform(a, x => floor(x.cast("double") / scale + lit(0.5)))

  /** Max abs reconstruction error |dequant(quant(x)) - x| over the vector:
    * the per-vector quality bound a 100 TB compression pass would gate on. */
  def dequantMaxErr(a: Column, scale: Column): Column =
    array_max(transform(a, x =>
      abs(floor(x.cast("double") / scale + lit(0.5)).cast("double") * scale -
        x.cast("double"))))
}
