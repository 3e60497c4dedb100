package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Hashed-feature linear model scoring — the fastText-style quality
  * classifier pass of LLM data pipelines (CCNet's fastText LM filter,
  * GPT-3's WebText-vs-CommonCrawl LR classifier, Llama's "looks like a
  * Wikipedia reference" gate). Training happens offline on a sample;
  * what must run at 100 TB is INFERENCE over every document, and that is
  * a pure map: hash each token into one of `dim` buckets (the hashing
  * trick — no vocabulary dictionary to build, ship, or join), fold the
  * bucket weights, squash. No shuffle, no broadcast join, no UDF; the
  * whole scorer is a codegen'd expression tree over built-ins, and the
  * weight vector rides along as ONE array literal in the task binary
  * (`typedlit`, an `UnsafeArrayData` constant — NOT a per-element
  * CreateArray, so codegen size stays flat at any dim).
  *
  * Portability: the bucket hash is the md5-prefix family used by the
  * portable dedup chains (Dedup.scala:346) so a scored corpus replays
  * bit-for-bit in DuckDB/anything with md5 — and the xxhash64 arm is the
  * cheap non-portable variant for production runs.
  */
object Scoring {

  /** Portable feature bucket in [0, dim): first 8 md5 hex chars → int →
    * mod. Oracle: (('0x' || substr(md5(t), 1, 8))::BIGINT) % dim. */
  def bucketPortable(token: Column, dim: Int): Column =
    pmod(graft.functions.PortableHash.md5Prefix(token.cast("string"), 8),
      lit(dim))

  /** Production bucket: xxhash64, one hash per token, no hex detour. */
  def bucketFast(token: Column, dim: Int): Column =
    pmod(xxhash64(token), lit(dim))

  /** Per-token bucket weights folded left in token order (sequential
    * fold — replays exactly as DuckDB's list_sum over the same
    * list_transform; a tree reduction would not). */
  private def foldWeights(
      toks: Column, weights: Array[Double], dim: Int,
      portable: Boolean): Column = {
    require(weights.length == dim,
      s"weights.length ${weights.length} != dim $dim")
    val w = typedlit(weights)
    aggregate(
      transform(toks, t => element_at(w,
        (if (portable) bucketPortable(t, dim)
         else bucketFast(t, dim)).cast("int") + 1)),
      lit(0.0), (acc, x) => acc + x)
  }

  /** Raw linear logit: bias + Σ_tokens w[bucket(token)] / (meanPool ?
    * token_count : 1). Mean pooling makes the score length-invariant
    * (fastText's default); sum pooling keeps evidence accumulation. */
  def logit(
      text: Column, weights: Array[Double], bias: Double,
      meanPool: Boolean = true, portable: Boolean = false): Column = {
    val toks = TextFunctions.tokens(text)
    val s = foldWeights(toks, weights, weights.length, portable)
    val pooled =
      if (meanPool) s / greatest(size(toks), lit(1)).cast("double") else s
    pooled + lit(bias)
  }

  /** Classifier probability: sigmoid of [[logit]], in (0, 1). */
  def score(
      text: Column, weights: Array[Double], bias: Double,
      meanPool: Boolean = true, portable: Boolean = false): Column =
    lit(1.0) / (lit(1.0) + exp(-logit(text, weights, bias, meanPool,
      portable)))

  /** Deterministic dyadic demo weights for specs/queries: values are
    * small multiples of 1/64, EXACT in both binary doubles and their
    * decimal rendering — so a SQL literal of the printed weight parses
    * back to the identical double and the fold replays bit-for-bit. */
  def dyadicWeights(dim: Int): Array[Double] =
    Array.tabulate(dim)(i => ((i * 37 + 11) % 41 - 20) / 64.0)
}
