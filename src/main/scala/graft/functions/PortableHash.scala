package graft.functions

/** The engine's PORTABLE (cross-engine-replayable) hash family, shared by
  * the MinHash chain, the Count-Min sketch, and their generated oracle
  * SQL: base hash H = first 8 hex chars of md5 as a 32-bit value, then
  * affine derivations h_i = (a_i·H + b_i) mod p with p = 2³¹−1 (the
  * Carter–Wegman universal family over one strong hash). a_i·H < 2⁶³
  * stays exact in signed 64-bit on the JVM, in Spark SQL, and in DuckDB,
  * so every derived value is bit-reproducible in oracle SQL.
  */
object PortableHash {

  val prime: Long = 2147483647L

  /** Column form of the base hash: first `hexChars` hex chars of md5 as
    * an unsigned long, via the fused codegen'd
    * [[Md5Prefix64]] expression — value-identical to
    * `conv(substring(md5(c), 1, hexChars), 16, 10).cast("long")` (the
    * spelling every generated oracle keeps), minus the string
    * round-trip. */
  def md5Prefix(c: org.apache.spark.sql.Column,
      hexChars: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftshim.Shims.column(
      Md5Prefix64(
        org.apache.spark.sql.graftshim.Shims.expression(c), hexChars))

  /** Deterministic (a_i, b_i) coefficient table for `k` derived hashes.
    * The SAME table must be embedded in any oracle SQL replaying the
    * chain — generate it from here, never hand-copy. */
  def coefficients(k: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(k)(
      (1L + rng.nextInt((prime - 1).toInt).toLong,
        rng.nextInt(prime.toInt).toLong))
  }

  /** JVM-side base hash of raw UTF-8 bytes: first 8 hex chars of md5 —
    * bit-identical to SQL `conv(substring(md5(col), 1, 8), 16, 10)` /
    * DuckDB `('0x' || substr(md5(col), 1, 8))::BIGINT`. */
  def hash32(utf8Bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(utf8Bytes)
    // first 8 hex chars = first 4 bytes, big-endian, unsigned
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}
