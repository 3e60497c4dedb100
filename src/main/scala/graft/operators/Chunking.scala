package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Context-window chunking: split each document into fixed-size token
  * windows with overlap — the standard pre-training/RAG preparation step
  * (HuggingFace `return_overflowing_tokens` semantics: chunk i covers
  * tokens [i·stride, i·stride + size), last chunk may run short).
  *
  * Pure per-row explode — no shuffle at all: a chunking pass over 100 TB
  * is a map-only job whose output partitioning follows the input.
  */
object Chunking {

  /** One row per (doc, chunk): `chunk_id` (0-based), `n_chunk_tokens`,
    * `chunk_text` (tokens re-joined with single spaces). Documents with
    * no tokens yield no rows. Chunk count = ceil(n / stride), i.e. starts
    * at every stride boundary below n. `stride < chunkSize` overlaps
    * (context continuity); `stride > chunkSize` skips tokens between
    * chunks (sampling) — both are legal, pick per use case. */
  def chunkTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int): DataFrame = {
    require(chunkSize >= 1 && stride >= 1,
      s"chunkSize/stride must be >= 1, got $chunkSize/$stride")
    val toks = df.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__tk"))
    // sequence(0, -1) counts DOWN, so empty docs need the guard
    val chunks = toks
      .filter(size(col("__tk")) > 0)
      .select(col(idCol),
        col("__tk"),
        explode(sequence(lit(0),
          ceil(size(col("__tk")).cast("double") / stride).cast("int") - 1))
          .as("chunk_id"))
    chunks.select(
      col(idCol),
      col("chunk_id"),
      size(slice(col("__tk"), col("chunk_id") * stride + 1, lit(chunkSize)))
        .as("n_chunk_tokens"),
      concat_ws(" ",
        slice(col("__tk"), col("chunk_id") * stride + 1, lit(chunkSize)))
        .as("chunk_text"))
  }
}
