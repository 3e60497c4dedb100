package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Keyed merge (upsert) for snapshot sinks.
  *
  * The reference's load path blindly INSERTs, so a retried file produces
  * duplicate fact rows (SURVEY.md §3 E1). With deterministic keys the
  * idempotent formulation is a merge: updated keys replace, new keys
  * append, untouched rows pass through — one anti-join + union, both
  * shuffle-on-key shapes that scale.
  */
object Upsert {

  /** New snapshot = updates ∪ (existing minus keys present in updates). */
  def mergeByKey(
      existing: DataFrame, updates: DataFrame,
      keys: Seq[String]): DataFrame = {
    val untouched = existing.join(
      updates.select(keys.map(col): _*).distinct(), keys, "left_anti")
    updates.unionByName(untouched)
  }

  /** Idempotence check used by tests/pipelines: merging the same updates
    * twice equals merging once. */
  def isIdempotent(
      existing: DataFrame, updates: DataFrame, keys: Seq[String]): Boolean = {
    val once = mergeByKey(existing, updates, keys)
    val twice = mergeByKey(once, updates, keys)
    twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty
  }
}
