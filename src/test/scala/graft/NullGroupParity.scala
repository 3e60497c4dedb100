package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Durable form of the round-17 null-join sweep (VERDICT r17 #4): a
  * reusable fixture generator + parity assert for the hazard class
  * where a groupBy forms a NULL group (label / source / site) and a
  * later null-rejecting join silently drops or zeroes it — the shape
  * behind all three round-17 answer bugs (balanceClasses' window arm
  * dropped the null-label class, Drift.psiSeries emitted an all-zero
  * row for a null monitoring group, Boilerplate passed null-group docs
  * through unscrubbed).
  *
  * Contract: a null group is a group like any other. The helper clones
  * one NAMED group's rows with the group column nulled (ids optionally
  * shifted to stay corpus-unique), runs the operator over the combined
  * frame, and asserts the null group's output signature is IDENTICAL
  * to the named twin's. Any divergence is a null-key provenance bug:
  * dropped rows, zeroed aggregates, or unjoined defaults.
  *
  * Choosing `sig`: project exactly what the operator guarantees equal
  * between twins. Deterministic per-row outputs (Boilerplate's
  * text_clean) support full row multisets; order-by-hash samplers
  * (balanceClasses with SHIFTED twin ids) only guarantee per-group
  * counts; with idCol = None the twin keeps the SAME ids, so even
  * hash-ordered samplers guarantee the full kept-id set.
  */
object NullGroupParity {

  /** base ∪ a null-group twin of the rows whose `groupCol` equals
    * `twinValue`: the twin's group is nulled and, when `idCol` is
    * given, its ids are shifted by `idShift` so they stay unique
    * (required when the operator keys any join/groupBy on the id
    * ALONE — e.g. a per-document rebuild). With `idCol = None` the
    * twin keeps identical ids, which makes hash-of-id orderings agree
    * between the twins. */
  def withNullTwin(
      base: DataFrame, groupCol: String, twinValue: Any,
      idCol: Option[String] = None,
      idShift: Long = 1000000L): DataFrame = {
    val named = base.filter(col(groupCol) === lit(twinValue))
    val nulled = named.withColumn(groupCol,
      lit(null).cast(base.schema(groupCol).dataType))
    val twin = idCol.fold(nulled)(c =>
      nulled.withColumn(c, col(c) + lit(idShift)))
    base.unionByName(twin)
  }

  /** Run `op` over base ∪ null-twin and assert the null group's
    * output signature equals the named twin's. `sig` projects one
    * group's output rows (group column still present) to comparable
    * strings; both sides are sorted before the multiset compare.
    * `resultGroupCol` defaults to `groupCol` (set it when the
    * operator renames the group column on output). */
  def assertParity(
      base: DataFrame, groupCol: String, twinValue: Any,
      op: DataFrame => DataFrame,
      sig: DataFrame => Seq[String],
      resultGroupCol: Option[String] = None,
      idCol: Option[String] = None,
      idShift: Long = 1000000L): Unit = {
    val out = op(withNullTwin(base, groupCol, twinValue, idCol, idShift))
    val g = resultGroupCol.getOrElse(groupCol)
    val named = sig(out.filter(col(g) === lit(twinValue))).sorted
    val nulled = sig(out.filter(col(g).isNull)).sorted
    if (named.isEmpty)
      throw new AssertionError(
        s"null-twin parity: named group $twinValue produced NO output " +
          "rows — the fixture or sig is wrong, the parity check never " +
          "engaged")
    if (named != nulled)
      throw new AssertionError(
        "null-group parity violated (a null group must behave exactly " +
          s"like its named twin $twinValue):\n  named: " +
          named.mkString(" | ") + "\n  null:  " + nulled.mkString(" | "))
  }
}
