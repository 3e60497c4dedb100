package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet/C4-style line-level boilerplate removal: a line that repeats
  * across a large fraction of one source's documents (site headers,
  * cookie banners, copyright footers, nav text) is template noise, not
  * content — drop the LINE, keep the document. This is the standard
  * within-domain sibling of document-level dedup (Wenzek et al. 2020,
  * "CCNet"; Raffel et al. 2020, "C4" §2.2 line filters).
  *
  * Scale shape:
  *   - line explode is map-side (posexplode of a split — no shuffle);
  *   - line frequencies are one (group, line)-keyed partial-agg shuffle
  *     (map-side combine collapses each partition's repeats first);
  *   - the boilerplate line set — lines above threshold — is tiny
  *     relative to the corpus (templates, by definition, repeat), and
  *     removal is a LEFT ANTI join on (group, line), never a collect;
  *   - document rebuild is one groupBy(doc) of the kept lines with an
  *     order-restoring sort_array over (pos, line) structs.
  * Three shuffles ∝ line count, zero driver-side data. Skewed template
  * lines (one line in millions of docs) collapse map-side in the count
  * and sit on the SMALL side of the anti join, so no salting is needed.
  *
  * Reference behavior reproduced: the reference pipeline drops
  * whole-document duplicates only (`dags/utils.py:303` drop_duplicates);
  * line-level removal is the standard strengthening for web corpora.
  */
object Boilerplate {

  /** Per-(group, line) distinct-document frequencies, with the group's
    * document total carried alongside — the audit view. A NULL group
    * is a group like any other (docs with no site/domain can still
    * share boilerplate among themselves): the groupBys already form
    * it, and the totals join back NULL-SAFELY so its rows don't
    * silently vanish from the audit (round-17 null-join sweep). Rows
    * with a NULL id are excluded up front: countDistinct already
    * ignores them (their lines would count toward nothing), and the
    * per-doc rebuild in [[removeBoilerplate]] cannot re-associate
    * them — the same null-id contract as the samplers. */
  /** Non-null surrogate of the group value (the tieExpr "v"-prefix
    * recipe: null → "", v → "v" + string form — collision-free for
    * the string/integral group keys this operator sees). Joining on
    * it IS null-safe group equality while keeping the plain
    * broadcastable hash-equi-join: a raw `<=>` condition here demoted
    * the anti join below to SortMergeJoin and shuffled the whole
    * corpus-lines explode (PlanAudit receipt: +2 exchanges, +40 %
    * shuffled rows on q139). */
  private def gkey(groupCol: String): Column =
    coalesce(concat(lit("v"), col(groupCol).cast("string")), lit(""))

  def lineFrequencies(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String): DataFrame = {
    val withId = docs.filter(col(idCol).isNotNull)
    val lines = withId.select(col(idCol), col(groupCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val grpTotals = withId.groupBy(gkey(groupCol).as("__gkey"))
      .agg(countDistinct(col(idCol)).as("n_docs_in_group"))
    lines.groupBy(col(groupCol), col("line"))
      .agg(countDistinct(col(idCol)).as("n_docs_with_line"))
      .withColumn("__gkey", gkey(groupCol))
      .join(grpTotals, Seq("__gkey"))
      .drop("__gkey")
      .select(col(groupCol), col("line"), col("n_docs_with_line"),
        col("n_docs_in_group"))
  }

  /** Remove boilerplate lines: a line is boilerplate within its group
    * when it appears in ≥ `minDocs` documents AND in ≥ `minFrac` of the
    * group's documents. Returns one row per input document:
    * (idCol, groupCol, text_clean, n_lines, n_kept) — text_clean is the
    * original line order with boilerplate lines deleted (empty string
    * when every line was boilerplate). Null-group docs are a real
    * group (scrubbed among themselves, null-safe joins throughout);
    * null-ID rows are excluded like in [[lineFrequencies]] — the
    * per-doc rebuild cannot re-associate them, and the old left join
    * silently emitted them as empty text_clean. */
  def removeBoilerplate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      minDocs: Int = 2,
      minFrac: Double = 0.5): DataFrame = {
    val withId = docs.filter(col(idCol).isNotNull)
    val lines = withId.select(col(idCol), col(groupCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))

    val boilerplate = lineFrequencies(docs, idCol, textCol, groupCol)
      .filter(col("n_docs_with_line") >= minDocs &&
        col("n_docs_with_line") >= lit(minFrac) * col("n_docs_in_group"))
      .select(gkey(groupCol).as("__gkey"), col("line"))

    // anti join on the NON-NULL group surrogate (a null group's
    // boilerplate must still be stripped — the plain group-column
    // anti-join never matched null and passed those docs through
    // unscrubbed); `line` itself is never null (split() yields
    // non-null elements), and the template side stays tiny so the
    // planner keeps the broadcast anti join
    val kept = lines.withColumn("__gkey", gkey(groupCol))
      .join(boilerplate, Seq("__gkey", "line"), "left_anti")
      .drop("__gkey")

    val rebuilt = kept.groupBy(col(idCol))
      .agg(
        sort_array(collect_list(struct(col("pos"), col("line"))))
          .as("ordered"),
        count(lit(1)).as("n_kept"))
      .select(col(idCol),
        array_join(transform(col("ordered"), _.getField("line")), "\n")
          .as("text_clean"),
        col("n_kept"))

    withId.select(col(idCol), col(groupCol),
        size(split(col(textCol), "\n")).cast("long").as("n_lines"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col(groupCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }
}
