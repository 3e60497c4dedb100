package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.schema.Flashscore

/** The three Flashscore transforms, re-expressed as pure
  * `DataFrame => DataFrame` column-expression pipelines (no UDFs — every
  * per-row Python lambda in the reference maps to a higher-order function,
  * SURVEY.md §2.3).
  *
  * Key-sharing design: the reference aligns the lineup/odds outputs to the
  * fact rows *by position* (`zip(inserted_ids, ...)`, reference
  * dags/utils.py:300,339). Here the surrogate key is generated ONCE
  * (`withMatchKey`) before the three branches fork, so all outputs share it
  * and alignment is a real equi-join key — order-independent (SURVEY.md
  * §2.3 N7).
  */
object FlashscoreTransforms {

  /** Equality predicate on match status (utils.py:83,152,176). */
  def finished(df: DataFrame): DataFrame =
    df.filter(col("current_status") === "Finished")

  /** Natural-key columns used for the deterministic surrogate key. */
  private val naturalKey: Seq[String] = Seq(
    "year", "month", "day", "hour", "minute",
    "current_country", "current_tournament",
    "participant_home", "participant_away")

  /** Surrogate key per match (utils.py:107 generates a UUIDv4 per row).
    * `deterministic = true` swaps in a sha2 of the natural key so outputs
    * are hash-comparable (SURVEY.md §7.4); production keeps `uuid()`. */
  def withMatchKey(df: DataFrame, deterministic: Boolean = false): DataFrame = {
    val key =
      if (deterministic)
        sha2(concat_ws("|", naturalKey.map(col): _*), 256)
      else expr("uuid()")
    df.withColumn("ID_MATCH", key)
  }

  /** Fact transform (`transform_pandas`, utils.py:78-146): keep-list
    * projection → any-null row drop → numeric coercion of the scores →
    * ordered rename. Operation ORDER is semantic: `dropna` runs BEFORE
    * coercion (utils.py:101 then 104-105), so a row whose score merely
    * fails to parse survives with a null score, while a row with a missing
    * field is dropped (SURVEY.md §1.4).
    *
    * @param loadTs DATE_LOAD value; `current_timestamp()` mirrors the
    *   server-side CURRENT_TIMESTAMP (utils.py:208); tests pass a literal.
    */
  def matchFacts(
      keyed: DataFrame,
      loadTs: Column = current_timestamp()): DataFrame = {
    val kept = keyed.select(
      (("ID_MATCH" +: Flashscore.factKeepColumns).map(col)): _*)
    val dropped = kept.na.drop("any", Flashscore.factKeepColumns)
    val coerced = dropped
      .withColumn("participant_home_current_score",
        expr("try_cast(participant_home_current_score AS int)"))
      .withColumn("participant_away_current_score",
        expr("try_cast(participant_away_current_score AS int)"))
    val renamed = coerced.select(
      col("ID_MATCH") +:
      loadTs.as("DATE_LOAD") +:
      Flashscore.factColumns.drop(2).map { out =>
        val in = Flashscore.factRenames.collectFirst {
          case (k, v) if v == out => k
        }.get
        col(in).as(out)
      }: _*)
    renamed
  }

  sealed trait Side { def teamField: String }
  case object Home extends Side { val teamField = "Team1" }
  case object Away extends Side { val teamField = "Team2" }

  /** Lineup transform (`transform_home_starting_lineup`, utils.py:148-171 +
    * `load_player`, utils.py:312-348): extract the 11 player names for one
    * team, guard `len == 11` else an all-null row (utils.py:164-165), widen
    * positionally to NAME_PLAYER_1..11 (utils.py:324-337), and skip
    * all-null teams (`if tp != [None]*11`, utils.py:341). */
  def startingLineup(keyed: DataFrame, side: Side): DataFrame = {
    // Field extraction distributes over the array: array<struct<name>> →
    // array<string> — the Spark-native form of the per-element
    // `json_list_val["name"]` loop (utils.py:161-162).
    val names = col(s"lineups_data.${side.teamField}.name")
    val guarded = when(size(names) === 11, names)
      .otherwise(array_repeat(lit(null).cast("string"), 11))
    val wide = keyed.select(
      col("ID_MATCH") +:
      (0 until 11).map(i => guarded(i).as(s"NAME_PLAYER_${i + 1}")): _*)
    wide.filter(
      coalesce((1 to 11).map(i => col(s"NAME_PLAYER_$i")): _*).isNotNull)
  }

  /** Odds transform (`get_odd_value`/`process_row_odd`/`transform_odds`,
    * utils.py:226-250): for each of the 8 hard-coded bookmakers, a keyed
    * lookup in the array of structs; malformed entries (`len(odds) != 3`)
    * or missing bookmakers yield 3 nulls (utils.py:231-235); the static
    * 8-way pivot is 24 select expressions (SURVEY.md §2.3 N6). */
  def odds(keyed: DataFrame): DataFrame = {
    val cols = Flashscore.bookmakers.flatMap { case (name, prefix) =>
      // try_element_at: a missing bookmaker yields null (not an ANSI
      // error); try-cast mirrors the null-on-bad-value upgrade over the
      // reference's crash-on-`float()` (utils.py:234).
      val entry = try_element_at(
        filter(col("bookmakers_data"),
          (b: Column) => b.getField("bookmaker") === lit(name)), lit(1))
      val os = entry.getField("odds")
      val wellFormed = size(os) === 3
      Seq("HOME" -> 1, "NIL" -> 2, "AWAY" -> 3).map { case (o, i) =>
        when(wellFormed,
          org.apache.spark.sql.graftshim.Shims.tryCast(
            try_element_at(os, lit(i)),
            org.apache.spark.sql.types.DoubleType))
          .as(s"${prefix}_${o}_ODD")
      }
    }
    keyed.select(col("ID_MATCH") +: cols: _*)
  }
}
