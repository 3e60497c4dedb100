package graft

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import graft.schema.Flashscore
import graft.transform.FlashscoreTransforms
import graft.transform.FlashscoreTransforms.{Away, Home}

/** Golden-output tests for the three Flashscore transforms, covering every
  * edge case the reference encodes (FIXTURES.md §A). */
class FlashscoreTransformSpec extends SparkTestBase {

  private def lineupJson(prefix: String, n: Int): String =
    (1 to n).map(i => s"""{"name":"$prefix$i"}""").mkString("[", ",", "]")

  private def bkJson(name: String, odds: Seq[String]): String =
    s"""{"bookmaker":"$name","odds":${odds.map("\"" + _ + "\"").mkString("[", ",", "]")}}"""

  private val fullBooks: String =
    Flashscore.bookmakers.zipWithIndex.map { case ((name, _), i) =>
      bkJson(name, Seq(s"1.$i", s"3.$i", s"5.$i"))
    }.mkString("[", ",", "]")

  private def rec(
      status: String = "\"Finished\"",
      country: String = "\"France\"",
      home: String = "H",
      homeScore: String = "\"3\"",
      team1: Int = 11,
      team2: Int = 11,
      books: String = fullBooks): String =
    s"""{"current_status":$status,"current_country":$country,
       |"current_tournament":"T1","participant_home":"$home",
       |"participant_away":"A_$home",
       |"participant_home_current_score":$homeScore,
       |"participant_away_current_score":"1",
       |"year":2023,"month":11,"day":4,"hour":18,"minute":30,
       |"match_hour":"18:30",
       |"lineups_data":{"Team1":${lineupJson(home + "p", team1)},
       |  "Team2":${lineupJson(home + "q", team2)}},
       |"bookmakers_data":$books}""".stripMargin.replace("\n", " ")

  private val fixture: Seq[String] = Seq(
    rec(home = "H1"), // happy path
    rec(home = "H2", status = "\"Scheduled\""), // filtered (P1)
    rec(home = "H3", country = "null"), // dropped by dropna (P4)
    rec(home = "H4", homeScore = "\"abandoned\""), // kept, null score (P5)
    rec(home = "H5", team1 = 10), // home lineup skipped (N3/S6)
    rec(home = "H6", books = // bet365 missing, bwin 2 odds (N5)
      Flashscore.bookmakers.collect {
        case (name, _) if name == "bwin.fr" => bkJson(name, Seq("1.1", "2.2"))
        case (name, _) if name != "bet365" => bkJson(name, Seq("1.0", "2.0", "3.0"))
      }.mkString("[", ",", "]")))

  private lazy val raw: DataFrame =
    spark.read.schema(Flashscore.inputSchema)
      .json(spark.createDataset(fixture)(Encoders.STRING))

  private lazy val keyed: DataFrame =
    FlashscoreTransforms.withMatchKey(
      FlashscoreTransforms.finished(raw), deterministic = true).cache()

  test("matchFacts: filter, dropna-before-coercion, rename, order") {
    val facts = FlashscoreTransforms.matchFacts(keyed,
      loadTs = to_timestamp(lit("2023-11-04 19:00:00")))
    assert(facts.columns.toSeq == Flashscore.factColumns)
    val rows = facts
      .select("NAME_TEAM_HOME", "SCORE_TEAM_HOME", "SCORE_TEAM_AWAY")
      .collect().map(r => (r.getString(0),
        Option(r.get(1)), Option(r.get(2)))).toSet
    // H2 excluded (not Finished), H3 dropped (null country);
    // H4 kept with null home score (coercion AFTER dropna)
    assert(rows == Set(
      ("H1", Some(3), Some(1)),
      ("H4", None, Some(1)),
      ("H5", Some(3), Some(1)),
      ("H6", Some(3), Some(1))))
    val keys = facts.select("ID_MATCH").collect().map(_.getString(0))
    assert(keys.forall(_ != null) && keys.distinct.length == keys.length)
  }

  test("startingLineup: 11-wide positional unnest, !=11 team skipped") {
    val homeRows = FlashscoreTransforms.startingLineup(keyed, Home)
    assert(homeRows.columns.toSeq == Flashscore.lineupColumns)
    val byFirst = homeRows.collect()
      .map(r => r.getString(1) -> (2 to 11).map(r.getString)).toMap
    // H2 not Finished; H5's Team1 has 10 players -> skipped.
    // H3 (null country) IS present: the reference's lineup transform
    // never runs dropna (utils.py:152-156).
    assert(byFirst.keySet == Set("H1p1", "H3p1", "H4p1", "H6p1"))
    assert(byFirst("H1p1") == (2 to 11).map(i => s"H1p$i"))
    val awayFirst = FlashscoreTransforms.startingLineup(keyed, Away)
      .collect().map(_.getString(1)).toSet
    assert(awayFirst == Set("H1q1", "H3q1", "H4q1", "H5q1", "H6q1"))
  }

  test("odds: static 24-col pivot; missing/malformed bookmaker -> nulls") {
    val odds = FlashscoreTransforms.odds(keyed)
    assert(odds.columns.toSeq == Flashscore.oddsColumns)
    val fact = FlashscoreTransforms.matchFacts(keyed)
      .select(col("ID_MATCH"), col("NAME_TEAM_HOME"))
    val joined = odds.join(fact, "ID_MATCH")
    val h6 = joined.filter(col("NAME_TEAM_HOME") === "H6").head()
    assert(h6.isNullAt(h6.fieldIndex("BET365_HOME_ODD"))) // missing
    assert(h6.isNullAt(h6.fieldIndex("BWIN_NIL_ODD"))) // len(odds)=2
    assert(h6.getDouble(h6.fieldIndex("BETCLIC_HOME_ODD")) == 1.0)
    val h1 = joined.filter(col("NAME_TEAM_HOME") === "H1").head()
    // bookmaker i -> odds 1.i / 3.i / 5.i
    assert(h1.getDouble(h1.fieldIndex("BETCLIC_HOME_ODD")) == 1.0)
    assert(h1.getDouble(h1.fieldIndex("ONEBET_AWAY_ODD")) == 5.7)
  }

  test("deterministic key is stable across the three branches") {
    val factIds = FlashscoreTransforms.matchFacts(keyed)
      .select("ID_MATCH").collect().map(_.getString(0)).toSet
    val oddsIds = FlashscoreTransforms.odds(keyed)
      .select("ID_MATCH").collect().map(_.getString(0)).toSet
    // every fact row has a matching odds row via the shared key (N7 fix)
    assert(factIds.subsetOf(oddsIds))
  }

  test("record with no lineups_data: fact kept, lineup rows skipped") {
    val noLineup =
      """{"current_status":"Finished","current_country":"ES",
        |"current_tournament":"T1","participant_home":"NL",
        |"participant_away":"A_NL","participant_home_current_score":"1",
        |"participant_away_current_score":"0","year":2023,"month":1,
        |"day":1,"hour":12,"minute":0,"match_hour":"12:00",
        |"bookmakers_data":[]}""".stripMargin.replace("\n", " ")
    val raw2 = spark.read.schema(Flashscore.inputSchema)
      .json(spark.createDataset(Seq(noLineup))(Encoders.STRING))
    val keyed2 = FlashscoreTransforms.withMatchKey(
      FlashscoreTransforms.finished(raw2), deterministic = true)
    assert(FlashscoreTransforms.matchFacts(keyed2).count() == 1)
    assert(FlashscoreTransforms.startingLineup(keyed2, Home).count() == 0)
    assert(FlashscoreTransforms.startingLineup(keyed2, Away).count() == 0)
    // odds row still produced, all 24 odds null (empty bookmakers array)
    val o = FlashscoreTransforms.odds(keyed2)
    assert(o.count() == 1)
    val row = o.head()
    assert((1 until 25).forall(row.isNullAt))
  }

  test("malformed JSON records survive as null rows (PERMISSIVE)") {
    // the reference crashes on a bad record (json.loads); the engine's
    // pinned-schema PERMISSIVE read nulls it and the status filter drops it
    val mixed = Seq(rec(home = "OK1"), "{definitely not json",
      rec(home = "OK2"))
    val raw = spark.read.schema(Flashscore.inputSchema)
      .json(spark.createDataset(mixed)(Encoders.STRING))
    assert(raw.count() == 3)
    val keyed = FlashscoreTransforms.withMatchKey(
      FlashscoreTransforms.finished(raw), deterministic = true)
    val homes = FlashscoreTransforms.matchFacts(keyed)
      .select("NAME_TEAM_HOME").collect().map(_.getString(0)).toSet
    assert(homes == Set("OK1", "OK2"))
  }

  test("production key mode generates UUIDs") {
    val prod = FlashscoreTransforms.withMatchKey(
      FlashscoreTransforms.finished(raw), deterministic = false)
    val ids = prod.select("ID_MATCH").collect().map(_.getString(0))
    assert(ids.forall(_.matches(
      "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}")))
  }
}
