package graft.schema

import org.apache.spark.sql.types._

/** Explicit schemas for the Flashscore match-record pipeline.
  *
  * The reference infers schema per micro-batch (`pd.read_json`,
  * reference dags/utils.py:81); we pin it (SURVEY.md §1.2/§1.4) so JSON
  * parsing is one pass, nested pruning works, and drift is impossible.
  */
object Flashscore {

  /** Input record: one JSON file = array of these (utils.py:81). */
  val inputSchema: StructType = StructType(Seq(
    StructField("current_status", StringType), // filter == "Finished" (utils.py:83)
    StructField("current_country", StringType), // utils.py:86
    StructField("current_tournament", StringType), // utils.py:87
    StructField("participant_home", StringType), // utils.py:88
    StructField("participant_away", StringType), // utils.py:89
    // numeric-as-string; coerced with try_cast (utils.py:104-105)
    StructField("participant_home_current_score", StringType),
    StructField("participant_away_current_score", StringType),
    StructField("year", IntegerType), // utils.py:92-96
    StructField("month", IntegerType),
    StructField("day", IntegerType),
    StructField("hour", IntegerType),
    StructField("minute", IntegerType),
    StructField("match_hour", StringType), // dropped (etl_functions.py:133)
    StructField("lineups_data", StructType(Seq( // utils.py:158-162
      StructField("Team1", ArrayType(playerType)),
      StructField("Team2", ArrayType(playerType)))),
    ),
    StructField("bookmakers_data", ArrayType(StructType(Seq( // utils.py:226-235
      StructField("bookmaker", StringType),
      StructField("odds", ArrayType(StringType)))))) // len 3, float-parseable
  ))

  private def playerType: StructType =
    StructType(Seq(StructField("name", StringType)))

  /** The 8 hard-coded bookmakers and their sink column prefixes
    * (utils.py:241-248 / 263-298). Order matters for the 24-col layout. */
  val bookmakers: Seq[(String, String)] = Seq(
    "Betclic.fr" -> "BETCLIC",
    "Unibet.fr" -> "UNIBET",
    "bwin.fr" -> "BWIN",
    "France Pari" -> "FRANCE_PARIS",
    "NetBet.fr" -> "NETBET",
    "Winamax" -> "WINAMAX",
    "bet365" -> "BET365",
    "1xBet" -> "ONEBET")

  /** Kept input columns for the fact table, pre-rename (utils.py:85-99). */
  val factKeepColumns: Seq[String] = Seq(
    "current_country", "current_tournament",
    "participant_home", "participant_away",
    "participant_home_current_score", "participant_away_current_score",
    "year", "month", "day", "hour", "minute")

  /** Rename map to SHOUT_CASE sink names (utils.py:128-142). */
  val factRenames: Map[String, String] = Map(
    "year" -> "YEAR_MATCH",
    "month" -> "MONTH_MATCH",
    "day" -> "DAY_MATCH",
    "hour" -> "HOUR_MATCH",
    "minute" -> "MINUTE_MATCH",
    "current_country" -> "COUNTRY_MATCH",
    "current_tournament" -> "TOURNAMENT",
    "participant_home" -> "NAME_TEAM_HOME",
    "participant_home_current_score" -> "SCORE_TEAM_HOME",
    "participant_away" -> "NAME_TEAM_AWAY",
    "participant_away_current_score" -> "SCORE_TEAM_AWAY")

  /** Fact output column order (utils.py:110-125,194-208). */
  val factColumns: Seq[String] = Seq(
    "ID_MATCH", "DATE_LOAD",
    "YEAR_MATCH", "MONTH_MATCH", "DAY_MATCH", "HOUR_MATCH", "MINUTE_MATCH",
    "COUNTRY_MATCH", "TOURNAMENT",
    "NAME_TEAM_HOME", "SCORE_TEAM_HOME",
    "NAME_TEAM_AWAY", "SCORE_TEAM_AWAY")

  /** Lineup output: ID_MATCH + 11 positional player columns
    * (utils.py:324-337). */
  val lineupColumns: Seq[String] =
    "ID_MATCH" +: (1 to 11).map(i => s"NAME_PLAYER_$i")

  /** Odds output: ID_MATCH + 8 bookmakers x {HOME,NIL,AWAY} doubles
    * (utils.py:263-298). */
  val oddsColumns: Seq[String] =
    "ID_MATCH" +: bookmakers.flatMap { case (_, p) =>
      Seq(s"${p}_HOME_ODD", s"${p}_NIL_ODD", s"${p}_AWAY_ODD")
    }
}
