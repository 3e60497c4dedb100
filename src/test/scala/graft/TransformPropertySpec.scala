package graft

import org.apache.spark.sql.Encoders
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.schema.Flashscore
import graft.transform.FlashscoreTransforms

/** Property-based invariants over randomized Flashscore batches
  * (SURVEY.md §5.3): counts, widths, and rename bijection hold for any
  * combination of nulls, statuses, lineup sizes, and bookmaker subsets.
  * Generators are driven directly with fixed seeds (scalacheck core only —
  * the scalatest bridge artifact isn't on the offline classpath). */
class TransformPropertySpec extends SparkTestBase {

  private val statusGen = Gen.oneOf("Finished", "Scheduled", "Live")
  private val scoreGen =
    Gen.oneOf("\"0\"", "\"3\"", "\"abandoned\"", "null", "\"12\"")
  private val countryGen = Gen.oneOf("\"FR\"", "\"DE\"", "null")
  private val lineupSizeGen = Gen.oneOf(0, 5, 11, 11, 12)
  private val bookCountGen = Gen.choose(0, 8)

  private case class RecSpec(
      status: String, country: String, score: String,
      t1: Int, t2: Int, books: Int, idx: Int)

  private val recGen: Gen[RecSpec] = for {
    st <- statusGen; c <- countryGen; sc <- scoreGen
    t1 <- lineupSizeGen; t2 <- lineupSizeGen; b <- bookCountGen
    i <- Gen.choose(0, 1 << 20)
  } yield RecSpec(st, c, sc, t1, t2, b, i)

  private def toJson(r: RecSpec): String = {
    def team(p: String, n: Int) =
      (1 to n).map(i => s"""{"name":"$p$i"}""").mkString("[", ",", "]")
    val books = Flashscore.bookmakers.take(r.books).map { case (name, _) =>
      s"""{"bookmaker":"$name","odds":["1.1","2.2","3.3"]}"""
    }.mkString("[", ",", "]")
    s"""{"current_status":"${r.status}","current_country":${r.country},
       |"current_tournament":"T","participant_home":"H${r.idx}",
       |"participant_away":"A${r.idx}",
       |"participant_home_current_score":${r.score},
       |"participant_away_current_score":"1","year":2023,"month":1,
       |"day":2,"hour":3,"minute":4,"match_hour":"x",
       |"lineups_data":{"Team1":${team("p", r.t1)},"Team2":${team("q", r.t2)}},
       |"bookmakers_data":$books}""".stripMargin.replace("\n", " ")
  }

  test("invariants hold for randomized batches") {
    val batches = (1 to 5).map(i =>
      Gen.listOfN(40, recGen).pureApply(Gen.Parameters.default, Seed(42L + i)))
    batches.foreach { specs =>
      val raw = spark.read.schema(Flashscore.inputSchema)
        .json(spark.createDataset(specs.map(toJson))(Encoders.STRING))
      val keyed = FlashscoreTransforms
        .withMatchKey(FlashscoreTransforms.finished(raw), deterministic = true)
        .cache()
      try {
        val finished = specs.count(_.status == "Finished")
        // fact rows = Finished AND no null kept column (country/score null
        // are the only generated null sources)
        val expectedFacts = specs.count(s =>
          s.status == "Finished" && s.country != "null" && s.score != "null")
        val facts = FlashscoreTransforms.matchFacts(keyed)
        assert(facts.count() == expectedFacts)
        assert(facts.columns.toSeq == Flashscore.factColumns)

        // lineups: one row per Finished record whose team has exactly 11
        val homeRows = FlashscoreTransforms
          .startingLineup(keyed, FlashscoreTransforms.Home)
        assert(homeRows.count() ==
          specs.count(s => s.status == "Finished" && s.t1 == 11))
        assert(homeRows.columns.length == 12)

        // odds: exactly one row per Finished record, 25 columns
        val odds = FlashscoreTransforms.odds(keyed)
        assert(odds.count() == finished)
        assert(odds.columns.toSeq == Flashscore.oddsColumns)

        // rename bijection: every configured rename target appears once
        assert(Flashscore.factRenames.values.toSet.subsetOf(
          facts.columns.toSet))
      } finally { keyed.unpersist(); () }
    }
  }
}
