package graft

import graft.operators.Upsert

class UpsertSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val existing = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("id", "name", "v")

  private lazy val updates = Seq(
    (2L, "b2", 22.0), // replaces
    (4L, "d", 40.0) // appends
  ).toDF("id", "name", "v")

  test("mergeByKey replaces matched keys and appends new ones") {
    val out = Upsert.mergeByKey(existing, updates, Seq("id"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap
    assert(out == Map(
      1L -> (("a", 10.0)), 2L -> (("b2", 22.0)),
      3L -> (("c", 30.0)), 4L -> (("d", 40.0))))
  }

  test("merge is idempotent under re-delivery (the reference was not)") {
    assert(Upsert.isIdempotent(existing, updates, Seq("id")))
  }
}
