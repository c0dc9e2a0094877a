package graft

import graft.operators.Diff

/** Snapshot diff (operators/Diff.scala): the four outcomes, null-safe
  * comparison, and the change-sized output contract. */
class DiffSpec extends TestSpark {
  import spark.implicits._

  test("snapshotDiff classifies insert/update/delete; null-safe compare") {
    val old = Seq(
      (1L, Some(10.0), "a"),   // unchanged
      (2L, Some(20.0), "b"),   // price update
      (3L, None,       "c"),   // null -> value update
      (4L, Some(40.0), "d"),   // deleted in new
      (6L, None,       "f")    // unchanged with a null (null <=> null)
    ).toDF("k", "price", "tag")
    val nu = Seq(
      (1L, Some(10.0), "a"),
      (2L, Some(21.0), "b"),
      (3L, Some(30.0), "c"),
      (5L, Some(50.0), "e"),   // inserted
      (6L, None,       "f")
    ).toDF("k", "price", "tag")
    val out = Diff.snapshotDiff(old, nu, keys = Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(out === Map(2L -> "update", 3L -> "update",
      4L -> "delete", 5L -> "insert"))
  }

  test("snapshotDiff rejects mismatched schemas") {
    val a = Seq((1L, 1.0)).toDF("k", "x")
    val b = Seq((1L, 1.0)).toDF("k", "y")
    intercept[IllegalArgumentException] {
      Diff.snapshotDiff(a, b, keys = Seq("k"))
    }
  }
}
