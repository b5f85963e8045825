package graft.ops

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def views = Seq(
    (1L, 100L, 10L), (1L, 200L, 11L), (2L, 50L, 20L))
    .toDF("k", "t", "view_id")
  private def clicks = Seq(
    (1L, 100L, 900L), // exactly at view 10's time -> visible (at-or-before)
    (1L, 150L, 901L), // between views 10 and 11
    (3L, 10L, 902L))  // other key, never matched
    .toDF("k", "t", "click_id")

  test("picks the latest right row at-or-before each left row, null when none") {
    val out = AsOf.asOfJoin(views, clicks, "k", "t",
        leftCols = Seq("view_id"), payload = Seq("click_id"))
      .select("view_id", "click_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(10L) == Some(900L), "right row exactly at left time is visible")
    assert(out(11L) == Some(901L), "latest prior wins, not first")
    assert(out(20L) == None, "no prior right row -> null payload")
  }

  test("null payload values come from ONE right row, never stitched across rows") {
    // right rows: (t=1, p1='A', p2=null) then (t=2, p1=null, p2='B');
    // per-column carry would fabricate (A, B); whole-row ASOF semantics
    // require (null, 'B') from the latest row
    val l = Seq((1L, 3L, 10L)).toDF("k", "t", "view_id")
    val r = Seq((1L, 1L, Option("A"), Option.empty[String]),
      (1L, 2L, Option.empty[String], Option("B")))
      .toDF("k", "t", "p1", "p2")
    val row = AsOf.asOfJoin(l, r, "k", "t",
      leftCols = Seq("view_id"), payload = Seq("p1", "p2")).collect().head
    assert(row.isNullAt(row.fieldIndex("p1")),
      s"p1 must be the LATEST row's null, got $row")
    assert(row.getAs[String]("p2") == "B")
  }

  test("as-of plan contains no join at all — one window over the union") {
    val plan = AsOf.asOfJoin(views, clicks, "k", "t",
      leftCols = Seq("view_id"), payload = Seq("click_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must be join-free:\n$plan")
    assert(plan.contains("Window"), "carried payload must come from a window")
  }
}

class RangesSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq((1L, 5.0), (2L, 10.0), (3L, 19.99), (4L, 20.0),
    (5L, 35.0), (6L, 120.0)).toDF("id", "v")
  private def intervals = Seq(("a", 0.0, 10.0), ("b", 10.0, 20.0),
    ("c", 20.0, 40.0)).toDF("name", "lo", "hi")

  test("bucketed range join matches the exact BETWEEN join semantics") {
    val out = Ranges.bucketedRangeJoin(points, "v", intervals, "lo", "hi",
        width = 7.0)
      .select("id", "name").as[(Long, String)].collect().toSet
    // lo inclusive, hi exclusive; 120.0 falls in no interval
    assert(out == Set((1L, "a"), (2L, "b"), (3L, "b"), (4L, "c"), (5L, "c")))
  }

  test("interval ending exactly on a bucket boundary does not leak into it") {
    // width == interval width: hi = 10.0 is bucket 1's start; interval 'a'
    // must only occupy bucket 0
    val out = Ranges.bucketedRangeJoin(points, "v", intervals, "lo", "hi",
        width = 10.0)
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a"), (2L, "b"), (3L, "b"), (4L, "c"), (5L, "c")))
  }

  test("range join is an equi-join on the bucket, not a cartesian product") {
    val plan = Ranges.bucketedRangeJoin(points, "v", intervals, "lo", "hi",
      width = 7.0).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"bucketed range join must be keyed:\n$plan")
  }
}
