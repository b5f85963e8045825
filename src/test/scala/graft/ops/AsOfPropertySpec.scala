package graft.ops

import graft.SparkSpec

/** Randomized-reference tests: the distributed operators against
  * brute-force implementations on seeded random inputs (deterministic —
  * no flaky CI). These pin the SEMANTICS a 100 TB run must compute,
  * independent of the plan shape the unit specs pin. */
class AsOfPropertySpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoin equals brute-force latest-at-or-before on 20 random cases") {
    val rnd = new scala.util.Random(1234)
    (1 to 20).foreach { _ =>
      val left = Seq.fill(rnd.nextInt(30))(
        (rnd.nextInt(4).toLong + 1, rnd.nextInt(50).toLong))
      val right = Seq.fill(rnd.nextInt(30))(
        (rnd.nextInt(4).toLong + 1, rnd.nextInt(50).toLong))
      val l = left.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      // right deduped to one row per (k, t) keeping max id — the
      // documented caller contract
      val r = right.zipWithIndex
        .map { case ((k, t), i) => (k, t, 1000L + i) }
        .groupBy(x => (x._1, x._2)).values.map(_.maxBy(_._3)).toSeq
      val expected = l.map { case (k, t, id) =>
        val prior = r.filter(x => x._1 == k && x._2 <= t)
        id -> (if (prior.isEmpty) None
               else Some(prior.maxBy(x => (x._2, x._3))._3))
      }.toMap
      val got =
        if (l.isEmpty) Map.empty[Long, Option[Long]]
        else AsOf.asOfJoin(
          l.toDF("k", "t", "lid"), r.toDF("k", "t", "rid"),
          "k", "t", leftCols = Seq("lid"), payload = Seq("rid"))
          .collect()
          .map(row => row.getAs[Long]("lid") ->
            (if (row.isNullAt(row.fieldIndex("rid"))) None
             else Some(row.getAs[Long]("rid"))))
          .toMap
      assert(got == expected,
        s"asOf mismatch\nleft=$l\nright=$r\ngot=$got\nexpected=$expected")
    }
  }
}

class RangesPropertySpec extends SparkSpec {
  import spark.implicits._

  test("bucketedRangeJoin equals the BETWEEN join on 20 random cases") {
    val rnd = new scala.util.Random(4321)
    val widths = Seq(1.0, 7.0, 10.0, 33.3)
    (1 to 20).foreach { i =>
      val points = Seq.fill(rnd.nextInt(40))(rnd.nextDouble() * 200 - 100)
        .zipWithIndex.map { case (v, j) => (j.toLong, v) }
      val intervals = Seq.fill(rnd.nextInt(10)) {
        val lo = rnd.nextDouble() * 200 - 100
        (lo, lo + rnd.nextDouble() * 60)
      }.zipWithIndex.map { case ((lo, hi), j) => (s"iv$j", lo, hi) }
      val width = widths(i % widths.length)
      val expected = (for {
        (id, v) <- points
        (name, lo, hi) <- intervals
        if v >= lo && v < hi
      } yield (id, name)).toSet
      val got =
        if (points.isEmpty || intervals.isEmpty) Set.empty[(Long, String)]
        else Ranges.bucketedRangeJoin(
          points.toDF("id", "v"), "v",
          intervals.toDF("name", "lo", "hi"), "lo", "hi", width)
          .select("id", "name").as[(Long, String)].collect().toSet
      assert(got == expected,
        s"range mismatch at width=$width\npoints=$points\nintervals=$intervals")
    }
  }
}
