package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pins Verify's loud-failure contract (round-11 post-mortem: a failing
  * query only printed to stderr, so ev05/ev07 were silently ABSENT from
  * the driver's correctness artifact instead of carrying an `err` row). */
class VerifyFailureSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-verify-spec").toString

  test("a failing query leaves a .FAILED marker and an error parquet") {
    val out = tmp()
    val broken: (SparkSession, String) => DataFrame =
      (s, _) => s.range(1).selectExpr("unix_micros(id)") // DATATYPE_MISMATCH at analysis
    val ok = Verify.dumpOne(spark, sf, out, "zz_broken", broken)
    assert(!ok)
    val marker = Paths.get(s"$out/zz_broken.FAILED")
    assert(Files.exists(marker), "expected loud .FAILED marker")
    assert(Files.readString(marker).contains("zz_broken"))
    // The error parquet exists and is readable — a driver iterating result
    // dirs sees a loud mismatch, not an omission.
    val errDf = spark.read.parquet(s"$out/zz_broken")
    assert(errDf.columns.toSeq == Seq("__graft_error"))
    assert(errDf.count() == 1)
  }

  test("a succeeding query writes its parquet and no marker") {
    val out = tmp()
    val fine: (SparkSession, String) => DataFrame =
      (s, _) => s.range(3).toDF("id")
    val ok = Verify.dumpOne(spark, sf, out, "zz_fine", fine)
    assert(ok)
    assert(!Files.exists(Paths.get(s"$out/zz_fine.FAILED")))
    assert(spark.read.parquet(s"$out/zz_fine").count() == 3)
  }
}
