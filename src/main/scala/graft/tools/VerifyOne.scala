package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Single-query slice of the Verify surface, for fast iteration on a new
  * operator: dump ONLY the named queries (comma-separated) plus an
  * oracle_sql.json restricted to them, so `tools/local_verify.py` compares
  * just that slice instead of the full registry (~2 min per sf dir).
  *
  *   sbt "runMain graft.tools.VerifyOne /root/testdata/sf0.001 /tmp/v1 t42_source_mix_alloc"
  *   python3 tools/local_verify.py /root/testdata/sf0.001 /tmp/v1
  *
  * Oracle thunks that embed trained state (HashOracles, BPE merges, IVF
  * centroids) resolve per-dir exactly as in Verify: the queries run first,
  * then OracleDump.sfDir scopes the dump. */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.DsRangeRewrite.install(spark)
    graft.plans.LevenshteinPrefilter.install(spark)
    new java.io.File(outDir).mkdirs()
    val reg = graft.queries.Registry.queries
    val unknown = names.diff(reg.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val failed = names.toSeq.sorted.filterNot(n =>
      graft.Verify.dumpOne(spark, sfDir, outDir, n, reg(n)))
    if (failed.nonEmpty)
      System.err.println(s"[verify-one] FAILED: ${failed.mkString(", ")}")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    graft.queries.OracleDump.sfDir = Some(sfDir)
    // filter BEFORE forcing oracle thunks: trained-state thunks for
    // queries that did not run in this JVM throw by design
    val json = graft.queries.Registry.all
      .filter(nq => names.contains(nq.name))
      .flatMap(nq => nq.oracleFn.map(f => nq.name -> f())
        .orElse(nq.oracle.map(nq.name -> _)))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
