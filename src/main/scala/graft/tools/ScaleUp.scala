package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic F× scale-up of a testdata directory — the tool behind the
  * measured "does runtime actually grow linearly with data volume?" answer
  * in BASELINE.md.
  *
  * Every fact table is replicated F times with all join keys shifted by
  * `replica * Stride` (1e9, far above any key at any shipped SF), so
  * foreign keys stay consistent WITHIN a replica and never collide ACROSS
  * replicas: a ×10 directory has 10× the orders per customer-key-space,
  * 10× the users, 10× the documents — the same shape, more of it. The
  * dimension tables (`region`, `nation`) are copied unchanged, exactly as
  * a real 10× corpus would behave.
  *
  * Document TEXT is de-correlated across replicas with a per-replica
  * alphabet rotation (`translate`, length-preserving, so `n_chars` stays
  * valid): plain duplication would make every doc an exact dup of F-1
  * others, and near-dup candidate generation would grow QUADRATICALLY in F
  * — an artifact of copying, not of scale. Rotated replicas share no
  * shingles, so dedup/similarity work grows linearly, like a real corpus.
  * (Rotations repeat past F=26; keys still differ, so only text-dedup
  * queries would see cross-replica dups beyond that.)
  *
  * Output layout is FIXED across factors — every scaled table is written
  * as 32 files (dims as 1) regardless of F — so benching a ×1 and a ×10
  * directory compares pure data volume at identical parallelism, not
  * volume confounded with file count. A ×1 run through this tool is
  * therefore the correct baseline for a ×F run, NOT the shipped
  * single-file directory.
  *
  * Usage: `runMain graft.tools.ScaleUp <srcDir> <dstDir> [factor]`
  * (writes `<dstDir>/<table>.parquet/`; refuses to write into the source).
  */
object ScaleUp {

  /** Key shift between replicas — above any shipped key, below long
    * overflow for any plausible factor. */
  val Stride = 1000000000L

  /** Join-key columns shifted per replica; tables absent here (the
    * broadcast dims) are copied unchanged. */
  val shiftedKeys: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private val lower = ('a' to 'z').mkString
  private val upper = ('A' to 'Z').mkString
  private def rot(s: String, r: Int): String = s.drop(r) + s.take(r)

  /** Per-replica caesar rotation of letters (digits/punct untouched):
    * replica 0 is the original text, replicas 1..25 share no letter
    * shingles with it or each other. */
  private def rotateText(text: Column, replica: Column): Column =
    (1 until 26).foldLeft(when(pmod(replica, lit(26)) === 0, text)) {
      (acc, r) => acc.when(pmod(replica, lit(26)) === r,
        translate(text, lower + upper, rot(lower, r) + rot(upper, r)))
    }.otherwise(text)

  /** One scan → F replicas via a narrow explode; key columns shifted,
    * document text rotated, original column order preserved. Dims (no
    * shifted keys) are returned unchanged; ×1 through the replica path is
    * the identity (replica 0 = shift 0 = rotation 0).
    *
    * `mode` picks which axis grows:
    *   - `"grow"` (default): 10× the KEYS — every id space (users, docs,
    *     orders) replicates disjointly and text de-correlates; per-key
    *     density is unchanged. The "more of the same shape" world.
    *   - `"hot"`: 10× the DENSITY — row identities (event_id, doc_id, …)
    *     still shift, but `events.user_id` keeps its original values
    *     (every user 10× hotter) and document text is copied VERBATIM
    *     (every text 10× duplicated). The skew/boilerplate world that
    *     stresses sessionization state and dedup group sizes instead of
    *     key cardinality. */
  def scaleTable(df: DataFrame, table: String, factor: Int,
                 mode: String = "grow"): DataFrame = {
    require(mode == "grow" || mode == "hot", s"unknown mode $mode")
    val keys0 = shiftedKeys.getOrElse(table, Seq.empty)
    if (keys0.isEmpty) return df
    val keys =
      if (mode == "hot" && table == "events") keys0.filterNot(_ == "user_id")
      else keys0
    val wide = df.withColumn("__r",
      explode(lit((0L until factor.toLong).toArray)))
    val shifted = keys.foldLeft(wide) { (d, k) =>
      d.withColumn(k, col(k) + col("__r") * Stride)
    }
    val rotated =
      if (table == "documents" && mode == "grow")
        shifted.withColumn("text", rotateText(col("text"), col("__r")))
      else shifted
    rotated.select(df.columns.map(col).toIndexedSeq: _*)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ScaleUp <srcDir> <dstDir> [factor] [grow|hot]")
    val src = new java.io.File(args(0))
    val dst = new java.io.File(args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val mode = if (args.length > 3) args(3) else "grow"
    require(factor >= 1, s"factor must be >= 1, got $factor")
    require(src.isDirectory, s"$src is not a directory")
    require(src.getCanonicalPath != dst.getCanonicalPath,
      "dst must differ from src")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    src.listFiles.filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .foreach { t =>
        val table = t.getName.stripSuffix(".parquet")
        val out = scaleTable(spark.read.parquet(t.getAbsolutePath),
          table, factor, mode)
        val nFiles = if (shiftedKeys.contains(table)) 32 else 1
        out.repartition(nFiles).write.mode("overwrite")
          .parquet(new java.io.File(dst, t.getName).getAbsolutePath)
        println(s"$table: ×$factor ($mode) -> $nFiles files")
      }
    spark.stop()
  }
}
