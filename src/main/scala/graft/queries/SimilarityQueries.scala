package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.ops.CoreOps.scan
import graft.sim.Similarity

/** Similarity-search and near-dup queries over `embeddings` / `documents`.
  *
  * s01 has a DuckDB oracle (double-precision cosine, rank tie-broken by
  * id). The seeded-hash queries are oracled too: s02's hyperplanes are
  * class-load literals, s07's trained centroids and s03/s04's
  * MinHash/SimHash signatures are embedded at dump time (HashOracles —
  * DuckDB BIGINT can't wrap mod 2^64, so the wraparound signatures ride
  * in as VALUES and everything downstream is recomputed in SQL). Specs
  * additionally assert recall vs brute force and planted-duplicate
  * detection. */
object SimilarityQueries {

  /** Brute-force cosine top-10 for a 5-vector query set: the exactness
    * baseline. Queries broadcast; corpus scanned once. */
  def cosineTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = scan(spark, sfDir, "embeddings")
    Similarity.bruteForceTopK(
      emb.where(col("vec_id") < 5), emb, k = 10)
  }

  private val cosineTopKOracle =
    """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      |           FROM embeddings WHERE vec_id < 5),
      |     c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
      |           FROM embeddings),
      |     s AS (SELECT query_id, neighbor_id,
      |                  list_cosine_similarity(qv, cv) AS sim
      |           FROM c, q WHERE query_id <> neighbor_id),
      |     r AS (SELECT query_id, neighbor_id, sim,
      |                  row_number() OVER (PARTITION BY query_id
      |                                     ORDER BY sim DESC, neighbor_id) AS rank
      |           FROM s)
      |SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim
      |FROM r WHERE rank <= 10""".stripMargin

  /** LSH-bucketed ANN (random hyperplanes, 10 tables × 3 planes): the scale
    * path — bucket equi-join instead of cross join. DuckDB-oracled below by
    * materializing the seeded hyperplanes as literal lists; SimilaritySpec
    * additionally asserts ≥0.5 recall@10 vs brute force. */
  def annLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = scan(spark, sfDir, "embeddings")
    Similarity.lshTopK(emb.where(col("vec_id") < 5), emb, k = 10)
  }

  /** A seeded plane/centroid as a DuckDB list literal. Scala's
    * Double.toString round-trips exactly, so the oracle sees bit-identical
    * weights to the Spark literals. */
  private def vecLit(p: Array[Double]): String =
    p.mkString("[", ", ", "]::DOUBLE[]")

  /** DuckDB twin of lshTopK's defaults (10 tables × 3 planes, seed 42+t):
    * the hyperplanes are materialized as VALUES rows, bucket codes rebuilt
    * with the same sign-bit arithmetic, then candidate equi-join + exact
    * cosine + top-k — structurally the same plan the Spark side runs. */
  private val annLshOracle: String = {
    val rows = for {
      t <- 0 until 10
      (p, i) <- Similarity.hyperplanes(3, 64, 42L + t).zipWithIndex
    } yield s"($t, $i, ${vecLit(p)})"
    s"""WITH planes(tbl, i, p) AS (VALUES
       |  ${rows.mkString(",\n  ")}),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |codes AS (
       |  SELECT e.vec_id, pl.tbl,
       |         SUM(CASE WHEN list_dot_product(e.v, pl.p) >= 0
       |                  THEN CAST(1 AS BIGINT) << pl.i
       |                  ELSE CAST(0 AS BIGINT) END)::BIGINT AS code
       |  FROM e, planes pl
       |  GROUP BY e.vec_id, pl.tbl),
       |pairs AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM codes q JOIN codes c ON q.tbl = c.tbl AND q.code = c.code
       |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
       |s AS (
       |  SELECT p.query_id, p.neighbor_id,
       |         list_cosine_similarity(eq.v, ec.v) AS sim
       |  FROM pairs p
       |  JOIN e eq ON eq.vec_id = p.query_id
       |  JOIN e ec ON ec.vec_id = p.neighbor_id),
       |r AS (
       |  SELECT query_id, neighbor_id, sim,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM s)
       |SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim
       |FROM r WHERE rank <= 10""".stripMargin
  }

  /** MinHash-LSH near-dup pairs over documents ∪ lightly-perturbed copies
    * (id+1e6) — the perturbed copies guarantee planted near-dups at every
    * scale factor. DuckDB-oracled at dump time (HashOracles: embedded
    * band buckets, candidate join + string-gram Jaccard verify recomputed
    * by DuckDB). */
  def minhashNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    HashOracles.record(spark, sfDir)
    val docs = scan(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val perturbed = docs.select((col("doc_id") + 1000000).as("doc_id"),
      concat(col("text"), lit(" perturbed tail")).as("text"))
    Dedup.nearDupPairs(docs.unionAll(perturbed), "text", "doc_id",
      threshold = 0.5)
  }

  /** t48 — per-source dedup/contamination accounting (the Dolma-style
    * ops report a data team actually reads; r17 verdict item 7): over
    * s03's planted corpus (documents ∪ perturbed copies as their own
    * 'perturbed' source), one row per source with its doc count, its
    * membership in corpus-wide EXACT duplicate groups (the sha256
    * collapse key), how many of its docs sit in ≥1 near-dup pair, and
    * how many of its pairs cross a source boundary (counted once per
    * side — the contamination-direction view). Composes the EXISTING
    * s03 pair machinery ([[Dedup.nearDupPairs]], unchanged band/verify
    * shuffles) with three small post-aggregations on the narrow
    * (id_a, id_b) pair table — no new shuffle shapes; at 100 TB the
    * report costs what the dedup pass already paid, plus shuffle joins
    * of the narrow pair table against the two-column id→source
    * projection — |pairs|-keyed exchanges carrying two narrow columns
    * each (the id→source side is corpus-sized, so it is NOT broadcast;
    * AQE may still demote either join to broadcast when a side turns
    * out small at runtime). */
  def sourceDedupReport(spark: SparkSession, sfDir: String): DataFrame = {
    HashOracles.record(spark, sfDir)
    val docs = scan(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val pert = docs.select((col("doc_id") + 1000000).as("doc_id"),
      lit("perturbed").as("source"),
      concat(col("text"), lit(" perturbed tail")).as("text"))
    val corpus = docs.unionByName(pert)
    val pairs = Dedup.nearDupPairs(corpus, "text", "doc_id",
        threshold = 0.5)
      .select(col("id_a"), col("id_b"))
    val srcOf = corpus.select(col("doc_id"), col("source"))
    // The annotated pair table feeds FOUR downstream branches (touched's
    // two union arms, crossp's two) — without materialization each branch
    // re-evaluates the whole upstream LSH band join + gram verify, and the
    // branches prune different columns so ReuseExchange cannot unify them
    // (the r21 before-plan: 62 Exchanges / 4 copies of the pair machinery).
    // One LAZY localCheckpoint of the narrow (id_a, id_b, src_a, src_b)
    // table pays the dedup pass exactly once; at 100 TB it is |pairs|-
    // scale fixed-width rows — the query's own output order of magnitude,
    // strictly cheaper than re-running the band/verify shuffles per branch.
    // Lazy (r21 advice): eager ran the whole pipeline INCLUDING a count
    // action at DataFrame construction. Lazy is only a partial fix under
    // AQE: Dataset.checkpoint still calls physicalPlan.execute() at
    // construction, and AdaptiveSparkPlanExec.execute() materializes
    // every non-final query stage — so plan-only consumers (explain,
    // plan audits, PlanSnap) skip the count and the final stage but
    // still pay the upstream exchange jobs. Accepted: the alternative
    // (persist) cannot truncate the 4-consumer plan the same way, and
    // the construction cost is bounded by the pair machinery that the
    // query itself needs on first action anyway.
    // Caveat carried from the advice: localCheckpoint is non-reliable —
    // executor loss recomputes from nothing and kills the query on a real
    // cluster; the 100 TB story accepts a query retry there (the
    // checkpoint is |pairs|-scale, rebuilt in one pass).
    val ab = pairs
      .join(srcOf.select(col("doc_id").as("id_a"),
        col("source").as("src_a")), Seq("id_a"))
      .join(srcOf.select(col("doc_id").as("id_b"),
        col("source").as("src_b")), Seq("id_b"))
      .localCheckpoint(false)
    val touched = ab.select(col("id_a").as("doc_id"),
        col("src_a").as("source"))
      .unionAll(ab.select(col("id_b"), col("src_b")))
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_neardup_docs"))
    val crossp = ab.where(col("src_a") =!= col("src_b"))
      .select(col("src_a").as("source"))
      .unionAll(ab.where(col("src_a") =!= col("src_b"))
        .select(col("src_b").as("source")))
      .groupBy(col("source")).agg(count(lit(1)).as("n_cross_pairs"))
    // Two-level aggregation instead of a corpus-wide row-level WindowExec
    // (guide §2.3 "aggregate before you shuffle"): the per-(ek, source)
    // count partial-combines map-side, so on a duplicate-heavy corpus the
    // ek-keyed exchange carries one row per distinct (ek, source) cell
    // instead of one per DOC — the row-level window shipped every doc's
    // (source, ek) to the ek partitioning with no combine. The group-size
    // filter then runs on the collapsed cells: grp = Σ cells' counts per
    // ek, docs in qualifying groups = Σ c per source. Output-identical.
    val ek = corpus.where(col("text").isNotNull)
      .select(col("source"), Dedup.exactKey(col("text")).as("ek"))
    val cells = ek.groupBy(col("ek"), col("source"))
      .agg(count(lit(1)).as("c"))
    val exact = cells
      .withColumn("grp", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("ek"))))
      .where(col("grp") >= 2)
      .groupBy(col("source")).agg(sum(col("c")).cast("long")
        .as("n_exact_dup_docs"))
    corpus.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .join(exact, Seq("source"), "left_outer")
      .join(touched, Seq("source"), "left_outer")
      .join(crossp, Seq("source"), "left_outer")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_exact_dup_docs"), lit(0L)).as("n_exact_dup_docs"),
        coalesce(col("n_neardup_docs"), lit(0L)).as("n_neardup_docs"),
        coalesce(col("n_cross_pairs"), lit(0L)).as("n_cross_pairs"))
  }

  /** SimHash near-dup candidates over the same planted corpus (Hamming ≤
    * 3 via the 4×16-bit chunk join). DuckDB-oracled at dump time
    * (HashOracles: embedded fingerprints, chunk join + Hamming recomputed
    * by DuckDB). */
  def simhashNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    HashOracles.record(spark, sfDir)
    val docs = scan(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val perturbed = docs.select((col("doc_id") + 1000000).as("doc_id"),
      concat(col("text"), lit(" zz")).as("text"))
    Dedup.simhashCandidates(docs.unionAll(perturbed), "text", "doc_id")
  }

  /** Embedding-cosine near-dup: pairs of distinct vectors with cosine ≥
    * 0.5 among a bounded slice, oracled in DuckDB. (Random embeddings
    * make high-cosine pairs rare — 0.5 keeps the check meaningful while
    * still usually yielding zero rows at small SF, which the oracle
    * confirms exactly.) */
  def cosineNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = scan(spark, sfDir, "embeddings").where(col("vec_id") < 200)
    val a = emb.select(col("vec_id").as("id_a"),
      Similarity.asDouble(col("embedding")).as("va"))
    val b = emb.select(col("vec_id").as("id_b"),
      Similarity.asDouble(col("embedding")).as("vb"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("sim", Similarity.cosine(col("va"), col("vb")))
      .where(col("sim") >= 0.5)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  private val cosineNearDupOracle =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
      |           FROM embeddings WHERE vec_id < 200)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |       round(list_cosine_similarity(a.v, b.v), 6) AS sim
      |FROM e a, e b
      |WHERE a.vec_id < b.vec_id
      |  AND list_cosine_similarity(a.v, b.v) >= 0.5""".stripMargin

  /** Multimodal plumbing: documents' bytes as binary payloads with typed
    * metadata — byte length and an 8-byte header fingerprint, computed on
    * the binary column (decode itself is the spec-tested stub). */
  def multimodalMeta(spark: SparkSession, sfDir: String): DataFrame =
    graft.multimodal.Multimodal.toAssets(
        scan(spark, sfDir, "documents"), "doc_id", "text")
      .select(col("asset_id"), col("media_type"),
        length(col("payload")).cast("int").as("n_bytes"),
        lower(hex(substring(col("payload"), 1, 8))).as("header_hex"),
        col("meta.width").as("width"), col("meta.format").as("format"))

  private val multimodalMetaOracle =
    """SELECT doc_id AS asset_id, 'image/fake' AS media_type,
      |       CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
      |       lower(hex(substring(text, 1, 8))) AS header_hex,
      |       CAST(length(text) % 1024 AS INTEGER) AS width,
      |       'fake' AS format
      |FROM documents""".stripMargin

  /** Frame sampling rollup: the video-shaped op — explode each payload
    * into strided frame windows (posexplode, narrow), then aggregate per
    * asset. The oracle recomputes frame counts and byte totals from pure
    * length arithmetic, so the sampler's stride/window logic is
    * hash-checked without DuckDB touching binary substrings. */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame = {
    val assets = graft.multimodal.Multimodal.toAssets(
      scan(spark, sfDir, "documents"), "doc_id", "text")
    graft.multimodal.Multimodal.sampleFrames(assets, frameLen = 16, stride = 64)
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_frames"),
        max(col("frame_no")).as("max_frame"),
        sum(length(col("frame_bytes"))).as("frame_bytes"))
  }

  // frames i = 0..max(len/64 - 1, 0); frame i carries
  // min(16, max(len - i*64, 0)) bytes. DuckDB's // is floor division,
  // matching Spark's positive int() truncation.
  private val frameSampleOracle =
    """WITH d AS (
      |  SELECT doc_id, length(text) AS len,
      |         greatest(length(text) // 64 - 1, 0) AS maxf
      |  FROM documents),
      |f AS (SELECT doc_id, len, unnest(generate_series(0, maxf)) AS i FROM d)
      |SELECT doc_id AS asset_id,
      |       CAST(count(*) AS BIGINT) AS n_frames,
      |       CAST(max(i) AS INTEGER) AS max_frame,
      |       CAST(SUM(least(16, greatest(len - i * 64, 0))) AS BIGINT)
      |         AS frame_bytes
      |FROM f GROUP BY 1""".stripMargin

  /** REAL image decode end-to-end: synthesize genuine PNG payloads (dims
    * and pixels deterministic functions of doc_id), then decode them with
    * JDK ImageIO — width/height/format come off the parsed PNG header and
    * the pixel checksum off the decoded raster. The oracle recomputes the
    * expected values arithmetically, so a decoder that misparsed any byte
    * would hash-mismatch. Both passes are narrow mapPartitions. */
  def imageDecode(spark: SparkSession, sfDir: String): DataFrame =
    graft.multimodal.Multimodal.decodeImages(
        graft.multimodal.Multimodal.synthesizeImageAssets(
          scan(spark, sfDir, "documents"), "doc_id"))
      .toDF()

  // pixel(x,y) = (7x + 13y + doc_id) mod 256 over a (4 + id%29) ×
  // (3 + id%17) grid — summed per doc. Two CTE hops because DuckDB's
  // unnest zips (not crosses) multiple series in one SELECT.
  private val imageDecodeOracle =
    """WITH d AS (SELECT doc_id, 4 + doc_id % 29 AS w, 3 + doc_id % 17 AS h
      |           FROM documents),
      |xs AS (SELECT doc_id, w, h, unnest(generate_series(0, w - 1)) AS x
      |       FROM d),
      |px AS (SELECT doc_id, w, h, x, unnest(generate_series(0, h - 1)) AS y
      |       FROM xs)
      |SELECT doc_id AS asset_id, CAST(w AS INTEGER) AS width,
      |       CAST(h AS INTEGER) AS height, 'png' AS format,
      |       CAST(SUM((x * 7 + y * 13 + doc_id) % 256) AS BIGINT) AS pixel_sum
      |FROM px GROUP BY 1, 2, 3, 4""".stripMargin

  /** REAL audio decode end-to-end: synthesize genuine 16-bit PCM WAVs
    * (frame counts and samples deterministic functions of doc_id), then
    * parse them with javax.sound.sampled — rate/channels/bits come off
    * the container's format chunk and the sample sum off the decoded PCM
    * frames. The oracle recomputes everything arithmetically, so a
    * mis-parsed header or sample byte hash-mismatches. Narrow
    * mapPartitions both ways — the audio twin of s10. */
  def audioDecode(spark: SparkSession, sfDir: String): DataFrame =
    graft.multimodal.Multimodal.decodeAudios(
        graft.multimodal.Multimodal.synthesizeAudioAssets(
          scan(spark, sfDir, "documents"), "doc_id"))
      .toDF()

  // sample i = ((i*37 + doc_id) mod 65536) - 32768 over n = 50 + id%200
  // frames at 8 kHz / 16-bit / mono
  private val audioDecodeOracle =
    """WITH d AS (SELECT doc_id, 50 + doc_id % 200 AS n FROM documents),
      |s AS (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM d)
      |SELECT doc_id AS asset_id, 8000 AS sample_rate, 1 AS channels,
      |       16 AS bits, CAST(n AS BIGINT) AS n_frames,
      |       CAST(SUM((i * 37 + doc_id) % 65536 - 32768) AS BIGINT)
      |         AS sample_sum
      |FROM s GROUP BY 1, 5""".stripMargin

  /** IVF-bucketed ANN over centroids TRAINED from the corpus itself
    * (sampled k-means, k=8, nprobe=2) — the real IVF story, not fixed
    * pseudo-random cells. Training is deterministic (bounded id-sorted
    * sample), memoized per data dir, and the trained centroids are
    * embedded into the DuckDB oracle as VALUES literals at dump time
    * (`annIvfOracle` is an oracleFn thunk; Verify runs queries before
    * dumping oracles, so the thunk sees the trained state). SimilaritySpec
    * additionally proves trained recall beats untrained on a clustered
    * corpus. */
  def annIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = scan(spark, sfDir, "embeddings")
    Similarity.ivfTopK(emb.where(col("vec_id") < 5), emb,
      trainedCentroids(spark, sfDir), k = 10, nprobe = 2)
  }

  /** Per-dir memo of the trained coarse quantizer: training reads a
    * bounded sample once per JVM per data dir, not once per query run;
    * `lastTrained` is what the oracle thunk embeds. */
  private val trainedCache =
    new scala.collection.concurrent.TrieMap[String, Array[Array[Double]]]()
  @volatile private var lastTrained: Option[Array[Array[Double]]] = None

  private def trainedCentroids(spark: SparkSession,
                               sfDir: String): Array[Array[Double]] = {
    val cents = trainedCache.getOrElseUpdate(sfDir,
      Similarity.trainCentroids(scan(spark, sfDir, "embeddings"), k = 8))
    lastTrained = Some(cents)
    cents
  }

  /** s20 — cluster-balanced sampling: cap every embedding-space cluster
    * at a fixed quota, keeping a deterministic uniform slice of the
    * over-represented clusters and everything in the rare ones — the
    * topic-rebalancing selection step (SemDeDup prunes duplicates; this
    * reshapes the DISTRIBUTION). Cells are s07's trained k-means
    * quantizer (shared per-dir memo, so the geometry is identical across
    * s07/s13/s19/s20); in-cell order is the t22 LCG rank, so admission
    * is a pure function of vec_id — replay-stable and
    * partitioning-independent.
    *
    * 100 TB shape: assignment is the narrow fused-argmin scalar; vectors
    * are DROPPED before the one cell-keyed exchange (plan-pinned — only
    * (vec_id, cell) shuffle) and the rank filter gets the partial
    * WindowGroupLimit early-out map-side, so each task forwards at most
    * quota rows per cell it sees. Output (cell, rk, vec_id): the id list
    * a downstream fetch joins back against, never the payload. */
  def clusterBalancedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell"))
      .orderBy(pmod(col("vec_id") * 48271, lit(104729)), col("vec_id"))
    Similarity.ivfAssign(scan(spark, sfDir, "embeddings"),
        trainedCentroids(spark, sfDir))
      .select(col("vec_id"), col("cell"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= BalancedQuota)
      .select(col("cell"), col("rk"), col("vec_id"))
  }

  /** Per-cell cap. The 8 trained cells over the ~500-vector harness
    * corpus span 41–107 members across the gate SFs, so 55 leaves some
    * cells under quota (keep-all branch) and caps the rest — both
    * admission branches live at every gate SF (spec-enforced). */
  val BalancedQuota = 55

  /** DuckDB twin of s20: same trained centroids (dump-time VALUES, the
    * s07 thunk pattern — loud if s20 never ran), same strict-< argmin
    * (row_number ties → lowest cell), same LCG in-cell rank. */
  private def clusterBalancedSampleOracle: String = {
    val cents = OracleDump.resolve(trainedCache, lastTrained).getOrElse {
      System.err.println(
        "[graft] WARNING: clusterBalancedSampleOracle dumped with " +
          "UNTRAINED (seeded) centroids — s20 never ran in this JVM; " +
          "run the query before dumping its oracle.")
      Similarity.hyperplanes(8, 64, 11L)
    }
    val rows = cents.zipWithIndex.map {
      case (c, i) => s"($i, ${vecLit(c)})"
    }
    s"""WITH cents(cell, c) AS (VALUES
       |  ${rows.mkString(",\n  ")}),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |dists AS (
       |  SELECT e.vec_id, ct.cell, list_distance(e.v, ct.c) AS dist
       |  FROM e, cents ct),
       |assign AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY dist, cell) AS rn
       |    FROM dists) WHERE rn = 1)
       |SELECT cell, rk, vec_id FROM (
       |  SELECT cell, vec_id,
       |         CAST(row_number() OVER (PARTITION BY cell
       |           ORDER BY (vec_id * 48271) % 104729, vec_id) AS INTEGER)
       |           AS rk
       |  FROM assign) WHERE rk <= ${BalancedQuota}""".stripMargin
  }

  /** DuckDB twin of ivfTopK: same centroid argmin (ties → lowest cell, as
    * the Spark fold's strict `<` keeps the first minimum), same nprobe=2
    * probe order (dist, cell), same in-cell cosine top-k. list_distance is
    * the square root of the Spark side's squared distance — monotonic, so
    * the argmin/probe ordering is identical. Built at dump time from the
    * centroids the query actually trained (falling back to the seeded set
    * only if s07 never ran in this JVM). */
  private def annIvfOracle: String = {
    val cents = OracleDump.resolve(trainedCache, lastTrained).getOrElse {
      // loud, not silent (r15 advice, fixed alongside the s17 twin): an
      // oracle dumped before s07 ran embeds the SEEDED centroid set and
      // verification fails as a confusing numeric diff
      System.err.println(
        "[graft] WARNING: annIvfOracle dumped with UNTRAINED (seeded) " +
          "centroids — s07_ann_ivf never ran in this JVM; run the query " +
          "before dumping its oracle.")
      Similarity.hyperplanes(8, 64, 11L)
    }
    val rows = cents.zipWithIndex.map {
      case (c, i) => s"($i, ${vecLit(c)})"
    }
    s"""WITH cents(cell, c) AS (VALUES
       |  ${rows.mkString(",\n  ")}),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |dists AS (
       |  SELECT e.vec_id, ct.cell, list_distance(e.v, ct.c) AS dist
       |  FROM e, cents ct),
       |assign AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY dist, cell) AS rn
       |    FROM dists) WHERE rn = 1),
       |qcells AS (
       |  SELECT vec_id AS query_id, cell FROM (
       |    SELECT vec_id, cell,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY dist, cell) AS rn
       |    FROM dists WHERE vec_id < 5) WHERE rn <= 2),
       |cand AS (
       |  SELECT q.query_id, a.vec_id AS neighbor_id
       |  FROM qcells q JOIN assign a ON a.cell = q.cell
       |  WHERE q.query_id <> a.vec_id),
       |s AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |         list_cosine_similarity(eq.v, ec.v) AS sim
       |  FROM cand
       |  JOIN e eq ON eq.vec_id = cand.query_id
       |  JOIN e ec ON ec.vec_id = cand.neighbor_id),
       |r AS (
       |  SELECT query_id, neighbor_id, sim,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM s)
       |SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim
       |FROM r WHERE rank <= 10""".stripMargin
  }

  /** s17's geometry — trained product-quantization codebooks over the
    * s07 bounded sample: PqM=8 subspaces × PqK=16 codes (4-bit codes
    * over 8-dim subvectors) and a PqCoarseK=100-candidate coarse
    * boundary — sized on the harness corpus for ≥0.7 recall@10 (PqSpec
    * measures it); production would widen k to 256 (byte codes). The
    * 100 TB shape lives in [[Similarity.pqTopK]]: the persisted
    * structure is m CODES per vector (m bytes — far smaller than the
    * float column, which the integer-ADC coarse scan never reads), and
    * the candidate boundary is pure integer arithmetic, so the whole
    * pipeline is value-oracled like s14 rather than recall-tested like
    * s02. Shared engine/oracle constants in the s14 sense: they are the
    * OPERATOR'S parameters, not candidate sets — the oracle re-derives
    * every code and candidate from them independently, embedding the
    * trained codebooks as VALUES literals at dump time (the s07
    * oracleFn pattern). */
  val PqM = 8
  val PqK = 16
  val PqCoarseK = 100

  def annPq(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = scan(spark, sfDir, "embeddings")
    Similarity.pqTopK(emb.where(col("vec_id") < 5), emb,
      trainedPQBooks(spark, sfDir), k = 10, coarseK = PqCoarseK)
  }

  /** Per-dir memo of the trained PQ codebooks (the trainedCentroids
    * contract: one bounded collect per JVM per dir; `lastPQ` is what the
    * oracle thunk embeds). */
  private val pqCache =
    new scala.collection.concurrent.TrieMap[String, Array[Array[Array[Double]]]]()
  @volatile private var lastPQ: Option[Array[Array[Array[Double]]]] = None

  private def trainedPQBooks(spark: SparkSession,
                             sfDir: String): Array[Array[Array[Double]]] = {
    val cbs = pqCache.getOrElseUpdate(sfDir,
      Similarity.trainPQ(scan(spark, sfDir, "embeddings"), m = PqM, k = PqK))
    lastPQ = Some(cbs)
    cbs
  }

  private def intLit(p: Array[Int]): String =
    p.mkString("[", ", ", "]::INT[]")

  /** DuckDB twin of pqTopK: same per-subspace argmin (list_distance
    * ordering, ties → lowest code — the s07 rule), same SQ8-grid integer
    * reconstruction, same `rnorm2 − 2·dot` coarse score (every product
    * ≤ 127² and every 64-term partial sum < 2^24, so even a float32
    * accumulation of list_dot_product is EXACT — the ranking is
    * bit-stable), same crank ≤ PqCoarseK boundary and exact-cosine rerank with
    * neighbor_id tie-breaks. Built at dump time from the codebooks the
    * query actually trained (seeded fallback only if s17 never ran in
    * this JVM). */
  private def annPqOracle: String = {
    val cbs = OracleDump.resolve(pqCache, lastPQ).getOrElse {
      // loud, not silent (r15 advice): a dump that never ran s17 in this
      // JVM embeds SEEDED codebooks, and the resulting verify failure
      // reads as an inscrutable numeric diff instead of what it is — a
      // dump-ordering bug. Verify.scala runs every query before dumping
      // oracles, so this path firing outside ad-hoc tooling IS the bug.
      System.err.println(
        "[graft] WARNING: annPqOracle dumped with UNTRAINED (seeded) PQ " +
          "codebooks — s17_ann_pq never ran in this JVM; the oracle will " +
          "NOT match a run that trains on real data. Run the query before " +
          "dumping its oracle.")
      Array.tabulate(PqM)(s => Similarity.hyperplanes(PqK, 64 / PqM, 13L + s))
    }
    val qcb = Similarity.quantizePQ(cbs)
    val sub = cbs(0)(0).length
    val rows = for { s <- cbs.indices; code <- cbs(s).indices }
      yield s"($s, $code, ${vecLit(cbs(s)(code))}, ${intLit(qcb(s)(code))})"
    val subspaces = cbs.indices.map(s => s"($s)").mkString(", ")
    s"""WITH cb(s, code, c, qc) AS (VALUES
       |  ${rows.mkString(",\n  ")}),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |sub AS (
       |  SELECT vec_id, s, v[s*$sub+1:(s+1)*$sub] AS sv
       |  FROM e, (VALUES $subspaces) ss(s)),
       |assign AS (
       |  SELECT vec_id, s, code FROM (
       |    SELECT sub.vec_id, sub.s, cb.code,
       |           row_number() OVER (PARTITION BY sub.vec_id, sub.s
       |                              ORDER BY list_distance(sub.sv, cb.c),
       |                                       cb.code) AS rn
       |    FROM sub JOIN cb USING (s)) WHERE rn = 1),
       |recon AS (
       |  SELECT a.vec_id, flatten(list(cb.qc ORDER BY a.s)) AS r
       |  FROM assign a JOIN cb ON cb.s = a.s AND cb.code = a.code
       |  GROUP BY a.vec_id),
       |q AS (SELECT vec_id AS query_id, v AS qv,
       |             list_transform(v, x -> greatest(-127,
       |               least(127, CAST(floor(x*64) AS INT)))) AS qq
       |      FROM e WHERE vec_id < 5),
       |coarse AS (
       |  SELECT query_id, r.vec_id AS neighbor_id,
       |         CAST(list_dot_product(r.r, r.r) AS BIGINT)
       |         - 2*CAST(list_dot_product(qq, r.r) AS BIGINT) AS coarse
       |  FROM recon r, q WHERE r.vec_id <> query_id),
       |cr AS (SELECT query_id, neighbor_id,
       |              row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY coarse, neighbor_id) AS crank
       |       FROM coarse),
       |cand AS (SELECT query_id, neighbor_id FROM cr WHERE crank <= $PqCoarseK),
       |rer AS (SELECT c.query_id, c.neighbor_id,
       |               list_cosine_similarity(q.qv, e.v) AS sim
       |        FROM cand c
       |        JOIN q ON q.query_id = c.query_id
       |        JOIN e ON e.vec_id = c.neighbor_id),
       |r AS (SELECT query_id, neighbor_id, sim,
       |             row_number() OVER (PARTITION BY query_id
       |                                ORDER BY sim DESC, neighbor_id) AS rank
       |      FROM rer)
       |SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim
       |FROM r WHERE rank <= 10""".stripMargin
  }

  /** s19 — composed IVF-PQ ANN (VERDICT r15 missing-capability #2):
    * s07's trained coarse cells and s17's PQ codes in their canonical
    * composition — PQ codebooks trained on RESIDUALS `v − c(v)` within
    * cells, queries probing nprobe cells and integer-ADC-scoring only
    * those cells' codes, exact rerank last. The centroid training is
    * SHARED with s07 (same memo, same bounded collect); the residual
    * codebooks add one more k-means over the same sample. Both trained
    * structures embed into the DuckDB oracle as VALUES at dump time.
    * IvfPqSpec measures recall@10 against brute-force cosine. */
  def annIvfPq(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = scan(spark, sfDir, "embeddings")
    val (cents, cbs) = trainedIvfPq(spark, sfDir)
    Similarity.ivfPqTopK(emb.where(col("vec_id") < 5), emb, cents, cbs,
      k = 10, nprobe = 2, coarseK = PqCoarseK)
  }

  private val ivfPqCache = new scala.collection.concurrent.TrieMap[
    String, (Array[Array[Double]], Array[Array[Array[Double]]])]()
  @volatile private var lastIvfPq:
      Option[(Array[Array[Double]], Array[Array[Array[Double]]])] = None

  private def trainedIvfPq(spark: SparkSession, sfDir: String)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val pair = ivfPqCache.getOrElseUpdate(sfDir, {
      val cents = trainedCentroids(spark, sfDir) // s07's memo, shared
      val cbs = Similarity.trainResidualPQ(
        scan(spark, sfDir, "embeddings"), cents, m = PqM, k = PqK)
      (cents, cbs)
    })
    lastIvfPq = Some(pair)
    pair
  }

  /** DuckDB twin of ivfPqTopK — the s07 assignment/probe SQL composed
    * with the s17 subspace-argmin/integer-ADC SQL, on residuals. The
    * coarse score carries qnorm2 (it varies per probed cell — see the
    * ivfPqTopK scaladoc), every dot product CASTs to BIGINT under the
    * s17 exactness bound, and ties break (coarse, neighbor_id) /
    * (sim DESC, neighbor_id). Dumping before s19 ran fails fast (r15
    * advice: loud beats a confusing numeric diff). */
  private def annIvfPqOracle: String = {
    val (cents, cbs) = OracleDump.resolve(ivfPqCache, lastIvfPq)
      .getOrElse(throw new IllegalStateException(
      "s19 oracle dumped before s19_ann_ivfpq ran in this JVM — run the " +
        "query first (Verify does; ad-hoc dumps must too)"))
    val qcb = Similarity.quantizePQ(cbs)
    val sub = cbs(0)(0).length
    val centRows = cents.zipWithIndex
      .map { case (c, i) => s"($i, ${vecLit(c)})" }
    val cbRows = for { s <- cbs.indices; code <- cbs(s).indices }
      yield s"($s, $code, ${vecLit(cbs(s)(code))}, ${intLit(qcb(s)(code))})"
    val subspaces = cbs.indices.map(s => s"($s)").mkString(", ")
    s"""WITH cents(cell, c) AS (VALUES
       |  ${centRows.mkString(",\n  ")}),
       |cb(s, code, c, qc) AS (VALUES
       |  ${cbRows.mkString(",\n  ")}),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |adist AS (
       |  SELECT e.vec_id, ct.cell, list_distance(e.v, ct.c) AS dist
       |  FROM e, cents ct),
       |assign AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY dist, cell) AS rn
       |    FROM adist) WHERE rn = 1),
       |resid AS (
       |  SELECT e.vec_id, a.cell,
       |         list_transform(range(1, len(e.v)+1),
       |           i -> e.v[CAST(i AS INT)] - ct.c[CAST(i AS INT)]) AS r
       |  FROM e JOIN assign a USING (vec_id)
       |  JOIN cents ct ON ct.cell = a.cell),
       |sub AS (
       |  SELECT vec_id, s, r[s*$sub+1:(s+1)*$sub] AS sv
       |  FROM resid, (VALUES $subspaces) ss(s)),
       |passign AS (
       |  SELECT vec_id, s, code FROM (
       |    SELECT sub.vec_id, sub.s, cb.code,
       |           row_number() OVER (PARTITION BY sub.vec_id, sub.s
       |                              ORDER BY list_distance(sub.sv, cb.c),
       |                                       cb.code) AS rn
       |    FROM sub JOIN cb USING (s)) WHERE rn = 1),
       |recon AS (
       |  SELECT a.vec_id, flatten(list(cb.qc ORDER BY a.s)) AS rr
       |  FROM passign a JOIN cb ON cb.s = a.s AND cb.code = a.code
       |  GROUP BY a.vec_id),
       |enc AS (
       |  SELECT r.vec_id AS neighbor_id, a.cell, rr,
       |         CAST(list_dot_product(rr, rr) AS BIGINT) AS rnorm2
       |  FROM recon r JOIN assign a ON a.vec_id = r.vec_id),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |qp AS (
       |  SELECT query_id, cell FROM (
       |    SELECT q.query_id, ct.cell,
       |           row_number() OVER (PARTITION BY q.query_id
       |                              ORDER BY list_distance(q.qv, ct.c),
       |                                       ct.cell) AS rn
       |    FROM q, cents ct) WHERE rn <= 2),
       |qn AS (
       |  SELECT qp.query_id, qp.cell, qq,
       |         CAST(list_dot_product(qq, qq) AS BIGINT) AS qnorm2
       |  FROM (SELECT qp.query_id, qp.cell,
       |               list_transform(
       |                 list_transform(range(1, len(q.qv)+1),
       |                   i -> q.qv[CAST(i AS INT)] - ct.c[CAST(i AS INT)]),
       |                 x -> greatest(-127,
       |                   least(127, CAST(floor(x*64) AS INT)))) AS qq
       |        FROM qp JOIN q USING (query_id)
       |        JOIN cents ct ON ct.cell = qp.cell) qp),
       |coarse AS (
       |  SELECT qn.query_id, enc.neighbor_id,
       |         qn.qnorm2
       |         - 2*CAST(list_dot_product(qn.qq, enc.rr) AS BIGINT)
       |         + enc.rnorm2 AS coarse
       |  FROM enc JOIN qn ON qn.cell = enc.cell
       |  WHERE enc.neighbor_id <> qn.query_id),
       |cr AS (SELECT query_id, neighbor_id,
       |              row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY coarse, neighbor_id) AS crank
       |       FROM coarse),
       |cand AS (SELECT query_id, neighbor_id FROM cr WHERE crank <= $PqCoarseK),
       |rer AS (SELECT c.query_id, c.neighbor_id,
       |               list_cosine_similarity(q.qv, e.v) AS sim
       |        FROM cand c
       |        JOIN q ON q.query_id = c.query_id
       |        JOIN e ON e.vec_id = c.neighbor_id),
       |r AS (SELECT query_id, neighbor_id, sim,
       |             row_number() OVER (PARTITION BY query_id
       |                                ORDER BY sim DESC, neighbor_id) AS rank
       |      FROM rer)
       |SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim
       |FROM r WHERE rank <= 10""".stripMargin
  }

  /** s18 — video-level near-dup via keyframe-fingerprint containment
    * (the video twin of s16's image dedup, the shape real pipelines use
    * for re-encode detection): each video's payload is cut into
    * fixed-length keyframes, every frame gets a content fingerprint,
    * and two videos are near-duplicates when the smaller one's frames
    * are ≥ 80% contained in the other. Catches the classic re-encodes —
    * a TRIMMED copy (tail dropped) shares every complete frame and
    * scores 1.0; a half-rewritten video shares ~50% and is correctly
    * excluded. Planted in-query like t17/t27: docs `id%10==3` carry a
    * tail-trimmed copy (+2,000,000), docs `id%10==6` a half-mutated
    * negative control (+3,000,000).
    *
    * The 100 TB shape: frames are built NARROWLY — `posexplode` over a
    * codegen'd `sequence` of frame numbers, fingerprint =
    * `sha2(substring(payload))` computed in the same projection, so
    * payload bytes never leave the scan stage; the distinct and the
    * candidate equi-join move only (asset_id, 16-char hash) pairs
    * (t30's gram-join shape — no broadcast assumption, a corpus-scale
    * frame index shuffles on fixed-width keys); the containment
    * denominator joins per-asset frame counts back by id. Identical
    * frames WITHIN a video collapse at the distinct, so a
    * boilerplate-heavy video cannot quadratically inflate its own
    * pairs; and candidate pairs come only from frames whose CORPUS
    * document frequency is ≤ [[VideoMaxFrameDf]] (the t31 two-phase
    * shape: the df cap is a performance gate on candidate generation —
    * a fingerprint shared by F assets would otherwise emit O(F²) join
    * pairs, and black frames / boilerplate intros are exactly such hot
    * keys at corpus scale — while the exact verify join recomputes
    * n_shared over ALL frames, ubiquitous ones included, so a
    * surfaced pair's containment score is unchanged). The one
    * semantic delta, documented: a pair whose EVERY shared frame is
    * ubiquitous (> cap assets) is not surfaced — such frames carry no
    * dedup signal (they don't distinguish a re-encode from two
    * unrelated videos with the same intro slate). */
  def videoNearDup(spark: SparkSession, sfDir: String): DataFrame =
    videoLayout(scan(spark, sfDir, "documents"),
      frameLen = 32, threshold = 0.8)

  /** Ubiquity cap for s18 candidate generation: a frame fingerprint
    * held by more than this many assets is boilerplate, not signal.
    * Shared engine/oracle constant (the s14 sense — an operator
    * parameter both sides apply independently). */
  val VideoMaxFrameDf = 50

  /** The containment core behind [[videoNearDup]], public for specs:
    * input (doc_id, text), output (id_a, id_b, n_shared, overlap). */
  def videoLayout(docs: DataFrame, frameLen: Int, threshold: Double,
                  maxFrameDf: Int = VideoMaxFrameDf): DataFrame = {
    require(frameLen >= 1 && threshold > 0 && threshold <= 1 && maxFrameDf >= 1)
    val base = docs.select(col("doc_id").as("asset_id"),
      col("text").as("payload"))
    val trimmed = docs.where(pmod(col("doc_id"), lit(10)) === 3)
      .select((col("doc_id") + 2000000L).as("asset_id"),
        expr("substring(text, 1, greatest(length(text) - 80, 0))")
          .as("payload"))
    val halfMod = docs.where(pmod(col("doc_id"), lit(10)) === 6)
      .select((col("doc_id") + 3000000L).as("asset_id"),
        expr("substring(text, 1, CAST(length(text) / 2 AS INT)) || " +
          "upper(substring(text, CAST(length(text) / 2 AS INT) + 1))")
          .as("payload"))
    // explicit non-null key below the shared frame exchange (see the
    // t38 twin): joins on id_a/id_b would infer isnotnull(asset_id) on
    // their branches only, breaking sameResult for ReuseExchange
    val assets = base.unionAll(trimmed).unionAll(halfMod)
      .where(col("asset_id").isNotNull)
    // complete frames only: frame f covers chars [f*len+1, (f+1)*len];
    // a payload shorter than one frame gets an EMPTY array (sequence
    // with start > stop would generate a DESCENDING one) and drops at
    // the non-outer explode
    val nf = (length(col("payload")) / frameLen).cast("int")
    val frames = assets
      .select(col("asset_id"), col("payload"),
        explode(when(nf >= 1, sequence(lit(0), nf - 1))
          .otherwise(array().cast("array<int>"))).as("fno"))
      .select(col("asset_id"),
        substring(sha2(expr(s"substring(payload, fno * $frameLen + 1, " +
          s"$frameLen)"), 256), 1, 16).as("fh"))
      .distinct()
      // fingerprint ONCE (the s16 ReuseExchange idiom): five consumers
      // (per-asset counts, df agg, rare join, both exact-verify joins)
      // hang off `frames` — a common fh-keyed Exchange lets
      // ReuseExchange materialize the explode+sha2 pass once instead of
      // once per consumer (the r16 cap fix had doubled s18's measured
      // cost by adding consumers; see BASELINE round-16)
      .repartition(col("fh"))
    // count(fh)/count(asset_id), not count(*) — the t36 trick: each agg
    // references the column its groupBy does NOT, so column pruning
    // cannot shrink the distinct's output below (asset_id, fh) on any
    // branch and every consumer stays sameResult on the ONE fh-keyed
    // Exchange (both columns are non-null: counts are equal)
    val counts = frames.groupBy(col("asset_id"))
      .agg(count(col("fh")).as("nfr"))
    // candidate gate: only non-ubiquitous fingerprints (df ≤ cap) pair
    // assets — the hot-key O(df²) blowup dies here, before any pair
    // exists. One extra exchange on fh (the dfreq agg reuses the frame
    // shuffle's key), nothing wider than (asset_id, fh) moves.
    val rareFh = frames.groupBy(col("fh"))
      .agg(count(col("asset_id")).as("fdf"))
      .where(col("fdf") <= maxFrameDf)
      .select(col("fh"))
    val rare = frames.join(rareFh, Seq("fh"))
    val cand = rare.select(col("asset_id").as("id_a"), col("fh"))
      .join(rare.select(col("asset_id").as("id_b"), col("fh")), Seq("fh"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    // exact verify over ALL frames (ubiquitous included) for candidate
    // pairs only — the cap gates performance, not the containment count
    val shared = cand
      .join(frames.select(col("asset_id").as("id_a"), col("fh")), Seq("id_a"))
      .join(frames.select(col("asset_id").as("id_b"), col("fh")),
        Seq("id_b", "fh"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(counts.select(col("asset_id").as("id_a"), col("nfr").as("na")),
        Seq("id_a"))
      .join(counts.select(col("asset_id").as("id_b"), col("nfr").as("nb")),
        Seq("id_b"))
      .withColumn("overlap",
        (col("n_shared").cast("double") / least(col("na"), col("nb"))
          .cast("double")).cast("decimal(28,6)").cast("double"))
      .where(col("overlap") >= threshold)
      .select(col("id_a"), col("id_b"), col("n_shared"), col("overlap"))
  }

  private def videoNearDupOracle =
    s"""-- df-capped candidates (fdf <= $VideoMaxFrameDf), exact verify
       |-- over all frames: the engine's two-phase shape, mirrored
       |""".stripMargin +
    s"""WITH assets AS (
      |  SELECT doc_id AS asset_id, text AS payload FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000, substring(text, 1, greatest(length(text) - 80, 0))
      |  FROM documents WHERE doc_id % 10 = 3
      |  UNION ALL
      |  SELECT doc_id + 3000000,
      |         substring(text, 1, length(text) // 2)
      |         || upper(substring(text, length(text) // 2 + 1))
      |  FROM documents WHERE doc_id % 10 = 6),
      |fx AS (
      |  SELECT asset_id, payload,
      |         unnest(generate_series(0, length(payload) // 32 - 1)) AS fno
      |  FROM assets),
      |fr AS (
      |  SELECT DISTINCT asset_id,
      |         substr(sha256(substring(payload, fno * 32 + 1, 32)), 1, 16) AS fh
      |  FROM fx),
      |cnt AS (SELECT asset_id, count(*) AS nfr FROM fr GROUP BY 1),
      |rarefh AS (SELECT fh FROM fr GROUP BY fh
      |           HAVING count(*) <= $VideoMaxFrameDf),
      |rare AS (SELECT fr.asset_id, fr.fh FROM fr JOIN rarefh USING (fh)),
      |cand AS (
      |  SELECT DISTINCT a.asset_id AS id_a, b.asset_id AS id_b
      |  FROM rare a JOIN rare b ON a.fh = b.fh AND a.asset_id < b.asset_id),
      |sh AS (
      |  SELECT c.id_a, c.id_b, count(*) AS n_shared
      |  FROM cand c
      |  JOIN fr a ON a.asset_id = c.id_a
      |  JOIN fr b ON b.asset_id = c.id_b AND b.fh = a.fh
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b, n_shared,
      |       CAST(CAST(CAST(n_shared AS DOUBLE) / least(ca.nfr, cb.nfr)
      |            AS DECIMAL(28,6)) AS DOUBLE) AS overlap
      |FROM sh
      |JOIN cnt ca ON ca.asset_id = id_a
      |JOIN cnt cb ON cb.asset_id = id_b
      |WHERE CAST(CAST(CAST(n_shared AS DOUBLE) / least(ca.nfr, cb.nfr)
      |           AS DECIMAL(28,6)) AS DOUBLE) >= 0.8""".stripMargin

  /** Mean-pooling: chunk embeddings pooled back to one vector per parent
    * (grp = vec_id % 50 stands in for the chunk→doc mapping). Shaped as
    * posexplode → one map-side-combined shuffle on (grp, pos) — per-element
    * double sums would be order-dependent across partitionings, so each
    * addend is widened to DECIMAL(38,18) (exact for float inputs modulo a
    * fixed cut) and summed exactly; the mean is cast back to double at the
    * end. At 100 TB this is the canonical "pool N chunk vectors per doc"
    * shape: no window, no collect, linear shuffle of (grp, pos, decimal). */
  def embeddingPool(spark: SparkSession, sfDir: String): DataFrame =
    scan(spark, sfDir, "embeddings")
      .select((col("vec_id") % 50).cast("long").as("grp"),
        posexplode(col("embedding")))
      .groupBy(col("grp"), col("pos").cast("int").as("pos"))
      // divide in DOUBLE after the exact decimal sum: decimal division
      // rescales (and half-up rounds) differently per engine
      .agg((sum(col("col").cast("double").cast("decimal(38,18)"))
        .cast("double") / count(lit(1))).as("avg_val"))
      // round via double->DECIMAL(28,6)->double, not round(x, 6): a mean
      // can land exactly on a 5e-7 decimal boundary where Spark (rounds
      // the shortest decimal repr) and DuckDB (rounds the scaled double)
      // disagree; no 7-digit decimal is exactly representable in binary,
      // so the decimal cast never sees a tie and both engines round the
      // same exact binary value identically
      .select(col("grp"), col("pos"),
        col("avg_val").cast("decimal(28,6)").cast("double").as("avg_val"))

  private val embeddingPoolOracle =
    """WITH x AS (
      |  SELECT vec_id, embedding,
      |         unnest(generate_series(1, len(embedding))) AS i
      |  FROM embeddings)
      |SELECT vec_id % 50 AS grp, CAST(i - 1 AS INTEGER) AS pos,
      |       CAST(CAST(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE)
      |               / COUNT(*) AS DECIMAL(28,6)) AS DOUBLE) AS avg_val
      |FROM x GROUP BY 1, 2""".stripMargin

  /** Quantized two-stage ANN (SQ8 coarse scan → exact float rerank) —
    * s09's codes actually SEARCHED, the capability the quantization pass
    * exists for. The 100 TB shape lives in [[Similarity.quantizedTopK]]:
    * the coarse scan reads 64 B of int8 codes per corpus row (never the
    * floats), the top-coarseK window shuffles only narrow id/score
    * triples, and exact cosine runs on the ~coarseK×|queries| candidate
    * fetch alone. The candidate set is pure integer arithmetic — exact
    * in every engine — so the full pipeline is value-oracled (candidate
    * boundary included), not merely recall-tested; SimilaritySpec
    * additionally measures recall@10 vs the s01 exact baseline. */
  def annQuantized(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = scan(spark, sfDir, "embeddings")
    Similarity.quantizedTopK(emb.where(col("vec_id") < 5), emb, k = 10)
  }

  /** DuckDB twin of quantizedTopK: same SQ8 codes (floor(x·64) clamp
    * ±127 — double math, integer-exact), same integer coarse dot (the
    * DOUBLE list_dot_product is exact below 2^53), same crank<=50
    * boundary with id tie-break, same exact-cosine rerank. */
  private val annQuantizedOracle =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |         list_transform(embedding::DOUBLE[],
      |           x -> greatest(-127.0, least(127.0, floor(x * 64)))) AS q
      |  FROM embeddings),
      |qs AS (SELECT vec_id AS query_id, v AS qv, q AS qq
      |       FROM e WHERE vec_id < 5),
      |coarse AS (
      |  SELECT query_id, e.vec_id AS neighbor_id,
      |         CAST(list_dot_product(qq, e.q) AS BIGINT) AS coarse
      |  FROM e, qs WHERE e.vec_id <> query_id),
      |cr AS (
      |  SELECT query_id, neighbor_id,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY coarse DESC, neighbor_id) AS crank
      |  FROM coarse),
      |cand AS (SELECT query_id, neighbor_id FROM cr WHERE crank <= 50),
      |rer AS (
      |  SELECT c.query_id, c.neighbor_id,
      |         list_cosine_similarity(qs.qv, e.v) AS sim
      |  FROM cand c
      |  JOIN qs ON qs.query_id = c.query_id
      |  JOIN e ON e.vec_id = c.neighbor_id),
      |r AS (
      |  SELECT query_id, neighbor_id, sim,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY sim DESC, neighbor_id) AS rank
      |  FROM rer)
      |SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim
      |FROM r WHERE rank <= 10""".stripMargin

  /** Int8-style embedding quantization (×64, floor, clamp [-127,127]) —
    * the 4×-storage-compression pass before ANN indexing. floor instead of
    * round: float×64 is exact in double, so floor is tie-free and
    * bit-identical on every engine. Narrow map, zero shuffle; the output
    * here summarizes each quantized vector with integer-exact stats. */
  def embeddingQuantize(spark: SparkSession, sfDir: String): DataFrame = {
    val q = transform(col("embedding"), x =>
      greatest(lit(-127L), least(lit(127L),
        floor(x.cast("double") * 64).cast("long"))))
    scan(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        aggregate(q, lit(0L), (a, v) => a + v).as("q_sum"),
        array_min(q).as("q_min"),
        array_max(q).as("q_max"))
  }

  private val embeddingQuantizeOracle =
    """WITH q AS (
      |  SELECT vec_id,
      |         list_transform(embedding::DOUBLE[],
      |           x -> greatest(-127, least(127, CAST(floor(x * 64) AS BIGINT))))
      |           AS qv
      |  FROM embeddings)
      |SELECT vec_id,
      |       CAST(list_sum(qv) AS BIGINT) AS q_sum,
      |       CAST(list_min(qv) AS BIGINT) AS q_min,
      |       CAST(list_max(qv) AS BIGINT) AS q_max
      |FROM q""".stripMargin

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): pairwise cosine runs
    * only WITHIN coarse k-means cells — the cluster count is what
    * bounds the quadratic (the paper runs ~10⁵ clusters at 5B docs;
    * here the s07-shared k=8 quantizer). A vector is a semantic
    * duplicate when some LOWER-id member of its cell has cosine ≥ 0.8
    * with it (min-id survivor, t01's rule); the documented SemDeDup
    * blind spot — near-dups split across a cell boundary are never
    * compared — applies identically to engine and oracle.
    *
    * The shipped embeddings are random (max corpus cosine ≈ 0.48), so
    * like s04 the query plants its own positives: each vector gets a
    * +0.01-per-component replica (id + 1000000; the embeddings are
    * unit-norm, so the +0.1 first cut dipped to cosine 0.675 — +0.01
    * keeps self-cosine ≥ 0.997, ≈ 0 to everything else) — the 0.8 threshold
    * sits in a wide gap, so engine/DuckDB last-ulp cosine divergence
    * cannot flip a pair.
    *
    * The 100 TB shape: assignment is one narrow pass (native IvfCells
    * argmin-2, centroids broadcast inside the expression) feeding ONE
    * cell-keyed corpus exchange that everything downstream reuses —
    * HashPartitioning(cell) satisfies the pair join's (cell, sub)
    * clustering AND the final (id, cell) aggregation's, so the split
    * sizes (partition-local count window over ~cell-sized runs), the
    * self-join, and the keep-flag aggregation all run on that single
    * materialized stage with zero further corpus shuffles (ReusedExchange,
    * spec-pinned). The in-cell quadratic is bounded by cell size, which
    * the adaptive cluster count controls until its 1024 ceiling and the
    * [[SemCellCap]] second-nearest split bounds past it. Oracled via the s07 dump-time pattern: the trained
    * centroids are embedded as VALUES and DuckDB recomputes assignment,
    * the split, in-cell pairs, cosine, and the survivor rule
    * independently. */
  /** s13's own quantizer cache: unlike s07's fixed k=8 (whose 64-vs-4096
    * plan pins depend on that contract), the SemDeDup cluster count is
    * THE scale knob — k = clamp(8, 1024, N/1000), so cells stay
    * ~1000-membered and the in-cell quadratic is corpus-linear (at a
    * fixed k it grows N²/k: the ×100-hot world would be ~10B pairs at
    * k=8, ~400M at the adaptive k=200). k depends only on the corpus
    * count — deterministic, and the oracle embeds whatever was
    * trained. */
  private val semCache =
    new scala.collection.concurrent.TrieMap[String, Array[Array[Double]]]()
  @volatile private var lastTrainedSem: Option[Array[Array[Double]]] = None

  /** The adaptive cluster count: cells stay ~1000-membered, so the
    * in-cell quadratic is corpus-linear until the 1024 cap (~1M
    * vectors). Past the cap, cells that outgrow [[SemCellCap]] split by
    * second-nearest centroid before pair generation (r16 verdict item
    * 2) — the quadratic stays bounded with no retraining and no fleet
    * knob. Public so the clamp floor/ceiling are spec'd, not narrated
    * (SimilaritySpec). */
  def semK(n: Long): Int =
    math.max(8L, math.min(1024L, n / 1000L)).toInt

  private def semCentroids(spark: SparkSession,
                           sfDir: String): Array[Array[Double]] = {
    val cents = semCache.getOrElseUpdate(sfDir, {
      val emb = scan(spark, sfDir, "embeddings")
      val k = semK(emb.count())
      Similarity.trainCentroids(emb, k = k,
        maxSample = math.max(1024, 16 * k))
    })
    lastTrainedSem = Some(cents)
    cents
  }

  /** Oversize-cell cap: cells whose membership exceeds this split by
    * SECOND-nearest centroid before the in-cell quadratic. The adaptive
    * [[semK]] keeps cells ~2000-membered (corpus + replicas) until its
    * 1024 ceiling (~1M vectors); past the ceiling cells regrow as
    * 2N/1024, and at ~2M vectors they cross this cap — the split then
    * bounds the quadratic again WITHOUT retraining (the sub-key is the
    * rn=2 row of the same (dist, cell) order the rn=1 assignment uses,
    * so the oracle mirrors it exactly). The recall cost is the SemDeDup
    * cell-boundary blind spot applied one level down: near-dups whose
    * second-nearest centroids differ are no longer compared — accepted
    * and documented, like the paper's first level. 4096 ≈ 2× the design
    * cell size, so the split only activates where the geometry has
    * already outgrown the adaptive-k band (never at the gate SFs or the
    * ×10/×100 cells — SemSubBucketSpec proves activation and bounds on
    * a planted hot cell instead). */
  val SemCellCap = 4096

  /** The sub-bucketed keyed assignment behind [[semanticDedup]], public
    * for SemSubBucketSpec: (vec_id, cell, sub, vf) where `sub` is the
    * second-nearest cell for members of oversize cells and -1 (one
    * bucket, the pre-split behavior) everywhere else. Pair generation
    * joins on (cell, sub). */
  def semKeyed(emb: DataFrame, cents: Array[Array[Double]],
               cap: Int): DataFrame = {
    // v (double) drives the cell argmin; vf (float) drives the pair
    // cosine through the native fused FloatCosine — the interpreted
    // zip_with/aggregate fold was the whole cost at bench scale
    // (19.7 → ~1.0 s at sf0.1). The replica perturbs in double and
    // IEEE-rounds back to float, which DuckDB mirrors exactly as
    // CAST(... AS REAL[]); FloatCosine accumulates in double, so
    // list_cosine_similarity over the ::DOUBLE[] of the same floats is
    // bit-identical.
    val base = emb.select(col("vec_id"),
      Similarity.asDouble(col("embedding")).as("v"),
      col("embedding").as("vf"))
    val planted = base.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("v"), x => x + lit(0.01)).as("v"))
      .withColumn("vf", col("v").cast("array<float>"))
    // ONE corpus exchange, keyed by cell — HashPartitioning(cell)
    // satisfies the pair join's ClusteredDistribution(cell, sub) (sub is
    // a function of rows inside a cell), so no second shuffle is ever
    // needed, and both self-join sides consume the SAME materialized
    // stage (ReusedExchange — the s16/t38 pattern, pinned in
    // SemSubBucketSpec). Cell sizes come from a partition-local count
    // window over the already-exchanged data (cells are ~2·semK-target
    // rows, so the in-partition sort is bounded), replacing the r17-draft
    // broadcast-aggregate that re-scanned and re-assigned the corpus.
    // Net per run: 2 scans, ONE argmin pass, one corpus exchange — the
    // pre-r17 shape paid 8 scans and 4 argmin passes (3 consumers plus
    // the size aggregate, no stage reuse because the keep-flag branch
    // pruned vf out of its copy of the subtree).
    base.unionByName(planted)
      .withColumn("cc", Similarity.assignCells(col("v"), cents, 2))
      // coalesce makes cell/sub NON-NULLABLE (array extraction is
      // nullable to Catalyst even though ivfcells never returns nulls):
      // otherwise the join infers isnotnull filters on the build side's
      // copy of this subtree only, the copies stop canonicalizing equal,
      // and the stage cache materializes the exchange twice.
      .select(col("vec_id"), col("vf"),
        coalesce(col("cc")(0), lit(-1)).as("cell"),
        coalesce(col("cc")(1), lit(-1)).as("cell2"))
      .repartition(col("cell"))
      .withColumn("cell_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cell"))))
      .select(col("vec_id"), col("cell"),
        coalesce(when(col("cell_n") > cap, col("cell2")), lit(-1))
          .as("sub"),
        col("vf"))
  }

  def semanticDedup(spark: SparkSession, sfDir: String): DataFrame =
    semanticDedupLayout(spark, scan(spark, sfDir, "embeddings"),
      semCentroids(spark, sfDir), SemCellCap)

  /** The full SemDeDup pipeline over a caller-supplied corpus/quantizer/
    * cap — [[semanticDedup]] binds the harness corpus and [[SemCellCap]];
    * SemSubBucketSpec binds a planted hot cell and a small cap to
    * value-check the SPLIT-ACTIVE path against a plain-Scala brute force
    * (the gate SFs keep the production cap dormant by design, so the
    * driver's oracle can't exercise it). */
  def semanticDedupLayout(spark: SparkSession, emb: DataFrame,
                          cents: Array[Array[Double]],
                          cap: Int): DataFrame = {
    graft.functions.FloatCosine.register(spark)
    val keyed = semKeyed(emb, cents, cap)
    val a = keyed.select(col("cell"), col("sub"), col("vec_id").as("id_a"),
      col("vf").as("vfa"))
    val b = keyed.select(col("cell"), col("sub"), col("vec_id").as("id_b"),
      col("vf").as("vfb"))
    // LEFT OUTER pair join: every a-row survives (null b when no lower-id
    // neighbor), so the per-vector dup count AND the keep flag fall out
    // of ONE aggregation over the join — no third consumption of `keyed`
    // for a keep-flag join-back. (A third consumer needed only
    // (vec_id, cell); column pruning then rewrote its copy of the keyed
    // subtree without vf, the copies stopped canonicalizing equal, and
    // the stage cache materialized the scan+argmin THREE times.)
    // n_sem_dups counts the LOWER-id near-dups of each vector — the same
    // quantity the old (id_a < id_b GROUP BY id_b) form produced.
    a.join(b,
        a("cell") === b("cell") && a("sub") === b("sub") &&
          b("id_b") < a("id_a") &&
          expr("float_cosine(vfa, vfb)") >= 0.8,
        "left_outer")
      .groupBy(a("id_a"), a("cell"))
      .agg(count(col("id_b")).as("n_sem_dups"))
      .select(col("id_a").as("vec_id"), col("cell"),
        col("n_sem_dups"),
        when(col("n_sem_dups") === 0L, lit(1)).otherwise(lit(0))
          .as("keep_flag"))
  }

  /** DuckDB twin of semanticDedup, built at dump time from the
    * adaptively-sized trained centroids (the s07 `lastTrained` contract,
    * separate cache): assignment
    * argmin (ties → lowest cell, matching IvfCell's strict <), the
    * planted +0.1 replicas, the oversize-cell second-nearest split (the
    * rn=2 row of the SAME (dist, cell) window — IvfCells' probe order),
    * in-(cell, sub) lower-id pair counts, the 0.8 threshold, and the
    * keep flag — all recomputed independently. */
  private def semanticDedupOracle: String = {
    val cents = OracleDump.resolve(semCache, lastTrainedSem)
      .getOrElse(Similarity.hyperplanes(8, 64, 11L))
    val rows = cents.zipWithIndex.map {
      case (c, i) => s"($i, ${vecLit(c)})"
    }
    s"""WITH cents(cell, c) AS (VALUES
       |  ${rows.mkString(",\n  ")}),
       |base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |all_e AS (
       |  SELECT vec_id, v, v AS vf FROM base
       |  UNION ALL
       |  SELECT vec_id + 1000000, list_transform(v, x -> x + 0.01) AS v,
       |         CAST(list_transform(v, x -> x + 0.01) AS REAL[])::DOUBLE[] AS vf
       |  FROM base),
       |dists AS (
       |  SELECT e.vec_id, ct.cell, list_distance(e.v, ct.c) AS dist
       |  FROM all_e e, cents ct),
       |assign AS (
       |  SELECT d.vec_id, d.cell, d.cell2, e.vf FROM (
       |    SELECT vec_id,
       |           max(CASE WHEN rn = 1 THEN cell END) AS cell,
       |           max(CASE WHEN rn = 2 THEN cell END) AS cell2
       |    FROM (
       |      SELECT vec_id, cell,
       |             row_number() OVER (PARTITION BY vec_id
       |                                ORDER BY dist, cell) AS rn
       |      FROM dists) WHERE rn <= 2 GROUP BY vec_id) d
       |  JOIN all_e e USING (vec_id)),
       |sz AS (SELECT cell, count(*) AS n FROM assign GROUP BY 1),
       |k AS (
       |  SELECT a.vec_id, a.cell,
       |         CASE WHEN s.n > ${SemCellCap} THEN a.cell2 ELSE -1 END
       |           AS sub,
       |         a.vf
       |  FROM assign a JOIN sz s USING (cell)),
       |p AS (
       |  SELECT b.vec_id, count(*) AS n
       |  FROM k a JOIN k b
       |    ON a.cell = b.cell AND a.sub = b.sub AND a.vec_id < b.vec_id
       |  WHERE list_cosine_similarity(a.vf, b.vf) >= 0.8
       |  GROUP BY 1)
       |SELECT a.vec_id, a.cell,
       |       CAST(coalesce(p.n, 0) AS BIGINT) AS n_sem_dups,
       |       CASE WHEN p.vec_id IS NULL THEN 1 ELSE 0 END AS keep_flag
       |FROM assign a LEFT JOIN p USING (vec_id)""".stripMargin
  }

  /** ANN-fed cosine near-dup — the SCALE SHAPE whose bounded all-pairs
    * primitive is s05: LSH bucket candidates ([[Similarity.lshNearDupPairs]],
    * a (table, code) equi-join — no crossJoin anywhere in the plan) feed
    * the exact cosine threshold. Like s13 the query plants its own
    * positives (+0.01-per-component replicas at id+1e6, self-cosine ≥
    * 0.997 on the unit-norm corpus, ≈0 to everything else — the 0.8
    * threshold sits in a wide gap, so last-ulp engine divergence cannot
    * flip a pair). The oracle is class-load deterministic (seeded
    * hyperplanes as VALUES, like s02): DuckDB rebuilds the codes with the
    * same sign-bit arithmetic, the candidate equi-join, the float
    * round-trip of the replicas, the cosine, and the threshold —
    * a candidate pair missed by LSH is missed identically on both sides,
    * so the oracle is exact regardless of recall; SimilaritySpec pins
    * recall separately against the all-pairs exact set (s05's shape). */
  /** s15's corpus: embeddings ∪ +0.01-per-component replicas — extracted
    * so the independent recall probe ([[graft.tools.RecallProbe]])
    * brute-forces ground truth over the EXACT corpus the LSH pipeline
    * sees. */
  private[graft] def annCorpus(spark: SparkSession,
                               sfDir: String): DataFrame = {
    val emb = scan(spark, sfDir, "embeddings")
    val base = emb.select(col("vec_id"), col("embedding"))
    val planted = emb.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(Similarity.asDouble(col("embedding")), x => x + lit(0.01))
        .cast("array<float>").as("embedding"))
    base.unionByName(planted)
  }

  def annCosineNearDup(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.lshNearDupPairs(annCorpus(spark, sfDir), threshold = 0.8)

  /** RECALL-COMPLETE brute-force oracle (r14 verdict item 5, the s16
    * pattern extended to s15): all pairs, exact cosine, threshold — NO
    * shared candidate constants. The former oracle rebuilt the engine's
    * hyperplane codes from the same seeds, so a pair the LSH missed was
    * missed identically on both sides and recall was structurally
    * unverifiable at the gate; this oracle demands the engine recover
    * EVERY ≥0.8 pair. Affordable and honest because the corpus's sim
    * distribution has a measured chasm around the threshold (sf0.01:
    * 500 surviving pairs all in [0.9968, 0.9973]; ZERO pairs anywhere in
    * [0.75, 0.99)); at that margin the fixed 6×8-plane geometry's
    * per-pair all-tables miss probability is ~1e-4 and the engine
    * measures exact truth-set equality (verified before switching; the
    * ×10 RecallProbe had already measured recall 1.0 on both axes).
    * A recall-damaging engine mutation (fewer tables/planes) now FAILS
    * the gate — recorded in BASELINE.md round-15. */
  private val annCosineNearDupOracle: String =
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |all_e AS (
       |  SELECT vec_id, v FROM base
       |  UNION ALL
       |  SELECT vec_id + 1000000,
       |         CAST(list_transform(v, x -> x + 0.01) AS REAL[])::DOUBLE[] AS v
       |  FROM base),
       |s AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |         list_cosine_similarity(a.v, b.v) AS sim
       |  FROM all_e a, all_e b WHERE a.vec_id < b.vec_id)
       |SELECT id_a, id_b, round(sim, 6) AS sim
       |FROM s WHERE sim >= 0.8""".stripMargin

  /** s16 — perceptual-hash image near-dup (the LAION/DataComp-style
    * image dedup step): synthesize the corpus's PNGs with planted
    * near-duplicate copies (`id % 10 == 7` carries a one-pixel-bumped
    * copy of id-7's image), REAL-decode them with ImageIO, compute the
    * exact integer 64-bit average-hash ([[graft.multimodal.Multimodal.aHash64]]),
    * and emit all pairs within Hamming distance 3 via a banded equi-join.
    *
    * Unlike t29/s15 (probabilistic LSH recall, oracle shares the band
    * constants), this operator's candidate stage is PROVABLY lossless:
    * 4 disjoint 16-bit bands and threshold 3 mean any qualifying pair
    * has at least one identical band (pigeonhole), so the DuckDB oracle
    * can brute-force ALL pairs independently and demand exact set
    * equality — a recall-complete check, not a shared-constants echo.
    *
    * The 100 TB shape: decode+hash is one narrow mapPartitions; only
    * (asset_id, hash_hi, hash_lo) — 24 bytes/row — survives to the join,
    * so payloads never shuffle (PlanAuditSpec pins binary-free band
    * exchanges). At billions of images the 16-bit bands would need
    * widening (e.g. 32-bit bands over a 128-bit pHash) to keep bucket
    * collision counts flat — band width scales with log(corpus), the
    * join stays the same equi-join. */
  def imageNearDup(spark: SparkSession, sfDir: String): DataFrame =
    imageHashPairs(
      graft.multimodal.Multimodal.imageAHashes(
        graft.multimodal.Multimodal.synthesizeImageAssetsNearDup(
          scan(spark, sfDir, "documents"), "doc_id")).toDF(),
      maxHamming = 3)

  /** The banded Hamming join behind [[imageNearDup]]: the s16 geometry —
    * a 64-bit hash in two 32-bit words, 4×16-bit bands, lossless to
    * Hamming 3 (pigeonhole). The general form is [[bandedHammingPairs]];
    * this wrapper keeps s16's call site and oracle unchanged. */
  def imageHashPairs(hashes: DataFrame, maxHamming: Int): DataFrame =
    bandedHammingPairs(hashes, Seq("hash_hi", "hash_lo"),
      bandBits = 16, maxHamming = maxHamming)

  /** Banded Hamming near-dup join at ANY band geometry — the scaladoc's
    * "at billions of images, widen the bands" made executable (r14
    * verdict item 7). Input: `idCol = asset_id` plus `wordCols`, each an
    * unsigned 32-bit word of the hash in a long (most-significant word
    * first); a 128-bit pHash is four words. `bandBits` ∈ {8, 16, 32}
    * tiles each word; band count = 32·words/bandBits.
    *
    * LOSSLESSNESS (pigeonhole, spec-pinned at multiple geometries by
    * BandedHammingSpec): a pair within Hamming distance d differs in at
    * most d bands, so with B bands and d ≤ B−1 at least one band is
    * IDENTICAL and the equi-join emits the pair. The require below
    * refuses a leaky geometry rather than silently losing recall —
    * a larger radius needs more/narrower bands, never a quiet miss.
    * Bucket sizing is the flip side: at N images a band bucket holds
    * ~N/2^bandBits hashes, so the candidate join is
    * B·N²/2^(bandBits+1) pairs — 32-bit bands hold that flat into the
    * billions (the s16 scaladoc's scale argument), while 8-bit bands
    * are only for small corpora needing wide radii.
    *
    * The band-keyed repartition is NOT redundant with the join's own
    * shuffle: ending both self-join inputs at an IDENTICAL Exchange lets
    * ReuseExchange materialize the upstream (for s16: synthesize +
    * ImageIO decode + hash) ONCE — a bare self-join forks the whole
    * lineage into two full passes (ImageNearDupSpec pins the reuse). */
  def bandedHammingPairs(hashes: DataFrame, wordCols: Seq[String],
                         bandBits: Int, maxHamming: Int): DataFrame = {
    require(Seq(8, 16, 32).contains(bandBits),
      s"bandBits must divide the 32-bit words: got $bandBits")
    require(wordCols.nonEmpty, "need at least one hash word column")
    val nBands = 32 * wordCols.size / bandBits
    require(maxHamming >= 0 && maxHamming <= nBands - 1,
      s"$nBands x$bandBits-bit banding is lossless only for maxHamming <= " +
        s"${nBands - 1}, got $maxHamming — widen/narrow the geometry, " +
        "never run a silently leaky join")
    val mask = (1L << bandBits) - 1
    val bandExprs = wordCols.flatMap { w =>
      (0 until 32 / bandBits).map { k =>
        shiftright(col(w), 32 - bandBits * (k + 1)).bitwiseAND(lit(mask))
      }
    }
    val keep = col("asset_id") +: wordCols.map(col)
    val banded = hashes.select(
      keep :+ posexplode(array(bandExprs: _*)).as(Seq("band_no", "band_val")): _*)
      .repartition(col("band_no"), col("band_val"))
    val ham = wordCols.map(w =>
      bit_count(col(s"a.$w").bitwiseXOR(col(s"b.$w"))))
      .reduce(_ + _).cast("int")
    banded.alias("a")
      .join(banded.alias("b"),
        col("a.band_no") === col("b.band_no") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.asset_id") < col("b.asset_id"))
      .select(col("a.asset_id").as("id_a"), col("b.asset_id").as("id_b"),
        ham.as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  // The oracle rebuilds every hash ARITHMETICALLY (Multimodal.grayMixAt's
  // integer field; near-dup rows use seed = doc_id-7 with +8 at the
  // origin) and brute-forces all pairs — no banding, no decode: an
  // independent, recall-complete twin. Engine bit b = i*8+j from point
  // sample (i*w/8, j*h/8); 64*g >= sum is the division-free mean
  // threshold.
  private val imageNearDupOracle =
    """WITH eff AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 10 = 7 THEN doc_id - 7 ELSE doc_id END AS seed,
      |         CASE WHEN doc_id % 10 = 7 THEN 1 ELSE 0 END AS pert
      |  FROM documents),
      |dims AS (SELECT doc_id, seed, pert,
      |                4 + seed % 29 AS w, 3 + seed % 17 AS h FROM eff),
      |ii AS (SELECT doc_id, seed, pert, w, h,
      |              unnest(generate_series(0, 7)) AS i FROM dims),
      |grid AS (SELECT doc_id, seed, pert, w, h, i,
      |                unnest(generate_series(0, 7)) AS j FROM ii),
      |fxy AS (SELECT doc_id, seed, pert, i, j,
      |               (i * w) // 8 AS fx, (j * h) // 8 AS fy FROM grid),
      |samp AS (
      |  SELECT doc_id, i * 8 + j AS b,
      |         CASE WHEN pert = 1 AND fx = 0 AND fy = 0
      |              THEN (seed + 8) % 256
      |              ELSE (fx*fx*(3 + seed%31) + fy*fy*(5 + seed%29)
      |                    + fx*fy*(1 + seed%13)
      |                    + fx*(3 + seed%251) + fy*(7 + seed%241) + seed) % 256
      |         END AS g
      |  FROM fxy),
      |tot AS (SELECT doc_id, SUM(g) AS s64 FROM samp GROUP BY 1),
      |bits AS (SELECT samp.doc_id AS doc_id, b,
      |                CASE WHEN 64 * g >= s64 THEN 1 ELSE 0 END AS bit
      |         FROM samp JOIN tot ON samp.doc_id = tot.doc_id),
      |h AS (SELECT doc_id,
      |        SUM(CASE WHEN b >= 32 THEN bit * (CAST(1 AS BIGINT) << (b - 32))
      |                 ELSE 0 END)::BIGINT AS hi,
      |        SUM(CASE WHEN b < 32 THEN bit * (CAST(1 AS BIGINT) << b)
      |                 ELSE 0 END)::BIGINT AS lo
      |      FROM bits GROUP BY 1)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |       CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
      |            AS INTEGER) AS hamming
      |FROM h a JOIN h b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3""".stripMargin

  def all: Seq[NamedQuery] = Seq(
    NamedQuery("s01_cosine_topk", cosineTopK, Some(cosineTopKOracle)),
    NamedQuery("s02_ann_lsh", annLsh, Some(annLshOracle)),
    NamedQuery("s07_ann_ivf", annIvf, None, oracleFn = Some(() => annIvfOracle)),
    NamedQuery("s03_minhash_neardup", minhashNearDup, None,
      oracleFn = Some(() => HashOracles.minhashNearDupOracle)),
    NamedQuery("s04_simhash_neardup", simhashNearDup, None,
      oracleFn = Some(() => HashOracles.simhashNearDupOracle)),
    NamedQuery("s05_cosine_neardup", cosineNearDup, Some(cosineNearDupOracle)),
    NamedQuery("s06_multimodal_meta", multimodalMeta, Some(multimodalMetaOracle)),
    NamedQuery("s10_image_decode", imageDecode, Some(imageDecodeOracle)),
    NamedQuery("s11_frame_sample", frameSample, Some(frameSampleOracle)),
    NamedQuery("s12_audio_decode", audioDecode, Some(audioDecodeOracle)),
    NamedQuery("s08_embedding_pool", embeddingPool, Some(embeddingPoolOracle)),
    NamedQuery("s09_embedding_quantize", embeddingQuantize,
      Some(embeddingQuantizeOracle)),
    NamedQuery("s13_semantic_dedup", semanticDedup, None,
      oracleFn = Some(() => semanticDedupOracle)),
    NamedQuery("s14_ann_quantized", annQuantized, Some(annQuantizedOracle)),
    NamedQuery("s15_ann_cosine_neardup", annCosineNearDup,
      Some(annCosineNearDupOracle)),
    NamedQuery("s16_image_neardup", imageNearDup, Some(imageNearDupOracle)),
    NamedQuery("s17_ann_pq", annPq, None,
      oracleFn = Some(() => annPqOracle)),
    NamedQuery("s18_video_neardup", videoNearDup, Some(videoNearDupOracle)),
    NamedQuery("s19_ann_ivfpq", annIvfPq, None,
      oracleFn = Some(() => annIvfPqOracle)),
    NamedQuery("s20_cluster_balanced_sample", clusterBalancedSample, None,
      oracleFn = Some(() => clusterBalancedSampleOracle)),
    NamedQuery("s21_hard_negatives", hardNegatives, Some(hardNegativesOracle)),
    NamedQuery("s22_hard_negatives_ivf", hardNegativesIvf, None,
      oracleFn = Some(() => hardNegativesIvfOracle)),
    NamedQuery("t48_source_dedup_report", sourceDedupReport, None,
      oracleFn = Some(() => HashOracles.sourceDedupReportOracle)),
  )

  /** s21 — hard-negative mining for contrastive training (DPR,
    * Karpukhin et al. 2020 §4.2): for every query vector (the
    * corpus-scaling `vec_id % 97` slice), the 5 most-similar vectors
    * with a DIFFERENT label — the high-similarity non-matches a
    * contrastive loss actually learns from. Same-label rows (and the
    * query itself, transitively) are excluded in the join condition,
    * before any similarity is computed. Exactness baseline in s01's
    * broadcast shape; the corpus×corpus mining pass swaps the candidate
    * stage for the s07/s02 bucket joins with the same exclusion
    * predicate pushed into the candidate join. */
  def hardNegatives(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = scan(spark, sfDir, "embeddings")
    // same slice and k as s22 (S22SliceMod/S22K): s21 is s22's recall
    // oracle, so the two rows must mine the same anchors at the same k
    Similarity.hardNegatives(
      emb.where(pmod(col("vec_id"), lit(S22SliceMod)) === 0), emb, k = S22K)
  }

  private def hardNegativesOracle =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
      |                  label AS q_label
      |           FROM embeddings WHERE vec_id % $S22SliceMod = 0),
      |     c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
      |                  label AS neighbor_label
      |           FROM embeddings),
      |     s AS (SELECT query_id, neighbor_id, neighbor_label,
      |                  list_cosine_similarity(qv, cv) AS sim
      |           FROM c, q WHERE q_label <> neighbor_label),
      |     r AS (SELECT query_id, neighbor_id, neighbor_label, sim,
      |                  row_number() OVER (PARTITION BY query_id
      |                                     ORDER BY sim DESC, neighbor_id) AS rank
      |           FROM s)
      |SELECT query_id, rank, neighbor_id, neighbor_label,
      |       round(sim, 6) AS sim
      |FROM r WHERE rank <= $S22K""".stripMargin

  /** s22 — s21's mining at the corpus-scale shape (r17 verdict item 1):
    * candidate generation through s07's TRAINED IVF cells (shared
    * per-dir memo, so the geometry is identical across s07/s13/s19/s20/
    * s22) with the different-label exclusion in the candidate join,
    * exact double-cosine rerank inside the probed cells. nprobe is 4,
    * not ANN's 2: the nearest cell is usually the query's OWN cluster,
    * whose members are all same-label and excluded, so mining burns
    * ~one probe before the first candidate (measured in
    * HardNegativesIvfSpec: recall .18/.76/.84/.98/1.0 at nprobe 1-5 of
    * 8 cells). s21's brute force is the recall oracle — HardNegativesIvfSpec pins recall
    * ≥ 0.9 on a clustered corpus, and the plan pin shows no crossJoin
    * with vectors pruned off the top-k exchange. */
  /** s22's k and nprobe, interpolated into BOTH the registry call and
    * the oracle SQL (the MixBudget pattern) — editing one without the
    * other is impossible. */
  private[queries] val S22K = 5
  private[queries] val S22Nprobe = 4

  /** The mining-slice modulus, shared with the oracle like S22K/S22Nprobe:
    * both sides must select the SAME anchor set or the gate compares
    * different queries. */
  private[queries] val S22SliceMod = 97

  def hardNegativesIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = scan(spark, sfDir, "embeddings")
    // query side: a bounded mining slice (vec_id % S22SliceMod) — the
    // broadcast contract of Similarity.hardNegativesIvf; at true corpus
    // scale a caller pages through such slices pass by pass
    Similarity.hardNegativesIvf(
      emb.where(pmod(col("vec_id"), lit(S22SliceMod)) === 0), emb,
      trainedCentroids(spark, sfDir), k = S22K, nprobe = S22Nprobe)
  }

  /** DuckDB twin of s22 — the s07 assignment/probe SQL (same trained
    * centroids as dump-time VALUES, same strict-< argmin via
    * row_number ties → lowest cell, same (dist, cell) probe order)
    * composed with s21's label-exclusion and per-query cosine top-k. */
  private def hardNegativesIvfOracle: String = {
    val cents = OracleDump.resolve(trainedCache, lastTrained).getOrElse {
      System.err.println(
        "[graft] WARNING: hardNegativesIvfOracle dumped with UNTRAINED " +
          "(seeded) centroids — s22 never ran in this JVM; run the query " +
          "before dumping its oracle.")
      Similarity.hyperplanes(8, 64, 11L)
    }
    val rows = cents.zipWithIndex.map {
      case (c, i) => s"($i, ${vecLit(c)})"
    }
    s"""WITH cents(cell, c) AS (VALUES
       |  ${rows.mkString(",\n  ")}),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
       |      FROM embeddings),
       |dists AS (
       |  SELECT e.vec_id, ct.cell, list_distance(e.v, ct.c) AS dist
       |  FROM e, cents ct),
       |assign AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY dist, cell) AS rn
       |    FROM dists) WHERE rn = 1),
       |qcells AS (
       |  SELECT vec_id AS query_id, cell FROM (
       |    SELECT vec_id, cell,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY dist, cell) AS rn
       |    FROM dists WHERE vec_id % $S22SliceMod = 0) WHERE rn <= $S22Nprobe),
       |s AS (
       |  SELECT q.query_id, a.vec_id AS neighbor_id,
       |         en.label AS neighbor_label,
       |         list_cosine_similarity(eq.v, en.v) AS sim
       |  FROM qcells q
       |  JOIN assign a ON a.cell = q.cell
       |  JOIN e eq ON eq.vec_id = q.query_id
       |  JOIN e en ON en.vec_id = a.vec_id
       |  WHERE eq.label <> en.label),
       |r AS (
       |  SELECT query_id, neighbor_id, neighbor_label, sim,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM s)
       |SELECT query_id, rank, neighbor_id, neighbor_label,
       |       round(sim, 6) AS sim
       |FROM r WHERE rank <= $S22K""".stripMargin
  }
}
