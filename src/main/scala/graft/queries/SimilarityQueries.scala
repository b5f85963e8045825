package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.ops.CoreOps.scan
import graft.sim.Similarity

/** Similarity-search and near-dup queries over `embeddings` / `documents`.
  *
  * s01 has a DuckDB oracle (double-precision cosine, rank tie-broken by
  * id). The LSH/MinHash/SimHash queries are NOT SQL-expressible without
  * replicating seeded hash internals, so they are registered rows-only and
  * their correctness (recall vs brute force, planted-duplicate detection)
  * is asserted by ScalaTest specs instead. */
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

  /** LSH-bucketed ANN (random hyperplanes, 4 tables × 8 planes): the scale
    * path — bucket equi-join instead of cross join. Rows-only check here;
    * LshRecallSpec asserts ≥0.6 recall@10 vs brute force. */
  def annLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = scan(spark, sfDir, "embeddings")
    Similarity.lshTopK(emb.where(col("vec_id") < 5), emb, k = 10)
  }

  /** MinHash-LSH near-dup pairs over documents ∪ lightly-perturbed copies
    * (id+1e6) — the perturbed copies guarantee planted near-dups at every
    * scale factor, so the rows-only signal is meaningful (>0 pairs, each
    * verified by exact Jaccard ≥ 0.5). */
  def minhashNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = scan(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val perturbed = docs.select((col("doc_id") + 1000000).as("doc_id"),
      concat(col("text"), lit(" perturbed tail")).as("text"))
    Dedup.nearDupPairs(docs.unionAll(perturbed), "text", "doc_id",
      threshold = 0.5)
  }

  /** SimHash near-dup candidates over the same planted corpus (Hamming ≤
    * 3 via the 4×16-bit chunk join). Rows-only. */
  def simhashNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = scan(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val perturbed = docs.select((col("doc_id") + 1000000).as("doc_id"),
      concat(col("text"), lit(" zz")).as("text"))
    Dedup.simhashCandidates(docs.unionAll(perturbed), "text", "doc_id")
  }

  /** Embedding-cosine near-dup: pairs of distinct vectors with cosine ≥
    * 0.95 among a bounded slice, oracled in DuckDB. (Random embeddings
    * make high-cosine pairs rare; the planted self-join at sim=1 rows —
    * excluded — keeps this a true near-dup check on real pairs.) */
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

  /** IVF-bucketed ANN with seeded pseudo-random centroids, nprobe=2 of 8
    * cells. Rows-only (seeded centroid internals aren't SQL-replicable);
    * SimilaritySpec checks structure + recall against brute force. */
  def annIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = scan(spark, sfDir, "embeddings")
    Similarity.ivfTopK(emb.where(col("vec_id") < 5), emb,
      Similarity.hyperplanes(8, 64, seed = 11L), k = 10, nprobe = 2)
  }

  def all: Seq[NamedQuery] = Seq(
    NamedQuery("s01_cosine_topk", cosineTopK, Some(cosineTopKOracle)),
    NamedQuery("s02_ann_lsh", annLsh, None),
    NamedQuery("s07_ann_ivf", annIvf, None),
    NamedQuery("s03_minhash_neardup", minhashNearDup, None),
    NamedQuery("s04_simhash_neardup", simhashNearDup, None),
    NamedQuery("s05_cosine_neardup", cosineNearDup, Some(cosineNearDupOracle)),
    NamedQuery("s06_multimodal_meta", multimodalMeta, Some(multimodalMetaOracle)),
  )
}
