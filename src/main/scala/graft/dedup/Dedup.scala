package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a 100 TB training-data pipeline. The scale
  * rules baked in here:
  *
  *   - exact dedup is a hash-keyed shuffle (never a sort of raw text);
  *   - near-dup never does an all-pairs comparison: MinHash signatures are
  *     banded (LSH) so candidate generation is a bucket equi-JOIN — the
  *     only shuffle key is (band, bucket-hash), and only bucket-mates meet;
  *   - verification (exact Jaccard) runs on the candidate pairs only.
  */
object Dedup {

  /** Exact dedup key: sha256 of normalized text (16-hex prefix = 64 bits).
    * Grouping by a fixed-width hash instead of the raw text keeps shuffle
    * rows small and uniformly distributed. COLLISION ASSUMPTION: 64 bits
    * puts the birthday bound near 2^32 distinct texts; a collision here
    * merges two distinct texts and silently DROPS one row — acceptable
    * odds for survivor selection, but not where a collision would
    * fabricate output values, which is why [[collapseExpand]] groups on
    * the FULL digest instead (a collision there would emit jaccard=1.0 /
    * hamming=0 pairs between unrelated texts). */
  def exactKey(text: Column): Column =
    substring(sha2(lower(trim(text)), 256), 1, 16)

  /** Keep exactly one row (min id) per normalized-text group, via a
    * window-min rather than dropDuplicates — dropDuplicates keeps an
    * ARBITRARY row (first seen per partition), which is nondeterministic
    * under shuffle; min-id is stable. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(exactKey(col(textCol)))
    df.withColumn("__keep", min(col(idCol)).over(w) === col(idCol))
      .where(col("__keep")).drop("__keep")
  }

  /** Character k-shingles (distinct) of the normalized text. */
  def shingles(text: Column, k: Int = 5): Column =
    array_distinct(rawShingles(text, k))

  /** All k-gram positions, duplicates included — enough for MinHash (the
    * min over a multiset equals the min over its set), skipping the
    * per-doc string-array distinct. */
  def rawShingles(text: Column, k: Int = 5): Column = {
    val norm = lower(trim(text))
    transform(
      sequence(lit(1), greatest(length(norm) - (k - 1), lit(1))),
      i => norm.substr(i, lit(k)))
  }

  /** MinHash signatures via explode + groupBy-min: one row per (doc,
    * shingle), the expensive string hash runs ONCE per shingle, then each
    * of the `numHashes` functions is a cheap fixed-width rehash
    * xxhash64(h, i) (ANSI-safe — no overflowing multiply). The min
    * aggregation partial-combines map-side, so the shuffle carries only
    * numHashes longs per doc — the 100 TB-safe shape (the alternative,
    * nested array lambdas, recomputes the shingle set per hash function
    * because Catalyst collapses the projections). */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
                        k: Int = 5, numHashes: Int = 32): DataFrame = {
    val exploded = df.select(col(idCol).as("id"),
        explode(rawShingles(col(textCol), k)).as("s"))
      .select(col("id"), xxhash64(col("s")).as("h"))
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    exploded.groupBy(col("id"))
      .agg(mins.head, mins.tail.toIndexedSeq: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"m$i")).toIndexedSeq: _*).as("sig"))
  }

  /** LSH banding: split the signature into `bands` bands of
    * numHashes/bands rows each; docs sharing ANY band hash become
    * candidates. With b bands of r rows, P(candidate) = 1-(1-j^r)^b —
    * b=8,r=4 puts the S-curve threshold near j≈0.6. */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))).as("bucket")))

  /** Candidate near-dup pairs via banded MinHash. Returns (id_a, id_b)
    * with id_a < id_b, distinct. The join is an equi-join on
    * (band, bucket): at 100 TB this shuffles signature rows once and never
    * compares across buckets. */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        k: Int = 5, numHashes: Int = 32,
                        bands: Int = 8): DataFrame = {
    // bands > numHashes would make every band an empty slice -> identical
    // bucket hash for all docs -> the equi-join degenerates to all-pairs;
    // non-divisible values would silently ignore trailing signature rows
    require(bands >= 1 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    val r = numHashes / bands
    // default shape goes through the native fused-loop expression (pure
    // narrow map, no shuffle); non-default params use the aggregation form
    val base =
      if (k == 5 && numHashes == 32) {
        graft.functions.MinHashSig.register(df.sparkSession)
        df.select(col(idCol).as("id"),
          expr(s"minhash_sig(lower(trim($textCol)))").as("sig"))
      } else minhashSignatures(df, textCol, idCol, k, numHashes)
    val sigs = base
      .withColumn("bh", explode(bandHashes(col("sig"), bands, r)))
      .select(col("id"), col("bh.band").as("band"),
        col("bh.bucket").as("bucket"))
    val a = sigs.as("a"); val b = sigs.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard over distinct k-shingle sets — the verify step applied
    * to candidate pairs (or, in tests/oracles, to a small all-pairs set). */
  def jaccard(textA: Column, textB: Column, k: Int = 5): Column = {
    val (sa, sb) = (shingles(textA, k), shingles(textB, k))
    size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb)).cast("double")
  }

  /** Jaccard from precomputed distinct-gram arrays. Keeping grams as a
    * column below the join means each doc's shingle set is computed once,
    * not once per candidate pair. */
  def jaccardFromGrams(gramsA: Column, gramsB: Column): Column =
    size(array_intersect(gramsA, gramsB)).cast("double") /
      size(array_union(gramsA, gramsB)).cast("double")

  /** Near-dup pairs: LSH candidates filtered by exact Jaccard ≥ threshold.
    *
    * Runs [[nearDupPairsFlat]] behind an ADAPTIVE EXACT-COLLAPSE
    * pre-pass: a cheap duplication probe ([[duplicationRatio]]) routes
    * fully-distinct corpora straight to the flat form, and
    * duplicate-heavy corpora through [[collapseExpand]] — identical
    * normalized texts are grouped (one map-side-combined shuffle on the
    * exact key), LSH + verify run on one representative per distinct
    * text, and the verified pairs expand back to the full id space with
    * cheap constant-width joins. Both routes are output-IDENTICAL —
    * MinHash signatures and gram sets are functions of the normalized
    * text alone, so exact duplicates are always banded together with
    * Jaccard exactly 1.0, and a cross-group member pair shares its
    * representatives' Jaccard — while on the collapsed route the verify
    * join's shuffle carries gram arrays for DISTINCT texts only. On a
    * duplicate-heavy corpus (the hot-×100 world: every text ×100, ~100M
    * candidate pairs × two ~550-long gram arrays ≈ 880 GB of verify
    * shuffle in flat form) the gram shuffle collapses by the duplication
    * factor and the operator completes where the flat form cannot fit on
    * scratch disk; on a duplicate-free corpus the probe skips the
    * collapse's pure overhead (its text shuffle + expansion joins
    * measured ~2× on s03/s04 at ×100 grow). DedupSpec pins flat ==
    * collapsed on a planted duplicate-heavy corpus and the routing
    * decision on both corpus shapes. */
  def nearDupPairs(df: DataFrame, textCol: String, idCol: String,
                   threshold: Double, k: Int = 5, numHashes: Int = 32,
                   bands: Int = 8): DataFrame =
    collapseExpand(df, textCol, idCol,
      reps => nearDupPairsFlat(reps, "__text", "id",
        threshold, k, numHashes, bands),
      flatPairs = () =>
        nearDupPairsFlat(df, textCol, idCol, threshold, k, numHashes, bands),
      intraCols = Seq(lit(1.0).as("jaccard")),
      intraKeep = lit(1.0) >= threshold)

  /** Rows per distinct normalized text — the probe behind the adaptive
    * collapse routing. count / approx_count_distinct over a cheap 64-bit
    * text hash (xxhash64, NOT the sha256 collapse key: the probe needs a
    * ratio, not collision safety; null texts are excluded on both sides,
    * matching the collapse, which never groups them). Scale shape: one
    * narrow scan of the text column, HLL sketches partial-combine
    * map-side, the shuffle carries one fixed-size sketch per partition,
    * the driver reads one row — O(1) driver memory at any corpus size.
    *
    * Re-execution safety (the discipline pinned for the clusterAssign
    * convergence Observation): this is an EAGER job completed before the
    * routing decision is taken, not an Observation riding a shared
    * action, and HLL register-merge is commutative and
    * replay-deterministic — a re-executed stage reproduces the same
    * sketch, so the ratio is a pure function of the input. And the
    * decision it feeds is PERFORMANCE-ONLY: both routes are
    * output-identical (DedupSpec pins collapsed == flat on both corpus
    * shapes), so even a perturbed probe could not change query results —
    * only which shuffle pays for them. */
  private[dedup] def duplicationRatio(df: DataFrame, textCol: String,
                                      rawKey: Boolean = false): Double = {
    // xxhash64(null) returns the SEED, not null (the simhashesAgg trap) —
    // keep nullness explicit or null texts pollute the distinct count.
    // The probe normalization mirrors the collapse key exactly
    // (`lower(trim(...))` by default, the raw text under `rawKey` — see
    // collapseExpand), so the probe counts exactly the groups the
    // collapse would form.
    val h = when(col(textCol).isNull, lit(null))
      .otherwise(xxhash64(collapseNorm(col(textCol), rawKey)))
    val r = df.agg(
      count(col(textCol)).as("n"),
      approx_count_distinct(h).as("d"))
      .head()
    val n = r.getLong(0)
    val d = r.getLong(1)
    if (d <= 0L) 1.0 else n.toDouble / d.toDouble
  }

  /** Collapse only when duplication is real: below this ratio the
    * collapse's extra text shuffle + expansion joins buy (almost)
    * nothing — measured ~2× overhead on s03/s04 at ×100 grow, where
    * every text is distinct — while above it the flat verify shuffle
    * grows with duplication² per distinct text. 1.25 sits above
    * approx_count_distinct's default ±5% rsd band around a true ratio of
    * 1.0 and far below any duplication where the collapse pays (the hot
    * axes measure 10–100); corpora near the threshold are cheap on
    * EITHER route, so a borderline misroute costs noise, never
    * correctness. */
  private[graft] val CollapseDuplicationThreshold = 1.25

  private[dedup] def shouldCollapse(df: DataFrame, textCol: String,
                                    rawKey: Boolean = false): Boolean =
    duplicationRatio(df, textCol, rawKey) >= CollapseDuplicationThreshold

  /** The normalization under the collapse key and its routing probe:
    * `lower(trim(text))` for the Jaccard/SimHash family (their payloads —
    * gram Jaccard, Hamming — are functions of the NORMALIZED text, so any
    * two texts equal under it are fully interchangeable), or the raw text
    * (`rawKey = true`) for payloads computed on the text as-is
    * (Levenshtein, Jaro-Winkler): under a normalizing key two
    * case-different members would collapse into one group yet carry
    * nonzero flat-route distances, and the rep's payload would misstate
    * theirs — byte-identity is the only equality that makes members
    * interchangeable for a case-sensitive verifier. */
  private def collapseNorm(text: Column, rawKey: Boolean): Column =
    if (rawKey) text else lower(trim(text))

  /** Public face of the adaptive-collapse routing probe, for operators
    * OUTSIDE this package that apply the same exact-collapse trick
    * (t25's span-window counts): true when the corpus is duplicate-heavy
    * enough that per-distinct-text computation + member expansion beats
    * per-row computation. Same probe, same threshold, same re-execution
    * safety argument as [[duplicationRatio]]. */
  def duplicationHeavy(df: DataFrame, textCol: String): Boolean =
    shouldCollapse(df, textCol)

  /** The exact-collapse harness shared by the near-dup operators
    * ([[nearDupPairs]], [[simhashCandidates]]): probe duplication first
    * ([[shouldCollapse]]) and route a fully-distinct corpus straight to
    * `flatPairs` — the collapse is pure overhead there; otherwise group
    * identical normalized texts (one map-side-combined shuffle on the
    * FULL sha256 exact key — the only full-text shuffle; the full digest
    * because a collision here would fabricate jaccard=1.0/hamming=0
    * pairs between distinct texts, and at 100 TB doc counts the 64-bit
    * prefix's birthday bound is within reach), run `repPairs` over ONE
    * representative (min id) per distinct text, and expand verified
    * rep-level pairs back to the full id space with constant-width
    * joins. Signatures (MinHash bands, SimHash fingerprints) and gram
    * sets are functions of the normalized text alone, so:
    *
    *   - an intra-group pair (identical texts) is ALWAYS a candidate in
    *     the flat form and carries the degenerate payload (`intraCols`:
    *     jaccard exactly 1.0 / hamming 0), guarded by `intraKeep` for
    *     exactness against pathological thresholds;
    *   - a cross-group member pair is a candidate iff its representative
    *     pair is, and shares its payload verbatim;
    *   - null-text docs have a null exact key: the null-rejecting
    *     equi-joins drop them here. The flat paths drop them LATER, by a
    *     different mechanism — in the minhash form a null text's bucket
    *     hash degenerates to the xxhash64 seed (hashing a null slice
    *     returns the seed), so null docs DO band together and die only
    *     when the null-gram Jaccard fails the verify threshold; in the
    *     simhash form the null chunk value never equi-joins. Same output
    *     (no null pairs), so don't "simplify" the flat verify filter on
    *     the assumption nulls never reach it.
    *
    * Output is therefore IDENTICAL to the flat formulation (DedupSpec
    * pins both operators on a planted duplicate-heavy corpus) while the
    * expensive pair machinery — the verify join's gram arrays, the
    * chunk join's in-group quadratic — touches DISTINCT texts only.
    * Expansion rows are fixed-width id/payload columns: output volume is
    * the query's result, not an intermediate.
    *
    * The collapse costs exactly ONE text shuffle (the min_by groupBy) —
    * and that is the scale-correct choice, deliberately: the tempting
    * alternative (shuffle only (id, ek) to pick rep ids, then semi-join
    * the text back) avoids the text shuffle only while the rep-id set
    * broadcasts; at 100 TB the distinct-text set can be billions of
    * rows, the semi-join falls back to a shuffled join, and the text
    * moves anyway — after a second full scan. One groupBy that
    * partial-combines duplicates map-side is strictly better on every
    * corpus shape. */
  private[graft] def collapseExpand(df: DataFrame, textCol: String,
                             idCol: String,
                             repPairs: DataFrame => DataFrame,
                             flatPairs: () => DataFrame,
                             intraCols: Seq[Column],
                             intraKeep: Column,
                             rawKey: Boolean = false): DataFrame = {
    if (!shouldCollapse(df, textCol, rawKey)) return flatPairs()
    // The collapse key's `trim` strips ASCII SPACES ONLY — deliberately:
    // it must normalize EXACTLY like rawShingles' `lower(trim(text))`, or
    // two texts in one group could carry different shingle sets and the
    // collapsed route (one rep's grams standing for all members) would
    // diverge from the flat route. Texts differing by a trailing tab /
    // newline are therefore distinct BY DEFINITION here — a missed-collapse
    // corner on such corpora, never a correctness one (duplicationRatio
    // probes with the same key, so routing and grouping stay consistent).
    // `rawKey` callers (case-sensitive payloads — see collapseNorm) group
    // on byte-identity instead; their signatures are still functions of
    // the raw text, so candidate equivalence holds a fortiori.
    val keyed = df.select(col(idCol).as("id"), col(textCol).as("__text"))
      .withColumn("ek", sha2(collapseNorm(col("__text"), rawKey), 256))
    val members = keyed.select(col("id"), col("ek"))
    val reps = keyed.groupBy(col("ek"))
      .agg(min(col("id")).as("id"), min_by(col("__text"), col("id")).as("__text"))
    val rp = repPairs(reps.select(col("id"), col("__text")))
    val payload = rp.columns.filterNot(c => c == "id_a" || c == "id_b")
      .map(col).toSeq
    val intra = members.as("m1")
      .join(members.as("m2"),
        col("m1.ek") === col("m2.ek") && col("m1.id") < col("m2.id"))
      .select(Seq(col("m1.id").as("id_a"), col("m2.id").as("id_b")) ++
        intraCols: _*)
      .where(intraKeep)
    val groupOf = reps.select(col("id").as("rid"), col("ek"))
    val cross = rp
      .join(groupOf.as("ka"), col("id_a") === col("ka.rid"))
      .join(groupOf.as("kb"), col("id_b") === col("kb.rid"))
      .join(members.as("ma"), col("ma.ek") === col("ka.ek"))
      .join(members.as("mb"), col("mb.ek") === col("kb.ek"))
      .select(Seq(least(col("ma.id"), col("mb.id")).as("id_a"),
        greatest(col("ma.id"), col("mb.id")).as("id_b")) ++ payload: _*)
    intra.unionAll(cross)
  }

  /** Spread a narrow candidate/pair table across the session's cores
    * before a CPU-HEAVY verify projection (edit-distance DP, gram-array
    * merge intersect). AQE right-sizes post-shuffle partitions by BYTES
    * (advisoryPartitionSizeInBytes) — correct for I/O-bound stages, but a
    * candidate table is a few MB of fixed-width ids while the work per
    * row downstream is thousands of DP cells, so AQE coalesces the whole
    * verify onto one or two tasks and the stage runs single-core
    * (measured on t29 at sf0.1: verify 8.7 s coalesced vs 2.0 s spread).
    * A KEYLESS round-robin repartition with an explicit count is the one
    * form that survives: a keyed repartition on the pair key matches the
    * upstream distinct's partitioning, so EnsureRequirements elides it
    * and AQE coalesces the remaining ENSURE_REQUIREMENTS exchange right
    * back to one task (observed on the first r21 attempt) — while a
    * user-specified numPartitions round-robin is a hard constraint the
    * planner neither removes nor coalesces. The count scales with the
    * session (defaultParallelism / configured shuffle partitions), never
    * a local constant; the extra exchange carries only the fixed-width
    * id columns. */
  private[graft] def cpuSpread(df: DataFrame): DataFrame = {
    // env kill-switch for A/B probes, like CoreOps.spreadSmallScan's
    if (sys.env.get("SPARK_GRAFT_CPU_SPREAD").contains("0")) return df
    val sc = df.sparkSession.sparkContext
    val parts = math.max(sc.defaultParallelism,
      df.sparkSession.sessionState.conf.numShufflePartitions)
    df.repartition(parts)
  }

  /** The flat (no exact-collapse) near-dup formulation: map (signatures)
    * → one shuffle (band join) → verify against per-doc HASHED gram
    * arrays (xxhash64 per shingle: Jaccard is identical modulo 64-bit
    * collisions, and long-array set ops are far cheaper than string-array
    * ones on dense candidate sets). Never all-pairs — but the verify join
    * ships two full gram arrays per CANDIDATE PAIR, which on a
    * duplicate-heavy corpus grows with (duplication factor)² per distinct
    * text; [[nearDupPairs]] bounds that by collapsing exact duplicates
    * first and is the operator callers should use. */
  def nearDupPairsFlat(df: DataFrame, textCol: String, idCol: String,
                       threshold: Double, k: Int = 5, numHashes: Int = 32,
                       bands: Int = 8,
                       spreadCands: Boolean = true): DataFrame = {
    graft.functions.SortedIntersectSize.register(df.sparkSession)
    graft.functions.GramHashes.register(df.sparkSession)
    val rawCands = minhashCandidates(df, textCol, idCol, k, numHashes, bands)
    // `spreadCands = false` for callers whose candidate set is small and
    // whose OUTPUT feeds an iterative consumer (t09's clusterAssign): the
    // spread's 32 partitions ride into every downstream join/checkpoint
    // and the per-iteration task overhead outweighs the verify
    // parallelism — measured r22 cold-JVM A/B, t09 medians 2.15 s flat vs
    // 3.51 s spread (the r21 driver run agreed: 3.69 -> 4.20 s when the
    // spread was added). Dense-candidate callers (s03, t48, t29's twin)
    // keep the spread: s03 min 0.99 s spread vs 1.70 s flat.
    val cands = if (spreadCands) cpuSpread(rawCands) else rawCands
    // per-doc sorted distinct hashed grams: the merge-scan intersect needs
    // sorted inputs, and |union| = na + nb - |intersect| (no union pass).
    // Default k goes through the native zero-alloc GramHashes expression
    // (one byte pass, primitive sort+dedupe); other k use the builtin
    // string-shingle formulation.
    val gramsCol =
      if (k == 5) expr(s"gram_hashes(lower(trim($textCol)))")
      else sort_array(array_distinct(
        transform(rawShingles(col(textCol), k), s => xxhash64(s))))
    val grams = df.select(col(idCol).as("id"), gramsCol.as("grams"))
      .withColumn("n", size(col("grams")))
    // identical subtree on both sides of the two joins -> Spark reuses the
    // exchange instead of recomputing shingle hashes twice
    cands
      .join(grams.as("ga"), col("id_a") === col("ga.id"))
      .join(grams.as("gb"), col("id_b") === col("gb.id"))
      .withColumn("inter",
        expr("intersect_size_sorted(ga.grams, gb.grams)"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("ga.n") + col("gb.n") - col("inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Incremental near-dup: every BATCH doc's near-dup matches against an
    * existing CORPUS — the nightly near-dup gate, [[exactDedup]]-based
    * t17's approximate sibling. Runs [[nearDupAgainstFlat]] behind the
    * same adaptive exact-collapse routing as [[nearDupPairs]]: the
    * corpus-side duplication probe ([[shouldCollapse]]) sends
    * distinct-ish corpora straight to the flat form, and duplicate-heavy
    * ones through an ASYMMETRIC collapse — BOTH slices group identical
    * normalized texts (on a hot corpus the batch mirrors its duplication:
    * perturbed copies of replicated docs are themselves replicated), the
    * band/verify machinery runs rep-vs-rep only, and verified rep pairs
    * expand back through the two member maps with constant-width joins.
    * Output-identical to the flat form: signatures and gram sets are
    * functions of the normalized text alone, so a flat (corpus, batch)
    * pair is a band candidate iff its representative pair is, and shares
    * its Jaccard verbatim; identical cross-slice texts band always and
    * carry Jaccard exactly 1.0 through either route. Unlike the
    * intra-corpus collapse there is no intra-group special case — the id
    * spaces are disjoint, every (corpus, batch) combination is a
    * cross-rep pair. Measured: the hot-×100 cell (every text ×100 on
    * both slices) was the matrix's top cost at 33.7 s flat — the verify
    * join's candidate set grows with duplication² per distinct text —
    * and drops to the distinct-text budget collapsed.
    *
    * Returns (batch_id, corpus_id, jaccard) at ≥ threshold; the two id
    * spaces must be disjoint (caller's contract — t27 offsets the batch
    * by 1e6). Batch-internal duplicates are the PREVIOUS stage's job
    * ([[nearDupPairs]] within the batch) — this operator is the
    * batch-vs-corpus edge only. */
  def nearDupAgainst(corpus: DataFrame, batch: DataFrame,
                     textCol: String, idCol: String,
                     threshold: Double, k: Int = 5,
                     numHashes: Int = 32, bands: Int = 8): DataFrame =
    nearDupAgainstIndexed(
      indexCorpus(corpus, textCol, idCol, persist = false, k, numHashes, bands),
      batch, textCol, idCol, threshold, k, numHashes, bands)

  /** The space-only-trim exact key slice: it must match rawShingles'
    * normalization exactly (see the note there). */
  private def gateKeyed(df: DataFrame, textCol: String,
                        idCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(textCol).as("__text"))
      .withColumn("ek", sha2(lower(trim(col("__text"))), 256))

  private def gateRepsOf(kd: DataFrame): DataFrame =
    kd.groupBy(col("ek"))
      .agg(min(col("id")).as("id"),
        min_by(col("__text"), col("id")).as("__text"))

  /** The CORPUS-SIDE INVARIANTS of the incremental gate, computed once:
    * the collapse-routing probe verdict plus the corpus's DERIVED gate
    * tables — its banded signatures and hashed-gram arrays (of the raw
    * corpus on the flat route, of the representative table on the
    * collapsed route, where the keyed member map rides along for the
    * expansion joins). A STREAMING caller builds this once per stream
    * (`persist = true`) so each micro-batch reads the corpus side from
    * cached blocks — per-batch cost proportional to the batch, not the
    * corpus. Persisting the DERIVED tables is the point (r21): the first
    * index cached only the corpus TEXT, so every micro-batch re-ran the
    * MinHash/gram passes over the whole corpus — measured ~0.75 s per
    * batch at sf0.1, 4 of t41's 3.7 s — where reading the prebuilt band
    * and gram tables is corpus-scan-free. The one-shot batch caller
    * ([[nearDupAgainst]]) builds it unpersisted per call, which is
    * plan-identical to the historical inline form (the same band/gram
    * subtrees, hoisted). `unpersist()` releases the cached blocks when
    * the stream stops. */
  final case class GateCorpusIndex private[dedup] (
      collapsed: Boolean,
      private[dedup] val k: Int,
      private[dedup] val numHashes: Int,
      private[dedup] val bands: Int,
      private[dedup] val cBands: DataFrame,
      private[dedup] val cGrams: DataFrame,
      private[dedup] val kc: DataFrame,
      private[dedup] val repsC: DataFrame,
      private[graft] val persisted: Seq[DataFrame]) {
    def unpersist(): Unit =
      persisted.foreach(_.unpersist(blocking = false))
  }

  def indexCorpus(corpus: DataFrame, textCol: String, idCol: String,
                  persist: Boolean, k: Int = 5, numHashes: Int = 32,
                  bands: Int = 8): GateCorpusIndex = {
    registerGateFns(corpus.sparkSession)
    def maybe(df: DataFrame): DataFrame =
      if (persist)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else df
    if (!shouldCollapse(corpus, textCol)) {
      val cb = maybe(bandsOf(corpus, textCol, idCol, "corpus_id",
        k, numHashes, bands))
      val cg = maybe(gramsOf(corpus, textCol, idCol, "corpus_id",
        "gc", "nc", k))
      GateCorpusIndex(collapsed = false, k, numHashes, bands, cb, cg,
        null, null, if (persist) Seq(cb, cg) else Seq.empty)
    } else {
      val kc = maybe(gateKeyed(corpus, textCol, idCol))
      val reps = gateRepsOf(kc)
      val cb = maybe(bandsOf(reps, "__text", "id", "corpus_id",
        k, numHashes, bands))
      val cg = maybe(gramsOf(reps, "__text", "id", "corpus_id",
        "gc", "nc", k))
      val repC = maybe(reps.select(col("id").as("crid"),
        col("ek").as("cek")))
      GateCorpusIndex(collapsed = true, k, numHashes, bands, cb, cg,
        kc, repC, if (persist) Seq(kc, cb, cg, repC) else Seq.empty)
    }
  }

  /** [[nearDupAgainst]] against a prebuilt [[GateCorpusIndex]] — the
    * per-micro-batch form: no corpus probe, no corpus re-grouping, no
    * corpus signature/gram recomputation. */
  def nearDupAgainstIndexed(idx: GateCorpusIndex, batch: DataFrame,
                            textCol: String, idCol: String,
                            threshold: Double, k: Int = 5,
                            numHashes: Int = 32,
                            bands: Int = 8): DataFrame = {
    require(k == idx.k && numHashes == idx.numHashes && bands == idx.bands,
      s"gate params (k=$k, numHashes=$numHashes, bands=$bands) must match " +
        s"the index (k=${idx.k}, numHashes=${idx.numHashes}, " +
        s"bands=${idx.bands}) — the corpus band/gram tables were built " +
        "with the index's parameters")
    if (!idx.collapsed)
      return nearDupAgainstPrebuilt(idx.cBands, idx.cGrams, batch,
        textCol, idCol, threshold, k, numHashes, bands)
    val kb = gateKeyed(batch, textCol, idCol)
    val rp = nearDupAgainstPrebuilt(idx.cBands, idx.cGrams,
      gateRepsOf(kb).select(col("id"), col("__text")),
      "__text", "id", threshold, k, numHashes, bands)
    // expansion: rep pair -> every member combination. The batch-side
    // maps are broadcast (nightly-batch contract); the corpus member map
    // is id/ek only — fixed width, no text.
    val repB = gateRepsOf(kb).select(col("id").as("brid"),
      col("ek").as("bek"))
    rp.join(idx.repsC, col("corpus_id") === col("crid"))
      .join(broadcast(repB), col("batch_id") === col("brid"))
      .join(idx.kc.select(col("id").as("cid"), col("ek").as("cek")), "cek")
      .join(broadcast(kb.select(col("id").as("bid"), col("ek").as("bek"))),
        "bek")
      .select(col("bid").as("batch_id"), col("cid").as("corpus_id"),
        col("jaccard"))
  }

  /** The flat (no exact-collapse) batch-vs-corpus formulation. Both
    * sides band; the candidate join keys
    * on (band, bucket) with the batch side BROADCAST (a nightly batch is
    * orders of magnitude smaller than the corpus), so the corpus's band
    * rows join in place and its text never shuffles: the verify joins
    * candidates to corpus hashed-gram arrays on the corpus id
    * ([[nearDupPairsFlat]]'s merge-scan shape) and broadcasts the
    * batch's. On a duplicate-heavy corpus the candidate set grows with
    * duplication² per distinct text — [[nearDupAgainst]] bounds that by
    * collapsing exact duplicates first and is the operator callers
    * should use. */
  def nearDupAgainstFlat(corpus: DataFrame, batch: DataFrame,
                     textCol: String, idCol: String,
                     threshold: Double, k: Int = 5,
                     numHashes: Int = 32, bands: Int = 8): DataFrame = {
    registerGateFns(corpus.sparkSession)
    nearDupAgainstPrebuilt(
      bandsOf(corpus, textCol, idCol, "corpus_id", k, numHashes, bands),
      gramsOf(corpus, textCol, idCol, "corpus_id", "gc", "nc", k),
      batch, textCol, idCol, threshold, k, numHashes, bands)
  }

  /** The native expressions every gate plan needs. Registered on BOTH the
    * index-build session and (in [[nearDupAgainstPrebuilt]]) the batch's
    * session: inside foreachBatch the batch DataFrame carries the
    * stream's CLONED session — the final plan analyzes there, and a clone
    * made before any registration (fresh JVM: StreamBench) otherwise
    * fails with UNRESOLVED_ROUTINE on gram_hashes (r13 regression,
    * spec-pinned in StreamingSpec). */
  private def registerGateFns(
      s: org.apache.spark.sql.SparkSession): Unit = {
    graft.functions.SortedIntersectSize.register(s)
    graft.functions.GramHashes.register(s)
    graft.functions.MinHashSig.register(s)
  }

  /** Banded MinHash rows (id, band, bucket) of one side — the gate's
    * candidate-join input, shared by the inline flat form and the
    * prebuilt corpus index. */
  private def bandsOf(df: DataFrame, textCol: String, idCol: String,
                      idAs: String, k: Int, numHashes: Int,
                      bands: Int): DataFrame = {
    require(bands >= 1 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    val r = numHashes / bands
    val base =
      if (k == 5 && numHashes == 32) {
        graft.functions.MinHashSig.register(df.sparkSession)
        df.select(col(idCol).as(idAs),
          expr(s"minhash_sig(lower(trim($textCol)))").as("sig"))
      } else minhashSignatures(df, textCol, idCol, k, numHashes)
        .withColumnRenamed("id", idAs)
    base.withColumn("bh", explode(bandHashes(col("sig"), bands, r)))
      .select(col(idAs), col("bh.band").as("band"),
        col("bh.bucket").as("bucket"))
  }

  /** Sorted hashed-gram arrays (id, grams, n) of one side — the gate's
    * verify input, shared like [[bandsOf]]. */
  private def gramsOf(df: DataFrame, textCol: String, idCol: String,
                      idAs: String, gAs: String, nAs: String,
                      k: Int): DataFrame = {
    val g = if (k == 5) expr(s"gram_hashes(lower(trim($textCol)))")
    else sort_array(array_distinct(
      transform(rawShingles(col(textCol), k), s => xxhash64(s))))
    df.select(col(idCol).as(idAs), g.as(gAs))
      .withColumn(nAs, size(col(gAs)))
  }

  /** The gate core against PREBUILT corpus band/gram tables: batch side
    * banded+grammed fresh (it is new data), broadcast into the corpus's
    * partitions — the corpus never shuffles and, with a persisted index,
    * is never even rescanned. */
  private def nearDupAgainstPrebuilt(corpusBands: DataFrame,
                                     corpusGrams: DataFrame,
                                     batch: DataFrame, textCol: String,
                                     idCol: String, threshold: Double,
                                     k: Int, numHashes: Int,
                                     bands: Int): DataFrame = {
    registerGateFns(batch.sparkSession)
    val cand = corpusBands
      .join(broadcast(bandsOf(batch, textCol, idCol, "batch_id",
        k, numHashes, bands)), Seq("band", "bucket"))
      .select(col("batch_id"), col("corpus_id")).distinct()
    cand
      .join(corpusGrams, "corpus_id")
      .join(broadcast(gramsOf(batch, textCol, idCol, "batch_id",
        "gb", "nb", k)), "batch_id")
      .withColumn("inter", expr("intersect_size_sorted(gc, gb)"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("nc") + col("nb") - col("inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("batch_id"), col("corpus_id"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens: per bit, sum +1/-1 over each
    * token-hash's bit value; the sign of the sum is the fingerprint bit.
    * Near-dups differ in few bits (small Hamming distance).
    *
    * Default path is the native one-pass SimHash64 expression — a narrow
    * map, no explode row-blowup, no shuffle at all. */
  def simhashes(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    graft.functions.SimHash64.register(df.sparkSession)
    df.select(col(idCol).as("id"),
      expr(s"simhash64(lower(trim($textCol)))").as("simhash"))
  }

  /** The aggregation-shaped SimHash twin (explode tokens → one string hash
    * per token → 64 vote-sum aggregates → assemble sign bits). Kept as the
    * builtin-only formulation: it partial-combines map-side (64 ints per
    * doc on the shuffle) and documents why the nested
    * higher-order-aggregate alternative is ~20× slower (Catalyst collapses
    * projections and re-evaluates the token split per bit). */
  def simhashesAgg(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // explode_outer: a token-less (empty/whitespace) doc must still get a
    // row — plain explode would silently drop it from any downstream join
    val exploded = df.select(col(idCol).as("id"),
        explode_outer(graft.text.TextOps.tokens(col(textCol))).as("t"))
      // xxhash64(null) would return the SEED, not null — keep nullness
      .select(col("id"),
        when(col("t").isNull, lit(null))
          .otherwise(xxhash64(col("t"))).as("h"))
    val votes = (0 until 64).map(i =>
      sum(when(col("h").isNull, 0)
        .when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"v$i"))
    val assembled = (0 until 64).map(i =>
      when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    exploded.groupBy(col("id"))
      .agg(votes.head, votes.tail.toIndexedSeq: _*)
      .select(col("id"), assembled.as("simhash"))
  }

  /** All columns plus the SimHash — a pure narrow withColumn (the print
    * is a function of the text alone). The earlier self-join-on-id form
    * shuffled, multiplied rows quadratically per duplicate id, and
    * silently dropped null-id rows; this is row-preserving by
    * construction. */
  def withSimhash(df: DataFrame, textCol: String): DataFrame = {
    graft.functions.SimHash64.register(df.sparkSession)
    df.withColumn("simhash", expr(s"simhash64(lower(trim($textCol)))"))
  }

  /** Connected components over a near-dup pair graph: every doc gets the
    * min doc-id of its component as `cluster_id`, so survivor selection
    * is `doc_id == cluster_id`.
    *
    * Each iteration combines min-label propagation over the edges with a
    * POINTER JUMP (`label ← label[label]`, the path-doubling step of
    * Kiveris et al.'s star algorithms): labels are always node ids, so the
    * self-join is total, and a label that reached distance d from the
    * component min reaches ~2d+1 next round. Convergence is
    * O(log diameter) iterations instead of O(diameter) — maxIter=10
    * covers chains far beyond any real duplicate cluster (≥2^10 hops).
    *
    * If `changed > 0` still holds at `maxIter`, the result would silently
    * split components — so this THROWS GraftError.Other (exit contract
    * 9999) rather than returning wrong clusters. */
  def clusterAssign(pairs: DataFrame, allIds: DataFrame,
                    maxIter: Int = 10): DataFrame = {
    // undirected edges both ways; materialized ONCE — without this the
    // whole upstream pair-generation plan (LSH candidates + verify) would
    // recompute on every propagation iteration
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    var labels = allIds.select(col("id"), col("id").as("cluster_id"))
      .localCheckpoint(true)
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      // each node adopts the min cluster label among itself + neighbors
      val viaEdges = edges
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("cluster_id", "nbr_label"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("nbr_label")).as("nbr_min"))
      // the iteration-start label rides along as `old`, so convergence is
      // read off THIS pass (an Observation on the checkpoint job) instead
      // of a separate labels⋈next join-and-count — one job per iteration,
      // and one fewer full pass over the labels table. Re-executed stages
      // can only over-count the observed sum; the loop tests changed > 0,
      // which re-execution cannot flip.
      val propagated = labels.join(viaEdges, Seq("id"), "left")
        .select(col("id"), col("cluster_id").as("old"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"))
      // pointer jump: follow the label one more hop through the label
      // table itself (keyed equi-join — labels are node ids, so every
      // label resolves; least() keeps monotonicity)
      val parents = propagated
        .select(col("id").as("p_id"), col("cluster_id").as("p_label"))
      val obs = org.apache.spark.sql.Observation()
      val next = propagated
        .join(parents, col("cluster_id") === col("p_id"))
        .select(col("id"),
          least(col("cluster_id"), col("p_label")).as("cluster_id"),
          col("old"))
        .observe(obs, sum(when(col("cluster_id") =!= col("old"), 1L)
          .otherwise(0L)).as("changed"))
        .select(col("id"), col("cluster_id"))
        .localCheckpoint(true) // truncate the growing iterative lineage
      changed = Option(obs.get("changed")).map(_.asInstanceOf[Long])
        .getOrElse(0L)
      labels = next
      it += 1
    }
    if (changed > 0)
      throw graft.GraftError.Other(
        s"clusterAssign did not converge in $maxIter iterations — " +
          "raise maxIter; returning would silently split components")
    labels
  }

  /** SimHash candidate pairs by the standard 4×16-bit chunk trick, behind
    * the same ADAPTIVE exact-collapse pre-pass as [[nearDupPairs]]
    * (distinct corpora route straight to the flat form): identical
    * normalized texts share their SimHash, so the chunk equi-join — whose
    * in-group quadratic was the dominant hot-×100 cost (every duplicate
    * group of d texts yields d²/2 candidate rows, measured 75 s at ×100
    * duplication) — runs on distinct texts only, and member pairs expand
    * back with hamming 0 (intra) or their representatives' hamming
    * (cross). Output-identical to [[simhashCandidatesFlat]]
    * (DedupSpec-pinned). */
  def simhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        maxHamming: Int = 3): DataFrame =
    collapseExpand(df, textCol, idCol,
      reps => simhashCandidatesFlat(reps, "__text", "id", maxHamming),
      flatPairs = () => simhashCandidatesFlat(df, textCol, idCol, maxHamming),
      intraCols = Seq(lit(0).as("hamming")),
      intraKeep = lit(0) <= maxHamming)

  /** The flat SimHash candidate formulation: two 64-bit prints within
    * Hamming distance 3 must agree exactly on at least one of the 4
    * 16-bit chunks, so candidates come from an equi-join on
    * (chunk index, chunk value) — never all-pairs. */
  def simhashCandidatesFlat(df: DataFrame, textCol: String, idCol: String,
                            maxHamming: Int = 3): DataFrame = {
    // the 4-chunk pigeonhole only guarantees candidate generation up to
    // Hamming 3 (4 differing bits can land one per chunk and never share
    // an equi-join key); a larger radius would SILENTLY lose pairs that
    // the final hamming filter means to keep — fail loudly instead
    require(maxHamming <= 3,
      s"simhashCandidates: maxHamming=$maxHamming exceeds the lossless " +
        "radius of the 4x16-bit chunk join (3); use more/narrower chunks " +
        "for a larger radius")
    val sh = simhashes(df, textCol, idCol)
      .select(col("id"), col("simhash").as("sh"))
    val chunked = sh.withColumn("chunk", explode(expr(
        "transform(sequence(0, 3), c -> " +
          "struct(c AS c, shiftright(sh, c * 16) & 65535 AS v))")))
      .select(col("id"), col("sh"), col("chunk.c").as("c"),
        col("chunk.v").as("v"))
    val a = chunked.as("a"); val b = chunked.as("b")
    a.join(b, col("a.c") === col("b.c") && col("a.v") === col("b.v") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        expr("bit_count(a.sh ^ b.sh)").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
