package graft.queries

/** The data dir an oracle dump is being produced FOR.
  *
  * Trained-constant memos (centroids, PQ codebooks, BPE merges, the
  * HashOracles run handles) are all keyed by sfDir, but the dump-time
  * thunks used to read a last-run-wins `@volatile` global — correct in
  * the driver's one-dir-per-JVM Verify shape, wrong the moment two data
  * dirs run in one JVM (the ×10 matrix, ad-hoc probes): the dump would
  * embed the OTHER dir's trained constants and fail as a confusing value
  * diff (r16 advice). Dumpers (Verify, ScaleUp-style local gates) set
  * this before building `SparkEntry.oracleSql`; thunks resolve their
  * per-dir cache through it and fall back to the legacy last-run global
  * only when unset (ad-hoc `oracleSql` reads outside any dumper). */
object OracleDump {
  @volatile var sfDir: Option[String] = None

  /** Per-dir cache lookup for the dir being dumped, falling back to the
    * last-run-wins value when no dump dir is declared. */
  def resolve[T](cache: scala.collection.concurrent.TrieMap[String, T],
                 last: Option[T]): Option[T] =
    sfDir match {
      case Some(d) => cache.get(d).orElse(last)
      case None    => last
    }
}
