package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The scale-up tool must produce a FAITHFUL ×F world: F× the rows with
  * intact foreign keys, disjoint key spaces per replica, and de-correlated
  * document text — otherwise the scaling measurement in BASELINE.md would
  * be benching a corrupted (or artificially duplicate-heavy) corpus. */
class ScaleUpSpec extends SparkSpec {
  import ScaleUp.{scaleTable, Stride}

  private def t(name: String) =
    spark.read.parquet(s"$sf/$name.parquet")

  test("facts replicate F×, dims are untouched, ×1 is the identity") {
    val docs = t("documents")
    assert(scaleTable(docs, "documents", 3).count() === 3 * docs.count())
    val nation = t("nation")
    assert(scaleTable(nation, "nation", 3).collect().toSeq ===
      nation.collect().toSeq)
    // ×1 through the replica path must be value-identical to the source
    val li = t("lineitem")
    assert(scaleTable(li, "lineitem", 1).exceptAll(li).isEmpty &&
      li.exceptAll(scaleTable(li, "lineitem", 1)).isEmpty)
  }

  test("foreign keys stay consistent within replicas at ×3") {
    val orders = scaleTable(t("orders"), "orders", 3)
    val lineitem = scaleTable(t("lineitem"), "lineitem", 3)
    val customer = scaleTable(t("customer"), "customer", 3)
    // every scaled lineitem still finds its scaled order, and every order
    // its customer — a shift applied to one side only would orphan rows
    assert(lineitem.join(orders,
      lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")
      .count() === 0)
    assert(orders.join(customer,
      orders("o_custkey") === customer("c_custkey"), "left_anti")
      .count() === 0)
  }

  test("replica key spaces are disjoint shifts of the original") {
    val src = t("customer")
    val scaled = scaleTable(src, "customer", 3)
    val orig = src.select("c_custkey").collect().map(_.getLong(0)).toSet
    val keys = scaled.select("c_custkey").collect().map(_.getLong(0))
    assert(keys.length === 3 * orig.size && keys.toSet.size === keys.length)
    (0 until 3).foreach { r =>
      val replica = keys.filter(k => k >= r * Stride && k < (r + 1) * Stride)
      assert(replica.map(_ - r * Stride).toSet === orig,
        s"replica $r must be the original key set shifted by $r*Stride")
    }
  }

  test("document text is de-correlated across replicas, same length") {
    val scaled = scaleTable(t("documents"), "documents", 3)
      .select(pmod(col("doc_id"), lit(Stride)).as("orig_id"),
        (col("doc_id") / Stride).cast("int").as("replica"),
        col("text"))
    val byDoc = scaled.groupBy("orig_id")
      .agg(countDistinct("text").as("n_texts"),
        countDistinct(length(col("text"))).as("n_lens"))
      .collect()
    // rotation makes each replica's text distinct but length-preserving
    assert(byDoc.forall(_.getLong(1) === 3L), "texts must differ per replica")
    assert(byDoc.forall(_.getLong(2) === 1L), "rotation must preserve length")
    // replica 0 is bit-for-bit the original corpus
    val r0 = scaled.where(col("replica") === 0)
      .select(col("orig_id").as("doc_id"), col("text"))
    val orig = t("documents").select("doc_id", "text")
    assert(r0.exceptAll(orig).isEmpty && orig.exceptAll(r0).isEmpty)
  }

  test("text de-correlation holds at ANY factor (no repeat past 26)") {
    // the original alphabet rotation repeated verbatim at replica 26 —
    // a ×100 grow world was silently duplicate-heavy; the keyed cipher
    // must keep every replica pair distinct and length-preserving
    val t = "The quick brown Fox, jumps over 12 lazy dogs!"
    val reps = Seq(0L, 1L, 25L, 26L, 52L, 77L, 99L)
    val texts = reps.map(r => ScaleUp.cipherText(t, r))
    assert(texts.toSet.size === reps.size, "all replicas must differ")
    assert(texts.forall(_.length === t.length))
    assert(ScaleUp.cipherText(t, 0L) === t, "replica 0 is the identity")
    // non-letters and case classes survive at every replica
    texts.foreach { c =>
      assert(c.count(_ == ' ') === t.count(_ == ' '))
      assert(c.indexOf(',') === t.indexOf(','))
      assert(c.contains(" 12 "))
      assert(c.zip(t).forall { case (cc, tc) =>
        (cc.isLower == tc.isLower) && (cc.isUpper == tc.isUpper) })
    }
    // shingle overlap between any two replicas is essentially zero
    def grams(s: String) = s.sliding(5).toSet
    val g = texts.map(grams)
    for (i <- g.indices; j <- g.indices if i < j) {
      val inter = g(i).intersect(g(j)).size
      assert(inter <= 3, s"replicas ${reps(i)} and ${reps(j)} share $inter shingles")
    }
  }

  test("hot mode: row ids shift but users and texts stay identical") {
    val ev = scaleTable(t("events"), "events", 3, mode = "hot")
    val src = t("events")
    // 3x the events, SAME user population (every user 3x hotter)
    assert(ev.count() === 3 * src.count())
    assert(ev.select("user_id").distinct().count() ===
      src.select("user_id").distinct().count())
    val ids = ev.select("event_id").collect().map(_.getLong(0))
    assert(ids.toSet.size === ids.length, "event ids must stay unique")
    // documents: 3x exact duplicates per text, ids still unique
    val docs = scaleTable(t("documents"), "documents", 3, mode = "hot")
    val perText = docs.groupBy("text").count().select("count").collect()
    assert(perText.forall(_.getLong(0) % 3 === 0),
      "every text must appear in exact multiples of the factor")
  }
}
