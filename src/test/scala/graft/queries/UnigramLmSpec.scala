package graft.queries

import graft.SparkSpec
import graft.functions.{Bpe, UnigramLm, UnigramTable}

/** t47 — the unigram-LM (SentencePiece-family) tokenizer. Pins, in
  * order: the Viterbi DP against an independent Scala brute-force
  * enumeration (the same cross-algorithm check the DuckDB oracle runs
  * at dump time), trainer determinism and REAL pruning pressure on the
  * planted wide-vocab corpus (the harness corpus' 31 words never bind
  * the budget — the BpeSaturationSpec lesson), fertility side-by-side
  * with the trained BPE on identical text, and the registered row's
  * zero-exchange plan.
  *
  * Mutation kill recorded in BASELINE.md: inverting the pruning order
  * (keep least-used pieces) fails the wide-vocab tests — the trained
  * vocabulary loses every frequent multi-char piece. */
class UnigramLmSpec extends SparkSpec {

  // exhaustive segmentation enumeration — the oracle's algorithm,
  // reimplemented independently of the engine's DP
  private def enumerate(w: String, costs: Map[String, Long])
      : (Long, Long) = {
    if (w.isEmpty) return (0L, 0L)
    val opts = for {
      len <- 1 to w.length
      piece = w.substring(0, len)
      c <- costs.get(piece).orElse(
        if (len == 1) Some(UnigramLm.UnkCost) else None)
    } yield {
      val (rc, rn) = enumerate(w.substring(len), costs)
      (c + rc, 1L + rn)
    }
    opts.min
  }

  test("Viterbi == brute-force enumeration on seeded random vocab/words") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcd"
    (1 to 30).foreach { _ =>
      val pieces = (1 to 12).map { _ =>
        val len = 1 + rnd.nextInt(3)
        (1 to len).map(_ => alphabet(rnd.nextInt(4))).mkString
      }.distinct
      val vocab = pieces.map(p => p -> (1000L + rnd.nextInt(9000)))
      val t = new UnigramTable(vocab)
      val costs = vocab.toMap
      (1 to 20).foreach { _ =>
        val w = (1 to (1 + rnd.nextInt(8)))
          .map(_ => alphabet(rnd.nextInt(4))).mkString
        assert(UnigramLm.viterbi(w, t) == enumerate(w, costs),
          s"DP/enumeration divergence on '$w' with vocab $vocab")
      }
    }
  }

  test("unknown single chars cost UnkCost; empty word is (0,0)") {
    val t = new UnigramTable(Seq("ab" -> 100L, "a" -> 50L, "b" -> 60L))
    assert(UnigramLm.viterbi("", t) == (0L, 0L))
    // 'z' not in vocab: one unk piece
    assert(UnigramLm.viterbi("z", t) == (UnigramLm.UnkCost, 1L))
    // "ab" as one piece (100) beats a+b (110)
    assert(UnigramLm.viterbi("ab", t) == (100L, 1L))
    // cost tie broken by fewer pieces: give a+b == ab
    val t2 = new UnigramTable(Seq("ab" -> 110L, "a" -> 50L, "b" -> 60L))
    assert(UnigramLm.viterbi("ab", t2) == (110L, 1L))
  }

  test("trainer is deterministic and the budget binds with real pruning " +
    "pressure on the wide-vocab corpus") {
    val syll = Array("ka", "to", "ri", "mu", "en", "so", "pla", "ver")
    val words = (0 until 800).map { i =>
      Seq(i % 8, (i / 8) % 8, (i / 64) % 8, (i / 512) % 8)
        .map(syll).mkString
    }.distinct
    val texts = words.flatMap(w => Seq(w, w))
    val v1 = UnigramLm.train(texts, vocabSize = 200, rounds = 2)
    val v2 = UnigramLm.train(texts, vocabSize = 200, rounds = 2)
    assert(v1 == v2, "trainer must be a pure function of the sample")
    assert(v1.size <= 200)
    val multi = v1.filter(_._1.length > 1)
    // hard-EM usage pruning CONCENTRATES: each 4-syllable word Viterbi-
    // segments into two 2-syllable pieces (MaxPieceLen=6 < word length),
    // so the survivors are the syllable-bigram working set (~44 of the
    // 64 combinations), not the whole seed — that concentration IS the
    // pruning pressure being pinned here
    assert(multi.size > 30 && multi.size < 200,
      s"${multi.size} multi-char pieces survived — outside the " +
        "working-set band, pruning behavior changed")
    // pruning kept the USEFUL pieces: every syllable (frequent across
    // the vocabulary) must survive, with a cost below the unk path
    val kept = v1.map(_._1).toSet
    syll.foreach(s => assert(kept.contains(s),
      s"frequent syllable '$s' was pruned — wrong pruning order"))
    val t = new UnigramTable(v1)
    // held-out recombination segments into few, cheap pieces
    val (c, np) = UnigramLm.viterbi("katoriver", t)
    assert(np <= 5 && c < UnigramLm.UnkCost,
      s"held-out word cost=$c pieces=$np — vocabulary did not generalize")
  }

  test("fertility vs the trained BPE on identical wide-vocab text " +
    "(the t44 bake-off, in-suite)") {
    val syll = Array("ka", "to", "ri", "mu", "en", "so", "pla", "ver")
    val words = (0 until 800).map { i =>
      Seq(i % 8, (i / 8) % 8, (i / 64) % 8, (i / 512) % 8)
        .map(syll).mkString
    }.distinct
    val texts = words.flatMap(w => Seq(w, w))
    val uni = new UnigramTable(UnigramLm.train(texts, 400, 2))
    val bpe = Bpe.toRanks(Bpe.train(texts, 1000))
    val uniPieces = words.map(w => UnigramLm.viterbi(w, uni)._2).sum
    val bpePieces = words.map(w => Bpe.countTokens(w, bpe).toLong).sum
    val uniFert = uniPieces.toDouble / words.size
    val bpeFert = bpePieces.toDouble / words.size
    info(f"wide-vocab fertility: unigram $uniFert%.3f vs BPE $bpeFert%.3f " +
      f"pieces/word (vocab budgets 400 / 1000 merges)")
    // both are genuine sub-word tokenizers here: above 1 piece/word,
    // below character-level
    val avgLen = words.map(_.length).sum.toDouble / words.size
    assert(uniFert > 1.0 && uniFert < avgLen)
    // BPE saturates to exactly 1.0 here (every word repeats, so merges
    // reach whole words); unigram cannot memorize past MaxPieceLen=6 —
    // the structural difference between the families the bake-off shows
    assert(bpeFert >= 1.0 && bpeFert < avgLen)
  }

  test("registered t47 plan: zero exchanges — text dies scan-side") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.Exchange
    val plan = Registry.queries("t47_unigram_token_count")(spark, sf)
      .queryExecution.executedPlan
    val root = plan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p                        => p
    }
    val exchanges = root.collect { case e: Exchange => e }
    assert(exchanges.isEmpty,
      s"t47 must be a pure scan-side map:\n$root")
  }

  test("registered t47 totals are consistent with the t37 word counts " +
    "on sf0.001 (same pre-tokenizer)") {
    val uni = Registry.queries("t47_unigram_token_count")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val bpe = TextQueries.bpeLayout(
        spark.read.parquet(s"$sf/documents.parquet"),
        TextQueries.trainedBpe(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bpeLayout drops zero-word docs; t47 keeps them at 0
    bpe.foreach { case (doc, nWords) =>
      assert(uni(doc)._1 == nWords,
        s"doc $doc: unigram n_words ${uni(doc)._1} != bpe $nWords")
      assert(uni(doc)._2 >= nWords,
        s"doc $doc: fewer pieces than words — impossible for a " +
          "full-coverage tokenizer")
    }
  }
}
