package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Packing, TextAnalysis}

/** Round-4 curation operators: substring-span dedup, n-gram novelty,
  * heavy hitters, per-source KL drift, shard manifest, padding report.
  */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("substringSpanPairs flags docs sharing an exact 8-token span") {
    val span = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"intro words here then $span and a tail"),
      (2L, s"$span with a completely different continuation afterwards"),
      (3L, "nothing in common with anybody else at all in this text")
    ).toDF("doc_id", "text")
    val got = Dedup.substringSpanPairs(docs, "doc_id", "text", spanTokens = 8,
        maxDocFrequency = None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 1L)), s"exactly the planted pair: $got")
  }

  test("substringSpanPairs' default cap drops corpus-boilerplate spans") {
    // 30 docs share ONLY an 8-token boilerplate (df ~ 94%); docs 31/32
    // also share a private 8-token span. The cap kills the C(30+2, 2)
    // boilerplate pairing but keeps the private-span pair.
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    val priv = "p1 p2 p3 p4 p5 p6 p7 p8"
    val docs = ((1 to 30).map(i => (i.toLong, s"u$i v$i w$i $boiler")) ++ Seq(
      (31L, s"$priv $boiler"), (32L, s"$priv then something else $boiler")))
      .toDF("doc_id", "text")
    val uncapped = Dedup.substringSpanPairs(docs, "doc_id", "text",
      spanTokens = 8, maxDocFrequency = None).count()
    assert(uncapped > 400, s"boilerplate must pair nearly everything: $uncapped")
    val capped = Dedup.substringSpanPairs(docs, "doc_id", "text", spanTokens = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(capped == Seq((31L, 32L)), s"only the private-span pair: $capped")
  }

  test("novelty is 1 for first occurrence, 0 for a verbatim re-ingest") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact copy, later id
      (3L, "alpha beta gamma zeta eta theta iota")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.novelty(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((3L, 3L, 1.0)), got.toString)
    assert(got(2L) == ((3L, 0L, 0.0)), got.toString)
    // doc 3: 5 shingles, 'alpha beta gamma' seen in doc 1 → 4/5 novel.
    assert(got(3L) == ((5L, 4L, 0.8)), got.toString)
  }

  test("heavyHitters returns only tokens above the support threshold") {
    val docs = Seq((1L, ("hot " * 50).trim + " cold rare"),
      (2L, ("hot " * 48).trim + " cold other")).toDF("doc_id", "text")
    val got = TextAnalysis.heavyHitters(docs, "text", minShare = 0.1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set("hot"), s"only 'hot' exceeds 10%: $got")
    assert(got("hot") == 98L)
  }

  test("spanCorruption: sentinel numbering, target/mask parity, reassembly") {
    import graft.ops.Packing
    val docs = (1L to 40L).map(i =>
      (i, (1 to 20).map(t => s"w$t").mkString(" "))).toDF("doc_id", "text")
    val got = Packing.spanCorruption(docs, "doc_id", "text",
        blockLen = 5, maskProb = 0.5)
      .select("doc_id", "n_blocks", "n_masked", "input_text", "target_text")
      .as[(Long, Long, Long, String, String)].collect()
    assert(got.forall(_._2 == 4L)) // 20 tokens / 5 per block
    got.foreach { case (_, _, m, in, tgt) =>
      // Every sentinel 0..m-1 appears exactly once in input AND target.
      (0L until m).foreach { k =>
        assert(in.split(" ").count(_ == s"<extra_id_$k>") == 1, in)
        assert(tgt.contains(s"<extra_id_$k> "), tgt)
      }
      assert(!in.contains(s"<extra_id_$m>") && !tgt.contains(s"<extra_id_$m>"))
      // Masked token mass moved to the target: input tokens + target
      // tokens (minus sentinels on both sides) = the original 20.
      val inToks = in.split(" ").count(!_.startsWith("<extra_id_"))
      val tgtToks =
        if (tgt.isEmpty) 0 else tgt.split(" ").count(!_.startsWith("<extra_id_"))
      assert(inToks + tgtToks == 20, s"$in | $tgt")
    }
    // ~50% masking actually masks something across 40 docs.
    assert(got.map(_._3).sum > 0)
  }

  test("spanCorruption: near-zero maskProb reproduces the document; short doc = 1 block") {
    import graft.ops.Packing
    val docs = Seq((7L, "alpha beta gamma")).toDF("doc_id", "text")
    val got = Packing.spanCorruption(docs, "doc_id", "text",
        blockLen = 5, maskProb = 1e-9)
      .select("n_blocks", "n_masked", "input_text", "target_text")
      .as[(Long, Long, String, String)].collect().head
    assert(got == ((1L, 0L, "alpha beta gamma", "")))
  }

  test("charEntropy: constant text → 0, uniform pair → ln 2, empty → null") {
    val docs = Seq((1L, "aaaa"), (2L, "abab"), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .select("doc_id", "n_chars", "char_entropy")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got == Set(
      (1L, 4L, Some(0.0)),
      (2L, 4L, Some(math.floor(math.log(2.0) * 1e6) / 1e6)), // 0.693147
      (3L, 0L, None)), got.toString)
  }

  test("cohensKappa: perfect agreement → 1; independent raters → ~0; constant-equal → null") {
    import graft.ops.Stats
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("r1", "r2")
    val k1 = Stats.cohensKappa(perfect, "r1", "r2")
      .select("kappa").as[Double].collect().head
    assert(k1 == 1.0)
    // 2×2 balanced independence: every cell 1 → p_o = 0.5, p_e = 0.5, κ = 0.
    val indep = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"))
      .toDF("r1", "r2")
    val k0 = Stats.cohensKappa(indep, "r1", "r2")
      .select("kappa").as[Double].collect().head
    assert(k0 == 0.0)
    // Both raters constant and equal: p_e = 1 → κ undefined (null).
    val const = Seq(("a", "a"), ("a", "a")).toDF("r1", "r2")
    val kNull = Stats.cohensKappa(const, "r1", "r2")
      .select("kappa").collect().head
    assert(kNull.isNullAt(0))
    // Null labels are excluded, not treated as a category.
    val withNull = Seq(("a", "a"), (null, "b"), ("b", null), ("b", "b"))
      .toDF("r1", "r2")
    val n = Stats.cohensKappa(withNull, "r1", "r2")
      .select("n_items").as[Long].collect().head
    assert(n == 2L)
  }

  test("vocabCoverage: inclusive mass at the ranked cut; oversized V clamps") {
    // Corpus: "a"×6, "b"×3, "c"×1 → total 10. Rank order a, b, c.
    val docs = Seq((1L, "a a a b b c"), (2L, "a a a b")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(docs, "text", Seq(1, 2, 99))
      .select("vocab_size", "n_terms", "covered_tokens", "total_tokens", "coverage")
      .as[(Int, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1, 1L, 6L, 10L, 0.6),   // top-1 = "a"
      (2, 2L, 9L, 10L, 0.9),   // + "b"
      (99, 3L, 10L, 10L, 1.0)  // clamps to the 3-term vocabulary
    ), got.toString)
  }

  test("vocabCoverage ties rank by token ascending") {
    // "x" and "y" both occur twice: rank 1 must be "x" (asc tie), so
    // V = 1 covers exactly 2 of 4 tokens.
    val docs = Seq((1L, "y x y x")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(docs, "text", Seq(1))
      .select("covered_tokens", "coverage").as[(Long, Double)].collect().head
    assert(got == ((2L, 0.5)))
  }

  test("sourceJsDivergence: identical → 0, disjoint vocab → ln 2") {
    val docs = Seq(
      (1L, "alpha beta gamma", "s1"),
      (2L, "alpha beta gamma", "s2"),   // identical distribution to s1
      (3L, "delta epsilon zeta", "s3")  // disjoint vocabulary
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourceJsDivergence(docs, "text", "source", v = 50)
      .select("source_a", "source_b", "js")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("s1", "s2")) == 0.0, got.toString)
    assert(got(("s1", "s3")) == got(("s2", "s3")), got.toString)
    assert(math.abs(got(("s1", "s3")) - 0.693147) < 1e-6, got.toString)
  }

  test("sourceDivergence: identical mixes score ~0, shifted mixes score > 0") {
    val balanced = (1 to 20).flatMap(i => Seq(
      (i.toLong, "common words shared by every source here", "srcA"),
      (100L + i, "common words shared by every source here", "srcB")))
    val skewed = (200 to 219).map(i =>
      (i.toLong, "peculiar vocabulary peculiar vocabulary peculiar drift", "srcC"))
    val docs = (balanced ++ skewed).toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourceDivergence(docs, "text", "source", v = 50)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("srcA") == got("srcB"), "identical distributions, identical KL")
    assert(got("srcC") > got("srcA"), s"drifted source must score higher: $got")
    assert(got.values.forall(_ >= 0.0), s"KL within a shared vocab >= 0: $got")
  }

  test("shardManifest gives every doc a unique (shard, pos); pos is dense from 0") {
    val docs = (1 to 100).map(_.toLong).toDF("doc_id")
    val m = Packing.shardManifest(docs, "doc_id", nShards = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(m.length == 100 && m.map(_._1).distinct.length == 100)
    m.groupBy(_._2).foreach { case (shard, rows) =>
      val ps = rows.map(_._3).sorted.toSeq
      assert(ps == (0L until rows.length).toSeq, s"shard $shard dense positions")
    }
    // Deterministic across invocations.
    val again = Packing.shardManifest(docs, "doc_id", nShards = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(m.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("bpePairCounts ranks the dominant adjacent character pair first") {
    val docs = Seq((1L, "aaab aaab banana"), (2L, "aaab cab")).toDF("doc_id", "text")
    // 'aa' appears 2 per 'aaab' × 3 occurrences = 6; 'ab' = 3×'aaab' +
    // 'cab' = 4; 'an' and 'na' = 2 each from 'banana'; 'ba' = 1+1; 'ca' = 1.
    val got = TextAnalysis.bpePairCounts(docs, "text", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == Seq(("aa", 6L, 1), ("ab", 4L, 2), ("an", 2L, 3)), got.toString)
    // Single-char words contribute nothing and must not crash.
    val tiny = Seq((1L, "a b cd")).toDF("doc_id", "text")
    val t = TextAnalysis.bpePairCounts(tiny, "text", k = 5).collect()
    assert(t.map(_.getString(0)).toSeq == Seq("cd"))
  }

  test("paddingReport quantifies bucketed vs naive padding waste") {
    // tokens: 10, 60, 64, 100, 600(→512 capped)
    val docs = Seq((1L, 10L), (2L, 60L), (3L, 64L), (4L, 100L), (5L, 600L))
      .toDF("doc_id", "n_tokens_ws")
    val got = Packing.paddingReport(docs, "n_tokens_ws", maxLen = 512, bucket = 64)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5), r.getDouble(6)))
      .toMap
    // bucket 64: docs with 10, 60, 64 tokens → 134 real of 192 padded.
    assert(got(64L)._1 == 3L && got(64L)._2 == 134L && got(64L)._3 == 192L)
    // waste is reported at 6 dp.
    assert(got(64L)._4 == math.rint((1.0 - 134.0 / 192) * 1e6) / 1e6)
    // bucket 128: the 100-token doc; bucket 512: the capped 600-token doc.
    assert(got(128L)._2 == 100L && got(512L)._2 == 512L)
    assert(got(512L)._4 == 0.0, "a full sequence wastes nothing bucketed")
    // Naive waste >= bucketed waste everywhere (that's the point).
    got.values.foreach { case (_, _, _, w, nw) => assert(nw >= w) }
  }

  test("mixturePlan: targets, rates, epoch splits; unmapped strata visible at share 0") {
    // src a: 100 tokens available, share 0.5 of a 400-token budget -> 200
    // target -> rate 2.0 (one full epoch + one full repeat). src b: 400
    // available, share 0.5 -> 200 target -> rate 0.5 (downsample). src c:
    // NOT in the recipe -> share 0, target 0 - present in the plan, not
    // silently dropped.
    val df = Seq(
      (1L, "a", 60L), (2L, "a", 40L),
      (3L, "b", 150L), (4L, "b", 250L),
      (5L, "c", 999L)).toDF("id", "src", "toks")
    val plan = graft.ops.Sampling.mixturePlan(df, "src", "toks",
        Map("a" -> 0.5, "b" -> 0.5), totalBudget = 400L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(plan("a").getAs[Long]("available_tokens") == 100L)
    assert(plan("a").getAs[Long]("target_tokens") == 200L)
    assert(plan("a").getAs[Double]("rate") == 2.0)
    assert(plan("a").getAs[Long]("epochs_full") == 2L &&
      plan("a").getAs[Double]("epochs_frac") == 0.0)
    assert(plan("b").getAs[Double]("rate") == 0.5)
    assert(plan("b").getAs[Long]("epochs_full") == 0L &&
      plan("b").getAs[Double]("epochs_frac") == 0.5)
    assert(plan("c").getAs[Double]("share") == 0.0 &&
      plan("c").getAs[Long]("target_tokens") == 0L)
    // Normalization: shares that do not sum to 1 are scaled (3:1 here).
    val norm = graft.ops.Sampling.mixturePlan(df, "src", "toks",
        Map("a" -> 3.0, "b" -> 1.0), totalBudget = 400L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("target_tokens")).toMap
    assert(norm("a") == 300L && norm("b") == 100L)
  }

  test("tokenizerFertility: ratio semantics and token-less docs skipped as nulls") {
    val df = Seq(
      (1L, "en", "don't stop"),          // ws=2; re: don,',t,stop = 4 -> f=2.0
      (2L, "en", "abc def"),             // ws=2, re=2 -> f=1.0
      (3L, "zz", "")).toDF("doc_id", "lang", "text")
    val got = graft.ops.TextAnalysis.tokenizerFertility(df, "doc_id", "text", "lang")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("en").getAs[Double]("fertility") == 1.5) // avg(2.0, 1.0)
    assert(got("en").getAs[Long]("n_docs") == 2L)
    // Empty doc: split('') = [''] so ws=1 and fertility 0/1 = 0.0 (the
    // same convention as the token-count gate's oracle); 0 regex tokens
    // null out chars_per_token, which avg skips.
    assert(got("zz").getAs[Double]("fertility") == 0.0)
    assert(got("zz").isNullAt(2))
    assert(got("zz").getAs[Long]("n_docs") == 1L)
  }
}
