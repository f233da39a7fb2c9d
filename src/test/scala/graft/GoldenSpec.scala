package graft

import org.apache.spark.sql.functions.{col, round}
import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.ops.CohortFilter
import graft.query.QueryEngine

/** Golden end-to-end test (SURVEY.md §5 item 5): the full §3.1 lifecycle on
  * reference-shaped GeoMTS fixtures, with every expected number computed
  * INDEPENDENTLY from the in-memory fixture sequences (a second
  * implementation as oracle, like the reference's pandas recompute).
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val subjectsDf = Fixtures.users.toDF()
  private lazy val hrDf = Fixtures.heartRates.toDF("user_id", "timestamp", "value")

  private val spec = QuerySpec(
    subjectSelection = ByAttributes(Seq(
      CohortFilter.NumericRange("age", 30, 60, nullOk = false),
      CohortFilter.BooleanEq("consent", value = true, nullOk = false))),
    controlSelection = AllUsers,
    startDate = "2016-08-02", endDate = "2016-08-03")

  test("cohort-analysis lifecycle matches an independent recomputation") {
    val bundle = QueryEngine.run(spec, subjectsDf, hrDf, "user_id", "timestamp", "value")

    // Independent recomputation from the raw sequences:
    val cohortIds = Fixtures.users.filter(u =>
      u.age.exists(a => a >= 30 && a <= 60) && u.consent.contains(true))
      .map(_.user_id).toSet
    assert(cohortIds.nonEmpty, "fixture must yield a non-trivial cohort")
    val d0 = java.sql.Timestamp.valueOf("2016-08-02 00:00:00").getTime
    val d1 = java.sql.Timestamp.valueOf("2016-08-04 00:00:00").getTime // exclusive
    val windowRows = Fixtures.heartRates.filter { case (_, ts, _) =>
      ts.getTime >= d0 && ts.getTime < d1
    }
    val subjRows = windowRows.filter(r => cohortIds.contains(r._1))

    val got = bundle.kpis.head()
    assert(got.getAs[Long]("subj_rows") == subjRows.size)
    assert(got.getAs[Long]("ctrl_rows") == windowRows.size)
    val expAvg = subjRows.map(_._3).sum / subjRows.size
    assert(math.abs(got.getAs[Double]("subj_avg") - expAvg) < 1e-9)
    assert(got.getAs[Double]("subj_min") == subjRows.map(_._3).min)
    assert(got.getAs[Double]("subj_max") == subjRows.map(_._3).max)
    val expCtrlAvg = windowRows.map(_._3).sum / windowRows.size
    assert(math.abs(got.getAs[Double]("delta_avg") - (expAvg - expCtrlAvg)) < 1e-9)

    // Per-user spans: every cohort user present, span bounds exact.
    val spans = bundle.userSpans.collect()
      .map(r => r.getString(0) -> (r.getTimestamp(1), r.getTimestamp(2))).toMap
    assert(spans.keySet == cohortIds.filter(id => subjRows.exists(_._1 == id)))
    val u = spans.keySet.head
    val uRows = subjRows.filter(_._1 == u).map(_._2.getTime)
    assert(spans(u)._1.getTime == uRows.min && spans(u)._2.getTime == uRows.max)

    // Time-of-day ranges: counts match a direct recompute (incl. Sleep wrap).
    val todCounts = bundle.todKpis.collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    def tod(ts: java.sql.Timestamp): String = {
      // Format under UTC to match the engine's fixed UTC session zone —
      // SimpleDateFormat otherwise uses the JVM default zone and the
      // expected counts would diverge on a non-UTC machine.
      val fmt = new java.text.SimpleDateFormat("HH:mm:ss")
      fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      fmt.format(ts)
    }
    val sleepExpected = subjRows.count { case (_, ts, _) =>
      val t = tod(ts); t >= "20:00:00" || t <= "04:45:00"
    }
    val workoutExpected = subjRows.count { case (_, ts, _) =>
      val t = tod(ts); t >= "06:45:00" && t <= "09:30:00"
    }
    assert(todCounts("Sleep") == sleepExpected)
    assert(todCounts("Workout") == workoutExpected)
  }

  test("trajectory endpoints match the raw walk's first/last points") {
    val locDf = Fixtures.locations.toDF("user_id", "timestamp", "lon", "lat")
    val got = graft.ops.Trajectory.endpoints(locDf, "user_id", "timestamp", "lon", "lat")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    val raw = Fixtures.locations.groupBy(_._1)
    raw.foreach { case (uid, rows) =>
      val sorted = rows.sortBy(_._2.getTime)
      def fmt(p: (String, java.sql.Timestamp, Double, Double)) =
        f"${p._3}%.6f ${p._4}%.6f"
      assert(got(uid)._1 == fmt(sorted.head), s"start of $uid")
      assert(got(uid)._2 == fmt(sorted.last), s"end of $uid")
    }
  }

  test("export bundle writes all result frames as readable CSV (S11)") {
    val bundle = QueryEngine.run(spec, subjectsDf, hrDf, "user_id", "timestamp", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft_exp").toString
    QueryEngine.exportBundle(bundle, dir)
    Seq("kpis", "user_spans", "tod_kpis").foreach { name =>
      val back = spark.read.option("header", "true").csv(s"$dir/$name")
      assert(back.count() > 0, name)
    }
  }

  test("text_compression_ratio matches its committed golden file and raw zlib") {
    // The gate for this query is a GOLDEN-FILE oracle (DuckDB cannot
    // deflate): this spec is the hash-pin behind it — the live engine
    // output must equal the committed parquet bit-for-bit, and the
    // deflate sizes must equal an INDEPENDENT java.util.zip recompute
    // (non-circular ground truth; same level-6 raw-deflate convention).
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bytes"),
        r.getAs[Long]("deflate_bytes"), r.getAs[Double]("compress_ratio"))
    val got = graft.ops.TextAnalysis.compressionRatio(docs, "doc_id", "text")
      .collect().map(key).sortBy(_._1).toSeq
    val golden = spark.read
      .parquet("tools/golden/text_compression_ratio_sf0_001.parquet")
      .collect().map(key).sortBy(_._1).toSeq
    assert(got == golden,
      "engine output diverged from tools/golden — regenerate ONLY for a deliberate semantic change")
    val zlib = docs.select("doc_id", "text").collect().map { r =>
      val bytes = r.getString(1).getBytes("UTF-8")
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](1024)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      d.end()
      r.getLong(0) -> total
    }.toMap
    got.foreach { case (id, _, defl, _) =>
      assert(zlib(id) == defl, s"doc $id: zlib ground truth ${zlib(id)} vs $defl")
    }
  }

  test("text_bpe_tokens matches its committed golden file and a naive reimplementation") {
    // Same non-circular structure as the compression pin: engine output ==
    // committed golden (value compare), and the tokens must equal an
    // INDEPENDENT naive BPE implementation (recursive list-based, distinct
    // from the expression's in-place merge loop).
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = graft.queries.TextQueries.GateBpeMerges
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[String]("tokens_head"))
    val got = graft.ops.TextAnalysis.bpeTokens(docs, "doc_id", "text", merges)
      .collect().map(key).sortBy(_._1).toSeq
    val golden = spark.read
      .parquet("tools/golden/text_bpe_tokens_sf0_001.parquet")
      .collect().map(key).sortBy(_._1).toSeq
    assert(got == golden,
      "engine output diverged from tools/golden — regenerate ONLY for a deliberate semantic change")
    // Independent oracle: recursive merge over immutable lists.
    val rank = merges.zipWithIndex.toMap
    def enc(parts: List[String]): List[String] = {
      val cands: List[(Int, Int)] = parts.zip(parts.drop(1)).zipWithIndex
        .flatMap { pi => rank.get(pi._1).map(r => (r, pi._2)).toList }
      if (cands.isEmpty) parts
      else {
        val i: Int = cands.min._2
        enc(parts.take(i) ++ List(parts(i) + parts(i + 1)) ++ parts.drop(i + 2))
      }
    }
    val expected = docs.select("doc_id", "text").collect().map { r =>
      val toks = r.getString(1).split(' ').filter(_.nonEmpty).toList
        .flatMap(w => enc(w.map(_.toString).toList))
      (r.getLong(0), toks.length.toLong, toks.take(32).mkString(" "))
    }.sortBy(_._1).toSeq
    assert(got == expected, "expression diverged from the naive reimplementation")
  }

  // The gate for the one-pass production LSH path is a GOLDEN-FILE
  // oracle (the wrapping 64-bit Kirsch–Mitzenmacher arithmetic has no
  // safe SQL form): this pin is the non-circular check behind it — the
  // live engine output must equal the committed parquet, AND the pair
  // set must equal an INDEPENDENT driver-side reimplementation of the
  // whole path (shingles → hot-filter → KM signatures → planner-banded
  // buckets → exact-Jaccard verify), written against immutable Scala
  // collections rather than the engine's relational plan. Run at BOTH
  // sf0.001 and sf0.01 (r15 advice: the sf0.01/sf0.1 goldens were
  // seeded from engine output, so without an independent pin at a
  // driver sf, a scale-dependent bug — e.g. in the hot-filter
  // threshold, which only engages on larger corpora — would be baked
  // into them unseen; sf0.01 is 500 docs, comfortably collect-sized).
  private def onePassPin(sfDir: String, goldenTag: String): Unit = {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("inter"),
        r.getAs[Double]("jaccard"), r.getAs[Int]("bands"),
        r.getAs[Int]("rows_per_band"))
    val got = graft.ops.Dedup.nearDuplicatesPlannedOnePass(docs, "doc_id",
        "text", minJaccard = 0.7, nPerms = 16)
      .select(col("doc_a"), col("doc_b"), col("inter"),
        round(col("jaccard"), 6).as("jaccard"), col("bands"),
        col("rows_per_band"))
      .collect().map(key).sortBy(p => (p._1, p._2)).toSeq
    graft.ops.OpCaches.releaseAll()
    val golden = spark.read
      .parquet(s"tools/golden/dedup_lsh_planned_onepass_$goldenTag.parquet")
      .collect().map(key).sortBy(p => (p._1, p._2)).toSeq
    assert(got == golden,
      "engine output diverged from tools/golden — regenerate ONLY for a deliberate semantic change")

    // Independent reimplementation. Tokenize/shingle/hot-filter:
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(t: String): Set[String] = {
      val ws = t.trim.split(" ", -1)
      if (ws.length >= 3) ws.sliding(3).map(_.mkString(" ")).toSet
      else Set.empty
    }
    val rawSets = texts.map { case (id, t) => id -> shingles(t) }
    val hot = rawSets.values.toSeq.flatten.groupBy(identity)
      .collect { case (s, occ) if occ.size > 0.1 * rawSets.size => s }.toSet
    val sets = rawSets.map { case (id, s) => id -> (s -- hot) }
      .filter(_._2.nonEmpty)
    // KM signature: md5(shingle) → (h1, h2); slot i keeps min(h1 + i·h2).
    def sig(s: Set[String]): Array[Long] = {
      val buf = Array.fill(16)(Long.MaxValue)
      s.foreach { sh =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(sh.getBytes("UTF-8"))
        val bb = java.nio.ByteBuffer.wrap(d)
        val h1 = bb.getLong; val h2 = bb.getLong
        var i = 0
        while (i < 16) {
          val h = h1 + i * h2
          if (h < buf(i)) buf(i) = h
          i += 1
        }
      }
      buf
    }
    // Planner: among divisor splits of 16, the S-curve midpoint
    // (1/b)^(1/r) closest to 0.7, ties toward more bands → (4, 4).
    val (bands, rpb) = (1 to 16).filter(16 % _ == 0)
      .map(b => (b, 16 / b))
      .minBy { case (b, r) => (math.abs(math.pow(1.0 / b, 1.0 / r) - 0.7), -b) }
    assert((bands, rpb) == (4, 4), s"planner grid check: ($bands, $rpb)")
    val sigs = sets.map { case (id, s) => id -> sig(s) }
    val ids = sigs.keys.toSeq.sorted
    // Filter on the UNROUNDED jaccard (like the engine), round only for
    // the output comparison.
    val expected = (for {
      ai <- ids.indices.iterator
      bi <- (ai + 1 until ids.size).iterator
      a = ids(ai); b = ids(bi)
      sa = sigs(a); sb = sigs(b)
      if (0 until bands).exists(bd =>
        (0 until rpb).forall(i => sa(bd * rpb + i) == sb(bd * rpb + i)))
      inter = (sets(a) & sets(b)).size
      j = inter.toDouble / (sets(a).size + sets(b).size - inter)
      if j >= 0.7
    } yield (a, b, inter.toLong,
      BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      bands, rpb)).toSeq.sortBy(p => (p._1, p._2))
    assert(got == expected,
      s"engine diverged from the naive KM reimplementation:\n$got\nvs\n$expected")
    // Non-vacuity: the committed golden must carry pairs — an empty
    // golden would make the Verify gate's discriminator arm pass on any
    // empty engine output (the oracle's poison arm covers UNKNOWN sfs;
    // this covers a hollowed-out golden at a known one).
    assert(golden.nonEmpty, s"golden $goldenTag must be non-empty")
  }

  test("dedup_lsh_planned_onepass matches its committed golden file and a naive KM reimplementation") {
    onePassPin("/root/testdata/sf0.001", "sf0_001")
  }

  test("dedup_lsh_planned_onepass sf0.01 golden is pinned by the naive KM reimplementation (hot-filter-engaging corpus)") {
    onePassPin("/root/testdata/sf0.01", "sf0_01")
  }

  test("query history round-trips specs through the catalog (§1.1)") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_hist")
    spark.sql("DROP TABLE IF EXISTS graft_hist.history")
    QueryHistory.append(spark, "graft_hist.history", "alice", spec)
    QueryHistory.append(spark, "graft_hist.history", "alice",
      spec.copy(startDate = "2016-08-05"))
    QueryHistory.append(spark, "graft_hist.history", "bob", spec)
    val alice = QueryHistory.list(spark, "graft_hist.history", "alice")
    assert(alice.map(_._1) == Seq(1L, 0L)) // newest first
    assert(alice.head._2.startDate == "2016-08-05")
    assert(alice(1)._2 == spec)
    assert(QueryHistory.list(spark, "graft_hist.history", "bob").size == 1)
  }
}
