package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-mixing operators for training-data
  * pipelines.
  *
  * Sampling decisions hash the ROW KEY, not a RNG: the same row is kept in
  * every run, on every engine, at any partitioning — reproducible corpus
  * cuts, portable to the DuckDB oracle (md5-derived uniform in [0,1)).
  * `sample(fraction)`-style RNG sampling is neither stable under retries
  * nor cross-engine comparable.
  */
object Sampling {

  /** Uniform hash of a key column into [0, 1): first 8 md5 hex chars / 2^32.
    * Round 16: native kernel ([[graft.functions.HashExpressions]]) —
    * bit-identical to the conv(substring(md5)) chain it replaces.
    */
  def keyUniform(key: Column): Column =
    graft.functions.HashExpressions.md5HexLong(key.cast("string"), 1, 8)
      .cast("double") / lit(4294967296.0)

  /** Deterministic Bernoulli sample: keep rows whose key-hash < fraction. */
  def bernoulli(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(keyUniform(col(keyCol)) < fraction)

  /** Stratified sampling / dataset mixing: per-stratum keep-rates (e.g.
    * up/down-weighting sources when composing a training mixture). Strata
    * absent from `rates` get `defaultRate`.
    */
  def stratified(df: DataFrame, keyCol: String, stratumCol: String,
                 rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (stratum, r)) =>
      when(col(stratumCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(keyUniform(col(keyCol)) < rate)
  }

  /** Temperature-flattened mixture resampling — the multilingual-LM
    * recipe: stratum s is kept with probability ∝ n_s^(α−1), i.e. sampled
    * share p_s = n_s^α / Σ n^α, scaled so the expected output is
    * `targetFraction` of the corpus. α = 1 reproduces the natural mix;
    * α → 0 equalizes strata (up-weights small sources). Rates derive from
    * one count aggregation broadcast back; the keep decision stays the
    * deterministic key hash.
    */
  def temperature(df: DataFrame, keyCol: String, stratumCol: String,
                  alpha: Double, targetFraction: Double): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
    val tot = counts.agg(sum(pow(col("__n"), alpha)).as("__z"),
      sum(col("__n")).as("__total")) // NB: "__N" would collide with "__n" (case-insensitive resolution)
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("__rate", least(lit(1.0),
        lit(targetFraction) * col("__total") * pow(col("__n"), alpha) /
          (col("__z") * col("__n"))))
      .select(col(stratumCol), col("__rate"))
    df.join(broadcast(rates), Seq(stratumCol))
      .filter(keyUniform(col(keyCol)) < col("__rate"))
      .drop("__rate")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    * keep the `n` rows per stratum with the largest ln(u)/w, where u is
    * the deterministic key-hash uniform and w the row's weight — each
    * row's inclusion probability is proportional to its weight, without
    * replacement, reproducibly (quality-weighted corpus cuts: high-quality
    * docs oversampled, none duplicated). Ties break on the ROUNDED key +
    * id so the cut is engine-exact; rows with weight ≤ 0 are excluded (a
    * zero weight cannot be sampled).
    *
    * Scale: same shape as [[stratifiedExact]] — a per-stratum rank window;
    * for n ≪ stratum size pre-thin first (the A-ES key is NOT the plain
    * hash, so the prefix trick needs the key itself: filter on a key
    * threshold learned from a sample, or accept the sort).
    */
  def weightedTopN(df: DataFrame, keyCol: String, stratumCol: String,
                   weightCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // u can be exactly 0 (md5 32-bit prefix 00000000 — ~1 key in 4.3B,
    // expected at billion-row scale); ln(0) is NULL (or an ANSI error)
    // and diverges from the oracle's ln(0) exception. Clamp to 2^-33 —
    // below the smallest nonzero u (2^-32), exactly representable in
    // both engines — so the row deterministically sorts last instead.
    val esKey = round(log(greatest(keyUniform(col(keyCol)),
      lit(1.0 / 8589934592.0))) / col(weightCol).cast("double"), 6)
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("__es").desc, col(keyCol))
    df.filter(col(weightCol) > 0)
      .withColumn("__es", esKey)
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= n)
      .drop("__es", "__rank")
  }

  /** Mixture repetition ("epochs per source"): each stratum's rows are
    * replicated `epochs(stratum)` times — floor(e) guaranteed copies plus
    * one more with probability frac(e), decided by the deterministic key
    * hash (so the SAME rows get the extra epoch on every run/engine). The
    * LM-training recipe for up-weighting small high-quality sources beyond
    * rate 1.0, where [[stratified]] can only down-sample. Map-side only:
    * one explode, no shuffle; `copy_idx` distinguishes replicas (e.g. as a
    * per-epoch shuffling salt downstream).
    */
  def withEpochs(df: DataFrame, keyCol: String, stratumCol: String,
                 epochs: Map[String, Double],
                 defaultEpochs: Double = 1.0): DataFrame = {
    val e = epochs.foldLeft(lit(defaultEpochs)) { case (acc, (s, v)) =>
      when(col(stratumCol) === s, lit(v)).otherwise(acc)
    }
    val copies = (floor(e).cast("int") +
      (keyUniform(col(keyCol)) < (e - floor(e))).cast("int")).as("__copies")
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Token-budget mixture sampling: per-stratum ADDITIVE-WEIGHT budgets
    * (mixture recipes are specified in tokens, not documents — a 10-token
    * tweet and a 10k-token article are not the same contribution). Rows
    * are ordered within each stratum by the deterministic key hash and
    * kept while the running `weightCol` sum stays ≤ the stratum's budget
    * — no overshoot, reproducible on every run/engine.
    *
    * Scale design: like [[stratifiedExact]], the naive form funnels whole
    * strata through one cumulative-sum window each. The kept set is a
    * PREFIX of the hash ordering, so rows are pre-thinned by the same
    * hash: keep hash < rate where rate = min(1, expectKeep / Σw) and
    * expectKeep = max(preThinSafety × budget, 1000 × avg row weight) —
    * answer-identical whenever the survivors' weight still covers the
    * budget (P[miss] vanishes by Chernoff at the 10× safety), while the
    * per-stratum window touches ~safety × budget worth of rows regardless
    * of corpus size. `preThinSafety = None` disables thinning. Weights
    * must be non-negative — rows with negative or null weight are dropped
    * BEFORE the pre-thin's stratum sums (the guard that keeps the running
    * sum monotone and the keep rates well-defined); budget-0 strata keep
    * nothing.
    *
    * NB: the pre-thin consumes `df` TWICE (stratum weight sums + the main
    * path). If `df` is itself an expensive derived frame, cache it
    * (e.g. `OpCaches.scoped`) before calling — see curation_pipeline_v3.
    */
  def tokenBudget(df: DataFrame, keyCol: String, stratumCol: String,
                  weightCol: String, budgets: Map[String, Long],
                  defaultBudget: Long = 0L,
                  preThinSafety: Option[Double] = Some(10.0)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (stratum, n)) =>
        when(col(stratumCol) === stratum, lit(n)).otherwise(acc)
    }
    // Enforce the documented non-negative-weight precondition BEFORE
    // anything reads the weights: a negative weight makes the running sum
    // non-monotone (the cum <= budget cut stops being a prefix), and a
    // negative-or-null weight in the pre-thin's per-stratum sums corrupts
    // the keep rate for every OTHER row of that stratum (a net-negative
    // sum makes the rate negative and drops the whole stratum). Dropping
    // such rows up front keeps both stages consistent and conservative.
    val clean = df.filter(col(weightCol) >= 0)
    val base = preThinSafety match {
      case None => clean
      case Some(safety) =>
        // Null-safe stratum join, same reasoning as stratifiedExact.
        val sizes = clean.groupBy(col(stratumCol))
          .agg(sum(col(weightCol)).cast("double").as("__wsum"),
            count(lit(1)).as("__n"))
          .withColumnRenamed(stratumCol, "__stratum")
        val expectKeep = greatest(lit(safety) * budget,
          lit(1000.0) * col("__wsum") / col("__n"))
        clean.join(broadcast(sizes), col(stratumCol) <=> col("__stratum"))
          .filter(keyUniform(col(keyCol)) <
            least(lit(1.0), expectKeep / col("__wsum")))
          .drop("__stratum", "__wsum", "__n")
    }
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(keyUniform(col(keyCol)), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.withColumn("__cum", sum(col(weightCol)).over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }

  /** Leakage-safe train/val/test assignment: the split decision hashes a
    * GROUP key (e.g. the near-dup cluster id from [[Dedup.clusters]]), so
    * every member of a group lands in the SAME split — near-duplicates can
    * never straddle train and eval, the classic contamination leak that
    * per-document splitting allows. `cuts` are cumulative upper bounds in
    * [0,1): e.g. Seq(("train",0.8),("val",0.9),("test",1.0)).
    * Deterministic, one hash per row, no shuffle beyond what the caller's
    * group-assignment join already did.
    */
  def splitByGroup(df: DataFrame, groupCol: String,
                   cuts: Seq[(String, Double)]): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 >= 1.0,
      "cuts must cover [0,1): last upper bound must be >= 1.0")
    val u = keyUniform(col(groupCol))
    val split = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, upper), acc) => when(u < upper, lit(name)).otherwise(acc)
    }
    df.withColumn("split", split)
  }

  /** Exact-count quotas per stratum (mixture recipes specified in rows, not
    * rates): rank rows within each stratum by key hash (id tie-break) and
    * keep the first `counts(stratum)`. Deterministic and retry/engine
    * stable like [[stratified]].
    *
    * Scale design: the naive form sorts ENTIRE strata through one reducer
    * each to keep a handful of rows. Instead, rows are pre-thinned by the
    * SAME key hash the rank orders on: keep hash < rate where rate =
    * min(1, max(preThinSafety × quota, 1000) / |stratum|). Because the
    * thin predicate and the rank share one ordering, the thinned set is a
    * prefix-superset of the final top-quota rows whenever each stratum
    * retains ≥ min(quota, |stratum|) survivors — so the answer is IDENTICAL
    * to the unthinned computation, but the per-stratum sort touches only
    * ~max(preThinSafety × quota, 1000) rows regardless of corpus size.
    * The 1000-row floor keeps the miss probability negligible even for
    * quota = 1 on a billion-row stratum (P[miss] ≈ e^−1000); pass
    * `preThinSafety = None` to disable thinning entirely.
    */
  def stratifiedExact(df: DataFrame, keyCol: String, stratumCol: String,
                      counts: Map[String, Int], defaultCount: Int = 0,
                      preThinSafety: Option[Double] = Some(10.0)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quota = counts.foldLeft(lit(defaultCount)) { case (acc, (stratum, n)) =>
      when(col(stratumCol) === stratum, lit(n)).otherwise(acc)
    }
    val base = preThinSafety match {
      case None => df
      case Some(safety) =>
        // Null-safe join: a NULL stratum is a legitimate group (it draws
        // `defaultCount`) — a plain equi-join would drop those rows and
        // the "answer-identical" optimization would change the answer.
        val sizes = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
          .withColumnRenamed(stratumCol, "__stratum")
        val expectKeep = greatest(lit(safety) * quota, lit(1000.0))
        df.join(broadcast(sizes), col(stratumCol) <=> col("__stratum"))
          .filter(keyUniform(col(keyCol)) <
            least(lit(1.0), expectKeep / col("__n")))
          .drop("__stratum", "__n")
    }
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(keyUniform(col(keyCol)), col(keyCol))
    base.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= quota)
      .drop("__rank")
  }

  /** Neyman-allocation stratified sampling: a total budget of `totalN`
    * rows split across strata proportionally to N_h·S_h (Neyman 1934) —
    * variable strata get more budget than uniform ones, the
    * minimum-variance allocation for estimating a mean from the sample.
    *
    * Engine-exact by construction: the per-stratum second moments come
    * from an INTEGER-valued measure column (nh·Σx² − (Σx)² is an exact
    * Long; headroom n_h·Σx² < 2⁶³ and < 2⁵³ for the double cast —
    * holds to ~10⁹ rows of 10⁴-scale measures, bucket beyond), N_h·S_h
    * simplifies to √(nh·s2 − s1²) whose IEEE sqrt is correctly rounded
    * hence identical everywhere, and the weight total sums in SORTED
    * order (the bigram-logprob discipline) so the allocation floor
    * can't straddle differently per engine. Selection is the
    * hash-ranked deterministic top-n_h per stratum ([[stratifiedExact]]
    * machinery). Strata are a bounded report dimension — the stats
    * collect is bounded like every other category collect here.
    *
    * Budget semantics: `totalN` is a CEILING, not a guarantee. When a
    * stratum's Neyman quota exceeds its population, the quota caps at
    * n_h and the surplus is DISCARDED, not redistributed — the emitted
    * sample then undershoots totalN (pinned by spec). Redistribution
    * would shift surplus onto strata the allocation deliberately
    * down-weighted, quietly changing the variance profile; callers who
    * need an exact row count should raise totalN or drop the
    * over-subscribed stratum and re-allocate explicitly.
    */
  def neymanSample(df: DataFrame, keyCol: String, stratumCol: String,
                   intValueCol: String, totalN: Int): DataFrame = {
    require(totalN >= 1, "need a positive budget")
    val base = df.filter(col(stratumCol).isNotNull)
    val x = col(intValueCol).cast("long")
    val stats = base.groupBy(col(stratumCol).cast("string").as("__st"))
      .agg(count(lit(1)).as("__nh"), sum(x).as("__s1"),
        sum(x * x).as("__s2"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.sqrt((r.getLong(1) * r.getLong(3) -
          r.getLong(2) * r.getLong(2)).toDouble)))
    val totalW = stats.map(_._3).sorted.sum
    require(totalW > 0,
      "every stratum has zero variance — Neyman allocation undefined")
    // Largest-remainder completion: bare floors undershoot the budget
    // by up to one row per stratum (floor(n·w/W) sums below n even when
    // one stratum holds ALL the weight — 6·w/w can float to 5.999…);
    // the leftover goes to the largest fractional shares, ties broken
    // on the stratum key. All doubles here derive from the same exact
    // integers on both engines, so the oracle's row_number replay picks
    // the identical strata.
    val shares = stats.map { case (s, nh, w) =>
      val x = totalN * w / totalW
      (s, nh, math.floor(x), x - math.floor(x))
    }
    val leftover = totalN - shares.map(_._3.toLong).sum
    val bonus = shares.sortBy { case (s, _, _, frac) => (-frac, s) }
      .take(math.max(0, leftover.toInt)).map(_._1).toSet
    val quota: Map[String, Long] = shares.map { case (s, nh, f, _) =>
      s -> math.min(nh.toDouble, f + (if (bonus(s)) 1 else 0)).toLong
    }.toMap
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(keyUniform(col(keyCol)), col(keyCol))
    base.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <=
        element_at(typedlit(quota), col(stratumCol).cast("string")))
      .select(col(keyCol), col(stratumCol))
  }

  /** DSIR-style importance weights for data selection: score each
    * source-domain document by how target-like it is under hashed
    * bag-of-words multinomial language models of the target vs source
    * partitions (Xie et al., "Data Selection for Language Models via
    * Importance Resampling" — public method, re-derived here):
    *
    *   log w(x) = Σ_buckets c_b(x) · (log p̂_target(b) − log p̂_source(b))
    *
    * with add-one smoothing over the `dim` hashed buckets. Feature
    * hashing bounds BOTH model tables at `dim` rows — they broadcast by
    * construction at any corpus size (unlike raw-vocabulary LMs, which
    * deliberately stay shuffle-joined — see TextAnalysis.unigramLogProb).
    * The per-document sum folds in bucket order over a sorted array, so
    * the result is bit-stable across engines and partitionings; compose
    * the returned `logw` with [[weightedTopN]] / [[tokenBudget]] for the
    * actual resampling cut.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        tagCol: String, targetTag: String,
                        dim: Int = 256): DataFrame = {
    import graft.functions.TextFunctions._
    require(dim > 0, "dim must be positive")
    val feat = OpCaches.scoped(docs.select(col(tagCol), col(idCol),
      explode(words(col(textCol))).as("__w"))
      .select(col(tagCol), col(idCol),
        pmod(wordCode24(col("__w")), lit(dim.toLong)).as("bucket")))
    val ct = feat.filter(col(tagCol) === targetTag)
      .groupBy(col("bucket")).agg(count(lit(1)).as("__ct"))
    val cs = feat.filter(col(tagCol) =!= targetTag)
      .groupBy(col("bucket")).agg(count(lit(1)).as("__cs"))
    val tt = feat.filter(col(tagCol) === targetTag)
      .agg(count(lit(1)).as("__tt"))
    val ts = feat.filter(col(tagCol) =!= targetTag)
      .agg(count(lit(1)).as("__ts"))
    // dim-bounded model table: smoothed log-ratio per bucket.
    val ratio = feat.select(col("bucket")).distinct()
      .join(ct, Seq("bucket"), "left")
      .join(cs, Seq("bucket"), "left")
      .crossJoin(broadcast(tt)).crossJoin(broadcast(ts))
      .select(col("bucket"),
        (log((coalesce(col("__ct"), lit(0L)) + lit(1.0)) /
          (col("__tt") + lit(dim.toDouble))) -
         log((coalesce(col("__cs"), lit(0L)) + lit(1.0)) /
          (col("__ts") + lit(dim.toDouble)))).as("__lr"))
    val docBuckets = feat.filter(col(tagCol) =!= targetTag)
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("__c"))
    // Value-sorted fold (list_sort → list_sum on the oracle side) — the
    // house idiom for bit-stable cross-engine double sums.
    docBuckets.join(broadcast(ratio), Seq("bucket"))
      .select(col(idCol), (col("__c") * col("__lr")).as("__term"))
      .groupBy(col(idCol))
      .agg(round(aggregate(sort_array(collect_list(col("__term"))), lit(0.0),
        (acc, x) => acc + x), 6).as("logw"))
  }

  /** Mixture PLAN: the static solving step before [[withEpochs]] /
    * [[tokenBudget]] execute a recipe. Given per-stratum available weight
    * (token counts) and target mixture shares, derive each stratum's
    * token target, sampling rate, and whole/fractional epoch split:
    *
    *   target_tokens = normShare × totalBudget      (shares normalized)
    *   rate          = target_tokens / available    (>1 ⇒ repetition)
    *   epochs_full   = ⌊rate⌋;  epochs_frac = rate − ⌊rate⌋
    *
    * `epochs_full`/`epochs_frac` feed [[withEpochs]] directly (integer
    * copies + hash-Bernoulli fractional copy); a rate ≤ 1 feeds
    * [[tokenBudget]] with `target_tokens` as the stratum budget. One
    * aggregation over the corpus; the share map is a driver-side literal
    * (mixture recipes are configuration, never data-sized). Strata absent
    * from `targetShares` get share 0 — explicit in the output rather than
    * dropped, so a recipe that forgets a source is VISIBLE in the plan.
    */
  def mixturePlan(df: DataFrame, stratumCol: String, weightCol: String,
                  targetShares: Map[String, Double],
                  totalBudget: Long): DataFrame = {
    require(targetShares.values.forall(_ >= 0) && targetShares.values.sum > 0,
      "target shares must be non-negative with a positive sum")
    val z = targetShares.values.sum
    val share = targetShares.foldLeft(lit(0.0)) { case (acc, (s, v)) =>
      when(col(stratumCol) === s, lit(v / z)).otherwise(acc)
    }
    df.groupBy(col(stratumCol))
      .agg(sum(col(weightCol)).cast("long").as("available_tokens"))
      .withColumn("share", round(share, 6))
      .withColumn("target_tokens",
        round(col("share") * totalBudget).cast("long"))
      .withColumn("rate", round(
        col("target_tokens").cast("double") /
          when(col("available_tokens") > 0, col("available_tokens")), 6))
      .withColumn("epochs_full", floor(col("rate")).cast("long"))
      .withColumn("epochs_frac", round(col("rate") - floor(col("rate")), 6))
  }
}
