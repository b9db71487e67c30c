package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset splitting for training pipelines.
  * Everything derives from a salted md5 of a stable key — reproducible
  * across runs, executors, and engines (no RNG state, which this harness
  * bans and which at 100 TB would make splits non-reproducible across
  * retried tasks). Buckets are md5's first 60 bits mod `buckets`, so
  * fractions are exact to 1/buckets and independent per salt. */
object Sampling {

  val Buckets = 1000

  /** Stable bucket in [0, Buckets) for a key under a salt. */
  def bucket(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 15), 16, 10)
      .cast("long") % Buckets

  /** Nearest-integer bucket threshold. `math.round`, NOT `.toLong`:
    * binary floating point makes 0.3 * 1000 = 299.9999...97, and
    * truncation would keep 29.9% — breaking the documented "exact to
    * 1/Buckets" contract and diverging from any oracle that computes 300
    * independently. Rounding restores the intended integer for every
    * fraction that is a multiple of 1/Buckets. */
  private def thresholdOf(frac: Double): Long = math.round(frac * Buckets)

  /** Deterministic fraction sample: keep rows whose bucket < frac*Buckets. */
  def sampleByHash(df: DataFrame, key: Column, frac: Double,
      salt: String = "sample"): DataFrame =
    df.filter(bucket(key, salt) < thresholdOf(frac))

  /** Train/val/test split labels from cumulative fractions; fractions
    * must sum to <= 1, remainder labeled last. Different salts give
    * independent splits over the same data. */
  def splitLabel(key: Column, fracs: Seq[(String, Double)],
      salt: String = "split"): Column = {
    val b = bucket(key, salt)
    val (expr, _) = fracs.foldLeft((lit(null).cast("string"), 0.0)) {
      case ((acc, cum), (label, f)) =>
        val hi = cum + f
        (when(b >= thresholdOf(cum) && b < thresholdOf(hi), label)
          .otherwise(acc), hi)
    }
    expr
  }

  /** Per-stratum deterministic sampling: an independent hash fraction
    * within each stratum value (the salt folds the stratum in, so
    * sampling one stratum never correlates with another). */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
      frac: Double, salt: String = "strat"): DataFrame =
    df.filter(
      conv(substring(md5(concat_ws("|", lit(salt), stratum.cast("string"),
        key.cast("string"))), 1, 15), 16, 10)
        .cast("long") % Buckets < thresholdOf(frac))

  /** Domain-mixture weighted sampling: keep each row with the
    * probability its GROUP's weight assigns (weight 1.0 keeps all, 0.25
    * keeps a quarter...) — the data-mixing step of corpus curation
    * (downsample boilerplate-heavy domains, upweight books/reference
    * sources). Deterministic: the group folds into the hash salt (same
    * trick as [[stratifiedSample]]), so each group samples independently
    * and the decision for a key is stable across runs and engines.
    *
    * Per-group keep thresholds are computed DRIVER-side as exact bucket
    * counts (`(weight * Buckets).toLong`), so the executor predicate
    * compares integers — no float rounding can disagree with an oracle.
    * Weights above 1.0 are capped (upsampling-by-duplication is a
    * different operator: it changes row multiplicity, not membership).
    * One narrow filter pass, no shuffle — linear at any scale. */
  def weightedSample(df: DataFrame, key: Column, group: Column,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      salt: String = "wmix"): DataFrame = {
    def thr(w: Double): Long = thresholdOf(w.min(1.0).max(0.0))
    val b = conv(substring(md5(concat_ws("|", lit(salt), group.cast("string"),
      key.cast("string"))), 1, 15), 16, 10).cast("long") % Buckets
    val threshold = weights.toSeq.sortBy(_._1)
      .foldLeft(lit(thr(defaultWeight))) { case (acc, (g, w)) =>
        when(group === g, lit(thr(w))).otherwise(acc)
      }
    df.filter(b < threshold)
  }

  /** The duplication side of data mixing: [[weightedSample]] caps at 1.0
    * because membership filtering cannot express upweighting — THIS
    * operator can. Each row emits `floor(w)` replicas plus one more with
    * probability `frac(w)` (deterministic salted-md5 bucket, same
    * arithmetic as weightedSample), tagged with a 0-based `replica`
    * column so downstream shuffling/packing can tell copies apart.
    * Weight 2.5 ≈ 2-3 copies, 1.0 = exactly the input, 0.4 = membership
    * sampling, 0 = drop. Thresholds and integer copy counts are computed
    * DRIVER-side, so executors compare integers only.
    *
    * One narrow pass (explode of a per-row integer range) — row
    * multiplicity changes, bytes scale with the OUTPUT corpus, nothing
    * shuffles. */
  def upsampleWeighted(df: DataFrame, key: Column, group: Column,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      salt: String = "wmix"): DataFrame = {
    // `replica` is part of this operator's OUTPUT contract, so a caller
    // frame already carrying one would be silently overwritten — refuse
    // instead. The copy-count scratch column gets a collision-proof name.
    require(!df.columns.contains("replica"),
      "upsampleWeighted emits a 'replica' column; rename the input's")
    val copiesCol = Iterator.from(0).map(i => s"_copies$i")
      .find(c => !df.columns.contains(c)).get
    def parts(w: Double): (Long, Long) = {
      require(w >= 0.0, s"negative weight $w")
      val base = math.floor(w).toLong
      (base, thresholdOf(w - base))
    }
    val b = conv(substring(md5(concat_ws("|", lit(salt), group.cast("string"),
      key.cast("string"))), 1, 15), 16, 10).cast("long") % Buckets
    val (db, dt) = parts(defaultWeight)
    val (baseC, thrC) = weights.toSeq.sortBy(_._1)
      .foldLeft((lit(db), lit(dt))) { case ((bc, tc), (g, w)) =>
        val (wb, wt) = parts(w)
        (when(group === g, lit(wb)).otherwise(bc),
          when(group === g, lit(wt)).otherwise(tc))
      }
    val copies = baseC + when(b < thrC, lit(1L)).otherwise(lit(0L))
    df.withColumn(copiesCol, copies)
      .withColumn("replica",
        explode(when(col(copiesCol) >= 1,
          sequence(lit(0L), col(copiesCol) - 1))
          .otherwise(array().cast("array<bigint>")))) // explode drops empties
      .drop(copiesCol)
  }

  /** 60-bit deterministic rank of a key under a salt (md5-derived, so any
    * engine reproduces it — same trick as the winnowing gram hash). */
  def hashRank(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** Deterministic pre-training shuffle + sharding: every row gets a
    * `shard` in [0, nShards) and a dense 0-based `pos` within its shard,
    * both derived from the salted-md5 [[hashRank]] — the global shuffle a
    * training run needs (break source/time locality so batches are IID),
    * reproducible across runs, engines, and retried tasks (RNG-free, like
    * every sampler here). Different salts give independent shuffles.
    *
    * Scale shape: one hash pass + one shuffle on `shard` + a per-shard
    * sort (the window never spans shards) — the standard distributed
    * sort-by-random-key; with shards sized to executors (nShards ~ a few
    * per core at the target SF) the sort is partition-local. Writing the
    * result partitioned by `shard`, sorted by `pos`, gives ready-to-read
    * training shards. */
  def shardAndShuffle(df: DataFrame, key: Column, nShards: Int,
      salt: String = "shuf"): DataFrame = {
    require(nShards > 0, s"nShards $nShards must be positive")
    require(!df.columns.contains("shard") && !df.columns.contains("pos"),
      "shardAndShuffle emits 'shard' and 'pos' columns; rename the input's")
    import org.apache.spark.sql.expressions.Window
    val rkCol = Iterator.from(0).map(i => s"_rk$i")
      .find(c => !df.columns.contains(c)).get
    val w = Window.partitionBy(col("shard")).orderBy(col(rkCol), key)
    df.withColumn(rkCol, hashRank(key, salt))
      .withColumn("shard", col(rkCol) % nShards)
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .drop(rkCol)
  }

  /** EXACTLY `n` rows per stratum (fewer only if the stratum is smaller),
    * chosen as the stratum's top-n by deterministic [[hashRank]] — the
    * class-balancing step of a curation pipeline (n docs per language /
    * source / topic), reproducible across engines and runs.
    *
    * Scale shape — generate candidates, verify exact (the repo-wide
    * pattern): the naive formulation ranks EVERY row of every stratum
    * (`row_number` = full sort of each group — a giant-stratum
    * bottleneck at 100 TB). Instead:
    *   1. per-stratum counts (one map-side-combined agg, one row per
    *      stratum, broadcast back);
    *   2. prefilter to rows whose rank-fraction < oversample*n/count —
    *      a NARROW pass that keeps ~oversample*n rows per stratum, so
    *      the expensive ranked sort touches ~n*oversample rows per
    *      stratum, not the stratum;
    *   3. exact row_number over the candidates;
    *   4. verify: any stratum whose candidate pool came up short of
    *      min(n, count) (P ~ e^-n per stratum at oversample=4) is
    *      re-ranked WITHOUT the prefilter — exactness by construction,
    *      never by probability.
    * The hash-threshold candidates are a superset-invariant of the final
    * top-n whenever the pool is big enough, so the composed result is
    * identical to the naive global ranking (spec-asserted, including a
    * forced-fallback run). */
  /** Token-budget mixing: for each group (source/domain), keep documents
    * in deterministic salted-[[hashRank]] order until the group's token
    * budget is exhausted — the "mix N billion tokens of source A with M
    * of source B" step that turns per-source keep FRACTIONS
    * ([[weightedSample]]) into per-source token TARGETS. A row is kept
    * iff its inclusive running token sum (in rank order within its
    * group) fits the budget; the first row crossing the line and
    * everything after it drop, so kept tokens never exceed the target.
    * Groups absent from `budgets` are dropped (the mix spec is
    * explicit). Pure function of the data: RNG-free, partitioner-free,
    * identical across engines and retries.
    *
    * Scale shape (same two-pass distributed prefix sum as
    * [[Pack.packSequences]], per group): the naive formulation is one
    * window over each whole group — a single-partition sort per source,
    * the 100 TB killer for the usual few-huge-sources mix. Instead the
    * 60-bit rank space is cut into `buckets` FIXED equal-width ranges
    * (rank is md5-uniform, so occupancy balances whp, and the bucket is
    * a pure function of the row — no quantile collection, no partition
    * id); each (group, bucket) runs a local pre-sum, the groups×buckets
    * bucket totals (the only thing that visits the driver) prefix into
    * broadcast offsets, and the keep test is offset + local-pre +
    * n_tok <= budget. Equal to the single-window rule by construction:
    * rank ties share a bucket, so bucket order extends rank order. */
  def sampleTokenBudget(df: DataFrame, key: Column, group: Column,
      tokens: Column, budgets: Map[String, Long], salt: String = "mix",
      buckets: Int = 64): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(budgets.nonEmpty, "budgets must name at least one group")
    require(df.columns.forall(!_.startsWith("_m_")),
      "sampleTokenBudget uses _m_* working columns; rename the input's")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val bucketW = math.max(1L, (1L << 60) / buckets)
    // null token counts count as 0, matching SQL window-sum semantics
    // (sum skips nulls, so the row's inclusive cum equals its
    // predecessor's) — without this the keep filter's null arithmetic
    // would silently drop the row instead
    val base = df.withColumn("_m_g", group.cast("string"))
      .withColumn("_m_tok", coalesce(tokens.cast("long"), lit(0L)))
      .withColumn("_m_rk", hashRank(key, salt))
      .withColumn("_m_b", expr(s"_m_rk div ${bucketW}L"))
    val scoped = base.join(
      broadcast(budgets.toSeq.toDF("_m_g", "_m_budget")), "_m_g")
    val w = Window.partitionBy("_m_g", "_m_b").orderBy(col("_m_rk"), key)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = scoped.withColumn("_m_pre",
      coalesce(sum("_m_tok").over(w), lit(0L)))
    val totals = local.groupBy("_m_g", "_m_b").agg(sum("_m_tok").as("_m_tot"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val offsets = totals.groupBy(_._1).toSeq.flatMap { case (g, ts) =>
      var acc = 0L
      ts.sortBy(_._2).map { case (_, b, tot) =>
        val o = (g, b, acc); acc += tot; o
      }
    }
    local.join(broadcast(offsets.toDF("_m_g", "_m_b", "_m_off")),
        Seq("_m_g", "_m_b"))
      .filter(col("_m_off") + col("_m_pre") + col("_m_tok") <= col("_m_budget"))
      .drop("_m_g", "_m_tok", "_m_rk", "_m_b", "_m_budget", "_m_pre", "_m_off")
  }

  /** Temperature-scaled source mixing — the multilingual-pretraining
    * recipe (sample source g with probability q_g ∝ p_g^α; α < 1
    * flattens the source distribution, upweighting low-resource sources
    * and downsampling dominant ones). Returns the per-source mix WEIGHT
    * w_g = q_g · targetTotal / n_g for [[upsampleWeighted]] (w > 1
    * duplicates, w < 1 membership-samples), where n_g is the group's
    * total `sizeCol` mass (tokens for token-weighted mixing, `lit(1)`
    * for doc-weighted).
    *
    * Cross-engine / cross-run determinism: each group's mass n_g^α is
    * quantized to an INTEGER (round(n_g^α · 2^20)) before normalization,
    * so the normalizing sum is an integer sum — independent of
    * aggregation order (a float sum over groups is not, and at scale
    * aggregation order is nondeterministic). Every later step is a
    * correctly-rounded IEEE op in one fixed association order, so an
    * independent engine reproduces the weights bit-for-bit when the mass
    * function is correctly rounded — α = 0.5 routes through `sqrt`
    * (correctly rounded per IEEE-754) for exactly this reason; other α
    * go through `pow`, deterministic within the JVM but last-ulp
    * libm-dependent across engines.
    *
    * Scale: one groupBy whose result is one row per SOURCE — bounded by
    * the mix spec, never by the corpus. */
  def temperatureWeights(df: DataFrame, group: Column, sizeCol: Column,
      alpha: Double, targetTotal: Long): Map[String, Double] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha $alpha outside (0, 1]")
    require(targetTotal > 0, "targetTotal must be positive")
    val totals = df.groupBy(group.cast("string").as("_g"))
      .agg(sum(sizeCol.cast("long")).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    def mass(n: Long): Long = {
      val m = if (alpha == 0.5) math.sqrt(n.toDouble)
              else math.pow(n.toDouble, alpha)
      math.round(m * (1L << 20))
    }
    val masses = totals.map { case (g, n) => (g, n, mass(n)) }
    // BigInt normalizer: per-group quantized masses reach ~2^63 around
    // n ≈ 8e12 at α = 1, so a Long SUM over many groups wraps negative
    // at exactly the corpus scale this targets. Integer sums stay
    // order-independent at any width, and BigInt.doubleValue is
    // correctly rounded — determinism is unchanged (and bit-identical
    // to the Long path whenever the sum fits, which is what the oracle
    // exercises). Per-group masses themselves saturate (math.round caps
    // at Long.MaxValue) rather than wrap.
    val z = masses.foldLeft(BigInt(0))(_ + _._3).toDouble
    masses.map { case (g, n, s) =>
      g -> s.toDouble / z * targetTotal.toDouble / n.toDouble
    }.toMap
  }

  /** [[temperatureWeights]] fed straight into [[upsampleWeighted]]: the
    * whole temperature-mix in one call. Output carries the `replica`
    * column; expected output mass ≈ `targetTotal` in `sizeCol` units. */
  def mixByTemperature(df: DataFrame, key: Column, group: Column,
      sizeCol: Column, alpha: Double, targetTotal: Long,
      salt: String = "tmix"): DataFrame =
    upsampleWeighted(df, key, group,
      temperatureWeights(df, group, sizeCol, alpha, targetTotal),
      defaultWeight = 0.0, salt = salt)

  def stratifiedTopN(df: DataFrame, key: Column, stratum: Column, n: Int,
      salt: String = "stratn", oversample: Double = 4.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0, "n must be positive")
    val rk = hashRank(key, salt)
    val Max60 = (1L << 60).toDouble
    val withRk = df.withColumn("_g_rk", rk).withColumn("_g_st", stratum)
    val counts = withRk.groupBy("_g_st").agg(count(lit(1)).as("_g_cnt"))
    val thresholds = broadcast(counts.withColumn("_g_thr",
      least(lit(1.0), lit(oversample * n) / col("_g_cnt"))))
    val cand = withRk.join(thresholds, "_g_st")
      .filter(col("_g_rk").cast("double") / lit(Max60) < col("_g_thr"))
    val w = Window.partitionBy("_g_st").orderBy(col("_g_rk"), key)
    val picked = cand.withColumn("_g_rn", row_number().over(w))
      .filter(col("_g_rn") <= n)
    // verify step: strata whose candidate pool was too small. Anchored on
    // the COUNTS side — a stratum with zero candidates is absent from the
    // candidate aggregation entirely and must still fall back.
    val candCounts = cand.groupBy("_g_st").agg(count(lit(1)).as("_g_cc"))
    val short = counts.join(candCounts, Seq("_g_st"), "left")
      .filter(coalesce(col("_g_cc"), lit(0L)) < least(lit(n.toLong), col("_g_cnt")))
      .select("_g_st")
    val fallback = withRk.join(broadcast(short), "_g_st")
      .withColumn("_g_rn", row_number().over(w))
      .filter(col("_g_rn") <= n)
    val kept = picked.join(broadcast(short), Seq("_g_st"), "left_anti")
    val internal = Seq("_g_rk", "_g_st", "_g_cnt", "_g_thr", "_g_rn")
    kept.drop(internal: _*).unionByName(fallback.drop(internal: _*))
  }

  /** One row per token-bigram occurrence, featurized as a salted-md5
    * hash bucket in `[0, buckets)` — DSIR's hashed n-gram featurization.
    * Same md5 arithmetic as [[bucket]] (first 60 bits mod buckets), so
    * an independent engine replays it exactly. */
  private def hashedBigramFeatures(df: DataFrame, idCol: String,
      textCol: String, buckets: Int, salt: String): DataFrame = {
    val ts = graft.pipeline.Text.tokens(col(textCol))
    df.select(col(idCol).as("id"), ts.as("_ts"))
      .where(size(col("_ts")) >= 2)
      .select(col("id"), explode(zip_with(
        slice(col("_ts"), lit(1), size(col("_ts")) - 1),
        slice(col("_ts"), lit(2), size(col("_ts")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("_bg"))
      .select(col("id"),
        (conv(substring(md5(concat(lit(salt + "|"), col("_bg"))), 1, 15),
          16, 10).cast("long") % buckets).as("h"))
  }

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): documents are
    * featurized as hashed token bigrams over `buckets` buckets; the
    * TARGET sample and the RAW corpus each induce an add-one-smoothed
    * multinomial over buckets; a document scores by how much more likely
    * its features are under the target model than under the raw model.
    *
    * Emits `(idCol, n_feats, affinity, dsir_weight)`:
    * `dsir_weight = sum_f ln(p_target(f) / p_raw(f))` is the paper's
    * log importance weight (transcendental — ranking asserted in spec,
    * not the oracle gate); `affinity = mean_f(p_target(f) / p_raw(f))`
    * over the 2^-20 quantized grid is its rational twin — counts in,
    * `+ - * /` and `floor` only, so an independent engine replays it
    * bit-for-bit, and the quantized-long accumulation makes the mean
    * combine-order-independent (the [[Text.perplexity]] contract).
    *
    * Distribution: the per-bucket likelihood-ratio table is at most
    * `buckets` rows and BROADCASTS; scoring is one narrow bigram pass +
    * one broadcast join + one `groupBy(id)` — no corpus-sized shuffle
    * beyond the per-doc reduce. Model building is two bucket-count
    * aggregates (map-side combined into `buckets` groups). At 100 TB the
    * target side is a SAMPLE by construction (the method's premise), so
    * both count tables stay tiny. */
  def dsirWeights(raw: DataFrame, target: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 1024, salt: String = "dsir"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val fRaw = hashedBigramFeatures(raw, idCol, textCol, buckets, salt)
    val fTgt = hashedBigramFeatures(target, idCol, textCol, buckets, salt)
    val rawC = fRaw.groupBy("h").agg(count(lit(1)).as("_cr"))
    val tgtC = fTgt.groupBy("h").agg(count(lit(1)).as("_ct"))
    // totals fold exactly out of the bucket counts — no extra corpus pass
    val rawTot = rawC.agg(sum(col("_cr")).as("_r_tot"))
    val tgtTot = tgtC.agg(coalesce(sum(col("_ct")), lit(0L)).as("_t_tot"))
    // smoothed likelihood ratio per bucket: integer counts divided in
    // IEEE double (correctly rounded — engine-independent), then the
    // 2^-20 quantization for the rational twin
    val lr = rawC.join(tgtC, Seq("h"), "left")
      .crossJoin(broadcast(rawTot)).crossJoin(broadcast(tgtTot))
      .withColumn("_r",
        ((coalesce(col("_ct"), lit(0L)) + lit(1L)) /
          (col("_t_tot") + lit(buckets.toDouble))) /
        ((col("_cr") + lit(1L)) / (col("_r_tot") + lit(buckets.toDouble))))
      .select(col("h"), col("_r"),
        floor(col("_r") * 1048576.0 + 0.5).cast("long").as("_q"))
    val n = count(lit(1))
    fRaw.join(broadcast(lr), Seq("h"))
      .groupBy("id").agg(
        n.as("n_feats"),
        (sum(col("_q")) / 1048576.0 / n).as("affinity"),
        sum(log(col("_r"))).as("dsir_weight"))
      .withColumnRenamed("id", idCol)
  }

  /** [[dsirWeights]] fed into a deterministic top-k selection: keep the
    * `k` documents most target-like by the quantized affinity (doc id
    * tie-break) — the resampling step with the paper's Gumbel draw
    * replaced by the rank cut, so every engine picks the same set. */
  def dsirResample(raw: DataFrame, target: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 1024, salt: String = "dsir"): DataFrame = {
    require(k > 0, "k must be positive")
    dsirWeights(raw, target, idCol, textCol, buckets, salt)
      .orderBy(desc("affinity"), col(idCol))
      .limit(k)
  }
}
