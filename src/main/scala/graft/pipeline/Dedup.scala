package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication strategies for training-data pipelines, ordered by cost:
  * exact (one shuffle), fingerprint-normalized exact, SimHash (linear +
  * banded candidate join), MinHash+LSH (the scalable near-dup workhorse),
  * exact n-gram Jaccard (inverted-index join — exact but superlinear in
  * shared-shingle volume), and embedding-cosine near-dup.
  *
  * Scale design: every strategy is generate-candidates -> verify-exact;
  * candidate generation is always a key-equality join (shuffle on a
  * bucket/band/chunk key) — never a cross join. Verification only touches
  * candidate pairs. At 100 TB the band/bucket keys are what keep the
  * shuffle bounded; the per-key skew (a hot shingle/band) is handled by
  * AQE skew-join splitting.
  */
object Dedup {

  /** Materialize-and-truncate-lineage for frames that iterative loops and
    * self-joins re-read. Default = `localCheckpoint()` (blocks on executor
    * storage, no extra infrastructure) — fine locally and for ephemeral
    * jobs, but lineage is GONE, so on a real cluster losing an executor
    * mid-job fails the query unrecoverably. Pass `checkpointDir` (an HDFS/
    * object-store path on a fault-tolerant FS) for a RELIABLE
    * materialization: the frame is written as parquet under a fresh
    * subdirectory and read back, so any surviving executor can re-read it
    * and the job survives executor loss — the right setting for long
    * multi-iteration dedup runs at 100 TB. (Deliberately NOT
    * `SparkContext.setCheckpointDir` + `Dataset.checkpoint`: that mutates
    * context-global state — clobbering whatever checkpoint dir the
    * application had configured — and appends a random UUID directory per
    * call.) The caller owns the directory's lifecycle; one run's
    * artifacts are bounded by the pair/edge volume, not the corpus. Both
    * variants are eager. */
  private val ckptCounter = new java.util.concurrent.atomic.AtomicLong(0L)
  private def materialize(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(d) =>
        // unique per materialization: pid disambiguates concurrent
        // processes sharing a dir, the counter disambiguates within a run
        val dir = s"$d/mat-${ProcessHandle.current().pid()}-" +
          s"${ckptCounter.incrementAndGet()}"
        df.write.parquet(dir)
        df.sparkSession.read.schema(df.schema).parquet(dir)
      case None => df.localCheckpoint()
    }

  /** Exact dedup: keep the lowest-id row per identical value of `on`.
    * One hash shuffle; at 100 TB group instead on `md5(on)` via
    * [[keepFirstByHash]] so the shuffle key is 16 bytes, not the document. */
  def keepFirst(df: DataFrame, on: Column, idCol: String): DataFrame = {
    val w = Window.partitionBy(on).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Exact dedup on content hash — identical result to [[keepFirst]] on
    * the raw value (modulo md5 collisions), constant-width shuffle key. */
  def keepFirstByHash(df: DataFrame, on: Column, idCol: String): DataFrame =
    keepFirst(df, md5(on.cast("string")), idCol)

  /** URL-level dedup — the first pass of every web-corpus pipeline
    * (CCNet/C4/RefinedWeb dedup fetched pages by normalized URL before
    * any content comparison): canonicalize with [[Text.canonicalUrl]]
    * (case, default ports, trailing slashes, fragments, tracking
    * params), keep the lowest id per canonical URL, report the collapse
    * count. One shuffle, keyed on the canonical string. Output:
    * `(idCol, canonical_url, n_dups)`, one row per canonical URL. */
  def byCanonicalUrl(df: DataFrame, idCol: String, urlCol: String,
      dropParamsPattern: String = Text.TrackingParamPattern): DataFrame =
    df.select(col(idCol),
        Text.canonicalUrl(col(urlCol), dropParamsPattern).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
      .select(col(idCol), col("canonical_url"), col("n_dups"))

  /** (id, shingleSet) prep shared by jaccard/minhash paths. Tokens are
    * materialized as an attribute before shingling (see
    * [[Text.shinglesOf]] PERF note).
    *
    * PERSISTED (memory-and-disk): every consumer branches over it at
    * least twice (index/signature side + both verify sides), so without
    * the persist the regex shingling pass re-runs per branch — and the
    * plan is identical across the jaccard and minhash paths, so one cache
    * entry serves both. This is the standard materialize-the-join-input
    * pattern for exact set-similarity joins; at 100 TB it is a disk-backed
    * shuffle-sized artifact, strictly cheaper than recomputation.
    *
    * Lifecycle: entries live until the session ends or the caller clears
    * them (`spark.catalog.clearCache()`); a long-lived service running
    * dedup over many distinct corpora should clear between corpora.
    * (persist cannot be scoped tighter here — the returned frame is lazy,
    * so there is no safe point inside the operator to unpersist.) */
  private[graft] def shingled(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    Text.withShingles(df.select(col(idCol).as("id"), col(textCol)), textCol, k)
      .select("id", "sh")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Exact all-pairs n-gram Jaccard >= `threshold` via PREFIX-FILTERED
    * inverted-index join (the PPJoin family — exact, not LSH):
    *
    *  1. order shingles by global rarity (docFreq asc, shingle asc);
    *  2. index only each doc's first |A| - ceil(t*|A|) + 1 shingles in
    *     that order (the prefix-filtering lemma: any pair with J >= t
    *     must share a prefix element — common shingles land OUTSIDE the
    *     prefix, so the hot-key quadratic blowup of a naive
    *     shingle-equality join disappears);
    *  3. verify every candidate pair with exact Jaccard on the full sets.
    *
    * The naive inverted join was the sf0.1 bench bottleneck (~45 s); the
    * prefix filter is what keeps this join bounded at 100 TB. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = shingled(df, idCol, textCol, k)
    val cands = prefixCandidates(sh, threshold)
    verifyJaccard(cands, sh, threshold)
  }

  /** Candidate pairs sharing an element of both docs' rarity-ordered
    * prefixes AND satisfying the Jaccard length bound. Exact w.r.t.
    * Jaccard >= threshold (no false negatives).
    *
    * The length bound (J >= t implies t*|A| <= |B| <= |A|/t — PPJoin's
    * size filter) prunes template-corpus candidates the prefix alone
    * can't: measured 118k -> far fewer candidate pairs at sf0.1 for the
    * same 25 true pairs. The epsilon inside ceil() guards the exact-
    * multiple edge: 0.8 is not a binary-exact double, so n*0.8 can land a
    * hair ABOVE the true product and ceil() would overshoot — shortening
    * the prefix below the lemma's minimum (a false-negative risk), or
    * over-tightening the length bound. */
  private def prefixCandidates(sh: DataFrame, threshold: Double): DataFrame = {
    def ceilT(n: Column): Column = ceil(n * threshold - lit(1e-9))
    // Shingle identity travels as xxhash64 from here on: the docFreq
    // groupBy and the prefix self-join key on 8 bytes instead of the
    // shingle string (shuffle-bytes win at any scale). A 64-bit collision
    // can only ADD a candidate pair (verified exactly afterwards), never
    // lose one: the global rarity order stays total on the STRING
    // ((df, hash, s) — df is a function of the hash, the s tiebreak keeps
    // same-key-distinct-string elements consistently ordered across
    // docs), and the join fires on hash equality, a superset of string
    // equality.
    val inv = sh.select(col("id"), size(col("sh")).as("n"),
      explode(col("sh")).as("s"))
      .withColumn("_sh", xxhash64(col("s")))
    val freq = inv.groupBy("_sh").agg(count(lit(1)).as("df"))
    val ranked = inv.join(freq, "_sh")
      .withColumn("_r", row_number().over(
        Window.partitionBy("id").orderBy(col("df"), col("_sh"), col("s"))))
      .filter(col("_r") <= col("n") - ceilT(col("n")) + 1)
      .select("id", "n", "_sh")
    ranked.as("a").join(ranked.as("b"),
        col("a._sh") === col("b._sh") && col("a.id") < col("b.id") &&
          col("b.n") >= ceilT(col("a.n")) && col("a.n") >= ceilT(col("b.n")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** MinHash signature: `numHashes` permutations approximated by
    * xxhash64(shingle, seed); signature element i = min hash under seed i.
    * Returns (id, sig array<long>). Computed as a NARROW nested-array
    * transform (array_min over per-seed hashes) — zero shuffle, zero
    * explode; the previous explode+groupBy formulation shuffled every
    * (doc x shingle) row and was the second sf0.1 bench bottleneck. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 128): DataFrame = {
    val m = minhashAggs(shingled(df, idCol, textCol, k), numHashes)
    m.select(col("id"),
      array((0 until numHashes).map(i => col(s"_h$i")): _*).as("sig"))
  }

  /** (id, _h0.._hN) minhash columns via explode + N codegen'd min-aggs —
    * measured faster than the nested-HOF formulation (lambdas are
    * interpreted; hash aggregates are whole-stage codegen'd). */
  private def minhashAggs(sh: DataFrame, numHashes: Int): DataFrame = {
    val inv = sh.select(col("id"), explode(col("sh")).as("s"))
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(col("s"), lit(i))).as(s"_h$i"))
    inv.groupBy("id").agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH banding: split the signature into `bands` bands of
    * `rows` hashes, bucket-join docs sharing any band, then VERIFY each
    * candidate pair with exact Jaccard over the shingle sets. With
    * bands=32, rows=4 the probability of missing a 0.8-Jaccard pair is
    * (1-0.8^4)^32 ~ 5e-8 — and verification makes every emitted pair
    * exact. Returns (id_a, id_b, jaccard) like [[ngramJaccardPairs]]. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.8,
      bands: Int = 32, rows: Int = 4,
      maxBucketSize: Option[Int] = None,
      checkpointDir: Option[String] = None): DataFrame = {
    val sh = shingled(df, idCol, textCol, k)
    // All band buckets come from the native MinHashBands expression: one
    // narrow compiled pass per doc (one strong hash per shingle + affine
    // permutations), no explode, no aggregation shuffle. The r01
    // formulation exploded (doc x shingle) rows into a 128-column
    // min-aggregation — correct, but a full shuffle of the inverted index
    // just to build signatures.
    val raw = sh.select(col("id"), posexplode(
        graft.functions.VectorFunctions.minHashBands(col("sh"), bands, rows)))
      .select(col("id"), col("pos").as("band"), col("col").as("bucket"))
    // materialized once, mirroring bandedNearDupPairs: the frame is read
    // at least twice (both self-join sides; up to four times with a cap —
    // bucket count + semi-join), and its projection is the whole per-doc
    // signature pass. Post-projection rows are narrow (id, band, bucket)
    // triples. `checkpointDir` selects reliable checkpoints (see
    // [[materialize]]) so a long run survives executor loss.
    val banded = capBuckets(materialize(raw, checkpointDir), maxBucketSize)
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    verifyJaccard(cands, sh, threshold)
  }

  /** Skew guard for LSH band self-joins: DROP (band, bucket) groups larger
    * than `maxBucketSize` before the bucket-equality join. A degenerate hot
    * bucket — every empty document, every all-zero embedding, a template
    * page repeated millions of times — makes the self-join QUADRATIC in
    * that bucket's size (10^6 members = 10^12 candidate rows in one join
    * key: the job never finishes), and AQE skew splitting only repartitions
    * the pairs, it cannot reduce their count. Capping trades bounded recall
    * for bounded cost, and the trade is mild: a true near-dup pair agrees
    * on SEVERAL of its `bands` buckets, so it is only lost if every shared
    * bucket is oversized — in practice exactly the degenerate-content
    * clusters a curation pipeline handles with exact dedup first. `None`
    * (default) = no cap; behavior and recall are unchanged. */
  private def capBuckets(banded: DataFrame, maxBucketSize: Option[Int]): DataFrame =
    maxBucketSize match {
      case Some(cap) =>
        val ok = banded.groupBy("band", "bucket")
          .agg(count(lit(1)).as("_bn")).filter(col("_bn") <= cap)
          .select("band", "bucket")
        banded.join(ok, Seq("band", "bucket"), "left_semi")
      case None => banded
    }

  /** Exact-Jaccard verification of candidate pairs against shingle sets.
    * `private[graft]`: the streaming LSH gate verifies its candidate
    * stream through the SAME arithmetic so emitted jaccard doubles are
    * bit-identical to the batch path's. */
  private[graft] def verifyJaccard(cands: DataFrame, sh: DataFrame,
      threshold: Double): DataFrame =
    cands
      .join(sh.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), "id_a")
      .join(sh.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), "id_b")
      .withColumn("_inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("_inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("_inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

  /** Default token hash for SimHash: xxhash64 (codegen'd, fastest). */
  def xxHash64Of(c: Column): Column = xxhash64(c)

  /** md5-derived 64-bit token hash: the first 16 hex chars of md5
    * decoded as a signed big-endian long (native BitsToLong). Slower than
    * xxhash64 but recomputable by ANY engine with an md5 function — the
    * DuckDB oracle derives identical bits via
    * `CAST('0x' || substring(md5(t),1,16) AS UBIGINT)` (same bit pattern,
    * unsigned view). */
  def md5Hash64Of(c: Column): Column =
    graft.functions.VectorFunctions.bitsToLong(unhex(substring(md5(c), 1, 16)))

  /** SimHash: 64-bit signature where bit j = sign of the sum over tokens
    * of (bit j of hash(token) -> +1/-1). Computed as 64 conditional
    * sums in ONE aggregation pass (no row explosion by bit index).
    * Returns (id, simhash long). */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String,
      hashFn: Column => Column = xxHash64Of): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(Text.tokens(col(textCol))).as("t"))
      .withColumn("h", hashFn(col("t")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"_b$j")
    }
    val withSums = toks.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { j =>
      when(col(s"_b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    withSums.select(col("id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance <= `maxHamming` via the
    * pigeonhole chunk join: split 64 bits into `maxHamming+1` chunks — any
    * pair within distance k must agree exactly on >= 1 chunk. Candidates
    * join on (chunkIndex, chunkValue); verify with bit_count(xor). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3,
      hashFn: Column => Column = xxHash64Of): DataFrame = {
    val sig = simhashSignatures(df, idCol, textCol, hashFn)
    val nChunks = maxHamming + 1
    val width = 64 / nChunks
    val chunked = sig.select(col("id"), col("simhash"),
      posexplode(array((0 until nChunks).map { c =>
        shiftrightunsigned(col("simhash"), c * width)
          .bitwiseAND((1L << width) - 1)
      }: _*)))
      .select(col("id"), col("simhash"), col("pos").as("chunk"), col("col").as("v"))
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.v") === col("b.v") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Winnowing document fingerprints (the MOSS local-fingerprinting
    * algorithm): hash every overlapping char `k`-gram of the
    * whitespace-normalized text, slide a `window` over the hash sequence,
    * keep each window's MINIMUM — guaranteeing any shared substring of
    * length >= k + window - 1 contributes at least one common
    * fingerprint, which plain "every w-th hash" sampling cannot.
    * Returns exploded (id, fp) rows (distinct per doc).
    *
    * The gram hash is md5-derived (first 14 hex chars as a positive
    * long), so ANY engine reproduces the identical fingerprint set — the
    * driver oracle replays the whole pipeline in SQL. Runs through the
    * native codegen'd [[graft.functions.WinnowFingerprints]] expression —
    * one compiled pass per document (the HOF formulation kept in
    * [[winnowingFingerprintsHof]] ran interpreted with a slice allocation
    * per window position; parity is spec-asserted). */
  def winnowingFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, window: Int = 4): DataFrame = {
    val norm = regexp_replace(trim(col(textCol)), "\\s+", " ")
    df.select(col(idCol).as("id"),
      explode(graft.functions.VectorFunctions.winnowFingerprints(norm, k, window))
        .as("fp"))
  }

  /** Higher-order-builtins reference formulation of [[winnowingFingerprints]]
    * — the executable spec the native expression is parity-tested against
    * (same role as the HOF shingle formulation vs the regex fast path). */
  def winnowingFingerprintsHof(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, window: Int = 4): DataFrame = {
    val norm = regexp_replace(trim(col(textCol)), "\\s+", " ")
    val grams = regexp_extract_all(norm, lit(s"(?=(.{$k}))"), lit(1))
    val hashes = transform(grams, g =>
      graft.functions.VectorFunctions.bitsToLong(unhex(substring(md5(g), 1, 14))))
    val nWin = size(hashes) - window + 1
    val fps =
      when(nWin >= 1, array_distinct(
          transform(sequence(lit(1), nWin),
            i => array_min(slice(hashes, i, lit(window))))))
        .when(size(hashes) >= 1, array(array_min(hashes)))
        .otherwise(typedLit(Seq.empty[Long]))
    df.select(col(idCol).as("id"), explode(fps).as("fp"))
  }

  /** Benchmark decontamination: count, per corpus document, the distinct
    * `k`-shingles it shares with ANY probe document (the eval set) — the
    * standard pre-training contamination check (drop or flag documents
    * with hits above a threshold). Returns (id, hits), documents with
    * zero hits absent.
    *
    * Scale shape: the probe shingle set is the eval benchmark — small by
    * construction — so it broadcasts, and the check is a broadcast
    * semi-join + per-doc count over the corpus's shingle pass: one linear
    * scan, no shuffle of corpus text.
    *
    * Uses raw k-grams (no whole-text fallback for sub-k-token docs —
    * that is `withShingles`' Jaccard-specific contract): a document
    * shorter than k tokens cannot CONTAIN a k-gram, so the correct
    * containment answer for it is zero hits. */
  def contaminationHits(docs: DataFrame, probes: DataFrame,
      idCol: String, textCol: String, k: Int = 3): DataFrame = {
    val d = docs.select(col(idCol).as("id"),
        explode(array_distinct(Text.kgrams(col(textCol), k))).as("s"))
    val p = probes.select(
        explode(Text.kgrams(col(textCol), k)).as("s")).distinct()
    d.join(broadcast(p), "s")
      .groupBy("id").agg(count(lit(1)).as("hits")) // shingles are distinct per doc
  }

  /** Connected components over a near-dup pair set: label propagation to
    * fixpoint (each node's label = min id reachable so far), the standard
    * scalable formulation — O(graph diameter) joins, each a key-equality
    * shuffle; near-dup graphs have tiny diameters. `ids` supplies the
    * full node set so singletons keep their own label. Returns
    * (id, cluster) where cluster = min id of the component; the canonical
    * survivor of each cluster is the row with id == cluster.
    *
    * Throws if the fixpoint is not reached within `maxIters` (a component
    * with diameter > maxIters would otherwise SILENTLY return
    * partially-propagated labels, splitting clusters): raise `maxIters`
    * for adversarial chain-shaped graphs — near-dup graphs converge in a
    * handful of iterations. `checkpointDir` selects reliable checkpoints
    * for the per-iteration materialization (see [[materialize]]).
    *
    * SMALL-GRAPH FAST PATH: when the verified edge set is at most
    * `driverCloseMaxEdges` (counted on the already-materialized edges —
    * one cheap checkpoint-read job) and the id type carries a driver-side
    * ordering, the closure runs as a driver union-find over the EDGE ids
    * only (nodes in no pair never leave the cluster), then one broadcast
    * join labels the corpus. Near-dup graphs after exact verification
    * are almost always tiny relative to the corpus, and the iterative
    * path's cost there is pure per-job scheduling floor (the same lesson
    * as PQ codebook training: a driver loop over a BOUNDED set beats a
    * distributed loop whose per-iteration cost is planning, measured in
    * BENCHNOTES). The bound is explicit — 2M edges = ~32 MB of longs —
    * and anything larger takes the unchanged distributed fixpoint, so
    * the 100 TB posture is intact. */
  def connectedComponents(ids: DataFrame, pairs: DataFrame,
      maxIters: Int = 20, checkpointDir: Option[String] = None,
      driverCloseMaxEdges: Long = 2000000L): DataFrame = {
    // Materialize the edge list ONCE (eager checkpoint): `pairs` is
    // usually the tail of an expensive candidate-generation + verify
    // pipeline (LSH join, Jaccard verification), and every propagation
    // iteration joins against edges — without this the whole upstream
    // pipeline re-executes per iteration (measured: the sf0.1 semantic
    // dedup bench ran minutes instead of seconds). Edges are
    // candidates-only, so the materialized set is small at any scale.
    val edges = materialize(
      pairs.select(col("id_a").as("a"), col("id_b").as("b"))
        .unionByName(pairs.select(col("id_b").as("a"), col("id_a").as("b"))),
      checkpointDir)

    val idOrd: Option[Ordering[Any]] = ids.schema("id").dataType match {
      case org.apache.spark.sql.types.LongType =>
        Some(Ordering.by(_.asInstanceOf[Long]))
      case org.apache.spark.sql.types.IntegerType =>
        Some(Ordering.by(_.asInstanceOf[Int]))
      case org.apache.spark.sql.types.StringType =>
        Some(Ordering.by(_.asInstanceOf[String]))
      case _ => None
    }
    // edges is doubled (both directions); the gate bounds the COLLECT
    if (idOrd.isDefined && edges.count() <= driverCloseMaxEdges * 2) {
      val ord = idOrd.get
      val parent = new java.util.HashMap[Any, Any]()
      def find(x: Any): Any = {
        var r = x
        while (parent.get(r) != null && parent.get(r) != r) r = parent.get(r)
        var c = x // path compression
        while (parent.get(c) != null && parent.get(c) != c) {
          val n = parent.get(c); parent.put(c, r); c = n
        }
        if (parent.get(r) == null) parent.put(r, r)
        r
      }
      edges.select("a", "b").collect().foreach { row =>
        val ra = find(row.get(0))
        val rb = find(row.get(1))
        if (ra != rb) { // min id becomes the root = the cluster label
          if (ord.lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
      import scala.jdk.CollectionConverters._
      val dt = ids.schema("id").dataType
      val spark = ids.sparkSession
      val mapped = parent.keySet().asScala.toSeq
        .map(k => org.apache.spark.sql.Row(k, find(k)))
      val mapDf = spark.createDataFrame(
        spark.sparkContext.parallelize(mapped, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", dt),
          org.apache.spark.sql.types.StructField("_mc", dt))))
      return ids.join(broadcast(mapDf), Seq("id"), "left")
        .select(col("id"), coalesce(col("_mc"), col("id")).as("cluster"))
    }

    var labels = ids.select(col("id"), col("id").as("cluster"))
    def propagate(ls: DataFrame): DataFrame = {
      // each node adopts the min cluster among itself and its neighbors;
      // the convergence flag rides in the SAME pass (the eager
      // checkpoint both truncates the iterative lineage and
      // materializes the result, so the follow-up changed-count is a
      // checkpoint read, not a second join job per iteration)
      val viaNeighbors = edges
        .join(ls.withColumnsRenamed(Map("id" -> "b", "cluster" -> "_nc")), "b")
        .groupBy(col("a").as("id"))
        .agg(min(col("_nc")).as("_minN"))
      materialize(
        ls.join(viaNeighbors, Seq("id"), "left")
          .select(col("id"),
            least(col("cluster"), coalesce(col("_minN"), col("cluster"))).as("cluster"),
            (coalesce(col("_minN"), col("cluster")) < col("cluster")).as("_chg")),
        checkpointDir)
    }
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val next = propagate(labels)
      val changed = next.filter(col("_chg")).limit(1).count()
      labels = next.drop("_chg")
      converged = changed == 0
      i += 1
    }
    if (!converged) {
      // the budget ran out right after an iteration that still changed
      // labels — which happens BOTH when truncated (diameter > maxIters)
      // and when the last permitted iteration was exactly the final one
      // (diameter == maxIters, labels now correct). One verification pass
      // distinguishes them, so a long job at the boundary is never failed
      // with a correct result in hand.
      val verify = propagate(labels)
      if (verify.filter(col("_chg")).limit(1).count() > 0)
        throw new IllegalStateException(
          s"connectedComponents did not converge within $maxIters iterations " +
            "(component diameter exceeds maxIters); raise maxIters")
      labels = verify.drop("_chg")
    }
    labels
  }

  /** The curation step clusters exist FOR: given near-dup `pairs`, keep
    * each cluster's canonical representative (min id) and drop every
    * other member — the corpus that actually ships to training. Rows not
    * in any pair are their own cluster and always survive. Cost shape:
    * [[connectedComponents]] over the PAIRS (candidates only, O(diameter)
    * key-equality joins) + one semi-join back to the corpus. */
  def keepCanonical(df: DataFrame, idCol: String, pairs: DataFrame,
      maxIters: Int = 20, checkpointDir: Option[String] = None): DataFrame = {
    val labels = connectedComponents(df.select(col(idCol).as("id")), pairs,
      maxIters, checkpointDir)
    df.join(labels.filter(col("id") === col("cluster"))
      .select(col("id").as(idCol)), Seq(idCol), "left_semi")
  }

  /** [[keepCanonical]] with a QUALITY preference: per near-dup cluster,
    * keep the member maximizing `score` (ties broken by id — fully
    * deterministic), not the arbitrary min-id one. This is what
    * production curation actually ships — among near-duplicate pages
    * keep the longest / highest-quality capture, e.g. `score =
    * col("n_tokens")` or a [[Text.linearScore]] column. Cost shape: the
    * same candidate-only component labeling plus ONE window shuffle
    * keyed by cluster id (cluster widths are near-dup group sizes —
    * bounded; a pathological mega-cluster is an input-quality signal,
    * not a plan hazard). Rows in no pair are their own cluster and
    * always survive. */
  def keepBest(df: DataFrame, idCol: String, pairs: DataFrame, score: Column,
      maxIters: Int = 20, checkpointDir: Option[String] = None): DataFrame = {
    val labels = connectedComponents(df.select(col(idCol).as("id")), pairs,
      maxIters, checkpointDir)
    val w = Window.partitionBy("_cluster").orderBy(score.desc, col(idCol))
    df.join(labels.select(col("id").as(idCol), col("cluster").as("_cluster")),
        Seq(idCol))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_cluster")
  }

  /** Embedding-cosine near-dup pairs >= `threshold`, exact via the
    * all-pairs path of [[Similarity.cosinePairs]] — the correctness
    * baseline (quadratic; use the LSH variant at scale). */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame =
    Similarity.cosinePairs(df, idCol, vecCol).filter(col("cosine") >= threshold)

  /** Scale path: random-hyperplane LSH bands generate candidate pairs
    * (bucket-equality join — near-identical vectors agree on band bits
    * with high probability), exact cosine verifies. Emitted pairs are
    * exact; recall is tunable via bands x bitsPerBand (more bands =
    * higher recall, more candidates). */
  def embeddingNearDupPairsLsh(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bands: Int = 16, bitsPerBand: Int = 8,
      maxBucketSize: Option[Int] = None,
      checkpointDir: Option[String] = None): DataFrame =
    bandedNearDupPairs(df, idCol, vecCol, threshold,
      v => array((0 until bands).map(b =>
        Similarity.hyperplaneBand(v, b, bitsPerBand)): _*),
      maxBucketSize, checkpointDir)

  /** [[embeddingNearDupPairsLsh]] with an EXPLICIT md5-derived plane
    * matrix ([[Similarity.md5Planes]]) instead of the xxhash64-seeded
    * planes — slower signatures (bands*w compiled dot loops vs one fused
    * pass) but replayable by ANY engine with md5, so a SQL oracle can
    * verify the whole path: planes, sign bits, buckets, candidate join,
    * exact cosine. */
  def embeddingNearDupPairsPlanes(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Seq[Seq[Double]], bands: Int,
      maxBucketSize: Option[Int] = None,
      checkpointDir: Option[String] = None): DataFrame =
    bandedNearDupPairs(df, idCol, vecCol, threshold,
      v => Similarity.planeBandsAll(v, planes, bands),
      maxBucketSize, checkpointDir)

  /** Candidate generation (per-band bucket-equality self-join — per-band
    * values, NOT slices of one packed signature: see
    * Similarity.hyperplaneBand on the 64-bit shift-wrap alias) + exact
    * cosine verification, shared by the banded embedding variants.
    *
    * The band join carries IDS ONLY — vectors re-attach to the DISTINCT
    * candidate pairs via key-equality joins afterwards (verifyJaccard's
    * shape). Carrying vectors through the self-join widened every
    * pre-dedup candidate row by 2 x dim doubles: measured 55 s -> 13 s
    * at sf0.1 under a deliberately collision-heavy banding (a ~1 KB
    * shuffle row vs a 24-byte one), and at 100 TB the band-collision
    * volume, not the emitted pair count, owns that shuffle. */
  private def bandedNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bandsOf: Column => Column,
      maxBucketSize: Option[Int] = None,
      checkpointDir: Option[String] = None): DataFrame = {
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    // Materialized once (eager checkpoint — see [[materialize]] for the
    // local-vs-reliable trade): the self-join reads the banded frame
    // TWICE, and its projection is the whole signature computation
    // (bands x w plane dots per row). Post-projection rows are narrow
    // (id, band, bucket) triples, so the artifact is bands rows x 24
    // bytes per vector at any scale.
    val banded = capBuckets(materialize(
      df.select(col(idCol).as("id"), posexplode(bandsOf(col(vecCol))))
        .select(col("id"), col("pos").as("band"), col("col").as("bucket")),
      checkpointDir), maxBucketSize)
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cands
      .join(vecs.withColumnsRenamed(Map("id" -> "id_a", "v" -> "_va")), "id_a")
      .join(vecs.withColumnsRenamed(Map("id" -> "id_b", "v" -> "_vb")), "id_b")
      .withColumn("cosine", Similarity.cosine(col("_va"), col("_vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** SemDeDup (semantic deduplication, Abbas et al. 2023): drop all but
    * one representative of every group of near-identical EMBEDDINGS —
    * the embedding-space analog of [[keepCanonical]] over text near-dups,
    * and the standard curation step between exact dedup and quality
    * filtering. Composition: banded-LSH candidate pairs (bucket-equality
    * join) -> exact cosine verify -> connected components over the
    * verified pairs -> keep each cluster's min-id row.
    *
    * Scale shape: the corpus never cross-joins — candidates come from the
    * band join (same posture as MinHash-LSH text dedup), components run
    * O(diameter) key-equality joins over the PAIRS, and the final keep is
    * one semi-join. Recall is tunable via bands x bitsPerBand: the 16x8
    * default fits the realistic SemDeDup regime (threshold >= ~0.9 →
    * ~99.6% per-pair recall); LOW thresholds need wider nets (fewer bits
    * per band, more bands — e.g. 32x4 at 0.4) because distant pairs
    * rarely agree on 8 sign bits. Emitted survivors are exact w.r.t. the
    * discovered pairs. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bands: Int = 16, bitsPerBand: Int = 8,
      maxIters: Int = 20, maxBucketSize: Option[Int] = None,
      checkpointDir: Option[String] = None): DataFrame =
    keepCanonical(df, idCol,
      embeddingNearDupPairsLsh(df, idCol, vecCol, threshold, bands, bitsPerBand,
        maxBucketSize, checkpointDir),
      maxIters, checkpointDir)

  /** [[semanticDedup]] over md5-derived planes — the oracle-replayable
    * variant (the driver's SQL oracle rebuilds the plane matrix,
    * re-derives every bucket, re-verifies every pair, and re-runs the
    * component closure as a recursive CTE). */
  def semanticDedupPlanes(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Seq[Seq[Double]], bands: Int,
      maxIters: Int = 20, maxBucketSize: Option[Int] = None,
      checkpointDir: Option[String] = None): DataFrame =
    keepCanonical(df, idCol,
      embeddingNearDupPairsPlanes(df, idCol, vecCol, threshold, planes, bands,
        maxBucketSize, checkpointDir),
      maxIters, checkpointDir)

  /** Embedding-space benchmark decontamination — the semantic analog of
    * [[contaminationHits]]: for each corpus row, the number of PROBE rows
    * (an eval/benchmark set) whose embedding cosine >= `threshold`,
    * discovered through the same banded random-hyperplane LSH as
    * [[embeddingNearDupPairsLsh]] but as an ASYMMETRIC join. The probe
    * side is tiny by construction (an eval set), so its banded form is
    * BROADCAST and the corpus is touched in ONE narrow pass — signature
    * projection, broadcast band join, inline exact cosine verify — before
    * a distinct-probe count keyed on corpus id. The corpus never shuffles
    * its vectors: the only exchange in the plan carries the (id,
    * probe_id) survivors. A same-pair re-collision in a second band
    * re-verifies the same pair (dedup happens in the count-distinct AFTER
    * the threshold filter, not before the verify) — a bounded recompute
    * traded for never widening a shuffle with vector payloads, the
    * opposite choice from the self-join in [[bandedNearDupPairs]] where
    * both sides are corpus-sized. */
  def crossContaminationLsh(corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      bands: Int = 16, bitsPerBand: Int = 8): DataFrame =
    crossContamination(corpus, probes, idCol, vecCol, threshold,
      v => array((0 until bands).map(b =>
        Similarity.hyperplaneBand(v, b, bitsPerBand)): _*))

  /** [[crossContaminationLsh]] under an explicit md5-derived plane
    * matrix — the oracle-replayable variant (same trade as
    * [[embeddingNearDupPairsPlanes]]). */
  def crossContaminationPlanes(corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      planes: Seq[Seq[Double]], bands: Int): DataFrame =
    crossContamination(corpus, probes, idCol, vecCol, threshold,
      v => Similarity.planeBandsAll(v, planes, bands))

  private def crossContamination(corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      bandsOf: Column => Column): DataFrame = {
    def banded(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        posexplode(bandsOf(col(vecCol))))
        .withColumnsRenamed(Map("pos" -> "_band", "col" -> "_bucket"))
    banded(corpus, "id", "_cv")
      .join(broadcast(banded(probes, "_pid", "_pv")), Seq("_band", "_bucket"))
      .filter(Similarity.cosine(col("_cv"), col("_pv")) >= threshold)
      .groupBy("id")
      .agg(countDistinct(col("_pid")).as("hits"))
  }

  /** Exact duplicate-SUBSTRING detection (ExactSubstr, Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better"): find
    * every maximal token span of length >= `k` that also occurs verbatim
    * elsewhere in the corpus, and report each document's span count and
    * duplicated-token coverage `(id, n_spans, dup_tokens)`. Set-level
    * near-dup ([[ngramJaccardPairs]], MinHash) misses exactly this case —
    * two long documents sharing one boilerplate paragraph — and span-level
    * exact dedup is the published remedy. The paper's shared suffix array
    * collapses relationally to: positional k-grams -> duplicated-gram
    * detection -> per-doc interval merge.
    *
    * Scale shape: the corpus-wide shuffle carries `(xxhash64, id, pos)`
    * triples — ~20 B per gram, never the gram text (a k=50 gram would be
    * ~300 B). "Duplicated" needs no distinct count: a hash is kept when
    * `min(id) != max(id)` (cross-doc) or `count > 1` (any re-occurrence).
    * Only CANDIDATE positions (the duplicated minority) re-derive their
    * gram string — via a key-equality join back to the token arrays — and
    * re-group on the actual string, so a 64-bit collision can never
    * manufacture a span: the output is exact at any corpus size while the
    * full-corpus pass stays constant-width. The interval merge is
    * gaps-and-islands over one window (one exchange on id): successive
    * starts p1 < p2 cover contiguous tokens iff p2 - p1 <= k, because all
    * intervals have identical length k, so ends are sorted with starts
    * and a lag(1) chain test is exact.
    *
    * The token arrays are persisted (memory-and-disk) because both the
    * hash pass and the candidate re-check read them; same session-lifetime
    * lifecycle as [[shingled]] (`spark.catalog.clearCache()` between
    * corpora). */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 12, crossDocOnly: Boolean = true,
      checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 2, s"span length must be >= 2, got $k")
    val toks = df
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("_ts"))
      .filter(size(col("_ts")) >= k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // hash array computed in ONE projection over the token SLICE
    // directly — xxhash64 folds the k element strings' bytes without
    // ever building the joined gram string (r17, measured 5.9 -> 4.4 s
    // on this pass at sf1). Output-invariant: equal gram strings <=>
    // equal token slices (tokens carry no whitespace), so no duplicate
    // is missed, and a 64-bit collision still only ADDS a candidate
    // that the exact string re-check below rejects. Exploded to narrow
    // (id, pos, h) rows; pos is the 1-based start token index.
    // materialized ([[materialize]]): the frame feeds BOTH the dup-key
    // aggregation and the candidate join, and recomputing it means
    // re-hashing every k-token gram — far more expensive than writing
    // back the 24-byte (id, pos, h) rows. `checkpointDir` selects
    // reliable (FS-backed) materialization, same contract as every
    // other Dedup materialization point.
    val hashes = materialize(toks.select(col("id"),
      posexplode(transform(sequence(lit(1), size(col("_ts")) - (k - 1)),
        i => xxhash64(slice(col("_ts"), i, lit(k))))))
      .select(col("id"), (col("pos") + 1).as("pos"), col("col").as("h")),
      checkpointDir)
    def dupKeys(g: DataFrame, key: String): DataFrame = {
      // crossDocOnly needs no occurrence count — skip the extra aggregate
      val agg =
        if (crossDocOnly)
          g.groupBy(key).agg(min("id").as("_i1"), max("id").as("_i2"))
        else g.groupBy(key).agg(count(lit(1)).as("_c"),
          min("id").as("_i1"), max("id").as("_i2"))
      val keep = if (crossDocOnly) col("_i1") =!= col("_i2")
      else col("_c") > 1 || col("_i1") =!= col("_i2")
      agg.filter(keep).select(key)
    }
    val candPos = hashes.join(dupKeys(hashes, "h"), "h").select("id", "pos")
    // exact re-check: candidates only, actual gram strings
    val candGrams = candPos.join(toks, "id").select(col("id"), col("pos"),
      concat_ws(" ", slice(col("_ts"), col("pos"), lit(k))).as("g"))
    val dupPos = candGrams.join(dupKeys(candGrams, "g"), "g").select("id", "pos")
    val w = Window.partitionBy("id").orderBy("pos")
    val islands = dupPos
      .withColumn("_prev", lag("pos", 1).over(w))
      .withColumn("_isl", sum(
        when(col("_prev").isNull || col("pos") - col("_prev") > k, 1L)
          .otherwise(0L)).over(w))
    islands.groupBy("id", "_isl")
      .agg(min("pos").as("_s"), (max("pos") + lit(k.toLong - 1L)).as("_e"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("_e") - col("_s") + 1L).as("dup_tokens"))
  }

  // ------------------------------------------------------------------
  // Incremental (batch-vs-frozen-corpus) dedup — the standing shape of a
  // crawl pipeline: the kept corpus is frozen, a fresh batch arrives, and
  // only batch rows with no duplicate in the corpus (and none earlier in
  // the batch) are admitted. Distinct from the whole-corpus operators
  // above: the corpus is NEVER re-deduplicated, only probed — at 100 TB
  // the corpus side reduces to a pruned-column index read (16-byte hashes
  // or band buckets), never the documents themselves.
  // ------------------------------------------------------------------

  /** Incremental EXACT dedup: admit incoming rows that are (a) first of
    * their content within the batch (lowest `idCol`) and (b) unseen in
    * the corpus. Both checks run on md5 of `on`, so the anti-join
    * shuffles constant-width 16-byte keys and the corpus scan prunes to
    * the single hashed column. Returns surviving incoming rows
    * unchanged. */
  def incrementalKeepNew(corpus: DataFrame, incoming: DataFrame,
      on: Column, idCol: String): DataFrame = {
    val key = md5(on.cast("string"))
    val seen = corpus.select(key.as("_seen")).distinct()
    keepFirst(incoming, key, idCol)
      .withColumn("_k", key)
      .join(seen, col("_k") === col("_seen"), "left_anti")
      .drop("_k")
  }

  /** Exact-Jaccard verification where the pair sides come from DIFFERENT
    * shingle frames (incoming probe vs corpus index). Same arithmetic as
    * [[verifyJaccard]] so emitted doubles are bit-identical to the batch
    * path's. */
  private def verifyJaccardAcross(cands: DataFrame, shI: DataFrame,
      shC: DataFrame, threshold: Double): DataFrame =
    cands
      .join(shI.withColumnsRenamed(Map("id" -> "id_i", "sh" -> "sh_i")), "id_i")
      .join(shC.withColumnsRenamed(Map("id" -> "id_c", "sh" -> "sh_c")), "id_c")
      .withColumn("_inter", size(array_intersect(col("sh_i"), col("sh_c"))))
      .withColumn("jaccard", col("_inter").cast("double") /
        (size(col("sh_i")) + size(col("sh_c")) - col("_inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_i", "id_c", "jaccard")

  /** Incremental NEAR-dup dedup: admit incoming docs with no n-gram
    * Jaccard >= `threshold` match in the frozen corpus and none among
    * EARLIER incoming rows (lower id). Candidates come from MinHash-LSH
    * band buckets (the corpus side is an index any run can rebuild or
    * persist); every candidate is verified with exact Jaccard, so false
    * positives are impossible and the miss probability is the banding
    * bound ((1-t^rows)^bands ~ 5e-8 at the defaults).
    *
    * The drop rule is deliberately order-free: a doc is dropped iff it
    * has a DIRECT verified match in {corpus} ∪ {ALL earlier batch rows,
    * admitted or not}. That is a pure relational predicate (one pass, no
    * sequential state), so it parallelizes and is exactly recomputable in
    * SQL; the alternative admitted-only sequential rule (check against
    * corpus + previously ADMITTED docs) is inherently order-dependent —
    * under it a chain a~b, b~c, a!~c keeps c because b was never indexed,
    * while this rule drops c (direct match with earlier b). The order-free
    * rule is the stricter of the two and errs toward dropping borderline
    * chain members — the safe direction for training data. (Whole-corpus
    * cluster semantics live in [[keepCanonical]].)
    *
    * Scale shape: two band-bucket equi-joins (incoming x corpus-index,
    * incoming x incoming) + bounded verification joins; `maxBucketSize`
    * caps degenerate hot buckets on BOTH sides (see [[capBuckets]] — a
    * hot bucket present in corpus and batch makes the probe join
    * quadratic in its occupancy). */
  private def bandsOf(sh: DataFrame, bands: Int, rows: Int): DataFrame =
    sh.select(col("id"), posexplode(
        graft.functions.VectorFunctions.minHashBands(col("sh"), bands, rows)))
      .select(col("id"), col("pos").as("band"), col("col").as("bucket"))

  def incrementalNearDupNew(corpus: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String, k: Int = 3, threshold: Double = 0.8,
      bands: Int = 32, rows: Int = 4,
      maxBucketSize: Option[Int] = None,
      checkpointDir: Option[String] = None): DataFrame =
    incrementalNearDupNewFromIndex(
      buildNearDupIndex(corpus, idCol, textCol, k, bands, rows),
      incoming, idCol, textCol, threshold, maxBucketSize, checkpointDir)

  /** Persisted corpus near-dup index: the band buckets + shingle sets of
    * the FROZEN kept corpus, computed once and reused by every arriving
    * batch — the production form of [[incrementalNearDupNew]] (whose
    * whole point is to never re-process the corpus per batch; without
    * the persisted artifact the corpus side still re-shingles each run).
    * Same pattern as [[Text.InvertedIndex]]. `k`/`numBands`/`rowsPerBand`
    * travel with the artifact so a probe can never silently use
    * mismatched parameters. */
  final case class NearDupIndex(bands: DataFrame, shingles: DataFrame,
      k: Int, numBands: Int, rowsPerBand: Int)

  def buildNearDupIndex(corpus: DataFrame, idCol: String, textCol: String,
      k: Int = 3, bands: Int = 32, rows: Int = 4): NearDupIndex = {
    val sh = shingled(corpus, idCol, textCol, k)
    NearDupIndex(bandsOf(sh, bands, rows), sh, k, bands, rows)
  }

  /** Bands land RANGE-PARTITIONED AND SORTED BY (band, bucket): row-group
    * min/max stats then prune a probe batch's bucket join to the file
    * slices actually holding its buckets. Shingles sort by id for the
    * same pruning on the verification join's id_c side. */
  def writeNearDupIndex(ix: NearDupIndex, dir: String): Unit = {
    ix.bands.repartitionByRange(col("band"), col("bucket"))
      .sortWithinPartitions("band", "bucket")
      .write.mode("overwrite").parquet(s"$dir/bands")
    ix.shingles.repartitionByRange(col("id")).sortWithinPartitions("id")
      .write.mode("overwrite").parquet(s"$dir/shingles")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/params.json"),
      s"""{"k":${ix.k},"bands":${ix.numBands},"rows":${ix.rowsPerBand}}"""
        .getBytes("UTF-8"))
  }

  def readNearDupIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): NearDupIndex = {
    val p = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/params.json")), "UTF-8")
    def field(n: String): Int =
      s""""$n":(\\d+)""".r.findFirstMatchIn(p).get.group(1).toInt
    NearDupIndex(spark.read.parquet(s"$dir/bands"),
      spark.read.parquet(s"$dir/shingles"),
      field("k"), field("bands"), field("rows"))
  }

  /** [[incrementalNearDupNew]] against a prebuilt [[NearDupIndex]] —
    * identical admit set (shared core), but the only corpus-sized work
    * is reading the index artifact. */
  def incrementalNearDupNewFromIndex(ix: NearDupIndex, incoming: DataFrame,
      idCol: String, textCol: String, threshold: Double = 0.8,
      maxBucketSize: Option[Int] = None,
      checkpointDir: Option[String] = None): DataFrame = {
    val shI = shingled(incoming, idCol, textCol, ix.k)
    // materialized once each: the corpus index feeds one join, the batch
    // bands feed three (cross probe + both self-join sides)
    val bC = capBuckets(materialize(ix.bands, checkpointDir), maxBucketSize)
    val bI = capBuckets(
      materialize(bandsOf(shI, ix.numBands, ix.rowsPerBand), checkpointDir),
      maxBucketSize)
    val crossCands = bI.as("a").join(bC.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .select(col("a.id").as("id_i"), col("b.id").as("id_c")).distinct()
    val dupVsCorpus = verifyJaccardAcross(crossCands, shI, ix.shingles, threshold)
      .select(col("id_i").as("_dup"))
    val selfCands = bI.as("a").join(bI.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") > col("b.id"))
      .select(col("a.id").as("id_i"), col("b.id").as("id_c")).distinct()
    val dupInBatch = verifyJaccardAcross(selfCands, shI, shI, threshold)
      .select(col("id_i").as("_dup"))
    incoming.join(dupVsCorpus.unionByName(dupInBatch).distinct(),
      col(idCol) === col("_dup"), "left_anti")
  }
}
