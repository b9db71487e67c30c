package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine as the exact baseline, and a random-hyperplane
  * LSH-bucketed variant as the scale path (candidates via bucket join +
  * exact re-rank — approximate only in recall, never in emitted scores).
  *
  * All dot products run through `zip_with` + `aggregate` in double
  * precision — codegen'd builtins, no UDFs (SURVEY §7.5 risk 7 posture).
  */
object Similarity {

  /** Elementwise dot product in double precision — the native codegen'd
    * [[graft.functions.DotProduct]] expression (sequential accumulation,
    * bit-compatible with the zip_with+aggregate formulation it replaced;
    * HOF lambdas are interpreted and this is the inner loop of every
    * similarity scan). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Normalize rows once so downstream cosine is a plain dot product —
    * at 100 TB you normalize at ingest, not per query. */
  def withUnitVec(df: DataFrame, vecCol: String, out: String = "unit"): DataFrame =
    df.withColumn(out,
      transform(col(vecCol), x => x.cast("double") / norm(col(vecCol))))

  /** Int8-grid quantization: each component clamped to [-1, 1] and
    * snapped to the 127-step grid via `floor(x*127 + 0.5) / 127` —
    * explicit floor-based rounding so ANY engine reproduces the exact
    * grid (round() half-tie conventions differ across engines). The 4x
    * memory/bandwidth reduction of int8 ANN, with values kept numeric so
    * scoring stays on the native DotProduct path. An INGEST-time pass
    * (the interpreted transform() lambda is fine there — it runs once
    * per corpus, not per query). */
  def quantizeUnit(vec: Column): Column =
    transform(vec, x =>
      floor(least(greatest(x.cast("double"), lit(-1.0)), lit(1.0)) * 127 + 0.5)
        / 127.0)

  /** Exact all-pairs cosine (id_a < id_b). Quadratic — the correctness
    * baseline and the verifier for banded variants. */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("cosine"))
  }

  /** Exact brute-force top-k neighbors for each query row: broadcast the
    * (small) query set against the corpus, window-rank per query. Ties
    * break on neighbor id for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("_cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"),
        cosine(col("_qv"), col("_cv")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Matryoshka (MRL) two-stage retrieval: shortlist on the embedding's
    * leading `prefixDim` dimensions, then exact full-dimension re-rank
    * within the shortlist — the standard adaptive-retrieval pattern for
    * nested-prefix embeddings (Kusupati et al. 2022). The corpus-sized
    * pass touches only `prefixDim/dim` of every vector's bytes; the full
    * vectors are read again only for the `queries x shortlist` survivors.
    *
    * Approximate in recall only (a true neighbor whose prefix cosine
    * falls outside the shortlist is missed); every EMITTED cosine is the
    * exact full-dimension value, so downstream thresholds stay meaningful.
    *
    * Shuffle discipline: the shortlist window ranks `(query_id, nn_id,
    * prefix_cosine)` rows only — full vectors are dropped BEFORE the
    * rank shuffle and re-joined after, so the corpus-sized shuffle is
    * three scalar columns wide regardless of embedding dimension. The
    * shortlist itself (queries x shortlist rows) broadcasts back onto
    * the corpus for the re-rank read. */
  def matryoshkaTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      prefixDim: Int, shortlist: Int): DataFrame = {
    require(prefixDim >= 1, "prefixDim must be >= 1")
    require(k <= shortlist,
      s"k=$k exceeds shortlist=$shortlist — the re-rank cannot recover " +
        "neighbors the shortlist already dropped")
    val c = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("_cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
    // stage 1: prefix-cosine shortlist, ids + one score wide
    val prefScore = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"),
        cosine(slice(col("_qv"), 1, prefixDim),
          slice(col("_cv"), 1, prefixDim)).as("_pcos"))
    val wp = Window.partitionBy("query_id")
      .orderBy(col("_pcos").desc, col("nn_id"))
    val short = prefScore.withColumn("_prank", row_number().over(wp))
      .filter(col("_prank") <= shortlist)
      .select("query_id", "nn_id")
    // stage 2: exact full-dim re-rank over the tiny survivor set
    val re = c.join(broadcast(short), "nn_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("nn_id"),
        cosine(col("_qv"), col("_cv")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("nn_id"))
    re.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Bucketed Matryoshka: IVF coarse quantization COMPOSED with the
    * prefix-cosine shortlist — stage 1 runs only within the query's
    * `nProbe` probed buckets AND reads only the leading `prefixDim`
    * components, stage 2 exact-re-ranks the shortlist at full dimension.
    * The two approximations multiply where they are cheap: at 100 TB the
    * corpus-sized work drops from O(corpus x dim) (brute), past
    * O(corpus x prefixDim) (plain Matryoshka — still every vector), to
    * O(corpus/nLists x nProbe x prefixDim) — probed buckets of prefix
    * slices, nothing else.
    *
    * Shuffle discipline: the corpus side enters the stage-1 join as
    * (nn_id, cid, prefix) — the full vector NEVER crosses a shuffle; the
    * prefix is sliced in the scan projection. The shortlist rank windows
    * ids + one score; full vectors are read again only for the
    * queries x shortlist survivors. Deterministic throughout (the
    * k-means-lite trainer has no RNG; ties break on id). `nProbe =
    * nLists` probes every bucket, collapsing this to [[matryoshkaTopK]]
    * exactly — the gate fixture's determinism lever. */
  def matryoshkaIvfTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      prefixDim: Int, shortlist: Int,
      nLists: Int = 16, nProbe: Int = 4, iters: Int = 2): DataFrame =
    matryoshkaIvfTopKWith(corpus, queries, idCol, vecCol, k, prefixDim,
      shortlist, ivfTrain(corpus, idCol, vecCol, nLists, iters), nProbe)

  /** The IVF coarse quantizer trained standalone — at scale the
    * codebook is built ONCE at ingest (like an index) and reused across
    * queries; [[matryoshkaIvfTopKWith]] takes it pre-trained so query
    * cost excludes training. Deterministic (no RNG).
    *
    * `nLists <= 0` (the default) derives the list count from the corpus:
    * the standard `nLists ≈ √N` sizing (FAISS guideline; balances probe
    * cost `nProbe·N/nLists` against centroid-assignment cost `nLists`),
    * clamped to [1, 4096] so the driver-held codebook stays tiny at any
    * corpus size. Explicit callers (the gates) are unaffected. */
  def ivfTrain(corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int = 0, iters: Int = 2): Seq[(Int, Seq[Double])] = {
    val c = corpus.select(col(idCol).as("_id"), col(vecCol).as("_v"))
    val lists =
      if (nLists > 0) nLists
      else math.min(4096L,
        math.max(1L, math.round(math.sqrt(c.count().toDouble)))).toInt
    trainCentroids(c, lists, iters)
  }

  /** [[matryoshkaIvfTopK]] over a PRE-TRAINED coarse quantizer. */
  def matryoshkaIvfTopKWith(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      prefixDim: Int, shortlist: Int,
      cents: Seq[(Int, Seq[Double])], nProbe: Int): DataFrame = {
    require(prefixDim >= 1, "prefixDim must be >= 1")
    require(k <= shortlist,
      s"k=$k exceeds shortlist=$shortlist — the re-rank cannot recover " +
        "neighbors the shortlist already dropped")
    // corpus rows: ONE home bucket, prefix slice only (each (q, c) pair
    // meets in at most one bucket, so no pair dedup is needed)
    val corpusLists = corpus.select(col(idCol).as("nn_id"),
      slice(col(vecCol), 1, prefixDim).as("_cpre"),
      explode(nearestCids(col(vecCol), cents, 1)).as("cid"))
    val queryLists = queries.select(col(idCol).as("query_id"),
      slice(col(vecCol), 1, prefixDim).as("_qpre"),
      explode(nearestCids(col(vecCol), cents, nProbe)).as("cid"))
    // stage 1: prefix cosine within probed buckets, ids-only rank shuffle
    val prefScore = corpusLists.join(broadcast(queryLists), "cid")
      .filter(col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"),
        cosine(col("_qpre"), col("_cpre")).as("_pcos"))
    val wp = Window.partitionBy("query_id")
      .orderBy(col("_pcos").desc, col("nn_id"))
    val short = prefScore.withColumn("_prank", row_number().over(wp))
      .filter(col("_prank") <= shortlist)
      .select("query_id", "nn_id")
    // stage 2: exact full-dimension re-rank over the survivors
    val cFull = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("_cv"))
    val qFull = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
    val re = cFull.join(broadcast(short), "nn_id")
      .join(broadcast(qFull), "query_id")
      .select(col("query_id"), col("nn_id"),
        cosine(col("_qv"), col("_cv")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("nn_id"))
    re.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF (inverted-file) ANN: k-means-lite coarse quantizer + probed
    * buckets + exact re-rank — the other standard scale path besides LSH.
    *
    * Deterministic throughout (no RNG): centroids initialize from the `k`
    * lowest-id vectors and refine with `iters` Lloyd steps computed as
    * broadcast-join + per-dimension groupBy-average — all DataFrame ops, so
    * the corpus never leaves executors; only the k*dim dimension means
    * (tiny) pass through the driver between iterations, which is how IVF
    * training works on any cluster. Queries probe the `nProbe` nearest centroids and re-rank
    * exactly within those buckets: approximate in recall only. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nLists: Int = 16, nProbe: Int = 4, iters: Int = 2): DataFrame = {
    val c = corpus.select(col(idCol).as("_id"), col(vecCol).as("_v"))
    val cents = trainCentroids(c, nLists, iters)

    // ---- assign corpus to lists; queries probe nProbe lists. NARROW:
    // nearest-centroid ids come from a per-row expression over the
    // driver-side centroid literals — a row never leaves its partition
    // to learn its list (the windowed formulation this replaces
    // exchanged corpus x nLists rows WITH their vectors just to run
    // row_number per id: a 16x corpus shuffle for a per-row argmax)
    def assign(df: DataFrame, id: String, v: String, keep: Int): DataFrame =
      df.select(col(id), col(v),
        explode(nearestCids(col(v), cents, keep)).as("cid"))
    val corpusLists = assign(
      corpus.select(col(idCol).as("nn_id"), col(vecCol).as("_cv2")), "nn_id", "_cv2", 1)
    val queryLists = assign(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv")), "query_id", "_qv", nProbe)

    // ---- exact re-rank within probed lists
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("nn_id"))
    corpusLists.join(queryLists, "cid")
      .filter(col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"),
        cosine(col("_qv"), col("_cv2")).as("cosine"))
      .dropDuplicates("query_id", "nn_id")
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic maximin (farthest-point) seeding over a bounded
    * hash-ordered sample — [[pqTrain]]'s seeding logic, shared by the
    * full-vector trainers. First seed = the sample's first point; each
    * next seed the point maximizing distance to its nearest chosen seed,
    * ties to the earliest sample position. Distances accumulate as
    * QUANTIZED LONGS (each squared-difference term snaps to the 2^-20
    * grid): order-independent and bit-replayable by an independent
    * engine — the `cluster_kmeans` oracle re-derives the same seeds in
    * SQL. Quantization is harmless here: seeding picks far-apart points,
    * it doesn't need sub-grid distance resolution. */
  private def maximinSeeds(samp: IndexedSeq[Seq[Double]],
      k: Int): Seq[(Int, Seq[Double])] = {
    require(samp.length >= k, s"k=$k exceeds sample size ${samp.length}")
    def quantD2(p: Seq[Double], c: Seq[Double]): Long = {
      var s = 0L; var i = 0
      val n = math.min(p.length, c.length)
      while (i < n) {
        val dx = p(i) - c(i)
        s += math.floor(dx * dx * 1048576.0 + 0.5).toLong
        i += 1
      }
      s
    }
    val seeds = scala.collection.mutable.ArrayBuffer(samp(0))
    val dmin = Array.fill(samp.length)(Long.MaxValue)
    while (seeds.length < k) {
      val last = seeds.last
      var best = 0; var bestD = -1L
      var i = 0
      while (i < samp.length) {
        val d = quantD2(samp(i), last)
        if (d < dmin(i)) dmin(i) = d
        if (dmin(i) > bestD) { bestD = dmin(i); best = i }
        i += 1
      }
      seeds += samp(best)
    }
    seeds.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
  }

  /** A bounded deterministic training sample: the `n` rows with the
    * lowest `md5(salt || id)` (ties to id) — uniform in content (the
    * hash decorrelates sample position from id order, which in crawl
    * corpora correlates with content), reproducible, and replayable in
    * plain SQL (unlike `xxhash64`, every engine has md5). One
    * TakeOrdered job; `n * dim` doubles to the driver. */
  private def hashOrderedSample(c: DataFrame, n: Int,
      salt: String): IndexedSeq[Seq[Double]] =
    c.orderBy(md5(concat(lit(salt), col("_id").cast("string")).cast("binary")),
        col("_id"))
      .limit(n).select(col("_v")).collect()
      .map(r => r.getSeq[Any](0).map(widen).toSeq).toIndexedSeq

  /** Deterministic k-means clustering of the corpus by embedding — the
    * mixing/curation face of the vector pipeline (cluster-balanced
    * sampling, per-cluster quality stats, SemDeDup-style pruning all
    * start from `(id, cid)` assignments). Returns `(idCol, cid)`.
    *
    * Engine-replayable BY CONSTRUCTION, unlike textbook k-means:
    *  - init = [[maximinSeeds]] over a bounded md5-hash-ordered sample
    *    (no RNG; first-k-ids seeding degraded when id order correlated
    *    with content, the norm in crawl corpora);
    *  - each Lloyd refresh is a PER-DIMENSION GRID MEAN: coordinates
    *    quantize to the 2^-20 grid and accumulate as longs, so the mean
    *    is combine-order-independent and an independent engine replays
    *    it bit-for-bit (same contract as [[graft.pipeline.Text.bm25]]);
    *    raw double `avg` would depend on partial-aggregate order;
    *  - assignment = [[nearestCids]] (score desc, ties to lowest cid),
    *    whose dot products are sequential folds matching any engine's
    *    list dot product;
    *  - an emptied cluster keeps its previous centroid (k is part of
    *    the output contract).
    *
    * Scale: assignment is a narrow per-row expression over driver-side
    * centroid literals (no shuffle); each refresh is one `groupBy(cid,
    * pos)` whose state is one long per (cluster, dimension); only k*dim
    * scalars visit the driver per iteration. The corpus is read
    * `iters + 1` times — `cache = true` persists the projected
    * `(id, vec)` frame (MEMORY_AND_DISK) for the loop and unpersists on
    * return; otherwise keep `iters` small (cluster quality saturates
    * fast; FAISS trains IVF coarse quantizers with a handful of
    * steps). */
  def kmeansCluster(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 1, cache: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus.select(col(idCol).as("_id"), col(vecCol).as("_v"))
    if (cache)
      c.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): Unit
    var cents: Seq[(Int, Seq[Double])] =
      maximinSeeds(hashOrderedSample(c, math.max(k, 256), "kmseed"), k)
    for (_ <- 0 until iters) {
      val assigned = c.withColumn("cid",
        element_at(nearestCids(col("_v"), cents, 1), 1))
      val gridMeans = assigned
        .select(col("cid"), posexplode(col("_v")))
        .withColumn("_q",
          floor(col("col").cast("double") * 1048576.0 + 0.5).cast("long"))
        .groupBy("cid", "pos")
        .agg((sum(col("_q")) / 1048576.0 / count(lit(1))).as("m"))
        .as[(Int, Int, Double)].collect()
      val refreshed = gridMeans.groupBy(_._1).map { case (cid, rows) =>
        (cid, rows.sortBy(_._2).map(_._3).toSeq)
      }
      cents = cents.map { case (cid, old) =>
        (cid, refreshed.getOrElse(cid, old))
      }
    }
    // the cache serves the EAGER training passes above; the returned
    // frame is lazy, so release the blocks now — its one narrow pass
    // re-reads the source when the caller executes
    if (cache) c.unpersist(blocking = false): Unit
    c.select(col("_id").as(idCol),
      element_at(nearestCids(col("_v"), cents, 1), 1).as("cid"))
  }

  /** Exact numeric widening for vector components collected to the
    * driver: `getFloat(i).toDouble` semantics (what the native kernels
    * see via `hoist`), NOT `toString.toDouble` — the string round-trip
    * parses the shortest decimal representation, which differs from the
    * exact widening by up to half a float ulp and can train a boundary
    * point into a different Voronoi cell than encode assigns it. */
  private def widen(x: Any): Double = x match {
    case null => 0.0
    case f: java.lang.Float => f.doubleValue
    case d: java.lang.Double => d.doubleValue
    case n: java.lang.Number => n.doubleValue
    case other => other.toString.toDouble
  }

  /** The `keep` nearest-centroid ids for a vector column, best first, as
    * a NARROW per-row expression over DRIVER-SIDE centroid literals: an
    * array of `(-score, cid)` structs, `array_sort` (lexicographic:
    * score desc, ties to the lowest cid — the exact ordering of the
    * windowed formulation this replaces), sliced to `keep`, projected to
    * cids. No crossJoin, no window, no shuffle.
    *
    * Score = `dot(v, c) / |c|` with `|c|` a driver-computed constant:
    * the row's own norm is a common POSITIVE factor across all
    * centroids, so dividing by it cannot change the per-row ordering —
    * dropping it saves a sqrt per centroid term. A zero-norm centroid
    * scores 0 against everything (guard, not NaN). */
  private def nearestCids(v: Column, cents: Seq[(Int, Seq[Double])],
      keep: Int): Column = {
    val scored = array(cents.map { case (cid, cv) =>
      val cn = math.sqrt(cv.map(x => x * x).sum)
      val score = if (cn == 0.0) lit(0.0) else dot(v, typedLit(cv)) / cn
      struct((-score).as("negd"), lit(cid).as("cid"))
    }: _*)
    transform(slice(array_sort(scored), 1, keep), s => s.getField("cid"))
  }

  /** k-means-lite coarse-quantizer training for [[ivfTopK]]. Input frame
    * has columns `(_id, _v)`; returns the `nLists` centroids after `iters`
    * deterministic Lloyd steps (init = [[maximinSeeds]] over a bounded
    * md5-hash-ordered sample, like [[kmeansCluster]]).
    *
    * The refinement computes the new centroid as a PER-DIMENSION mean:
    * posexplode -> groupBy(cid, pos) -> avg. The aggregation state is one
    * double per (centroid, dimension) — never a list of member vectors (a
    * collect_list formulation would hold ~1/k of the whole corpus in ONE
    * aggregation buffer row: a guaranteed executor OOM at 100 TB). Only
    * k*dim scalar rows pass through the driver per iteration. */
  private[pipeline] def trainCentroids(c: DataFrame, nLists: Int,
      iters: Int): Seq[(Int, Seq[Double])] = {
    val spark = c.sparkSession
    import spark.implicits._
    var centroids: Seq[(Int, Seq[Double])] =
      maximinSeeds(hashOrderedSample(c, math.max(nLists, 256), "kmseed"),
        nLists)
    for (_ <- 0 until iters) {
      // narrow per-row assignment (see nearestCids) — the Lloyd step's
      // only exchange is the (cid, pos) mean aggregation below
      val assigned = c.withColumn("cid",
        element_at(nearestCids(col("_v"), centroids, 1), 1))
      val dimMeans = assigned
        .select(col("cid"), posexplode(col("_v")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("col").cast("double")).as("m"))
        .as[(Int, Int, Double)].collect()
      val refreshed = dimMeans.groupBy(_._1).map { case (cid, rows) =>
        (cid, rows.sortBy(_._2).map(_._3).toSeq)
      }
      // a centroid whose cluster emptied keeps its previous position —
      // the centroid COUNT is part of the contract (PQ codes index
      // 0..k-1), and duplicate inits (common in clustered subspaces)
      // would otherwise silently shrink the codebook
      centroids = centroids.map { case (cid, old) =>
        (cid, refreshed.getOrElse(cid, old))
      }
    }
    centroids
  }

  /** Product-quantization codebooks: split the `dim`-dimensional space
    * into `m` subspaces (dim must divide evenly) and train `k` L2
    * centroids per subspace. Deterministic throughout (no RNG):
    * farthest-point (maximin) seeding — first seed = the first sample
    * point, each next seed the point maximizing distance to its nearest
    * chosen seed, ties to the earliest point (the kmeans++ idea without
    * randomness; naive first-k seeding collapses when neighbors in
    * sample order share a cluster) — then `iters` Lloyd steps
    * (assignment ties to the lowest cid; an empty cluster keeps its
    * centroid — the codebook's k is part of the contract, PQ codes
    * index 0..k-1).
    *
    * Training runs DRIVER-SIDE on a bounded deterministic sample: the
    * `trainSample` rows with the lowest `xxhash64(id)` (ties to id),
    * one TakeOrdered job collecting trainSample*dim doubles (~2 MB at
    * the defaults). This is the FAISS recipe and the only formulation
    * that holds at 100 TB: codebook quality saturates at a few thousand
    * points per centroid, so the cluster is spent exclusively on the
    * embarrassingly-parallel encode/scan, never on training. (An
    * earlier all-corpus distributed formulation paid ~3.5 s of Catalyst
    * planning PER maximin round — k-1 rounds — to pick seeds a local
    * loop finds in microseconds: 51 s vs <1 s at sf0.1, identical
    * codebook quality.) Returns `codebooks(j)(c)` = centroid c of
    * subspace j.
    *
    * PQ is the memory-bandwidth scale path for ANN at 100 TB: each
    * corpus vector stores m SMALL INTS (the per-subspace centroid ids,
    * [[graft.functions.PqEncode]]) instead of dim floats — a 64-dim
    * float vector becomes 8 bytes at m=8 — and query scoring is m table
    * lookups per vector ([[pqTopK]]), not a dim-wide dot. */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int = 2,
      trainSample: Int = 4096): Seq[Seq[Seq[Double]]] = {
    require(m > 0 && k > 0, s"m=$m k=$k must be positive")
    require(trainSample >= k, s"trainSample=$trainSample must cover k=$k")
    val dimRows = corpus.select(size(col(vecCol))).head(1)
    require(dimRows.nonEmpty, "pqTrain needs a non-empty corpus")
    val dim = dimRows(0).getInt(0)
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val sub = dim / m
    // hash-ordered TakeOrdered: a uniform, reproducible, type-agnostic
    // sample — no RNG, no sampleBy partition-order sensitivity
    val pts: Array[Array[Double]] = corpus
      .select(col(idCol).as("_id"), col(vecCol).as("_v"))
      .orderBy(xxhash64(col("_id")), col("_id"))
      .limit(trainSample)
      .collect()
      .map { r =>
        val v = r.getSeq[Any](1)
        val a = new Array[Double](dim) // short vectors 0-pad, like PqEncode
        v.iterator.take(dim).zipWithIndex.foreach { case (x, i) =>
          a(i) = widen(x)
        }
        a
      }

    (0 until m).map { j =>
      val off = j * sub
      def d2(p: Array[Double], c: Array[Double]): Double = {
        var s = 0.0; var t = 0
        while (t < sub) { val dx = p(off + t) - c(t); s += dx * dx; t += 1 }
        s
      }
      def sliceOf(p: Array[Double]): Array[Double] =
        java.util.Arrays.copyOfRange(p, off, off + sub)

      // maximin seeding: track each point's distance to its nearest
      // chosen seed; strict > with an ascending scan ties to the
      // earliest point
      val seeds = scala.collection.mutable.ArrayBuffer(sliceOf(pts(0)))
      val dmin = Array.fill(pts.length)(Double.MaxValue)
      while (seeds.length < k) {
        val last = seeds.last
        var best = 0; var bestD = -1.0
        var i = 0
        while (i < pts.length) {
          val d = d2(pts(i), last)
          if (d < dmin(i)) dmin(i) = d
          if (dmin(i) > bestD) { bestD = dmin(i); best = i }
          i += 1
        }
        seeds += sliceOf(pts(best))
      }

      // Lloyd: argmin-L2 assignment (strict < ties to the lowest cid,
      // matching PqEncode's argmax(dot - |c|^2/2) tie rule exactly)
      var cents = seeds.toArray
      for (_ <- 0 until iters) {
        val sums = Array.fill(k)(new Array[Double](sub))
        val cnt = new Array[Long](k)
        var i = 0
        while (i < pts.length) {
          var bc = 0; var bd = Double.MaxValue
          var c = 0
          while (c < k) {
            val d = d2(pts(i), cents(c))
            if (d < bd) { bd = d; bc = c }
            c += 1
          }
          cnt(bc) += 1
          var t = 0
          while (t < sub) { sums(bc)(t) += pts(i)(off + t); t += 1 }
          i += 1
        }
        cents = Array.tabulate(k) { c =>
          if (cnt(c) == 0) cents(c) // empty cluster keeps its seat
          else {
            val a = new Array[Double](sub)
            var t = 0
            while (t < sub) { a(t) = sums(c)(t) / cnt(c); t += 1 }
            a
          }
        }
      }
      cents.map(_.toSeq).toSeq
    }
  }

  /** Ingest-time PQ encoding: append the code column (the m per-subspace
    * centroid ids, array<int>) and the TRUE vector norm (one double —
    * the standard companion to a PQ code: ADC approximates the raw dot
    * but the family metric is cosine, so candidates rank by adc/|x|).
    * At 100 TB this runs ONCE at ingest — the same posture as
    * [[withUnitVec]]/[[quantizeUnit]] — and every [[pqTopKEncoded]]
    * query scans m ints + a double per vector instead of dim floats. */
  def withPqCodes(df: DataFrame, vecCol: String,
      codebooks: Seq[Seq[Seq[Double]]],
      codeCol: String = "pq_code", normCol: String = "pq_norm"): DataFrame = {
    val fn = graft.functions.VectorFunctions
    df.withColumn(codeCol, fn.pqEncode(col(vecCol), codebooks))
      .withColumn(normCol, norm(col(vecCol)))
  }

  /** PQ/ADC approximate top-k + exact re-rank: corpus vectors are scored
    * against each query through the ADC lookup table (approx dot =
    * sum over subspaces of table[j*k + code_j]), the top
    * `oversample * kNN` per query re-rank with EXACT cosine, and only
    * exact scores are emitted — approximate in recall, never in values
    * (the family-wide contract). Queries broadcast with their tables
    * (built once per query by the native [[graft.functions.PqAdcTable]]);
    * the corpus side reads codes, not vectors, for the scoring pass.
    * Encodes inline; a corpus queried repeatedly should encode once via
    * [[withPqCodes]] and use [[pqTopKEncoded]]. */
  def pqTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, kNN: Int,
      codebooks: Seq[Seq[Seq[Double]]], oversample: Int = 4): DataFrame =
    pqTopKEncoded(withPqCodes(corpus, vecCol, codebooks), queries,
      idCol, vecCol, kNN, codebooks, oversample)

  /** PQ/ADC top-k over a PRE-ENCODED corpus ([[withPqCodes]], run at
    * ingest). The scoring pass carries ONLY (nn_id, codes, norm) — m
    * ints + a double per corpus vector, never the vector itself: at
    * 100 TB the candidate cut shuffles codes, and full vectors surface
    * only for the oversample*kNN survivors joined back for the exact
    * re-rank. */
  def pqTopKEncoded(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, kNN: Int,
      codebooks: Seq[Seq[Seq[Double]]], oversample: Int = 4,
      codeCol: String = "pq_code", normCol: String = "pq_norm"): DataFrame = {
    val fn = graft.functions.VectorFunctions
    val coded = corpus.select(col(idCol).as("nn_id"),
      col(codeCol).as("_code"), col(normCol).as("_cn"))
    val qtab = queries.select(col(idCol).as("query_id"),
      fn.pqAdcTable(col(vecCol), codebooks).as("_tab"))
    // compiled kernel (PqAdcScore), not zip_with/aggregate lambdas:
    // this expression runs corpus x queries times — interpreted HOF
    // dispatch here would cost more than the dot product ADC replaces
    val approx = coded.crossJoin(broadcast(qtab))
      .filter(col("query_id") =!= col("nn_id"))
      .withColumn("_adc",
        fn.pqAdcScore(col("_code"), col("_tab")) / col("_cn"))
    val wA = Window.partitionBy("query_id")
      .orderBy(col("_adc").desc, col("nn_id"))
    val cands = approx.withColumn("_ar", row_number().over(wA))
      .filter(col("_ar") <= oversample * kNN)
      .select("query_id", "nn_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("nn_id"))
    cands
      .join(corpus.select(col(idCol).as("nn_id"), col(vecCol).as("_cv")), "nn_id")
      .join(broadcast(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))),
        "query_id")
      .select(col("query_id"), col("nn_id"),
        cosine(col("_qv"), col("_cv")).as("cosine"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= kNN)
  }

  /** Random-hyperplane signature: bit j = sign(dot(v, h_j)) where
    * hyperplane components are deterministic +/-1 pseudo-random values
    * derived from xxhash64(j, dim) — reproducible across executors with
    * no RNG state (`Date.now`/`Math.random` are banned in this harness
    * for exactly this reason). */
  def hyperplaneSignature(vec: Column, nBits: Int): Column = {
    require(nBits <= 64,
      "a packed signature holds at most 64 bits; use hyperplaneBand for banding")
    hyperplaneBand(vec, 0, nBits)
  }

  /** Bucket value of band `b`: hyperplane sign bits [b*w, b*w + w) packed
    * into one long. Banding MUST go through per-band values rather than
    * slicing one packed signature: Java shifts wrap at 64, so packing
    * >64 bits silently aliases high bands onto low ones (halving
    * effective recall with the old 128-bit default).
    *
    * Backed by the native codegen'd [[graft.functions.HyperplaneBand]]
    * expression — one compiled pass accumulating all `w` plane sums. The
    * previous `transform`+`aggregate` formulation ran `w` interpreted
    * vector passes per row (HOF lambdas get no codegen and no CSE); the
    * native expression derives identical sign bits (same xxhash64(j, i)
    * bit-0 hyperplanes, same accumulation order — parity-tested), so
    * buckets are bit-compatible. */
  def hyperplaneBand(vec: Column, b: Int, w: Int): Column = {
    require(w <= 64, s"band width $w exceeds 64 bits")
    graft.functions.VectorFunctions.hyperplaneBand(vec, b, w)
  }

  /** LSH-bucketed ANN top-k: multi-band hyperplane signatures generate
    * candidates (bucket equality join, like MinHash banding), exact cosine
    * re-ranks. Approximate in recall only; `bands` x `bitsPerBand` tunes
    * recall vs candidate volume. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      bands: Int = 8, bitsPerBand: Int = 8): DataFrame = {
    def banded(df: DataFrame, id: String, vOut: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vOut),
          posexplode(array((0 until bands).map(b =>
            hyperplaneBand(col(vecCol), b, bitsPerBand)): _*)))
        .select(col(id), col(vOut), col("pos").as("band"), col("col").as("bucket"))
    bandedTopK(banded(corpus, "nn_id", "_cv"),
      banded(queries, "query_id", "_qv"), k)
  }

  /** Candidate join + exact re-rank shared by the banded ANN variants. */
  private def bandedTopK(c: DataFrame, q: DataFrame, k: Int): DataFrame = {
    val cands = c.join(q, Seq("band", "bucket"))
      .filter(col("query_id") =!= col("nn_id"))
      .select("query_id", "nn_id", "_qv", "_cv")
      .dropDuplicates("query_id", "nn_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("nn_id"))
    cands
      .select(col("query_id"), col("nn_id"),
        cosine(col("_qv"), col("_cv")).as("cosine"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic hyperplane matrix derived from md5 — recomputable by
    * ANY engine with an md5 function, unlike the xxhash64-seeded planes
    * inside [[hyperplaneBand]] (the point: a DuckDB oracle can rebuild
    * the identical matrix in SQL and verify the whole LSH path —
    * signatures, buckets, candidates, re-rank — end to end). Component
    * (j, d) = (h % 2001 - 1000) / 1000.0 where h = first 15 md5 hex chars
    * of "hp_<j>_<d>" as a long — uniform-ish in [-1, 1], which is all
    * sign-random-projection needs. */
  /** Sign-LSH banding sizing rule, from the 10x/30x scale sweep
    * (BENCH_SF1.md finding 2): with `bits` planes per band, the 2^bits
    * buckets of each band hold a mean of `corpusSize / 2^bits` vectors —
    * occupancy grows LINEARLY with the corpus under a fixed width, so a
    * fixed `maxBucketSize` flips from skew safety net to primary volume
    * control somewhere around one order of magnitude of growth.
    * `bitsPerBand` returns the width that keeps mean occupancy at
    * `targetOccupancy` for a given corpus size: grow bits with
    * log2(corpus), re-derive per ingest generation, and leave the cap
    * for the skewed tail. Clamped to [4, 30] (below 4 bits banding is
    * degenerate; above 30 the bucket id no longer fits the byte-packed
    * signature). Plane count for [[md5Planes]] is then
    * `bands * bitsPerBand(...)`. */
  def bitsPerBand(corpusSize: Long, targetOccupancy: Int = 16): Int = {
    require(corpusSize > 0 && targetOccupancy > 0,
      s"corpusSize=$corpusSize targetOccupancy=$targetOccupancy")
    val needed = math.ceil(
      math.log(corpusSize.toDouble / targetOccupancy) / math.log(2.0)).toInt
    math.max(4, math.min(30, needed))
  }

  def md5Planes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5") // resets per digest()
    (0 until nPlanes).map { j =>
      (0 until dim).map(d => md5Unit(md, s"hp_${j}_${d}"))
    }
  }

  /** The md5-hex-to-[-1,1] component shared by [[md5Planes]] and
    * [[md5Codebooks]]: first 15 md5 hex chars of the key as a long,
    * (h % 2001 - 1000) / 1000.0. This arithmetic is LOAD-BEARING for
    * the SQL oracles, which rebuild it verbatim in DuckDB — change it
    * in lockstep with the `similarity_lsh_planes` / `dedup_semantic` /
    * `similarity_pq_topk` oracle CTEs or the gates go red. */
  private def md5Unit(md: java.security.MessageDigest, key: String): Double = {
    val hex = md.digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) % 2001 - 1000) / 1000.0
  }

  /** Deterministic PQ codebooks from md5, the [[md5Planes]] idea applied
    * to quantization: centroid component (j, c, t) derives from
    * md5("pq_<j>_<c>_<t>") with the same %2001 arithmetic, so a SQL
    * oracle can rebuild the identical codebook and replay the ENTIRE
    * PQ path — encode argmax, ADC lookup sums, candidate cut, exact
    * re-rank — bit-for-bit (the driver-gate behind
    * `similarity_pq_topk`). Not a substitute for [[pqTrain]]'s fitted
    * codebooks in production — random codebooks cost recall — but the
    * machinery they exercise is byte-identical. */
  def md5Codebooks(m: Int, k: Int, sub: Int): Seq[Seq[Seq[Double]]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until m).map { j =>
      (0 until k).map { c =>
        (0 until sub).map(t => md5Unit(md, s"pq_${j}_${c}_${t}"))
      }
    }
  }

  /** ALL band buckets under an EXPLICIT plane matrix, one fused compiled
    * pass (native [[graft.functions.PlaneBands]]): element b's bit r =
    * sign(dot(v, plane_{b*w+r})), sequential double accumulation — the
    * exact bits of the [[planeBand]] composition (parity spec-asserted)
    * and of a SQL oracle's `list_dot_product`. This is the production
    * signature stage for [[lshTopKPlanes]] and
    * [[Dedup.embeddingNearDupPairsPlanes]]; the per-band [[planeBand]]
    * composition below is its executable specification. */
  def planeBandsAll(vec: Column, planes: Seq[Seq[Double]], bands: Int): Column =
    graft.functions.VectorFunctions.planeBands(vec, planes, bands)

  /** Bucket value of band `b` under an EXPLICIT plane matrix
    * (`planes.length = bands * w` rows): packs the sign bits
    * sign(dot(v, plane_{b*w+r})) for r in [0, w) into one long. Each
    * plane dot product runs through the native codegen'd DotProduct
    * (sequential accumulation), so an oracle that rebuilds the same
    * matrix and dots sequentially reproduces every bit. The executable
    * spec for [[planeBandsAll]] — use that in production plans: `bands*w`
    * literal-plane dots inline thousands of array literals into the plan
    * (measured 4 s of the sf0.1 bench on signature stages alone). */
  def planeBand(vec: Column, planes: Seq[Seq[Double]], bands: Int,
      b: Int): Column = {
    require(bands > 0 && planes.nonEmpty && planes.length % bands == 0,
      s"planes (${planes.length}) must split evenly into $bands bands")
    val w = planes.length / bands
    require(w <= 64, s"band width $w exceeds 64 bits")
    (0 until w).map { r =>
      when(dot(vec, typedLit(planes(b * w + r))) > 0, lit(1L << r))
        .otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** LSH top-k with an EXPLICIT plane matrix (see [[planeBandsAll]] for
    * the bucket layout). Same candidate-join + exact-re-rank machinery as
    * [[lshTopK]]; the signature stage is ONE fused compiled pass over the
    * matrix, so the oracle-replayable variant carries no plan-size or
    * speed penalty vs the hash-derived path. */
  def lshTopKPlanes(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      planes: Seq[Seq[Double]], bands: Int): DataFrame = {
    def banded(df: DataFrame, id: String, vOut: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vOut),
          posexplode(planeBandsAll(col(vecCol), planes, bands)))
        .select(col(id), col(vOut), col("pos").as("band"), col("col").as("bucket"))
    bandedTopK(banded(corpus, "nn_id", "_cv"),
      banded(queries, "query_id", "_qv"), k)
  }
}
