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

  /** Elementwise dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Normalize rows once so downstream cosine is a plain dot product —
    * at 100 TB you normalize at ingest, not per query. */
  def withUnitVec(df: DataFrame, vecCol: String, out: String = "unit"): DataFrame =
    df.withColumn(out,
      transform(col(vecCol), x => x.cast("double") / norm(col(vecCol))))

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

  /** Random-hyperplane signature: bit j = sign(dot(v, h_j)) where
    * hyperplane components are deterministic +/-1 pseudo-random values
    * derived from xxhash64(j, dim) — reproducible across executors with
    * no RNG state (`Date.now`/`Math.random` are banned in this harness
    * for exactly this reason). */
  def hyperplaneSignature(vec: Column, nBits: Int): Column = {
    val bits = (0 until nBits).map { j =>
      val prods = transform(vec, (x, i) =>
        when(xxhash64(lit(j), i).bitwiseAND(1) === 1,
          x.cast("double")).otherwise(-x.cast("double")))
      val s = aggregate(prods, lit(0.0), (acc, x) => acc + x)
      when(s > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN top-k: multi-band hyperplane signatures generate
    * candidates (bucket equality join, like MinHash banding), exact cosine
    * re-ranks. Approximate in recall only; `bands` x `bitsPerBand` tunes
    * recall vs candidate volume. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      bands: Int = 8, bitsPerBand: Int = 8): DataFrame = {
    val nBits = bands * bitsPerBand
    def banded(df: DataFrame, id: String, vOut: String): DataFrame = {
      val sig = hyperplaneSignature(col(vecCol), nBits)
      df.select(col(idCol).as(id), col(vecCol).as(vOut), sig.as("_sig"))
        .select(col(id), col(vOut),
          posexplode(array((0 until bands).map { b =>
            shiftrightunsigned(col("_sig"), b * bitsPerBand)
              .bitwiseAND((1L << bitsPerBand) - 1)
          }: _*)))
        .select(col(id), col(vOut), col("pos").as("band"), col("col").as("bucket"))
    }
    val c = banded(corpus, "nn_id", "_cv")
    val q = banded(queries, "query_id", "_qv")
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
}
