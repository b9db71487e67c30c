package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress data generator: replicates the driver's sf0.1 tables
  * `reps` times into a target dir, producing an ~sf(0.1*reps) corpus with
  * the SAME per-key distributions (versions per row, events per user,
  * lineitems per order) so per-query cost should extrapolate linearly in
  * rows — any superlinear bench divergence is an engine finding, not a
  * data artifact.
  *
  * Replica 0 is the original bytes. Replica i shifts every join/row key
  * by `i * 1e9` (consistently across tables, so joins and per-key group
  * sizes are preserved), and decorrelates CONTENT so duplicate-detection
  * operators see fresh data rather than 10 copies of one corpus:
  *  - documents: every 3rd word gets a per-replica suffix — any k>=3
  *    shingle covers a salted word, so cross-replica Jaccard ~ 0 while
  *    within-replica near-dup structure is approximately preserved
  *    (exact duplicates exactly preserved: same text -> same transform);
  *  - embeddings: a per-replica ORTHOGONAL transform (dimension
  *    rotation + deterministic sign flips) — within-replica pairwise
  *    cosines are EXACTLY the originals', cross-replica cosines are
  *    near-random, so LSH bucket loads and verify volumes scale
  *    linearly;
  *  - events/TPC-H rows: values and timestamps unchanged (key shift
  *    only) — range scans, version resolution, and aggregates see the
  *    original distributions at reps x the rows.
  *
  * Usage: runMain graft.ScaleData <srcDir> <dstDir> <reps>
  */
object ScaleData {
  private val Shift = 1000000000L // 1e9: far above any sf0.1 key range

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleData <srcDir> <dstDir> <reps>")
    val (src, dst, reps) = (args(0), args(1), args(2).toInt)
    require(reps >= 1, s"reps=$reps")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def table(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$dst/$name.parquet")

    def replicate(name: String, parts: Int)(
        transform: (DataFrame, Int) => DataFrame): Unit = {
      val base = table(name)
      val all = (0 until reps).map { i =>
        if (i == 0) base else transform(base, i)
      }.reduce(_ unionByName _)
      write(all, name, parts)
      println(s"[scale] $name -> ${reps}x")
    }

    def shifted(c: String, i: Int) = col(c) + lit(i * Shift)

    // dims copy verbatim (TPC-H nation/region are fixed at every SF)
    Seq("nation", "region").foreach { n => write(table(n), n, 1) }

    replicate("customer", 4) { (df, i) =>
      // names must decorrelate too: customer is NAME-keyed in the
      // prefix-filter queries, and replicas sharing c_name would
      // collapse into one row key under version resolution (caught at
      // sf1: prefix_filter returned 10 resolved rows vs the oracle's
      // 100 relational ones). A SUFFIX keeps every name-prefix
      // predicate's selectivity identical across replicas.
      df.withColumn("c_custkey", shifted("c_custkey", i))
        .withColumn("c_name", concat(col("c_name"), lit(s"_r$i")))
    }
    replicate("orders", 8) { (df, i) =>
      df.withColumn("o_orderkey", shifted("o_orderkey", i))
        .withColumn("o_custkey", shifted("o_custkey", i))
    }
    replicate("lineitem", 32) { (df, i) =>
      df.withColumn("l_orderkey", shifted("l_orderkey", i))
    }
    replicate("part", 4) { (df, i) =>
      df.withColumn("p_partkey", shifted("p_partkey", i))
    }
    replicate("supplier", 2) { (df, i) =>
      df.withColumn("s_suppkey", shifted("s_suppkey", i))
    }
    replicate("events", 16) { (df, i) =>
      df.withColumn("event_id", shifted("event_id", i))
        .withColumn("user_id", shifted("user_id", i))
    }
    replicate("documents", 16) { (df, i) =>
      df.withColumn("doc_id", shifted("doc_id", i))
        .withColumn("text", array_join(
          transform(split(col("text"), " "), (w, p) =>
            when(pmod(p, lit(3)) === 0, concat(w, lit(s"~$i"))).otherwise(w)),
          " "))
        .withColumn("n_chars", length(col("text")))
    }
    val dim = table("embeddings")
      .select(size(col("embedding"))).head.getInt(0)
    replicate("embeddings", 8) { (df, i) =>
      val rot = (i * 7) % dim
      df.withColumn("vec_id", shifted("vec_id", i))
        .withColumn("embedding", transform(
          sequence(lit(0), lit(dim - 1)), j => {
            val srcPos = (pmod(j + lit(rot), lit(dim)) + 1).cast("int")
            val sign = when(pmod(xxhash64(lit(i), j), lit(2)) === 0, lit(1.0f))
              .otherwise(lit(-1.0f))
            (sign * element_at(col("embedding"), srcPos)).cast("float")
          }))
    }
    spark.stop()
  }
}
