package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** Scale-stress cross-checks for gates whose DuckDB oracles are
  * single-node-intractable at sf1 (the BENCH_SF1.md budget rule): each
  * check recomputes the gate's answer through an INDEPENDENT in-engine
  * path and compares exactly. Complements — never replaces — the sf0.01
  * oracle rows, which stay the authoritative engine-vs-engine evidence.
  *
  * `incremental_near`: the gate's LSH-probe path (MinHash band index on
  * the corpus, probe join, exact verify) against the exact PPJoin path
  * (`ngramJaccardPairs` over the union corpus: rarity-ordered prefix
  * inverted index — different candidate machinery end to end) with the
  * order-free drop rule applied relationally to its pair set. Agreement
  * at 10x occupancy is direct evidence the banding recall holds as
  * buckets fill.
  */
object CrossCheck {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CrossCheck <sfDir> <check ...>")
    val dir = args(0)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    args.drop(1).foreach {
      case "incremental_near" =>
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select("doc_id", "text")
        val corpus = docs.filter(col("doc_id") % 3 =!= 0)
        val incoming = docs.filter(col("doc_id") % 3 === 0)
        val viaLsh = Dedup.incrementalNearDupNew(corpus, incoming,
          "doc_id", "text", k = 3, threshold = 0.8)
          .select("doc_id")
        // independent path: exact PPJoin pairs over the union, rule in SQL
        val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          k = 3, threshold = 0.8)
        val dropped = pairs
          .select(col("id_a").as("x"), col("id_b").as("i"))
          .unionByName(pairs.select(col("id_b").as("x"), col("id_a").as("i")))
          .filter(col("i") % 3 === 0 && // incoming member of the pair
            (col("x") % 3 =!= 0 || col("x") < col("i"))) // corpus, or earlier batch
          .select(col("i").as("doc_id")).distinct()
        val viaExact = incoming.select("doc_id")
          .join(dropped, Seq("doc_id"), "left_anti")
        val l = viaLsh.collect().map(_.getLong(0)).toSet
        val e = viaExact.collect().map(_.getLong(0)).toSet
        val sym = (l diff e) ++ (e diff l)
        println(s"[crosscheck] incremental_near: lsh=${l.size} exact=${e.size} " +
          s"symdiff=${sym.size}${if (sym.nonEmpty) " MISMATCH " + sym.take(20) else " OK"}")
        if (sym.nonEmpty) sys.exit(1)
      case "incremental_near_indexed" =>
        // the persisted-index path (build -> write -> read -> probe) must
        // reproduce the direct path's admit set at 10x corpus scale —
        // exercises parquet round-trip of 50k shingle sets + band layout
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select("doc_id", "text")
        val corpus = docs.filter(col("doc_id") % 3 =!= 0)
        val incoming = docs.filter(col("doc_id") % 3 === 0)
        val direct = Dedup.incrementalNearDupNew(corpus, incoming,
          "doc_id", "text").select("doc_id")
          .collect().map(_.getLong(0)).toSet
        val ixDir = java.nio.file.Files.createTempDirectory("graft-ndix").toString
        Dedup.writeNearDupIndex(
          Dedup.buildNearDupIndex(corpus, "doc_id", "text"), ixDir)
        val viaIx = Dedup.incrementalNearDupNewFromIndex(
          Dedup.readNearDupIndex(spark, ixDir), incoming, "doc_id", "text")
          .select("doc_id").collect().map(_.getLong(0)).toSet
        val sym = (direct diff viaIx) ++ (viaIx diff direct)
        println(s"[crosscheck] incremental_near_indexed: direct=${direct.size} " +
          s"indexed=${viaIx.size} symdiff=${sym.size}" +
          s"${if (sym.nonEmpty) " MISMATCH " + sym.take(20) else " OK"}")
        if (sym.nonEmpty) sys.exit(1)
      case other => sys.error(s"unknown check: $other")
    }
    spark.stop()
  }
}
