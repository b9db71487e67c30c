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
  *
  * `secondary_index`: the registered-index read path against a full
  * resolved scan + relational predicate on a salted + indexed table,
  * with updates/deletes injected so stale index entries exist — direct
  * evidence the verified read eliminates them at sf1 row counts.
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
      case "keep_best" =>
        // dedup_keep_best at scale: the gate's own path (size-gated
        // DRIVER union-find labels + row_number window argmax) against an
        // independent twin — the DISTRIBUTED label-propagation fixpoint
        // (driverCloseMaxEdges = 0 forces it) + min_by-struct selection.
        // Agreement verifies both cluster labelings AND both per-cluster
        // argmax mechanisms pick identical survivors; the pair machinery
        // is shared (its own gate + the incremental_near check cover it).
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          k = 3, threshold = 0.8)
        val viaGate = Dedup.keepBest(docs, "doc_id", pairs, col("n_chars"))
          .select("doc_id")
        val labels = Dedup.connectedComponents(
          docs.select(col("doc_id").as("id")), pairs,
          driverCloseMaxEdges = 0L)
        // winner = ORDER BY n_chars DESC, doc_id ASC == min of the
        // (-n_chars, doc_id) struct (lexicographic struct ordering)
        val viaTwin = docs
          .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"))
          .groupBy("cluster")
          .agg(min_by(col("doc_id"),
            struct((-col("n_chars")).as("s"), col("doc_id").as("i")))
            .as("doc_id"))
          .select("doc_id")
        val gset = viaGate.collect().map(_.getLong(0)).toSet
        val tset = viaTwin.collect().map(_.getLong(0)).toSet
        val symKb = (gset diff tset) ++ (tset diff gset)
        println(s"[crosscheck] keep_best: gate=${gset.size} twin=${tset.size} " +
          s"symdiff=${symKb.size}${if (symKb.nonEmpty) " MISMATCH " + symKb.take(20) else " OK"}")
        if (symKb.nonEmpty) sys.exit(1)

      case "secondary_index" =>
        // The registered-index read path (probe -> size-gated gather ->
        // verified read) against the reference-shaped direct path (full
        // resolved scan -> relational predicate) on a SALTED + INDEXED
        // catalog table at this sf — with 1% custkey UPDATES and 1%
        // family DELETES injected first, so the index carries stale
        // entries and the check validates exactly the stale-hit
        // elimination DuckDB can't reach at this scale.
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        import graft.core.{Bytes, CellCodec}
        import graft.read.Scan
        import graft.write.Mutations
        import org.apache.spark.sql.types.{LongType, StructField, StructType}
        val orders = spark.read.parquet(s"$dir/orders.parquet")
        val root = java.nio.file.Files.createTempDirectory("graft-ixcc").toString
        val g = Graft(spark, root)
        g.createTable(TableDescriptor("o", Seq(FamilyDescriptor("o")),
          splitKeys = 32, saltBuckets = 16), nowMs = 1L)
        val cells = CellCodec.encode(orders, "o", Seq("o_orderkey"))
        g.table("o").mutate(cells, nowMs = 1L)
        g.createIndex("o", "o", Bytes.toBytes("o_custkey"), nowMs = 2L)
        val custCells = cells
          .filter(col("qualifier") === lit(Bytes.toBytes("o_custkey")))
        val updates = custCells
          .filter(pmod(xxhash64(col("row")), lit(100)) === 1)
          .withColumn("ts", lit(5L))
          .withColumn("value",
            CellCodec.longBytes(Bytes.asLong(col("value")) + 1))
        val deletes = Mutations.deleteFamilyCells(
          custCells.filter(pmod(xxhash64(col("row")), lit(100)) === 2)
            .select("row").distinct(),
          col("row"), "o", ts = 5L)
        g.table("o").mutate(updates.unionByName(deletes), nowMs = 5L)
        val keys = (1L to 50L).toSeq
        val custQ = Bytes.toBytes("o_custkey")
        val schema = StructType(Seq(StructField("o_custkey", LongType)))
        val viaIndex = CellCodec.decode(
          g.table("o").indexLookup("o", custQ, keys.map(Bytes.toBytes)),
          schema, key = Seq("o_orderkey" -> LongType))
          .select("o_orderkey").collect().map(_.getLong(0)).toSet
        val direct = CellCodec.decode(
          g.table("o").scan(Scan().addColumn("o", custQ)),
          schema, key = Seq("o_orderkey" -> LongType))
          .filter(col("o_custkey").isin(keys: _*))
          .select("o_orderkey").collect().map(_.getLong(0)).toSet
        val sym = (viaIndex diff direct) ++ (direct diff viaIndex)
        println(s"[crosscheck] secondary_index: index=${viaIndex.size} " +
          s"direct=${direct.size} symdiff=${sym.size}" +
          s"${if (sym.nonEmpty) " MISMATCH " + sym.take(20) else " OK"}")
        if (sym.nonEmpty) sys.exit(1)
      case "covered_index" =>
        // The COVERED read path (index table alone, no main-table touch,
        // delete tombstones translated synchronously — no rebuild run)
        // against the direct path (full resolved scan -> relational
        // predicate) on an immutableRows table at this sf, with 1%
        // family DELETES injected after the index build. Tuples compare
        // (key, custkey, totalprice), not just ids — the covered VALUES
        // themselves are what the no-verify path must get right.
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        import graft.core.{Bytes, CellCodec}
        import graft.read.Scan
        import graft.write.Mutations
        import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
        val orders = spark.read.parquet(s"$dir/orders.parquet")
        val root = java.nio.file.Files.createTempDirectory("graft-covcc").toString
        val g = Graft(spark, root)
        g.createTable(TableDescriptor("o", Seq(FamilyDescriptor("o")),
          splitKeys = 32, immutableRows = true), nowMs = 1L)
        val cells = CellCodec.encode(orders, "o", Seq("o_orderkey"))
        g.table("o").mutate(cells, nowMs = 1L)
        val custQ = Bytes.toBytes("o_custkey")
        g.createIndex("o", "o", custQ, nowMs = 2L,
          covered = Seq("o" -> Bytes.toBytes("o_totalprice")))
        val deletes = Mutations.deleteFamilyCells(
          cells.filter(pmod(xxhash64(col("row")), lit(100)) === 2)
            .select("row").distinct(),
          col("row"), "o", ts = 5L)
        g.table("o").mutate(deletes, nowMs = 5L)
        val keys = (1L to 50L).toSeq
        val schema = StructType(Seq(StructField("o_custkey", LongType),
          StructField("o_totalprice", DoubleType)))
        def tuples(df: org.apache.spark.sql.DataFrame) =
          df.select("o_orderkey", "o_custkey", "o_totalprice").collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val viaCovered = tuples(CellCodec.decode(
          g.table("o").indexLookupCovered("o", custQ, keys.map(Bytes.toBytes)),
          schema, key = Seq("o_orderkey" -> LongType)))
        val direct = tuples(CellCodec.decode(
          g.table("o").scan(Scan().addColumn("o", custQ)
            .addColumn("o", Bytes.toBytes("o_totalprice"))),
          schema, key = Seq("o_orderkey" -> LongType))
          .filter(col("o_custkey").isin(keys: _*)))
        val sym = (viaCovered diff direct) ++ (direct diff viaCovered)
        println(s"[crosscheck] covered_index: covered=${viaCovered.size} " +
          s"direct=${direct.size} symdiff=${sym.size}" +
          s"${if (sym.nonEmpty) " MISMATCH " + sym.take(20) else " OK"}")
        if (sym.nonEmpty) sys.exit(1)
        // phase 2: covered vs the VERIFIED gather route (independent
        // in-engine machinery end to end: reshape-from-index vs
        // probe+gather+main-table verify) on the same post-delete state
        val viaVerified = tuples(CellCodec.decode(
          g.table("o").indexLookup("o", custQ, keys.map(Bytes.toBytes)),
          schema, key = Seq("o_orderkey" -> LongType)))
        val sym2 = (viaCovered diff viaVerified) ++ (viaVerified diff viaCovered)
        println(s"[crosscheck] covered_vs_verified: covered=${viaCovered.size} " +
          s"verified=${viaVerified.size} symdiff=${sym2.size}" +
          s"${if (sym2.nonEmpty) " MISMATCH " + sym2.take(20) else " OK"}")
        if (sym2.nonEmpty) sys.exit(1)
        // phase 3: REBUILD (majorCompact -> index GC), another delete
        // batch on top, then covered vs direct again — the delete
        // translation must stay exact across a rebuilt index
        g.table("o").majorCompact(nowMs = 6L)
        val deletes2 = Mutations.deleteFamilyCells(
          cells.filter(pmod(xxhash64(col("row")), lit(100)) === 3)
            .select("row").distinct(),
          col("row"), "o", ts = 7L)
        g.table("o").mutate(deletes2, nowMs = 7L)
        val viaCovered3 = tuples(CellCodec.decode(
          g.table("o").indexLookupCovered("o", custQ, keys.map(Bytes.toBytes)),
          schema, key = Seq("o_orderkey" -> LongType)))
        val direct3 = tuples(CellCodec.decode(
          g.table("o").scan(Scan().addColumn("o", custQ)
            .addColumn("o", Bytes.toBytes("o_totalprice"))),
          schema, key = Seq("o_orderkey" -> LongType))
          .filter(col("o_custkey").isin(keys: _*)))
        val sym3 = (viaCovered3 diff direct3) ++ (direct3 diff viaCovered3)
        println(s"[crosscheck] covered_post_rebuild: covered=${viaCovered3.size} " +
          s"direct=${direct3.size} symdiff=${sym3.size}" +
          s"${if (sym3.nonEmpty) " MISMATCH " + sym3.take(20) else " OK"}")
        if (sym3.nonEmpty) sys.exit(1)
      case "composite_index" =>
        // Composite (o_custkey, o_orderstatus) lookup vs the direct
        // two-predicate relational path at this sf, with deletes injected
        // so stale tuple entries exist for the verify to eliminate.
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        import graft.core.{Bytes, CellCodec}
        import graft.read.Scan
        import graft.write.Mutations
        import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
        val orders = spark.read.parquet(s"$dir/orders.parquet")
        val root = java.nio.file.Files.createTempDirectory("graft-cixcc").toString
        val g = Graft(spark, root)
        g.createTable(TableDescriptor("o", Seq(FamilyDescriptor("o")),
          splitKeys = 32, immutableRows = true), nowMs = 1L)
        val cells = CellCodec.encode(orders, "o", Seq("o_orderkey"))
        g.table("o").mutate(cells, nowMs = 1L)
        val cols = Seq("o" -> Bytes.toBytes("o_custkey"),
          "o" -> Bytes.toBytes("o_orderstatus"))
        g.createCompositeIndex("o", cols, nowMs = 2L)
        val deletes = Mutations.deleteFamilyCells(
          cells.filter(pmod(xxhash64(col("row")), lit(100)) === 2)
            .select("row").distinct(),
          col("row"), "o", ts = 5L)
        g.table("o").mutate(deletes, nowMs = 5L)
        val keys = (1L to 10L).toSeq
        val schema = StructType(Seq(StructField("o_custkey", LongType),
          StructField("o_orderstatus", StringType)))
        val viaIx = keys.flatMap { k =>
          CellCodec.decode(
            g.table("o").indexLookupComposite(cols,
              Seq(Bytes.toBytes(k), Bytes.toBytes("O"))),
            schema, key = Seq("o_orderkey" -> LongType))
            .select("o_orderkey").collect().map(_.getLong(0))
        }.toSet
        val direct = CellCodec.decode(
          g.table("o").scan(Scan().addColumn("o", Bytes.toBytes("o_custkey"))
            .addColumn("o", Bytes.toBytes("o_orderstatus"))),
          schema, key = Seq("o_orderkey" -> LongType))
          .filter(col("o_custkey").isin(keys: _*) &&
            col("o_orderstatus") === "O")
          .select("o_orderkey").collect().map(_.getLong(0)).toSet
        val sym = (viaIx diff direct) ++ (direct diff viaIx)
        println(s"[crosscheck] composite_index: index=${viaIx.size} " +
          s"direct=${direct.size} symdiff=${sym.size}" +
          s"${if (sym.nonEmpty) " MISMATCH " + sym.take(20) else " OK"}")
        if (sym.nonEmpty) sys.exit(1)
      case "composite_in" =>
        // r10: the IN-list composite route (ONE lookupCompositeAll pass
        // over the member cartesian) against BOTH the per-value probe
        // loop (independent probe machinery: k single-blob gathers) and
        // the direct relational path, with deletes injected. Three-way
        // agreement at this sf is the evidence that the cartesian probe
        // + per-member-list verify is exactly the union of single-value
        // probes.
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        import graft.core.{Bytes, CellCodec}
        import graft.read.{Scan, SecondaryIndex}
        import graft.write.Mutations
        import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
        val orders = spark.read.parquet(s"$dir/orders.parquet")
        val root = java.nio.file.Files.createTempDirectory("graft-cincc").toString
        val g = Graft(spark, root)
        g.createTable(TableDescriptor("o", Seq(FamilyDescriptor("o")),
          splitKeys = 32, immutableRows = true), nowMs = 1L)
        val cells = CellCodec.encode(orders, "o", Seq("o_orderkey"))
        g.table("o").mutate(cells, nowMs = 1L)
        val cols = Seq("o" -> Bytes.toBytes("o_custkey"),
          "o" -> Bytes.toBytes("o_orderstatus"))
        val ix = g.createCompositeIndex("o", cols, nowMs = 2L)
        g.table("o").mutate(Mutations.deleteFamilyCells(
          cells.filter(pmod(xxhash64(col("row")), lit(100)) === 2)
            .select("row").distinct(),
          col("row"), "o", ts = 5L), nowMs = 5L)
        val keys = (1L to 20L).toSeq
        val schema = StructType(Seq(StructField("o_custkey", LongType),
          StructField("o_orderstatus", StringType)))
        def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
          df.select("o_orderkey").collect().map(_.getLong(0)).toSet
        val viaIn = ids(CellCodec.decode(
          SecondaryIndex.lookupCompositeAll(g.table("o").logicalCells,
            g.catalog.read(ix.indexTable), ix.columns,
            Seq(keys.map(Bytes.toBytes), Seq(Bytes.toBytes("O")))),
          schema, key = Seq("o_orderkey" -> LongType)))
        val viaLoop = keys.flatMap { k =>
          ids(CellCodec.decode(
            g.table("o").indexLookupComposite(cols,
              Seq(Bytes.toBytes(k), Bytes.toBytes("O"))),
            schema, key = Seq("o_orderkey" -> LongType)))
        }.toSet
        val direct = ids(CellCodec.decode(
          g.table("o").scan(Scan().addColumn("o", Bytes.toBytes("o_custkey"))
            .addColumn("o", Bytes.toBytes("o_orderstatus"))),
          schema, key = Seq("o_orderkey" -> LongType))
          .filter(col("o_custkey").isin(keys: _*) &&
            col("o_orderstatus") === "O"))
        val symA = (viaIn diff viaLoop) ++ (viaLoop diff viaIn)
        val symB = (viaIn diff direct) ++ (direct diff viaIn)
        println(s"[crosscheck] composite_in: in=${viaIn.size} " +
          s"loop=${viaLoop.size} direct=${direct.size} " +
          s"symdiff=${symA.size + symB.size}" +
          s"${if (symA.nonEmpty || symB.nonEmpty)
            " MISMATCH " + (symA ++ symB).take(20) else " OK"}")
        if (symA.nonEmpty || symB.nonEmpty) sys.exit(1)
      case "double_range" =>
        // r10: the ordered-double (odouble) range route — values stored
        // in the sign-flip encoding, an interval served by the index
        // range probe — against the direct path (full resolved scan,
        // decode, relational double predicate), with 1% updates and 1%
        // deletes injected so stale entries exist inside the interval.
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        import graft.core.{Bytes, CellCodec}
        import graft.read.Scan
        import graft.write.Mutations
        import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
        val orders = spark.read.parquet(s"$dir/orders.parquet")
        val root = java.nio.file.Files.createTempDirectory("graft-odcc").toString
        val g = Graft(spark, root)
        g.createTable(TableDescriptor("o", Seq(FamilyDescriptor("o")),
          splitKeys = 32), nowMs = 1L)
        val priceQ = Bytes.toBytes("o_totalprice")
        val cells = CellCodec.encode(orders, "o", Seq("o_orderkey"),
          ordered = Set("o_totalprice"))
        g.table("o").mutate(cells, nowMs = 1L)
        g.createIndex("o", "o", priceQ, nowMs = 2L)
        val priceCells = cells
          .filter(col("qualifier") === lit(priceQ))
        val updates = priceCells
          .filter(pmod(xxhash64(col("row")), lit(100)) === 1)
          .withColumn("ts", lit(5L))
          .withColumn("value",
            CellCodec.doubleBytesOrdered(
              graft.core.Bytes.asDoubleOrdered(col("value")) + lit(100000.0)))
        val deletes = Mutations.deleteFamilyCells(
          priceCells.filter(pmod(xxhash64(col("row")), lit(100)) === 2)
            .select("row").distinct(),
          col("row"), "o", ts = 5L)
        g.table("o").mutate(updates.unionByName(deletes), nowMs = 5L)
        val (lo, hi) = (10000.0, 20000.0)
        val schema = StructType(Seq(StructField("o_totalprice", DoubleType)))
        def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
          df.select("o_orderkey").collect().map(_.getLong(0)).toSet
        val viaIx = ids(CellCodec.decode(
          g.table("o").indexLookupRange("o", priceQ,
            Some(Bytes.toBytesOrdered(lo)), Some(Bytes.toBytesOrdered(hi))),
          schema, key = Seq("o_orderkey" -> LongType),
          ordered = Set("o_totalprice")))
        val direct = ids(CellCodec.decode(
          g.table("o").scan(Scan().addColumn("o", priceQ)),
          schema, key = Seq("o_orderkey" -> LongType),
          ordered = Set("o_totalprice"))
          .filter(col("o_totalprice") >= lo && col("o_totalprice") < hi))
        val sym = (viaIx diff direct) ++ (direct diff viaIx)
        println(s"[crosscheck] double_range: index=${viaIx.size} " +
          s"direct=${direct.size} symdiff=${sym.size}" +
          s"${if (sym.nonEmpty) " MISMATCH " + sym.take(20) else " OK"}")
        if (sym.nonEmpty) sys.exit(1)
      case "prefix_route" =>
        // r10: the value-prefix route (indexLookupPrefix — one
        // [p, prefixSuccessor(p)) probe) against the direct path (full
        // resolved scan + startsWith on the decoded string), on the
        // customer table ('Customer#' + 9 digits: dropping the last
        // digit makes each prefix a selective 10-customer decade), with
        // 1% name updates injected so stale prefix entries exist.
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        import graft.core.{Bytes, CellCodec}
        import graft.read.Scan
        import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
        val customer = spark.read.parquet(s"$dir/customer.parquet")
        val root = java.nio.file.Files.createTempDirectory("graft-pfcc").toString
        val g = Graft(spark, root)
        g.createTable(TableDescriptor("c", Seq(FamilyDescriptor("c")),
          splitKeys = 32), nowMs = 1L)
        val nameQ = Bytes.toBytes("c_name")
        val cells = CellCodec.encode(customer, "c", Seq("c_custkey"))
        g.table("c").mutate(cells, nowMs = 1L)
        g.createIndex("c", "c", nameQ, nowMs = 2L)
        // 1% name updates: stale prefix entries inside probed ranges
        val nameCells = cells.filter(col("qualifier") === lit(nameQ))
        val updates = nameCells
          .filter(pmod(xxhash64(col("row")), lit(100)) === 1)
          .withColumn("ts", lit(5L))
          .withColumn("value", lit(Bytes.toBytes("Customer#999999999")))
        g.table("c").mutate(updates, nowMs = 5L)
        // Probe prefixes come from the DATA (deterministic picks over a
        // key-ordered bounded sample), not from a synthesized key format
        // — scaled corpora shift keys into ranges where a formatted
        // guess matches nothing and the sweep would die vacuous.
        val names = customer.orderBy("c_custkey").select("c_name")
          .limit(5000).collect().map(_.getString(0))
        val schema = StructType(Seq(StructField("c_name", StringType)))
        def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
          df.select("c_custkey").collect().map(_.getLong(0)).toSet
        var checked = 0L
        (1 to 5).foreach { i =>
          val pick = names(
            ((i * 6364136223846793005L >>> 33) % names.length).toInt)
          val p = pick.dropRight(1)
          val viaIx = ids(CellCodec.decode(
            g.table("c").indexLookupPrefix("c", nameQ, Bytes.toBytes(p)),
            schema, key = Seq("c_custkey" -> LongType)))
          val direct = ids(CellCodec.decode(
            g.table("c").scan(Scan().addColumn("c", nameQ)),
            schema, key = Seq("c_custkey" -> LongType))
            .filter(col("c_name").startsWith(p)))
          val sym = (viaIx diff direct) ++ (direct diff viaIx)
          checked += direct.size
          println(s"[crosscheck] prefix_route '$p': index=${viaIx.size} " +
            s"direct=${direct.size} symdiff=${sym.size}" +
            s"${if (sym.nonEmpty) " MISMATCH " + sym.take(20) else " OK"}")
          if (sym.nonEmpty) sys.exit(1)
        }
        // a zero-hit sweep would be a vacuous pass (wrong column/format)
        require(checked > 0, "prefix_route probed nothing — fixture drift?")
      case "or_route" =>
        // r11: OR-of-probes (one probeOr pass over an equality arm + a
        // range arm on the indexed string column) against the direct
        // path (full resolved scan + decoded disjunction), with 1% name
        // updates and 1% deletes injected so stale entries and
        // tombstones sit inside the probed ranges — evidence the
        // verified multi-arm read eliminates them at sf1 row counts.
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        import graft.core.{Bytes, CellCodec}
        import graft.read.{Scan, SecondaryIndex}
        import graft.write.Mutations
        import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
        val customer = spark.read.parquet(s"$dir/customer.parquet")
        val root = java.nio.file.Files.createTempDirectory("graft-orcc").toString
        val g = Graft(spark, root)
        g.createTable(TableDescriptor("c", Seq(FamilyDescriptor("c")),
          splitKeys = 32), nowMs = 1L)
        val nameQ = Bytes.toBytes("c_name")
        val cells = CellCodec.encode(customer, "c", Seq("c_custkey"))
        g.table("c").mutate(cells, nowMs = 1L)
        val ix = g.createIndex("c", "c", nameQ, nowMs = 2L)
        val nameCells = cells.filter(col("qualifier") === lit(nameQ))
        val updates = nameCells
          .filter(pmod(xxhash64(col("row")), lit(100)) === 1)
          .withColumn("ts", lit(5L))
          .withColumn("value", lit(Bytes.toBytes("Customer#999999999")))
        val deletes = Mutations.deleteFamilyCells(
          nameCells.filter(pmod(xxhash64(col("row")), lit(100)) === 2)
            .select("row").distinct(),
          col("row"), "c", ts = 5L)
        g.table("c").mutate(updates.unionByName(deletes), nowMs = 5L)
        // arms from the DATA: an equality on one sampled name + a range
        // over a sampled decade (drop the name's last digit)
        val sampled = g.table("c")
          .scan(Scan().addColumn("c", nameQ))
          .orderBy("row").limit(50)
          .collect().map(r => new String(r.getAs[Array[Byte]]("value"), "UTF-8"))
        val eqName = sampled(7)
        val decade = sampled(23).dropRight(1)
        val arms = Seq(
          SecondaryIndex.ArmIn(Seq(Bytes.toBytes(eqName))),
          SecondaryIndex.ArmRange(Some(Bytes.toBytes(decade)),
            Bytes.prefixSuccessor(Bytes.toBytes(decade))))
        val schema = StructType(Seq(StructField("c_name", StringType)))
        def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
          df.select("c_custkey").collect().map(_.getLong(0)).toSet
        val logical = g.table("c").cells
        val viaIx = ids(CellCodec.decode(
          SecondaryIndex.lookupOr(logical, g.catalog.read(ix.indexTable),
            "c", nameQ, arms),
          schema, key = Seq("c_custkey" -> LongType)))
        val direct = ids(CellCodec.decode(
          g.table("c").scan(Scan().addColumn("c", nameQ)),
          schema, key = Seq("c_custkey" -> LongType))
          .filter(col("c_name") === eqName ||
            col("c_name").startsWith(decade)))
        val symOr = (viaIx diff direct) ++ (direct diff viaIx)
        println(s"[crosscheck] or_route eq='$eqName' range='$decade*': " +
          s"index=${viaIx.size} direct=${direct.size} symdiff=${symOr.size}" +
          s"${if (symOr.nonEmpty) " MISMATCH " + symOr.take(20) else " OK"}")
        require(direct.nonEmpty, "or_route matched nothing — fixture drift?")
        if (symOr.nonEmpty) sys.exit(1)
      case "cross_or" =>
        // r12: CROSS-column OR routing (the union of per-column probeOr
        // passes through TWO indexes, deduped by row key, one gather)
        // against the direct path (full resolved wide scan + relational
        // disjunction), with 1% updates and 1% deletes injected so stale
        // index entries and tombstones sit inside both columns' probed
        // ranges at sf1 row counts.
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        import graft.core.{Bytes, CellCodec}
        import graft.write.Mutations
        val orders = spark.read.parquet(s"$dir/orders.parquet")
        val root = java.nio.file.Files.createTempDirectory("graft-xocc").toString
        val g = Graft(spark, root)
        g.createTable(TableDescriptor("o", Seq(FamilyDescriptor("o")),
          splitKeys = 32, wideKey = Some("o_orderkey:long"),
          wideSchema =
            Some("o:o_custkey:long;o:o_orderstatus:string")), nowMs = 1L)
        val cells = CellCodec.encode(orders, "o", Seq("o_orderkey"))
        g.table("o").mutate(cells, nowMs = 1L)
        g.createIndex("o", "o", Bytes.toBytes("o_custkey"), nowMs = 2L)
        g.createIndex("o", "o", Bytes.toBytes("o_orderstatus"), nowMs = 2L)
        // 1% custkey updates (move rows OUT of the probed custkey set —
        // their stale index entries must not resurface) + 1% deletes
        val ckQ = Bytes.toBytes("o_custkey")
        val ckCells = cells.filter(col("qualifier") === lit(ckQ))
        g.table("o").mutate(
          ckCells.filter(pmod(xxhash64(col("row")), lit(100)) === 1)
            .withColumn("ts", lit(5L))
            .withColumn("value", lit(Bytes.toBytes(999999999L)))
            .unionByName(Mutations.deleteFamilyCells(
              ckCells.filter(pmod(xxhash64(col("row")), lit(100)) === 2)
                .select("row").distinct(),
              col("row"), "o", ts = 5L)), nowMs = 5L)
        spark.conf.set("spark.sql.catalog.graft_xocc",
          classOf[graft.sql.GraftSqlCatalog].getName)
        spark.conf.set("spark.sql.catalog.graft_xocc.root", root)
        val q = """SELECT o_orderkey, o_custkey, o_orderstatus
                   FROM graft_xocc.`o$wide`
                   WHERE o_custkey IN (7, 37, 73) OR o_orderstatus = 'P'"""
        def xrows(df: org.apache.spark.sql.DataFrame)
            : Set[(Long, Long, String)] =
          df.collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getString(2))).toSet
        val routedDf = spark.sql(q)
        val viaRoute = xrows(routedDf)
        // seam: the executed frame really routed the cross-column union
        // of BOTH indexes
        require(graft.sql.GraftWideSeams.crossOrIndexTables(routedDf)
          .size == 2, "cross-OR route missing: " +
          graft.sql.GraftWideSeams.crossOrIndexTables(routedDf))
        import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
        val direct = xrows(CellCodec.decode(
          g.table("o").scan(graft.read.Scan()
            .addColumn("o", ckQ).addColumn("o", Bytes.toBytes("o_orderstatus"))),
          StructType(Seq(
            StructField("o_custkey", LongType),
            StructField("o_orderstatus", StringType))),
          key = Seq("o_orderkey" -> LongType))
          .filter(col("o_custkey").isin(7L, 37L, 73L) ||
            col("o_orderstatus") === "P"))
        val symX = (viaRoute diff direct) ++ (direct diff viaRoute)
        println(s"[crosscheck] cross_or: routed=${viaRoute.size} " +
          s"direct=${direct.size} symdiff=${symX.size}" +
          s"${if (symX.nonEmpty) " MISMATCH " + symX.take(20) else " OK"}")
        require(direct.nonEmpty, "cross_or matched nothing — fixture drift?")
        if (symX.nonEmpty) sys.exit(1)
        // Conjunct twin on the same mutated fixture (r12 routed the And
        // disjunct by ONE conjunct's superset arm; r13 probes BOTH
        // indexed conjuncts and INTERSECTS their candidate row keys
        // before the gather — smaller fetched superset, same residual
        // exactness over the stale-entry + tombstone state).
        val qc = """SELECT o_orderkey, o_custkey, o_orderstatus
                    FROM graft_xocc.`o$wide`
                    WHERE (o_orderstatus = 'P' AND o_custkey IN (7, 37))
                       OR o_custkey = 73"""
        val conjDf = spark.sql(qc)
        val viaConj = xrows(conjDf)
        val conjMembers = graft.sql.GraftWideSeams.crossOrMemberTables(conjDf)
        require(conjMembers.exists(_.distinct.sizeIs == 2) &&
          conjMembers.flatten.distinct.sizeIs == 2,
          s"conjunct-intersect route missing: $conjMembers")
        val directC = xrows(CellCodec.decode(
          g.table("o").scan(graft.read.Scan()
            .addColumn("o", ckQ).addColumn("o", Bytes.toBytes("o_orderstatus"))),
          StructType(Seq(
            StructField("o_custkey", LongType),
            StructField("o_orderstatus", StringType))),
          key = Seq("o_orderkey" -> LongType))
          .filter((col("o_orderstatus") === "P" &&
            col("o_custkey").isin(7L, 37L)) || col("o_custkey") === 73L))
        val symC = (viaConj diff directC) ++ (directC diff viaConj)
        println(s"[crosscheck] cross_or(conjunct): routed=${viaConj.size} " +
          s"direct=${directC.size} symdiff=${symC.size}" +
          s"${if (symC.nonEmpty) " MISMATCH " + symC.take(20) else " OK"}")
        require(directC.nonEmpty, "conjunct twin matched nothing — drift?")
        if (symC.nonEmpty) sys.exit(1)
        // r12 MIXED key/value twin on the same fixture: a RowFilter-OR-
        // SCVF disjunction — the key disjunct reads its row range off
        // the cell scan, the custkey disjunct probes the index for rows
        // OUTSIDE that range, one resolution pass; the 1% updates +
        // deletes sit inside both branches.
        val komax = orders.agg(max(col("o_orderkey"))).head.getLong(0)
        val qm = s"""SELECT o_orderkey, o_custkey, o_orderstatus
                     FROM graft_xocc.`o$$wide`
                     WHERE o_orderkey < ${komax / 100}
                        OR o_custkey IN (7, 37, 73)"""
        val mixDf = spark.sql(qm)
        val viaMix = xrows(mixDf)
        require(graft.sql.GraftWideSeams.mixedOrShapes(mixDf)
          .exists(s => s._1 >= 1 && s._2.nonEmpty),
          "mixed key/value OR did not route: " +
            graft.sql.GraftWideSeams.mixedOrShapes(mixDf))
        val directM = xrows(CellCodec.decode(
          g.table("o").scan(graft.read.Scan()
            .addColumn("o", ckQ).addColumn("o", Bytes.toBytes("o_orderstatus"))),
          StructType(Seq(
            StructField("o_custkey", LongType),
            StructField("o_orderstatus", StringType))),
          key = Seq("o_orderkey" -> LongType))
          .filter(col("o_orderkey") < komax / 100 ||
            col("o_custkey").isin(7L, 37L, 73L)))
        val symM = (viaMix diff directM) ++ (directM diff viaMix)
        println(s"[crosscheck] cross_or(mixed): routed=${viaMix.size} " +
          s"direct=${directM.size} symdiff=${symM.size}" +
          s"${if (symM.nonEmpty) " MISMATCH " + symM.take(20) else " OK"}")
        require(directM.nonEmpty, "mixed twin matched nothing — drift?")
        if (symM.nonEmpty) sys.exit(1)
      case "guard_histogram" =>
        // r15: HISTOGRAM-vouched routing at scale — a selective equality
        // (a derived custkey-digit column, 10% of orders; the corpus's
        // natural categoricals are uniform thirds, all anti-selective)
        // whose hit count exceeds a forced-low probe budget (the shape
        // r14's exhaustion rule surrendered) must ROUTE via the
        // persisted histogram's upper bound and still answer exactly
        // against the direct resolved scan, with 1% digit UPDATES (rows
        // moved OUT of the probed value — stale entries the verified
        // read must drop) and 1% deletes injected. At sf1 the index
        // (1.5M entries) exceeds the histogram sample target, so this
        // exercises the SAMPLED (DKW-margin) bounds — the gates at
        // sf0.01 cover the exact-boundary regime. The route assertion
        // is the evidence-integrity half: hits >> budget and the span
        // estimate never vouches, so a silently-declined plan — which
        // would also match — cannot pass.
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        import graft.core.{Bytes, CellCodec}
        import graft.write.Mutations
        import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
        val orders = spark.read.parquet(s"$dir/orders.parquet")
        val root = java.nio.file.Files.createTempDirectory("graft-ghcc").toString
        val g = Graft(spark, root)
        g.createTable(TableDescriptor("o", Seq(FamilyDescriptor("o")),
          splitKeys = 32, wideKey = Some("o_orderkey:long"),
          wideSchema =
            Some("o:o_custkey:long;o:ckd:string")), nowMs = 1L)
        val cells = CellCodec.encode(
          orders.select(col("o_orderkey"), col("o_custkey"),
            pmod(col("o_custkey"), lit(10L)).cast(StringType).as("ckd")),
          "o", Seq("o_orderkey"))
        g.table("o").mutate(cells, nowMs = 1L)
        val ckdQ = Bytes.toBytes("ckd")
        g.createIndex("o", "o", ckdQ, nowMs = 2L)
        val ckdCells = cells.filter(col("qualifier") === lit(ckdQ))
        g.table("o").mutate(
          ckdCells.filter(pmod(xxhash64(col("row")), lit(100)) === 1)
            .withColumn("ts", lit(5L))
            .withColumn("value", lit(Bytes.toBytes("X")))
            .unionByName(Mutations.deleteFamilyCells(
              ckdCells.filter(pmod(xxhash64(col("row")), lit(100)) === 2)
                .select("row").distinct(),
              col("row"), "o", ts = 5L)), nowMs = 5L)
        val ixm = g.catalog.currentManifest(
          g.catalog.currentManifest("o").descriptor.indexes.head.indexTable)
        require(ixm.stats.exists(_.histogram.nonEmpty),
          "index build did not persist a histogram — fixture drift?")
        spark.conf.set("spark.sql.catalog.graft_ghcc",
          classOf[graft.sql.GraftSqlCatalog].getName)
        spark.conf.set("spark.sql.catalog.graft_ghcc.root", root)
        spark.conf.set("spark.graft.route.guard.minIndexRows", "0")
        spark.conf.set("spark.graft.route.guard.maxProbeRows", "64")
        try {
          val q = """SELECT o_orderkey, o_custkey, ckd
                     FROM graft_ghcc.`o$wide`
                     WHERE ckd = '7'"""
          def ghRows(df: org.apache.spark.sql.DataFrame)
              : Set[(Long, Long, String)] =
            df.collect().map(r =>
              (r.getLong(0), r.getLong(1), r.getString(2))).toSet
          val routedDf = spark.sql(q)
          val viaRoute = ghRows(routedDf)
          require(
            graft.sql.GraftWideSeams.usedIndexTables(routedDf).nonEmpty &&
              !graft.sql.GraftRouteSeams.guardDeclined(routedDf),
            "histogram vouch did not route past the forced-low budget")
          require(viaRoute.size > 64,
            "fixture drift: hits must exceed the forced budget so only " +
              "the histogram can have vouched")
          val direct = ghRows(CellCodec.decode(
            g.table("o").scan(graft.read.Scan()
              .addColumn("o", Bytes.toBytes("o_custkey"))
              .addColumn("o", ckdQ)),
            StructType(Seq(
              StructField("o_custkey", LongType),
              StructField("ckd", StringType))),
            key = Seq("o_orderkey" -> LongType))
            .filter(col("ckd") === "7"))
          val symH = (viaRoute diff direct) ++ (direct diff viaRoute)
          println(s"[crosscheck] guard_histogram: routed=${viaRoute.size} " +
            s"direct=${direct.size} symdiff=${symH.size}" +
            s"${if (symH.nonEmpty) " MISMATCH " + symH.take(20) else " OK"}")
          require(direct.nonEmpty, "guard_histogram matched nothing — drift?")
          if (symH.nonEmpty) sys.exit(1)
        } finally {
          spark.conf.unset("spark.graft.route.guard.minIndexRows")
          spark.conf.unset("spark.graft.route.guard.maxProbeRows")
        }
      case "runtime_prune" =>
        // r11: the runtime (join-driven) key prune — GraftRuntimeFilterRule
        // re-pruning a SALTED wide fact scan to a data-derived dim's keys
        // at execution — against the conf-off plain join, with a delete
        // batch injected so resolution matters inside the probed ranges.
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        import graft.core.{Bytes, CellCodec}
        import graft.write.Mutations
        val orders = spark.read.parquet(s"$dir/orders.parquet")
        val root = java.nio.file.Files.createTempDirectory("graft-rtcc").toString
        val g = Graft(spark, root)
        g.createTable(TableDescriptor("o", Seq(FamilyDescriptor("o")),
          splitKeys = 32, saltBuckets = 8,
          wideKey = Some("o_orderkey:long"),
          wideSchema = Some("o:o_custkey:long;o:o_totalprice:double")),
          nowMs = 1L)
        val cells = CellCodec.encode(orders, "o", Seq("o_orderkey"))
        g.table("o").mutate(cells, nowMs = 1L)
        g.table("o").mutate(Mutations.deleteFamilyCells(
          cells.filter(pmod(xxhash64(col("row")), lit(100)) === 3)
            .select("row").distinct(),
          col("row"), "o", ts = 5L), nowMs = 5L)
        spark.conf.set("spark.sql.catalog.graft_rtcc",
          classOf[graft.sql.GraftSqlCatalog].getName)
        spark.conf.set("spark.sql.catalog.graft_rtcc.root", root)
        spark.conf.set("spark.graft.runtimeFilter.maxBuildBytes",
          (512L << 20).toString)
        // dim keys must stay under the runtime key cap at EVERY scale:
        // hash-select ~0.025% of orderkeys (sf-proportional corpora keep
        // the absolute count bounded well below maxKeys at sf1). No
        // LIMIT in the dim — r12's row-selection guard rightly declines
        // limit-bearing dims (the probe and the join could see
        // different rows).
        orders.filter(pmod(xxhash64(col("o_orderkey")), lit(4000)) === 7)
          .select("o_orderkey")
          .createOrReplaceTempView("rtcc_dim")
        val q = """SELECT f.o_orderkey, f.o_custkey, f.o_totalprice
                   FROM graft_rtcc.`o$wide` f
                   JOIN rtcc_dim d ON f.o_orderkey = d.o_orderkey"""
        def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
          df.collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val prunedDf = spark.sql(q)
        val viaPrune = rows(prunedDf)
        require(graft.sql.GraftRuntimeFilter.pruned(prunedDf),
          "runtime filter did not apply — fixture drift?")
        spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
        val viaPlain =
          try rows(spark.sql(q))
          finally spark.conf.set("spark.graft.runtimeFilter.enabled", "true")
        val symRt = (viaPrune diff viaPlain) ++ (viaPlain diff viaPrune)
        println(s"[crosscheck] runtime_prune: pruned=${viaPrune.size} " +
          s"plain=${viaPlain.size} symdiff=${symRt.size}" +
          s"${if (symRt.nonEmpty) " MISMATCH " + symRt.take(20) else " OK"}")
        require(viaPlain.nonEmpty, "runtime_prune joined nothing — drift?")
        if (symRt.nonEmpty) sys.exit(1)

      case "cluster_prune" =>
        // r12: the over-cap CLUSTERED range degradation — a two-cluster
        // dim past the key cap prunes the salted wide fact with
        // gap-separated occupied runs (never a single [min, max] span
        // spanning the hole) — vs the conf-off plain join, with a
        // delete batch injected so resolution matters inside the runs.
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        import graft.core.CellCodec
        import graft.write.Mutations
        val orders = spark.read.parquet(s"$dir/orders.parquet")
        val root = java.nio.file.Files.createTempDirectory("graft-clcc").toString
        val g = Graft(spark, root)
        g.createTable(TableDescriptor("o", Seq(FamilyDescriptor("o")),
          splitKeys = 32, saltBuckets = 8,
          wideKey = Some("o_orderkey:long"),
          wideSchema = Some("o:o_custkey:long;o:o_totalprice:double")),
          nowMs = 1L)
        val cells = CellCodec.encode(orders, "o", Seq("o_orderkey"))
        g.table("o").mutate(cells, nowMs = 1L)
        g.createIndex("o", "o", graft.core.Bytes.toBytes("o_custkey"),
          nowMs = 2L)
        g.table("o").mutate(Mutations.deleteFamilyCells(
          cells.filter(pmod(xxhash64(col("row")), lit(100)) === 3)
            .select("row").distinct(),
          col("row"), "o", ts = 5L), nowMs = 5L)
        spark.conf.set("spark.sql.catalog.graft_clcc",
          classOf[graft.sql.GraftSqlCatalog].getName)
        spark.conf.set("spark.sql.catalog.graft_clcc.root", root)
        spark.conf.set("spark.graft.runtimeFilter.maxBuildBytes",
          (512L << 20).toString)
        // the cap and grid pinned low so the dim is over-cap and the
        // span outsizes the bucket grid at EVERY sf (sf0.001's span is
        // only a few thousand keys)
        spark.conf.set("spark.graft.runtimeFilter.maxKeys", "128")
        spark.conf.set("spark.graft.runtimeFilter.rangeBuckets", "512")
        val kmax = orders.agg(max(col("o_orderkey"))).head.getLong(0)
        orders.filter(col("o_orderkey") < lit(kmax / 20) ||
            (col("o_orderkey") >= lit(kmax / 2) &&
              col("o_orderkey") < lit(kmax / 2 + kmax / 10)))
          .select("o_orderkey")
          .createOrReplaceTempView("clcc_dim")
        val q = """SELECT f.o_orderkey, f.o_custkey, f.o_totalprice
                   FROM graft_clcc.`o$wide` f
                   JOIN clcc_dim d ON f.o_orderkey = d.o_orderkey"""
        def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
          df.collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val prunedDf = spark.sql(q)
        val viaPrune = rows(prunedDf)
        require(graft.sql.GraftRuntimeFilter.probeShapes(prunedDf)
          .contains(("o_orderkey", "range")),
          "over-cap dim did not degrade to a range probe — fixture drift?")
        val rc = graft.sql.GraftRuntimeFilter.rangeCounts(prunedDf)
        require(rc.exists(_._2 > 1),
          s"expected gap-separated clustered runs, got $rc")
        spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
        val viaPlain =
          try rows(spark.sql(q))
          finally spark.conf.set("spark.graft.runtimeFilter.enabled", "true")
        val symCl = (viaPrune diff viaPlain) ++ (viaPlain diff viaPrune)
        println(s"[crosscheck] cluster_prune: pruned=${viaPrune.size} " +
          s"plain=${viaPlain.size} ranges=${rc.map(_._2).sum} " +
          s"symdiff=${symCl.size}" +
          s"${if (symCl.nonEmpty) " MISMATCH " + symCl.take(20) else " OK"}")
        require(viaPlain.nonEmpty, "cluster_prune joined nothing — drift?")
        if (symCl.nonEmpty) sys.exit(1)
        // r12 INDEX-RANGE twin on the same fixture: the over-cap dim
        // joins on the INDEXED custkey VALUE column — the probe
        // degrades to index range arms (gathered + verified through the
        // same tombstoned state) instead of declining. Cap lowered so
        // the custkey domain is over-cap at every sf.
        spark.conf.set("spark.graft.runtimeFilter.maxKeys", "8")
        val ckmax = orders.agg(max(col("o_custkey"))).head.getLong(0)
        orders.filter(col("o_custkey") >= lit(ckmax / 2) &&
            col("o_custkey") < lit(ckmax / 2 + ckmax / 10))
          .select("o_custkey").distinct()
          .createOrReplaceTempView("clcc_ixdim")
        val qi = """SELECT f.o_orderkey, f.o_custkey, f.o_totalprice
                    FROM graft_clcc.`o$wide` f
                    JOIN clcc_ixdim d ON f.o_custkey = d.o_custkey"""
        val ixDf = spark.sql(qi)
        val viaIx = rows(ixDf)
        require(graft.sql.GraftRuntimeFilter.probeShapes(ixDf)
          .contains(("o_custkey", "range")),
          "over-cap value dim did not degrade to index range arms")
        spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
        val viaIxPlain =
          try rows(spark.sql(qi))
          finally spark.conf.set("spark.graft.runtimeFilter.enabled", "true")
        spark.conf.unset("spark.graft.runtimeFilter.maxKeys")
        spark.conf.unset("spark.graft.runtimeFilter.rangeBuckets")
        val symIx = (viaIx diff viaIxPlain) ++ (viaIxPlain diff viaIx)
        println(s"[crosscheck] cluster_prune(index_range): " +
          s"pruned=${viaIx.size} plain=${viaIxPlain.size} " +
          s"symdiff=${symIx.size}" +
          s"${if (symIx.nonEmpty) " MISMATCH " + symIx.take(20) else " OK"}")
        require(viaIxPlain.nonEmpty, "index_range twin joined nothing")
        if (symIx.nonEmpty) sys.exit(1)
      case "prefix_cluster" =>
        // r13: over-cap runtime pruning on a STRING-keyed wide fact —
        // the byte-prefix occupancy clustering (clusterPrefixRuns) vs
        // the conf-off plain join, with 1% deletes injected so
        // resolution matters inside the pruned ranges. The unpadded
        // 'k<digits>#' key shape scatters the dim's 7-byte prefixes, so
        // the probe must produce MULTIPLE gap-separated ranges (seam),
        // each a per-bucket value superset the join's equality re-check
        // keeps exact.
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        import graft.core.CellCodec
        import graft.write.Mutations
        val orders = spark.read.parquet(s"$dir/orders.parquet")
        val root = java.nio.file.Files.createTempDirectory("graft-pxcc").toString
        val g = Graft(spark, root)
        g.createTable(TableDescriptor("o", Seq(FamilyDescriptor("o")),
          splitKeys = 32, wideKey = Some("ok:string"),
          wideSchema = Some("o:o_orderkey:long;o:o_custkey:long;" +
            "o:o_totalprice:double")), nowMs = 1L)
        val skey = concat(lit("k"),
          col("o_orderkey").cast(org.apache.spark.sql.types.StringType),
          lit("#")).as("ok")
        val cells = CellCodec.encode(
          orders.select(skey, col("o_orderkey"), col("o_custkey"),
            col("o_totalprice")), "o", Seq("ok"))
        g.table("o").mutate(cells, nowMs = 1L)
        g.table("o").mutate(Mutations.deleteFamilyCells(
          cells.filter(pmod(xxhash64(col("row")), lit(100)) === 3)
            .select("row").distinct(),
          col("row"), "o", ts = 5L), nowMs = 5L)
        spark.conf.set("spark.sql.catalog.graft_pxcc",
          classOf[graft.sql.GraftSqlCatalog].getName)
        spark.conf.set("spark.sql.catalog.graft_pxcc.root", root)
        spark.conf.set("spark.graft.runtimeFilter.maxBuildBytes",
          (512L << 20).toString)
        // over-cap at every sf: two orderkey windows mapped through the
        // SAME string transform, capped low
        spark.conf.set("spark.graft.runtimeFilter.maxKeys", "128")
        val pkmax = orders.agg(max(col("o_orderkey"))).head.getLong(0)
        orders.filter(col("o_orderkey") < lit(pkmax / 20) ||
            (col("o_orderkey") >= lit(pkmax / 2) &&
              col("o_orderkey") < lit(pkmax / 2 + pkmax / 20)))
          .select(skey)
          .createOrReplaceTempView("pxcc_dim")
        val q = """SELECT f.o_orderkey, f.o_custkey, f.o_totalprice
                   FROM graft_pxcc.`o$wide` f
                   JOIN pxcc_dim d ON f.ok = d.ok"""
        def prows(df: org.apache.spark.sql.DataFrame)
            : Set[(Long, Long, Double)] =
          df.collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val prunedDf = spark.sql(q)
        val viaPrune =
          try prows(prunedDf)
          finally spark.conf.unset("spark.graft.runtimeFilter.maxKeys")
        require(graft.sql.GraftRuntimeFilter.probeShapes(prunedDf)
          .contains(("ok", "range")),
          "string dim did not degrade to a range probe: " +
            graft.sql.GraftRuntimeFilter.probeShapes(prunedDf))
        val rcP = graft.sql.GraftRuntimeFilter.rangeCounts(prunedDf)
        require(rcP.exists(_._2 > 1),
          s"expected gap-separated prefix runs, got $rcP")
        spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
        val viaPlainP =
          try prows(spark.sql(q))
          finally spark.conf.set("spark.graft.runtimeFilter.enabled", "true")
        val symP = (viaPrune diff viaPlainP) ++ (viaPlainP diff viaPrune)
        println(s"[crosscheck] prefix_cluster: pruned=${viaPrune.size} " +
          s"plain=${viaPlainP.size} ranges=${rcP.map(_._2).sum} " +
          s"symdiff=${symP.size}" +
          s"${if (symP.nonEmpty) " MISMATCH " + symP.take(20) else " OK"}")
        require(viaPlainP.nonEmpty, "prefix_cluster joined nothing — drift?")
        if (symP.nonEmpty) sys.exit(1)
      case "cell_runtime_index" =>
        // r13: runtime (join-driven) VALUE pruning on the CELL door — a
        // fact-dim join on an indexed qualifier VALUE resolves at
        // execution into an index probe + size-gated gather, vs the
        // conf-off plain join, on a SALTED fixture with 1% custkey
        // UPDATES and 1% family DELETES injected first: stale index
        // entries must be dropped by the join's equality re-check over
        // RESOLVED rows, and tombstones must win inside the gathered
        // span. An over-cap sub-twin (maxKeys=8) asserts the ArmRange
        // degradation returns the same rows.
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        import graft.core.{Bytes, CellCodec}
        import graft.write.Mutations
        import org.apache.spark.sql.types.LongType
        val orders = spark.read.parquet(s"$dir/orders.parquet")
        val root = java.nio.file.Files.createTempDirectory("graft-cvcc").toString
        val g = Graft(spark, root)
        g.createTable(TableDescriptor("o", Seq(FamilyDescriptor("o")),
          splitKeys = 32, saltBuckets = 8), nowMs = 1L)
        val cells = CellCodec.encode(orders, "o", Seq("o_orderkey"))
        g.table("o").mutate(cells, nowMs = 1L)
        g.createIndex("o", "o", Bytes.toBytes("o_custkey"), nowMs = 2L)
        val custCells = cells
          .filter(col("qualifier") === lit(Bytes.toBytes("o_custkey")))
        val updates = custCells
          .filter(pmod(xxhash64(col("row")), lit(100)) === 1)
          .withColumn("ts", lit(5L))
          .withColumn("value",
            CellCodec.longBytes(Bytes.asLong(col("value")) + 1))
        val deletes = Mutations.deleteFamilyCells(
          custCells.filter(pmod(xxhash64(col("row")), lit(100)) === 2)
            .select("row").distinct(),
          col("row"), "o", ts = 5L)
        g.table("o").mutate(updates.unionByName(deletes), nowMs = 5L)
        spark.conf.set("spark.sql.catalog.graft_cvcc",
          classOf[graft.sql.GraftSqlCatalog].getName)
        spark.conf.set("spark.sql.catalog.graft_cvcc.root", root)
        spark.conf.set("spark.graft.runtimeFilter.maxBuildBytes",
          (512L << 20).toString)
        // dim: a hash-selected slice of the custkey domain sized to stay
        // under the VALUE-attribute exact-keys cap (64, runtimeKeyCap)
        // at EVERY sf (no LIMIT — the row-selection guard rightly
        // declines limit-bearing dims), encoded under the cell codec's
        // value bytes
        val nck = orders.select("o_custkey").distinct().count()
        val mod = math.max(1L, nck / 48)
        orders.filter(pmod(xxhash64(col("o_custkey")), lit(mod)) === (mod - 1))
          .select(CellCodec.encodeValue(col("o_custkey"), LongType,
            ordered = false).as("cv"))
          .distinct()
          .createOrReplaceTempView("cvcc_dim")
        val ckQual = "X'" + Bytes.toBytes("o_custkey")
          .map(x => f"$x%02x").mkString + "'"
        val q = s"""SELECT f.row, f.value FROM graft_cvcc.o f
                    JOIN cvcc_dim d ON f.value = d.cv
                    WHERE f.family = 'o' AND f.qualifier = $ckQual"""
        def brows(df: org.apache.spark.sql.DataFrame)
            : Set[(Seq[Byte], Seq[Byte])] =
          df.collect().map(r => (r.getAs[Array[Byte]](0).toSeq,
            r.getAs[Array[Byte]](1).toSeq)).toSet
        val prunedDf = spark.sql(q)
        val viaPrune = brows(prunedDf)
        require(graft.sql.GraftRuntimeFilter.probeShapes(prunedDf)
          .contains(("value", "keys")),
          "cell-door value probe did not apply — fixture drift? " +
            graft.sql.GraftRuntimeFilter.probeShapes(prunedDf))
        spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
        val viaPlain =
          try brows(spark.sql(q))
          finally spark.conf.set("spark.graft.runtimeFilter.enabled", "true")
        val symCv = (viaPrune diff viaPlain) ++ (viaPlain diff viaPrune)
        println(s"[crosscheck] cell_runtime_index: pruned=${viaPrune.size} " +
          s"plain=${viaPlain.size} symdiff=${symCv.size}" +
          s"${if (symCv.nonEmpty) " MISMATCH " + symCv.take(20) else " OK"}")
        require(viaPlain.nonEmpty, "cell_runtime_index joined nothing — drift?")
        if (symCv.nonEmpty) sys.exit(1)
        // keys path must have APPLIED, not just attached: the r13 route
        // guard may decline an attached probe (then "pruned" would be
        // the plain path twice — proving nothing)
        require(!graft.sql.GraftRouteSeams.guardDeclined(prunedDf),
          "guard declined the keys probe — the twin tested nothing")
        // over-cap sub-twin: the same dim past a lowered cap degrades to
        // index ArmRanges, same rows. The scattered hash-selected keys
        // make the range superset ANTI-selective at sf1 — exactly what
        // the r13 guard declines — so the guard floor is raised here to
        // keep the ArmRange gather path itself under test (its decline
        // behavior has its own seam in WideViewSpec).
        spark.conf.set("spark.graft.runtimeFilter.maxKeys", "8")
        spark.conf.set("spark.graft.route.guard.minIndexRows",
          Long.MaxValue.toString)
        val rangeDf = spark.sql(q)
        val viaRange =
          try brows(rangeDf)
          finally {
            spark.conf.unset("spark.graft.runtimeFilter.maxKeys")
            spark.conf.unset("spark.graft.route.guard.minIndexRows")
          }
        require(graft.sql.GraftRuntimeFilter.probeShapes(rangeDf)
          .contains(("value", "range")),
          "over-cap cell value dim did not degrade to index range arms: " +
            graft.sql.GraftRuntimeFilter.probeShapes(rangeDf))
        require(!graft.sql.GraftRouteSeams.guardDeclined(rangeDf),
          "guard declined the range probe despite the raised floor")
        val symCr = (viaRange diff viaPlain) ++ (viaPlain diff viaRange)
        println(s"[crosscheck] cell_runtime_index(range): " +
          s"pruned=${viaRange.size} plain=${viaPlain.size} " +
          s"symdiff=${symCr.size}" +
          s"${if (symCr.nonEmpty) " MISMATCH " + symCr.take(20) else " OK"}")
        if (symCr.nonEmpty) sys.exit(1)
      case "page_filter" =>
        // r11 (BENCH_SF3's largest riser): the PageFilter(50) scan — the
        // incremental first-N-rows cut over the committed sorted layout —
        // against the relational ORDER BY key LIMIT 50 on the source
        // parquet. Agreement at sf3 pins that the page cut returns the
        // KEY-ORDER head as the table grows, not an arbitrary N rows.
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        import graft.core.CellCodec
        import graft.read.{PageFilter, Scan}
        import org.apache.spark.sql.types.{LongType, StructField, StructType}
        val orders = spark.read.parquet(s"$dir/orders.parquet")
        val root = java.nio.file.Files.createTempDirectory("graft-pfcc").toString
        val g = Graft(spark, root)
        g.createTable(TableDescriptor("o", Seq(FamilyDescriptor("o")),
          splitKeys = 32), nowMs = 1L)
        g.table("o").mutate(
          CellCodec.encode(orders, "o", Seq("o_orderkey")), nowMs = 1L)
        val schema = StructType(Seq(StructField("o_custkey", LongType)))
        val viaScan = CellCodec.decode(
          g.table("o").scan(Scan().setFilter(PageFilter(50))
            .addColumn("o", graft.core.Bytes.toBytes("o_custkey"))),
          schema, key = Seq("o_orderkey" -> LongType))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val direct = orders.orderBy("o_orderkey").limit(50)
          .select("o_orderkey", "o_custkey")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val sym = (viaScan diff direct) ++ (direct diff viaScan)
        println(s"[crosscheck] page_filter: scan=${viaScan.size} " +
          s"direct=${direct.size} symdiff=${sym.size}" +
          s"${if (sym.nonEmpty) " MISMATCH " + sym.take(20) else " OK"}")
        require(viaScan.size == 50, s"page cut returned ${viaScan.size}")
        if (sym.nonEmpty) sys.exit(1)
      case "versions_latest" =>
        // r11 (the other large sf3 riser): maxVersions=1 resolution
        // (newest event per user through the committed layout + Resolve)
        // against the relational window (row_number ts desc, event_id
        // desc) on the source parquet — the version-cap machinery vs a
        // machinery-free recomputation.
        import graft.catalog.{FamilyDescriptor, TableDescriptor}
        import graft.core.{CellCodec, EventTime}
        import graft.read.Scan
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
        val events = EventTime.normalize(
          EventTime.readAdaptive(spark, s"$dir/events.parquet"))
        val root = java.nio.file.Files.createTempDirectory("graft-vlcc").toString
        val g = Graft(spark, root)
        g.createTable(TableDescriptor("e",
          Seq(FamilyDescriptor("e", maxVersions = 1)), splitKeys = 32),
          nowMs = 1L)
        g.table("e").mutate(CellCodec.encode(events, "e", Seq("user_id"),
          tsCol = Some(col("ts")), seqCol = Some(col("event_id"))), nowMs = 1L)
        val schema = StructType(Seq(
          StructField("event_type", StringType),
          StructField("value", DoubleType)))
        def tup(df: org.apache.spark.sql.DataFrame) = df
          .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
          .toSet
        val viaScan = tup(CellCodec.decode(
          g.table("e").scan(Scan().addFamily("e")), schema,
          key = Seq("user_id" -> LongType))
          .select("user_id", "event_type", "value"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        val direct = tup(events
          .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(w))
          .filter(col("_rn") === 1)
          .select("user_id", "event_type", "value"))
        val sym = (viaScan diff direct) ++ (direct diff viaScan)
        println(s"[crosscheck] versions_latest: scan=${viaScan.size} " +
          s"direct=${direct.size} symdiff=${sym.size}" +
          s"${if (sym.nonEmpty) " MISMATCH " + sym.take(20) else " OK"}")
        require(viaScan.nonEmpty, "versions_latest resolved nothing")
        if (sym.nonEmpty) sys.exit(1)
      case other => sys.error(s"unknown check: $other")
    }
    spark.stop()
  }
}
