package graft.catalog

import graft.{Graft, SparkSpec}
import graft.core.Bytes
import graft.write.Put
import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Family physical attrs land in the physical layout: bloom filters and
  * codec in the parquet footers of THAT family's leaf dirs only
  * (HColumnDescriptor BLOOMFILTER/COMPRESSION parity), IN_MEMORY families
  * read through the block cache, and the per-family split keeps reads,
  * snapshots, and vacuum correct. */
class PhysicalAttrsSpec extends SparkSpec {

  private def b(s: String) = Bytes.toBytes(s)

  private def partFiles(dir: String): Seq[Path] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(dir)).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
  }

  private def footerOf(f: Path) = {
    val in = HadoopInputFile.fromPath(f, spark.sparkContext.hadoopConfiguration)
    val r = ParquetFileReader.open(in)
    try r.getFooter finally r.close()
  }

  test("bloom + codec land in the right family's footers; reads stay correct") {
    val root = Files.createTempDirectory("graft-phys").toString
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(
      FamilyDescriptor("hot", bloomFilter = BloomType.Row,
        compression = Some("zstd")),
      FamilyDescriptor("plain")), splitKeys = 2), 1L)
    g.table("t").put((1 to 200).map(i =>
      Put(b(f"r$i%03d"))
        .add("hot", b("q"), b(s"h$i"))
        .add("plain", b("q"), b(s"p$i"))), 2L)

    val m = g.catalog.currentManifest("t")
    assert(m.dataDirs.size == 2, m.dataDirs)
    val hotDir = m.dataDirs.find(_.endsWith("_fam=hot")).get
    val plainDir = m.dataDirs.find(_.endsWith("_fam=plain")).get

    val hotCols = partFiles(hotDir).map(footerOf)
      .flatMap(_.getBlocks.toArray.toSeq)
      .flatMap(_.asInstanceOf[org.apache.parquet.hadoop.metadata.BlockMetaData]
        .getColumns.toArray.toSeq)
      .map(_.asInstanceOf[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData])
    assert(hotCols.nonEmpty)
    assert(hotCols.forall(_.getCodec.name() == "ZSTD"),
      hotCols.map(_.getCodec.name()).distinct)
    val hotRowCols = hotCols.filter(_.getPath.toDotString == "row")
    assert(hotRowCols.nonEmpty && hotRowCols.forall(_.getBloomFilterOffset >= 0),
      hotRowCols.map(_.getBloomFilterOffset))

    val plainCols = partFiles(plainDir).map(footerOf)
      .flatMap(_.getBlocks.toArray.toSeq)
      .flatMap(_.asInstanceOf[org.apache.parquet.hadoop.metadata.BlockMetaData]
        .getColumns.toArray.toSeq)
      .map(_.asInstanceOf[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData])
    assert(plainCols.forall(_.getCodec.name() != "ZSTD"))
    assert(plainCols.filter(_.getPath.toDotString == "row")
      .forall(_.getBloomFilterOffset < 0))

    // the split is invisible to reads: both families resolve as one table
    val out = collectCells(g.table("t").scan(graft.read.Scan()))
    assert(out.size == 400)
    assert(out.contains(("r001", "hot", "q", 2L, "h1")))
    assert(out.contains(("r001", "plain", "q", 2L, "p1")))
  }

  test("ROWCOL bloom: qualifier column gets its own bloom; ROW does not") {
    val root = Files.createTempDirectory("graft-rowcol").toString
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(
      FamilyDescriptor("rc", bloomFilter = BloomType.RowCol),
      FamilyDescriptor("r", bloomFilter = BloomType.Row)), splitKeys = 2), 1L)
    // High-cardinality rows AND qualifiers: parquet only materializes a
    // bloom when the chunk falls back from dictionary to plain encoding
    // (a fully-dictionary chunk is its own exact filter, so parquet-mr
    // skips the bloom as redundant) — which is precisely the
    // at-scale wide-table regime where ROWCOL matters.
    g.table("t").put((1 to 500).map(i =>
      Put(b(f"r$i%03d"))
        .add("rc", b(f"q$i%03d"), b(s"v$i"))
        .add("r", b(f"q$i%03d"), b(s"w$i"))), 2L)

    def colsOf(dir: String) = partFiles(dir).map(footerOf)
      .flatMap(_.getBlocks.toArray.toSeq)
      .flatMap(_.asInstanceOf[org.apache.parquet.hadoop.metadata.BlockMetaData]
        .getColumns.toArray.toSeq)
      .map(_.asInstanceOf[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData])
    val m = g.catalog.currentManifest("t")
    val rcCols = colsOf(m.dataDirs.find(_.endsWith("_fam=rc")).get)
    val rCols = colsOf(m.dataDirs.find(_.endsWith("_fam=r")).get)
    def blooms(cs: Seq[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData],
        path: String) = cs.filter(_.getPath.toDotString == path)
    assert(blooms(rcCols, "row").forall(_.getBloomFilterOffset >= 0))
    assert(blooms(rcCols, "qualifier").forall(_.getBloomFilterOffset >= 0))
    assert(blooms(rCols, "row").forall(_.getBloomFilterOffset >= 0))
    assert(blooms(rCols, "qualifier").forall(_.getBloomFilterOffset < 0))
    // descriptor round-trips through the manifest JSON
    val d = g.catalog.currentManifest("t").descriptor
    assert(d.family("rc").bloomFilter == BloomType.RowCol)
    assert(d.family("r").bloomFilter == BloomType.Row)
    // column-addressed point read stays correct
    val got = collectCells(g.table("t").scan(
      graft.read.Scan().setStartRow(b("r007")).setStopRow(b("r008"))
        .addColumn("rc", b("q007"))))
    assert(got == Set(("r007", "rc", "q007", 2L, "v7")))
  }

  test("IN_MEMORY family reads through the block cache") {
    val root = Files.createTempDirectory("graft-inmem").toString
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(
      FamilyDescriptor("mem", inMemory = true),
      FamilyDescriptor("disk")), splitKeys = 2), 1L)
    g.table("t").put(Seq(
      Put(b("r1")).add("mem", b("q"), b("m")).add("disk", b("q"), b("d"))), 2L)
    val plan = g.table("t").cells.queryExecution.optimizedPlan.toString
    assert(plan.contains("InMemoryRelation"), plan)
    // cached + plain sides still read as one table
    assert(collectCells(g.table("t").scan(graft.read.Scan())) ==
      Set(("r1", "mem", "q", 2L, "m"), ("r1", "disk", "q", 2L, "d")))
  }

  test("explicit pre-split boundaries: no committed file straddles a boundary") {
    val root = Files.createTempDirectory("graft-presplit").toString
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")),
      splitKeys = 2,
      splitBoundaries = Seq(b("r010"), b("r020"))), 1L)
    g.table("t").put((1 to 30).map(i =>
      Put(b(f"r$i%03d")).add("f", b("q"), b(s"v$i"))), 2L)

    val leaf = g.catalog.currentManifest("t").dataDirs.head
    val fs = new Path(leaf).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bucketDirs = fs.listStatus(new Path(leaf)).toSeq
      .filter(_.isDirectory).map(_.getPath).sortBy(_.getName)
    assert(bucketDirs.map(_.getName) == Seq("_bucket=0", "_bucket=1", "_bucket=2"),
      bucketDirs.map(_.getName))
    // every bucket's rows stay inside its boundary range
    def rowsOf(p: Path): Seq[String] =
      spark.read.schema(graft.core.Cell.schema)
        .option("recursiveFileLookup", "true").parquet(p.toString)
        .collect().toSeq.map(r => new String(r.getAs[Array[Byte]]("row"), "UTF-8"))
    assert(rowsOf(bucketDirs(0)).forall(_ < "r010"))
    assert(rowsOf(bucketDirs(1)).forall(r => r >= "r010" && r < "r020"))
    assert(rowsOf(bucketDirs(2)).forall(_ >= "r020"))

    // descriptor round-trips through the manifest (hex-encoded boundaries)
    val d = g.catalog.currentManifest("t").descriptor
    assert(d.splitBoundaries.map(new String(_, "UTF-8")) == Seq("r010", "r020"))

    // reads see the whole table; snapshot export/import survives nesting
    assert(collectCells(g.table("t").scan(graft.read.Scan())).size == 30)
    g.snapshot("s", "t", 3L)
    val exp = s"$root/exported"
    g.exportSnapshot("s", exp)
    g.importSnapshot("s_imported", exp)
    assert(collectCells(
      graft.read.ScanExec(g.readSnapshot("s_imported"), graft.read.Scan())).size == 30)
  }

  test("vacuum keeps live leaf dirs, drops dead top dirs after compaction") {
    val root = Files.createTempDirectory("graft-physvac").toString
    val g = Graft(spark, root)
    g.createTable(TableDescriptor("t", Seq(FamilyDescriptor("f")), splitKeys = 2), 1L)
    g.table("t").put(Seq(Put(b("r1")).add("f", b("q"), b("v1"))), 2L)
    g.table("t").put(Seq(Put(b("r2")).add("f", b("q"), b("v2"))), 3L)
    // nothing dead while the append manifests are retained
    assert(g.vacuum("t").isEmpty)
    g.table("t").majorCompact(4L)
    g.catalog.expireVersions("t", keep = 1)
    val dead = g.vacuum("t")
    assert(dead.nonEmpty && dead.forall(_.contains("data-")), dead)
    assert(collectCells(g.table("t").scan(graft.read.Scan())) ==
      Set(("r1", "f", "q", 2L, "v1"), ("r2", "f", "q", 3L, "v2")))
  }
}
