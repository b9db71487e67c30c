package graft.read

import graft.catalog.{Catalog, FamilyDescriptor, IndexDescriptor, TableDescriptor}
import graft.core.{Bytes, CellKind, Salt}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Global secondary index over one (family, qualifier) — the Phoenix-style
  * index-table design the HBase ecosystem layers on top of the reference's
  * primary-key-only access paths (the reference itself can answer
  * "rows where column = v" only by full scan + `SingleColumnValueFilter`,
  * `hbase/filter/SingleColumnValueFilter.java`).
  *
  * Index layout: a NORMAL cell table whose row key is
  * `value ++ 0x00 ++ mainRow` (value-prefix order, prefix-free under the
  * same constraint as composite row keys: values of the indexed column
  * must not embed 0x00 unless fixed-width — all the numeric codecs are),
  * family `i`, qualifier `r`, cell value = the main-table row key. An
  * equality or prefix query on the indexed column becomes a RANGE SCAN of
  * the index (parquet min/max pruned, O(hits) not O(table)), and the hits'
  * main-row keys gather the main table like a multiGet.
  *
  * Registration ([[create]]) makes the index a catalog-level table
  * property: `Catalog.append` dual-writes the index delta on every main
  * append, `GraftTable.indexLookup` resolves the index by (family,
  * qualifier), and the SQL door's pushdown hook routes qualifying
  * equality/IN predicates through [[gather]] transparently — the Phoenix
  * property: users never address the index table by hand. On a SALTED
  * main table the index stores LOGICAL keys (append indexes the logical
  * batch before salting), so the two key designs compose.
  *
  * Consistency: the index transform is per-cell, so maintenance is "apply
  * the same transform to the delta and mutate the index table". Value
  * UPDATES leave the old value's entry in place and DELETES are not
  * tombstoned here — instead lookups are verified on read: the gather
  * step re-applies `SingleColumnValueFilter(family, qualifier, EQUAL, v)`
  * on the MAIN table's resolved view, so stale index hits are false
  * positives that the filter eliminates (false negatives cannot happen:
  * every put is indexed). Same trade as Phoenix's non-transactional
  * global indexes: cheap writes, verified reads. The stale entries are
  * GARBAGE-COLLECTED by [[rebuild]] (the index table's major-compaction
  * analog), wired into `GraftTable.majorCompact`.
  */
object SecondaryIndex {

  val IndexFamily = "i"
  private val RowQualifier: Array[Byte] = Bytes.toBytes("r")
  private val Sep: Array[Byte] = Array(0.toByte)

  /** Broadcast cap for the gather step: probes at or under this many hit
    * keys broadcast into the main scan (the designed O(hits) plan); above
    * it — the "index on a low-cardinality column, hot value" shape — the
    * gather falls back to a shuffle semi-join, because a driver-built
    * broadcast of millions of keys is exactly the scale-killer the
    * size-gated union-find (`Dedup.connectedComponents`) refuses. */
  val DefaultBroadcastMaxKeys = 1000000L

  /** The per-cell index transform: main-table cells (any mix of kinds) ->
    * index-table put-cells for one indexed (family, qualifier). Run it on
    * a full table for the initial build and on each mutation delta for
    * maintenance — it is the same one-pass, shuffle-free projection. */
  def indexCells(cells: DataFrame, family: String,
      qualifier: Array[Byte]): DataFrame =
    cells
      .filter(col("family") === family &&
        col("qualifier") === lit(qualifier) &&
        col("kind") === CellKind.Put && col("value").isNotNull)
      .select(
        concat(col("value"), lit(Sep), col("row")).as("row"),
        lit(IndexFamily).as("family"),
        lit(RowQualifier).cast(BinaryType).as("qualifier"),
        col("ts"),
        lit(CellKind.Put).as("kind"),
        col("row").as("value"),
        col("seq"))

  /** Probe the index for an exact value: a range scan over
    * `[v ++ 0x00, v ++ 0x01)` returning the distinct candidate main-row
    * keys. O(index hits) rows — at 100 TB this is the whole point: the
    * scan touches only the index files whose min/max overlap the value. */
  def probe(index: DataFrame, value: Array[Byte]): DataFrame =
    ScanExec(index,
        Scan(Some(value ++ Sep), Some(value ++ Array(1.toByte))))
      .select(col("value").as("row")).distinct()

  /** Multi-value probe (`IN (v1..vk)`): ONE index pass with the k ranges
    * OR'd — parquet prunes to the union of the value ranges — instead of
    * k probe jobs. */
  def probeAll(index: DataFrame, values: Seq[Array[Byte]]): DataFrame = {
    require(values.nonEmpty, "probeAll needs at least one value")
    val pred = values.map(v =>
        col("row") >= lit(v ++ Sep) && col("row") < lit(v ++ Array(1.toByte)))
      .reduce(_ || _)
    ScanExec(index.filter(pred), Scan())
      .select(col("value").as("row")).distinct()
  }

  /** Candidate gather, SIZE-GATED and SPAN-BOUNDED: one cheap stats job
    * on the O(hits) parquet-pruned probe yields (count, min key, max
    * key); the hit-key SPAN `[min, succ(max))` then bounds the main scan
    * — parquet min/max pruning reads only the candidates' key range, the
    * multiGet shape, instead of the whole table feeding the semi-join
    * (at 100 TB the gather's scan cost is the span, not the table; a
    * scattered hit set degrades to the full span, never worse than an
    * unbounded scan). Below `broadcastMaxKeys` hits broadcast into that
    * scan; above it — a hot value on a low-cardinality column — the
    * shuffle-hash hint FORCES the non-broadcast semi-join (the count is
    * exact, so no stats misestimate may re-introduce a driver-built
    * broadcast of millions of keys). The join re-runs the probe: two
    * pruned index scans, never a cached or driver-held key set. Returns
    * candidate main-table CELLS (unresolved). */
  def gather(mainCells: DataFrame, index: DataFrame,
      values: Seq[Array[Byte]],
      broadcastMaxKeys: Long = DefaultBroadcastMaxKeys): DataFrame = {
    val hits =
      if (values.sizeIs == 1) probe(index, values.head) else probeAll(index, values)
    val stats = hits.agg(count(lit(1)), min(col("row")), max(col("row")))
      .collect()(0)
    val n = stats.getLong(0)
    if (n == 0) return mainCells.limit(0)
    val lo = stats.getAs[Array[Byte]](1)
    val hi = Bytes.successor(stats.getAs[Array[Byte]](2))
    val span = mainCells.filter(col("row") >= lit(lo) && col("row") < lit(hi))
    val keyed =
      if (n <= broadcastMaxKeys) broadcast(hits) else hits.hint("shuffle_hash")
    span.join(keyed, Seq("row"), "left_semi")
  }

  /** Index-backed equality lookup: probe (small) -> gather the hit keys
    * into the main cell scan (size-gated broadcast) -> resolve with the
    * verifying `SingleColumnValueFilter`, which both re-checks the indexed
    * value against the CURRENT visible version (stale-hit elimination) and
    * keeps whole matching rows. Returns resolved main-table cells. */
  def lookup(mainCells: DataFrame, index: DataFrame, family: String,
      qualifier: Array[Byte], value: Array[Byte],
      broadcastMaxKeys: Long = DefaultBroadcastMaxKeys): DataFrame = {
    val candidates = gather(mainCells, index, Seq(value), broadcastMaxKeys)
    // filterIfMissing: a stale hit whose column was since deleted must
    // not pass on the "missing column passes" default
    ScanExec(candidates, Scan().setFilter(
      SingleColumnValueFilter(family, qualifier,
        CompareOp.EQUAL, BinaryComparator(value), filterIfMissing = true)))
  }

  /** Multi-value lookup: one probe pass, one size-gated gather, one
    * resolve; the verify step keeps rows whose CURRENT visible indexed
    * value is in the set (the IN-generalization of `lookup`'s
    * SingleColumnValueFilter, which is single-comparator). */
  def lookupAll(mainCells: DataFrame, index: DataFrame, family: String,
      qualifier: Array[Byte], values: Seq[Array[Byte]],
      broadcastMaxKeys: Long = DefaultBroadcastMaxKeys): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val resolved = ScanExec(
      gather(mainCells, index, values, broadcastMaxKeys), Scan())
    val isTest = col("family") === family && col("qualifier") === lit(qualifier)
    val inSet = values.map(v => col("value") === lit(v)).reduce(_ || _)
    resolved
      .withColumn("_idx_ok", max(when(isTest && inSet, 1).otherwise(0))
        .over(Window.partitionBy("row")))
      .filter(col("_idx_ok") === 1).drop("_idx_ok")
  }

  /** Deterministic default index-table name for one indexed column. */
  def defaultIndexTable(table: String, family: String,
      qualifier: Array[Byte]): String =
    s"${table}_idx_${family}_${qualifier.map(b => f"$b%02x").mkString}"

  /** Logical-key view of a manifest's raw cells (salt stripped when the
    * table is salted) — what the index transform and gather run over. */
  private def logicalRead(catalog: Catalog,
      m: graft.catalog.Manifest): DataFrame = {
    val raw = catalog.readManifest(m)
    if (m.descriptor.saltBuckets > 0) Salt.stripCells(raw) else raw
  }

  /** CREATE INDEX: create the index table, REGISTER it on the main
    * table's descriptor (so `Catalog.append` maintains it from here on),
    * then run the initial build over every existing put (logical keys on
    * salted tables). Register-before-build means a put racing the build
    * can be indexed twice — identical cells that resolve's duplicate
    * dedup collapses — never missed; like Phoenix's CREATE INDEX, a
    * concurrent DROP/bulk-load during the build still needs a rebuild. */
  def create(catalog: Catalog, table: String, family: String,
      qualifier: Array[Byte], nowMs: Long,
      indexTable: Option[String] = None): IndexDescriptor = {
    val cur = catalog.currentManifest(table)
    require(cur.descriptor.indexOn(family, qualifier).isEmpty,
      s"table $table already has an index on ($family, " +
        s"${qualifier.map(b => f"$b%02x").mkString})")
    val ixName = indexTable.getOrElse(defaultIndexTable(table, family, qualifier))
    catalog.createTable(TableDescriptor(ixName,
      Seq(FamilyDescriptor(IndexFamily, maxVersions = 1)),
      splitKeys = cur.descriptor.splitKeys), nowMs)
    val ix = IndexDescriptor(family, qualifier, ixName)
    catalog.alterTable(table,
      cur.descriptor.copy(indexes = cur.descriptor.indexes :+ ix), nowMs)
    catalog.append(ixName,
      indexCells(logicalRead(catalog, cur), family, qualifier), nowMs)
    ix
  }

  /** Index GC — the index table's major-compaction analog: rewrite the
    * index to entries whose main-table cell is CURRENTLY VISIBLE under
    * the family descriptors (tombstoned, TTL-expired and over-version
    * values drop out, so the index stops growing monotonically across
    * updates/deletes). Lookups are unchanged before and after — stale
    * entries were only ever false positives the verified read already
    * eliminated. One distributed pass over the main table + one
    * compaction commit on the index table. */
  def rebuild(catalog: Catalog, table: String, ix: IndexDescriptor,
      nowMs: Long): Unit = {
    val m = catalog.currentManifest(table)
    val d = m.descriptor
    val visible = Resolve(logicalRead(catalog, m), ReadView(
      maxVersions = Int.MaxValue,
      familyMaxVersions = d.families.map(f => f.name -> f.maxVersions).toMap,
      familyTtlMs = d.families.flatMap(f => f.ttlMs.map(f.name -> _)).toMap,
      now = nowMs))
    catalog.replaceData(ix.indexTable,
      indexCells(visible, ix.family, ix.qualifier), nowMs): Unit
  }

  /** [[rebuild]] every registered index of a table — wired into
    * `GraftTable.majorCompact` (the cells a compaction just dropped are
    * exactly the stale entries the rebuild removes). */
  def rebuildAll(catalog: Catalog, table: String, nowMs: Long): Unit =
    catalog.currentManifest(table).descriptor.indexes
      .foreach(rebuild(catalog, table, _, nowMs))
}
