package graft.read

import graft.core.{Bytes, CellKind}
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
  * Consistency: the index transform is per-cell, so maintenance is "apply
  * the same transform to the delta and mutate the index table". Value
  * UPDATES leave the old value's entry in place and DELETES are not
  * tombstoned here — instead lookups are verified on read: the gather
  * step re-applies `SingleColumnValueFilter(family, qualifier, EQUAL, v)`
  * on the MAIN table's resolved view, so stale index hits are false
  * positives that the filter eliminates (false negatives cannot happen:
  * every put is indexed). Same trade as Phoenix's non-transactional
  * global indexes: cheap writes, verified reads.
  */
object SecondaryIndex {

  val IndexFamily = "i"
  private val RowQualifier: Array[Byte] = Bytes.toBytes("r")
  private val Sep: Array[Byte] = Array(0.toByte)

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

  /** Index-backed equality lookup: probe (small) -> broadcast the hit
    * keys into the main cell scan -> resolve with the verifying
    * `SingleColumnValueFilter`, which both re-checks the indexed value
    * against the CURRENT visible version (stale-hit elimination) and
    * keeps whole matching rows. Returns resolved main-table cells. */
  def lookup(mainCells: DataFrame, index: DataFrame, family: String,
      qualifier: Array[Byte], value: Array[Byte]): DataFrame = {
    val hits = broadcast(probe(index, value))
    val candidates = mainCells.join(hits, Seq("row"), "left_semi")
    // filterIfMissing: a stale hit whose column was since deleted must
    // not pass on the "missing column passes" default
    ScanExec(candidates, Scan().setFilter(
      SingleColumnValueFilter(family, qualifier,
        CompareOp.EQUAL, BinaryComparator(value), filterIfMissing = true)))
  }

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

  /** Multi-value lookup: one probe pass, one broadcast gather, one
    * resolve; the verify step keeps rows whose CURRENT visible indexed
    * value is in the set (the IN-generalization of `lookup`'s
    * SingleColumnValueFilter, which is single-comparator). */
  def lookupAll(mainCells: DataFrame, index: DataFrame, family: String,
      qualifier: Array[Byte], values: Seq[Array[Byte]]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hits = broadcast(probeAll(index, values))
    val resolved = ScanExec(mainCells.join(hits, Seq("row"), "left_semi"),
      Scan())
    val isTest = col("family") === family && col("qualifier") === lit(qualifier)
    val inSet = values.map(v => col("value") === lit(v)).reduce(_ || _)
    resolved
      .withColumn("_idx_ok", max(when(isTest && inSet, 1).otherwise(0))
        .over(Window.partitionBy("row")))
      .filter(col("_idx_ok") === 1).drop("_idx_ok")
  }
}
