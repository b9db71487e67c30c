package graft.read

import graft.core.Bytes
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}

/** Comparison ops — reference `hbase/filter/CompareFilter.java:49-64`.
  * Semantics here: a cell passes when `cellBytes OP comparator-operand`. */
object CompareOp extends Enumeration {
  val LESS, LESS_OR_EQUAL, EQUAL, NOT_EQUAL, GREATER_OR_EQUAL, GREATER, NO_OP = Value
}

/** Comparison strategies — reference `hbase/filter/WritableByteArrayComparable.java:30`
  * and the four concrete comparators. Each compiles to a native `Column`
  * predicate so Catalyst keeps pushdown/codegen (SURVEY §4 "filter pushdown"). */
sealed trait ByteComparator {
  def compile(c: Column, op: CompareOp.Value): Column
}

/** Unsigned-lexicographic binary compare (`BinaryComparator.java:27`) —
  * Spark's BinaryType ordering is unsigned-lexicographic, matching
  * `Bytes.BYTES_COMPARATOR` (verified in BytesSpec). */
case class BinaryComparator(operand: Array[Byte]) extends ByteComparator {
  def compile(c: Column, op: CompareOp.Value): Column = {
    val v = lit(operand)
    op match {
      case CompareOp.LESS => c < v
      case CompareOp.LESS_OR_EQUAL => c <= v
      case CompareOp.EQUAL => c === v
      case CompareOp.NOT_EQUAL => c =!= v
      case CompareOp.GREATER_OR_EQUAL => c >= v
      case CompareOp.GREATER => c > v
      case CompareOp.NO_OP => lit(false)
    }
  }
}

/** Compares only the first `operand.length` bytes (`BinaryPrefixComparator.java:30`). */
case class BinaryPrefixComparator(operand: Array[Byte]) extends ByteComparator {
  def compile(c: Column, op: CompareOp.Value): Column =
    BinaryComparator(operand).compile(substring(c, 1, operand.length), op)
}

/** Regex over the UTF-8 decoding (`RegexStringComparator.java:57`);
  * EQUAL/NOT_EQUAL only, like the reference. */
case class RegexStringComparator(pattern: String) extends ByteComparator {
  def compile(c: Column, op: CompareOp.Value): Column = op match {
    case CompareOp.EQUAL => c.cast(StringType).rlike(pattern)
    case CompareOp.NOT_EQUAL => !c.cast(StringType).rlike(pattern)
    case other => throw new IllegalArgumentException(s"regex comparator with $other")
  }
}

/** Case-insensitive substring (`SubstringComparator.java:43` lowercases both). */
case class SubstringComparator(substr: String) extends ByteComparator {
  def compile(c: Column, op: CompareOp.Value): Column = {
    val hit = contains(lower(c.cast(StringType)), lit(substr.toLowerCase))
    op match {
      case CompareOp.EQUAL => hit
      case CompareOp.NOT_EQUAL => !hit
      case other => throw new IllegalArgumentException(s"substring comparator with $other")
    }
  }
}

/** The server-pushed predicate surface — reference `hbase/filter/` (18
  * classes, SURVEY §2.3). Each filter compiles to either a per-cell
  * `Column` predicate (composable under FilterList AND/OR) or a whole
  * DataFrame transform (window/semi-join) when it has row- or scan-level
  * state. All transforms window by `row`, which the resolve step's
  * `(row, family)` exchange already satisfies clustering-wise, so filters
  * add local sorts, not shuffles.
  *
  * Applied AFTER version resolution, mirroring `ScanQueryMatcher.java:186-200`
  * where the filter sees only visibility-surviving cells.
  */
sealed trait GFilter {
  /** Per-cell predicate when expressible (enables FilterList OR and
    * Catalyst pushdown); None when the filter needs row/scan state. */
  def cellPredicate: Option[Column] = None
  def apply(df: DataFrame): DataFrame =
    cellPredicate.map(df.filter).getOrElse(
      throw new UnsupportedOperationException(s"$this has no transform"))
}

object GFilter {
  private[read] val wRow = Window.partitionBy("row")
  private[read] val wRowOrdered =
    wRow.orderBy(col("family"), col("qualifier"), col("ts").desc)
}
import GFilter._

/** `RowFilter.java:40` — compare the row key. */
case class RowFilter(op: CompareOp.Value, cmp: ByteComparator) extends GFilter {
  override def cellPredicate = Some(cmp.compile(col("row"), op))
}

/** `ValueFilter.java:38` — compare the cell value. */
case class ValueFilter(op: CompareOp.Value, cmp: ByteComparator) extends GFilter {
  override def cellPredicate = Some(cmp.compile(col("value"), op))
}

/** `QualifierFilter.java:39` — compare the qualifier. */
case class QualifierFilter(op: CompareOp.Value, cmp: ByteComparator) extends GFilter {
  override def cellPredicate = Some(cmp.compile(col("qualifier"), op))
}

/** `PrefixFilter.java:34` — row key starts with prefix. Compiled as a
  * sargable range `[prefix, succ(prefix))` so Parquet min/max row-group
  * pruning applies (the reference gets the same effect from
  * `filterAllRemaining:66` early termination). */
case class PrefixFilter(prefix: Array[Byte]) extends GFilter {
  override def cellPredicate = Some {
    val lo = col("row") >= lit(prefix)
    Bytes.prefixSuccessor(prefix) match {
      case Some(hi) => lo && col("row") < lit(hi)
      case None => lo
    }
  }
}

/** `ColumnPrefixFilter.java:35` — qualifier starts with prefix. */
case class ColumnPrefixFilter(prefix: Array[Byte]) extends GFilter {
  override def cellPredicate = Some(startswith(col("qualifier"), lit(prefix)))
}

/** `InclusiveStopFilter.java:37` — closed upper row bound. */
case class InclusiveStopFilter(stopRow: Array[Byte]) extends GFilter {
  override def cellPredicate = Some(col("row") <= lit(stopRow))
}

/** `TimestampsFilter.java:20` — keep cells whose ts is in the set. */
case class TimestampsFilter(timestamps: Seq[Long]) extends GFilter {
  override def cellPredicate = Some(col("ts").isin(timestamps: _*))
}

/** `FirstKeyOnlyFilter.java:34` — only the first cell of each row. */
case class FirstKeyOnlyFilter() extends GFilter {
  override def apply(df: DataFrame): DataFrame =
    df.withColumn("_fk", row_number().over(wRowOrdered))
      .filter(col("_fk") === 1).drop("_fk")
}

/** `PageFilter.java:40` — limit the number of ROWS. The reference's limit
  * is per-region (documented caveat in the class); we implement the global
  * (saner) semantics — SURVEY §7.5 risk 4. Scalable: the first-N row keys
  * (tiny) broadcast-semi-join back against the cells. */
case class PageFilter(pageSize: Int) extends GFilter {
  override def apply(df: DataFrame): DataFrame = {
    val keys = df.select("row").distinct().orderBy("row").limit(pageSize)
    df.join(broadcast(keys), Seq("row"), "left_semi")
  }
}

/** `ColumnCountGetFilter.java:35` — at most N cells per row. */
case class ColumnCountGetFilter(limit: Int) extends GFilter {
  override def apply(df: DataFrame): DataFrame =
    df.withColumn("_cc", row_number().over(wRowOrdered))
      .filter(col("_cc") <= limit).drop("_cc")
}

/** `ColumnPaginationFilter.java:34` — per-row column slice [offset, offset+limit). */
case class ColumnPaginationFilter(limit: Int, offset: Int) extends GFilter {
  override def apply(df: DataFrame): DataFrame =
    df.withColumn("_cp", row_number().over(wRowOrdered))
      .filter(col("_cp") > offset && col("_cp") <= offset + limit).drop("_cp")
}

/** `SingleColumnValueFilter.java:64` — row-level predicate on one column's
  * value. A row passes when its test cell passes; rows MISSING the test
  * column pass unless `filterIfMissing` (`:73`). `latestVersionOnly`
  * (`:74`) restricts the test to the newest visible version. Implemented
  * with two window layers over `row` (no joins, one clustering). */
case class SingleColumnValueFilter(
    family: String, qualifier: Array[Byte],
    op: CompareOp.Value, cmp: ByteComparator,
    filterIfMissing: Boolean = false,
    latestVersionOnly: Boolean = true) extends GFilter {
  override def apply(df: DataFrame): DataFrame = {
    val isTest = col("family") === family && col("qualifier") === lit(qualifier)
    val pred = cmp.compile(col("value"), op)
    val staged = df
      .withColumn("_scv_maxts", max(when(isTest, col("ts"))).over(wRow))
      .withColumn("_scv_pass", max(when(
        isTest && (lit(!latestVersionOnly) || col("ts") === col("_scv_maxts")) && pred,
        1).otherwise(0)).over(wRow))
      .withColumn("_scv_has", max(when(isTest, 1).otherwise(0)).over(wRow))
    staged
      .filter(col("_scv_pass") === 1 || (col("_scv_has") === 0 && lit(!filterIfMissing)))
      .drop("_scv_maxts", "_scv_pass", "_scv_has")
  }
}

/** `SingleColumnValueExcludeFilter.java:32` — as above, then drop the
  * tested column from the output. */
case class SingleColumnValueExcludeFilter(
    family: String, qualifier: Array[Byte],
    op: CompareOp.Value, cmp: ByteComparator,
    filterIfMissing: Boolean = false,
    latestVersionOnly: Boolean = true) extends GFilter {
  override def apply(df: DataFrame): DataFrame =
    SingleColumnValueFilter(family, qualifier, op, cmp, filterIfMissing, latestVersionOnly)
      .apply(df)
      .filter(!(col("family") === family && col("qualifier") === lit(qualifier)))
}

/** `DependentColumnFilter.java:40` — keep cells whose ts matches the ts of
  * a reference column in the same row (`stampSet:46`), optionally
  * value-filtering the reference cells and dropping them from output. */
case class DependentColumnFilter(
    family: String, qualifier: Array[Byte],
    dropDependentColumn: Boolean = false,
    op: CompareOp.Value = CompareOp.NO_OP,
    cmp: ByteComparator = null) extends GFilter {
  override def apply(df: DataFrame): DataFrame = {
    val isRef = col("family") === family && col("qualifier") === lit(qualifier)
    val refPred = if (cmp == null || op == CompareOp.NO_OP) lit(true)
                  else cmp.compile(col("value"), op)
    val out = df
      .withColumn("_dc_ts", collect_set(when(isRef && refPred, col("ts"))).over(wRow))
      .filter(array_contains(col("_dc_ts"), col("ts")))
      .drop("_dc_ts")
    if (dropDependentColumn) out.filter(!isRef) else out
  }
}

/** `SkipFilter.java:48` — if the wrapped filter rejects ANY cell of a row,
  * drop the whole row. Wrapped filter must be per-cell expressible. */
case class SkipFilter(inner: GFilter) extends GFilter {
  override def apply(df: DataFrame): DataFrame = {
    val pred = inner.cellPredicate.getOrElse(
      throw new IllegalArgumentException("SkipFilter needs a per-cell inner filter"))
    df.withColumn("_sk", min(when(pred, 1).otherwise(0)).over(wRow))
      .filter(col("_sk") === 1).drop("_sk")
  }
}

/** `WhileMatchFilter.java:38` — take-while in row order: the first cell
  * rejection terminates the scan. The first failing row key is a 1-row
  * aggregate broadcast back into the plan (no driver collect). */
case class WhileMatchFilter(inner: GFilter) extends GFilter {
  override def apply(df: DataFrame): DataFrame = {
    val pred = inner.cellPredicate.getOrElse(
      throw new IllegalArgumentException("WhileMatchFilter needs a per-cell inner filter"))
    val stop = df.filter(!pred).agg(min(col("row")).as("_wm_stop"))
    df.crossJoin(broadcast(stop))
      .filter(col("_wm_stop").isNull || col("row") < col("_wm_stop"))
      .drop("_wm_stop")
  }
}

/** `FilterList.java:43` — boolean composition. AND composes transforms in
  * order (short-circuit order preserved); OR requires per-cell predicates
  * from every child, matching the subset of filters the reference can
  * meaningfully OR per cell. */
case class FilterList(op: FilterList.Op.Value, filters: Seq[GFilter]) extends GFilter {
  override def cellPredicate: Option[Column] = {
    val preds = filters.map(_.cellPredicate)
    if (preds.exists(_.isEmpty)) None
    else Some(op match {
      case FilterList.Op.MUST_PASS_ALL => preds.flatten.reduce(_ && _)
      case FilterList.Op.MUST_PASS_ONE => preds.flatten.reduce(_ || _)
    })
  }
  override def apply(df: DataFrame): DataFrame = cellPredicate match {
    case Some(p) => df.filter(p)
    case None => op match {
      case FilterList.Op.MUST_PASS_ALL => filters.foldLeft(df)((d, f) => f(d))
      case FilterList.Op.MUST_PASS_ONE =>
        throw new IllegalArgumentException(
          "MUST_PASS_ONE requires per-cell-expressible child filters")
    }
  }
}
object FilterList {
  object Op extends Enumeration { val MUST_PASS_ALL, MUST_PASS_ONE = Value }
  def and(filters: GFilter*): FilterList = FilterList(Op.MUST_PASS_ALL, filters)
  def or(filters: GFilter*): FilterList = FilterList(Op.MUST_PASS_ONE, filters)
}
