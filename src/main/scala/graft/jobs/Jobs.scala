package graft.jobs

import graft.core.{Bytes, CellCodec, CellKind}
import graft.read.{Scan, ScanExec}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's MapReduce analytics/ETL layer (SURVEY §2.1, §2.4, §3.3)
  * as Spark jobs. Each MR job is one declarative pipeline; splits-per-region
  * ≅ parquet partitions, `TableMapper` ≅ the transform, counters ≅ aggs. */
object Jobs {

  /** `RowCounter` (`hbase/mapreduce/RowCounter.java:40`): rows with >= 1
    * non-empty visible cell. */
  def rowCount(cells: DataFrame, scan: Scan = Scan()): Long =
    ScanExec(cells, scan)
      .filter(col("value").isNotNull && length(col("value")) > 0)
      .select("row").distinct().count()

  /** `CopyTable` (`CopyTable.java:36`): scan source (optional time window
    * + family projection), rewrite rows into the target cell table.
    * Tombstone-resolved: the copy contains the VISIBLE state, like a
    * CopyTable into an empty target. */
  def copyTable(cells: DataFrame,
      startTime: Option[Long] = None, endTime: Option[Long] = None,
      families: Option[Set[String]] = None,
      maxVersions: Int = 1): DataFrame = {
    var scan = Scan().setMaxVersions(maxVersions)
    (startTime, endTime) match {
      case (Some(lo), Some(hi)) => scan = scan.setTimeRange(lo, hi)
      case (Some(lo), None) => scan = scan.setTimeRange(lo, Long.MaxValue)
      case (None, Some(hi)) => scan = scan.setTimeRange(0L, hi)
      case _ =>
    }
    families.foreach(fs => fs.foreach(f => scan = scan.addFamily(f)))
    ScanExec(cells, scan)
  }

  /** `Export` (`Export.java:41`): scan -> file sink. Parquet plays the
    * SequenceFile role; the dump keeps the cell schema so `importTable`
    * round-trips. */
  def exportTable(cells: DataFrame, dir: String, scan: Scan = Scan()): Unit =
    ScanExec(cells, scan).write.mode("overwrite").parquet(dir)

  /** `Import` (`Import.java:39`): read an export, yielding put cells to
    * merge into a target table. */
  def importTable(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** `ImportTsv` (`ImportTsv.java:57`): TSV bulk ingestion with the
    * reference's column-spec grammar `HBASE_ROW_KEY,fam:qual,...`
    * (`:95-140`). Lines with a wrong field count are counted as "bad
    * lines" and skipped (`:216` BadTsvLineException -> counter), returned
    * here so callers can assert ingestion quality. */
  def importTsv(spark: SparkSession, path: String, columnSpec: Seq[String],
      ts: Long, separator: String = "\t"): (DataFrame, Long) = {
    require(columnSpec.contains("HBASE_ROW_KEY"), "spec needs HBASE_ROW_KEY")
    val raw = spark.read.option("sep", separator).csv(path)
    val n = columnSpec.length
    val okCol = raw.columns.take(n).map(col(_).isNotNull).reduce(_ && _) &&
      size(array(raw.columns.map(col): _*)) >= n
    // ONE counting pass for the bad-line counter (the r01 formulation ran
    // raw.count() + good.count() — two extra full scans of a bulk-ingest
    // input); the good-line frame itself stays lazy for the write job.
    val counts = raw.agg(
      count(lit(1)).as("_total"), count(when(okCol, 1)).as("_good")).head()
    val bad = counts.getLong(0) - counts.getLong(1)
    val good = raw.filter(okCol)
    val keyIdx = columnSpec.indexOf("HBASE_ROW_KEY")
    val rowCol = col(raw.columns(keyIdx)).cast(BinaryType)
    val cellCols = columnSpec.zipWithIndex.filter(_._1 != "HBASE_ROW_KEY")
    val entries = cellCols.map { case (spec, i) =>
      val Array(fam, qual) = spec.split(":", 2)
      struct(lit(fam).as("family"),
        lit(Bytes.toBytes(qual)).as("qualifier"),
        col(raw.columns(i)).cast(BinaryType).as("value"))
    }
    val cells = good
      .select(rowCol.as("row"), explode(array(entries: _*)).as("_e"))
      .select(col("row"), col("_e.family").as("family"),
        col("_e.qualifier").as("qualifier"), lit(ts).as("ts"),
        lit(CellKind.Put).as("kind"), col("_e.value").as("value"),
        lit(0L).as("seq"))
      .filter(col("value").isNotNull)
    (cells, bad)
  }

  /** JSON-lines bulk ingestion — the document-pipeline analog of
    * `ImportTsv` (`ImportTsv.java:57`): one JSON object per line,
    * `rowKeyField` names the key field, every other top-level field
    * becomes a cell in `family` under its field name (values serialized
    * as their string form; nested values as canonical JSON via to_json).
    * Corrupt lines and lines missing the key are counted, not fatal —
    * the same bad-line counter contract as importTsv, in one counting
    * pass. Pass `schema` to skip the sampled inference pass at scale. */
  def importJson(spark: SparkSession, path: String, family: String,
      rowKeyField: String, ts: Long,
      schema: Option[StructType] = None): (DataFrame, Long) = {
    val corrupt = "_corrupt_record"
    val reader = spark.read
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", corrupt)
    val raw = schema.fold(reader)(sc => reader.schema(
        if (sc.fieldNames.contains(corrupt)) sc
        else sc.add(StructField(corrupt, StringType))))
      .json(path)
    // PERMISSIVE mode only materializes the corrupt column if the scan
    // selects it; inferred schemas omit it when every line parsed clean
    val hasCorrupt = raw.columns.contains(corrupt)
    require(raw.columns.contains(rowKeyField),
      s"row-key field $rowKeyField absent from JSON schema")
    val okCol = (if (hasCorrupt) col(corrupt).isNull else lit(true)) &&
      col(rowKeyField).isNotNull
    val counts = raw.agg(
      count(lit(1)).as("_total"), count(when(okCol, 1)).as("_good")).head()
    val bad = counts.getLong(0) - counts.getLong(1)
    val good = raw.filter(okCol)
    def asText(f: StructField): Column = f.dataType match {
      case _: StructType | _: ArrayType | _: MapType => to_json(col(f.name))
      case _ => col(f.name).cast(StringType)
    }
    val entries = raw.schema.fields
      .filter(f => f.name != rowKeyField && f.name != corrupt)
      .map(f => struct(lit(Bytes.toBytes(f.name)).as("qualifier"),
        asText(f).cast(BinaryType).as("value")))
    val cells = good
      .select(col(rowKeyField).cast(StringType).cast(BinaryType).as("row"),
        explode(array(entries.toIndexedSeq: _*)).as("_e"))
      .select(col("row"), lit(family).as("family"),
        col("_e.qualifier").as("qualifier"), lit(ts).as("ts"),
        lit(CellKind.Put).as("kind"), col("_e.value").as("value"),
        lit(0L).as("seq"))
      .filter(col("value").isNotNull)
    (cells, bad)
  }

  /** `MultiTableOutputFormat` (`MultiTableOutputFormat.java:58`): route a
    * cell batch carrying a table-name column into multiple catalog
    * tables. Only the table-name list (small by construction) crosses the
    * driver; each table's slice is appended as a distributed write. */
  def multiTableWrite(g: graft.Graft, cells: DataFrame, tableCol: String,
      nowMs: Long): Seq[String] = {
    val tables = cells.select(tableCol).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    tables.foreach { t =>
      g.catalog.append(t, cells.filter(col(tableCol) === t).drop(tableCol), nowMs)
    }
    tables
  }

  /** Interval (range) join: every (left, right) pair with equal keys and
    * `leftTs` inside `[rightStart, rightEnd]` — the time-window companion
    * of [[asOfJoin]] (point-in-range rather than latest-at-or-before).
    *
    * Catalyst plans a raw `l.key = r.key AND l.ts BETWEEN r.s AND r.e`
    * join as an equi-join on the key with the range as a residual filter,
    * which is quadratic per key — a hot key (one user, one tenant) makes
    * that pairing explode. This formulation bins time at `binWidth`:
    * right intervals explode to the bins they overlap, left points map to
    * their single bin, and the join is a pure equi-join on (key, bin)
    * with the exact range refine on top. Each qualifying pair meets in
    * exactly one bin — the left point's — so no dedup pass is needed.
    * Per-key cost drops from |L_k| x |R_k| to the per-bin co-occupancy,
    * and the shuffle key (key, bin) splits hot keys across partitions.
    *
    * `binWidth` (in `leftTs` units) should be near the typical interval
    * length: much smaller multiplies the right side's bin fan-out
    * (`maxBinsPerRow` bounds it — an interval wider than
    * `binWidth * maxBinsPerRow` throws rather than silently exploding),
    * much larger re-creates per-bin hot spots. Intervals with
    * `end < start` yield no pairs, like SQL BETWEEN. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTs: Column, rightStart: Column, rightEnd: Column,
      binWidth: Long, maxBinsPerRow: Int = 4096): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // `div` (integral), never `/`: Column `/` on longs is DOUBLE division,
    // and epoch-nanos exceed 2^53 — boundary bins would misalign between
    // the two sides. Truncating div is monotonic, so an interval's bin
    // range [div(s), div(e)] always covers div(ts) for ts in [s, e].
    def binOf(c: String): Column = expr(s"$c div ${binWidth}L")
    val l = left.select(leftKey.as("_k"), leftTs.as("_lts"),
        struct(left.columns.map(col): _*).as("_l"))
      .withColumn("_lbin", binOf("_lts"))
    val r = right.select(rightKey.as("_rk"), rightStart.as("_s"), rightEnd.as("_e"),
        struct(right.columns.map(col): _*).as("_r"))
      .filter(col("_s") <= col("_e"))
      .withColumn("_nb", binOf("_e") - binOf("_s") + 1)
      // assert_true returns NULL on success, so the filter keeps every row
      // and an over-wide interval fails the job with a labeled error
      // instead of silently exploding the bin fan-out
      .filter(assert_true(col("_nb") <= maxBinsPerRow,
        lit(s"intervalJoin: interval spans more than maxBinsPerRow=" +
          s"$maxBinsPerRow bins; widen binWidth")).isNull)
      .withColumn("_rbin", explode(sequence(binOf("_s"), binOf("_e"))))
    l.join(r, col("_k") === col("_rk") && col("_lbin") === col("_rbin") &&
        col("_lts") >= col("_s") && col("_lts") <= col("_e"))
      .select(col("_l"), col("_r"))
  }

  /** As-of join — the reference's closest-row-before lookup
    * (`Store.getRowKeyAtOrBefore:980`, `GetClosestRowBeforeTracker`)
    * generalized to a relational operator: for every left row, the latest
    * right row with the same key and `rightTs <= leftTs`.
    *
    * Single-pass window formulation (no range-join explosion): union both
    * sides tagged, sort within key by (ts, tag) with right rows first at
    * equal ts, carry the last seen right payload forward with
    * `last(ignoreNulls)`, keep left rows. One exchange on the key, one
    * sort — survives arbitrarily large sides (vs broadcasting or
    * per-key collect). */
  def asOfJoin(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column, leftTs: Column, rightTs: Column,
      payloadCols: Seq[String]): DataFrame = {
    val lCols = Seq(leftKey.as("_k"), leftTs.as("_ts"), lit(1).as("_side")) ++
      left.columns.map(c => col(c)) ++
      payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_p_$c"))
    val rCols = Seq(rightKey.as("_k"), rightTs.as("_ts"), lit(0).as("_side")) ++
      left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
      payloadCols.map(c => col(c).as(s"_p_$c"))
    val l = left.select(lCols: _*)
    val r = right.select(rCols: _*)
    val w = Window.partitionBy("_k")
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var joined = l.unionByName(r)
    for (c <- payloadCols)
      joined = joined.withColumn(s"_p_$c",
        last(col(s"_p_$c"), ignoreNulls = true).over(w))
    joined.filter(col("_side") === 1)
      .select(left.columns.map(col) ++
        payloadCols.map(c => col(s"_p_$c").as(c)): _*)
  }

  /** `GroupingTableMapper` (`GroupingTableMapper.java:39`): build the MR
    * group key by concatenating chosen columns' values space-joined
    * (`createGroupKey:134`), generalized straight to `groupBy`. */
  def groupingKey(resolved: DataFrame, family: String,
      qualifiers: Seq[Array[Byte]]): DataFrame = {
    val pivoted = resolved
      .filter(col("family") === family &&
        col("qualifier").isin(qualifiers.map(lit(_)): _*))
      .groupBy("row")
      .agg(map_from_entries(
        collect_list(struct(col("qualifier").cast(StringType), col("value"))))
        .as("_m"))
    val parts = qualifiers.map(q =>
      col("_m").getItem(new String(q, "UTF-8")).cast(StringType))
    pivoted
      .filter(parts.map(_.isNotNull).reduce(_ && _)) // mapper skips rows missing a grouped column
      .select(col("row"), concat_ws(" ", parts: _*).as("groupKey"))
  }
}
