package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Pre-flight contract on the driver corpus: every load-bearing column the
  * battery ingests, with the SET of types the engine can adapt (not the one
  * type the last regen happened to ship). An upstream regeneration that
  * drifts outside the adaptable set fails here with one actionable line per
  * column — instead of N cryptic AnalysisExceptions deep inside unrelated
  * queries (the round-5 failure mode: events.ts flipped ns -> us and ten
  * event-time gates died at `CAST(ts AS BIGINT)`).
  *
  * Type classes:
  *  - `key`: integral (int/long) — row-key and join-key columns;
  *  - `text`/`real`: string / double;
  *  - `eventTime`: anything [[EventTime.nanos]] dispatches (long epoch-nanos,
  *    TIMESTAMP, TIMESTAMP_NTZ, date) — the adaptable event-time set;
  *  - `floatVec`: array<float|double> embeddings.
  */
object DataContract {

  private val key: DataType => Boolean = {
    case LongType | IntegerType | ShortType => true; case _ => false
  }
  private val text: DataType => Boolean = _ == StringType
  private val real: DataType => Boolean = {
    case DoubleType | FloatType => true; case _ => false
  }
  private val eventTime: DataType => Boolean = {
    case LongType | TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }
  // Calendar-time columns consumed DIRECTLY with timestamp semantics
  // (date-literal comparisons in Queries — no EventTime.normalize seam on
  // their ingest path). LongType is deliberately NOT adaptable here: a
  // regen shipping epoch-nanos longs for these would pass an `et` check
  // green and then die inside the first date comparison — the exact
  // false-negative this pre-flight exists to prevent.
  private val calTime: DataType => Boolean = {
    case TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }
  private val floatVec: DataType => Boolean = {
    case ArrayType(FloatType | DoubleType, _) => true; case _ => false
  }

  final case class Col(name: String, ok: DataType => Boolean, expects: String)
  private def k(n: String) = Col(n, key, "integral key (int/long)")
  private def s(n: String) = Col(n, text, "string")
  private def d(n: String) = Col(n, real, "double")
  private def et(n: String) =
    Col(n, eventTime, "event time (long epoch-nanos, timestamp[_ntz], or date)")
  private def ct(n: String) =
    Col(n, calTime, "calendar time (timestamp[_ntz] or date; epoch-long not " +
      "adaptable — column is compared against date literals with no normalize seam)")

  /** table -> the columns the battery's queries actually depend on. */
  val tables: Map[String, Seq[Col]] = Map(
    "region" -> Seq(k("r_regionkey"), s("r_name")),
    "nation" -> Seq(k("n_nationkey"), s("n_name"), k("n_regionkey")),
    "customer" -> Seq(k("c_custkey"), s("c_name"), k("c_nationkey"),
      d("c_acctbal"), s("c_mktsegment")),
    "supplier" -> Seq(k("s_suppkey"), s("s_name")),
    "part" -> Seq(k("p_partkey"), s("p_name")),
    "orders" -> Seq(k("o_orderkey"), k("o_custkey"), s("o_orderstatus"),
      d("o_totalprice"), ct("o_orderdate"), s("o_orderpriority")),
    "lineitem" -> Seq(k("l_orderkey"), d("l_quantity"), d("l_extendedprice"),
      d("l_discount"), d("l_tax"), s("l_returnflag"), s("l_linestatus"),
      ct("l_shipdate")),
    "events" -> Seq(k("event_id"), et("ts"), k("user_id"), s("event_type"),
      d("value"), s("props")),
    "documents" -> Seq(k("doc_id"), s("text"), s("lang"), s("source")),
    "embeddings" -> Seq(k("vec_id"),
      Col("embedding", floatVec, "array<float|double>")))

  private def firstLine(e: Throwable): String =
    Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
      .takeWhile(_ != '\n').take(200)

  /** One actionable line per drifted column in `dir`'s parquet tables:
    * `table.column: TYPE not adaptable (expected CLASS) — fix: ...`.
    * Empty = the corpus is inside the engine's adaptable envelope. */
  def violations(spark: SparkSession, dir: String): Seq[String] =
    tables.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val path = s"$dir/$table.parquet"
      if (!new java.io.File(path).exists())
        Seq(s"$table: missing $path — regenerate the corpus or point at the right sf dir")
      else {
        // The ADAPTIVE read is the schema the engine actually ingests:
        // TIMESTAMP(NANOS) columns (unreadable under the inferred NTZ on
        // Spark 4.1) surface here as LongType epoch-nanos — adaptable —
        // exactly as EventTime.readAdaptive will hand them to queries.
        val inferred =
          try Right(EventTime.readAdaptive(spark, path).schema)
          catch { case e: Throwable => Left(firstLine(e)) }
        inferred match {
          case Left(err) => Seq(s"$table: schema inference failed ($err)")
          case Right(schema) =>
            val colIssues = cols.flatMap { c =>
              schema.fields.find(_.name == c.name) match {
                case None => Some(s"$table.${c.name}: column absent " +
                  s"(schema has ${schema.fieldNames.mkString(", ")})")
                case Some(f) if !c.ok(f.dataType) =>
                  Some(s"$table.${c.name}: ${f.dataType.simpleString} not adaptable " +
                    s"(expected ${c.expects}) — extend the ingest dispatch " +
                    "(graft.core.EventTime / CellCodec) or fix the generator")
                case _ => None
              }
            }
            // A type can pass the schema check and still be unreadable
            // (page corruption; an encoding the reader rejects). The
            // pre-flight exists to catch exactly this class before it
            // becomes N mid-query failures, so probe one row for real —
            // through the same adaptive reader the engine ingests with.
            if (colIssues.nonEmpty) colIssues
            else try { EventTime.readAdaptive(spark, path).limit(1).collect(); Nil }
            catch { case e: Throwable =>
              Seq(s"$table: types adaptable but file UNREADABLE at row level " +
                s"(${firstLine(e)}) — fix the generator's physical encoding " +
                "or repair the file")
            }
        }
      }
    }

  /** Throws with ALL violations in one message (not just the first — a
    * regen usually drifts several columns at once). */
  def enforce(spark: SparkSession, dir: String): Unit = {
    val v = violations(spark, dir)
    if (v.nonEmpty) throw new IllegalStateException(
      s"data contract violated for $dir:\n  ${v.mkString("\n  ")}")
  }
}
