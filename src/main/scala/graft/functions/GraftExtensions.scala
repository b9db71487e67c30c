package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}

/** `SparkSessionExtensions` entry point (SURVEY §2.9 — the custom-code
  * extension seam): registers the engine's native expressions so they
  * resolve by name in SQL and via `call_function`. Wired into every
  * session through `spark.sql.extensions` (see GraftSession). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Config args of the fused expressions must be LITERALS — they shape
    * the compiled kernel (band counts, codebook contents), so a
    * non-literal is a usage error reported eagerly at resolution. */
  private def intLit(name: String, what: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name $what must be an int literal, got $other")
  }

  private def doubleArrayLit(name: String, what: String, e: Expression): Seq[Double] =
    e match {
      case Literal(v: ArrayData, ArrayType(DoubleType, _)) =>
        v.toDoubleArray().toSeq
      case other => throw new IllegalArgumentException(
        s"$name $what must be an array<double> literal, got $other")
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_double_to_bits"),
      new ExpressionInfo(classOf[DoubleToBits].getName, "graft_double_to_bits"),
      (args: Seq[Expression]) => DoubleToBits(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_bits_to_double"),
      new ExpressionInfo(classOf[BitsToDouble].getName, "graft_bits_to_double"),
      (args: Seq[Expression]) => BitsToDouble(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_bits_to_long"),
      new ExpressionInfo(classOf[BitsToLong].getName, "graft_bits_to_long"),
      (args: Seq[Expression]) => BitsToLong(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_bits_to_int"),
      new ExpressionInfo(classOf[BitsToInt].getName, "graft_bits_to_int"),
      (args: Seq[Expression]) => BitsToInt(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hyperplane_band"),
      new ExpressionInfo(classOf[HyperplaneBand].getName, "graft_hyperplane_band"),
      (args: Seq[Expression]) => {
        HyperplaneBand(args(0),
          intLit("graft_hyperplane_band", "band", args(1)),
          intLit("graft_hyperplane_band", "width", args(2)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "graft_minhash_bands"),
      (args: Seq[Expression]) => {
        MinHashBands(args(0),
          intLit("graft_minhash_bands", "bands", args(1)),
          intLit("graft_minhash_bands", "rows", args(2)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_plane_bands"),
      new ExpressionInfo(classOf[PlaneBands].getName, "graft_plane_bands"),
      (args: Seq[Expression]) => {
        PlaneBands(args(0),
          intLit("graft_plane_bands", "bands", args(1)),
          intLit("graft_plane_bands", "width", args(2)),
          doubleArrayLit("graft_plane_bands", "planes", args(3)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
      (args: Seq[Expression]) => {
        PqEncode(args(0),
          intLit("graft_pq_encode", "m", args(1)),
          intLit("graft_pq_encode", "k", args(2)),
          doubleArrayLit("graft_pq_encode", "codebook", args(3)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[PqAdcTable].getName, "graft_pq_adc"),
      (args: Seq[Expression]) => {
        PqAdcTable(args(0),
          intLit("graft_pq_adc", "m", args(1)),
          intLit("graft_pq_adc", "k", args(2)),
          doubleArrayLit("graft_pq_adc", "codebook", args(3)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_pq_score"),
      new ExpressionInfo(classOf[PqAdcScore].getName, "graft_pq_score"),
      (args: Seq[Expression]) => PqAdcScore(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "graft_normalize"),
      (args: Seq[Expression]) => {
        val form = args(1) match {
          case Literal(v, _) if v != null => v.toString
          case other => throw new IllegalArgumentException(
            s"graft_normalize form must be a string literal, got $other")
        }
        UnicodeNormalize(args(0), form)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getName, "graft_strip_accents"),
      (args: Seq[Expression]) => StripAccents(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "graft_winnow"),
      (args: Seq[Expression]) => {
        WinnowFingerprints(args(0),
          intLit("graft_winnow", "k", args(1)),
          intLit("graft_winnow", "window", args(2)))
      }))
  }
}
