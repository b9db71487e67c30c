package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.types.IntegerType

/** `SparkSessionExtensions` entry point (SURVEY §2.9 — the custom-code
  * extension seam): registers the engine's native expressions so they
  * resolve by name in SQL and via `call_function`. Wired into every
  * session through `spark.sql.extensions` (see GraftSession). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_double_to_bits"),
      new ExpressionInfo(classOf[DoubleToBits].getName, "graft_double_to_bits"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DoubleToBits(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_bits_to_double"),
      new ExpressionInfo(classOf[BitsToDouble].getName, "graft_bits_to_double"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BitsToDouble(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_bits_to_long"),
      new ExpressionInfo(classOf[BitsToLong].getName, "graft_bits_to_long"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BitsToLong(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_bits_to_int"),
      new ExpressionInfo(classOf[BitsToInt].getName, "graft_bits_to_int"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BitsToInt(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hyperplane_band"),
      new ExpressionInfo(classOf[HyperplaneBand].getName, "graft_hyperplane_band"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
            what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_hyperplane_band $what must be an int literal, got $other")
        }
        HyperplaneBand(args(0), intLit(args(1), "band"), intLit(args(2), "width"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "graft_minhash_bands"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
            what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash_bands $what must be an int literal, got $other")
        }
        MinHashBands(args(0), intLit(args(1), "bands"), intLit(args(2), "rows"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_plane_bands"),
      new ExpressionInfo(classOf[PlaneBands].getName, "graft_plane_bands"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
            what: String): Int = e match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_plane_bands $what must be an int literal, got $other")
        }
        val flat = args(3) match {
          case Literal(v: org.apache.spark.sql.catalyst.util.ArrayData,
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.DoubleType, _)) =>
            v.toDoubleArray().toSeq
          case other => throw new IllegalArgumentException(
            s"graft_plane_bands planes must be an array<double> literal, got $other")
        }
        PlaneBands(args(0), intLit(args(1), "bands"), intLit(args(2), "width"), flat)
      }))
    def pqArgs(name: String,
        args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]):
        (org.apache.spark.sql.catalyst.expressions.Expression, Int, Int, Seq[Double]) = {
      import org.apache.spark.sql.catalyst.expressions.Literal
      def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
          what: String): Int = e match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"$name $what must be an int literal, got $other")
      }
      val flat = args(3) match {
        case Literal(v: org.apache.spark.sql.catalyst.util.ArrayData,
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType, _)) =>
          v.toDoubleArray().toSeq
        case other => throw new IllegalArgumentException(
          s"$name codebook must be an array<double> literal, got $other")
      }
      (args(0), intLit(args(1), "m"), intLit(args(2), "k"), flat)
    }
    ext.injectFunction((
      FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val (c, m, k, flat) = pqArgs("graft_pq_encode", args)
        PqEncode(c, m, k, flat)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[PqAdcTable].getName, "graft_pq_adc"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val (c, m, k, flat) = pqArgs("graft_pq_adc", args)
        PqAdcTable(c, m, k, flat)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "graft_winnow"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
            what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_winnow $what must be an int literal, got $other")
        }
        WinnowFingerprints(args(0), intLit(args(1), "k"), intLit(args(2), "window"))
      }))
  }
}
