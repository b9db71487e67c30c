package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset splitting for training pipelines.
  * Everything derives from a salted md5 of a stable key — reproducible
  * across runs, executors, and engines (no RNG state, which this harness
  * bans and which at 100 TB would make splits non-reproducible across
  * retried tasks). Buckets are md5's first 60 bits mod `buckets`, so
  * fractions are exact to 1/buckets and independent per salt. */
object Sampling {

  val Buckets = 1000

  /** Stable bucket in [0, Buckets) for a key under a salt. */
  def bucket(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 15), 16, 10)
      .cast("long") % Buckets

  /** Deterministic fraction sample: keep rows whose bucket < frac*Buckets. */
  def sampleByHash(df: DataFrame, key: Column, frac: Double,
      salt: String = "sample"): DataFrame =
    df.filter(bucket(key, salt) < (frac * Buckets).toLong)

  /** Train/val/test split labels from cumulative fractions; fractions
    * must sum to <= 1, remainder labeled last. Different salts give
    * independent splits over the same data. */
  def splitLabel(key: Column, fracs: Seq[(String, Double)],
      salt: String = "split"): Column = {
    val b = bucket(key, salt)
    val (expr, _) = fracs.foldLeft((lit(null).cast("string"), 0.0)) {
      case ((acc, cum), (label, f)) =>
        val hi = cum + f
        (when(b >= (cum * Buckets).toLong && b < (hi * Buckets).toLong, label)
          .otherwise(acc), hi)
    }
    expr
  }

  /** Per-stratum deterministic sampling: an independent hash fraction
    * within each stratum value (the salt folds the stratum in, so
    * sampling one stratum never correlates with another). */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
      frac: Double, salt: String = "strat"): DataFrame =
    df.filter(
      conv(substring(md5(concat_ws("|", lit(salt), stratum.cast("string"),
        key.cast("string"))), 1, 15), 16, 10)
        .cast("long") % Buckets < (frac * Buckets).toLong)
}
