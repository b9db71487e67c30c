package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: assign documents, in stable `id` order, to
  * contiguous fixed-token-budget bins ("sequences") — the deterministic
  * variant of the pack-to-context-length step every LLM data pipeline
  * runs before tokenized examples hit the trainer. Bins are the fixed
  * budget-sized windows of the concatenated token stream; a document
  * lands in the window its first token falls in
  * (`floor(tokensBefore / budget)`), so bins are contiguous runs in id
  * order, fill to ~budget when documents are small relative to the
  * budget (a boundary-straddling document credits its overflow to its
  * own bin), and the assignment is a pure function of the data — no
  * partitioner, scheduler, or RNG dependence; re-running at any
  * parallelism yields byte-identical packs.
  *
  * Scale shape: the naive formulation is one global running sum — a
  * single-partition window, the classic 100 TB killer. This implements
  * the two-pass distributed prefix sum instead: bucket by id into
  * quantile ranges whose boundaries are driver-collected LITERALS (so
  * the bucket of a row is a pure function of its id, stable across
  * re-executions — see the stage-1 comment for why a physical
  * partition id is not), per-bucket running sums (parallel,
  * bucket-local sort), then a driver-side prefix over the k per-bucket
  * TOTALS (k = bucket count, a few hundred longs — the only thing that
  * ever visits the driver) broadcast back as each bucket's starting
  * offset. */
object Pack {

  /** (id, n_tok, seq_id) per input row. `tokens` is the per-row token
    * count expression (e.g. `Text.tokenCount(col("text"))`). */
  def packSequences(df: DataFrame, idCol: String, tokens: Column,
      budget: Long, numPartitions: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    val nPart = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val base = df.select(col(idCol).as("id"), tokens.cast("long").as("n_tok"))
    // Stage 1: deterministic id-range buckets. The bucket boundaries are
    // approximate quantiles COLLECTED ONCE and embedded as literals, so
    // `_pid` is a PURE FUNCTION OF id — identical on every execution of
    // this frame. The previous formulation stamped
    // `spark_partition_id()` after a repartitionByRange, which is a
    // property of the PHYSICAL plan, not the data: this frame executes
    // twice (the totals collect below, then the final join), and AQE may
    // coalesce the two executions differently, silently misaligning the
    // collected offsets with the joined rows. Invisible at oracle scales
    // (both executions coalesce identically); caught by the sf1
    // scale-stress as a 2% bin drift (BENCH_SF1.md).
    val probs = (1 until nPart).map(_.toDouble / nPart).toArray
    val bounds: Seq[Long] =
      if (nPart <= 1) Nil
      else base.stat.approxQuantile("id", probs, 0.001)
        .map(_.toLong).toSeq.distinct
    val pidExpr =
      if (bounds.isEmpty) lit(0)
      else size(filter(typedLit(bounds), b => b <= col("id")))
    val parts = base.withColumn("_pid", pidExpr)
    // Stage 2: per-bucket running sum of tokens BEFORE each row (the
    // window's own hash exchange on _pid replaces the explicit range
    // repartition — each bucket sorts locally by id).
    val w = Window.partitionBy("_pid").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parts.withColumn("_pre", coalesce(sum("n_tok").over(w), lit(0L)))
    // Stage 3: k bucket totals -> driver prefix -> broadcast offsets.
    // Buckets ascend with id by construction (quantiles are sorted), so
    // the pid-ordered prefix of totals IS the id-ordered global prefix.
    val totals = local.groupBy("_pid").agg(sum("n_tok").as("_tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, tot) =>
      val o = (pid, acc); acc += tot; o
    }
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("_pid", "_off"))
    local.join(offDf, "_pid")
      // `div`: exact integer division — a double-rounded floor() would
      // misplace bin boundaries once global token counts pass 2^53
      .withColumn("seq_id", expr(s"(_off + _pre) div ${budget}L"))
      .select(col("id"), col("n_tok"), col("seq_id"))
  }

  /** Per-sequence roll-up of [[packSequences]] — the pack manifest
    * (sequence -> document span + token count) a trainer's loader reads. */
  def packManifest(df: DataFrame, idCol: String, tokens: Column,
      budget: Long, numPartitions: Int = 0): DataFrame =
    packSequences(df, idCol, tokens, budget, numPartitions)
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("seq_tokens"),
        min("id").as("min_id"), max("id").as("max_id"))

  /** Context-window chunking: split each document's token stream into
    * windows of `maxTokens` advancing by `stride` tokens (stride <
    * maxTokens overlaps consecutive chunks by `maxTokens - stride`) —
    * the split-long-documents step that runs BEFORE [[packSequences]]
    * in an LLM pipeline (a document longer than the context window must
    * be cut; the overlap preserves cross-boundary context).
    *
    * Window starts are 1, 1+stride, …, capped at `max(n - overlap, 1)`
    * so the final window reaches the document's end WITHOUT emitting a
    * trailing chunk that is a pure suffix of its predecessor. Every
    * token lands in at least one chunk; an empty document emits no
    * chunks.
    *
    * Scale shape: zero shuffles — one codegen'd per-row pass
    * (`sequence` of starts, `transform` + `slice` windows, `posexplode`).
    * Output rows = chunk count, ~`n/stride` per document.
    *
    * Output: `(idCol, chunk_id, chunk_text, n_tokens)` with `chunk_id`
    * 0-based in document order. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, stride: Int): DataFrame = {
    require(maxTokens >= 1, "maxTokens must be >= 1")
    require(stride >= 1 && stride <= maxTokens,
      s"stride must be in [1, maxTokens]; got stride=$stride max=$maxTokens")
    val overlap = maxTokens - stride
    // Tokens materialize as an ATTRIBUTE before the chunk lambda slices
    // them: an inline Text.tokens(text) would re-run the whitespace
    // split per chunk (no CSE inside HOF lambdas — the Text.shinglesOf
    // hazard), turning a linear pass quadratic on long documents.
    val ts = col("_ts")
    val n = size(ts)
    // sequence(start, stop) descends when stop < start — guard empties
    val starts = when(n === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(1), greatest(n - lit(overlap), lit(1)),
        lit(stride)))
    val chunks = transform(starts, s => struct(
      array_join(slice(ts, s, lit(maxTokens)), " ").as("chunk_text"),
      least(lit(maxTokens), n - s + 1).cast("long").as("n_tokens")))
    df.select(col(idCol), graft.pipeline.Text.tokens(col(textCol)).as("_ts"))
      .select(col(idCol), posexplode(chunks).as(Seq("chunk_id", "_c")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        col("_c.chunk_text").as("chunk_text"),
        col("_c.n_tokens").as("n_tokens"))
  }
}
