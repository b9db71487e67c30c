package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality signals, language ID, and
  * document fingerprinting. Everything is built from codegen'd Spark
  * builtins (no UDFs) so the whole stage stays in WholeStageCodegen and
  * scales linearly — the difference between a 100 TB pass finishing or
  * not is precisely whether these run inside codegen or as black boxes.
  */
object Text {

  /** Whitespace tokenization, empty-safe: trim first, drop empties. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** Unicode normalization (NFC/NFD/NFKC/NFKD) — the canonicalization
    * every hash-based operator in this package assumes has ALREADY run
    * at ingest ("é" has two byte spellings; exact dedup, shingles, and
    * winnowing fingerprints all diverge on un-normalized text). Native
    * codegen'd expression ([[graft.functions.UnicodeNormalize]]); DuckDB
    * twin `nfc_normalize`. */
  def normalize(text: Column, form: String = "NFC"): Column =
    graft.functions.TextFunctions.normalize(text, form)

  /** Accent strip pinned to utf8proc/DuckDB `strip_accents` semantics:
    * canonical decompose, drop Mn/Mc/Me marks, no recompose, no compat
    * folding (ß, ﬁ, Æ, Ł survive verbatim). */
  def stripAccents(text: Column): Column =
    graft.functions.TextFunctions.stripAccents(text)

  /** Canonical match/dedup key: NFC -> full Unicode lowercase -> accent
    * strip. Oracle twin: `strip_accents(lower(nfc_normalize(x)))`. */
  def canonicalFold(text: Column): Column =
    graft.functions.TextFunctions.canonicalFold(text)

  /** Token COUNT. `regexp_count(text, "\S+")` is value-identical (a
    * token is exactly a maximal `\S+` run) and beat this form ~1.3x in a
    * single-expression microbench, but was tried and REJECTED (r17,
    * measured): in composed pipelines the count is referenced by several
    * operators (a pushed filter, projections, a join side), each
    * evaluation is a fresh full regex pass, and curation_pipeline went
    * 1.94 -> 2.94 s. The split form's array is built once per operator
    * and the per-element `filter` lambda, though interpreted, touches
    * only array entries — cheaper than re-scanning the string. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count approximation: words + punctuation marks each
    * count, long words count ceil(len/4) pieces — a deterministic stand-in
    * for a real BPE vocab (which would be a broadcast lookup table).
    *
    * One codegen'd regex pass: greedy non-overlapping `\S{1,4}` matches
    * chunk each token left-to-right into ceil(len/4) pieces (4,4,...,rest
    * — matches cannot cross whitespace), so the count equals the old
    * interpreted `aggregate(transform(tokens))` sum bit-for-bit. */
  def tokenCountBpeIsh(text: Column): Column =
    (regexp_count(text, lit("\\S{1,4}")).cast("long") +
      length(regexp_replace(text, "[^.,!?;:]", ""))).cast("long")

  /** Per-document quality signals (length/punct/stopword ratios) — the
    * standard pre-training quality heuristics, each a plain column so
    * thresholds stay a downstream `filter`. */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Count of whitespace tokens whose LOWERCASE equals a member of
    * `words` — one codegen'd `regexp_count` pass over the lowered,
    * whitespace-normalized text, value-identical to the interpreted
    * `size(filter(tokens, lower(_).isin(words)))` HOF it replaces
    * (measured ~4x the cost of the whole scan for the 4-profile langid):
    * after `\s+ -> " "` a token is exactly a maximal run between
    * spaces/ends, the zero-width boundary assertions match whole tokens
    * only, and alternation backtracking (longest-first, quoted) makes
    * membership exact. */
  private def tokenSetCount(text: Column, words: Seq[String]): Column = {
    val alt = words.sortBy(w => (-w.length, w))
      .map(java.util.regex.Pattern.quote).mkString("|")
    regexp_count(lower(regexp_replace(trim(text), "\\s+", " ")),
      lit("(?:^|(?<= ))(?:" + alt + ")(?= |$)"))
  }

  def qualitySignals(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCount(t)
    df.withColumn("n_chars_m", length(t).cast("long"))
      .withColumn("n_tokens", nTok.cast("long"))
      // sum of token lengths == count of non-whitespace chars (tokens
      // partition them): one codegen'd regex pass instead of the
      // interpreted per-element aggregate() HOF; same long -> double
      // arithmetic, so emitted doubles are bit-identical.
      .withColumn("avg_token_len",
        when(col("n_tokens") > 0,
          length(regexp_replace(t, "\\s", ""))
            .cast("double") / col("n_tokens")).otherwise(lit(0.0)))
      .withColumn("punct_ratio",
        length(regexp_replace(t, "[^.,!?;:]", "")).cast("double") /
          greatest(length(t), lit(1)))
      .withColumn("stopword_ratio",
        tokenSetCount(t, EnglishStopwords).cast("double") /
          greatest(col("n_tokens"), lit(1L)))
  }

  /** The Gopher quality rules (Rae et al. 2021, MassiveText filtering —
    * the heuristic set RefinedWeb/Dolma reuse): per-document pass flags
    * for each published rule plus the conjunction `gopher_pass`.
    *
    *   1. 50 <= word count <= 100,000
    *   2. 3 <= mean word length <= 10
    *   3. symbol-to-word ratio (# and ...) <= 0.1
    *   4. <= 90% of lines start with a bullet (• - *)
    *   5. <= 30% of lines end with an ellipsis
    *   6. >= 80% of words contain an alphabetic character
    *   7. contains >= 2 of the 8 Gopher stop words
    *
    * Every ratio threshold is CROSS-MULTIPLIED into integer arithmetic
    * (e.g. rule 6 is `5*alpha_words >= 4*n_words`), so pass/fail
    * decisions carry no float grid at all — an independent engine
    * reproduces each flag exactly, and no boundary document can flip on
    * rounding. One narrow codegen'd pass, no shuffle, no UDFs. */
  def gopherRules(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val lines = col("_g_ls")
    val nw = col("n_words")
    val nl = greatest(size(lines).cast("long"), lit(1L))
    // sum of token lengths == count of non-whitespace chars (tokens
    // partition them): one codegen'd pass, replacing the interpreted
    // per-token aggregate() — same identity as qualitySignals'
    // avg_token_len numerator.
    val sumLen = length(regexp_replace(t, "\\s", "")).cast("long")
    val hashes = (length(t) - length(regexp_replace(t, "#", ""))).cast("long")
    // non-overlapping "..." count, times 3 (avoids any division)
    val ell3 = (length(t) -
      length(regexp_replace(t, "\\.\\.\\.", ""))).cast("long")
    // one regexp_count match per token containing a letter, replacing the
    // interpreted filter(rlike) lambda: a match's trailing \S* is greedy
    // to the token's end (it cannot cross whitespace), so a
    // letter-bearing token yields exactly one match and a letterless
    // token none.
    val alphaW = regexp_count(t, lit("\\S*[A-Za-z]\\S*")).cast("long")
    // Line-level rules stay as array HOFs on purpose: the lambdas run
    // per LINE (a handful per document — this corpus is single-line),
    // not per token, so the interpreted cost is noise; the regex
    // equivalents would need multiline anchors with their own \r edge
    // cases for no measurable win.
    val bulletL = size(filter(lines, x =>
      x.startsWith("•") || x.startsWith("-") || x.startsWith("*")))
      .cast("long")
    val ellipsisL = size(filter(lines, x => x.endsWith("..."))).cast("long")
    // distinct stop words present as whole lowercase tokens: extract the
    // boundary-anchored alternation's matches (the same token-exactness
    // argument as tokenSetCount) and count distinct — one codegen'd
    // regex pass, where the old form ran an interpreted transform+
    // array_contains scan of the token array PER stop word.
    val stopAlt = GopherStopwords.sortBy(w => (-w.length, w))
      .map(java.util.regex.Pattern.quote).mkString("|")
    val stopHits = size(array_distinct(regexp_extract_all(
      lower(regexp_replace(trim(t), "\\s+", " ")),
      lit("(?:^|(?<= ))(?:" + stopAlt + ")(?= |$)"), lit(0)))).cast("long")
    df.withColumn("_g_ls", filter(
        transform(split(t, "\n"), x => trim(x)), x => x =!= ""))
      .withColumn("n_words", tokenCount(t).cast("long"))
      .withColumn("rule_word_count", nw >= 50L && nw <= 100000L)
      .withColumn("rule_mean_word_len",
        lit(3L) * nw <= sumLen && sumLen <= lit(10L) * nw)
      // 10*(hashes + ell3/3) <= nw  <=>  10*(3*hashes + ell3) <= 3*nw
      .withColumn("rule_symbol_ratio",
        lit(10L) * (lit(3L) * hashes + ell3) <= lit(3L) * nw)
      .withColumn("rule_bullet_lines", lit(10L) * bulletL <= lit(9L) * nl)
      .withColumn("rule_ellipsis_lines", lit(10L) * ellipsisL <= lit(3L) * nl)
      .withColumn("rule_alpha_words", lit(5L) * alphaW >= lit(4L) * nw)
      .withColumn("rule_stop_words", stopHits >= 2L)
      .withColumn("gopher_pass",
        col("rule_word_count") && col("rule_mean_word_len") &&
        col("rule_symbol_ratio") && col("rule_bullet_lines") &&
        col("rule_ellipsis_lines") && col("rule_alpha_words") &&
        col("rule_stop_words"))
      .drop("_g_ls")
  }

  /** Rule 7's closed list (Rae et al. 2021 Appendix A). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The C4 cleaning heuristics (Raffel et al. 2020 §2.2 — the other
    * canonical published rule set besides [[gopherRules]]; both C4 and
    * its descendants apply line-level retention THEN page-level flags):
    *
    * Line retention (`text_clean` keeps a line iff all three hold):
    *   - ends in a terminal punctuation mark (`.` `!` `?` or a closing
    *     double quote — the paper's list);
    *   - has at least 3 whitespace words;
    *   - does not contain "javascript" (case-insensitive — the paper
    *     drops lines with the word Javascript).
    *
    * Page flags (over the ORIGINAL text except where noted):
    *   - `rule_min_sentences`: the CLEANED text carries >= 5 terminal
    *     punctuation marks (the paper discards pages under 5 sentences);
    *   - `rule_no_lorem`: no "lorem ipsum" (case-insensitive);
    *   - `rule_no_brace`: no curly bracket (code, not prose);
    *   - `c4_keep` = the conjunction.
    *
    * The paper's "bad words" list is licensing-encumbered and therefore
    * NOT bundled; callers with a list compose [[linearScore]] or a plain
    * `rlike` filter. Every threshold is an integer count — no float can
    * flip a boundary page. One narrow codegen'd pass, no shuffle. */
  def c4Rules(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    def lineWords(x: Column): Column =
      size(filter(split(x, "\\s+"), w => w =!= ""))
    def keepLine(x: Column): Column =
      (x.endsWith(".") || x.endsWith("!") || x.endsWith("?") ||
        x.endsWith("\"")) &&
      lineWords(x) >= 3 && !lower(x).contains("javascript")
    val clean = col("text_clean")
    val sentinels = length(clean) - length(regexp_replace(clean, "[.!?]", ""))
    df.withColumn("_c4_ls", filter(
        transform(split(t, "\n"), x => trim(x)), x => x =!= ""))
      .withColumn("_c4_kept", filter(col("_c4_ls"), keepLine(_)))
      .withColumn("text_clean", array_join(col("_c4_kept"), "\n"))
      .withColumn("n_lines", size(col("_c4_ls")).cast("long"))
      .withColumn("n_kept_lines", size(col("_c4_kept")).cast("long"))
      .withColumn("rule_min_sentences", sentinels >= 5)
      .withColumn("rule_no_lorem", !lower(t).contains("lorem ipsum"))
      .withColumn("rule_no_brace", !(t.contains("{") || t.contains("}")))
      .withColumn("c4_keep", col("rule_min_sentences") &&
        col("rule_no_lorem") && col("rule_no_brace"))
      .drop("_c4_ls", "_c4_kept")
  }

  /** Language ID via stopword-profile scoring — the classic trigram/
    * stopword heuristic (no model): score each language by the fraction
    * of tokens in its closed-class word list, pick the argmax, "und"
    * (undetermined) when no profile scores above `minScore`. */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
      "that", "for", "with", "as", "on", "be"),
    "de" -> Seq("der", "die", "das", "und", "oder", "von", "zu", "im", "ist",
      "es", "den", "mit", "auf", "für", "ein", "eine", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "ou", "de", "du", "des", "est", "il",
      "un", "une", "dans", "pour", "que", "pas", "sur"),
    "es" -> Seq("el", "la", "los", "las", "y", "o", "de", "del", "es", "en",
      "un", "una", "que", "no", "por", "con", "para"))

  /** Prefer [[withLangId]] on hot paths (tokens as attribute). */
  def langId(text: Column, minScore: Double = 0.08): Column =
    langIdOf(text, minScore)

  def withLangId(df: DataFrame, textCol: String, out: String = "lang_guess",
      minScore: Double = 0.08): DataFrame =
    df.withColumn(out, langIdOf(col(textCol), minScore))

  /** Per-profile stopword hit rates via [[tokenSetCount]] — one codegen'd
    * regex pass per language instead of an interpreted filter() HOF over
    * a lowered token array per language (the old array form also lost
    * common-subexpression elimination when the token attribute collapsed
    * into the per-profile lambdas, re-splitting the text 4x). Scores are
    * the same int-count / int-size doubles, so the argmax and threshold
    * decisions are bit-identical. */
  private def langIdOf(text: Column, minScore: Double): Column = {
    val n = greatest(tokenCount(text), lit(1))
    val scored = LangProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        (tokenSetCount(text, words).cast("double") / n).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") >= minScore, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Canonical document fingerprint: md5 over the sorted distinct token
    * set — invariant to token order and repetition, the cheap first-line
    * near-dup key (local substring fingerprints are
    * [[Dedup.winnowingFingerprints]]). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Repetition signals (the Gopher/MassiveText family of quality
    * filters): token-level duplicate fraction, the frequency share of the
    * most common word bigram, and the max single-token count. Line and
    * paragraph variants of these are the same computation keyed on a
    * different split; token/bigram granularity is what a single-line
    * corpus exercises.
    *
    * Shape at scale: one narrow pass for the per-doc array signals plus
    * ONE fused doc-keyed groupBy pyramid (tokens and bigrams share the
    * explode) with map-side combine for the mode counts — linear, no
    * skew beyond document size itself. Adds columns
    * `n_tokens, dup_token_frac, top_bigram_frac, max_token_rep`. */
  def repetitionSignals(df: DataFrame, idCol: String,
      textCol: String = "text"): DataFrame = {
    df.withColumn("_rts", tokens(col(textCol)))
      .withColumn("_rbg", kgrams(col(textCol), 2))
      .withColumn("n_tokens", size(col("_rts")).cast("long"))
      .withColumn("dup_token_frac",
        when(col("n_tokens") > 0,
          (col("n_tokens") - size(array_distinct(col("_rts"))))
            .cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)))
      // Mode counts are PER-ROW: sort the (token / bigram) array and take
      // the longest equal run — zero shuffles, where the previous
      // explode + two-level groupBy pyramid shuffled every gram twice
      // and joined back (measured ~4x slower at sf0.1 under identical
      // load, value-identical output). The per-element lambda is
      // interpreted, but it does constant work per gram — cheaper than a
      // gram's two shuffle hops, and it scales with document size, never
      // with corpus size.
      .withColumn("top_bigram_frac",
        when(size(col("_rbg")) > 0,
          modeCount(col("_rbg")).cast("double") / size(col("_rbg")))
          .otherwise(lit(0.0)))
      .withColumn("max_token_rep",
        when(col("n_tokens") > 0, modeCount(col("_rts"))).otherwise(lit(0L)))
      .drop("_rts", "_rbg")
  }

  /** Longest equal-element run of the SORTED array = the multiplicity of
    * the array's mode — the per-row reduction behind
    * [[repetitionSignals]]. Null-safe equality; empty arrays yield 0. */
  /** [[modeCount]] exposed for instrumentation probes only. */
  private[graft] def probeModeCount(arr: Column): Column = modeCount(arr)

  private def modeCount(arr: Column): Column =
    aggregate(array_sort(arr),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, x) => {
        val run = when(x <=> acc.getField("prev"),
          acc.getField("run") + 1L).otherwise(1L)
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** PII redaction: replace emails, IPv4 addresses, and international
    * phone-number-shaped digit runs with typed placeholder tokens — the
    * standard pre-training scrub pass. Pure `regexp_replace` chain
    * (codegen'd, linear); the patterns avoid constructs whose semantics
    * differ between regex engines, so an oracle can replay them. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
  val PhoneRe = "\\+\\d{1,3}[- ]\\d{2,4}[- ]\\d{3,4}[- ]?\\d{0,4}"

  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, "<EMAIL>")
    val i = regexp_replace(e, Ipv4Re, "<IP>")
    regexp_replace(i, PhoneRe, "<PHONE>")
  }

  /** Boilerplate signals via corpus-common winnowing fingerprints: a
    * fingerprint shared by >= `minDocs` documents marks a repeated
    * substring span (navigation chrome, license headers, templated
    * text); a document's `boilerplate_frac` is the fraction of its
    * fingerprints that are corpus-common — the span-level complement of
    * whole-document dedup (a doc can be 40% boilerplate yet globally
    * unique). Adds `n_fps`, `common_fps`, `boilerplate_frac`.
    *
    * Scale shape: ONE narrow winnow pass (persisted — it feeds both the
    * fingerprint-frequency aggregation and the per-doc rollup; same
    * lifecycle note as Dedup.shingled), a fingerprint-keyed count with
    * map-side combine, a key-equality join back on the fingerprint, and
    * a doc-keyed count. No shuffle ever carries document text. */
  def boilerplateSignals(df: DataFrame, idCol: String,
      textCol: String = "text", k: Int = 8, window: Int = 4,
      minDocs: Int = 2): DataFrame = {
    val fps = Dedup.winnowingFingerprints(df, idCol, textCol, k, window)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val common = fps.groupBy("fp") // fps are distinct per doc -> count = doc freq
      .agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= minDocs)
      .select("fp")
    val perDoc = fps
      .join(common.withColumn("_isC", lit(1)), Seq("fp"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_fps"), sum(coalesce(col("_isC"), lit(0))).as("common_fps"))
    df.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left") // docs too short to emit any fingerprint
      .select(col("id").as(idCol),
        coalesce(col("n_fps"), lit(0L)).as("n_fps"),
        coalesce(col("common_fps"), lit(0L)).as("common_fps"),
        when(coalesce(col("n_fps"), lit(0L)) > 0,
          col("common_fps").cast("double") / col("n_fps"))
          .otherwise(lit(0.0)).as("boilerplate_frac"))
  }

  /** Anchored-lookahead pattern capturing every overlapping word k-gram
    * of whitespace-normalized text — THE one copy of a load-bearing
    * regex (an unanchored lookahead would also fire at every mid-word
    * offset, silently inflating gram sets; caught at sf0.01). Shared by
    * [[withShingles]], [[repetitionSignals]], and [[topNgrams]]. */
  private[pipeline] def kgramPattern(k: Int): String =
    "(?:^|(?<= ))(?=(" + Seq.fill(k)("\\S+").mkString(" ") + "))"

  /** Overlapping word k-grams WITH multiplicity, one codegen'd regex
    * pass; empty result for texts with fewer than k tokens (no
    * whole-text fallback — that is [[withShingles]]' Jaccard-specific
    * contract). */
  def kgrams(text: Column, k: Int): Column =
    regexp_extract_all(regexp_replace(trim(text), "\\s+", " "),
      lit(kgramPattern(k)), lit(1))

  /** Global top-N word k-grams by occurrence count (ties broken by the
    * gram itself, so the cut is total-ordered and deterministic) — the
    * corpus-statistics pass (vocabulary building, boilerplate discovery,
    * stop-phrase mining). Scale shape: one narrow k-gram extraction pass,
    * one (gram)-keyed aggregation with map-side combine (doc_freq's
    * distinct runs as a two-phase partial aggregate), then TakeOrdered N —
    * the full gram table never sorts globally. */
  def topNgrams(df: DataFrame, idCol: String, textCol: String = "text",
      k: Int = 2, topN: Int = 50): DataFrame = {
    // count + countDistinct in one agg plans the Expand-based distinct
    // pyramid (every exploded row duplicated into two aggregation
    // groups before the first exchange). The manual two-level rewrite —
    // (gram, doc) partial counts, then one gram-keyed pass computing
    // occurrences = sum and doc_freq = row count — shuffles each
    // DISTINCT (gram, doc) pair once instead, with map-side combine on
    // both levels, and is value-identical by definition.
    df.select(col(idCol).as("_id"),
        explode(kgrams(col(textCol), k)).as("ngram"))
      .groupBy("ngram", "_id")
      .agg(count(lit(1)).as("_c"))
      .groupBy("ngram")
      .agg(sum(col("_c")).as("occurrences"),
        count(lit(1)).as("doc_freq"))
      .orderBy(col("occurrences").desc, col("ngram"))
      .limit(topN)
  }

  /** Word k-shingles, distinct — the unit of Jaccard similarity.
    *
    * PERF: `ts` must be a materialized column ATTRIBUTE, not an inline
    * `tokens(text)` expression — higher-order-function lambdas get no
    * common-subexpression elimination, so an inline token expression is
    * re-split once per shingle position x operand (a ~170x per-doc
    * blowup measured at sf0.1). Callers go through [[withShingles]]. */
  def shinglesOf(ts: Column, k: Int = 3): Column =
    array_distinct(
      when(size(ts) >= k,
        transform(sequence(lit(0), size(ts) - k),
          i => concat_ws(" ", (0 until k).map(j => element_at(ts, i + j + 1)): _*)))
        .otherwise(array(concat_ws(" ", ts))))

  /** Fast path: overlapping word k-grams via a single codegen'd regex
    * lookahead over whitespace-normalized text — `(?=(\S+ \S+ \S+))`
    * captures every overlapping trigram in one `regexp_extract_all` pass,
    * avoiding the higher-order-function shingle construction entirely
    * (HOF lambdas are interpreted, ~2.4 ms/doc measured at sf0.1; this
    * path is ~10x cheaper and stays in WholeStageCodegen). Values are
    * identical to [[shinglesOf]]: space-joined tokens, distinct, with the
    * whole text as the single shingle when tokens < k. */
  def withShingles(df: DataFrame, textCol: String, k: Int = 3,
      out: String = "sh"): DataFrame =
    df.withColumn("_norm", regexp_replace(trim(col(textCol)), "\\s+", " "))
      .withColumn(out, {
        val grams = regexp_extract_all(col("_norm"), lit(kgramPattern(k)), lit(1))
        array_distinct(
          when(size(grams) > 0, grams).otherwise(array(col("_norm"))))
      })
      .drop("_norm")

  /** Convenience inline form — fine for one-shot use on small data; hot
    * paths use [[withShingles]]. */
  def shingles(text: Column, k: Int = 3): Column = shinglesOf(tokens(text), k)

  /** BM25 relevance of every document against a bag of query terms —
    * the retrieval face of the text pipeline (eval-set decontamination
    * probes, quality spot-checks, corpus search). Okapi shape:
    *
    *   score(d) = sum over query terms t of
    *     idf(df_t, N) * (tf * (k1+1)) / (tf + k1 * (1 - b + b*dl/avgdl))
    *
    * Distribution: tokens explode once; the (doc, term) tf aggregation is
    * FILTERED to the query terms before the shuffle (a handful of rows
    * per doc), doc lengths are one count per doc, and the four corpus
    * scalars (N, total length, per-term df) broadcast — no corpus-wide
    * join anywhere.
    *
    * Determinism contract: each term's contribution is quantized to the
    * 2^-20 grid (`floor(x * 2^20 + 0.5)`, the engine-portable floor
    * idiom of [[Similarity.quantizeUnit]]) and accumulated as a LONG —
    * integer addition is order-independent, so the per-doc sum is exact
    * and reproducible no matter how partial aggregates combine, and an
    * independent engine replays it bit-for-bit. (A raw double sum's
    * value depends on combine order — nondeterministic run to run.)
    *
    * `idf` defaults to the standard log form (transcendental — JVM and
    * other engines' `ln` may differ in the last ulp); an oracle-exact
    * gate uses the Robertson/Sparck-Jones ODDS weight
    * `(N - df + 0.5) / (df + 0.5)` (the same quantity without the log:
    * rational arithmetic, bit-identical across engines). */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topN: Int = 50,
      idf: (Column, Column) => Column = defaultIdf): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("t"))
    val dl = toks.groupBy("id").agg(count(lit(1)).as("dl"))
    val tf = toks.filter(col("t").isin(queryTerms: _*))
      .groupBy("id", "t").agg(count(lit(1)).as("tf"))
    bm25Score(tf, dl, k1, b, topN, idf)
  }

  private val defaultIdf: (Column, Column) => Column = (dfreq, nDocs) =>
    log((nDocs - dfreq + 0.5) / (dfreq + 0.5) + 1.0)

  /** Shared BM25 scoring core over `(id, t, tf)` term frequencies and
    * `(id, dl)` doc lengths — [[bm25]] (from raw text) and
    * [[bm25FromIndex]] (from a prebuilt index) both land here, so their
    * arithmetic — and therefore their quantized scores — are identical
    * by construction. */
  private def bm25Score(tf: DataFrame, dl: DataFrame, k1: Double,
      b: Double, topN: Int, idf: (Column, Column) => Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dfreq = tf.groupBy("t").agg(count(lit(1)).as("dfreq"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val contrib = tf
      .join(broadcast(dfreq), "t")
      .join(dl, "id")
      .crossJoin(broadcast(stats))
      .withColumn("_idf", idf(col("dfreq"), col("n_docs")))
      .withColumn("_score", col("_idf") *
        ((col("tf") * lit(k1 + 1)) /
          (col("tf") +
            lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))))
      .withColumn("_q",
        floor(col("_score") * 1048576.0 + 0.5).cast("long"))
    // TakeOrdered(topN) first — the rank window then runs over <= topN
    // rows, never a corpus-wide single-partition sort
    val top = contrib.groupBy("id")
      .agg((sum(col("_q")) / 1048576.0).as("score"))
      .orderBy(col("score").desc, col("id")).limit(topN)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("score").desc, col("id"))))
  }

  /** Ingest-time inverted index — the retrieval analog of
    * [[Similarity]]'s encode-once PQ path: tokenize the corpus ONCE,
    * persist term postings, answer every later query from the postings
    * alone. `postings` is `(t, id, tf)`; `docs` is `(id, dl)` with
    * `dl = sum(tf)` precomputed so query-time never re-reads text. */
  final case class InvertedIndex(postings: DataFrame, docs: DataFrame)

  def buildInvertedIndex(df: DataFrame, idCol: String,
      textCol: String): InvertedIndex = {
    val tf = df.select(col(idCol).as("id"),
        explode(tokens(col(textCol))).as("t"))
      .groupBy("id", "t").agg(count(lit(1)).as("tf"))
    InvertedIndex(
      postings = tf.select("t", "id", "tf"),
      docs = tf.groupBy("id").agg(sum(col("tf")).as("dl")))
  }

  /** Persist the index with postings RANGE-PARTITIONED AND SORTED BY
    * TERM: every parquet row group then carries tight min/max stats on
    * `t`, so a query's `t IN (...)` predicate prunes to the handful of
    * row groups holding those terms — query cost scales with the query
    * terms' posting lists, not the corpus. */
  def writeInvertedIndex(ix: InvertedIndex, dir: String): Unit = {
    ix.postings.repartitionByRange(col("t"))
      .sortWithinPartitions("t", "id")
      .write.mode("overwrite").parquet(s"$dir/postings")
    ix.docs.write.mode("overwrite").parquet(s"$dir/docs")
  }

  def readInvertedIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): InvertedIndex =
    InvertedIndex(spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/docs"))

  /** BM25 from a prebuilt [[InvertedIndex]] — same scores as [[bm25]]
    * (shared core), but the only corpus-sized read is the pruned
    * postings scan; doc lengths and corpus stats come from the
    * doc-count-sized `docs` frame. */
  def bm25FromIndex(ix: InvertedIndex, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, topN: Int = 50,
      idf: (Column, Column) => Column = defaultIdf): DataFrame =
    bm25Score(ix.postings.filter(col("t").isin(queryTerms: _*))
        .select("id", "t", "tf"),
      ix.docs, k1, b, topN, idf)

  /** Add-one-smoothed bigram language model: the counting side of a
    * CCNet-style perplexity quality filter. Train on a reference corpus
    * (classically: Wikipedia), score any corpus against it — documents
    * whose token sequences the reference finds surprising (high
    * perplexity) are gibberish, boilerplate soup, or wrong-language;
    * documents it finds TOO predictable are templated spam. Both tails
    * get cut.
    *
    * The model is three frames, all lazy: bigram counts `(w1, w2, c2)`,
    * context counts `(w1, c1)`, and the 1-row vocabulary size. At 100 TB
    * the counts are corpus-size-independent aggregates (bounded by
    * vocab and vocab-pair cardinality, orders of magnitude below the
    * corpus) — train is two `groupBy` shuffles plus a distinct, nothing
    * touches the driver. */
  final case class BigramLm(bigrams: DataFrame, contexts: DataFrame,
      vocab: DataFrame)

  /** One row per in-document bigram: `(id, w1, w2)`. Docs under 2 tokens
    * produce no rows (no bigram exists; they need a length filter, not a
    * fluency score). `zip_with` over two slices keeps the pairing inside
    * codegen — no positional self-join, no posexplode matching. */
  private def bigramRows(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("_ts"))
      .where(size(col("_ts")) >= 2)
      .select(col("id"), explode(zip_with(
        slice(col("_ts"), lit(1), size(col("_ts")) - 1),
        slice(col("_ts"), lit(2), size(col("_ts")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("_b"))
      .select(col("id"), col("_b.w1").as("w1"), col("_b.w2").as("w2"))

  def trainBigramLm(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): BigramLm = {
    val bg = bigramRows(df, idCol, textCol)
    BigramLm(
      bigrams = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2")),
      contexts = bg.groupBy("w1").agg(count(lit(1)).as("c1")),
      vocab = df.select(explode(tokens(col(textCol))).as("t"))
        .agg(count_distinct(col("t")).as("v")))
  }

  /** Per-document fluency under a [[BigramLm]]:
    *
    *   p(w2|w1) = (c2 + 1) / (c1 + V)   (Laplace; unseen context → 1/V)
    *
    * Emits `(id, n_bigrams, predictability, perplexity)`:
    * `perplexity = exp(-mean(ln p))` is the standard CCNet filter score
    * (transcendental — exact ranking asserted in spec, not the oracle
    * gate); `predictability = mean(p)` over the 2^-20 quantized grid is
    * its rational twin — counts in, `+ - * /` and `floor` only, so an
    * independent engine replays it bit-for-bit, and the quantized-long
    * accumulation makes the mean combine-order-independent (same
    * contract as [[bm25]]).
    *
    * Distribution: score-side bigrams join the model on `(w1, w2)` then
    * `w1` — two key-equality shuffle joins against aggregate-sized
    * tables (never corpus-sized), the 1-row vocab broadcasts, and the
    * per-doc reduce is one `groupBy(id)`. Nothing is quadratic, nothing
    * collects. */
  def perplexity(df: DataFrame, idCol: String, textCol: String,
      lm: BigramLm): DataFrame = {
    val n = count(lit(1))
    bigramRows(df, idCol, textCol)
      .join(lm.bigrams, Seq("w1", "w2"), "left")
      .join(lm.contexts, Seq("w1"), "left")
      .crossJoin(broadcast(lm.vocab))
      .withColumn("_p", (coalesce(col("c2"), lit(0L)) + 1.0) /
        (coalesce(col("c1"), lit(0L)) + col("v")))
      .withColumn("_q", floor(col("_p") * 1048576.0 + 0.5).cast("long"))
      .groupBy("id").agg(
        n.as("n_bigrams"),
        (sum(col("_q")) / 1048576.0 / n).as("predictability"),
        exp(-(sum(log(col("_p"))) / n)).as("perplexity"))
  }

  /** Per-group corpus audit: doc count, token sum/min/max, and EXACT
    * lower-quantile token counts (p50/p90) — the "what is actually in
    * this corpus, per language/source" report every curation decision
    * starts from. Quantiles are LOWER quantiles (the data value at rank
    * ceil(q*n), ties broken by `key`): a value picked from the data, no
    * interpolation arithmetic — so any engine reproduces it bit-for-bit,
    * unlike interpolated `percentile`/`quantile_cont` whose double math
    * is implementation-defined at the last ulp.
    *
    * Shape: one map-side-combined aggregate for the scalar stats + one
    * per-group rank window for the quantile picks. The window sorts each
    * group — right for audit-scale group counts (languages, sources); at
    * 100 TB with pathological group sizes swap the picks for
    * `approxQuantile` and keep this as the exactness anchor. */
  def corpusStats(df: DataFrame, group: Column, tokens: Column,
      key: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(group.cast("string").as("_g"),
      coalesce(tokens.cast("long"), lit(0L)).as("_tok"), key.as("_k"))
    val scalar = base.groupBy("_g").agg(
      count(lit(1)).as("n_docs"), sum("_tok").as("tok_sum"),
      min("_tok").as("tok_min"), max("_tok").as("tok_max"))
    val w = Window.partitionBy("_g").orderBy(col("_tok"), col("_k"))
    val ranked = base.withColumn("_rn", row_number().over(w))
    def pick(q: Double, name: String) =
      ranked.join(scalar.select(col("_g"), col("n_docs")), "_g")
        .filter(col("_rn") === ceil(lit(q) * col("n_docs")).cast("long"))
        .select(col("_g"), col("_tok").as(name))
    scalar.join(pick(0.5, "tok_p50"), "_g").join(pick(0.9, "tok_p90"), "_g")
      .withColumnRenamed("_g", "group")
  }

  /** Sketch-based corpus audit — the 100 TB form of [[corpusStats]]:
    * HLL++ (`approx_count_distinct`) for distinct content fingerprints
    * and KLL-style `percentile_approx` for token quantiles, all in ONE
    * narrow partial-aggregating pass with CONSTANT memory per group.
    * [[corpusStats]]'s exact rank pick needs a per-group sort (fine at
    * audit scales, a full extra shuffle of the corpus at 100 TB) and
    * exact distinct-counting needs a corpus-wide shuffle of the
    * fingerprints; the sketches replace both with mergeable
    * fixed-size state. Approximate by declared bounds only:
    * `relativeSD` for the distinct count, rank error `1/accuracy` for
    * the quantiles (the returned quantile is always a REAL data value).
    * [[corpusStats]] is the exactness anchor — the spec pins this
    * output against it on the same corpus. */
  def corpusStatsApprox(df: DataFrame, group: Column, tokens: Column,
      content: Column, relativeSD: Double = 0.05,
      accuracy: Int = 10000): DataFrame =
    df.select(group.cast("string").as("group"),
        coalesce(tokens.cast("long"), lit(0L)).as("_tok"),
        fingerprint(content).as("_fp"))
      .groupBy("group")
      .agg(count(lit(1)).as("n_docs"),
        approx_count_distinct(col("_fp"), relativeSD)
          .as("distinct_docs_approx"),
        sum("_tok").as("tok_sum"),
        min("_tok").as("tok_min"), max("_tok").as("tok_max"),
        percentile_approx(col("_tok"), array(lit(0.5), lit(0.9)),
          lit(accuracy)).as("tok_q_approx"))
      .select(col("group"), col("n_docs"), col("distinct_docs_approx"),
        col("tok_sum"), col("tok_min"), col("tok_max"),
        element_at(col("tok_q_approx"), 1).as("tok_p50_approx"),
        element_at(col("tok_q_approx"), 2).as("tok_p90_approx"))

  /** CCNet-style segment-level deduplication (Wenzek et al. 2019 dedup
    * lines across shards; RefinedWeb repeats it): documents keep only
    * the segments that are NOT shared by `maxDocFreq`-or-more documents
    * corpus-wide, so boilerplate (headers, footers, cookie banners,
    * navigation) vanishes while each document's unique prose survives —
    * finer-grained than whole-document dedup, which keeps or drops all
    * of a page.
    *
    * A segment is `windowTokens` consecutive whitespace tokens (pass the
    * corpus's natural line split upstream if it has one — this corpus is
    * single-line, so fixed windows stand in for lines; the counting /
    * filtering / reassembly machinery is identical either way). Segment
    * identity is `md5(segment)` — 128 bits, collision-free in practice
    * at any corpus size (CCNet itself hashes to 64-bit SHA-1 prefixes),
    * and it caps the doc-frequency shuffle key at 32 bytes regardless of
    * `windowTokens`.
    *
    * Three constant-width shuffles: doc-frequency groupBy on the hash,
    * survivor join on the hash, ordered reassembly groupBy on the doc id
    * (width bounded by document size). Deterministic: reassembly sorts
    * `(position, segment)` structs, never relying on shuffle order.
    *
    * Output: one row per input document — `text_deduped` (`""` when
    * every segment was boilerplate), `n_segments`, `n_kept`. */
  def segmentDedup(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 4, maxDocFreq: Int = 2): DataFrame = {
    require(windowTokens >= 1, "windowTokens must be >= 1")
    require(maxDocFreq >= 1, "maxDocFreq must be >= 1")
    // One row per (doc, window position, token SLICE), built over a
    // materialized token ATTRIBUTE: the previous form sliced an INLINE
    // `tokens(text)` expression inside the transform lambda, which
    // re-ran the whitespace split for every window position (HOF
    // lambdas get no CSE — the [[shinglesOf]] hazard), an
    // O(tokens^2/windowTokens) per-document blowup that made this the
    // bench's most expensive query. posexplode_OUTER keeps
    // zero-segment documents as a single null-slice row, so one
    // doc-keyed rollup covers every input document. (sequence is
    // empty-UNSAFE: stop < start generates a DESCENDING range, so the
    // empty document guards first.)
    def sliceRows(in: DataFrame): DataFrame = {
      val ts = col("_ts")
      val slices = when(size(ts) === 0, array().cast("array<array<string>>"))
        .otherwise(transform(sequence(lit(1), size(ts), lit(windowTokens)),
          i => slice(ts, i, lit(windowTokens))))
      in.select(col(idCol).as("_id"), tokens(col(textCol)).as("_ts"))
        .select(col("_id"), posexplode_outer(slices).as(Seq("_pos", "_sl")))
    }
    // Segment identity is a structural 128-bit hash of the TOKEN SLICE
    // (two independently-seeded xxhash64 words). Tokens contain no
    // whitespace, so slice identity == joined-string identity, and 128
    // bits is collision-free in practice at any corpus size — the same
    // contract as the md5-of-string key it replaces (CCNet itself keys
    // on 64-bit SHA-1 prefixes) — while the frequency branch no longer
    // pays the array_join string build + md5 over it, and the shuffle
    // key is 16 bytes instead of a 32-char string.
    def hashOf(sl: Column): Column = when(sl.isNotNull,
      struct(xxhash64(sl).as("_h1"), xxhash64(lit(1L), sl).as("_h2")))
    // Corpus-common (boilerplate) segments are the SMALL side of the
    // dedup decision — join the survivor test against `df >= maxDocFreq`
    // (left join + null flag == NOT IN) instead of the old inner join
    // against the huge `df < maxDocFreq` set: the planner/AQE can
    // broadcast the boilerplate set, while the unique-segment set only
    // ever fit a broadcast by accident of scale.
    // maxDocFreq == 2 (the CCNet default) asks only "seen in MORE THAN
    // one document" — exactly min(doc) != max(doc), a single
    // map-side-combined aggregation pass, where countDistinct plans the
    // two-exchange distinct pyramid. General thresholds keep the exact
    // distinct count.
    val nonNull = sliceRows(df).filter(col("_sl").isNotNull)
      .select(col("_id"), hashOf(col("_sl")).as("_h"))
    val common = (if (maxDocFreq == 2)
      nonNull.groupBy("_h")
        .agg(min(col("_id")).as("_i1"), max(col("_id")).as("_i2"))
        .filter(col("_i1") =!= col("_i2"))
    else
      nonNull.groupBy("_h")
        .agg(countDistinct(col("_id")).as("_df"))
        .filter(col("_df") >= maxDocFreq))
      .select(col("_h"), lit(1).as("_isC"))
    // Reassembly branch: only HERE does the segment string get built
    // (it IS the output), once per segment.
    val segs = sliceRows(df)
      .withColumn("_h", hashOf(col("_sl")))
      .withColumn("_seg", array_join(col("_sl"), " "))
      .drop("_sl")
    val keep = col("_seg").isNotNull && col("_isC").isNull
    segs.join(common, Seq("_h"), "left")
      .groupBy("_id").agg(
        array_join(
          transform(array_sort(
            collect_list(when(keep, struct(col("_pos"), col("_seg"))))),
            s => s.getField("_seg")), " ").as("text_deduped"),
        count(col("_seg")).as("n_segments"),
        count(when(keep, lit(1))).as("n_kept"))
      .select(col("_id").as(idCol), col("text_deduped"),
        col("n_segments"), col("n_kept"))
  }

  /** WITHIN-document repeated-window removal — the intra-doc
    * counterpart of [[segmentDedup]] (MassiveText-family pipelines drop
    * repeated paragraphs inside a page before any corpus-wide pass;
    * [[textRepetition]]'s signals MEASURE the repetition, this removes
    * it): split into `windowTokens`-token segments, keep only the FIRST
    * occurrence of each repeated segment, reassemble in position order.
    *
    * Scale shape: ZERO shuffles — entirely per-row HOFs (the dedup test
    * is `array_position` over the segment prefix; quadratic in a
    * document's SEGMENT count, which is bounded by document length — a
    * per-row compute cost, never a plan hazard). Output:
    * `(idCol, text_deduped, n_segments, n_kept)`. */
  def dedupWithinDoc(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 4): DataFrame = {
    require(windowTokens >= 1, "windowTokens must be >= 1")
    // Tokens materialize as an ATTRIBUTE before the window-slicing
    // lambda references them: an inline tokens(text) would re-run the
    // whitespace split per window position (no CSE inside HOF lambdas —
    // the [[shinglesOf]] hazard).
    val ts = col("_dw_ts")
    val segsArr = when(size(ts) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(ts), lit(windowTokens)),
        i => array_join(slice(ts, i, lit(windowTokens)), " ")))
    val segs = col("_dw_segs")
    // keep segment i (0-based lambda index) iff absent from the prefix
    val kept = filter(segs,
      (s, i) => array_position(slice(segs, lit(1), i), s) === 0)
    df.withColumn("_dw_ts", tokens(col(textCol)))
      .withColumn("_dw_segs", segsArr)
      .withColumn("text_deduped", array_join(kept, " "))
      .withColumn("n_segments", size(segs).cast("long"))
      .withColumn("n_kept", size(kept).cast("long"))
      .drop("_dw_ts", "_dw_segs")
  }

  /** Tracking/session query parameters a canonical URL drops — the
    * analytics decorations that make one page spell a thousand URLs. */
  val TrackingParamPattern: String =
    "^(?:utm_.*|ref|fbclid|gclid|igshid|mc_eid|mkt_tok)$"

  /** Canonical URL — the dedup key of every web-corpus pipeline (CCNet,
    * C4, RefinedWeb all dedup fetched pages by normalized URL before
    * touching content). Normalization, all codegen'd builtins:
    * scheme and host lowercase; default port stripped (`:443` on https,
    * `:80` on http); trailing path slashes stripped (root stays `/`);
    * fragment dropped; query parameters with tracking keys
    * ([[TrackingParamPattern]]) dropped, survivors sorted bytewise and
    * rejoined. Percent-encoding is NOT normalized (that needs a decode
    * table; callers wanting it should decode at ingest). */
  def canonicalUrl(url: Column,
      dropParamsPattern: String = TrackingParamPattern): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = lower(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .otherwise(auth)
    val rawPath =
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val strippedPath = regexp_replace(rawPath, "/+$", "")
    val path = when(strippedPath === "", lit("/")).otherwise(strippedPath)
    // the query must precede any fragment — a '?' appearing only INSIDE
    // the fragment ("/p#frag?x") is fragment text, not a query
    val rawQuery = regexp_extract(url, "^[^#]*\\?([^#]*)", 1)
    val keptParams = array_sort(filter(split(rawQuery, "&"), p =>
      p =!= "" && !split(p, "=", 2).getItem(0).rlike(dropParamsPattern)))
    val query = array_join(keptParams, "&")
    concat(scheme, lit("://"), host, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
  }

  /** fastText-style linear classifier scoring — the model-based quality
    * filter of large-corpus curation: score = bias + Σ_t w(t) over the
    * document's tokens (multiplicity counts); callers threshold or
    * sigmoid downstream.
    *
    * Weights are quantized to 1e-6 fixed point INSIDE the operator, so
    * the dot product is a pure integer sum — reproducible across
    * engines, summation orders, retries, and partitionings (a float sum
    * is none of those, and a filtering decision that flips between
    * reruns corrupts dataset lineage); the ≤ 5e-7-per-term quantization
    * error is far below any meaningful decision boundary. One narrow
    * codegen'd pass: the token walk is a higher-order `aggregate` over
    * the split array with the weight map inlined as a literal — no
    * explode, no shuffle, no UDF. Fits model-sized unigram vocabularies
    * (the plan carries the map literal); for vocabularies too large to
    * inline use [[linearScoreJoin]]. */
  def linearScore(text: Column, weights: Map[String, Double],
      bias: Double = 0.0): Column = {
    require(weights.nonEmpty, "empty weight vocabulary")
    val fp = weights.map { case (t, w) => t -> math.round(w * 1e6) }
    val m = typedlit(fp)
    (lit(math.round(bias * 1e6)) +
      aggregate(tokens(text), lit(0L),
        (acc, t) => acc + coalesce(element_at(m, t), lit(0L))))
      .cast("double") / lit(1e6)
  }

  /** [[linearScore]] for vocabularies too large to inline as a literal:
    * explode tokens, broadcast-join the weights table, integer-sum per
    * document (map-side partial combine — the shuffle carries one
    * (id, partial) row per doc per partition, not per token). Weight
    * quantization uses floor(w·1e6 + 0.5), bit-matching
    * [[linearScore]]'s `math.round` for every weight including negative
    * halves. Docs with no in-vocab token score exactly `bias`. Output =
    * the input plus a `score` column. */
  def linearScoreJoin(df: DataFrame, idCol: String, textCol: String,
      weightsDf: DataFrame, bias: Double = 0.0): DataFrame = {
    require(!df.columns.contains("score"),
      "linearScoreJoin emits a 'score' column; rename the input's")
    val fp = weightsDf.select(col("term"),
      floor(col("weight") * 1e6 + 0.5).cast("long").as("_w_fp"))
    val hits = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .join(broadcast(fp), "term")
      .groupBy(idCol).agg(sum("_w_fp").as("_fp"))
    df.join(hits, Seq(idCol), "left")
      .withColumn("score",
        (lit(math.round(bias * 1e6)) + coalesce(col("_fp"), lit(0L)))
          .cast("double") / lit(1e6))
      .drop("_fp")
  }
}
