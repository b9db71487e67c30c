package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the native Unicode expressions to the DuckDB/utf8proc behavior
  * the `text_normalize` oracle replays (expected values below verified
  * against DuckDB `nfc_normalize`/`strip_accents` directly). All
  * non-ASCII is written as \u escapes -- composed vs decomposed
  * spellings are the SUBJECT here, so source bytes must be unambiguous. */
class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_normalize NFC composes combining sequences; ASCII fast path") {
    val rows = Seq(
      "é",          // e + combining acute -> U+00E9
      "Crème",      // embedded combining grave -> U+00E8
      "plain ascii",      // already NFC: unchanged
      "ﬁ")           // fi ligature: canonical NFC keeps it
      .toDF("s")
      .select(TextFunctions.normalize(col("s")).as("n"),
        length(TextFunctions.normalize(col("s"))).as("len"))
      .collect()
    assert(rows(0).getString(0) == "é" && rows(0).getInt(1) == 1)
    assert(rows(1).getString(0) == "Crème")
    assert(rows(2).getString(0) == "plain ascii")
    assert(rows(3).getString(0) == "ﬁ")
    // null in -> null out; bad form rejected at construction
    val n = Seq[Option[String]](None).toDF("s")
      .select(TextFunctions.normalize(col("s"))).collect()(0)
    assert(n.isNullAt(0))
    intercept[IllegalArgumentException] {
      UnicodeNormalize(org.apache.spark.sql.catalyst.expressions.Literal("x"),
        "NOT_A_FORM")
    }
  }

  test("graft_strip_accents matches utf8proc: marks dropped, no compat folding") {
    val rows = Seq(
      "éøñÆ", // e' o-slash n-tilde AE -> e o-slash n AE
      "Łódź",      // Lodz with accents -> L-stroke o d z
      "ệ",                   // e + circumflex + dot below -> e
      "ßﬁ",             // sharp-s, fi -> unchanged (compat-only)
      "X́",                  // Mn strips
      "Xा",                  // Mc strips
      "X⃝")                  // Me strips
      .toDF("s")
      .select(TextFunctions.stripAccents(col("s")).as("t"))
      .as[String].collect()
    assert(rows.toSeq == Seq("eønÆ", "Łodz", "e",
      "ßﬁ", "X", "X", "X"))
  }

  test("NFKC compat folding and codegen compilation (no fallback)") {
    // NFKC is the search-key fold NFC deliberately is not: ligatures and
    // width variants collapse. (No DuckDB twin — nfkc_normalize doesn't
    // exist there — so this is pinned here, not in an oracle gate.)
    val rows = Seq("ﬁn", "Ａ１")
      .toDF("s").select(TextFunctions.normalize(col("s"), "NFKC").as("n"))
      .as[String].collect()
    assert(rows.toSeq == Seq("fin", "A1"))
    // with codegen fallback disabled, a doGenCode bug fails the query
    // instead of silently degrading to interpreted eval
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = spark.range(0, 3)
        .select(graft.functions.TextFunctions.canonicalFold(
          concat(lit("Café"), col("id").cast("string"))).as("k"))
        .as[String].collect()
      assert(out.toSeq == Seq("cafe0", "cafe1", "cafe2"))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("canonicalFold and SQL-door registration agree with eval") {
    // composed vs decomposed spellings of the same word fold to one key --
    // the property exact dedup needs
    val keys = Seq("Café", "Café", "CAFÉ")
      .toDF("s").select(TextFunctions.canonicalFold(col("s")).as("k"))
      .as[String].collect().toSet
    assert(keys == Set("cafe"))
    val viaSql = spark.sql(
      "SELECT graft_strip_accents(lower(graft_normalize('Café', 'NFC')))")
      .as[String].collect()(0)
    assert(viaSql == "cafe")
    // ASCII fast path returns the INPUT buffer — no per-row allocation
    // on the (dominant) already-normalized corpus slice
    val ascii = org.apache.spark.unsafe.types.UTF8String.fromString("plain")
    assert(TextExprUtil.normalize(ascii, "NFC") eq ascii)
    assert(TextExprUtil.stripAccents(ascii) eq ascii)
    // interpreted eval matches the codegen'd DataFrame path
    val ev = StripAccents(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString("éø"),
      org.apache.spark.sql.types.StringType)).eval(null)
    assert(ev.toString == "eø")
  }
}
