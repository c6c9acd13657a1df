package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

import graft.index.IndexBuilder
import graft.index.IndexBuilder.TokFlat

/** The fused tokenize→accumulate path must be SEMANTICALLY IDENTICAL to the
  * legacy Token-vector chain for every analyzer it claims (plus the raw fast
  * path): same survivor count/fieldnorm and the same (term → tf, packed
  * position deltas) map. Per-doc term ORDER is deliberately unconstrained —
  * the fused path emits in hash-table scan order because no build consumer
  * depends on it (see `FusedAcc.result` scaladoc); comparison canonicalizes
  * both sides by term. The battery covers ASCII, CJK, Turkic/Greek casing,
  * supplementary planes, stopword casing, remove-long UTF-8 boundaries,
  * table-growth sizes and accumulator reuse across calls.
  */
class FusedAnalyzeSpec extends AnyFunSuite {

  private val analyzers =
    Seq("summa", "summa_without_stop_words", "default", "whitespace", "raw", "raw_ci")

  private val battery: Seq[String] = Seq(
    "",
    " ",
    "body1 body2 body1 body1 the a THE A tHe",
    "The quick Brown FOX jumps",
    "c++ c# f# x+y a#b",
    "Γειά ΣΟΥ Κόσμε ΣΊΣΥΦΟΣ", // Greek final-sigma lowercasing (String.toLowerCase special case)
    "İstanbul ıI IJssel", // dotted/dotless I expansion under toLowerCase
    "查hello世界 test 日本語のテキスト",
    "𝒜𝒷𝒸 𐍈word mixed𝔸scii", // supplementary-plane letters
    "x" * 150, // remove-long: 150 ASCII bytes
    "é" * 50, // exactly 100 UTF-8 bytes → dropped at limit
    ("é" * 49) + "e", // 99 bytes → kept
    "tab\tsep\nnewline nbsp und_score dash-dash dot.dot",
    (0 until 500).map(i => s"term$i").mkString(" "), // forces table growth
    Seq.fill(300)("same").mkString(" "), // forces TermAcc position-buffer growth
    // varint meta boundary cases: ≥16384 distinct terms (3-byte k), one
    // term with tf ≥16384 (3-byte tf + >16 KB packed position run), and a
    // single >16 KB token (3-byte termLen through the raw/whitespace route)
    (0 until 17000).map(i => s"t$i").mkString(" "),
    Seq.fill(17000)("rep").mkString(" "),
    "y" * 17000,
    "ÅNGSTRÖM straße MASSE Måns",
    // ASCII tokens flushed into the sink BEFORE the first non-ASCII byte:
    // the utf8 byte path must reset its partially-filled accumulator and
    // re-run the String route without cross-contamination
    "alpha beta the café gamma alpha"
  ) ++ (0 until 200).map(i => graft.gen.PageGen.page(i.toLong).text)

  /** Canonical shape: (term → tf, packed position deltas) sorted by term.
    * Also asserts internal consistency of the flat offsets (monotone, blob
    * fully covered, no aliasing between slices).
    */
  private def canonical(tf: TokFlat, ctx: String): Seq[(String, Int, Seq[Byte])] = {
    val k = tf.termCount
    assert(tf.termOff(0) == 0 && tf.termOff(k) == tf.termBytes.length, s"termOff cover $ctx")
    assert(tf.posOff(0) == 0 && tf.posOff(k) == tf.posFlat.length, s"posOff cover $ctx")
    (0 until k).map { i =>
      (tf.term(i), tf.tf(i), tf.posSlice(i).toSeq)
    }.sortBy(_._1)
  }

  private def assertSame(name: String, input: String, a: TokFlat, b: TokFlat): Unit = {
    val ctx = s"analyzer=$name input=${input.take(60)}"
    assert(a.len == b.len, s"len $ctx")
    assert(a.norm == b.norm, s"norm $ctx")
    val ca = canonical(a, ctx)
    val cb = canonical(b, ctx)
    assert(ca.map(_._1) == cb.map(_._1), s"terms $ctx")
    assert(ca == cb, s"tf/positions $ctx")
  }

  test("fused path is output-identical to the legacy chain on the full battery") {
    for (name <- analyzers; input <- battery)
      assertSame(name, input,
        IndexBuilder.analyzeFieldFlat(name, input),
        IndexBuilder.analyzeFieldFlatLegacy(name, input))
  }

  test("null input yields the empty TokFlat on both paths") {
    for (name <- analyzers)
      assertSame(name, "<null>",
        IndexBuilder.analyzeFieldFlat(name, null),
        IndexBuilder.analyzeFieldFlatLegacy(name, null))
  }

  test("accumulator reuse across many documents on one thread stays correct") {
    // interleave growth-heavy and tiny docs so stale generations/pool reuse
    // would surface as cross-doc contamination
    val docs = (0 until 50).flatMap(i =>
      Seq(s"doc$i body${i % 7} body${i % 7} the", (0 until 300).map(j => s"w${i}_$j").mkString(" ")))
    for (input <- docs)
      assertSame("summa", input,
        IndexBuilder.analyzeFieldFlat("summa", input),
        IndexBuilder.analyzeFieldFlatLegacy("summa", input))
  }

  test("utf8 byte path is output-identical to the legacy chain on the full battery") {
    import org.apache.spark.unsafe.types.UTF8String
    for (name <- analyzers; input <- battery)
      assertSame(name, input,
        IndexBuilder.analyzeFieldFlatUtf8(name, UTF8String.fromString(input)),
        IndexBuilder.analyzeFieldFlatLegacy(name, input))
    for (name <- analyzers)
      assertSame(name, "<null>",
        IndexBuilder.analyzeFieldFlatUtf8(name, null),
        IndexBuilder.analyzeFieldFlatLegacy(name, null))
  }

  test("complex bases still route through the legacy chain unchanged") {
    val html = "<p>link<sup>1</sup>2 and <b>bold</b> text</p>"
    assertSame("summa_html", html,
      IndexBuilder.analyzeFieldFlat("summa_html", html),
      IndexBuilder.analyzeFieldFlatLegacy("summa_html", html))
  }
}
