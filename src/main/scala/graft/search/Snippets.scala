package graft.search

import java.nio.charset.StandardCharsets.UTF_8

import graft.analysis.{Analyzer, Token}

/** Snippet generation (C9 — reference wiring
  * `summa-core/src/components/snippet_generator.rs:1-58`, behavior
  * `[tantivy, public]`): pick the fragment window of at most `maxChars`
  * UTF-8 bytes containing the highest number of query-term occurrences
  * (earliest window wins ties), and highlight the matched token ranges.
  * Runs on ≤k already-fetched rows, never on the full corpus.
  */
final case class Snippet(fragment: String, highlights: Seq[(Int, Int)]) {
  /** `<b>`-highlighted HTML like the reference's `to_html`. */
  def toHtml: String = {
    val bytes = fragment.getBytes(UTF_8)
    val sb = new StringBuilder
    var at = 0
    highlights.sortBy(_._1).foreach { case (s, e) =>
      sb.append(new String(bytes, at, s - at, UTF_8))
      sb.append("<b>").append(new String(bytes, s, e - s, UTF_8)).append("</b>")
      at = e
    }
    sb.append(new String(bytes, at, bytes.length - at, UTF_8))
    sb.toString
  }
}

object Snippets {

  def generate(text: String, terms: Set[String], analyzer: Analyzer, maxChars: Int): Snippet = {
    if (text == null || text.isEmpty || terms.isEmpty) return Snippet("", Nil)
    val toks: IndexedSeq[Token] = analyzer.tokenize(text)
    if (toks.isEmpty) return Snippet("", Nil)
    val matched = toks.map(t => terms.contains(t.text))
    if (!matched.exists(identity)) return Snippet("", Nil)

    // best window of tokens whose byte span fits maxChars, by match count
    var best = (-1, -1, -1) // (count, startIdx, endIdx)
    var lo = 0
    var cnt = 0
    var hi = 0
    while (lo < toks.length) {
      if (hi < lo) { hi = lo; cnt = 0 }
      while (hi < toks.length && toks(hi).offsetTo - toks(lo).offsetFrom <= maxChars) {
        if (matched(hi)) cnt += 1
        hi += 1
      }
      if (matched(lo) || true) {
        if (cnt > best._1) best = (cnt, lo, hi - 1)
      }
      if (matched(lo)) cnt -= 1
      lo += 1
    }
    val (_, s, e) = best
    val bytes = text.getBytes(UTF_8)
    val from = toks(s).offsetFrom
    val to = toks(e).offsetTo
    val fragment = new String(bytes, from, to - from, UTF_8)
    val highlights = (s to e).collect {
      case i if matched(i) => (toks(i).offsetFrom - from, toks(i).offsetTo - from)
    }
    Snippet(fragment, highlights)
  }
}
