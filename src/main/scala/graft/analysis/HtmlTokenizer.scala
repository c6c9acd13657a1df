package graft.analysis

import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable.ArrayBuffer

/** HTML-aware text extraction + tokenization with the reference engine's
  * semantics (spec:
  * `/root/reference/summa-core/src/components/tokenizers/html_tokenizer.rs:100-232`;
  * default tag sets `default_tokenizers.rs:341-358`):
  *
  *   - character data is collected into contiguous *spans*;
  *   - an **ignored** tag (`formula figure math ref table` by default) drops
  *     its whole subtree (depth-counted) and ends the current span;
  *   - an **inlined** tag (`sup sub i b u scp tt`) is erased: collection
  *     continues across it, and the markup bytes between the two text pieces
  *     become a *skip range* so the word tokenizer glues the pieces
  *     (`link<sup>1</sup>2` → token `link12`);
  *   - any other element boundary ends the current span;
  *   - on a parse error the collected span is emitted and parsing stops;
  *   - token positions run continuously across spans.
  */
object HtmlTokenizer {
  import XmlLexer._

  val DefaultIgnoredTags: Set[String] = Set("formula", "figure", "math", "ref", "table")
  val DefaultInlinedTags: Set[String] = Set("sup", "sub", "i", "b", "u", "scp", "tt")

  /** A collected character-data span: absolute byte range plus the skip
    * ranges (erased inline markup) inside it.
    */
  final case class Span(start: Int, end: Int, skips: IndexedSeq[(Int, Int)])

  def collectSpans(
      html: String,
      ignored: Set[String] = DefaultIgnoredTags,
      inlined: Set[String] = DefaultInlinedTags
  ): (Array[Byte], IndexedSeq[Span]) = {
    val bytes = html.getBytes(UTF_8)
    val lx = new XmlLexer(bytes)
    val spans = Vector.newBuilder[Span]
    var curStart = -1
    var curEnd = -1
    var skips = new ArrayBuffer[(Int, Int)]

    def endSpan(): Unit = {
      if (curStart >= 0) {
        spans += Span(curStart, curEnd, skips.toIndexedSeq)
        skips = new ArrayBuffer[(Int, Int)]
      }
      curStart = -1
      curEnd = -1
    }

    /** Drop an ignored element's subtree. Depth counts start/close tags only
      * (as the reference does — a self-closing tag inside the subtree skews
      * the count; our corpus generator avoids that construct).
      */
    def skipSubtree(): Unit = {
      var depth = 1
      var done = false
      while (!done) {
        lx.next() match {
          case StartEv(_) => depth += 1
          case CloseEv(_) =>
            depth -= 1
            if (depth == 0) done = true
          case Err | Eof => done = true
          case _         => ()
        }
      }
    }

    /** Consume an inlined element's attributes up to its `>`. */
    def skipToOpenEnd(): Unit = {
      var done = false
      while (!done) lx.next() match {
        case OpenEnd | Err | Eof => done = true
        case _                   => ()
      }
    }

    var done = false
    while (!done) {
      lx.next() match {
        case TextEv(s, e) =>
          if (curStart < 0) { curStart = s; curEnd = e }
          else {
            if (curEnd < s) skips += ((curEnd, s))
            curEnd = e
          }
        case StartEv(name) =>
          if (inlined(name)) skipToOpenEnd() // keep collecting across it
          else {
            if (ignored(name)) skipSubtree()
            endSpan()
          }
        case CloseEv(name) =>
          if (!inlined(name)) endSpan()
        case OpenEnd | EmptyEnd | Markup | AttrEv(_, _) => ()
        case Err =>
          endSpan()
        case Eof =>
          endSpan()
          done = true
      }
    }
    (bytes, spans.result())
  }

  /** Tokenize HTML: extract spans, then run the word tokenizer over each with
    * position continuity and absolute byte offsets.
    */
  def tokenize(
      html: String,
      ignored: Set[String] = DefaultIgnoredTags,
      inlined: Set[String] = DefaultInlinedTags
  ): IndexedSeq[Token] = {
    val (bytes, spans) = collectSpans(html, ignored, inlined)
    val out = Vector.newBuilder[Token]
    var prevPos = -1
    spans.foreach { sp =>
      val text = new String(bytes, sp.start, sp.end - sp.start, UTF_8)
      val toks = SummaTokenizer.tokenize(text, sp.start, prevPos, sp.skips)
      if (toks.nonEmpty) prevPos = toks.last.position
      out ++= toks
    }
    out.result()
  }

  /** The canonical extracted text of an HTML document: each span with its
    * skip ranges removed, spans joined by `\n`.
    *
    * Invariant (tested): `SummaTokenizer.tokenize(extractText(html))` produces
    * the same token texts and positions as `HtmlTokenizer.tokenize(html)` —
    * so indexing the `text` column of the pages table is equivalent to
    * indexing the raw `html` column.
    */
  def extractText(
      html: String,
      ignored: Set[String] = DefaultIgnoredTags,
      inlined: Set[String] = DefaultInlinedTags
  ): String = {
    val (bytes, spans) = collectSpans(html, ignored, inlined)
    val sb = new java.lang.StringBuilder
    var first = true
    spans.foreach { sp =>
      if (!first) sb.append('\n')
      first = false
      var at = sp.start
      sp.skips.foreach { case (s, e) =>
        sb.append(new String(bytes, at, s - at, UTF_8))
        at = e
      }
      sb.append(new String(bytes, at, sp.end - at, UTF_8))
    }
    sb.toString
  }
}
