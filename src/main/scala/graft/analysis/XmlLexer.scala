package graft.analysis

import java.nio.charset.StandardCharsets.UTF_8

/** Minimal streaming XML/HTML pull-lexer with the event vocabulary the
  * HTML-extraction state machine needs (the reference drives an equivalent
  * low-level XML pull parser — behavior spec:
  * `/root/reference/summa-core/src/components/tokenizers/html_tokenizer.rs:100-232`).
  *
  * Operates over UTF-8 **bytes** so text spans are exact byte ranges (markup
  * is ASCII; multi-byte UTF-8 sequences never contain ASCII bytes, so
  * byte-level scanning is sound).
  *
  * Error model: any malformed markup (e.g. `<` inside a tag, unterminated
  * comment/attribute) yields a single [[XmlLexer.Err]] event after which the
  * stream is exhausted — mirroring strict pull-parser behavior that the
  * extraction machine relies on ("emit what was collected, then stop").
  */
final class XmlLexer(val bytes: Array[Byte]) {
  import XmlLexer._

  private var p = 0
  private var dead = false
  private var inTag = false // between ElemStart and OpenEnd/EmptyEnd

  private def err(): Ev = { dead = true; Err }

  private def isNameStart(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || b == '_'
  private def isNameChar(b: Byte): Boolean =
    isNameStart(b) || (b >= '0' && b <= '9') || b == '-' || b == '.' || b == ':'
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r'

  private def readName(): String = {
    val s = p
    while (p < bytes.length && isNameChar(bytes(p))) p += 1
    new String(bytes, s, p - s, UTF_8)
  }

  /** Local part of a possibly-prefixed qname (`mll:p` → `p`). */
  private def local(q: String): String = {
    val i = q.indexOf(':')
    if (i >= 0) q.substring(i + 1) else q
  }

  /** Scan forward until the ASCII pattern `pat` is found; position lands just
    * after it. Returns false (→ error) if the input ends first.
    */
  private def scanPast(pat: String): Boolean = {
    val pb = pat.getBytes(UTF_8)
    var i = p
    while (i + pb.length <= bytes.length) {
      var j = 0
      while (j < pb.length && bytes(i + j) == pb(j)) j += 1
      if (j == pb.length) { p = i + pb.length; return true }
      i += 1
    }
    false
  }

  def next(): Ev = {
    if (dead || p >= bytes.length) return Eof
    if (inTag) nextInTag()
    else if (bytes(p) == '<') nextMarkup()
    else {
      val s = p
      while (p < bytes.length && bytes(p) != '<') p += 1
      TextEv(s, p)
    }
  }

  private def nextMarkup(): Ev = {
    p += 1 // past '<'
    if (p >= bytes.length) return err()
    bytes(p) match {
      case '/' =>
        p += 1
        if (p >= bytes.length || !isNameStart(bytes(p))) return err()
        val name = readName()
        while (p < bytes.length && isWs(bytes(p))) p += 1
        if (p < bytes.length && bytes(p) == '>') { p += 1; CloseEv(local(name)) }
        else err()
      case '!' =>
        if (p + 2 < bytes.length && bytes(p + 1) == '-' && bytes(p + 2) == '-') {
          p += 3
          if (scanPast("-->")) Markup else err()
        } else if (startsWithAt(p + 1, "[CDATA[")) {
          p += 8
          if (scanPast("]]>")) Markup else err()
        } else { // DOCTYPE / other declarations: skip to '>'
          if (scanPast(">")) Markup else err()
        }
      case '?' =>
        p += 1
        if (scanPast("?>")) Markup else err()
      case b if isNameStart(b) =>
        val name = readName()
        inTag = true
        StartEv(local(name))
      case _ => err()
    }
  }

  private def startsWithAt(at: Int, pat: String): Boolean = {
    val pb = pat.getBytes(UTF_8)
    if (at + pb.length > bytes.length) return false
    var j = 0
    while (j < pb.length) { if (bytes(at + j) != pb(j)) return false; j += 1 }
    true
  }

  private def nextInTag(): Ev = {
    while (p < bytes.length && isWs(bytes(p))) p += 1
    if (p >= bytes.length) return err()
    bytes(p) match {
      case '>' =>
        p += 1; inTag = false; OpenEnd
      case '/' =>
        if (p + 1 < bytes.length && bytes(p + 1) == '>') {
          p += 2; inTag = false; EmptyEnd
        } else err()
      case b if isNameStart(b) =>
        readName()
        while (p < bytes.length && isWs(bytes(p))) p += 1
        if (p >= bytes.length || bytes(p) != '=') return err()
        p += 1
        while (p < bytes.length && isWs(bytes(p))) p += 1
        if (p >= bytes.length) return err()
        val q = bytes(p)
        if (q != '"' && q != '\'') return err()
        p += 1
        val s = p
        while (p < bytes.length && bytes(p) != q && bytes(p) != '<') p += 1
        if (p >= bytes.length || bytes(p) == '<') return err()
        p += 1
        AttrEv(s, p - 1)
      case _ => err()
    }
  }
}

object XmlLexer {
  sealed trait Ev
  /** Raw character data: byte range [start, end) in the original input. */
  final case class TextEv(start: Int, end: Int) extends Ev
  /** `<name` consumed (local name, prefix stripped); attributes follow. */
  final case class StartEv(localName: String) extends Ev
  /** An attribute inside a start tag (value byte range, unescaped). */
  final case class AttrEv(valueStart: Int, valueEnd: Int) extends Ev
  /** `>` closing a start tag. */
  case object OpenEnd extends Ev
  /** `/>` closing a self-contained element. */
  case object EmptyEnd extends Ev
  /** `</name>` (local name). */
  final case class CloseEv(localName: String) extends Ev
  /** Comment / CDATA / declaration / PI — ignorable markup. */
  case object Markup extends Ev
  /** Malformed markup; the stream is exhausted afterwards. */
  case object Err extends Ev
  /** End of input. */
  case object Eof extends Ev
}
