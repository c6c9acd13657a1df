package graft.analysis

import scala.collection.immutable.ArraySeq

/** Word tokenizer with the reference engine's semantics
  * (behavioral spec: `/root/reference/summa-core/src/components/tokenizers/tokenizer.rs:70-127`):
  *
  *   - a token is a maximal run of "token characters": Unicode alphanumerics
  *     plus `#` and `+` (so `c++`, `c#` survive);
  *   - every CJK ideograph is its own single-character token, even when glued
  *     to latin text (`查hello` → `查`, `hello`);
  *   - an optional *skip list* of byte ranges is treated as invisible: skipped
  *     bytes neither emit characters nor break the current token (this is how
  *     the HTML tokenizer glues `link<sup>1</sup>2` into token `link12`);
  *   - offsets are UTF-8 byte offsets relative to the enclosing document
  *     (`baseOffset` + offset within this string).
  */
object SummaTokenizer {

  def isCjk(cp: Int): Boolean =
    (cp >= 0x4E00 && cp <= 0x9FFF) ||
      (cp >= 0x3400 && cp <= 0x4DBF) ||
      (cp >= 0x20000 && cp <= 0x2A6DF) ||
      (cp >= 0x2A700 && cp <= 0x2B73F) ||
      (cp >= 0x2B740 && cp <= 0x2B81F)

  /** Mirrors Rust `char::is_alphanumeric` (Unicode L* ∪ {Nd, Nl, No}) plus the
    * reference's extra `#`/`+` token chars.
    */
  def isTokenChar(cp: Int): Boolean =
    cp == '#' || cp == '+' || Character.isLetter(cp) || {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
      t == Character.OTHER_NUMBER
    }

  /** Tokenize a standalone string (positions start at 0). */
  def tokenize(text: String): IndexedSeq[Token] =
    tokenize(text, baseOffset = 0, prevPosition = -1, skips = ArraySeq.empty)

  /** Tokenize a text span embedded in a larger document.
    *
    * @param baseOffset   byte offset of `text` within the document
    * @param prevPosition position of the last token emitted before this span
    *                     (-1 if none); emitted positions continue from it
    * @param skips        sorted, disjoint absolute byte ranges [from, to) to
    *                     treat as invisible
    */
  def tokenize(
      text: String,
      baseOffset: Int,
      prevPosition: Int,
      skips: IndexedSeq[(Int, Int)]
  ): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    var pos = prevPosition
    var ci = 0 // UTF-16 index into text
    var byteOff = 0 // UTF-8 byte offset within text
    var skipIdx = 0
    var sb: java.lang.StringBuilder = null
    var tokStart = 0
    var tokEnd = 0

    def flush(): Unit =
      if (sb != null && sb.length > 0) {
        pos += 1
        out += Token(sb.toString, pos, tokStart, tokEnd)
        sb = null
      }

    val n = text.length
    while (ci < n) {
      val cp = text.codePointAt(ci)
      val bw = Utf8.len(cp)
      val real = baseOffset + byteOff
      // advance past skip ranges that end at or before this byte
      while (skipIdx < skips.length && skips(skipIdx)._2 <= real) skipIdx += 1
      val invisible =
        skipIdx < skips.length && skips(skipIdx)._1 <= real && real < skips(skipIdx)._2
      if (!invisible) {
        if (isCjk(cp)) {
          flush()
          pos += 1
          out += Token(new String(Character.toChars(cp)), pos, real, real + bw)
        } else if (isTokenChar(cp)) {
          if (sb == null) { sb = new java.lang.StringBuilder; tokStart = real }
          sb.appendCodePoint(cp)
          tokEnd = real + bw
        } else {
          flush()
        }
      }
      ci += Character.charCount(cp)
      byteOff += bw
    }
    flush()
    out.result()
  }
}

/** tantivy-compatible `SimpleTokenizer`: maximal runs of Unicode alphanumerics
  * (no CJK special-casing, no `#`/`+`).
  */
object SimpleWordTokenizer {
  def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    var ci = 0
    var byteOff = 0
    var pos = -1
    var sb: java.lang.StringBuilder = null
    var tokStart = 0
    var tokEnd = 0
    def isAlnum(cp: Int): Boolean = Character.isLetter(cp) || {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
      t == Character.OTHER_NUMBER
    }
    def flush(): Unit = if (sb != null && sb.length > 0) {
      pos += 1; out += Token(sb.toString, pos, tokStart, tokEnd); sb = null
    }
    while (ci < text.length) {
      val cp = text.codePointAt(ci)
      val bw = Utf8.len(cp)
      if (isAlnum(cp)) {
        if (sb == null) { sb = new java.lang.StringBuilder; tokStart = byteOff }
        sb.appendCodePoint(cp)
        tokEnd = byteOff + bw
      } else flush()
      ci += Character.charCount(cp)
      byteOff += bw
    }
    flush()
    out.result()
  }
}

/** Whitespace tokenizer: splits on Unicode whitespace. */
object WhitespaceTokenizer {
  def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    var ci = 0
    var byteOff = 0
    var pos = -1
    var sb: java.lang.StringBuilder = null
    var tokStart = 0
    var tokEnd = 0
    def flush(): Unit = if (sb != null && sb.length > 0) {
      pos += 1; out += Token(sb.toString, pos, tokStart, tokEnd); sb = null
    }
    while (ci < text.length) {
      val cp = text.codePointAt(ci)
      val bw = Utf8.len(cp)
      if (!Character.isWhitespace(cp)) {
        if (sb == null) { sb = new java.lang.StringBuilder; tokStart = byteOff }
        sb.appendCodePoint(cp)
        tokEnd = byteOff + bw
      } else flush()
      ci += Character.charCount(cp)
      byteOff += bw
    }
    flush()
    out.result()
  }
}
