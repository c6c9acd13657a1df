package graft.analysis

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

/** Dictionary tokenizer (T4 — behavioral spec:
  * `/root/reference/summa-core/src/components/tokenizers/dict_tokenizer.rs:1-108`):
  * an ASCII-case-insensitive, leftmost-longest, non-overlapping multi-pattern
  * matcher over synonym sets; each match emits the synset's **canonical**
  * (first) entry, and only matches flanked by ASCII punctuation/whitespace or
  * string edges count (`:84-96`). Offsets are UTF-8 byte offsets.
  *
  * The matcher is a byte-level trie scanned left to right taking the longest
  * match at the earliest start — equivalent to the reference's Aho-Corasick
  * `LeftmostLongest` + non-overlapping `find_iter`.
  */
final class DictTokenizer(synsets: Seq[Seq[String]]) extends Serializable {

  /** trie over lowercased pattern bytes; value = canonical string index */
  private val canon: Array[String] = synsets.map(_.head).toArray
  private final class Node {
    val next = new mutable.HashMap[Byte, Node]()
    var hit: Int = -1 // canon index
  }
  private val root = new Node
  synsets.zipWithIndex.foreach { case (synset, si) =>
    synset.foreach { pat =>
      val bytes = pat.toLowerCase.getBytes(UTF_8)
      var n = root
      bytes.foreach(b => n = n.next.getOrElseUpdate(b, new Node))
      if (n.hit < 0) n.hit = si
    }
  }

  @inline private def lowerAscii(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
  @inline private def isBoundary(b: Byte): Boolean = {
    val c = b & 0xFF
    // Rust is_ascii_whitespace ∪ is_ascii_punctuation (reference boundary rule)
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == 0x0c ||
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') || (c >= '[' && c <= '`') ||
    (c >= '{' && c <= '~')
  }

  def tokenize(text: String): IndexedSeq[Token] = {
    if (text == null || text.isEmpty) return Vector.empty
    val bytes = text.getBytes(UTF_8)
    val out = Vector.newBuilder[Token]
    var pos = -1
    var i = 0
    while (i < bytes.length) {
      // longest match starting at i
      var n = root
      var j = i
      var bestEnd = -1
      var bestHit = -1
      var walking = true
      while (walking && j < bytes.length) {
        n.next.get(lowerAscii(bytes(j))) match {
          case Some(nn) =>
            n = nn
            j += 1
            if (n.hit >= 0) { bestEnd = j; bestHit = n.hit }
          case None => walking = false
        }
      }
      if (bestEnd > 0) {
        val properBegin = i == 0 || isBoundary(bytes(i - 1))
        val properEnd = bestEnd == bytes.length || isBoundary(bytes(bestEnd))
        if (properBegin && properEnd) {
          pos += 1
          out += Token(canon(bestHit), pos, i, bestEnd)
        }
        i = bestEnd // non-overlapping iteration continues after the match
      } else i += 1
    }
    out.result()
  }
}

object DictTokenizer {

  /** The reference's drug-synonym dictionary
    * (`summa-core/resources/drugs.csv`, bundled as a resource).
    */
  lazy val drugs: DictTokenizer = new DictTokenizer(loadCsv("/drugs.csv"))

  private[analysis] def loadCsv(resource: String): Seq[Seq[String]] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"missing resource $resource")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map(parseCsvLine).toVector
    finally src.close()
  }

  /** Minimal CSV parser for `"a","b c","d"` lines (quotes, commas). */
  private[analysis] def parseCsvLine(line: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val sb = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { sb.append('"'); i += 1 }
          else inQ = false
        } else sb.append(c)
      } else c match {
        case '"' => inQ = true
        case ',' => out += sb.toString; sb.clear()
        case c2  => sb.append(c2)
      }
      i += 1
    }
    out += sb.toString
    out.result().filter(_.nonEmpty)
  }
}
