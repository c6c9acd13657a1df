package graft.search

import graft.analysis.StopWords

/** English morphology expansion for SummaQL (reference:
  * `query_parser/morphology/english.rs:45-75` + `morphology/mod.rs:16-57`):
  * a noun-looking word expands to DisjunctionMax over its tenses plus the
  * US/UK spelling variant's tenses (spelling.csv, bundled, bidirectional),
  * with the configured coefficient as tie-breaker; stop words, words ending
  * in a digit, and `-ing` forms are left as plain terms.
  */
object Morphology {

  /** Bidirectional US↔UK spelling dictionary (reference `english.rs:14-36`). */
  lazy val spellingDict: Map[String, String] = {
    val in = getClass.getResourceAsStream("/spelling.csv")
    require(in != null, "missing resource /spelling.csv")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines().filter(_.nonEmpty).flatMap { line =>
        val cols = line.split(',').map(_.trim.stripPrefix("\"").stripSuffix("\""))
        if (cols.length >= 2) Seq(cols(0) -> cols(1), cols(1) -> cols(0)) else Nil
      }.toMap
    } finally src.close()
  }

  def deriveSpelling(word: String): Option[String] = spellingDict.get(word)

  private val Vowels = Set('a', 'e', 'i', 'o', 'u')

  private def isSibilant(w: String): Boolean =
    w.endsWith("s") || w.endsWith("x") || w.endsWith("z") ||
      w.endsWith("ch") || w.endsWith("sh")

  def toPlural(w: String): String =
    if (w.endsWith("y") && w.length > 1 && !Vowels.contains(w.charAt(w.length - 2)))
      w.dropRight(1) + "ies"
    else if (isSibilant(w)) w + "es"
    else w + "s"

  def toSingular(w: String): String =
    if (w.endsWith("ies") && w.length > 3) w.dropRight(3) + "y"
    else if (w.endsWith("es") && isSibilant(w.dropRight(2))) w.dropRight(2)
    else if (w.endsWith("s") && !w.endsWith("ss") && w.length > 1) w.dropRight(1)
    else w

  private def isPlural(w: String): Boolean = w != toSingular(w)

  /** (singular, plural) when the word looks like a noun, else None. */
  def deriveTenses(word: String): Option[(String, String)] = {
    if (StopWords.All.contains(word) || word.nonEmpty && word.last.isDigit ||
      word.endsWith("ing")) None
    else if (isPlural(word)) Some((toSingular(word), word))
    else Some((word, toPlural(word)))
  }

  /** Terms = own tenses (or the word), plus the first term's spelling
    * variant's tenses (reference `mod.rs:16-57` assembly).
    */
  def deriveQuery(field: String, word: String, tieBreaker: Double): Query = {
    val base: Seq[String] = deriveTenses(word) match {
      case Some((singular, plural)) => Seq(singular, plural).distinct
      case None                     => Seq(word)
    }
    val withSpelling = deriveSpelling(base.head) match {
      case Some(sp) =>
        base ++ (deriveTenses(sp) match {
          case Some((s2, p2)) => Seq(s2, p2).distinct
          case None           => Seq(sp)
        })
      case None => base
    }
    if (withSpelling.size == 1) TermQuery(field, withSpelling.head)
    else DisjunctionMaxQuery(withSpelling.map(TermQuery(field, _)), tieBreaker)
  }
}
