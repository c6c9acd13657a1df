package graft.search

import graft.analysis.StopWords

/** English morphology expansion for SummaQL (reference:
  * `query_parser/morphology/english.rs:45-75` + `morphology/mod.rs:16-57`):
  * a noun-looking word expands to DisjunctionMax(singular, plural) with the
  * configured coefficient as tie-breaker; stop words, words ending in a
  * digit, and `-ing` forms are left as plain terms. (The reference's
  * optional US/UK spelling dictionary is a config-gated extra not ported
  * yet.)
  */
object Morphology {

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

  def deriveQuery(field: String, word: String, tieBreaker: Double): Query =
    deriveTenses(word) match {
      case Some((singular, plural)) if singular != plural =>
        DisjunctionMaxQuery(
          Seq(TermQuery(field, singular), TermQuery(field, plural)), tieBreaker)
      case _ => TermQuery(field, word)
    }
}
