package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Goldens ported from `mmd_tokenizer.rs:368-860` (analyzer = Mmd +
  * RemoveLong(40) + LowerCaser).
  */
class MmdSpec extends AnyFunSuite {
  private val a = Analyzer(MmdTokenizer.tokenize(_), removeLongLimit = 40, lowerCase = true)
  private def toks(s: String): Seq[(String, Int, Int, Int)] =
    a.tokenize(s).map(t => (t.text, t.position, t.offsetFrom, t.offsetTo))

  test("headings and table environments") {
    assert(toks("#").isEmpty)
    assert(toks("# Header1") == Seq(("header1", 0, 2, 9)))
    assert(toks("\\begin{table}\\end{table}").isEmpty)
    assert(toks("\\begin{table}\\end{table}a") == Seq(("a", 0, 24, 25)))
    assert(toks("\\begin{table}# Header 1\\end{table}").isEmpty)
    assert(toks("\\end{table}").isEmpty)
  }

  test("mixed document with skipped environments") {
    assert(
      toks("# Header1\nHello, 1 \\ 2 world! \\begin{table}table content\\end{table}\n\\begin{theorem}\ntheorem content\\end{theorem}")
        .take(4) == Seq(("header1", 0, 2, 9), ("hello", 1, 10, 15), ("1", 2, 17, 18), ("2", 3, 21, 22)))
  }

  test("non-commands keep text, command braces break") {
    assert(toks("\\noncommand \\noncommand2 \\") ==
      Seq(("noncommand", 0, 1, 11), ("noncommand2", 1, 13, 24)))
    assert(toks("\\command{weird}") == Seq(("command", 0, 1, 8), ("weird", 1, 9, 14)))
  }

  test("inline math is skipped") {
    assert(toks("word1 \\(x_1 + x_2\\) \\word2") ==
      Seq(("word1", 0, 0, 5), ("word2", 1, 21, 26)))
  }

  test("emphasis markers: doubled glue, single splits") {
    assert(toks("Love**is**bold") == Seq(("loveisbold", 0, 0, 14)))
    assert(toks("Love*is*bold") ==
      Seq(("love", 0, 0, 4), ("is", 1, 5, 7), ("bold", 2, 8, 12)))
  }

  test("drop commands keep braced content") {
    assert(
      toks("\\title{This is title}\n\\author{Author}").take(4) ==
        Seq(("this", 0, 7, 11), ("is", 1, 12, 14), ("title", 2, 15, 20), ("author", 3, 30, 36)))
  }

  test("links: bracketed text glues, target skipped") {
    assert(toks("[ref]test [ref](l)test") ==
      Seq(("reftest", 0, 1, 9), ("reftest", 1, 11, 22)))
    assert(toks("![ref](hehe)-abc{} \\[34\\] \\] \\) \\} 1 ### abc \\(") ==
      Seq(("ref", 0, 2, 5), ("abc", 1, 13, 16), ("1", 2, 35, 36), ("abc", 3, 41, 44)))
  }

  test("cjk handling matches the base tokenizer") {
    assert(toks("在查hello, worl土d动!") == Seq(
      ("在", 0, 0, 3), ("查", 1, 3, 6), ("hello", 2, 6, 11),
      ("worl", 3, 13, 17), ("土", 4, 17, 20), ("d", 5, 20, 21), ("动", 6, 21, 24)))
  }
}
