package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Goldens ported in FULL from `mmd_tokenizer.rs:368-1080` (analyzer = Mmd +
  * RemoveLong(40) + LowerCaser): every `assert_tokenization` case in the
  * reference's en and zh test suites appears here as its own group with the
  * reference's complete (text, position, offset_from, offset_to) expectation.
  */
class MmdSpec extends AnyFunSuite {
  private val a = Analyzer(MmdTokenizer.tokenize(_), removeLongLimit = 40, lowerCase = true)
  private def toks(s: String): Seq[(String, Int, Int, Int)] =
    a.tokenize(s).map(t => (t.text, t.position, t.offsetFrom, t.offsetTo))

  // ---- en goldens (`mmd_tokenizer.rs:368-859`) ----

  test("bare heading marker produces nothing") {
    assert(toks("#").isEmpty)
  }

  test("heading marker stripped, heading text kept") {
    assert(toks("# Header1") == Seq(("header1", 0, 2, 9)))
  }

  test("empty table environment skipped") {
    assert(toks("\\begin{table}\\end{table}").isEmpty)
  }

  test("text resumes immediately after a table environment") {
    assert(toks("\\begin{table}\\end{table}a") == Seq(("a", 0, 24, 25)))
  }

  test("heading inside a table environment is skipped with it") {
    assert(toks("\\begin{table}# Header 1\\end{table}").isEmpty)
  }

  test("stray end-environment token skipped") {
    assert(toks("\\end{table}").isEmpty)
  }

  test("mixed document: heading, escapes, table env, theorem env") {
    assert(
      toks("# Header1\nHello, 1 \\ 2 world! \\begin{table}table content\\end{table}\n\\begin{theorem}\ntheorem content\\end{theorem}") ==
        Seq(
          ("header1", 0, 2, 9),
          ("hello", 1, 10, 15),
          ("1", 2, 17, 18),
          ("2", 3, 21, 22),
          ("world", 4, 23, 28),
          ("theorem", 5, 84, 91),
          ("content", 6, 92, 99)))
  }

  test("drop commands: footnote braces open mid-text, nested uline") {
    assert(
      toks("# Header1 \\footnote{footnote text}# Header2 \\uline{\\uline{double line}}") ==
        Seq(
          ("header1", 0, 2, 9),
          ("footnote", 1, 20, 28),
          ("text", 2, 29, 33),
          ("header2", 3, 36, 43),
          ("double", 4, 58, 64),
          ("line", 5, 65, 69)))
  }

  test("unknown commands keep their text, trailing lone backslash dropped") {
    assert(toks("\\noncommand \\noncommand2 \\") ==
      Seq(("noncommand", 0, 1, 11), ("noncommand2", 1, 13, 24)))
  }

  test("unknown command with braced arg: both words survive") {
    assert(toks("\\command{weird}") == Seq(("command", 0, 1, 8), ("weird", 1, 9, 14)))
  }

  test("inline math between \\( and \\) is skipped") {
    assert(toks("word1 \\(x_1 + x_2\\) \\word2") ==
      Seq(("word1", 0, 0, 5), ("word2", 1, 21, 26)))
  }

  test("doubled emphasis markers glue the surrounding words") {
    assert(toks("Love**is**bold") == Seq(("loveisbold", 0, 0, 14)))
  }

  test("single emphasis markers split into separate tokens") {
    assert(toks("Love*is*bold") ==
      Seq(("love", 0, 0, 4), ("is", 1, 5, 7), ("bold", 2, 8, 12)))
  }

  test("mixed double-then-single emphasis splits") {
    assert(toks("Love **is*bold") ==
      Seq(("love", 0, 0, 4), ("is", 1, 7, 9), ("bold", 2, 10, 14)))
  }

  test("caret extends the token span without splitting") {
    assert(toks("How to do x^2") ==
      Seq(("how", 0, 0, 3), ("to", 1, 4, 6), ("do", 2, 7, 9), ("x2", 3, 10, 13)))
  }

  test("empty image link produces nothing") {
    assert(toks("![]()").isEmpty)
  }

  test("image link: alt text kept, url and attribute braces skipped") {
    assert(toks("![image text](https://example.com/image.jpg){width=1}") ==
      Seq(("image", 0, 2, 7), ("text", 1, 8, 12)))
  }

  test("bracketed ref NOT followed directly by paren keeps the paren text") {
    assert(toks("[ref] (author)") ==
      Seq(("ref", 0, 1, 4), ("author", 1, 7, 13)))
  }

  test("link text glues to adjacent word, target skipped") {
    assert(toks("[ref]test [ref](l)test") ==
      Seq(("reftest", 0, 1, 9), ("reftest", 1, 11, 22)))
  }

  test("title/author/section drop commands keep full braced content") {
    assert(
      toks("\\title{This is title}\n\\author{Author}\n\\section{Section 1}\n\\subsection{Section 1.1}\n\\subsubsection{Section 1.1.1}") ==
        Seq(
          ("this", 0, 7, 11),
          ("is", 1, 12, 14),
          ("title", 2, 15, 20),
          ("author", 3, 30, 36),
          ("section", 4, 47, 54),
          ("1", 5, 55, 56),
          ("section", 6, 70, 77),
          ("1", 7, 78, 79),
          ("1", 8, 80, 81),
          ("section", 9, 98, 105),
          ("1", 10, 106, 107),
          ("1", 11, 108, 109),
          ("1", 12, 110, 111)))
  }

  test("escaped brackets, stray closers, heading runs and math opener") {
    assert(toks("![ref](hehe)-abc{} \\[34\\] \\] \\) \\} 1 ### abc \\(") ==
      Seq(("ref", 0, 2, 5), ("abc", 1, 13, 16), ("1", 2, 35, 36), ("abc", 3, 41, 44)))
  }

  // ---- zh goldens (`mmd_tokenizer.rs:861-1080`) ----

  test("cjk chars emit as single tokens, byte offsets") {
    assert(toks("在查hello, worl土d动!") == Seq(
      ("在", 0, 0, 3), ("查", 1, 3, 6), ("hello", 2, 6, 11),
      ("worl", 3, 13, 17), ("土", 4, 17, 20), ("d", 5, 20, 21), ("动", 6, 21, 24)))
  }

  test("cjk run with embedded latin letter") {
    assert(toks("在查土d动") == Seq(
      ("在", 0, 0, 3), ("查", 1, 3, 6), ("土", 2, 6, 9),
      ("d", 3, 9, 10), ("动", 4, 10, 13)))
  }

  test("interleaved latin/cjk words with double spaces") {
    assert(toks("Veri 在查hello, c查m p查 查lex  worl土d动!") == Seq(
      ("veri", 0, 0, 4), ("在", 1, 5, 8), ("查", 2, 8, 11), ("hello", 3, 11, 16),
      ("c", 4, 18, 19), ("查", 5, 19, 22), ("m", 6, 22, 23), ("p", 7, 24, 25),
      ("查", 8, 25, 28), ("查", 9, 29, 32), ("lex", 10, 32, 35),
      ("worl", 11, 37, 41), ("土", 12, 41, 44), ("d", 13, 44, 45), ("动", 14, 45, 48)))
  }

  test("cjk punctuation alone produces nothing") {
    assert(toks("。").isEmpty)
  }
}
