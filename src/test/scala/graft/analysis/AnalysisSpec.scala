package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Golden cases ported from the reference test suite:
  * `/root/reference/summa-core/src/components/tokenizers/tokenizer.rs:131-393`
  * and `html_tokenizer.rs:244-695`. Tuples are (text, position, offsetFrom, offsetTo).
  */
class AnalysisSpec extends AnyFunSuite {

  private val wordAnalyzer = Analyzer(SummaTokenizer.tokenize(_), removeLongLimit = 40, lowerCase = true)
  // html goldens run with ignored={formula}, inlined={sup}, + stop words
  private val htmlAnalyzer = Analyzer(
    HtmlTokenizer.tokenize(_, Set("formula"), Set("sup")),
    removeLongLimit = 40,
    lowerCase = true,
    stopWords = true
  )

  private def toks(a: Analyzer, s: String): Seq[(String, Int, Int, Int)] =
    a.tokenize(s).map(t => (t.text, t.position, t.offsetFrom, t.offsetTo))

  test("en tokenizer") {
    assert(toks(wordAnalyzer, "Hello, world!") == Seq(("hello", 0, 0, 5), ("world", 1, 7, 12)))
  }

  test("zh tokenizer: CJK chars are standalone tokens") {
    assert(
      toks(wordAnalyzer, "在查hello, worl土d动!") == Seq(
        ("在", 0, 0, 3), ("查", 1, 3, 6), ("hello", 2, 6, 11),
        ("worl", 3, 13, 17), ("土", 4, 17, 20), ("d", 5, 20, 21), ("动", 6, 21, 24)
      )
    )
    assert(
      toks(wordAnalyzer, "在查土d动") == Seq(
        ("在", 0, 0, 3), ("查", 1, 3, 6), ("土", 2, 6, 9), ("d", 3, 9, 10), ("动", 4, 10, 13)
      )
    )
    assert(
      toks(wordAnalyzer, "Veri 在查hello, c查m p查 查lex  worl土d动!") == Seq(
        ("veri", 0, 0, 4), ("在", 1, 5, 8), ("查", 2, 8, 11), ("hello", 3, 11, 16),
        ("c", 4, 18, 19), ("查", 5, 19, 22), ("m", 6, 22, 23), ("p", 7, 24, 25),
        ("查", 8, 25, 28), ("查", 9, 29, 32), ("lex", 10, 32, 35),
        ("worl", 11, 37, 41), ("土", 12, 41, 44), ("d", 13, 44, 45), ("动", 14, 45, 48)
      )
    )
    assert(toks(wordAnalyzer, "。").isEmpty)
  }

  test("html: plain text passthrough") {
    assert(toks(htmlAnalyzer, "Hello, world!") == Seq(("hello", 0, 0, 5), ("world", 1, 7, 12)))
  }

  test("html: nested elements") {
    assert(
      toks(htmlAnalyzer, "<article>test1 <t2>test2 TEST3</t2></article>") == Seq(
        ("test1", 0, 9, 14), ("test2", 1, 19, 24), ("test3", 2, 25, 30)
      )
    )
  }

  test("html: ignored tag drops subtree") {
    assert(
      toks(htmlAnalyzer, "<article>test1 test2<p>link link2</p><formula>1 + 2</formula><p>link3 link4</p></article>") ==
        Seq(("test1", 0, 9, 14), ("test2", 1, 15, 20), ("link", 2, 23, 27),
            ("link2", 3, 28, 33), ("link3", 4, 64, 69), ("link4", 5, 70, 75))
    )
  }

  test("html: unclosed paragraphs with ignored tag") {
    assert(
      toks(htmlAnalyzer, "test1 test2<p>link link2<formula>1 + 2</formula><p>link3 link4") ==
        Seq(("test1", 0, 0, 5), ("test2", 1, 6, 11), ("link", 2, 14, 18),
            ("link2", 3, 19, 24), ("link3", 4, 51, 56), ("link4", 5, 57, 62))
    )
  }

  test("html: ignored tag mid-text") {
    assert(
      toks(htmlAnalyzer, "link link2<formula>1 + 2</formula>link3 link4") ==
        Seq(("link", 0, 0, 4), ("link2", 1, 5, 10), ("link3", 2, 34, 39), ("link4", 3, 40, 45))
    )
  }

  test("html: non-inlined <i> in this config breaks spans") {
    // NOTE: in this golden config <i> is NOT inlined (only sup is), so it
    // separates tokens.
    assert(
      toks(htmlAnalyzer, "link link2<i>link</i>link3 link4") ==
        Seq(("link", 0, 0, 4), ("link2", 1, 5, 10), ("link", 2, 13, 17),
            ("link3", 3, 21, 26), ("link4", 4, 27, 32))
    )
    assert(
      toks(htmlAnalyzer, "link link2 <i>link</i>link3 link4") ==
        Seq(("link", 0, 0, 4), ("link2", 1, 5, 10), ("link", 2, 14, 18),
            ("link3", 3, 22, 27), ("link4", 4, 28, 33))
    )
    assert(
      toks(htmlAnalyzer, "link link2 <i>link</i> link3 link4") ==
        Seq(("link", 0, 0, 4), ("link2", 1, 5, 10), ("link", 2, 14, 18),
            ("link3", 3, 23, 28), ("link4", 4, 29, 34))
    )
    assert(
      toks(htmlAnalyzer, "link link2<i>link</i> link3 link4") ==
        Seq(("link", 0, 0, 4), ("link2", 1, 5, 10), ("link", 2, 13, 17),
            ("link3", 3, 22, 27), ("link4", 4, 28, 33))
    )
  }

  test("html: inlined <sup> glues tokens across markup") {
    assert(
      toks(htmlAnalyzer, "link<sup>1</sup>2 link<sup>3</sup>") ==
        Seq(("link12", 0, 0, 17), ("link3", 1, 18, 28))
    )
    assert(toks(htmlAnalyzer, "link<sup attr=\"1\">1</sup>") == Seq(("link1", 0, 0, 19)))
  }

  test("html: namespaced tag breaks spans") {
    assert(
      toks(htmlAnalyzer, "link<mll:p attr=\"1\">1</mll:p>") ==
        Seq(("link", 0, 0, 4), ("1", 1, 20, 21))
    )
  }

  test("html: unclosed inlined tag at EOF") {
    assert(
      toks(htmlAnalyzer, "<p>test1 <sup>test2") ==
        Seq(("test1", 0, 3, 8), ("test2", 1, 14, 19))
    )
    assert(toks(htmlAnalyzer, "<p>test1<sup>test2") == Seq(("test1test2", 0, 3, 18)))
  }

  test("html: broken markup emits what was collected") {
    assert(toks(htmlAnalyzer, "test1<p <b>>test2</b>") == Seq(("test1", 0, 0, 5)))
  }

  test("stop words are dropped but positions preserved") {
    val a = Analyzers.summa
    assert(
      a.tokenize("the quick brown fox").map(t => (t.text, t.position)) ==
        Seq(("quick", 1), ("brown", 2), ("fox", 3))
    )
  }

  test("extractText invariant: tokenize(extract(html)) == htmlTokenize(html) on text+positions") {
    val cases = Seq(
      "Hello, world!",
      "<article>test1 <t2>test2 TEST3</t2></article>",
      "<article>test1 test2<p>link link2</p><formula>1 + 2</formula><p>link3 link4</p></article>",
      "test1 test2<p>link link2<formula>1 + 2</formula><p>link3 link4",
      "link link2<formula>1 + 2</formula>link3 link4",
      "link<sup>1</sup>2 link<sup>3</sup>",
      "link<sup attr=\"1\">1</sup>",
      "link<mll:p attr=\"1\">1</mll:p>",
      "<p>test1 <sup>test2",
      "<p>test1<sup>test2",
      "test1<p <b>>test2</b>",
      "<article>Поисковые системы en Текст<table>drop me</table> tail</article>"
    )
    cases.foreach { html =>
      val fromHtml = Analyzers.summaHtml
        .tokenize(html)
        .map(t => (t.text, t.position))
      val fromText = Analyzers.summa
        .tokenize(HtmlTokenizer.extractText(html))
        .map(t => (t.text, t.position))
      assert(fromHtml == fromText, s"invariant failed for: $html")
    }
  }

  test("extractText determinism and shape") {
    val html = "<article>A <b>bold</b> claim<formula>x+y</formula> tail</article>"
    // b is inlined by default → glued span; formula dropped → span break
    assert(HtmlTokenizer.extractText(html) == "A bold claim\n tail")
  }

  test("cyrillic lowercasing matches Unicode simple mapping") {
    assert(Analyzers.summaWithoutStopWords.tokenize("ПОИСКОВЫЕ Системы").map(_.text) ==
      Seq("поисковые", "системы"))
  }

  test("remove-long filter uses byte length") {
    val a = Analyzer(SummaTokenizer.tokenize(_), removeLongLimit = 6)
    // "заяц" is 8 UTF-8 bytes → removed; "abcde" is 5 → kept; "abcdef" is 6 → removed
    assert(a.tokenize("abcde abcdef заяц").map(_.text) == Seq("abcde"))
  }
}

/** DictTokenizer goldens (reference `dict_tokenizer.rs:110-151`). */
class DictTokenizerSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("drug dictionary: boundary-gated leftmost-longest canonical matches") {
    val toks = DictTokenizer.drugs.tokenize(
      "FOXP2 gene (not FOXP21) can be correlated with autism spectrum disorder or just autismo")
    assert(toks.size == 1, s"got $toks")
    assert(toks(0) == Token("foxp2", 0, 0, 5))
    assert(DictTokenizer.drugs.tokenize("FOXP2ген связан с аутизмом").isEmpty)
  }
  test("canonical synonym emission and custom dicts") {
    val dict = new DictTokenizer(Seq(
      Seq("levobupivacaine", "chirocain", "levobupivacaine hydrochloride"),
      Seq("aspirin", "acetylsalicylic acid")))
    assert(dict.tokenize("took Chirocain today").map(_.text) == Seq("levobupivacaine"))
    // leftmost-longest: the multiword synonym wins over the prefix
    assert(dict.tokenize("levobupivacaine hydrochloride dose") ==
      Seq(Token("levobupivacaine", 0, 0, 29)))
    assert(dict.tokenize("Acetylsalicylic Acid = ASPIRIN").map(_.text) ==
      Seq("aspirin", "aspirin"))
    // no match inside a larger word
    assert(dict.tokenize("xaspirin aspirinx").isEmpty)
  }
}
