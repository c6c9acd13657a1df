package graft.gen

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.analysis.{Analyzers, HtmlTokenizer}
import graft.index.{IndexBuilder, IndexSchema}
import graft.search.{IndexReader, Searcher, TermQuery}

class PageGenSpec extends AnyFunSuite {

  test("pages are deterministic and respect the byte-identical extraction invariant") {
    (0L until 300L).foreach { i =>
      val pg = PageGen.page(i)
      val html = new String(pg.html, java.nio.charset.StandardCharsets.UTF_8)
      assert(HtmlTokenizer.extractText(html) == pg.text, s"extract invariant failed at row $i")
      // tokenizing the html directly must equal tokenizing the text column
      val fromHtml = Analyzers.summaHtml.tokenize(html).map(t => (t.text, t.position))
      val fromText = Analyzers.summa.tokenize(pg.text).map(t => (t.text, t.position))
      assert(fromHtml == fromText, s"token invariant failed at row $i")
      assert(PageGen.page(i) == pg || true) // case class with Array: compare fields
      val again = PageGen.page(i)
      assert(again.url == pg.url && again.text == pg.text &&
        java.util.Arrays.equals(again.html, pg.html))
    }
  }

  test("pages corpus builds and searches end-to-end over the html-derived text") {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("graft-pages").toString
    val df = PageGen.pages(spark, 500, 4)
    IndexBuilder.build(spark, df, IndexSchema.pages, dir, "pages-e2e",
      IndexBuilder.BuildConf(numSegments = 4))
    val s = new Searcher(new IndexReader(spark, dir), IndexSchema.pages)
    // oracle: docs whose analyzed text contains the term
    val want = (0L until 500L).count(i => Analyzers.summa.tokenize(PageGen.page(i).text).exists(_.text == "body1"))
    assert(s.count(TermQuery("text", "body1")) == want.toLong)
    // inlined-sup glue terms (e.g. body123<sup>4</sup> -> body1234) must be searchable
    val glued = (0L until 500L).flatMap { i =>
      Analyzers.summaHtml.tokenize(new String(PageGen.page(i).html, "UTF-8")).map(_.text)
    }.filter(_.matches("body\\d{4,}"))
    assert(glued.nonEmpty)
    assert(s.count(TermQuery("text", glued.head)) >= 1L)
    // lang raw field searchable
    assert(s.count(TermQuery("lang", "en")) == (0L until 500L).count(_ % 4 == 0).toLong)
  }
}
