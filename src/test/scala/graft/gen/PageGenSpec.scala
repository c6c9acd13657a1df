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

/** Scale-mechanics assertions: head-term skew bounding + typed ranges. */
class ScaleMechanicsSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("head term present in every doc shards into bounded posting blocks") {
    // 2000 docs ALL containing 'common' → without block keying this would be
    // one giant posting group; with blockBits=6 groups are <= 64 postings
    val docs = (0L until 2000L).map(i => (i, s"common w${i % 37} w${i % 11}"))
    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
    graft.index.IndexBuilder.build(
      spark, docs.toDF("doc_id", "text"),
      graft.index.IndexSchema(
        "doc_id", Seq(graft.index.FieldDef("text", "summa", "position")), Seq("text")),
      dir, "skew", graft.index.IndexBuilder.BuildConf(numSegments = 2, blockBits = 6))
    val blocks = spark.read.parquet(s"$dir/postings")
      .filter($"term" === "common")
      .select("doc_count").collect().map(_.getInt(0))
    assert(blocks.sum == 2000)
    assert(blocks.max <= 64, s"block group exceeded the docId-range bound: ${blocks.max}")
    assert(blocks.length >= 2000 / 64, "head term must shard across many blocks")
  }

  test("typed timestamp range over the pages index") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tsrange").toString
    val df = graft.gen.PageGen.pages(spark, 200, 4)
    graft.index.IndexBuilder.build(spark, df, graft.index.IndexSchema.pages, dir, "ts",
      graft.index.IndexBuilder.BuildConf(numSegments = 2))
    val s = new graft.search.Searcher(
      new graft.search.IndexReader(spark, dir), graft.index.IndexSchema.pages)
    // rows have warc_ts = 2026-01-01T00:00:00Z + i seconds
    val q = graft.search.RangeQuery(
      "warc_ts", Some("2026-01-01 00:00:50"), Some("2026-01-01 00:01:39"))
    assert(s.count(q) == 50L)
  }
}
