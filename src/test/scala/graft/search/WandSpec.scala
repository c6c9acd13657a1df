package graft.search

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.index.{FieldDef, IndexBuilder, IndexSchema}

/** Block-max WAND must be result-identical to the exhaustive plan. */
class WandSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = IndexSchema(
    keyField = "doc_id",
    fields = Seq(FieldDef("text", "summa", "position")),
    defaultFields = Seq("text"))

  private lazy val searcher: Searcher = {
    val rnd = new scala.util.Random(33)
    // zipfian-ish vocab so some terms are dense (WAND-prunable)
    val vocab = Vector.tabulate(50)(i => s"w$i")
    def pick(): String = vocab(math.min((math.abs(rnd.nextGaussian()) * 10).toInt, 49))
    val docs = Vector.tabulate(500)(i =>
      (i.toLong, Vector.fill(10 + rnd.nextInt(40))(pick()).mkString(" ")))
    val dir = Files.createTempDirectory("graft-wand").toString
    IndexBuilder.build(spark, docs.toDF("doc_id", "text"), schema, dir, "wand",
      IndexBuilder.BuildConf(numSegments = 3, blockBits = 5))
    new Searcher(new IndexReader(spark, dir), schema)
  }

  private def exhaustive(q: Query, k: Int) =
    searcher.search(q)
      .orderBy(col("score").desc, col("segment_id").asc, col("doc_id").asc)
      .limit(k)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))

  private def assertSame(a: Array[(Int, Int, Double)], b: Array[(Int, Int, Double)]): Unit = {
    assert(a.length == b.length)
    a.zip(b).foreach { case ((s1, d1, sc1), (s2, d2, sc2)) =>
      assert(s1 == s2 && d1 == d2, s"doc order differs: ($s1,$d1) vs ($s2,$d2)")
      assert(math.abs(sc1 - sc2) < 1e-12, s"score differs: $sc1 vs $sc2")
    }
  }

  test("single term: WAND == exhaustive (bitwise scores)") {
    for (t <- Seq("w0", "w5", "w20")) {
      val wand = WandTopK.topK(searcher, "text", Seq(t), 10)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      val base = exhaustive(TermQuery("text", t), 10)
      assert(wand.map(x => (x._1, x._2)).toSeq == base.map(x => (x._1, x._2)).toSeq)
      wand.zip(base).foreach { case (w, e) => assert(w._3 == e._3, "scores must be bitwise equal") }
    }
  }

  test("multi-term should bag: WAND == exhaustive") {
    val terms = Seq("w0", "w1", "w7", "w15")
    val q = BooleanQuery(terms.map(t => (Occur.Should, TermQuery("text", t): Query)))
    val wand = WandTopK.topK(searcher, "text", terms, 15)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assertSame(wand, exhaustive(q, 15))
  }

  test("k larger than matches; missing terms") {
    val wand = WandTopK.topK(searcher, "text", Seq("w49", "nosuchterm"), 1000)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    val base = exhaustive(TermQuery("text", "w49"), 1000)
    assertSame(wand, base)
    assert(WandTopK.topK(searcher, "text", Seq("nosuchterm"), 10).count() == 0)
  }

  test("topDocs auto-routes eligible queries through WAND") {
    val q = BooleanQuery(Seq(
      (Occur.Should, TermQuery("text", "w0")),
      (Occur.Should, TermQuery("text", "w3"))))
    assert(WandTopK.eligible(q).contains(("text", Seq("w0", "w3"))))
    assert(WandTopK.eligible(BooleanQuery(Seq(
      (Occur.Must, TermQuery("text", "w0")),
      (Occur.Should, TermQuery("text", "w3"))))).isEmpty)
    val viaTopDocs = searcher.topDocs(q, 10)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assertSame(viaTopDocs, exhaustive(q, 10))
    // offset paging stays correct through the WAND route
    val all = exhaustive(q, 20)
    val page2 = searcher.topDocs(q, 10, offset = 10)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assertSame(page2, all.drop(10))
  }
}
