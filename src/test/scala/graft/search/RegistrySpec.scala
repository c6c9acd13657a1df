package graft.search

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.{FieldDef, IndexBuilder, IndexSchema}

class RegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = IndexSchema(
    keyField = "doc_id",
    fields = Seq(FieldDef("text", "summa", "position")),
    defaultFields = Seq("text"))

  test("registry: aliases, cross-index merged top-k, export, top terms, warmup") {
    def mk(docs: Seq[(Long, String)], tag: String): Searcher = {
      val dir = Files.createTempDirectory(s"graft-reg-$tag").toString
      IndexBuilder.build(spark, docs.toDF("doc_id", "text"), schema, dir, tag,
        IndexBuilder.BuildConf(numSegments = 2))
      new Searcher(new IndexReader(spark, dir), schema)
    }
    val a = mk(Seq((1L, "spark window"), (2L, "spark spark merge")), "a")
    val b = mk(Seq((10L, "spark table"), (11L, "scan filter")), "b")

    val reg = new IndexRegistry
    reg.register("idx_a", a)
    reg.register("idx_b", b)
    reg.addAlias("primary", "idx_a")
    assert(reg.resolve("primary") eq a)

    val merged = reg.searchAll(Seq("idx_a", "idx_b"), TermQuery("text", "spark"), 10).collect()
    assert(merged.length == 3)
    assert(merged.map(_.getAs[String]("index_name")).toSet == Set("idx_a", "idx_b"))

    val top = Reflection.topTerms(a.reader, "text", 2).collect()
    assert(top.head.getString(0) == "spark" && top.head.getLong(1) == 2L)
    val perSeg = Reflection.topTermsPerSegment(a.reader, "text", 5).collect()
    assert(perSeg.nonEmpty)

    val export = Reflection.exportDocuments(a, Some(TermQuery("text", "merge")), Seq("key"))
      .collect().map(_.getString(0))
    assert(export.toSeq == Seq("2"))
    assert(Reflection.exportDocuments(a).count() == 2)

    Reflection.warmup(a.reader) // smoke: no exceptions
  }

  test("prime: queries scan the columnar cache, unprime releases it") {
    val dir = Files.createTempDirectory("graft-reg-prime").toString
    IndexBuilder.build(spark,
      Seq((1L, "spark window"), (2L, "merge table"), (3L, "spark scan"))
        .toDF("doc_id", "text"),
      schema, dir, "prime", IndexBuilder.BuildConf(numSegments = 2))
    val s = new Searcher(new IndexReader(spark, dir), schema)

    def physical(q: Query): String =
      s.search(q).queryExecution.executedPlan.toString

    assert(!physical(TermQuery("text", "spark")).contains("InMemoryTableScan"))
    Reflection.prime(s.reader)
    try {
      // CacheManager fragment-matching: the SAME query plan now scans the
      // in-memory relation without any query-side change
      assert(physical(TermQuery("text", "spark")).contains("InMemoryTableScan"))
      val hits = s.search(TermQuery("text", "spark")).collect()
      assert(hits.length == 2)
    } finally Reflection.unprime(s.reader)
    assert(!physical(TermQuery("text", "spark")).contains("InMemoryTableScan"))
  }

  test("exportNamedJson: multi_fields render as arrays, others collapse (golden)") {
    val mschema = IndexSchema(
      keyField = "doc_id",
      fields = Seq(FieldDef("text", "summa", "position")),
      defaultFields = Seq("text"),
      storedFields = Seq("title", "tags"))
    val dir = Files.createTempDirectory("graft-reg-json").toString
    val docs = Seq(
      (1L, "spark window", "Guide", Seq("reality", "novel")),
      (2L, "merge table", "Envy", Seq("scifi")))
      .toDF("doc_id", "text", "title", "tags")
    IndexBuilder.build(spark, docs, mschema, dir, "nj", IndexBuilder.BuildConf(numSegments = 1))
    val s = new Searcher(new IndexReader(spark, dir), mschema)

    // reference custom_serializer.rs:26-45: multi-field "tags" → array,
    // array-typed non-multi collapses to its first value, scalars pass;
    // fields emit name-sorted (BTreeMap)
    val multi = Reflection.exportNamedJson(
      s, fields = Seq("title", "tags"), multiFields = Set("tags"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(multi("1") == """{"tags":["reality","novel"],"title":"Guide"}""")
    assert(multi("2") == """{"tags":["scifi"],"title":"Envy"}""")

    val collapsed = Reflection.exportNamedJson(
      s, fields = Seq("title", "tags"), multiFields = Set("title"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(collapsed("1") == """{"tags":"reality","title":["Guide"]}""")

    // default fields = Nil: emits every doc column EXCEPT the reserved
    // key/segment_id/doc_id/score set — regression for the duplicate-key
    // ambiguous-reference bug (key must appear once, as the outer column)
    val dflt = Reflection.exportNamedJson(s)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(dflt("1").contains(""""title":"Guide""""))
    assert(!dflt("1").contains(""""key""""))
  }
}
