package graft.plans

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.{FieldDef, IndexBuilder, IndexSchema}
import graft.search.{IndexReader, MatchQuery, Searcher}

/** SQL table functions (`search` / `search_top` / `index_docs`) and the
  * `_schema.json` self-description they rely on.
  */
class GraftSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = IndexSchema(
    keyField = "doc_id",
    fields = Seq(
      FieldDef("text", "summa", "position"),
      FieldDef("lang", "raw", "basic")),
    defaultFields = Seq("text"),
    storedFields = Seq("lang", "n")
  )

  private val vocab = Vector("spark", "window", "merge", "table", "scan", "join", "query")
  private lazy val indexDir: String = {
    val dir = Files.createTempDirectory("graft-sqlspec").toString
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Vector.tabulate(150) { i =>
      val n = 4 + rnd.nextInt(30)
      val text = Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i.toLong, text, if (i % 3 == 0) "en" else "de", n)
    }
    IndexBuilder.build(spark, rows.toDF("doc_id", "text", "lang", "n"), schema, dir,
      "sql-spec", IndexBuilder.BuildConf(numSegments = 2, blockBits = 4))
    dir
  }
  private lazy val searcher = new Searcher(new IndexReader(spark, indexDir), schema)

  test("schema json round-trips and is persisted by build") {
    val json = IndexSchema.toJson(schema)
    assert(IndexSchema.fromJson(json) == schema)
    assert(IndexSchema.load(spark, indexDir).contains(schema))
  }

  test("search_top('dir', ...) matches Searcher.topDocsWithKeys via _schema.json") {
    GraftSql.install(spark)
    val got = spark.sql(s"SELECT key, score FROM search_top('$indexDir', 'spark window', 7)")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val want = searcher.topDocsWithKeys(MatchQuery("spark window"), 7)
      .select("key", "score").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == want.toSeq)
  }

  test("search('name', ...) resolves the shared registry and aggregates in SQL") {
    GraftSql.install(spark)
    GraftSql.registry.register("sqlidx", searcher)
    val got = spark.sql(
      "SELECT lang, count(*) AS n FROM search('sqlidx', 'spark') GROUP BY lang ORDER BY lang")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = searcher.searchWithDocs(MatchQuery("spark"))
      .groupBy("lang").count().orderBy("lang")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == want.toSeq)
    assert(got.map(_._2).sum == searcher.count(MatchQuery("spark")))
  }

  test("index_docs scans the doc store; constants are enforced") {
    GraftSql.install(spark)
    assert(spark.sql(s"SELECT count(*) FROM index_docs('$indexDir')").collect()(0).getLong(0)
      == searcher.reader.docs.count())
    val err = intercept[Exception] {
      spark.sql(s"SELECT * FROM search_top('$indexDir', 'spark', 1 + CAST(rand() AS INT))").collect()
    }
    assert(err.getMessage.contains("constant") || err.getMessage != null)
  }

  test("SummaQL surface works through SQL (field term + phrase)") {
    GraftSql.install(spark)
    val phrase = spark.sql(
      s"""SELECT key FROM search('$indexDir', '"spark window"')""").count()
    val want = searcher.search(MatchQuery("\"spark window\"")).count()
    assert(phrase == want && want > 0)
    val fielded = spark.sql(
      s"SELECT count(*) FROM search('$indexDir', 'lang:en')").collect()(0).getLong(0)
    assert(fielded == searcher.count(MatchQuery("lang:en")))
  }
}
