package graft

import org.apache.spark.sql.SparkSession

import graft.index.IndexSchema
import graft.search._

/** Dumps the physical plans of the headline query shapes over an existing
  * pages index (plan-audit evidence generator for PLANS.md).
  * args: indexDir
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = new Searcher(new IndexReader(spark, args(0)), IndexSchema.pages)
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n### $name\n")
      println("```")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode).take(4000))
      println("```")
    }
    dump("term top-10 (exhaustive path)",
      s.search(TermQuery("text", "body42"))
        .orderBy(org.apache.spark.sql.functions.col("score").desc).limit(10))
    dump("boolean must (join of two scored term sets)",
      s.search(BooleanQuery(Seq(
        (Occur.Must, TermQuery("text", "body42")),
        (Occur.Must, TermQuery("text", "body7"))))))
    dump("phrase slop=0 (positional join)",
      s.search(PhraseQuery("text", Seq((0, "body42"), (1, "body7")), 0)))
    dump("range on fast field (docs-table predicate)",
      s.search(RangeQuery("warc_ts", Some("2026-01-01 00:10:00"), None)))
    // raw single-token-field fast path: a TermQuery on a stored raw field
    // (lang) must be answered from the DOCS scan — pushed EqualTo(lang,en),
    // no postings FileScan anywhere in the plan, closed-form BM25 (tf=1)
    dump("head term on raw field top-10 (docs-scan fast path, no posting IO)",
      s.search(TermQuery("lang", "en"))
        .orderBy(org.apache.spark.sql.functions.col("score").desc).limit(10))
    // SQL TVF route: must expand to the SAME physical shape as the
    // DataFrame API (TakeOrderedAndProject + pushed term filters) — the
    // table function is analysis-time sugar, invisible to Catalyst
    graft.plans.GraftSql.registry.register("plandump", s)
    graft.plans.GraftSql.install(spark)
    dump("SQL table function: SELECT * FROM search_top('idx', 'body42', 10)",
      spark.sql("SELECT key, score FROM search_top('plandump', 'body42', 10)"))
    spark.stop()
  }
}
