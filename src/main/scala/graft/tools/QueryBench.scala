package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.IndexSchema
import graft.search._

/** Query-latency probe over an existing pages index: median of 5 warm runs
  * per headline shape, optionally with the hotcache primed
  * ([[Reflection.prime]]). args: indexDir [prime]
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = new Searcher(new IndexReader(spark, args(0)), IndexSchema.pages)
    if (args.length > 1 && args(1) == "prime") Reflection.prime(s.reader)
    val queries = Vector[(String, Query)](
      "term" -> TermQuery("text", "body42"),
      "bool" -> BooleanQuery(Seq(
        (Occur.Must, TermQuery("text", "body42")),
        (Occur.Should, TermQuery("text", "body7")))),
      "phrase" -> PhraseQuery("text", Seq((0, "body42"), (1, "body7")), 0),
      "match" -> MatchQuery("body42 body7 -body9"),
      "head" -> BooleanQuery(Seq(
        (Occur.Must, TermQuery("lang", "en")),
        (Occur.Should, TermQuery("text", "body42"))))
    )
    queries.foreach { case (name, q) =>
      s.topDocs(q, 10).collect()
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        s.topDocs(q, 10).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QUERY_$name=${ts.sorted.apply(2)}%.4f")
    }
    spark.stop()
  }
}
