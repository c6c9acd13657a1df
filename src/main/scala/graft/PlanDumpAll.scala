package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

import graft.search._

/** Dumps `.explain("formatted")` for every declared SparkEntry query (and
  * the bench topDocs shapes) to one file per query — the plan-audit evidence
  * for plans/r06/ (the judge checks plan claims against these files).
  *
  * args: sfDir outDir suffix [queryName ...]  (no names = all)
  */
object PlanDumpAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val only = args.drop(3).toSet
    Files.createDirectories(Paths.get(outDir))

    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def write(name: String, planText: String): Unit = {
      Files.write(
        Paths.get(outDir, s"${name}_$suffix.txt"),
        planText.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      println(s"dumped $name")
    }

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        try {
          val df = fn(spark, sfDir)
          write(name, df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        } catch {
          case e: Throwable => System.err.println(s"$name FAILED: $e")
        }
      }
    }

    // bench topDocs shapes (the serving path the bench times) over the same
    // docs index — named bench_*, so plan changes on the WAND route are
    // auditable alongside the declared queries
    val s = DocsIndex.searcher(spark, sfDir)
    val benchShapes = Seq[(String, Query)](
      "bench_term_top10" -> TermQuery("text", "spark"),
      "bench_bool_top10" -> BooleanQuery(Seq(
        (Occur.Must, TermQuery("text", "spark")),
        (Occur.Should, TermQuery("text", "window")))),
      "bench_phrase_top10" -> PhraseQuery("text", Seq((0, "spark"), (1, "window")), 0),
      "bench_match_top10" -> MatchQuery("spark window -batch"),
      "bench_dismax_top10" -> DisjunctionMaxQuery(
        Seq(TermQuery("text", "spark"), TermQuery("text", "window")), 0.3)
    )
    benchShapes.foreach { case (name, q) =>
      if (only.isEmpty || only.contains(name)) {
        try {
          val df = s.topDocs(q, 10)
          write(name, df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        } catch {
          case e: Throwable => System.err.println(s"$name FAILED: $e")
        }
      }
    }
    spark.stop()
  }
}
