package graft

import org.apache.spark.sql.SparkSession

import graft.index.{IndexBuilder, IndexSchema, Maintenance, ResumableBuild}
import graft.search.{IndexReader, MatchQuery, Searcher}

/** spark-submit entry points for multi-executor clusters (no master is set
  * here — the launcher provides it; north-rule "runs via spark-submit at N
  * and 4N executors").
  *
  * {{{
  * spark-submit --class graft.BuildIndex app.jar <pagesDir> <indexDir> \
  *   [numSegments] [waves]
  * spark-submit --class graft.QueryIndex app.jar <indexDir> <summaQL> [k]
  * spark-submit --class graft.CompactIndex app.jar <indexDir>
  * }}}
  */
object BuildIndex {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BuildIndex <pagesDir> <indexDir> [numSegments] [waves]")
    val pagesDir = args(0)
    val indexDir = args(1)
    val numSegments = if (args.length > 2) args(2).toInt else 64
    val waves = if (args.length > 3) args(3).toInt else 1
    val spark = SparkSession.builder().appName("graft-build-index")
      // build caches hold near-distinct strings (doc keys, stored text) —
      // the columnar dictionary encoder's stat pass never pays off here
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .getOrCreate()
    val pages = spark.read.parquet(pagesDir)
    val buildId = s"build-${java.util.UUID.randomUUID()}"
    val segs =
      if (waves <= 1) {
        IndexBuilder.build(spark, pages, IndexSchema.pages, indexDir, buildId,
          IndexBuilder.BuildConf(numSegments = numSegments))
        graft.index.Snapshots.latest(spark, indexDir).get.segments
      } else
        ResumableBuild.build(spark, pages, IndexSchema.pages, indexDir, buildId,
          IndexBuilder.BuildConf(numSegments = numSegments), waves = waves)
    println(s"BUILT segments=${segs.mkString(",")}")
    spark.stop()
  }
}

object QueryIndex {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryIndex <indexDir> <summaQL> [k]")
    val indexDir = args(0)
    val query = args(1)
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder().appName("graft-query-index").getOrCreate()
    // indexes self-describe via _schema.json since r3; the pages schema is
    // only the fallback for pre-schema-file index dirs
    val schema = IndexSchema.load(spark, indexDir).getOrElse(IndexSchema.pages)
    val s = new Searcher(new IndexReader(spark, indexDir), schema)
    s.topDocsWithKeys(MatchQuery(query), k).show(k, truncate = false)
    spark.stop()
  }
}

object CompactIndex {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: CompactIndex <indexDir> [minNumSegments]")
    val indexDir = args(0)
    val minSegs = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder().appName("graft-compact-index").getOrCreate()
    val schema = IndexSchema.load(spark, indexDir).getOrElse(IndexSchema.pages)
    val created = Maintenance.autoCompact(
      spark, indexDir, schema, s"compact-${java.util.UUID.randomUUID()}", minSegs)
    println(s"COMPACTED new_segments=${created.mkString(",")}")
    spark.stop()
  }
}
