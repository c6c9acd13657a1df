package graft
import org.apache.spark.sql.SparkSession
object Stress {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","64").config("spark.ui.enabled","false")
      .config("spark.sql.parquet.compression.codec","zstd").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val work = java.nio.file.Files.createTempDirectory("graft-stress").toString
    gen.PageGen.pages(spark, 1000000L, 64).write.parquet(s"$work/pages")
    val t0 = System.nanoTime()
    index.IndexBuilder.build(spark, spark.read.parquet(s"$work/pages"),
      index.IndexSchema.pages, s"$work/index", "stress-1m",
      index.IndexBuilder.BuildConf(numSegments = 16, buildPartitions = 64))
    val sec = (System.nanoTime()-t0)/1e9
    val s = new search.Searcher(new search.IndexReader(spark, s"$work/index"), index.IndexSchema.pages)
    val t1 = System.nanoTime()
    val top = s.topDocs(search.MatchQuery("body42 body7"), 10).collect()
    println(f"STRESS_1M build_sec=$sec%.1f docs_per_sec=${1000000/sec}%.0f query_sec=${(System.nanoTime()-t1)/1e9}%.2f top=${top.length}")
    spark.stop()
  }
}
