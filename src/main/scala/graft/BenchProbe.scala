package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe: times isolated pipeline stages at a given parallelism so
  * scaling bottlenecks can be localized. args: pagesDir cpus
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val Array(pagesDir, cpusS) = args
    val cpus = cpusS.toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $name=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val tok = udf((s: String) => index.IndexBuilder.analyzeField("summa", s))
    val pages = spark.read.parquet(pagesDir)
    t("warm_read")(pages.count())
    t("tokenize_only") {
      pages.select(tok(col("text")).as("tk")).select(sum(col("tk.len"))).collect()
    }
    t("tokenize_only2") {
      pages.select(tok(col("text")).as("tk")).select(sum(col("tk.len"))).collect()
    }
    t("shuffle_sort") {
      pages.select(col("url"), col("text"))
        .repartitionByRange(cpus, col("url"))
        .sortWithinPartitions("url")
        .select(sum(length(col("text")))).collect()
    }
    t("explode_shuffle") {
      pages.select(col("url"), tok(col("text")).as("tk"))
        .select(col("url"), explode(col("tk.terms")).as("t"))
        .repartitionByRange(cpus, col("t.term"))
        .select(count(lit(1))).collect()
    }
    t("write_parquet") {
      pages.select(col("url"), col("text")).write.mode("overwrite")
        .parquet(s"/tmp/probe-out-$cpus")
    }
    spark.stop()
  }
}
