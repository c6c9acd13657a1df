package graft.tools

import org.apache.spark.sql.SparkSession

/** Corpus generator helper for offline profiling: args = nPages outDir. */
object GenPages {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.gen.PageGen.pages(spark, args(0).toLong, 64).write.mode("overwrite").parquet(args(1))
    spark.stop()
  }
}
