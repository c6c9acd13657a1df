package graft

import org.apache.spark.sql.SparkSession

/** Replicates the driver's smoke check: `SparkEntry.entry` at sf0.001 must
  * return rows. Usage: `sbt -batch "runMain graft.Smoke"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = SparkEntry.entry(spark).collect()
    println(s"SMOKE_ENTRY_ROWS=${rows.length}")
    rows.take(3).foreach(r => println(s"SMOKE_ROW=$r"))
    spark.stop()
  }
}
