package graft

import org.apache.spark.sql.SparkSession

import graft.index.{IndexBuilder, IndexSchema}

/** One CPU-pinned build phase, run as a `taskset`-confined subprocess by
  * [[Bench]] so that `local[8]` really means 8 cores (GC / codec / IO threads
  * included) — the faithful sandbox stand-in for an N-executor cluster.
  *
  * args: pagesDir indexDir cpus
  * stdout: `BUILD_SECONDS=<float>`
  */
object BenchPhase {
  def main(args: Array[String]): Unit = {
    val Array(pagesDir, indexDir, cpusS) = args
    val cpus = cpusS.toInt
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-phase-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warmup: JIT + codec + scheduler paths; also faults the input into the
    // OS page cache so the timed run measures compute, not cold reads
    spark.read.parquet(pagesDir).count()
    IndexBuilder.build(
      spark, spark.read.parquet(pagesDir).limit(2000), IndexSchema.pages,
      s"$indexDir-warm", "warm", IndexBuilder.BuildConf(numSegments = 2))

    val t0 = System.nanoTime()
    IndexBuilder.build(
      spark, spark.read.parquet(pagesDir), IndexSchema.pages,
      indexDir, s"bench-$cpus",
      IndexBuilder.BuildConf(numSegments = 8, buildPartitions = cpus))
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"BUILD_SECONDS=$sec%.4f")
    spark.stop()
  }
}
