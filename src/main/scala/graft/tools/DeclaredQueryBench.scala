package graft.tools

import org.apache.spark.sql.SparkSession

/** Times every declared `SparkEntry` query at a given SF through the noop
  * sink (optimization guide §1.4: computes every column of every row, no
  * sink cost, no optimizer shortcuts) — the per-query evidence harness for
  * OPTIMIZATION_r06.md. Extra measurement main; the frozen Bench/Verify
  * contracts are untouched.
  *
  * Each rep re-plans and re-executes the query from the parquet inputs (the
  * memoized docs-index build is excluded by the warm-up rep, exactly like
  * the driver's serving-path timings). Prints ONE JSON line of per-query
  * median seconds.
  *
  * args: sfDir [reps] [query ...]   env: SPARK_GRAFT_CPUS (default 32)
  */
object DeclaredQueryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-declared-query-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val out = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (only.nonEmpty && !only.contains(name)) None
      else {
        spark.sparkContext.setJobDescription(s"dqb $name")
        def run(): Unit =
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        run() // warm: builds the memoized index, loads file indexes, JITs
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
        }
        System.err.println(f"[dqb] $name%-24s ${med(ts)}%.4f s")
        Some(name -> med(ts))
      }
    }
    println("{" +
      out.map { case (k, v) => s""""$k":${math.rint(v * 10000) / 10000}""" }.mkString(",") +
      "}")
    spark.stop()
  }
}
