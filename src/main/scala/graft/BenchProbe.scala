package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe: times isolated pipeline stages at a given parallelism so
  * scaling bottlenecks can be localized. args: pagesDir cpus [genPages]
  * (genPages > 0 generates the corpus into pagesDir first)
  */
object BenchProbe {

  /** Flat-array tokenize shape (no nested struct array) — probe comparand. */
  final case class TokFlat(len: Int, norm: Int, terms: Array[String],
      tfs: Array[Int], posFlat: Array[Byte], posOff: Array[Int])

  def analyzeFlat(analyzerName: String, value: String): TokFlat = {
    val tf = index.IndexBuilder.analyzeField(analyzerName, value)
    val n = tf.terms.length
    val terms = new Array[String](n); val tfs = new Array[Int](n)
    val posOff = new Array[Int](n + 1)
    var total = 0
    var i = 0
    while (i < n) { total += tf.terms(i).positions.length; i += 1 }
    val posFlat = new Array[Byte](total)
    var o = 0
    i = 0
    while (i < n) {
      val g = tf.terms(i)
      terms(i) = g.term; tfs(i) = g.tf; posOff(i) = o
      System.arraycopy(g.positions, 0, posFlat, o, g.positions.length)
      o += g.positions.length
      i += 1
    }
    posOff(n) = o
    TokFlat(tf.len, tf.norm, terms, tfs, posFlat, posOff)
  }

  def main(args: Array[String]): Unit = {
    val (pagesDir, cpusS) = (args(0), args(1))
    val genPages = if (args.length > 2) args(2).toLong else 0L
    val cpus = cpusS.toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (genPages > 0)
      gen.PageGen.pages(spark, genPages, cpus * 2).write.mode("overwrite").parquet(pagesDir)
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $name=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val tok = udf((s: String) => index.IndexBuilder.analyzeField("summa", s))
    val tokFlat = udf((s: String) => analyzeFlat("summa", s))
    val pages = spark.read.parquet(pagesDir)
    t("warm_read")(pages.count())
    t("tokenize_only") {
      pages.select(tok(col("text")).as("tk")).select(sum(col("tk.len"))).collect()
    }
    t("tokenize_only2") {
      pages.select(tok(col("text")).as("tk")).select(sum(col("tk.len"))).collect()
    }
    t("tokenize_flat") {
      pages.select(tokFlat(col("text")).as("tk")).select(sum(col("tk.len"))).collect()
    }
    t("tokenize_flat2") {
      pages.select(tokFlat(col("text")).as("tk")).select(sum(col("tk.len"))).collect()
    }
    t("tokenize_scala_baseline") {
      // pure-Scala tokenize cost without ANY Catalyst row encoding
      import spark.implicits._
      pages.select(col("text")).as[String]
        .mapPartitions { it =>
          var acc = 0L
          it.foreach(s => acc += index.IndexBuilder.analyzeField("summa", s).len)
          Iterator.single(acc)
        }.reduce(_ + _)
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
