package graft.gen

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analysis.HtmlTokenizer

/** Deterministic Common-Crawl-style pages generator (BASELINE input_hint
  * shape: `url string, warc_ts timestamp, html binary, text string,
  * lang string`). Seeded xorshift64 per row id — identical output at any
  * parallelism. Vocabulary and document shape follow the reference's seeded
  * test generator (`/root/reference/summa-core/src/components/mod.rs:96-170`:
  * `title{0..100}`, 50-word bodies over `body{0..1000}`), wrapped in HTML
  * constructs covered by the HtmlTokenizer goldens (inlined sup/b, ignored
  * formula/table, plain p/article).
  *
  * The `text` column is derived as `HtmlTokenizer.extractText(html)` — the
  * per-url byte-identical invariant the engine's tests pin.
  */
final case class Page(url: String, warc_ts: Timestamp, html: Array[Byte], text: String, lang: String)

object PageGen {

  private val Langs = Array("en", "de", "ru", "es")
  private val Epoch = 1767225600000L // 2026-01-01T00:00:00Z

  @inline private def next(x0: Long): Long = {
    var x = x0
    x ^= x << 13
    x ^= x >>> 7
    x ^= x << 17
    x
  }

  /** Pure function row-id → page (the determinism contract). */
  def page(i: Long): Page = {
    var s = next(i * 0x9E3779B97F4A7C15L + 42L)
    def rnd(bound: Int): Int = { s = next(s); (((s >>> 33) % bound).toInt + bound) % bound }

    val sb = new java.lang.StringBuilder(1024)
    sb.append("<article><h1>")
    val titleWords = 2 + rnd(4)
    var w = 0
    while (w < titleWords) { if (w > 0) sb.append(' '); sb.append("title").append(rnd(100)); w += 1 }
    sb.append("</h1>")
    val paras = 1 + rnd(3)
    var p = 0
    while (p < paras) {
      sb.append("<p>")
      val words = 20 + rnd(40)
      var k = 0
      while (k < words) {
        if (k > 0) sb.append(' ')
        rnd(20) match {
          case 0 => sb.append("the")
          case 1 => sb.append("a")
          case 2 => // inlined tag glue: bodyX<sup>N</sup>
            sb.append("body").append(rnd(1000)).append("<sup>").append(rnd(10)).append("</sup>")
          case 3 => sb.append("<b>body").append(rnd(1000)).append("</b>")
          case _ => sb.append("body").append(rnd(1000))
        }
        k += 1
      }
      // occasionally drop an ignored subtree into the paragraph
      if (rnd(4) == 0) sb.append("<formula>x + ").append(rnd(50)).append("</formula>")
      if (rnd(7) == 0) sb.append("<table><tr><td>cell").append(rnd(30)).append("</td></tr></table>")
      sb.append("</p>")
      p += 1
    }
    sb.append("</article>")
    val html = sb.toString
    Page(
      url = s"https://site${i % 1000}.example/doc/$i",
      warc_ts = new Timestamp(Epoch + i * 1000L),
      html = html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      text = HtmlTokenizer.extractText(html),
      lang = Langs((i % Langs.length).toInt)
    )
  }

  def pages(spark: SparkSession, n: Long, partitions: Int): DataFrame = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).map(i => page(i)).toDF()
  }

  /** Standalone generator CLI: `runMain graft.gen.PageGen <outDir> <nPages>`
    * — writes the deterministic corpus once so ad-hoc experiments (engine
    * A/B runs, profiling) can share it without re-deriving through Bench.
    */
  def main(args: Array[String]): Unit = {
    val (out, n) = (args(0), args(1).toLong)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-pagegen")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    pages(spark, n, 64).write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
