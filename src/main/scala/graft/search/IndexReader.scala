package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Read-side handle on a committed index (reference analog: `IndexHolder`
  * over a tantivy `Searcher`,
  * `/root/reference/summa-core/src/components/index_holder.rs:378-402`).
  *
  * Global statistics (N, avgdl, per-term df) are bound once per query at plan
  * time — the Spark equivalent of tantivy building a `Weight` with
  * searcher-level stats (`index_holder.rs:385-392`).
  */
final case class FieldStat(nDocs: Long, totalTokens: Long) {
  def avgdl: Double = if (nDocs == 0) 0.0 else totalTokens.toDouble / nDocs
}

class IndexReader(val spark: SparkSession, val indexDir: String) extends Serializable {

  lazy val fieldStats: Map[String, FieldStat] =
    spark.read
      .parquet(s"$indexDir/fieldstats")
      .collect()
      .map(r => r.getString(0) -> FieldStat(r.getLong(1), r.getLong(2)))
      .toMap

  // lazy vals: the file index (listing + schema) is built once per reader,
  // not re-listed on every query
  lazy val postings: DataFrame = spark.read.parquet(s"$indexDir/postings")
  lazy val docs: DataFrame = spark.read.parquet(s"$indexDir/docs")
  lazy val termStatsDf: DataFrame = spark.read.parquet(s"$indexDir/termstats")
  lazy val metrics: DataFrame = spark.read.parquet(s"$indexDir/metrics")

  /** Batch df lookup for all terms of a query — one pushed-down scan of the
    * term-sorted stats table, collected driver-side (idf becomes a plan
    * literal, like tantivy's per-query Weight).
    */
  def termDfs(pairs: Seq[(String, String)]): Map[(String, String), Long] = {
    if (pairs.isEmpty) return Map.empty
    val byField = pairs.groupBy(_._1)
    val cond = byField
      .map { case (f, ps) => col("field") === f && col("term").isin(ps.map(_._2): _*) }
      .reduce(_ || _)
    termStatsDf
      .filter(cond)
      .select("field", "term", "df")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
  }
}
