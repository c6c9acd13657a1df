package graft

import java.nio.file.Files

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, IndexSchema}
import graft.search.{IndexReader, Query, Searcher}

/** Per-process memoized index over a test dir's `documents` table — the
  * corpus the driver's DuckDB oracle can also see.
  */
object DocsIndex {
  private val cache = TrieMap[String, Searcher]()

  def searcher(spark: SparkSession, sfDir: String): Searcher =
    cache.getOrElseUpdate(
      sfDir, {
        val dir = Files.createTempDirectory("graft-docs-index").toString
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        IndexBuilder.build(
          spark, docs, IndexSchema.documents, dir, s"docs@$sfDir",
          IndexBuilder.BuildConf(numSegments = 4))
        new Searcher(new IndexReader(spark, dir), IndexSchema.documents)
      }
    )

  private val jsonCache = TrieMap[String, Searcher]()

  /** Index over documents + a synthesized `metadata` json column
    * `{"id": doc_id, "year": 2000 + doc_id % 25, "tag": source}` — the
    * dotted-path query substrate; oracles recompute from the raw columns.
    */
  def jsonSearcher(spark: SparkSession, sfDir: String): Searcher =
    jsonCache.getOrElseUpdate(
      sfDir, {
        val dir = Files.createTempDirectory("graft-docs-json-index").toString
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .withColumn("metadata", to_json(struct(
            col("doc_id").cast("long").as("id"),
            (lit(2000) + col("doc_id") % 25).cast("long").as("year"),
            col("source").as("tag"))))
        IndexBuilder.build(
          spark, docs, IndexSchema.documentsJson, dir, s"docs-json@$sfDir",
          IndexBuilder.BuildConf(numSegments = 4))
        new Searcher(new IndexReader(spark, dir), IndexSchema.documentsJson)
      }
    )

  /** Scored hits joined back to the original doc key: (doc_id, score rounded
    * to 4 decimals — the driver-compare contract shared with the oracle SQL).
    */
  def scored(s: Searcher, q: Query): DataFrame =
    s.reader.docs
      .select(col("segment_id"), col("doc_id"), col("key"))
      .join(s.search(q), Seq("segment_id", "doc_id"))
      .select(col("key").cast("long").as("doc_id"), round(col("score"), 4).as("score"))

  /** Const-score hit doc ids only. */
  def matchedIds(s: Searcher, q: Query): DataFrame =
    s.reader.docs
      .select(col("segment_id"), col("doc_id"), col("key"))
      .join(s.search(q), Seq("segment_id", "doc_id"))
      .select(col("key").cast("long").as("doc_id"))
}
