package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.index.{IndexBuilder, IndexSchema, Maintenance}

/** Streaming ingestion (S3/W2 — the reference's Kafka consumer path,
  * `summa-server/src/components/consumers/kafka/consumer.rs:37-171`, where
  * offsets are committed only after the index commit:
  * `services/index.rs:471-491`).
  *
  * Spark mapping: Structured Streaming source → `foreachBatch` → one
  * [[Maintenance.addDocuments]] call per micro-batch (new segments + one
  * atomic snapshot). The streaming checkpoint replays an unacknowledged
  * batch after a crash (at-least-once), and key-based upsert conflict
  * resolution makes re-indexing idempotent — the same effective
  * exactly-once contract as the reference. The file source stands in for
  * Kafka (no Kafka connector ships in this sandbox); swapping
  * `readStream.format("kafka")` in changes nothing downstream.
  */
object StreamingIngest {

  def start(
      spark: SparkSession,
      sourceDir: String,
      sourceSchema: StructType,
      indexDir: String,
      schema: IndexSchema,
      checkpointDir: String,
      conf: IndexBuilder.BuildConf = IndexBuilder.BuildConf(numSegments = 1),
      strategy: Maintenance.ConflictStrategy = Maintenance.ConflictStrategy.Overwrite,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    spark.readStream
      .schema(sourceSchema)
      .parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          Maintenance.addDocuments(
            spark, indexDir, schema, batch, s"stream-batch-$batchId", strategy, conf)
          ()
        }
      }
      .start()
  }

  /** Event-time windowed counts with a watermark — the standard streaming
    * aggregation shape (not in the reference, which has no event-time
    * semantics; provided as the training-pipeline streaming collector).
    */
  def windowedEventCounts(
      events: DataFrame,
      tsCol: String,
      windowDuration: String,
      watermarkDelay: String,
      keyCol: Option[String] = None
  ): DataFrame = {
    val w = events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy((window(col(tsCol), windowDuration) +: keyCol.map(col).toSeq): _*)
      .agg(count(lit(1)).as("cnt"))
    w.select((Seq(col("window.start").as("window_start"),
      col("window.end").as("window_end")) ++ keyCol.map(col) :+ col("cnt")): _*)
  }
}
