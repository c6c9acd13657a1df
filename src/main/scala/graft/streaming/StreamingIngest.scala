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
  * exactly-once contract as the reference. The default file source stands in
  * for Kafka (no Kafka connector jar ships in this sandbox); [[Source.Kafka]]
  * wires the real `readStream.format("kafka")` options
  * (`consumer.rs:37-58` analog: bootstrap servers + topics + group id via
  * checkpoint) and changes nothing downstream.
  */
object StreamingIngest {

  /** Streaming source selector. */
  sealed trait Source
  object Source {
    /** Parquet-file drop-dir (the sandbox stand-in). */
    final case class Files(dir: String, schema: StructType) extends Source
    /** Real Kafka consumer (requires the spark-sql-kafka connector jar on the
      * cluster; reference `consumers/kafka/consumer.rs:37-58`). `parse` maps
      * the raw Kafka (key, value, …) frame to document rows — the analog of
      * the reference's proto-deserialization step (`consumer.rs:107-133`).
      */
    final case class Kafka(
        bootstrapServers: String,
        topics: Seq[String],
        parse: DataFrame => DataFrame,
        startingOffsets: String = "earliest",
        maxOffsetsPerTrigger: Option[Long] = None
    ) extends Source
  }

  private def readSource(spark: SparkSession, source: Source): DataFrame = source match {
    case Source.Files(dir, sch) =>
      spark.readStream.schema(sch).parquet(dir)
    case k: Source.Kafka =>
      val r = spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", k.bootstrapServers)
        .option("subscribe", k.topics.mkString(","))
        .option("startingOffsets", k.startingOffsets)
      // offsets live in the Spark checkpoint, committed only after the
      // snapshot commit (the reference's commit-then-ack ordering,
      // `services/index.rs:471-491`)
      k.parse(k.maxOffsetsPerTrigger.fold(r)(m =>
        r.option("maxOffsetsPerTrigger", m.toString)).load())
  }

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
  ): StreamingQuery =
    startFrom(spark, Source.Files(sourceDir, sourceSchema), indexDir, schema,
      checkpointDir, conf, strategy, trigger)

  def startFrom(
      spark: SparkSession,
      source: Source,
      indexDir: String,
      schema: IndexSchema,
      checkpointDir: String,
      conf: IndexBuilder.BuildConf = IndexBuilder.BuildConf(numSegments = 1),
      strategy: Maintenance.ConflictStrategy = Maintenance.ConflictStrategy.Overwrite,
      trigger: Trigger = Trigger.AvailableNow(),
      /** compaction scheduling (reference: merge threads run alongside the
        * consumer and the policy is evaluated at every commit,
        * `index_writer_holder.rs:391-423`): every `compactEvery` ingested
        * batches, apply the log-merge policy to a fixpoint via
        * [[Maintenance.autoCompact]]. 0 disables. Runs inside `foreachBatch`,
        * so the stream's at-least-once checkpoint ordering is preserved —
        * a compaction is just another atomic snapshot commit, and readers on
        * older snapshots are unaffected.
        */
      compactEvery: Int = 0,
      compactMinSegments: Int = 8
  ): StreamingQuery = {
    readSource(spark, source)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          Maintenance.addDocuments(
            spark, indexDir, schema, batch, s"stream-batch-$batchId", strategy, conf)
          // batchId is checkpoint-persistent, so "every Nth micro-batch"
          // holds across stream restarts (a per-query counter would reset)
          if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
            Maintenance.autoCompact(spark, indexDir, schema,
              s"stream-compact-$batchId", minNumSegments = compactMinSegments, conf = conf)
            ()
          }
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
