package graft.index

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.MessageTypeParser

/** Driver-side writer for the per-segment metrics lineage append.
  *
  * The metrics table gains `numSegments` rows per build — launching a Spark
  * job (parallelize → write) for that append costs a full job-scheduling
  * round-trip (~0.2 s), which is pure FIXED build tail: the same price at
  * every core count, so it taxes the N→4N scaling-efficiency evidence
  * directly. A plain parquet-mr writer appends the handful of rows in
  * single-digit milliseconds with no job at all.
  *
  * Layout matches Spark's own parquet writer conventions (all fields
  * optional, standard 3-level LIST, INT64 micros timestamp) so directories
  * mixing Spark-written and driver-written files read back uniformly.
  */
private[index] object TinyParquet {

  final case class MetricRow(
      buildId: String,
      segmentId: Int,
      numDocs: Long,
      numTerms: Long,
      postingBytes: Long,
      mergeDepth: Int,
      parentSegments: Seq[String],
      createdAtMillis: Long)

  private val schema = MessageTypeParser.parseMessageType(
    """message spark_schema {
      |  optional binary build_id (UTF8);
      |  optional int32 segment_id;
      |  optional int64 num_docs;
      |  optional int64 num_terms;
      |  optional int64 posting_bytes;
      |  optional int32 merge_depth;
      |  optional group parent_segments (LIST) {
      |    repeated group list {
      |      optional binary element (UTF8);
      |    }
      |  }
      |  optional int64 created_at (TIMESTAMP(MICROS,true));
      |}""".stripMargin)

  /** Append `rows` as one new parquet file under `dir` (created if absent). */
  def appendMetrics(conf: Configuration, dir: String, rows: Seq[MetricRow]): Unit = {
    val file = new Path(dir, s"part-${java.util.UUID.randomUUID()}.parquet")
    val writer = ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(file, conf))
      .withType(schema)
      .withConf(conf)
      .build()
    val factory = new SimpleGroupFactory(schema)
    try {
      rows.foreach { r =>
        val g = factory.newGroup()
        g.append("build_id", r.buildId)
        g.append("segment_id", r.segmentId)
        g.append("num_docs", r.numDocs)
        g.append("num_terms", r.numTerms)
        g.append("posting_bytes", r.postingBytes)
        g.append("merge_depth", r.mergeDepth)
        val lst = g.addGroup("parent_segments")
        r.parentSegments.foreach(p => lst.addGroup("list").append("element", p))
        g.append("created_at", r.createdAtMillis * 1000L)
        writer.write(g)
      }
    } finally writer.close()
  }
}
