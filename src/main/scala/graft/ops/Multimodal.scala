package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise in `mapPartitions` (the Scala
  * analog of a pandas-batch UDF: fixed batch shape, one library-context per
  * partition, vectorized inner loop).
  *
  * The actual codec calls are STUBBED behind [[MediaCodec]] (no image/audio
  * libraries ship in this container): the stub parses our deterministic fake
  * header so every pipeline stage — schema, batching, partitioning, feature
  * shape — is real and tested; swapping in a real decoder changes only the
  * `MediaCodec` implementation.
  */
object Multimodal {

  /** Typed metadata attached to every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType, false), // image | audio | video
    StructField("width", IntegerType, true),
    StructField("height", IntegerType, true),
    StructField("sample_rate", IntegerType, true),
    StructField("n_frames", IntegerType, true)
  ))

  /** STUB codec boundary. A real deployment implements decode/resize/etc.
    * with an actual media library; the deterministic fake operates on our
    * synthetic header format `GRFT<kind:1><w:4><h:4><payload…>`.
    */
  object MediaCodec {
    def encodeFake(kind: String, w: Int, h: Int, seed: Long): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(13 + 64)
      bb.put("GRFT".getBytes)
      bb.put(kind.head.toByte)
      bb.putInt(w)
      bb.putInt(h)
      var s = seed
      (0 until 64).foreach { _ =>
        s = s * 6364136223846793005L + 1442695040888963407L
        bb.put((s >>> 56).toByte)
      }
      bb.array()
    }

    /** "Decode": parse the fake header → (kind, w, h, pixel-ish bytes). */
    def decode(bytes: Array[Byte]): (String, Int, Int, Array[Byte]) = {
      require(bytes.length >= 13 && new String(bytes, 0, 4) == "GRFT", "bad media payload")
      val bb = java.nio.ByteBuffer.wrap(bytes)
      bb.position(4)
      val kind = bb.get().toChar match {
        case 'i' => "image"; case 'a' => "audio"; case _ => "video"
      }
      val w = bb.getInt
      val h = bb.getInt
      val rest = java.util.Arrays.copyOfRange(bytes, 13, bytes.length)
      (kind, w, h, rest)
    }

    /** "Feature extraction": a deterministic 8-dim vector from payload bytes
      * (stands in for an embedding model forward pass). Double accumulation
      * so the value is oracle-reproducible in SQL.
      */
    def features(payload: Array[Byte]): Array[Double] = {
      val out = new Array[Double](8)
      payload.zipWithIndex.foreach { case (b, i) => out(i % 8) += (b & 0xFF) / 255.0 }
      out.map(x => x / math.max(payload.length / 8, 1).toDouble)
    }
  }

  /** Attach a deterministic fake media payload + metadata to each row
    * (corpus synthesis for tests/benchmarks).
    */
  def withFakeMedia(df: DataFrame, idCol: String): DataFrame = {
    val enc = udf { (id: Long) =>
      val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      MediaCodec.encodeFake(kind, 32 + (id % 8).toInt * 16, 32 + (id % 5).toInt * 16, id)
    }
    val id = col(idCol).cast("long")
    val kind = when(id % 3 === 0, "image").when(id % 3 === 1, "audio").otherwise("video")
    val meta = struct(
      kind.as("kind"),
      (lit(32) + (id % 8) * 16).cast("int").as("width"),
      (lit(32) + (id % 5) * 16).cast("int").as("height"),
      when(kind === "audio", 16000).cast("int").as("sample_rate"),
      when(kind === "video", (lit(32) + id % 16).cast("int")).as("n_frames"))
    df.withColumn("media", enc(id)).withColumn("media_meta", meta)
  }

  /** Batched decode + feature extraction over partitions: processes rows in
    * fixed-size batches (the pandas-UDF batch shape), emitting
    * (id, kind, width, height, features[8]). At scale the input should be
    * `repartition`ed so one partition ≈ one accelerator-worker's batch
    * stream.
    */
  def extractFeatures(df: DataFrame, idCol: String, mediaCol: String, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("kind", StringType, false),
      StructField("width", IntegerType, false),
      StructField("height", IntegerType, false),
      StructField("features", ArrayType(DoubleType, false), false)
    ))
    val idIdx = 0
    val mediaIdx = 1
    val input = df.select(col(idCol).cast("long"), col(mediaCol))
    input.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // one "model context" per batch in a real pipeline
        batch.map { r =>
          val (kind, w, h, payload) = MediaCodec.decode(r.getAs[Array[Byte]](mediaIdx))
          Row(r.getLong(idIdx), kind, w, h, MediaCodec.features(payload).toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** "Resize"/re-sample plumbing: rewrites the header dims, passes payload
    * through the stub kernel. Demonstrates a binary→binary batch transform.
    */
  def resize(df: DataFrame, mediaCol: String, w: Int, h: Int): DataFrame = {
    val resizeUdf = udf { (bytes: Array[Byte]) =>
      val (kind, _, _, payload) = MediaCodec.decode(bytes)
      MediaCodec.encodeFake(kind, w, h, payload.foldLeft(0L)((a, b) => a * 31 + b))
    }
    df.withColumn(mediaCol, resizeUdf(col(mediaCol)))
  }
}
