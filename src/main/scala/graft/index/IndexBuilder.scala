package graft.index

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.analysis.Analyzers

/** Distributed inverted-index builder.
  *
  * Reference lifecycle analog: ingest → segment build → commit
  * (`/root/reference/summa-core/src/components/index_writer_holder.rs:391-423`),
  * re-expressed as a Spark pipeline:
  *
  *  1. segment assignment: `segment_id = pmod(xxhash64(key), numSegments)` —
  *     content-addressed, independent of parallelism;
  *  2. docId assignment: rank of key within segment via range-partition +
  *     in-partition sort + two-pass offset computation (no single-task sort,
  *     no Window over a whole segment — scales to arbitrarily large
  *     segments). DocIds are a pure function of the data, so N-core and
  *     4N-core builds produce identical ids (BASELINE scaling criterion);
  *  3. tokenize once per document (analyzer per field), carrying per-doc
  *     term groups as array columns;
  *  4. posting blocks: `block_id = doc_id >>> blockBits`, so block assignment
  *     needs no global rank and a head term (stop-word-scale df) shards
  *     across thousands of `(term, block_id)` shuffle keys — block keying IS
  *     the skew salt; `groupBy(field, term, segment_id, block_id)` groups are
  *     bounded by the block doc-range (default 1024);
  *  5. outputs written sorted by `(field, term)` within each segment dir so
  *     Parquet row-group stats give FST-like term-range pruning for free.
  *
  * Layout under `indexDir/`:
  * {{{
  *   docs/segment_id=N/      one row per doc: key, stored fields, per-field len+norm
  *   postings/segment_id=N/  packed posting blocks
  *   termstats/              (field, term, df, total_tf) — global, term-sorted
  *   fieldstats/             (field, n_docs, total_tokens) — avgdl source
  *   metrics/                one row per (build_id, segment_id): lineage + sizes
  *   _COMMIT                 atomic visibility marker (content = build_id)
  * }}}
  */
object IndexBuilder {

  final case class BuildConf(
      numSegments: Int = 8,
      blockBits: Int = 10,
      buildPartitions: Int = 0, // 0 = spark.sql.shuffle.partitions
      persist: StorageLevel = StorageLevel.MEMORY_AND_DISK
  )

  /** Per-term group inside one document field. */
  final case class TermGroup(term: String, tf: Int, positions: Array[Int])
  /** Analyzed field: token count + term groups (sorted by term). */
  final case class TokField(len: Int, terms: Array[TermGroup])

  /** Tokenize one field value into term groups (deterministic order). */
  def analyzeField(analyzerName: String, value: String): TokField = {
    if (value == null) return TokField(0, Array.empty)
    val toks = Analyzers(analyzerName).tokenize(value)
    val m = new java.util.TreeMap[String, scala.collection.mutable.ArrayBuffer[Int]]()
    toks.foreach { t =>
      m.computeIfAbsent(t.text, _ => new scala.collection.mutable.ArrayBuffer[Int]) += t.position
    }
    val groups = new Array[TermGroup](m.size)
    var i = 0
    m.forEach { (term, ps) =>
      groups(i) = TermGroup(term, ps.length, ps.toArray)
      i += 1
    }
    TokField(toks.length, groups)
  }

  /** Assign dense per-segment docIds = rank of `keyCol` within `segCol`.
    * Returns the input rows plus an int `doc_id` column. Deterministic
    * regardless of partition count. Caller must eventually unpersist via the
    * returned handle.
    */
  def assignDocIds(df: DataFrame, parts: Int): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(parts, col("segment_id"), col("__key"))
      .sortWithinPartitions(col("segment_id"), col("__key"))
      .persist(StorageLevel.DISK_ONLY)

    // pass 1: rows per (physical partition, segment) — small driver table
    val counts = sorted
      .select(spark_partition_id().as("pid"), col("segment_id"))
      .groupBy("pid", "segment_id")
      .count()
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))

    // start offset of each (pid, segment): sum of counts in earlier pids
    val bySeg = counts.groupBy(_._1._2)
    val offsets: Map[(Int, Int), Long] = bySeg.flatMap { case (seg, cs) =>
      var acc = 0L
      cs.sortBy(_._1._1).map { case ((pid, _), n) =>
        val r = ((pid, seg), acc)
        acc += n
        r
      }
    }
    val bc = spark.sparkContext.broadcast(offsets)

    val outSchema = sorted.schema.add(StructField("doc_id", IntegerType, nullable = false))
    val enc = Encoders.row(outSchema)
    val segIdx = sorted.schema.fieldIndex("segment_id")
    val withIds = sorted.mapPartitions { rows =>
      val pid = TaskContext.getPartitionId()
      val off = bc.value
      var curSeg = Int.MinValue
      var next = 0L
      rows.map { r =>
        val seg = r.getInt(segIdx)
        if (seg != curSeg) { curSeg = seg; next = off((pid, seg)) }
        val id = next
        next += 1
        Row.fromSeq(r.toSeq :+ id.toInt)
      }
    }(enc)
    (withIds, sorted)
  }

  def build(
      spark: SparkSession,
      pages: DataFrame,
      schema: IndexSchema,
      indexDir: String,
      buildId: String,
      conf: BuildConf = BuildConf()
  ): Unit = {
    import spark.implicits._
    val parts =
      if (conf.buildPartitions > 0) conf.buildPartitions
      else spark.sessionState.conf.numShufflePartitions

    // project early: key + indexed + stored columns only (column pruning
    // reaches the source scan); the original key column is dropped so the
    // generated doc_id/segment_id/key names can't collide
    val needed = (schema.fields.map(_.name) ++ schema.storedFields).distinct
      .filterNot(_ == schema.keyField)
    require(
      !needed.exists(Set("doc_id", "segment_id", "key", "__key").contains),
      "reserved column name in schema fields: doc_id/segment_id/key")
    val keyed = pages
      .select((col(schema.keyField).cast(StringType).as("__key") +: needed.map(col)): _*)
      .withColumn("segment_id", pmod(xxhash64(col("__key")), lit(conf.numSegments)).cast(IntegerType))

    val (withIds, sortedHandle) = assignDocIds(keyed, parts)

    // tokenize each indexed field exactly once; token groups ride as columns
    val tokUdfs = schema.fields.map { f =>
      val an = f.analyzer
      f.name -> udf((s: String) => analyzeField(an, s))
    }.toMap
    var analyzed = withIds
    schema.fields.foreach { f =>
      analyzed = analyzed.withColumn(s"__tok_${f.name}", tokUdfs(f.name)(col(f.name).cast(StringType)))
    }
    analyzed = analyzed.persist(conf.persist)

    // ---- docs table (doc store + fast fields + fieldnorms) ----
    val normUdf = udf((len: Int) => FieldNorm.encode(len.toLong))
    var docsDf = analyzed.select(
      (Seq(col("segment_id"), col("doc_id"), col("__key").as("key")) ++
        schema.storedFields.map(col) ++
        schema.fields.flatMap(f =>
          Seq(col(s"__tok_${f.name}.len").as(s"len_${f.name}")))): _*
    )
    schema.fields.foreach { f =>
      docsDf = docsDf.withColumn(s"norm_${f.name}", normUdf(col(s"len_${f.name}")))
    }
    docsDf
      .repartitionByRange(parts, col("segment_id"), col("doc_id"))
      .sortWithinPartitions("segment_id", "doc_id")
      .write
      .mode("overwrite")
      .partitionBy("segment_id")
      .parquet(s"$indexDir/docs")

    // ---- posting blocks ----
    val tokensPerField = schema.fields.map { f =>
      analyzed
        .select(
          col("segment_id"),
          col("doc_id"),
          lit(f.name).as("field"),
          explode(col(s"__tok_${f.name}.terms")).as("tok"),
          col(s"__tok_${f.name}.len").as("len")
        )
        .select(
          col("segment_id"),
          col("doc_id"),
          col("field"),
          col("tok.term").as("term"),
          col("tok.tf").as("tf"),
          normUdf(col("len")).as("norm_id"),
          col("tok.positions").as("positions")
        )
    }
    val tokens = tokensPerField.reduce(_ unionByName _)

    val packSchema = StructType(Seq(
      StructField("field", StringType, false),
      StructField("term", StringType, false),
      StructField("segment_id", IntegerType, false),
      StructField("block_id", IntegerType, false),
      StructField("doc_count", IntegerType, false),
      StructField("first_doc", IntegerType, false),
      StructField("last_doc", IntegerType, false),
      StructField("block_max_tf", IntegerType, false),
      StructField("block_min_norm", IntegerType, false),
      StructField("sum_tf", LongType, false),
      StructField("doc_ids", BinaryType, false),
      StructField("tfs", BinaryType, false),
      StructField("norms", BinaryType, false),
      StructField("positions", BinaryType, true),
      StructField("posting_bytes", LongType, false)
    ))
    val recordPositions = schema.fields.map(f => f.name -> (f.record == "position")).toMap
    val bcRecPos = spark.sparkContext.broadcast(recordPositions)

    val grouped = tokens
      .withColumn("block_id", shiftright(col("doc_id"), conf.blockBits).cast(IntegerType))
      .groupBy("field", "term", "segment_id", "block_id")
      .agg(collect_list(struct(col("doc_id"), col("tf"), col("norm_id"), col("positions"))).as("entries"))

    val packed = grouped.mapPartitions { rows =>
      val recPos = bcRecPos.value
      rows.map { r =>
        val field = r.getString(0)
        val term = r.getString(1)
        val seg = r.getInt(2)
        val blockId = r.getInt(3)
        val entries = r
          .getSeq[Row](4)
          .map(e => (e.getInt(0), e.getInt(1), e.getInt(2), e.getSeq[Int](3).toArray))
          .sortBy(_._1)
          .toArray
        val docIds = entries.map(_._1)
        val tfs = entries.map(_._2)
        val norms = entries.map(_._3)
        val docIdsB = PostingCodec.packDocIds(docIds)
        val tfsB = PostingCodec.packVarInts(tfs)
        val normsB = norms.map(_.toByte)
        val posB =
          if (recPos(field)) PostingCodec.packPositions(entries.map(_._4)) else null
        val bytes = docIdsB.length.toLong + tfsB.length + normsB.length +
          (if (posB == null) 0 else posB.length)
        Row(
          field, term, seg, blockId,
          docIds.length, docIds.head, docIds.last,
          tfs.max, norms.min,
          tfs.map(_.toLong).sum,
          docIdsB, tfsB, normsB, posB, bytes
        )
      }
    }(Encoders.row(packSchema))

    val postingsOut = packed
      .repartitionByRange(parts, col("segment_id"), col("field"), col("term"), col("block_id"))
      .sortWithinPartitions("segment_id", "field", "term", "block_id")
      .persist(StorageLevel.DISK_ONLY)

    postingsOut.write
      .mode("overwrite")
      .partitionBy("segment_id")
      .parquet(s"$indexDir/postings")

    // ---- global term stats (df, total_tf) ----
    postingsOut
      .groupBy("field", "term")
      .agg(sum("doc_count").cast(LongType).as("df"), sum("sum_tf").as("total_tf"))
      .repartitionByRange(math.max(parts / 4, 1), col("field"), col("term"))
      .sortWithinPartitions("field", "term")
      .write
      .mode("overwrite")
      .parquet(s"$indexDir/termstats")

    // ---- field stats (N, total tokens → avgdl) ----
    val fieldStats = schema.fields.map { f =>
      analyzed
        .agg(count(lit(1)).as("n_docs"), sum(col(s"__tok_${f.name}.len")).as("total_tokens"))
        .select(lit(f.name).as("field"), col("n_docs"), col("total_tokens"))
    }.reduce(_ unionByName _)
    fieldStats.coalesce(1).write.mode("overwrite").parquet(s"$indexDir/fieldstats")

    // ---- per-segment metrics (north-rule lineage table) ----
    val segPostings = postingsOut
      .groupBy("segment_id")
      .agg(
        sum("posting_bytes").as("posting_bytes"),
        countDistinct("field", "term").as("num_terms")
      )
    val segDocs = analyzed.groupBy("segment_id").agg(count(lit(1)).as("num_docs"))
    segDocs
      .join(segPostings, Seq("segment_id"), "left")
      .select(
        lit(buildId).as("build_id"),
        col("segment_id"),
        col("num_docs"),
        coalesce(col("num_terms"), lit(0L)).as("num_terms"),
        coalesce(col("posting_bytes"), lit(0L)).as("posting_bytes"),
        lit(0).as("merge_depth"),
        lit(Array.empty[String]).as("parent_segments"),
        current_timestamp().as("created_at")
      )
      .coalesce(1)
      .write
      .mode("append")
      .parquet(s"$indexDir/metrics")

    postingsOut.unpersist()
    analyzed.unpersist()
    sortedHandle.unpersist()

    // atomic visibility marker
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(indexDir),
      spark.sparkContext.hadoopConfiguration
    )
    val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/_COMMIT.tmp")
    val dst = new org.apache.hadoop.fs.Path(s"$indexDir/_COMMIT")
    val out = fs.create(tmp, true)
    out.write(buildId.getBytes("UTF-8"))
    out.close()
    fs.delete(dst, false)
    fs.rename(tmp, dst)
  }
}
