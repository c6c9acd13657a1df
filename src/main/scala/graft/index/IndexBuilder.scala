package graft.index

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
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
  *  1. segment assignment: `segment_id = offset + pmod(xxhash64(key), n)` —
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
  *     the skew salt; pack groups are bounded by the block doc-range;
  *  5. outputs written sorted by `(field, term)` within each segment dir so
  *     Parquet row-group stats give FST-like term-range pruning for free;
  *  6. visibility via [[Snapshots]] (Iceberg-style atomic version commit);
  *     stats are per-segment so merges/deletes never rewrite global state.
  *
  * Layout under `indexDir/`:
  * {{{
  *   docs/segment_id=N/       one row per doc: key, stored fields, per-field len+norm
  *   postings/segment_id=N/   packed posting blocks, term-sorted
  *   termstats/segment_id=N/  (field, term, df, total_tf) per segment
  *   fieldstats/segment_id=N/ (field, n_docs, total_tokens) per segment
  *   deletes/segment_id=N/    tombstone doc_ids; merges drop whole partitions
  *   metrics/                 append-only lineage: one row per (build_id, segment_id)
  *   _snapshots/vNNNNNN.json  live-segment snapshot versions
  * }}}
  */
object IndexBuilder {

  final case class BuildConf(
      numSegments: Int = 8,
      blockBits: Int = 10,
      buildPartitions: Int = 0, // 0 = spark.sql.shuffle.partitions
      persist: StorageLevel = StorageLevel.MEMORY_AND_DISK
  )

  /** Per-segment doc/token totals observed during the docs write. */
  final case class SegStat(segmentId: Int, nDocs: Long, tokensByField: Map[String, Long])

  /** Per-term group inside one document field. */
  final case class TermGroup(term: String, tf: Int, positions: Array[Int])
  /** Analyzed field: token count, quantized fieldnorm id, term groups
    * (sorted by term).
    */
  final case class TokField(len: Int, norm: Int, terms: Array[TermGroup])

  /** Tokenize one field value into term groups (deterministic order). */
  def analyzeField(analyzerName: String, value: String): TokField = {
    if (value == null) return TokField(0, 0, Array.empty)
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
    TokField(toks.length, FieldNorm.encode(toks.length.toLong), groups)
  }

  /** Assign dense per-segment docIds = rank of `__key` within `segment_id`:
    * range-partition + in-partition sort, then a two-pass offset computation
    * (pass 1 counts rows per (partition, segment); pass 2 streams ids).
    * `df` is persisted as the single materialized intermediate of the build —
    * callers put tokenization *in* `df`'s projection so analysis runs exactly
    * once, during pass-1 materialization.
    */
  def assignDocIds(df: DataFrame, parts: Int, level: StorageLevel): (DataFrame, DataFrame, Long) = {
    val spark = df.sparkSession
    // the partition id is stamped as a column at materialization time — a
    // TaskContext-based id would be wrong when this plan is later embedded
    // under a union (task partition ids shift per branch)
    val sorted = df.withColumn("__pid", spark_partition_id()).persist(level)

    // pass 1: rows per (physical partition, segment) — small driver table
    val counts = sorted
      .groupBy("__pid", "segment_id")
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

    val pidIdx = sorted.schema.fieldIndex("__pid")
    val segIdx = sorted.schema.fieldIndex("segment_id")
    val outFields = sorted.schema.fields.filterNot(_.name == "__pid") :+
      StructField("doc_id", IntegerType, nullable = false)
    val enc = Encoders.row(StructType(outFields))
    val withIds = sorted.mapPartitions { rows =>
      val off = bc.value
      var curSeg = Int.MinValue
      var curPid = Int.MinValue
      var next = 0L
      rows.map { r =>
        val seg = r.getInt(segIdx)
        val pid = r.getInt(pidIdx)
        if (seg != curSeg || pid != curPid) { curSeg = seg; curPid = pid; next = off((pid, seg)) }
        val id = next
        next += 1
        val vals = r.toSeq.zipWithIndex.collect { case (v, i) if i != pidIdx => v }
        Row.fromSeq(vals :+ id.toInt)
      }
    }(enc)
    (withIds, sorted, counts.map(_._2).sum)
  }

  val packSchema: StructType = StructType(Seq(
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

  /** Pack token rows `(segment_id, doc_id, field, term, tf, norm_id,
    * positions)` into posting-block rows via ONE range shuffle keyed by
    * (segment, field, term, block): block keying spreads head terms across
    * ~(docs/blockSpan) keys (skew salt), range partitioning gives term-sorted
    * output files (Parquet stats pruning), and the streaming sort-merge pack
    * replaces an object hash aggregate (no per-group buffers, fully
    * spillable Tungsten sort). Shared by fresh builds and segment merges.
    */
  def packPostings(
      tokens: DataFrame,
      blockBits: Int,
      parts: Int,
      recordPositions: Map[String, Boolean]
  ): DataFrame = {
    val spark = tokens.sparkSession
    val bcRecPos = spark.sparkContext.broadcast(recordPositions)
    val parted = tokens
      .select(
        col("segment_id"), col("doc_id"), col("field"), col("term"),
        col("tf"), col("norm_id"), col("positions"))
      .withColumn("block_id", shiftright(col("doc_id"), blockBits).cast(IntegerType))
      .repartitionByRange(parts, col("segment_id"), col("field"), col("term"), col("block_id"))
      .sortWithinPartitions("segment_id", "field", "term", "block_id", "doc_id")

    parted.mapPartitions { rows =>
      val recPos = bcRecPos.value
      new Iterator[Row] {
        private val it = rows.buffered
        def hasNext: Boolean = it.hasNext
        def next(): Row = {
          val head = it.head
          val seg = head.getInt(0)
          val field = head.getString(2)
          val term = head.getString(3)
          val blockId = head.getInt(7)
          val docIds = new scala.collection.mutable.ArrayBuffer[Int](64)
          val tfs = new scala.collection.mutable.ArrayBuffer[Int](64)
          val norms = new scala.collection.mutable.ArrayBuffer[Int](64)
          val poss = new scala.collection.mutable.ArrayBuffer[Array[Int]](64)
          val withPos = recPos.getOrElse(field, false)
          var more = true
          while (more && it.hasNext) {
            val r = it.head
            if (r.getInt(0) == seg && r.getString(2) == field && r.getString(3) == term &&
                r.getInt(7) == blockId) {
              it.next()
              docIds += r.getInt(1)
              tfs += r.getInt(4)
              norms += r.getInt(5)
              if (withPos) poss += r.getSeq[Int](6).toArray
            } else more = false
          }
          val docIdsA = docIds.toArray
          val tfsA = tfs.toArray
          val docIdsB = PostingCodec.packDocIds(docIdsA)
          val tfsB = PostingCodec.packVarInts(tfsA)
          val normsB = norms.map(_.toByte).toArray
          val posB = if (withPos) PostingCodec.packPositions(poss.toArray) else null
          val bytes = docIdsB.length.toLong + tfsB.length + normsB.length +
            (if (posB == null) 0 else posB.length)
          Row(
            field, term, seg, blockId,
            docIdsA.length, docIdsA.head, docIdsA.last,
            tfsA.max, norms.min,
            tfsA.map(_.toLong).sum,
            docIdsB, tfsB, normsB, posB, bytes
          )
        }
      }
    }(Encoders.row(packSchema))
  }

  private val timing = sys.env.get("GRAFT_BUILD_TIMING").contains("1")
  private def timed[A](name: String)(f: => A): A =
    if (!timing) f
    else {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[build-timing] $name=${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

  /** Write per-segment artifacts (docs, postings, termstats, fieldstats,
    * metrics) for the built segments + metrics lineage. Does NOT publish a
    * snapshot — callers compose segment builds into atomic commits.
    * Segment dirs are replaced with dynamic partition overwrite, so existing
    * segments in the same index are untouched.
    *
    * @return the non-empty segment ids written
    */
  def buildSegments(
      spark: SparkSession,
      pages: DataFrame,
      schema: IndexSchema,
      indexDir: String,
      buildId: String,
      conf: BuildConf = BuildConf(),
      segOffset: Int = 0,
      mergeDepth: Int = 0,
      parentSegments: Seq[Int] = Nil
  ): Seq[Int] = {
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
      .select((schema.keyColumn.as("__key") +: needed.map(col)): _*)
      .withColumn(
        "segment_id",
        (lit(segOffset) + pmod(xxhash64(col("__key")), lit(conf.numSegments))).cast(IntegerType))

    // tokenize each indexed field exactly once, in the projection applied
    // after the segment/key sort — the persisted intermediate carries token
    // groups (and stored fields) but NOT the raw indexed text
    val tokUdfs = schema.fields.map { f =>
      val an = f.analyzer
      f.name -> (f.fieldType match {
        case "json"  => udf((s: String) => JsonField.analyzeJson(an, s))
        case "bytes" => udf((s: String) => TypedFields.singleTok(Option(s).flatMap(TypedFields.bytesTerm)))
        case "ip"    => udf((s: String) => TypedFields.singleTok(TypedFields.ipTerm(s)))
        case _       => udf((s: String) => analyzeField(an, s))
      })
    }.toMap
    val keepCols =
      Seq(col("segment_id"), col("__key")) ++
        schema.storedFields.map(col) ++
        schema.fields.map(f => tokUdfs(f.name)(col(f.name).cast(StringType)).as(s"__tok_${f.name}"))
    val sortedTok = keyed
      .repartitionByRange(parts, col("segment_id"), col("__key"))
      .sortWithinPartitions(col("segment_id"), col("__key"))
      .select(keepCols: _*)

    val (analyzed, sortedHandle, totalDocs) =
      timed("tokenize+sort+docids")(assignDocIds(sortedTok, parts, conf.persist))
    // output-file partitioning scales with data, not with task parallelism —
    // groupBy/pack stages stay `parts`-wide for CPU, but final writes coalesce
    // so small builds don't scatter thousands of tiny parquet files
    def outParts(rowsPerPart: Long): Int =
      math.max(1, math.min(parts.toLong, totalDocs / rowsPerPart + 1)).toInt

    // ---- docs table (doc store + fast fields + fieldnorms) ----
    val docsDf = analyzed.select(
      (Seq(col("segment_id"), col("doc_id"), col("__key").as("key")) ++
        schema.storedFields.map(col) ++
        schema.fields.flatMap(f =>
          Seq(
            col(s"__tok_${f.name}.len").as(s"len_${f.name}"),
            col(s"__tok_${f.name}.norm").as(s"norm_${f.name}")))): _*
    )
    // per-segment doc counts + token totals are OBSERVED during the write
    // job itself (CollectMetrics) — a separate aggregation job re-scanned
    // the cached tokens and added a serial job to the driver-coordinated
    // tail, the part that caps N→4N scaling
    val segIds = (segOffset until segOffset + conf.numSegments).toSeq
    val obsAggs: Seq[org.apache.spark.sql.Column] = segIds.flatMap { s =>
      count(when(col("segment_id") === s, 1)).as(s"n_$s") +:
        schema.fields.map(f =>
          sum(when(col("segment_id") === s, col(s"len_${f.name}"))).as(s"tt_${s}_${f.name}"))
    }
    val obs = org.apache.spark.sql.Observation()
    // 16k-row output chunks: file count still scales with DATA (not cores),
    // but the write stage keeps every core busy — 64k-row chunks gave a
    // 5-task write that idled 3 of 8 cores and cost ~0.2 scaling efficiency
    timed("docs-write")(docsDf
      .observe(obs, obsAggs.head, obsAggs.tail: _*)
      .repartitionByRange(outParts(16384), col("segment_id"), col("doc_id"))
      .sortWithinPartitions("segment_id", "doc_id")
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("segment_id")
      .parquet(s"$indexDir/docs"))
    val obsRow = obs.get
    val segStats: Seq[SegStat] = segIds.flatMap { s =>
      val n = obsRow(s"n_$s").asInstanceOf[Long]
      if (n == 0) None
      else Some(SegStat(s, n,
        schema.fields.map(f =>
          f.name -> Option(obsRow(s"tt_${s}_${f.name}")).fold(0L)(_.asInstanceOf[Long])).toMap))
    }

    // ---- posting blocks ----
    val tokensPerField = schema.fields.map { f =>
      analyzed
        .select(
          col("segment_id"),
          col("doc_id"),
          lit(f.name).as("field"),
          col(s"__tok_${f.name}.norm").as("norm_id"),
          explode(col(s"__tok_${f.name}.terms")).as("tok")
        )
        .select(
          col("segment_id"),
          col("doc_id"),
          col("field"),
          col("tok.term").as("term"),
          col("tok.tf").as("tf"),
          col("norm_id"),
          col("tok.positions").as("positions")
        )
    }
    val tokens = tokensPerField.reduce(_ unionByName _)
    val recordPositions = schema.fields.map(f => f.name -> (f.record == "position")).toMap

    timed("postings-pack-write")(
      packPostings(tokens, conf.blockBits, parts, recordPositions).write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("segment_id")
        .parquet(s"$indexDir/postings"))

    // stats re-read ONLY the narrow stat columns of the written blocks —
    // column pruning makes this far cheaper than caching the full blocks
    // (persisting them serialized every posting binary through the columnar
    // cache, a memory-bandwidth tax the pack stage paid at every core count)
    val statCols = spark.read.parquet(s"$indexDir/postings")
      .filter(col("segment_id").isin(segIds.map(Integer.valueOf): _*))
      .select("segment_id", "field", "term", "doc_count", "sum_tf", "posting_bytes")
    val segs = timed("stats+metrics")(writeStats(spark, schema, indexDir, buildId, statCols,
      segStats, outParts(4096), mergeDepth, parentSegments))

    sortedHandle.unpersist()
    segs
  }

  /** Per-segment termstats/fieldstats from the just-built (still cached)
    * postings/docs DataFrames, plus an append-only metrics lineage row per
    * segment.
    *
    * @return the non-empty segment ids written (from the doc-count agg — no
    *         extra read of the docs table)
    */
  private def writeStats(
      spark: SparkSession,
      schema: IndexSchema,
      indexDir: String,
      buildId: String,
      postingsRead: DataFrame,
      segStats: Seq[SegStat],
      statParts: Int,
      mergeDepth: Int,
      parentSegments: Seq[Int]
  ): Seq[Int] = {
    // ONE pass over the packed blocks feeds both the termstats table and the
    // per-segment metrics aggregates (the term-level result is orders of
    // magnitude smaller than the blocks, so the second-level agg is ~free)
    val termLevel = postingsRead
      .groupBy("segment_id", "field", "term")
      .agg(
        sum("doc_count").cast(LongType).as("df"),
        sum("sum_tf").as("total_tf"),
        sum("posting_bytes").as("pb"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // the termstats write and the docs aggregation are independent — run
    // them as CONCURRENT Spark jobs so this driver-coordinated tail doesn't
    // serialize (it was the worst-scaling phase: 0.44 efficiency 2c→8c)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val termstatsJob = Future {
      termLevel
        .select("segment_id", "field", "term", "df", "total_tf")
        .repartitionByRange(statParts, col("segment_id"), col("field"), col("term"))
        .sortWithinPartitions("segment_id", "field", "term")
        .write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("segment_id")
        .parquet(s"$indexDir/termstats")
    }

    // fieldstats + metrics rows assemble driver-side from the stats observed
    // during the docs write — no extra aggregation job
    val fsRows = segStats.flatMap { st =>
      schema.fields.map(f =>
        Row(f.name, st.nDocs, st.tokensByField(f.name), st.segmentId))
    }
    val fsSchema = StructType(Seq(
      StructField("field", StringType, false),
      StructField("n_docs", LongType, false),
      StructField("total_tokens", LongType, true),
      StructField("segment_id", IntegerType, false)))
    val fieldstatsJob = Future {
      spark
        .createDataFrame(spark.sparkContext.parallelize(fsRows.toSeq, 1), fsSchema)
        .write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("segment_id")
        .parquet(s"$indexDir/fieldstats")
    }

    // ---- per-segment metrics (north-rule lineage table) ----
    // the tiny per-segment agg over the cached term-level stats runs
    // concurrently with the termstats/fieldstats write jobs
    val segPostingsJob = Future {
      termLevel
        .groupBy("segment_id")
        .agg(sum("pb").as("posting_bytes"), count(lit(1)).as("num_terms"))
        .collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    }
    val segPostings = Await.result(segPostingsJob, Duration.Inf)
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val parents = parentSegments.map(_.toString).toArray
    val metricRows = segStats.map { st =>
      val (bytes, terms) = segPostings.getOrElse(st.segmentId, (0L, 0L))
      Row(buildId, st.segmentId, st.nDocs, terms, bytes, mergeDepth, parents, now)
    }
    val mSchema = StructType(Seq(
      StructField("build_id", StringType, false),
      StructField("segment_id", IntegerType, false),
      StructField("num_docs", LongType, false),
      StructField("num_terms", LongType, false),
      StructField("posting_bytes", LongType, false),
      StructField("merge_depth", IntegerType, false),
      StructField("parent_segments", ArrayType(StringType, false), false),
      StructField("created_at", TimestampType, false)))
    spark
      .createDataFrame(spark.sparkContext.parallelize(metricRows.toSeq, 1), mSchema)
      .write
      .mode("append")
      .parquet(s"$indexDir/metrics")
    Await.result(termstatsJob, Duration.Inf)
    Await.result(fieldstatsJob, Duration.Inf)
    termLevel.unpersist()
    segStats.map(_.segmentId).sorted
  }

  /** Fresh full build: build all segments from `pages` and publish snapshot
    * v1 (or the next version if the index already exists).
    */
  def build(
      spark: SparkSession,
      pages: DataFrame,
      schema: IndexSchema,
      indexDir: String,
      buildId: String,
      conf: BuildConf = BuildConf()
  ): Unit = {
    val segs = buildSegments(spark, pages, schema, indexDir, buildId, conf)
    Snapshots.commit(spark, indexDir, segs, buildId)
  }
}
