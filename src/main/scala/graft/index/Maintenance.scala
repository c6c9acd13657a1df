package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import graft.search.IndexReader

/** Decoded posting entry with optional positions (top-level: Janino codegen
  * cannot construct deeply nested case classes — a `Maintenance$FullEntry`
  * fell back to interpreted projections on every merge). Positions stay in
  * their per-doc packed byte form ([[PostingCodec.slicePositions]]): docId
  * rebasing never touches doc-internal positions, so the merge moves them
  * as opaque bytes.
  */
final case class FullEntry(doc_id: Int, tf: Int, norm_id: Int, positions: Array[Byte])

/** Index maintenance: segment merges, merge policies, vacuum, delete-by-set,
  * incremental upsert ingestion — the write-path operators W1–W9 of
  * SURVEY.md §2.7 (reference:
  * `/root/reference/summa-core/src/components/index_writer_holder.rs:289-473`
  * and the merge_policies module).
  */
object Maintenance {

  private val unpackFull: UserDefinedFunction =
    udf((docIds: Array[Byte], tfs: Array[Byte], norms: Array[Byte], pos: Array[Byte], n: Int) => {
      val ids = PostingCodec.unpackDocIds(docIds, n)
      val tf = PostingCodec.unpackVarInts(tfs, n)
      val ps =
        if (pos == null) null
        else PostingCodec.slicePositions(pos, tf)
      Array.tabulate(n)(i =>
        FullEntry(ids(i), tf(i), norms(i) & 0xFF, if (ps == null) null else ps(i)))
    })

  /** Merge the given segments into one new segment (W3: `merge_segments`,
    * `index_writer_holder.rs:403-414`): docIds are rebased to the rank of
    * the doc key within the merged set, tombstoned docs are dropped, and
    * postings are re-blocked with the same single-shuffle streaming pack as
    * fresh builds. Publishes a new snapshot (live − merged + new).
    *
    * @return the new segment id
    */
  def mergeSegments(
      spark: SparkSession,
      indexDir: String,
      schema: IndexSchema,
      segIds: Seq[Int],
      buildId: String,
      conf: IndexBuilder.BuildConf = IndexBuilder.BuildConf()
  ): Int = {
    require(segIds.nonEmpty, "no segments to merge")
    val reader = new IndexReader(spark, indexDir)
    val live = reader.snapshot.map(_.segments).getOrElse(
      sys.error("mergeSegments requires a snapshot-committed index"))
    require(segIds.forall(live.contains), s"segments not live: ${segIds.filterNot(live.contains)}")
    val newSeg = live.max + 1
    val parts =
      if (conf.buildPartitions > 0) conf.buildPartitions
      else spark.sessionState.conf.numShufflePartitions
    val segCond = col("segment_id").isin(segIds.map(Integer.valueOf): _*)

    // 1. merged docs: drop tombstones, re-rank keys into the new segment
    val oldDocs = reader.applyDeletes(reader.docs.filter(segCond))
      .withColumnRenamed("segment_id", "old_seg")
      .withColumnRenamed("doc_id", "old_doc")
      .withColumnRenamed("key", "__key")
      .withColumn("segment_id", lit(newSeg))
    val sorted = IndexBuilder.shardAndSort(oldDocs, parts, oldDocs.columns.toSeq.map(col))
    val (withIds0, handle, _, _) = IndexBuilder.assignDocIds(sorted, parts, conf.persist)
    // The docs write below OVERWRITES $indexDir/docs — the very path the
    // cached assignment plan reads from. That insert triggers Spark's
    // path-based recache, so a second consumption of the assignment (the
    // posting-rebase mapping) would silently RECOMPUTE it from the rewritten
    // table with fresh range-partition sampling — a different key→doc_id
    // permutation than the one just written. (Latent since the merge was
    // written; caught by CompactionSpec's 64-segment two-wave stress test:
    // 821/1163 postings landed on wrong doc ids.) An EAGER localCheckpoint
    // pins the assignment as materialized blocks detached from the input
    // path, so both consumers read the same permutation; the build cache
    // underneath is then released.
    val withIds = withIds0.localCheckpoint()
    handle.unpersist()

    withIds
      .drop("old_seg", "old_doc")
      .withColumnRenamed("__key", "key")
      .repartitionByRange(math.max(parts / 4, 1), col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("segment_id")
      .parquet(s"$indexDir/docs")

    // 2. postings: unpack → remap docIds (inner join drops tombstoned docs)
    //    → re-block → streaming pack
    val mapping = withIds.select(
      col("old_seg"), col("old_doc"), col("doc_id").as("new_doc"))
    val exploded = reader.postings
      .filter(segCond)
      .select(
        col("field"), col("term"), col("segment_id").as("old_seg"),
        explode(unpackFull(col("doc_ids"), col("tfs"), col("norms"), col("positions"),
          col("doc_count"))).as("p"))
      .select(
        col("field"), col("term"), col("old_seg"),
        col("p.doc_id").as("old_doc"), col("p.tf").as("tf"),
        col("p.norm_id").as("norm_id"), col("p.positions").as("positions"))
    val remapped = exploded
      .join(mapping, Seq("old_seg", "old_doc"))
      .select(
        lit(newSeg).as("segment_id"), col("new_doc").as("doc_id"),
        col("field"), col("term"), col("tf"), col("norm_id"), col("positions"))

    val recordPositions = schema.fields.map(f => f.name -> (f.record == "position")).toMap
    IndexBuilder.packPostings(remapped, conf.blockBits, parts, recordPositions).write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("segment_id")
      .parquet(s"$indexDir/postings")

    // 3. per-segment stats + lineage for the new segment
    val parentDepth = reader.metrics
      .filter(segCond)
      .agg(max("merge_depth"))
      .collect()(0).getInt(0)
    writeSegmentStats(spark, indexDir, schema, newSeg, buildId, parentDepth + 1,
      segIds, parts)

    // 4. atomic publish FIRST: the new snapshot retires the merged segments.
    //    Only then drop their tombstones — if the clear fails or a reader
    //    races between the steps, stale tombstones on retired segments are
    //    harmless (old-snapshot readers still see them; new-snapshot readers
    //    never touch the retired segments), whereas clearing before the
    //    publish would let a crash resurrect deleted docs.
    //    Frozen attribute of the merged segment = AND of its parents'
    //    (reference `segment_attributes.rs:62-68`); other segments' frozen
    //    flags carry forward inside commit.
    val prevFrozen = reader.snapshot.map(_.frozen).getOrElse(Set.empty[Int])
    val newFrozen: Set[Int] =
      if (segIds.forall(prevFrozen.contains)) Set(newSeg) else Set.empty
    Snapshots.commit(spark, indexDir, live.filterNot(segIds.contains) :+ newSeg, buildId,
      freeze = newFrozen)

    // 5. tombstones of merged segments are baked into the new segment — drop
    clearDeletes(spark, indexDir, segIds)
    newSeg
  }

  private def writeSegmentStats(
      spark: SparkSession,
      indexDir: String,
      schema: IndexSchema,
      segId: Int,
      buildId: String,
      mergeDepth: Int,
      parents: Seq[Int],
      parts: Int
  ): Unit = {
    import org.apache.spark.sql.types._
    // one narrow column-pruned scan of the merged segment's blocks drives
    // termstats AND the per-segment metrics aggregates (same single-pass
    // shape as the fresh-build stats path)
    val termLevel = spark.read.parquet(s"$indexDir/postings")
      .filter(col("segment_id") === segId)
      .select("segment_id", "field", "term", "doc_count", "sum_tf", "posting_bytes")
      .groupBy("segment_id", "field", "term")
      .agg(
        sum("doc_count").cast(LongType).as("df"),
        sum("sum_tf").as("total_tf"),
        sum("posting_bytes").as("pb"))
      .persist()
    termLevel
      .select("segment_id", "field", "term", "df", "total_tf")
      .repartition(math.max(parts / 4, 1), col("field"), col("term"))
      .sortWithinPartitions("field", "term")
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("segment_id")
      .parquet(s"$indexDir/termstats")

    val docsRead = spark.read.parquet(s"$indexDir/docs").filter(col("segment_id") === segId)
    val statAggs = schema.fields.map(f => sum(col(s"len_${f.name}")).as(s"tt_${f.name}"))
    val statRow = docsRead.agg(count(lit(1)).as("n_docs"), statAggs: _*).collect()(0)
    val fsRows = schema.fields.map(f =>
      org.apache.spark.sql.Row(
        f.name, statRow.getAs[Long]("n_docs"), statRow.getAs[Long](s"tt_${f.name}"), segId))
    val fsSchema = StructType(Seq(
      StructField("field", StringType, false),
      StructField("n_docs", LongType, false),
      StructField("total_tokens", LongType, true),
      StructField("segment_id", IntegerType, false)))
    spark.createDataFrame(spark.sparkContext.parallelize(fsRows, 1), fsSchema)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("segment_id")
      .parquet(s"$indexDir/fieldstats")

    val segAgg = termLevel
      .groupBy("segment_id")
      .agg(sum("pb").as("posting_bytes"), count(lit(1)).as("num_terms"))
      .collect().headOption
    termLevel.unpersist()
    val (pBytes, nTerms) = segAgg.map(r => (r.getLong(1), r.getLong(2))).getOrElse((0L, 0L))
    val mRow = org.apache.spark.sql.Row(
      buildId, segId, statRow.getAs[Long]("n_docs"), nTerms, pBytes, mergeDepth,
      parents.map(_.toString).toArray, new java.sql.Timestamp(System.currentTimeMillis()))
    val mSchema = StructType(Seq(
      StructField("build_id", StringType, false),
      StructField("segment_id", IntegerType, false),
      StructField("num_docs", LongType, false),
      StructField("num_terms", LongType, false),
      StructField("posting_bytes", LongType, false),
      StructField("merge_depth", IntegerType, false),
      StructField("parent_segments", ArrayType(StringType, false), false),
      StructField("created_at", TimestampType, false)))
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(mRow), 1), mSchema)
      .write.mode("append").parquet(s"$indexDir/metrics")
  }

  /** Append tombstones for a doc-set (W/S8: delete by query — callers pass
    * `searcher.search(query)` output).
    */
  def deleteDocs(spark: SparkSession, indexDir: String, hits: DataFrame): Long = {
    val rows = hits.select("segment_id", "doc_id").distinct().persist()
    val n = rows.count()
    // tombstones are hive-partitioned by segment_id so that retiring a
    // merged segment's deletes is a metadata-only partition drop — no
    // driver-side collect, scales to arbitrary delete volumes
    if (n > 0) rows.write.mode("append").partitionBy("segment_id").parquet(s"$indexDir/deletes")
    rows.unpersist()
    n
  }

  /** Drop the given segments' tombstone partitions (pure FS metadata ops;
    * tombstones of other segments are untouched — no table rewrite).
    */
  private def clearDeletes(spark: SparkSession, indexDir: String, segIds: Seq[Int]): Unit = {
    val root = new org.apache.hadoop.fs.Path(s"$indexDir/deletes")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    segIds.foreach { s =>
      val p = new org.apache.hadoop.fs.Path(root, s"segment_id=$s")
      if (fs.exists(p)) fs.delete(p, true)
    }
  }

  // -------------------------------------------------------- merge policies

  /** Mark segments frozen / unfrozen (reference `segment_attributes.rs:10-14`
    * + `FrozenLogMergePolicy`): frozen segments are excluded from merge
    * policies and vacuum. The attribute lives in the snapshot, so it
    * survives restarts and is AND-merged by [[mergeSegments]].
    */
  def freezeSegments(
      spark: SparkSession,
      indexDir: String,
      segIds: Seq[Int],
      frozen: Boolean = true,
      buildId: String = "freeze"): Snapshot = {
    val live = Snapshots.latest(spark, indexDir).map(_.segments).getOrElse(
      sys.error("freezeSegments requires a snapshot-committed index"))
    require(segIds.forall(live.contains), s"segments not live: ${segIds.filterNot(live.contains)}")
    if (frozen) Snapshots.commit(spark, indexDir, live, buildId, freeze = segIds.toSet)
    else Snapshots.commit(spark, indexDir, live, buildId, unfreeze = segIds.toSet)
  }

  /** tantivy-style log merge policy (W4, `merge_policies/log_merge_policy.rs`):
    * bucket live segments by log of doc count; any bucket with >=
    * minNumSegments members is a merge candidate. Driver-side over the
    * metrics table. Frozen segments are filtered out exactly as the
    * reference's `FrozenLogMergePolicy` does
    * (`log_merge_policy.rs:27-43`).
    */
  def logMergeCandidates(
      segDocs: Seq[(Int, Long)],
      minNumSegments: Int = 8,
      maxDocsBeforeMerge: Long = 10_000_000L,
      minLayerSize: Long = 10_000L,
      levelLogSize: Double = 0.75,
      frozen: Set[Int] = Set.empty
  ): Seq[Seq[Int]] = {
    val eligible = segDocs
      .filterNot(s => frozen.contains(s._1))
      .filter(_._2 <= maxDocsBeforeMerge).sortBy(-_._2)
    if (eligible.isEmpty) return Nil
    def logSize(n: Long): Double = math.log(math.max(n, minLayerSize).toDouble)
    val out = Vector.newBuilder[Seq[Int]]
    var bucket = Vector.empty[(Int, Long)]
    var bucketMax = Double.NegativeInfinity
    def flush(): Unit = {
      if (bucket.size >= minNumSegments) out += bucket.map(_._1)
      bucket = Vector.empty
      bucketMax = Double.NegativeInfinity
    }
    eligible.foreach { case (seg, n) =>
      val l = logSize(n)
      if (bucket.isEmpty || l >= bucketMax - levelLogSize) {
        if (bucket.isEmpty) bucketMax = l
        bucket :+= (seg, n)
      } else {
        flush()
        bucketMax = l
        bucket = Vector((seg, n))
      }
    }
    flush()
    out.result()
  }

  /** Temporal merge policy (W5, `merge_policies/temporal_merge_policy.rs:26-53`):
    * one candidate of every live, non-frozen segment older than the pivot.
    */
  def temporalMergeCandidates(
      segCreatedAt: Seq[(Int, Long)],
      mergeOlderThanSecs: Long,
      nowMillis: Long = System.currentTimeMillis(),
      frozen: Set[Int] = Set.empty
  ): Seq[Seq[Int]] = {
    val pivot = nowMillis - mergeOlderThanSecs * 1000
    val old = segCreatedAt.filterNot(s => frozen.contains(s._1)).filter(_._2 < pivot).map(_._1)
    if (old.isEmpty) Nil else Seq(old)
  }

  /** Latest metrics row per live segment: (segment_id, num_docs, created_at millis). */
  def liveSegmentStats(spark: SparkSession, indexDir: String): Seq[(Int, Long, Long)] = {
    val reader = new IndexReader(spark, indexDir)
    val live = reader.snapshot.map(_.segments).getOrElse(Nil).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("segment_id").orderBy(col("created_at").desc)
    reader.metrics
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("segment_id", "num_docs", "created_at")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getTimestamp(2).getTime))
      .filter(t => live.contains(t._1))
      .toSeq
  }

  /** Background-compaction analog: repeatedly apply the log merge policy
    * over live-segment stats until no candidates remain (the reference's
    * merge-thread loop, driver-scheduled here).
    *
    * @return the new segment ids created, in order
    */
  def autoCompact(
      spark: SparkSession,
      indexDir: String,
      schema: IndexSchema,
      buildId: String,
      minNumSegments: Int = 8,
      conf: IndexBuilder.BuildConf = IndexBuilder.BuildConf()
  ): Seq[Int] = {
    val created = Vector.newBuilder[Int]
    var round = 0
    var more = true
    while (more) {
      val stats = liveSegmentStats(spark, indexDir).map(t => (t._1, t._2))
      val frozen = Snapshots.latest(spark, indexDir).map(_.frozen).getOrElse(Set.empty[Int])
      val cands = logMergeCandidates(stats, minNumSegments = minNumSegments, frozen = frozen)
      if (cands.isEmpty) more = false
      else {
        cands.foreach { segIds =>
          created += mergeSegments(spark, indexDir, schema, segIds, s"$buildId/compact-$round", conf)
        }
        round += 1
      }
    }
    created.result()
  }

  /** Vacuum (W6, `index_writer_holder.rs:425-461`): merge all live,
    * non-excluded, non-frozen segments into one (the reference's
    * `!is_frozen && !is_excluded` filter, `index_writer_holder.rs:438-448`).
    */
  def vacuum(
      spark: SparkSession,
      indexDir: String,
      schema: IndexSchema,
      buildId: String,
      excludedSegments: Set[Int] = Set.empty,
      conf: IndexBuilder.BuildConf = IndexBuilder.BuildConf()
  ): Option[Int] = {
    val snap = Snapshots.latest(spark, indexDir)
    val live = snap.map(_.segments).getOrElse(Nil)
    val frozen = snap.map(_.frozen).getOrElse(Set.empty[Int])
    val targets = live.filterNot(excludedSegments.contains).filterNot(frozen.contains)
    if (targets.size < 2) None
    else Some(mergeSegments(spark, indexDir, schema, targets, buildId, conf))
  }

  // ----------------------------------------------------- incremental ingest

  /** Upsert conflict handling, mirroring the reference's four strategies
    * (`summa-proto/proto/index_service.proto:134-139`, implemented by
    * `resolve_conflicts`, `index_writer_holder.rs:290-332`).
    */
  sealed trait ConflictStrategy
  object ConflictStrategy {
    /** No conflict resolution at all (`DO_NOTHING`): incoming docs are
      * indexed as-is and duplicate keys may coexist — the reference docs
      * recommend this for large updates where the application maintains
      * uniqueness itself.
      */
    case object DoNothing extends ConflictStrategy
    /** Tombstone existing docs sharing a key, index incoming (`OVERWRITE`). */
    case object Overwrite extends ConflictStrategy
    /** `OVERWRITE_ALWAYS` — same delete-then-add at this layer; the
      * reference core's `resolve_conflicts` also treats every
      * non-DO_NOTHING strategy as delete-by-unique-term then add.
      */
    case object OverwriteAlways extends ConflictStrategy
    /** `MERGE`: field-wise coalesce of the incoming doc over the latest
      * existing version before re-indexing — a null/absent incoming field
      * keeps the existing value. Only fields present in the doc store
      * (key + storedFields) can be recovered from the index; indexed-only
      * fields always come from the incoming doc.
      */
    case object Merge extends ConflictStrategy
  }

  /** Incremental ingestion with upsert semantics (S2 + W7: index_bulk +
    * resolve_conflicts): builds new segments from `newDocs` at the next free
    * segment-id range, resolves key conflicts per the strategy, publishes one
    * atomic snapshot. This is also the `foreachBatch` body for streaming
    * ingestion.
    *
    * @return new segment ids
    */
  def addDocuments(
      spark: SparkSession,
      indexDir: String,
      schema: IndexSchema,
      newDocs: DataFrame,
      buildId: String,
      strategy: ConflictStrategy = ConflictStrategy.Overwrite,
      conf: IndexBuilder.BuildConf = IndexBuilder.BuildConf()
  ): Seq[Int] = {
    val reader = new IndexReader(spark, indexDir)
    val live = reader.snapshot.map(_.segments).getOrElse(Nil)
    val segOffset = if (live.isEmpty) 0 else live.max + 1

    // bootstrapping a fresh index: no existing docs, no conflicts.
    // Conflict tombstones are DEFERRED until after the new segments are
    // built: the Merge strategy's coalesce source reads the pre-delete doc
    // store (tombstoning first would erase it mid-plan), and deferral also
    // shrinks the window in which live readers see deletes without their
    // replacements. (reader.docs is pinned to the current snapshot, so the
    // deferred conflict scan never sees the segments being built.)
    lazy val incomingKeys = newDocs
      .select(schema.keyColumn.as("key")).distinct()
    val (toIndex, deferredTombstones): (DataFrame, Option[DataFrame]) =
      if (live.isEmpty) (newDocs, None)
      else strategy match {
        case ConflictStrategy.DoNothing =>
          // reference `resolve_conflicts` short-circuits for DO_NOTHING:
          // incoming docs index as-is, duplicate keys may coexist
          (newDocs, None)
        case ConflictStrategy.Overwrite | ConflictStrategy.OverwriteAlways =>
          // tombstone every live doc sharing a key with the incoming batch
          val conflicts = reader.docs
            .join(incomingKeys, Seq("key"))
            .select("segment_id", "doc_id")
          (newDocs, Some(conflicts))
        case ConflictStrategy.Merge =>
          // field-wise coalesce of incoming over the LATEST existing stored
          // version of each conflicting key, then overwrite. Only columns
          // recoverable from the doc store participate; the per-key window
          // is partitioned by key, so it scales with the batch, not the index.
          val conflicts = reader.applyDeletes(reader.docs)
            .join(incomingKeys, Seq("key"))
          val mergeCols = schema.storedFields.filter(newDocs.columns.contains)
          val merged =
            if (mergeCols.isEmpty) newDocs
            else {
              val w = org.apache.spark.sql.expressions.Window
                .partitionBy("key").orderBy(col("segment_id").desc, col("doc_id").desc)
              val latest = conflicts
                .withColumn("__rn", row_number().over(w))
                .filter(col("__rn") === 1)
                .select(col("key").as("__mkey") +: mergeCols.map(f => col(f).as(s"__old_$f")): _*)
              val joined = newDocs.join(latest, schema.keyColumn === col("__mkey"), "left")
              mergeCols
                .foldLeft(joined)((df, f) => df.withColumn(f, coalesce(col(f), col(s"__old_$f"))))
                .drop("__mkey" +: mergeCols.map(f => s"__old_$f"): _*)
            }
          (merged, Some(conflicts.select("segment_id", "doc_id")))
      }

    val segs = IndexBuilder.buildSegments(
      spark, toIndex, schema, indexDir, buildId, conf, segOffset)
    deferredTombstones.foreach(deleteDocs(spark, indexDir, _))
    Snapshots.commit(spark, indexDir, live ++ segs, buildId)
    segs
  }
}
