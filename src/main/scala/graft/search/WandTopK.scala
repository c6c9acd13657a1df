package graft.search

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.index.{FieldNorm, PostingCodec}

/** Block-max WAND top-k (`[tantivy, public]`; SURVEY.md §4.2 — the one
  * genuinely custom physical operator): for a should-only bag of terms,
  * compute BM25 top-k while *skipping the decode* of posting blocks whose
  * score upper bound cannot beat the running k-th best.
  *
  * Distributed shape: posting blocks (not postings!) are shuffled by
  * `(segment_id, block_id)` so all terms' blocks for one docId range are
  * co-located; each partition streams doc-aligned block groups keeping a
  * local top-k heap — a group is decoded only if
  * `Σ_t idf_t · tf_part(block_max_tf_t, len(block_min_norm_t))` exceeds the
  * local threshold. Per-partition top-k then merges via TakeOrdered. The
  * result is identical to the exhaustive plan (pruning is a pure
  * optimization), verified in tests.
  */
object WandTopK {

  private val outSchema = StructType(Seq(
    StructField("segment_id", IntegerType, false),
    StructField("doc_id", IntegerType, false),
    StructField("score", DoubleType, false)))

  /** Candidate hit ordered by (score desc, segment asc, doc asc). */
  private final case class Hit(score: Double, seg: Int, doc: Int)
  private val hitOrd: Ordering[Hit] =
    Ordering.by((h: Hit) => (-h.score, h.seg, h.doc))

  def topK(searcher: Searcher, field: String, terms: Seq[String], k: Int): DataFrame = {
    val reader = searcher.reader
    val spark = reader.spark
    require(reader.deletes.isEmpty,
      "WAND path requires a tombstone-free index (merge first), else use the exhaustive plan")
    val n = reader.fieldStats(field).nDocs
    val avgdl = reader.fieldStats(field).avgdl
    val dfs = reader.termDfs(terms.map((field, _)))
    val idfs: Map[String, Double] =
      terms.flatMap(t => dfs.get((field, t)).map(df => t -> BM25.idf(df, n))).toMap
    if (idfs.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)

    val bcIdfs = spark.sparkContext.broadcast(idfs)
    val parts = spark.sessionState.conf.numShufflePartitions

    val blocks = reader.postings
      .filter(col("field") === field && col("term").isin(terms: _*))
      .select("term", "segment_id", "block_id", "doc_count", "block_max_tf",
        "block_min_norm", "doc_ids", "tfs", "norms")
      .repartition(parts, col("segment_id"), col("block_id"))
      .sortWithinPartitions("segment_id", "block_id")

    val k1 = BM25.K1
    val b = BM25.B

    val candidates = blocks.mapPartitions { rows =>
      val idf = bcIdfs.value
      // same operation order as BM25.scoreCol so single-term scores are
      // bitwise identical to the exhaustive plan
      def score(tIdf: Double, tf: Double, normId: Int): Double = {
        val len = FieldNorm.decode(normId).toDouble
        tIdf * (tf * (k1 + 1)) / (tf + k1 * ((1 - b) + b * len / avgdl))
      }
      val heap = new java.util.PriorityQueue[Hit](k, hitOrd.reverse) // worst on top
      def threshold: Double =
        if (heap.size < k) Double.NegativeInfinity else heap.peek().score
      def offer(h: Hit): Unit = {
        if (heap.size < k) heap.add(h)
        else if (hitOrd.lt(h, heap.peek())) { heap.poll(); heap.add(h) }
      }

      val it = rows.buffered
      while (it.hasNext) {
        // gather one doc-aligned group: all term-blocks of (seg, block_id)
        val head = it.head
        val seg = head.getInt(1)
        val blockId = head.getInt(2)
        val group = new scala.collection.mutable.ArrayBuffer[Row](4)
        while (it.hasNext && it.head.getInt(1) == seg && it.head.getInt(2) == blockId)
          group += it.next()

        var ub = 0.0
        group.foreach { r =>
          ub += score(idf(r.getString(0)), r.getInt(4).toDouble, r.getInt(5))
        }
        // decode on ub >= threshold: a block whose bound exactly ties the
        // kth score may hold a doc that wins the (segment, doc) tiebreak —
        // prune only on strict inferiority to stay result-identical
        if (ub >= threshold) {
          // decode + merge the group's postings by docId
          val acc = new java.util.TreeMap[Integer, java.lang.Double]()
          group.foreach { r =>
            val cnt = r.getInt(3)
            val ids = PostingCodec.unpackDocIds(r.getAs[Array[Byte]](6), cnt)
            val tfs = PostingCodec.unpackVarInts(r.getAs[Array[Byte]](7), cnt)
            val norms = r.getAs[Array[Byte]](8)
            val tIdf = idf(r.getString(0))
            var i = 0
            while (i < cnt) {
              val s = score(tIdf, tfs(i).toDouble, norms(i) & 0xFF)
              acc.merge(ids(i), s, (a, x) => a + x)
              i += 1
            }
          }
          acc.forEach((doc, s) => offer(Hit(s, seg, doc)))
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[Row](heap.size)
      while (!heap.isEmpty) {
        val h = heap.poll()
        out += Row(h.seg, h.doc, h.score)
      }
      out.iterator
    }(Encoders.row(outSchema))

    candidates
      .orderBy(col("score").desc, col("segment_id").asc, col("doc_id").asc)
      .limit(k)
  }

  /** Recognize a WAND-eligible query: a single term, or a should-only
    * boolean of same-field term queries (no min-should-match beyond 1).
    */
  def eligible(q: Query): Option[(String, Seq[String])] = q match {
    case TermQuery(f, t) => Some((f, Seq(t)))
    case BooleanQuery(clauses, msm) if msm.forall(_ <= 1) =>
      val terms = clauses.collect { case (Occur.Should, TermQuery(f, t)) => (f, t) }
      // repeated terms must fall back to the exhaustive plan: it sums the
      // duplicate clause twice, while WAND's idf map scores each term once
      if (terms.size == clauses.size && terms.map(_._1).distinct.size == 1 &&
        terms.distinct.size == terms.size)
        Some((terms.head._1, terms.map(_._2)))
      else None
    case _ => None
  }
}
