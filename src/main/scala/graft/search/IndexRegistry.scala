package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.index.IndexSchema

/** Multi-index registry with alias resolution and cross-index search
  * (reference: `IndexRegistry`,
  * `/root/reference/summa-core/src/components/index_registry.rs:90-213`).
  * Each index scores with its own statistics (as the reference does); merged
  * results keep an `index_name` discriminator.
  */
class IndexRegistry {
  private val searchers = scala.collection.concurrent.TrieMap[String, Searcher]()
  private val aliases = scala.collection.concurrent.TrieMap[String, String]()

  def register(name: String, searcher: Searcher): Unit = searchers.put(name, searcher)
  def addAlias(alias: String, name: String): Unit = aliases.put(alias, name)
  def resolve(nameOrAlias: String): Searcher =
    searchers.getOrElse(aliases.getOrElse(nameOrAlias, nameOrAlias),
      throw new IllegalArgumentException(s"unknown index: $nameOrAlias"))

  /** Paged serving entry: resolve alias → probe the searcher's collector
    * cache → search only on miss (`index_holder.rs:460-505`). Returns
    * (rows, has_next).
    */
  def topDocsPage(
      nameOrAlias: String,
      q: Query,
      limit: Int,
      offset: Int = 0): (Array[org.apache.spark.sql.Row], Boolean) =
    resolve(nameOrAlias).collectTopDocs(q, limit, offset)

  /** Search several indices, merge top-k by score (reference
    * `finalize_extraction` merge shape).
    */
  def searchAll(names: Seq[String], q: Query, k: Int): DataFrame = {
    val parts = names.map { n =>
      resolve(n).topDocs(q, k).withColumn("index_name", lit(n))
    }
    parts
      .reduce(_ unionByName _)
      .orderBy(col("score").desc, col("index_name").asc, col("segment_id").asc, col("doc_id").asc)
      .limit(k)
  }
}

/** Reflection / export operators (S4, S10, W10 of SURVEY.md §2). */
object Reflection {

  /** Per-segment top-k terms of a field by doc frequency (S10,
    * `summa-server/src/apis/reflection.rs:28-77`) — the head-term report
    * that drives skew decisions.
    */
  def topTermsPerSegment(reader: IndexReader, field: String, k: Int): DataFrame = {
    val w = Window.partitionBy("segment_id").orderBy(col("df").desc, col("term").asc)
    reader.termStatsDf
      .filter(col("field") === field)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("segment_id", "term", "df")
      .orderBy("segment_id", "term")
  }

  /** Index-wide top-k terms by summed df. */
  def topTerms(reader: IndexReader, field: String, k: Int): DataFrame =
    reader.termStatsDf
      .filter(col("field") === field)
      .groupBy("term")
      .agg(sum("df").as("df"))
      .orderBy(col("df").desc, col("term").asc)
      .limit(k)

  /** Stream documents out of the index, optionally query-filtered and
    * field-projected (S4, `index_holder.rs:729-812`). Unfiltered exports are
    * a straight scan of the doc store; filtered ones join the scored set.
    */
  def exportDocuments(
      searcher: Searcher,
      query: Option[Query] = None,
      fields: Seq[String] = Nil
  ): DataFrame = {
    val base = query match {
      case Some(q) => searcher.searchWithDocs(q)
      case None    => searcher.reader.docs
    }
    if (fields.isEmpty) base else base.select(fields.map(col): _*)
  }

  /** Serialize exported docs to the reference's named-document JSON
    * (`custom_serializer.rs:26-45`): fields configured as `multi_fields`
    * render as JSON ARRAYS (a scalar column is wrapped, an array column
    * passes through); every other field collapses to a single value (an
    * array column keeps its first element, like the reference's
    * `field_values.get(0)`). Fields are emitted in name-sorted order
    * (BTreeMap semantics). Output: the key column + a `doc_json` string.
    */
  def exportNamedJson(
      searcher: Searcher,
      query: Option[Query] = None,
      fields: Seq[String] = Nil,
      multiFields: Set[String] = Set.empty
  ): DataFrame = {
    val base = exportDocuments(searcher, query)
    val emit =
      (if (fields.nonEmpty) fields
       else base.columns.toSeq.filterNot(Set("segment_id", "doc_id", "score", "key").contains))
        .sorted
    val shaped = emit.map { f =>
      val isArray = base.schema(f).dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]
      val c =
        if (multiFields.contains(f)) { if (isArray) col(f) else array(col(f)) }
        else if (isArray) element_at(col(f), 1)
        else col(f)
      c.as(f)
    }
    // the outer key travels under a reserved alias so an emitted field named
    // "key" (explicit `fields` request) can't make the reference ambiguous
    base.select(col("key").as("__export_key") +: shaped: _*)
      .select(col("__export_key").as("key"), to_json(struct(emit.map(col): _*)).as("doc_json"))
  }

  /** Warm-up (W10, `index_holder.rs:329-375`): prime postings + stats. */
  def warmup(reader: IndexReader): Unit = {
    reader.fieldStats // forces stats read
    reader.postings.select(count(lit(1))).collect()
    reader.termStatsDf.select(count(lit(1))).collect()
  }

  /** Hotcache-style priming (reference: the mmap'd hotcache keeps index
    * components resident so first queries don't fault them in,
    * `summa-core/src/components/segment_attributes.rs` sibling cache layer).
    * Spark analog: persist the reader's postings/docs/termstats DataFrames
    * in the block-manager columnar cache and materialize them. Spark's
    * CacheManager matches PLAN FRAGMENTS, so every subsequent query built on
    * this reader (term filters, topDocs, aggregations) automatically scans
    * the InMemoryRelation instead of parquet — no query-side change needed.
    * MEMORY_AND_DISK keeps cold segments spillable; `unprime` releases.
    */
  def prime(reader: IndexReader): Unit = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    reader.postings.persist(lvl)
    reader.docs.persist(lvl)
    reader.termStatsDf.persist(lvl)
    // materialize concurrently (independent jobs, same discipline as the
    // build-path stat writes)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val jobs = Seq(reader.postings, reader.docs, reader.termStatsDf)
      .map(df => Future { df.count() })
    jobs.foreach(Await.result(_, Duration.Inf))
    reader.fieldStats
    ()
  }

  def unprime(reader: IndexReader): Unit = {
    reader.postings.unpersist()
    reader.docs.unpersist()
    reader.termStatsDf.unpersist()
    ()
  }
}
