package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.index.IndexSchema
import graft.search.{IndexReader, IndexRegistry, MatchQuery, Searcher}

/** SQL table functions over graft indexes, so every search operator is
  * demo-able from plain `spark.sql`:
  *
  * {{{
  *   SELECT * FROM search_top('/data/idx', 'body42 +lang:en', 10)
  *   SELECT lang, count(*) FROM search('/data/idx', 'body42') GROUP BY lang
  *   SELECT * FROM index_docs('/data/idx') WHERE lang = 'en'
  * }}}
  *
  * The first argument is a registered index name/alias
  * ([[GraftSql.registry]]) or an index directory; directories self-describe
  * via the `_schema.json` written at build time. The query string is full
  * SummaQL (reference grammar `summa-core/src/query_parser/summa_ql.rs`), so
  * phrases, ranges, json paths, boosts and boolean syntax all work.
  *
  * Two injection paths, both registering the same functions:
  *   - `GraftSql.install(spark)` on a live session (tests, notebooks);
  *   - `--conf spark.sql.extensions=graft.plans.GraftExtensions` at session
  *     build (the idiomatic cluster deployment).
  *
  * The builders run at ANALYSIS time: arguments must be constants (they are
  * folded into the plan — the same contract as the built-in `range(...)`).
  * The expanded plan is the ordinary DataFrame plan of the equivalent
  * [[Searcher]] call, so Catalyst sees through the TVF completely: filters
  * push into the parquet scans, the top-k becomes TakeOrderedAndProject.
  */
object GraftSql {

  /** Process-wide registry consulted before path resolution: `search('name',
    * …)` serves registered indexes/aliases (reference alias resolution,
    * `index_registry.rs:90-129`).
    */
  val registry: IndexRegistry = new IndexRegistry

  private val byPath = TrieMap[String, Searcher]()

  /** Drop the cached searcher of `dir` (e.g. after a new commit — readers pin
    * the snapshot they opened).
    */
  def invalidate(dir: String): Unit = { byPath.remove(dir); () }

  def searcherFor(ref: String): Searcher = {
    val spark = org.apache.spark.sql.SparkSession.active
    try registry.resolve(ref)
    catch {
      case _: IllegalArgumentException =>
        byPath.getOrElseUpdate(
          ref, {
            val schema = IndexSchema.load(spark, ref).getOrElse(sys.error(
              s"'$ref' is neither a registered index nor an index dir with _schema.json"))
            new Searcher(new IndexReader(spark, ref), schema)
          })
    }
  }

  private def constArg(fn: String, e: Expression, pos: Int): Any = {
    require(e.foldable, s"$fn: argument ${pos + 1} must be a constant")
    val v = e.eval()
    require(v != null, s"$fn: argument ${pos + 1} must not be null")
    v
  }
  private def strArg(fn: String, args: Seq[Expression], pos: Int): String =
    constArg(fn, args(pos), pos).toString
  private def intArg(fn: String, args: Seq[Expression], pos: Int): Int =
    constArg(fn, args(pos), pos) match {
      case n: java.lang.Number => n.intValue()
      case other               => sys.error(s"$fn: argument ${pos + 1} must be an integer, got $other")
    }
  private def arity(fn: String, args: Seq[Expression], lo: Int, hi: Int): Unit =
    require(args.size >= lo && args.size <= hi,
      s"$fn expects $lo${if (hi > lo) s"..$hi" else ""} arguments, got ${args.size}")

  /** name -> (builder, usage) */
  private val functions: Seq[(String, Seq[Expression] => LogicalPlan, String)] = Seq(
    (
      "search",
      args => {
        arity("search", args, 2, 2)
        val s = searcherFor(strArg("search", args, 0))
        s.searchWithDocs(MatchQuery(strArg("search", args, 1))).queryExecution.logical
      },
      "_FUNC_(index, query) - all matching docs (stored fields + score) of a SummaQL query"),
    (
      "search_top",
      args => {
        arity("search_top", args, 3, 4)
        val s = searcherFor(strArg("search_top", args, 0))
        val k = intArg("search_top", args, 2)
        val offset = if (args.size > 3) intArg("search_top", args, 3) else 0
        s.topDocsWithKeys(MatchQuery(strArg("search_top", args, 1)), k, offset)
          .queryExecution.logical
      },
      "_FUNC_(index, query, k[, offset]) - top-k docs by BM25 with stored fields"),
    (
      "index_docs",
      args => {
        arity("index_docs", args, 1, 1)
        searcherFor(strArg("index_docs", args, 0)).reader.docs.queryExecution.logical
      },
      "_FUNC_(index) - the doc store of an index (live segments only)")
  )

  private def descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] =
    functions.map { case (name, builder, usage) =>
      (FunctionIdentifier(name),
        new ExpressionInfo(GraftSql.getClass.getName, null, name, usage, ""),
        builder)
    }

  /** Register on a live session (temp table functions, session-scoped). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptions.foreach { case (ident, info, builder) =>
      spark.sessionState.tableFunctionRegistry.registerFunction(ident, info, builder)
    }

  private[plans] def inject(ext: SparkSessionExtensions): Unit =
    descriptions.foreach(d => ext.injectTableFunction(d))
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftSql.inject(ext)
}
