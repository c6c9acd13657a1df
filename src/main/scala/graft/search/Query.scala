package graft.search

/** Query algebra — mirrors the reference proto tree
  * (`/root/reference/summa-proto/proto/query.proto:64-80`, parsed at
  * `summa-core/src/components/query_parser/proto_query_parser.rs:112-247`).
  * Each node denotes a scored doc-set; execution maps each to a DataFrame of
  * `(segment_id, doc_id, score)`.
  */
sealed trait Query

case object AllQuery extends Query
case object EmptyQuery extends Query

final case class TermQuery(field: String, value: String) extends Query

sealed trait Occur
object Occur {
  case object Must extends Occur
  case object Should extends Occur
  case object MustNot extends Occur
}

final case class BooleanQuery(
    clauses: Seq[(Occur, Query)],
    minimumShouldMatch: Option[Int] = None
) extends Query {
  def must: Seq[Query] = clauses.collect { case (Occur.Must, q) => q }
  def should: Seq[Query] = clauses.collect { case (Occur.Should, q) => q }
  def mustNot: Seq[Query] = clauses.collect { case (Occur.MustNot, q) => q }
}

/** terms carry their analyzer token positions within the query string, so
  * stop-word gaps participate in adjacency (tantivy semantics; positions are
  * pre-filter ordinals).
  */
final case class PhraseQuery(field: String, terms: Seq[(Int, String)], slop: Int = 0) extends Query

final case class BoostQuery(query: Query, boost: Double) extends Query

final case class DisjunctionMaxQuery(disjuncts: Seq[Query], tieBreaker: Double = 0.0) extends Query

/** Typed range over a fast field (docs-table column). Bounds are rendered as
  * strings and cast to the column type at planning.
  */
final case class RangeQuery(
    field: String,
    lower: Option[String],
    upper: Option[String],
    includeLower: Boolean = true,
    includeUpper: Boolean = true
) extends Query

/** Range over the term dictionary of an indexed text field (`body:[aaa TO
  * ccc]`): matches docs containing any term in the range, const-scored.
  */
final case class TermRangeQuery(
    field: String,
    lower: Option[String],
    upper: Option[String],
    includeLower: Boolean = true,
    includeUpper: Boolean = true
) extends Query

final case class RegexQuery(field: String, pattern: String) extends Query

final case class ExistsQuery(field: String) extends Query

/** Free-text query in SummaQL; parsed against the index schema's default
  * fields at plan time.
  *
  * `configPatch` is the per-query parser-config override of the reference
  * (`query.proto:118-121` optional `query_parser_config`): when set, it is
  * MERGED over the searcher's index-default config before parsing
  * (`proto_query_parser.rs:143-149`), so a single request can redirect
  * default fields, switch to dismax, disable morphology, etc. without
  * touching the index configuration.
  */
final case class MatchQuery(
    value: String,
    configPatch: Option[SummaQL.ConfigPatch] = None
) extends Query

final case class MoreLikeThisQuery(
    fields: Map[String, String],
    minDocFrequency: Long = 5,
    maxDocFrequency: Long = Long.MaxValue,
    minTermFrequency: Int = 2,
    maxQueryTerms: Int = 25,
    minWordLength: Int = 0,
    maxWordLength: Int = 0,
    boost: Option[Double] = None
) extends Query
