package graft

import graft.analysis.StopWords
import graft.index.FieldNorm

/** DuckDB oracle-SQL builders for the driver's correctness gate.
  *
  * The SQL mirrors the engine's BM25 expression shape **operation by
  * operation** (same literals written as the same arithmetic, e.g.
  * `(1.2 + 1)` not `2.2`) so both engines execute the same IEEE-754 double
  * ops; final scores are rounded to 4 decimals on both sides, which absorbs
  * any last-ulp libm `ln` differences.
  *
  * Token model for the `documents` table: its `text` is strictly
  * single-space-separated lowercase ASCII words (verified), so the summa
  * analyzer over it is exactly `string_split(text, ' ')` + the 321-entry
  * stop-word filter, with pre-filter ordinals as positions.
  */
object OracleSql {

  val stopList: String =
    StopWords.All.toSeq.sorted.map(w => "'" + w.replace("'", "''") + "'").mkString(", ")

  private val fnValues: String =
    FieldNorm.Table.zipWithIndex.map { case (v, i) => s"($i, $v)" }.mkString(", ")

  /** Shared CTE prologue: filtered tokens, positions, doc lengths, quantized
    * lengths, corpus stats.
    */
  def prologue: String =
    s"""WITH fn(id, norm) AS (VALUES $fnValues),
       |tok AS (
       |  SELECT doc_id,
       |         unnest(string_split(text, ' ')) AS w,
       |         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
       |  FROM documents
       |),
       |ftok AS (SELECT doc_id, w, pos FROM tok WHERE w NOT IN ($stopList)),
       |dl AS (SELECT doc_id, count(*) AS len FROM ftok GROUP BY 1),
       |stats AS (
       |  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
       |         (SELECT sum(len) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl
       |),
       |qn AS (
       |  SELECT doc_id,
       |         (SELECT max(norm) FROM fn WHERE norm <= dl.len)::DOUBLE AS qlen
       |  FROM dl
       |)""".stripMargin

  /** Per-doc BM25 CTE for one term, named `sc_<alias>`: (doc_id, score). */
  def termScoreCte(term: String, alias: String): String =
    s""",tf_$alias AS (SELECT doc_id, count(*)::DOUBLE AS tf FROM ftok WHERE w = '$term' GROUP BY 1),
       |df_$alias AS (SELECT count(*)::DOUBLE AS df FROM tf_$alias),
       |sc_$alias AS (
       |  SELECT t.doc_id,
       |         ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
       |         (t.tf * (1.2 + 1)) / (t.tf + 1.2 * ((1 - 0.75) + 0.75 * q.qlen / s.avgdl)) AS score
       |  FROM tf_$alias t, df_$alias d, stats s
       |  JOIN qn q ON q.doc_id = t.doc_id
       |)""".stripMargin

  def termQuery(term: String): String =
    prologue + termScoreCte(term, "t") +
      "\nSELECT doc_id, round(score, 4) AS score FROM sc_t ORDER BY doc_id"

  /** Fieldnorms-off scoring: constant length 1 instead of the quantized
    * per-doc length.
    */
  def termQueryNoFieldnorms(term: String): String =
    prologue +
      s""",tf_t AS (SELECT doc_id, count(*)::DOUBLE AS tf FROM ftok WHERE w = '$term' GROUP BY 1),
         |df_t AS (SELECT count(*)::DOUBLE AS df FROM tf_t)
         |SELECT t.doc_id,
         |       round(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
         |             (t.tf * (1.2 + 1)) / (t.tf + 1.2 * ((1 - 0.75) + 0.75 * 1.0 / s.avgdl)), 4) AS score
         |FROM tf_t t, df_t d, stats s
         |ORDER BY doc_id""".stripMargin

  def termTopK(term: String, k: Int): String =
    prologue + termScoreCte(term, "t") +
      s"\nSELECT doc_id, round(score, 4) AS score FROM sc_t ORDER BY round(score, 4) DESC, doc_id LIMIT $k"

  def boolMust(t1: String, t2: String): String =
    prologue + termScoreCte(t1, "a") + termScoreCte(t2, "b") +
      """
        |SELECT a.doc_id, round(a.score + b.score, 4) AS score
        |FROM sc_a a JOIN sc_b b ON a.doc_id = b.doc_id
        |ORDER BY a.doc_id""".stripMargin

  def boolShould(t1: String, t2: String): String =
    prologue + termScoreCte(t1, "a") + termScoreCte(t2, "b") +
      """
        |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
        |       round(coalesce(a.score, 0) + coalesce(b.score, 0), 4) AS score
        |FROM sc_a a FULL OUTER JOIN sc_b b ON a.doc_id = b.doc_id
        |ORDER BY doc_id""".stripMargin

  def boolMustNot(pos: String, neg: String): String =
    prologue + termScoreCte(pos, "a") +
      s"""
         |SELECT a.doc_id, round(a.score, 4) AS score
         |FROM sc_a a
         |WHERE a.doc_id NOT IN (SELECT doc_id FROM ftok WHERE w = '$neg')
         |ORDER BY doc_id""".stripMargin

  def dismax(t1: String, t2: String, tieBreaker: Double): String =
    prologue + termScoreCte(t1, "a") + termScoreCte(t2, "b") +
      s"""
         |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         |       round(
         |         greatest(coalesce(a.score, 0), coalesce(b.score, 0)) +
         |         $tieBreaker * ((coalesce(a.score, 0) + coalesce(b.score, 0)) -
         |                        greatest(coalesce(a.score, 0), coalesce(b.score, 0))), 4) AS score
         |FROM sc_a a FULL OUTER JOIN sc_b b ON a.doc_id = b.doc_id
         |ORDER BY doc_id""".stripMargin

  /** Phrase (slop=0, two terms): adjacency on pre-filter positions; score =
    * (idf(t1)+idf(t2)) * tf_part(phrase_tf).
    */
  def phrase(t1: String, t2: String): String =
    prologue +
      s""",p1 AS (SELECT doc_id, pos FROM tok WHERE w = '$t1'),
         |p2 AS (SELECT doc_id, pos FROM tok WHERE w = '$t2'),
         |ph AS (
         |  SELECT p1.doc_id, count(*)::DOUBLE AS tf
         |  FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
         |  GROUP BY 1
         |),
         |df1 AS (SELECT count(DISTINCT doc_id)::DOUBLE AS df FROM p1),
         |df2 AS (SELECT count(DISTINCT doc_id)::DOUBLE AS df FROM p2)
         |SELECT ph.doc_id,
         |       round(
         |         (ln(1 + (s.n - d1.df + 0.5) / (d1.df + 0.5)) +
         |          ln(1 + (s.n - d2.df + 0.5) / (d2.df + 0.5))) *
         |         (ph.tf * (1.2 + 1)) / (ph.tf + 1.2 * ((1 - 0.75) + 0.75 * q.qlen / s.avgdl)), 4) AS score
         |FROM ph, df1 d1, df2 d2, stats s
         |JOIN qn q ON q.doc_id = ph.doc_id
         |ORDER BY ph.doc_id""".stripMargin

  /** Two-term phrase with slop: base positions whose partner term appears
    * within `slop` of the expected spot (mirrors PostingUdfs.phraseTf).
    */
  def phraseSlop(t1: String, t2: String, slop: Int): String =
    prologue +
      s""",p1 AS (SELECT doc_id, pos FROM tok WHERE w = '$t1'),
         |p2 AS (SELECT doc_id, pos FROM tok WHERE w = '$t2'),
         |m AS (
         |  SELECT DISTINCT p1.doc_id, p1.pos
         |  FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id AND abs(p2.pos - (p1.pos + 1)) <= $slop
         |),
         |ph AS (SELECT doc_id, count(*)::DOUBLE AS tf FROM m GROUP BY 1),
         |df1 AS (SELECT count(DISTINCT doc_id)::DOUBLE AS df FROM p1),
         |df2 AS (SELECT count(DISTINCT doc_id)::DOUBLE AS df FROM p2)
         |SELECT ph.doc_id,
         |       round(
         |         (ln(1 + (s.n - d1.df + 0.5) / (d1.df + 0.5)) +
         |          ln(1 + (s.n - d2.df + 0.5) / (d2.df + 0.5))) *
         |         (ph.tf * (1.2 + 1)) / (ph.tf + 1.2 * ((1 - 0.75) + 0.75 * q.qlen / s.avgdl)), 4) AS score
         |FROM ph, df1 d1, df2 d2, stats s
         |JOIN qn q ON q.doc_id = ph.doc_id
         |ORDER BY ph.doc_id""".stripMargin

  def termCount(term: String): String =
    prologue + s"\nSELECT count(DISTINCT doc_id) AS cnt FROM ftok WHERE w = '$term'"

  def regex(pattern: String): String =
    prologue +
      s"\nSELECT DISTINCT doc_id FROM ftok WHERE regexp_full_match(w, '$pattern') ORDER BY doc_id"

  // ------------------------------------------------- training-data ops

  /** Exact n-gram (trigram) Jaccard near-dup pairs — mirrors
    * Dedup.ngramJaccardPairs: distinct word trigrams, shingle self-join,
    * jaccard = inter / (|A|+|B|-inter), threshold applied pre-rounding.
    */
  def ngramJaccardPairs(minJaccard: Double): String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS s
       |  FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 2, 1))) i) g
       |),
       |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       |p AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT id_a, id_b,
       |       round(inter::DOUBLE / (sa.sz + sb.sz - inter), 4) AS jaccard
       |FROM p JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
       |WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= $minJaccard
       |ORDER BY id_a, id_b""".stripMargin

  /** Exact embedding-cosine pairs — mirrors Dedup.cosinePairs. */
  def cosinePairs(minCos: Double): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cosine
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $minCos
       |ORDER BY id_a, id_b""".stripMargin

  /** Brute-force cosine top-k against the vector of vec_id=0. */
  def cosineTopK(k: Int): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
       |SELECT e.vec_id,
       |       round(list_dot_product(e.v, q.qv) /
       |             (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine
       |FROM e, q
       |ORDER BY cosine DESC, vec_id LIMIT $k""".stripMargin

  /** Text stats — mirrors TextStats.{tokenCount, stopwordRatio, qualityScore}. */
  def textStats: String =
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |         string_split(text, ' ') AS ws,
       |         len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS nstop
       |  FROM documents
       |)
       |SELECT doc_id,
       |       len(ws) AS tc,
       |       round(nstop::DOUBLE / len(ws), 4) AS swr,
       |       round(
       |         least(length(text) / 500.0, 1.0) * 0.4 +
       |         least((nstop::DOUBLE / len(ws)) * 4.0, 1.0) * 0.3 +
       |         ((length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')))::DOUBLE /
       |          length(text)) * 0.3, 4) AS quality
       |FROM t ORDER BY doc_id""".stripMargin

  /** SummaQL `t1 -neg t2`: should(t1)+should(t2) excluding neg. */
  def matchShouldShouldNot(t1: String, t2: String, neg: String): String =
    prologue + termScoreCte(t1, "a") + termScoreCte(t2, "b") +
      s"""
         |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         |       round(coalesce(a.score, 0) + coalesce(b.score, 0), 4) AS score
         |FROM sc_a a FULL OUTER JOIN sc_b b ON a.doc_id = b.doc_id
         |WHERE coalesce(a.doc_id, b.doc_id) NOT IN (SELECT doc_id FROM ftok WHERE w = '$neg')
         |ORDER BY doc_id""".stripMargin
}
