package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.index.FieldNorm

/** BM25 scoring (`[tantivy, public]` — spec in SURVEY.md §2.6):
  *
  * {{{
  *   idf     = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   tf_part = tf * (k1 + 1) / (tf + k1 * (1 - b + b * len / avgdl))
  *   score   = idf * tf_part,   k1 = 1.2, b = 0.75
  * }}}
  *
  * `len` is the u8-quantized-then-decoded fieldnorm ([[FieldNorm]]), which is
  * required for rank-identical scores with the quantizing reference. The
  * expression shape below is mirrored verbatim by the DuckDB oracle SQL so
  * both engines perform the same IEEE-754 operations in the same order.
  */
object BM25 {
  val K1 = 1.2
  val B = 0.75

  def idf(df: Long, n: Long): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5))

  /** Decoded fieldnorm length as a column (norm id → representable length). */
  def lenCol(normId: Column): Column =
    element_at(typedLit(FieldNorm.Table.toSeq), normId + 1).cast("double")

  /** BM25 score column given a per-term idf literal and field avgdl. With
    * `fieldnorms = false` (the reference's per-search
    * `is_fieldnorms_scoring_enabled=false`, `query.proto:52` /
    * `index_holder.rs:385-389`), a constant fieldnorm of 1 replaces the
    * per-doc length.
    */
  def scoreCol(
      tf: Column,
      normId: Column,
      idfVal: Double,
      avgdl: Double,
      fieldnorms: Boolean = true
  ): Column = {
    val tfd = tf.cast("double")
    val len = if (fieldnorms) lenCol(normId) else lit(1.0)
    lit(idfVal) * (tfd * lit(K1 + 1)) /
      (tfd + lit(K1) * (lit(1 - B) + lit(B) * len / lit(avgdl)))
  }
}
