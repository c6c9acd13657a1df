package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side dynamic field processing (reference:
  * `summa_document.rs:51-62` + `index_writer_holder.rs:349-389` +
  * `page_rank.rs:8-25`): applied to the incoming batch before indexing.
  */
object DynamicFields {

  /** The reference's 8-bucket page-rank quantizer (`page_rank.rs:8-25`). */
  def quantizePageRank(c: Column): Column =
    when(c < 0.15990829, 0L)
      .when(c < 0.17802456, 1L)
      .when(c < 0.20525744, 2L)
      .when(c < 0.24939496, 3L)
      .when(c < 0.31542026, 4L)
      .when(c < 0.42176882, 5L)
      .when(c < 0.64070435, 6L)
      .otherwise(7L)

  /** Deterministic auto-id for rows missing a key: 16-char base36 of a hash
    * (reference fills random base36, `index_writer_holder.rs:64-68,376-389`;
    * we derive it from row content so retries stay idempotent).
    */
  def autoId(contentCols: Seq[Column]): Column = {
    val h1 = abs(xxhash64(contentCols: _*))
    val h2 = abs(xxhash64((contentCols :+ lit(1)): _*))
    lower(concat(
      lpad(conv(h1.cast("string"), 10, 36), 8, "0").substr(1, 8),
      lpad(conv(h2.cast("string"), 10, 36), 8, "0").substr(1, 8)))
  }

  /** Apply the reference's dynamic write-side fields:
    *   - `page_rank` → `quantized_page_rank`
    *   - missing `idField` values ← auto id
    *   - `updated_at` ← ingestion time (epoch seconds)
    *   - mapped-fields copy rules `source → target`
    *     (`index_writer_holder.rs:349-374`)
    */
  def apply(
      df: DataFrame,
      idField: Option[String] = None,
      mappedFields: Seq[(String, String)] = Nil,
      nowEpochSecs: Option[Long] = None
  ): DataFrame = {
    var out = df
    if (out.columns.contains("page_rank"))
      out = out.withColumn("quantized_page_rank", quantizePageRank(col("page_rank")))
    idField.foreach { f =>
      val contentCols = out.columns.filterNot(_ == f).map(col).toSeq
      out = out.withColumn(f, coalesce(col(f), autoId(contentCols)))
    }
    out = out.withColumn(
      "updated_at",
      lit(nowEpochSecs.getOrElse(System.currentTimeMillis() / 1000)))
    mappedFields.foreach { case (src, dst) =>
      out =
        if (out.columns.contains(dst)) out.withColumn(dst, coalesce(col(dst), col(src)))
        else out.withColumn(dst, col(src))
    }
    out
  }
}

/** Constrained public-search validation (C11 — reference clamps,
  * `summa-server/src/apis/public.rs:27-43`): ≤2 collectors, top-docs
  * limit ≤10 / offset ≤100, reservoir limit ≤10, `content` excluded.
  */
object PublicApiLimits {
  final case class CollectorSpec(kind: String, limit: Int = 0, offset: Int = 0)

  def validate(collectors: Seq[CollectorSpec], excludedFields: Set[String] = Set("content"))
      : Either[String, Seq[CollectorSpec]] = {
    if (collectors.size > 2) return Left("at most 2 collectors allowed")
    val allowed = Set("top_docs", "reservoir_sampling", "count")
    collectors.foldLeft[Either[String, Vector[CollectorSpec]]](Right(Vector.empty)) {
      case (Left(e), _) => Left(e)
      case (Right(acc), c) =>
        if (!allowed.contains(c.kind)) Left(s"collector '${c.kind}' not allowed")
        else if (c.kind == "top_docs" && (c.limit > 10 || c.offset > 100))
          Left("top_docs limited to limit<=10, offset<=100")
        else if (c.kind == "reservoir_sampling" && c.limit > 10)
          Left("reservoir_sampling limited to limit<=10")
        else Right(acc :+ c)
    }
  }
}
