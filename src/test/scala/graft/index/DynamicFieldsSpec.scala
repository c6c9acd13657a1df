package graft.index

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class DynamicFieldsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("page-rank quantization buckets match the reference thresholds") {
    val vals = Seq(0.0, 0.159, 0.16, 0.18, 0.21, 0.25, 0.32, 0.43, 0.65, 2.0)
    val got = vals.toDF("page_rank")
      .select(DynamicFields.quantizePageRank($"page_rank")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 7L))
    // inverse lookup (iqpr) is consistent with the quantizer's bucket count
    assert(graft.search.Collectors.EvalExpr
      .compile("iqpr(7)", Map.empty) != null)
  }

  test("apply: auto id, updated_at, mapped fields") {
    val df = Seq(
      (Some("k1"), 0.2, "x"),
      (None, 0.7, "y")
    ).toDF("id", "page_rank", "payload")
    val out = DynamicFields.apply(df, idField = Some("id"),
      mappedFields = Seq(("payload", "extra")), nowEpochSecs = Some(1234L))
    val rows = out.orderBy("payload").collect()
    assert(rows(0).getAs[String]("id") == "k1")
    val auto = rows(1).getAs[String]("id")
    assert(auto != null && auto.length == 16 && auto.matches("[0-9a-z]+"))
    assert(rows.forall(_.getAs[Long]("updated_at") == 1234L))
    assert(rows.map(_.getAs[String]("extra")).toSeq == Seq("x", "y"))
    assert(rows(0).getAs[Long]("quantized_page_rank") == 2L)
    assert(rows(1).getAs[Long]("quantized_page_rank") == 7L)
    // determinism: same content → same auto id
    val again = DynamicFields.apply(df, Some("id"), Seq(("payload", "extra")), Some(1234L))
      .orderBy("payload").collect()(1).getAs[String]("id")
    assert(again == auto)
  }

  test("public api limits") {
    import PublicApiLimits._
    assert(validate(Seq(CollectorSpec("top_docs", 10, 0))).isRight)
    assert(validate(Seq(CollectorSpec("top_docs", 11, 0))).isLeft)
    assert(validate(Seq(CollectorSpec("top_docs", 5, 101))).isLeft)
    assert(validate(Seq(CollectorSpec("facet"))).isLeft)
    assert(validate(Seq(
      CollectorSpec("count"), CollectorSpec("reservoir_sampling", 10))).isRight)
    assert(validate(Seq(
      CollectorSpec("count"), CollectorSpec("count"), CollectorSpec("count"))).isLeft)
    assert(validate(Seq(CollectorSpec("reservoir_sampling", 11))).isLeft)
  }
}
