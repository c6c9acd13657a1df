package graft
import org.apache.spark.sql.SparkSession
import graft.search._
import graft.index.IndexSchema
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val idx = args(0)
    val s = new Searcher(new IndexReader(spark, idx), IndexSchema.pages)
    val df = s.topDocs(TermQuery("text","body42"), 10)
    df.explain("formatted")
    val t0=System.nanoTime(); df.collect(); println("time1 " + (System.nanoTime()-t0)/1e9)
    val t1=System.nanoTime(); s.topDocs(TermQuery("text","body42"), 10).collect(); println("time2 " + (System.nanoTime()-t1)/1e9)
    spark.stop()
  }
}
