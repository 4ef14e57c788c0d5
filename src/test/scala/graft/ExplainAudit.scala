package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- sys.env.get("AUDIT_QUERIES").map(_.split(",").toSeq).getOrElse(
           Seq("q07_keyset_page", "q11_fk_join", "q17_search_predicate", "q32_ann_brute"))) {
      println(s"=== $q ===")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
