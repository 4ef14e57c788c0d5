package graft
import org.apache.spark.sql.SparkSession

/** One-off diagnostic for VERDICT r10 item 3: run q214 at a given sfDir
  * under the exact Bench session config, print the timing and the FINAL
  * (post-AQE) executed plan, so the 10× exponent drift can be attributed
  * to a plan change or to measurement noise. Not part of the contract
  * surface; removed once the analysis lands in ROUND11.md. */
object Q214Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.graft.shareLeaves", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(): Long = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      val t0 = System.nanoTime()
      operators.Corpus.q214NoveltyByQuality(spark, sfDir)
        .queryExecution.toRdd.count(): Unit
      System.nanoTime() - t0
    }
    once(): Unit // warmup
    val times = (1 to 3).map(_ => once())
    println(f"Q214_SECONDS=${times.min / 1e9}%.2f (all: ${times.map(t => f"${t / 1e9}%.2f").mkString(", ")})")
    val df = operators.Corpus.q214NoveltyByQuality(spark, sfDir)
    df.queryExecution.toRdd.count(): Unit
    println("=== FINAL PLAN ===")
    println(df.queryExecution.executedPlan.toString)
  }
}
