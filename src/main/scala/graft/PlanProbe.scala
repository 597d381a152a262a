package graft
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("q_catalog_worklist", "q_pricing_summary", "q_revenue_by_region",
                     "q_text_stats", "q_dedup_exact", "q_knn_exact", "q_events_tumbling")) {
      val df = SparkEntry.queries(name)(spark, dir)
      println(s"===== $name =====")
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
