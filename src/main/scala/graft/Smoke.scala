package graft

import org.apache.spark.sql.SparkSession

/** Local stand-in for the driver's t1 smoke gate: SparkEntry.entry
  * must return >0 rows on sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"""{"smoke_rows":$n}""")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
