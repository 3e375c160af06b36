package graft
object JoinAggProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.engine.SqlGate.queries("sql_app_join_agg_live")(
      spark, "/root/testdata/sf0.001")
    df.show(10, false)
    println("ROWS=" + df.count())
  }
}
