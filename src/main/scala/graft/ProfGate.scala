package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Job-census profiler for one registry query (round 13): runs it
  * twice (warm, then measured) under a job listener and prints wall vs
  * total Spark-job time vs the gap — the gap is driver/streaming
  * machinery (trigger scheduling, state-store commits), which is what
  * the live-gate family's cost is made of. Used to pick the r13
  * fold-runner concurrency lever (a fold gate = ~35 sequential ~100 ms
  * jobs; job time > wall after the change proves the overlap).
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProfGate <query>" */
object ProfGate {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("sql_app_enrich_log_live")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("graft.live.fastGates", "true")
    @volatile var jobs = 0
    @volatile var jobMs = 0L
    val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1; starts(j.jobId) = j.time
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach(t0 => jobMs += (j.time - t0))
    })
    // warm once
    SparkEntry.queries(name)(spark, sfDir).count()
    jobs = 0; jobMs = 0
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e6
    Thread.sleep(500)
    println(f"PROF $name wall=${wall}%.0fms jobs=$jobs jobMs=$jobMs " +
      f"gap=${wall - jobMs}%.0fms")
    spark.stop()
  }
}
