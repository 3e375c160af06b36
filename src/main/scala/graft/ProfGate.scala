package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Job-census profiler for registry queries (round 13, widened round
  * 14): runs each named query twice (warm, then measured) under a job
  * listener and prints wall vs total Spark-job time vs the gap — the
  * gap is driver/streaming machinery (trigger scheduling, state-store
  * commits), which is what the live-gate family's cost is made of.
  * Used to pick the r13 fold-runner concurrency lever (a fold gate =
  * ~35 sequential ~100 ms jobs; job time > wall after the change
  * proves the overlap) and the r14 suite-cost levers.
  *
  * Counters are atomics: correct even if listener-bus dispatch ever
  * becomes multi-threaded (today it is single-threaded; the atomics
  * cost nothing and remove the assumption).
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProfGate <q1> [q2 ...]" */
object ProfGate {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args.toSeq else Seq("sql_app_enrich_log_live")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("graft.live.fastGates", "true")
    // A/B hook for the live-replay shuffle width (see deployApp)
    sys.env.get("SPARK_GRAFT_LIVE_PARTS").foreach(p =>
      spark.conf.set("graft.live.shufflePartitions", p))
    val jobs = new AtomicInteger(0)
    val jobMs = new AtomicLong(0L)
    val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
    // per-call-site census (ms, count) — names the jobs a trigger runs
    val sites = scala.collection.concurrent
      .TrieMap.empty[String, (Long, Int)]
    val siteOf = scala.collection.concurrent.TrieMap.empty[Int, String]
    // per-site STAGE census (r18): a fold write job at toy SF is a chain
    // of tiny stages — stage count × fixed per-stage latency IS the job
    // cost, so the lever hunt needs stages-per-site, not just jobs
    val siteStages = scala.collection.concurrent
      .TrieMap.empty[String, (Int, Long)]
    val stageSite = scala.collection.concurrent.TrieMap.empty[Int, String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); starts(j.jobId) = j.time
        val cs = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("?")
        siteOf(j.jobId) = cs
        j.stageIds.foreach(sid => stageSite(sid) = cs)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { t0 =>
          jobMs.addAndGet(j.time - t0)
          val cs = siteOf.remove(j.jobId).getOrElse("?")
          val (ms, n) = sites.getOrElse(cs, (0L, 0))
          sites(cs) = (ms + (j.time - t0), n + 1)
        }
      override def onStageCompleted(
          s: SparkListenerStageCompleted): Unit = {
        val cs = stageSite.getOrElse(s.stageInfo.stageId, "?")
        val ms = (for {
          t0 <- s.stageInfo.submissionTime
          t1 <- s.stageInfo.completionTime
        } yield t1 - t0).getOrElse(0L)
        val (n, acc) = siteStages.getOrElse(cs, (0, 0L))
        siteStages(cs) = (n + 1, acc + ms)
        if (sys.env.contains("SPARK_GRAFT_PROF_STAGES"))
          println(s"  STG $cs id=${s.stageInfo.stageId} ms=$ms " +
            s"tasks=${s.stageInfo.numTasks} ${s.stageInfo.name.take(70)}")
      }
    })
    names.foreach { name =>
      // warm once per query (JIT + plan caches), measure the second run
      SparkEntry.queries(name)(spark, sfDir).count()
      jobs.set(0); jobMs.set(0L); sites.clear(); siteStages.clear()
      val phases = scala.collection.mutable.Buffer.empty[(String, Long)]
      graft.api.SiddhiQL.deployPhaseProbe = Some(phases)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e6
      graft.api.SiddhiQL.deployPhaseProbe = None
      Thread.sleep(500)
      val ph =
        if (phases.isEmpty) ""
        else phases.map { case (t, ms) => s"$t=${ms}ms" }
          .mkString(" phases[", " ", "]")
      println(f"PROF $name wall=${wall}%.0fms jobs=${jobs.get} " +
        f"jobMs=${jobMs.get} gap=${wall - jobMs.get}%.0fms" + ph)
      sites.toSeq.sortBy(-_._2._1).take(8).foreach {
        case (cs, (ms, n)) =>
          val (sn, sms) = siteStages.getOrElse(cs, (0, 0L))
          println(s"  SITE $cs n=$n ms=$ms stages=$sn stageMs=$sms")
      }
    }
    spark.stop()
  }
}
