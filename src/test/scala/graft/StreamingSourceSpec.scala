package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** File streaming source (SURVEY.md §2.1: siddhi-io-file ≈ Spark's
  * built-in directory stream): a REAL `readStream.parquet(dir)` — not the
  * MemoryStream harness — through a windowed aggregation, compared against
  * the batch run of the same combinator. */
class StreamingSourceSpec extends AnyFunSuite {
  import TestSpark._

  /** The events fixture in raw-long shape (`ts` = ns epoch long) — staged
    * through [[graft.engine.Tables.events]] so the tests are agnostic to
    * the fixture's on-disk timestamp encoding (µs TIMESTAMP vs ns-as-long;
    * the driver regenerated the fixtures as TIMESTAMP(MICROS) in round 7). */
  private def rawEvents: org.apache.spark.sql.DataFrame =
    graft.engine.Tables.events(spark, sf)
      .drop("ts").withColumnRenamed("ts_ns", "ts")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")

  test("parquet directory stream: windowed agg equals batch result") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // stage the events table alone in a directory (file sources stream
    // whole directories)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src")
    rawEvents.write.mode("overwrite").parquet(dir.toString)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("tsc", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("tsc"), "1 minute"))
      .agg(round(sum("value"), 2).as("sum_value"), count(lit(1)).as("cnt"))
      .select(unix_millis(col("window.start")).as("w_start_ms"),
        col("sum_value"), col("cnt"))

    val q = agg(spark.readStream.schema(schema).parquet(dir.toString))
      .writeStream.format("memory").queryName("file_src_window")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("file_src_window")
      .orderBy("w_start_ms").collect().toSeq
    val batch = agg(spark.read.schema(schema).parquet(dir.toString))
      .orderBy("w_start_ms").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("deployed SiddhiQL app: pattern NFA state survives a checkpoint " +
       "restart and the live result equals batch replay") {
    // deployAppOn: the same pattern TEXT the batch gate verifies runs as
    // a live flatMapGroupsWithState topology; killing the query between
    // files and restarting from the checkpoint must restore per-key NFA
    // state (runs spanning the restart complete correctly) and re-emit
    // nothing (parquet sink, exactly-once offsets).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcDir = java.nio.file.Files.createTempDirectory("graft_dep_src")
    val outDir = java.nio.file.Files.createTempDirectory("graft_dep_out")
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_dep_ck")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val all = rawEvents
    val splitTs = all.agg(expr("min(ts) + (max(ts) - min(ts)) div 2"))
      .collect()(0).getLong(0)
    all.filter(col("ts") < splitTs).write.parquet(s"$srcDir/f1_a")
    val appText =
      """@info(name = 'alerts')
        |from every e1=events[event_type == 'error']
        |  -> e2=events[event_type == 'purchase' and value > e1.value]
        |  within 5 min
        |select e1.event_id as start_id, e2.event_id as next_id
        |insert into Alerts""".stripMargin
    def runOnce(): Unit = {
      val raw = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$srcDir/f*")
        .withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      val (df, mode, _, _) = graft.api.SiddhiQL.deployAppOn(raw, appText,
        "alerts")
      val q = df.writeStream
        .option("checkpointLocation", ckptDir.toString)
        .format("parquet").option("path", outDir.toString)
        .outputMode(mode)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce() // lifetime 1: some runs stay OPEN in NFA state
    all.filter(col("ts") >= splitTs).write.parquet(s"$srcDir/f2_b")
    runOnce() // lifetime 2: restored state completes spanning runs
    val got = spark.read.parquet(outDir.toString)
      .orderBy("start_id", "next_id").collect().toSeq
    val want = graft.api.SiddhiQL.compile(spark, sf,
      """from every e1=events[event_type == 'error']
        |  -> e2=events[event_type == 'purchase' and value > e1.value]
        |  within 5 min
        |select e1.event_id as start_id, e2.event_id as next_id
        |order by start_id, next_id""".stripMargin).collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("deployed timed absence: per-key NFA + timer state survives a " +
       "checkpoint restart and the live result equals batch replay") {
    // the round-9 timed re-fold (event-time timers for `not X for T`)
    // through kill + restart: pending absence runs and their signature
    // sets live in the state store, so a restart must neither lose a
    // match whose deadline resolves after the restart nor re-emit one
    // already written (parquet sink, exactly-once offsets). The final
    // deadlines resolve via two sentinel files (the standard
    // watermark-flush pair), one trigger each.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcDir = java.nio.file.Files.createTempDirectory("graft_abs_src")
    val outDir = java.nio.file.Files.createTempDirectory("graft_abs_out")
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_abs_ck")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val all = rawEvents
    val splitTs = all.agg(expr("min(ts) + (max(ts) - min(ts)) div 2"))
      .collect()(0).getLong(0)
    all.filter(col("ts") < splitTs).write.parquet(s"$srcDir/f1_a")
    val appText =
      """@info(name = 'alerts')
        |from every e1=events[event_type == 'error']
        |  -> not events[event_type == 'purchase' and
        |     user_id == e1.user_id] for 5 min
        |select e1.user_id as user_id, e1.event_id as event_id
        |insert into Alerts""".stripMargin
    def runOnce(): Unit = {
      val raw = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$srcDir/f*")
        .withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      val (df, mode, _, needsFlush) = graft.api.SiddhiQL.deployAppOn(
        raw, appText, "alerts")
      assert(needsFlush) // the timed stage asks for sentinel flushing
      val q = df.writeStream
        .option("checkpointLocation", ckptDir.toString)
        .format("parquet").option("path", outDir.toString)
        .outputMode(mode)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce() // lifetime 1: pending deadlines stay OPEN in state
    all.filter(col("ts") >= splitTs).write.parquet(s"$srcDir/f2_b")
    runOnce() // lifetime 2: restored runs keep folding
    import spark.implicits._
    Seq((Long.MaxValue - 2, graft.engine.Streaming.FlushNs, -1L,
        "__flush", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$srcDir/f3_s1")
    Seq((Long.MaxValue - 1,
        graft.engine.Streaming.FlushNs + 3600000000000L, -1L,
        "__flush", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$srcDir/f4_s2")
    runOnce() // lifetime 3: sentinels advance the watermark, timers fire
    val got = spark.read.parquet(outDir.toString)
      .orderBy("event_id").collect().toSeq
    val want = graft.api.SiddhiQL.compile(spark, sf,
      """from every e1=events[event_type == 'error']
        |  -> not events[event_type == 'purchase' and
        |     user_id == e1.user_id] for 5 min
        |select e1.user_id as user_id, e1.event_id as event_id
        |order by event_id""".stripMargin).collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("checkpoint recovery: restart resumes exactly-once, no reprocessing") {
    // Siddhi's SnapshotService persistence ≡ Structured Streaming
    // checkpointing (SURVEY §2.7): a query killed between batches must
    // resume from its checkpoint and process each input file exactly once.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcDir = java.nio.file.Files.createTempDirectory("graft_ckpt_src")
    val outDir = java.nio.file.Files.createTempDirectory("graft_ckpt_out")
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_ckpt_st")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // stage the source as two files fed in two separate query lifetimes
    val all = rawEvents
    all.filter(col("event_id") % 2 === 0).write
      .parquet(s"$srcDir/part_a")
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$srcDir/part_*")
        .select("event_id", "user_id", "value")
        .writeStream
        .option("checkpointLocation", ckptDir.toString)
        .format("parquet").option("path", outDir.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce() // lifetime 1: processes part_a, then terminates
    all.filter(col("event_id") % 2 === 1).write
      .parquet(s"$srcDir/part_b")
    runOnce() // lifetime 2: resumes from checkpoint, processes ONLY part_b
    val out = spark.read.parquet(outDir.toString)
    // exactly-once across the restart: every event exactly one output row
    assert(out.count() == all.count())
    assert(out.select("event_id").distinct().count() == all.count())
  }

  test("stateful recovery: window partials survive a restart") {
    // the stronger recovery claim: a windowed aggregation whose PARTIAL
    // state (a window split across the two query lifetimes) must be
    // restored from the checkpoint for the final counts to be right.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcDir = java.nio.file.Files.createTempDirectory("graft_st_src")
    val outDir = java.nio.file.Files.createTempDirectory("graft_st_out")
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_st_ck")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val all = rawEvents
    // split mid-minute so at least one window spans both lifetimes
    val splitTs = all.agg(expr("min(ts) + (max(ts) - min(ts)) div 2"))
      .collect()(0).getLong(0)
    val maxTs = all.agg(max("ts")).collect()(0).getLong(0)
    all.filter(col("ts") < splitTs).write.parquet(s"$srcDir/f1_a")
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$srcDir/f*")
        .withColumn("tsc", timestamp_micros(expr("ts div 1000")))
        .withWatermark("tsc", "0 seconds")
        .groupBy(window(col("tsc"), "1 minute"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sv"))
        .select(unix_millis(col("window.start")).as("w_start_ms"),
          col("cnt"), col("sv"))
        .writeStream
        .option("checkpointLocation", ckptDir.toString)
        .format("parquet").option("path", outDir.toString)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce() // lifetime 1: boundary window stays PARTIAL in state
    all.filter(col("ts") >= splitTs).write.parquet(s"$srcDir/f2_b")
    // two sentinel files: watermark advances after the batch that reads
    // a file, and append-mode eviction happens in the NEXT batch
    val sent = Seq((-1L, maxTs + 600_000_000_000L, -1L, "sentinel", 0.0,
      "{}"), (-2L, maxTs + 1_200_000_000_000L, -1L, "sentinel", 0.0, "{}"))
    import spark.implicits._
    sent.take(1).toDF(schema.fieldNames: _*).write.parquet(s"$srcDir/f3_s")
    sent.drop(1).toDF(schema.fieldNames: _*).write.parquet(s"$srcDir/f4_s")
    runOnce() // lifetime 2: resumes state, completes the boundary window
    val sentinelFloorMs = (maxTs + 600_000_000_000L) / 60_000_000_000L *
      60_000L
    val got = spark.read.parquet(outDir.toString)
      .filter(col("w_start_ms") < sentinelFloorMs)
      .orderBy("w_start_ms").collect().toSeq
    val want = all
      .withColumn("tsc", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("tsc"), "1 minute"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sv"))
      .select(unix_millis(col("window.start")).as("w_start_ms"),
        col("cnt"), col("sv"))
      .orderBy("w_start_ms").collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("custom V2 source: committed offsets survive restart, exactly-once") {
    // Lifetime 1 runs against an upstream whose high-watermark sits at
    // half the log (limitRows); lifetime 2 lifts the cap — the data
    // "arrived" between runs. Restart must resume from the COMMITTED
    // row-position offset in the checkpoint: no batch-1 re-delivery, no
    // gap. This is the Source-SPI recovery contract every transport
    // connector relies on.
    val path = graft.engine.Streaming.stagedEventLog(spark, sf)
    val total = {
      val src = scala.io.Source.fromFile(path)
      try src.getLines().size finally src.close()
    }
    val half = total / 2
    val outDir = java.nio.file.Files.createTempDirectory("graft_v2_out")
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_v2_ck")
    def run(limit: Option[Int]): Unit = {
      val reader = spark.readStream.format("graft")
        .option("path", path)
        .option("rowsPerBatch", math.max(half / 2, 1).toString)
      val q = limit.fold(reader)(n => reader.option("limitRows", n.toString))
        .load()
        .writeStream
        .option("checkpointLocation", ckptDir.toString)
        .format("parquet").option("path", outDir.toString)
        .outputMode("append")
        .start()
      q.processAllAvailable()
      q.stop()
    }
    run(Some(half)) // lifetime 1: two micro-batches up to the watermark
    val ids1 = spark.read.parquet(outDir.toString)
      .select("event_id").collect().map(_.getLong(0))
    assert(ids1.length == half, s"lifetime 1 delivered ${ids1.length}")
    run(None) // lifetime 2: resumes at committed offset, drains the rest
    val idsAll = spark.read.parquet(outDir.toString)
      .select("event_id").collect().map(_.getLong(0))
    assert(idsAll.length == total,
      s"expected $total total rows, got ${idsAll.length} (re-delivery or gap)")
    assert(idsAll.distinct.length == total, "duplicate event delivery")
    val wantIds = graft.engine.Streaming.feedRows(spark, sf)
      .map(_.eventId).toSet
    assert(idsAll.toSet == wantIds, "delivered ids differ from the log")
  }

  test("tcp/socket source: lines stream from a live socket") {
    // the reference's TCP transport analog is Spark's built-in socket
    // source — pinned here against a REAL local socket (server thread
    // writes five lines, the stream must deliver exactly those)
    val server = new java.net.ServerSocket(0)
    val port = server.getLocalPort
    val t = new Thread(() => {
      val sock = server.accept()
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      (1 to 5).foreach(i => out.println(s"evt_$i"))
      out.flush()
      Thread.sleep(30000) // keep the connection open until the test ends
      sock.close()
    })
    t.setDaemon(true)
    t.start()
    val q = spark.readStream.format("socket")
      .option("host", "localhost").option("port", port.toString)
      .load()
      .writeStream.format("memory").queryName("sock_src")
      .outputMode("append").start()
    val deadline = System.currentTimeMillis + 30000
    while (spark.table("sock_src").count() < 5 &&
        System.currentTimeMillis < deadline) Thread.sleep(200)
    q.stop()
    server.close()
    assert(spark.table("sock_src").collect().map(_.getString(0)).toSet ==
      (1 to 5).map(i => s"evt_$i").toSet)
  }

  test("console/log sink: windowed agg streams to console without error") {
    // the reference's log sink analog is writeStream.format("console") —
    // a one-liner by design (SURVEY §2.1); this pins it as a WORKING
    // configuration, not just a documented note. Output goes to stdout;
    // the assertion is that the query starts, processes every batch of
    // the custom V2 source, and finishes cleanly.
    val path = graft.engine.Streaming.stagedEventLog(spark, sf)
    val q = spark.readStream.format("graft")
      .option("path", path).option("rowsPerBatch", "500")
      .load()
      .groupBy("event_type").count()
      .writeStream.format("console")
      .option("numRows", "3").option("truncate", "true")
      .outputMode("complete")
      .start()
    q.processAllAvailable()
    val progress = q.lastProgress
    q.stop()
    assert(progress != null && q.exception.isEmpty,
      s"console sink failed: ${q.exception}")
  }

  test("http collector: duplicate deliveries collapse on the event key, " +
       "scrape replays key-ordered, schema override fails at resolution") {
    val c = new engine.Http.Collector()
    try {
      val uri = s"http://127.0.0.1:${c.port}/ingest"
      engine.Http.postLines(uri, 2)(
        Iterator("3,30,1,error,1.5", "1,10,1,click,0.5"))
      // a retried task re-POSTs its chunk: at-least-once delivery must
      // not double-count (receiver is idempotent on the key)
      engine.Http.postLines(uri, 2)(
        Iterator("3,30,1,error,1.5", "2,20,2,purchase,9.0"))
      assert(c.acceptedCount == 3)
      val got = engine.Http.get(s"http://127.0.0.1:${c.port}/scrape")
      assert(got.linesIterator.toSeq == Seq(
        "1,10,1,click,0.5", "2,20,2,purchase,9.0", "3,30,1,error,1.5"))
    } finally c.stop()
    // graft source: a user schema override is rejected at resolution —
    // Spark itself refuses (no SupportsExternalMetadata), and getTable's
    // own require guards direct SPI calls with the same contract
    val err = intercept[Exception] {
      spark.readStream
        .schema(StructType(Seq(StructField("x", LongType))))
        .format("graft").option("path", "/dev/null").load()
    }
    assert(err.getMessage.contains("does not support user-specified schema"))
    val direct = intercept[IllegalArgumentException] {
      new engine.sources.GraftEventsSource().getTable(
        StructType(Seq(StructField("x", LongType))), Array.empty,
        new java.util.HashMap[String, String]())
    }
    assert(direct.getMessage.contains("fixed schema"))
  }

  test("live Append deployment holds BOUNDED state: aggregation state " +
       "rows are evicted at the watermark horizon, not kept per-bucket") {
    // The scale contract of the Append-mode live design: a deployed
    // timeBatch aggregation must NOT retain one state row per tumbling
    // pane forever (Complete mode's behavior). Feed 120 one-minute
    // windows in time-ordered micro-batches and read the state-operator
    // metrics after each trigger: with the source watermark evicting
    // closed panes, the in-flight state stays within a few windows of
    // the watermark horizon while the sink keeps ACCUMULATING emitted
    // panes — bounded state, unbounded output, the long-running-stream
    // requirement.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[engine.Cep.Ev]
    val src = ms.toDF()
      .select(col("eventId").as("event_id"), col("tsNs").as("ts_ns"),
        col("userId").as("user_id"), col("eventType").as("event_type"),
        col("value"))
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
    val app =
      """@info(name = 'm')
        |from events#window.timeBatch(1 min)
        |select count() as n, math:round(sum(value), 2) as total
        |insert into Out""".stripMargin
    val (df, mode, _, needsFlush) =
      graft.api.SiddhiQL.deployAppOn(src, app, "m")
    assert(mode == org.apache.spark.sql.streaming.OutputMode.Append())
    assert(needsFlush)
    val q = df.writeStream.format("memory").queryName("bounded_state")
      .outputMode(mode).start()
    // 10 events per minute for 120 minutes, one micro-batch per 10 min
    val evs = (0 until 1200).map { i =>
      engine.Cep.Ev(i.toLong, i * 6000000000L, i % 7L, "e", 1.0)
    }
    var maxState = 0L
    evs.grouped(100).foreach { g =>
      ms.addData(g); q.processAllAvailable()
      val p = q.lastProgress
      if (p != null && p.stateOperators.nonEmpty)
        maxState = math.max(maxState, p.stateOperators(0).numRowsTotal)
    }
    q.stop()
    // 120 panes processed; Complete mode would hold >= 110 state rows
    // by the last trigger. The watermark design keeps only the panes
    // the 1-minute horizon hasn't closed (plus the in-flight batch).
    assert(maxState <= 15, s"state grew unbounded: $maxState rows")
    assert(spark.table("bounded_state").count() >= 100,
      "closed panes must have been emitted to the sink")
  }
}
