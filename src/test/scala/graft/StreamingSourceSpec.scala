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

  test("parquet directory stream: windowed agg equals batch result") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // stage the events table alone in a directory (file sources stream
    // whole directories)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
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
}
