package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central loaders for the driver parquet fixtures (TESTDATA.md).
  *
  * Siddhi analog: `define stream` / `define table` declarations with fixed,
  * explicit schemas — reference: siddhi-io/siddhi
  * `modules/siddhi-query-api/.../definition/StreamDefinition.java` /
  * `TableDefinition.java` (SURVEY.md §1.1; `/root/reference` is empty this
  * session, so citations are public-repo path granularity, [unverified]).
  *
  * Scale notes (100 TB design):
  *   - All loaders return plain parquet scans — column pruning and predicate
  *     pushdown reach the scan because nothing here materializes or caches.
  *   - `events` converts the raw TIMESTAMP(NANOS) column (which Spark's
  *     parquet reader rejects outright) by reading nanos as long
  *     (`spark.sql.legacy.parquet.nanosAsLong`) and deriving a µs-precision
  *     TimestampType column with integral arithmetic (no double round-trip —
  *     ns epochs exceed the 53-bit double mantissa).
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")

  /** The stream table. `ts` becomes TimestampType (µs); `ts_ns` keeps the
    * nanosecond epoch as a long for exact integral arithmetic (ns epochs
    * exceed the 53-bit double mantissa, so no double round-trips anywhere).
    * Matches DuckDB semantics: `epoch_ms(ts)` there == `unix_millis(ts)`
    * here and `epoch_ns(ts)` there == `ts_ns` here (both floor positive
    * epochs).
    *
    * Handles both fixture generations: TIMESTAMP(MICROS) files (read as
    * TIMESTAMP_NTZ — reinterpreted in the UTC session zone, the driver
    * contract) and TIMESTAMP(NANOS)/raw-long files (read as LongType via
    * `nanosAsLong`). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // MICROS-generation fixtures decode as TIMESTAMP_NTZ and the cast to
    // TimestampType reinterprets in the SESSION zone — the ts/ts_ns
    // contract (epoch_ms/epoch_ns parity with the DuckDB oracle) is only
    // well-defined under UTC, so the loader enforces it itself rather
    // than trusting every caller's JVM/session configuration (ADVICE r7)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
    }
  }
}
