package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Coverage for the remaining SURVEY.md §2 inventory rows: payload
  * mappers (§2.1), cron/timeLength windows (§2.3), named shared windows
  * (§1.1), K-slack reorder (§2.7).
  *
  * Siddhi analogs [unverified public-repo paths; /root/reference empty]:
  * `siddhi-map-json` (JsonSourceMapper/JsonSinkMapper), `siddhi-map-csv`,
  * `core/query/processor/stream/window/{CronWindowProcessor,
  * TimeLengthWindowProcessor}.java`, `core/window/Window.java` (named
  * windows), `siddhi-execution-reorder` (KSlackExtension).
  */
object Extras {
  import Tables._
  type Q = (SparkSession, String) => DataFrame

  /** mapper_json_roundtrip: sink-map rows to JSON (`@sink @map(json)`),
    * then source-map back through the declared schema (`@source
    * @map(json)`) — from_json/to_json are the engine's mapper pair. */
  def jsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    events(s, d)
      .select(to_json(struct(col("event_id"), col("event_type"),
        col("value"))).as("payload"))
      .select(from_json(col("payload"), schema).as("e"))
      .select(col("e.event_id").as("event_id"),
        col("e.event_type").as("event_type"),
        round(col("e.value"), 2).as("value"))
      .orderBy("event_id")
  }

  /** mapper_csv_roundtrip: text/CSV mapper pair via concat_ws + from_csv. */
  def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    events(s, d)
      .select(col("event_id").as("orig_id"),
        concat_ws(",", col("event_id"), col("user_id"), col("event_type"))
          .as("line"))
      .select(col("orig_id"),
        from_csv(col("line"), StructType(Seq(
          StructField("event_id", LongType), StructField("user_id", LongType),
          StructField("event_type", StringType))),
          Map.empty[String, String]).as("e"))
      .select(col("e.event_id").as("event_id"),
        col("e.user_id").as("user_id"), col("e.event_type").as("event_type"))
      .orderBy("event_id")
  }

  /** mapper_xml_roundtrip: `@map(xml)` source/sink pair — Spark 4's
    * native to_xml/from_xml (no external connector): sink-map rows to an
    * XML fragment, source-map back through the declared schema. The
    * double `value` survives the text round-trip exactly (shortest-
    * representation printing), the same guarantee the JSON mapper shows. */
  def xmlRoundtrip(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    events(s, d)
      .select(to_xml(struct(col("event_id"), col("event_type"),
        col("value"))).as("payload"))
      .select(from_xml(col("payload"), schema).as("e"))
      .select(col("e.event_id").as("event_id"),
        col("e.event_type").as("event_type"),
        round(col("e.value"), 2).as("value"))
      .orderBy("event_id")
  }

  /** sink_partitioned_roundtrip: the parquet SINK path with Hive-style
    * partition layout (`@sink` ≡ `df.write.partitionBy(...)`): write the
    * stream partitioned by event_type, read the directory tree back, and
    * aggregate per partition — proving the round trip AND the layout that
    * makes 100 TB reads prunable (a consumer filtering one event_type
    * touches one subdirectory, not the full corpus). */
  def partitionedSinkRoundtrip(s: SparkSession, d: String): DataFrame = {
    val tmp = Streaming.scratchDir("graft_part_sink")
    events(s, d).select(col("event_id"), col("event_type"), col("value"))
      .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
    s.read.parquet(tmp).groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"),
        min("event_id").as("min_id"), max("event_id").as("max_id"))
      .orderBy("event_type")
  }

  /** window_cron: `#window.cron('0 0/15 * * * ?')` — contents emitted on
    * 15-minute marks ⇒ aggregation per cron-aligned bucket. */
  def cronWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "15 minutes"))
      .agg(count(lit(1)).as("n"), round(avg("value"), 6).as("avg_value"))
      .select(unix_millis(col("window.start")).as("cron_tick_ms"),
        col("n"), col("avg_value"))
      .orderBy("cron_tick_ms")

  /** window_timelength: `#window.timeLength(2 min, 10)` — the window holds
    * at most 10 events, evicting those older than 2 minutes; occupancy at
    * each event = least(#within-2min, 10). */
  def timeLength(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ns")
      .rangeBetween(-120L * 1000 * 1000 * 1000, 0)
    events(s, d)
      .select(col("event_id"), col("user_id"),
        least(count(lit(1)).over(w), lit(10L)).as("n_in_window"))
      .orderBy("event_id")
  }

  /** named_window_shared: `define window W(...) timeBatch(1 hour)` with two
    * consumer queries — the shared windowed relation is computed once
    * (cached) and feeds both aggregations (Siddhi's StreamJunction fan-out
    * ≡ a reused DataFrame). */
  def namedWindowShared(s: SparkSession, d: String): DataFrame = {
    val shared = events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"),
        col("user_id"))
      .agg(sum("value").as("v"), count(lit(1)).as("n"))
      .cache() // the named window, shared by both consumers
    val byType = shared.groupBy("event_type")
      .agg(round(sum("v"), 2).as("metric"))
      .select(lit("by_type").as("consumer"), col("event_type").as("key"),
        col("metric"))
    val topUsers = shared.groupBy("user_id")
      .agg(sum("n").as("cnt"))
      .filter(col("cnt") >= 80)
      .select(lit("busy_user").as("consumer"),
        col("user_id").cast("string").as("key"),
        col("cnt").cast("double").as("metric"))
    val res = byType.unionByName(topUsers).orderBy("consumer", "key")
      .localCheckpoint() // both consumers have read the window: free it
    shared.unpersist()
    res
  }

  /** reorder_kslack: `reorder:kslack(ts)` — emit the per-key stream in
    * corrected event-time order with its resequenced index (batch analog:
    * the slack buffer converges to a full per-key sort). */
  def kslackReorder(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    events(s, d)
      .select(col("event_id"), col("user_id"),
        row_number().over(w).as("seq_idx"))
      .orderBy("user_id", "seq_idx")
  }

  /** window_expression: `#window.expression('count() < 10 and sum(value)
    * < 800')` — retain-while-predicate window: on each arrival, evict from
    * the front until the retention expression holds again; emit the
    * occupancy and retained sum per event.
    *
    * Values are handled as exact integer cents (`round(value*100)`) so the
    * running add/evict sum is drift-free and the DuckDB oracle reproduces
    * it exactly: with non-negative values the front pointer has the closed
    * form `max(rn-8, min f with P[f-1] > P[rn]-80000)` over per-key prefix
    * sums P — a window-function formulation, no procedural state needed. */
  def expressionWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .select(col("event_id").as("eventId"), col("ts_ns").as("tsNs"),
        col("user_id").as("userId"), col("event_type").as("eventType"),
        col("value"))
      .as[Cep.Ev]
      .groupByKey(_.userId)
      .flatMapGroups { (uid, it) =>
        val buf = scala.collection.mutable.Queue.empty[Long]
        var sum = 0L
        it.toVector.sortBy(e => (e.tsNs, e.eventId)).map { e =>
          val cents = math.round(e.value * 100)
          buf.enqueue(cents); sum += cents
          while (buf.length >= 10 || sum >= 80000L) {
            sum -= buf.dequeue()
          }
          (e.eventId, uid, buf.length.toLong, sum)
        }
      }
      .toDF("event_id", "user_id", "occupancy", "retained_cents")
      .orderBy("event_id")
  }

  /** order by + limit + offset (§2.9: Siddhi `limit`/`offset` clauses). */
  def orderLimitOffset(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("user_id")
      .agg(round(sum("value"), 2).as("total_value"))
      .orderBy(col("total_value").desc, col("user_id"))
      .offset(5).limit(10)

  /** markov: (siddhi-execution-markov) — first-order transition matrix of
    * event types per user stream: P(next | current) from lag pairs. One
    * window pass + one hash aggregation. */
  def markovTransitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    events(s, d)
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n") /
        sum("n").over(Window.partitionBy("event_type")), 6))
      .orderBy("event_type", "next_type")
  }

  /** sentiment: (siddhi-execution-sentiment) — lexicon hit-count score
    * over the token stream (positive - negative occurrences). */
  def sentimentScore(s: SparkSession, d: String): DataFrame = {
    val pos = "('fast', 'value', 'merge')"
    val neg = "('slow', 'error', 'skew')"
    documents(s, d).select(
      col("doc_id"),
      expr(s"size(filter(split(text, ' '), t -> t in $pos))").as("n_pos"),
      expr(s"size(filter(split(text, ' '), t -> t in $neg))").as("n_neg"))
      .withColumn("sentiment", col("n_pos") - col("n_neg"))
      .orderBy("doc_id")
  }

  /** mapper_binary_roundtrip: the `siddhi-map-binary` shape — string →
    * UTF-8 bytes → base64 wire form → back; payload sizing in bytes
    * (BinaryType end-to-end through codegen'd expressions). */
  def binaryRoundtrip(s: SparkSession, d: String): DataFrame =
    events(s, d).select(
      col("event_id"),
      base64(encode(col("event_type"), "UTF-8")).as("b64"),
      decode(unbase64(base64(encode(col("event_type"), "UTF-8"))), "UTF-8")
        .as("roundtrip"),
      length(encode(col("props"), "UTF-8")).as("payload_bytes"))
      .orderBy("event_id")

  /** mapper_avro_roundtrip: the `siddhi-map-avro` shape — each event row
    * serializes to Avro BINARY (GenericRecord against an explicit record
    * schema, binary encoder) and decodes back; output carries the decoded
    * fields plus the wire size. The spark-avro CONNECTOR is absent from
    * this container, but the mapper SPI needs only avro-core, which Spark
    * itself ships. Typed mapPartitions kernel with per-partition init
    * (one writer/reader/buffer reused across the partition, encoder
    * object recycled) — the serde batching shape every mapper needs at
    * 100 TB. The oracle reproduces the exact wire size from Avro's
    * zigzag-varint spec, so the gate checks the FORMAT, not just the
    * roundtrip identity. */
  def avroRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
      .as[(Long, Long, String, Double)]
      .mapPartitions { it =>
        import org.apache.avro.Schema
        import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
        import org.apache.avro.io.{BinaryEncoder, DecoderFactory, EncoderFactory}
        val schema = new Schema.Parser().parse(
          """{"type":"record","name":"Ev","fields":[
            |{"name":"event_id","type":"long"},
            |{"name":"user_id","type":"long"},
            |{"name":"event_type","type":"string"},
            |{"name":"value","type":"double"}]}""".stripMargin)
        val writer = new GenericDatumWriter[GenericRecord](schema)
        val reader = new GenericDatumReader[GenericRecord](schema)
        val baos = new java.io.ByteArrayOutputStream()
        var enc: BinaryEncoder = null
        it.map { case (id, uid, typ, v) =>
          baos.reset()
          enc = EncoderFactory.get().binaryEncoder(baos, enc)
          val rec = new GenericData.Record(schema)
          rec.put("event_id", id); rec.put("user_id", uid)
          rec.put("event_type", typ); rec.put("value", v)
          writer.write(rec, enc); enc.flush()
          val bytes = baos.toByteArray
          val back = reader.read(null,
            DecoderFactory.get().binaryDecoder(bytes, null))
          (id, bytes.length.toLong, back.get("event_type").toString,
            back.get("value").asInstanceOf[Double],
            back.get("user_id").asInstanceOf[Long])
        }
      }
      .toDF("event_id", "avro_bytes", "rt_type", "rt_value", "rt_user")
      .orderBy("event_id")
  }

  val queries: Map[String, Q] = Map(
    "mapper_avro_roundtrip" -> (avroRoundtrip _),
    "mapper_xml_roundtrip"  -> (xmlRoundtrip _),
    "sink_partitioned_roundtrip" -> (partitionedSinkRoundtrip _),
    "mapper_binary_roundtrip" -> (binaryRoundtrip _),
    "markov_transitions"    -> (markovTransitions _),
    "text_sentiment"        -> (sentimentScore _),
    "window_expression"     -> (expressionWindow _),
    "agg_order_limit_offset" -> (orderLimitOffset _),
    "mapper_json_roundtrip" -> (jsonRoundtrip _),
    "mapper_csv_roundtrip"  -> (csvRoundtrip _),
    "window_cron"           -> (cronWindow _),
    "window_timelength"     -> (timeLength _),
    "named_window_shared"   -> (namedWindowShared _),
    "reorder_kslack"        -> (kslackReorder _)
  )

  val oracle: Map[String, String] = Map(
    // wire size from the Avro spec: zigzag-varint(long) per id field
    // (zigzag(n) = 2n for n ≥ 0; varint = 7 bits/byte), varint(strlen) +
    // utf8 bytes for the string (types here are short ASCII → 1-byte
    // length), fixed 8 bytes for the double
    "mapper_avro_roundtrip" ->
      """WITH vl AS (
        |  SELECT event_id, user_id, event_type, value,
        |    (CASE WHEN 2*event_id < 128 THEN 1
        |          WHEN 2*event_id < 16384 THEN 2
        |          WHEN 2*event_id < 2097152 THEN 3
        |          WHEN 2*event_id < 268435456 THEN 4 ELSE 5 END) +
        |    (CASE WHEN 2*user_id < 128 THEN 1
        |          WHEN 2*user_id < 16384 THEN 2
        |          WHEN 2*user_id < 2097152 THEN 3
        |          WHEN 2*user_id < 268435456 THEN 4 ELSE 5 END) +
        |    1 + octet_length(encode(event_type)) + 8 AS nb
        |  FROM events)
        |SELECT event_id, CAST(nb AS BIGINT) AS avro_bytes,
        |  event_type AS rt_type, value AS rt_value, user_id AS rt_user
        |FROM vl ORDER BY event_id""".stripMargin,
    "markov_transitions" ->
      """WITH pairs AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |c AS (SELECT event_type, next_type, count(*) AS n FROM pairs
        |  WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, next_type, n,
        |  round(n / sum(n) OVER (PARTITION BY event_type), 6) AS p
        |FROM c ORDER BY event_type, next_type""".stripMargin,
    "text_sentiment" ->
      """SELECT doc_id,
        |  len(list_filter(str_split(text, ' '),
        |    t -> t IN ('fast', 'value', 'merge'))) AS n_pos,
        |  len(list_filter(str_split(text, ' '),
        |    t -> t IN ('slow', 'error', 'skew'))) AS n_neg,
        |  len(list_filter(str_split(text, ' '),
        |    t -> t IN ('fast', 'value', 'merge'))) -
        |  len(list_filter(str_split(text, ' '),
        |    t -> t IN ('slow', 'error', 'skew'))) AS sentiment
        |FROM documents ORDER BY doc_id""".stripMargin,
    // window_expression: closed form of the retain-while eviction — with
    // non-negative integer-cent values, the post-eviction front pointer is
    // max(rn-8, smallest f with P[f-1] > P[rn]-80000) over per-key prefix
    // sums (both constraint sets upward-closed, thresholds monotone in rn,
    // so the greedy one-at-a-time eviction reaches exactly this front)
    "window_expression" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    row_number() OVER w AS rn,
        |    sum(CAST(round(value * 100) AS BIGINT))
        |      OVER (w ROWS UNBOUNDED PRECEDING) AS p
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |pref AS (
        |  SELECT user_id, rn AS j, p FROM e
        |  UNION ALL
        |  SELECT DISTINCT user_id, 0, 0 FROM e),
        |f AS (
        |  SELECT a.user_id, a.event_id, a.rn, a.p,
        |    count(*) FILTER (WHERE b.p <= a.p - 80000) AS n_fail
        |  FROM e a JOIN pref b ON a.user_id = b.user_id AND b.j < a.rn
        |  GROUP BY 1, 2, 3, 4),
        |g AS (
        |  SELECT user_id, event_id, rn, p,
        |    greatest(rn - 8, 1 + n_fail) AS front
        |  FROM f)
        |SELECT g.event_id, g.user_id,
        |  CAST(g.rn - g.front + 1 AS BIGINT) AS occupancy,
        |  CAST(g.p - pb.p AS BIGINT) AS retained_cents
        |FROM g JOIN pref pb ON pb.user_id = g.user_id
        |  AND pb.j = g.front - 1
        |ORDER BY g.event_id""".stripMargin,
    "agg_order_limit_offset" ->
      """SELECT user_id, round(sum(value), 2) AS total_value
        |FROM events GROUP BY user_id
        |ORDER BY total_value DESC, user_id LIMIT 10 OFFSET 5""".stripMargin,
    "mapper_json_roundtrip" ->
      """SELECT event_id, event_type, round(value, 2) AS value
        |FROM events ORDER BY event_id""".stripMargin,
    "mapper_xml_roundtrip" ->
      """SELECT event_id, event_type, round(value, 2) AS value
        |FROM events ORDER BY event_id""".stripMargin,
    "sink_partitioned_roundtrip" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value,
        |  min(event_id) AS min_id, max(event_id) AS max_id
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "mapper_binary_roundtrip" ->
      """SELECT event_id,
        |  to_base64(encode(event_type)) AS b64,
        |  event_type AS roundtrip,
        |  octet_length(encode(props)) AS payload_bytes
        |FROM events ORDER BY event_id""".stripMargin,
    "mapper_csv_roundtrip" ->
      """SELECT event_id, user_id, event_type FROM events
        |ORDER BY event_id""".stripMargin,
    "window_cron" ->
      """SELECT epoch_ms(ts) // 900000 * 900000 AS cron_tick_ms,
        |  count(*) AS n, round(avg(value), 6) AS avg_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "window_timelength" ->
      """SELECT event_id, user_id,
        |  least(count(*) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)
        |    RANGE BETWEEN 120000000000 PRECEDING AND CURRENT ROW),
        |    10) AS n_in_window
        |FROM events ORDER BY event_id""".stripMargin,
    "named_window_shared" ->
      """WITH shared AS (
        |  SELECT event_type, user_id, sum(value) AS v, count(*) AS n
        |  FROM events
        |  GROUP BY epoch_ms(ts) // 3600000, event_type, user_id)
        |SELECT 'busy_user' AS consumer, CAST(user_id AS VARCHAR) AS key,
        |  CAST(sum(n) AS DOUBLE) AS metric
        |FROM shared GROUP BY user_id HAVING sum(n) >= 80
        |UNION ALL
        |SELECT 'by_type', event_type, round(sum(v), 2) FROM shared
        |GROUP BY event_type
        |ORDER BY consumer, key""".stripMargin,
    "reorder_kslack" ->
      """SELECT event_id, user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS seq_idx
        |FROM events ORDER BY user_id, seq_idx""".stripMargin
  )
}
