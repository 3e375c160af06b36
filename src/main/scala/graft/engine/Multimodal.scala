package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (beyond-reference ops; builder brief):
  * image/audio/video as opaque `binary` payloads with typed metadata,
  * decode / feature-extract / frame-sample as per-partition batch
  * operators.
  *
  * The decode step is a STUB — no image/audio codecs exist in this
  * container — replaced by a deterministic byte-level fake (documented at
  * each site). Everything around it is the real Spark plumbing this
  * pipeline needs at 100 TB:
  *   - explicit schema: (id, kind, width, height, payload binary)
  *   - `mapPartitions` over a typed Dataset — the Scala analog of
  *     `mapInPandas`: one iterator per partition, batch-shaped, no
  *     per-row UDF dispatch, decoder init amortized per partition
  *   - feature rows come back as a typed Dataset with a fixed schema so
  *     Catalyst can prune/pushdown around the opaque stage
  *
  * Scale notes: payloads stay distributed (no collect); the stage is
  * narrow (no shuffle) and composes with the dedup/similarity stages
  * downstream. Real deployments swap `stubDecode` for a JNI/codec call
  * with identical signature.
  */
object Multimodal {
  import Tables._
  type Q = (SparkSession, String) => DataFrame

  /** Typed multimodal record: binary payload + metadata columns. */
  case class MmRec(doc_id: Long, kind: String, width: Int, height: Int,
                   payload: Array[Byte])

  /** Extracted features (fixed schema back into Catalyst-land). */
  case class MmFeat(doc_id: Long, kind: String, n_bytes: Int, byte_sum: Long,
                    first_byte: Int, n_frames: Int, mean_sampled: Double)

  /** STUB decoder: a real implementation would decode the codec here
    * (JPEG/PNG/PCM/H.264). This deterministic fake derives features
    * directly from payload bytes so tests/oracles are exact. */
  private def stubDecode(r: MmRec): MmFeat = {
    val bytes = r.payload
    val byteSum = bytes.foldLeft(0L)((acc, b) => acc + (b & 0xff))
    // "frame sampling": every 16th byte is one fake frame
    val sampled = bytes.indices.by(16).map(i => bytes(i) & 0xff)
    MmFeat(r.doc_id, r.kind, bytes.length, byteSum,
      if (bytes.nonEmpty) bytes(0) & 0xff else -1,
      sampled.length,
      if (sampled.nonEmpty)
        BigDecimal(sampled.sum.toDouble / sampled.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      else -1.0)
  }

  /** The multimodal dataset: documents' text bytes stand in for media
    * payloads; kind/width/height are derived metadata. */
  def records(s: SparkSession, d: String): Dataset[MmRec] = {
    import s.implicits._
    documents(s, d).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      ((col("n_chars") % 64) + 1).cast("int").as("width"),
      lit(32).as("height"),
      encode(col("text"), "UTF-8").as("payload")
    ).as[MmRec]
  }

  /** mm_decode_features: schema → binary payload → per-partition batch
    * decode (stub) → typed feature rows. */
  def decodeFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    records(s, d)
      .mapPartitions(_.map(stubDecode)) // batch-shaped; decoder per partition
      .toDF()
      .orderBy("doc_id")
  }

  /** mm_frame_sample: frame sampling as a 1→N operator — every "video"
    * payload explodes into one row per sampled frame (stride 16; a real
    * codec would seek keyframes at the same call site). Typed flatMap =
    * the Spark UDTF shape; stays narrow, no shuffle. */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    records(s, d)
      .filter(_.kind == "video")
      .flatMap { r =>
        r.payload.indices.by(16).zipWithIndex.map { case (off, i) =>
          (r.doc_id, i.toLong, off.toLong, (r.payload(off) & 0xff).toLong)
        }
      }
      .toDF("doc_id", "frame_no", "byte_off", "frame_val")
      .orderBy("doc_id", "frame_no")
  }

  /** mm_batch_resize: the BATCHED-UDF contract (mapInPandas shape) made
    * deterministic: docs are bucketed into fixed batches by key
    * (doc_id/32 — ≤32 payloads per batch), each batch processed as one
    * unit (a real pipeline amortizes codec/model init per batch and
    * feeds the batch to a vectorized kernel), rows come back with their
    * batch bookkeeping (batch_id, n_in_batch) plus the stub "resize":
    * halved width, fixed height, stride-4 byte checksum. One shuffle on
    * the batch id; batch size is a constant, so executor memory per
    * task is bounded at any corpus size. */
  def batchResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    records(s, d)
      .groupByKey(_.doc_id / 32)
      .flatMapGroups { (bid: Long, it: Iterator[MmRec]) =>
        val batch = it.toVector // ≤ 32 payloads: the vectorized unit
        batch.map { r =>
          var sum = 0L
          var i = 0
          while (i < r.payload.length) { sum += r.payload(i) & 0xff; i += 4 }
          (r.doc_id, bid, batch.length.toLong,
            math.max(r.width / 2, 1), 16, sum)
        }
      }
      .toDF("doc_id", "batch_id", "n_in_batch", "out_w", "out_h",
        "strided_sum")
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "mm_decode_features" -> (decodeFeatures _),
    "mm_frame_sample"    -> (frameSample _),
    "mm_batch_resize"    -> (batchResize _)
  )

  // Oracle: the text corpus is pure ASCII, so payload bytes ≡ ascii codes —
  // the fake decode is exactly reproducible from the text column.
  val oracle: Map[String, String] = Map(
    "mm_batch_resize" ->
      """SELECT doc_id,
        |  doc_id // 32 AS batch_id,
        |  count(*) OVER (PARTITION BY doc_id // 32) AS n_in_batch,
        |  greatest(((n_chars % 64) + 1) // 2, 1)::INTEGER AS out_w,
        |  16 AS out_h,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(range(1, length(text) + 1, 4),
        |      i -> ascii(substr(text, i::INTEGER, 1))::BIGINT)),
        |    (a, b) -> a + b) AS strided_sum
        |FROM documents ORDER BY doc_id""".stripMargin,
    // kind == 'video' ⇔ doc_id % 3 = 2 (see records()); ASCII text makes
    // the payload bytes exactly reproducible from the text column
    "mm_frame_sample" ->
      """SELECT doc_id,
        |  CAST((u.i - 1) // 16 AS BIGINT) AS frame_no,
        |  CAST(u.i - 1 AS BIGINT) AS byte_off,
        |  ascii(substr(text, u.i::INTEGER, 1))::BIGINT AS frame_val
        |FROM documents, unnest(range(1, length(text) + 1, 16)) AS u(i)
        |WHERE doc_id % 3 = 2
        |ORDER BY doc_id, frame_no""".stripMargin,
    "mm_decode_features" ->
      """SELECT doc_id,
        |  ['image', 'audio', 'video'][(doc_id % 3 + 1)::INTEGER] AS kind,
        |  length(text) AS n_bytes,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(range(1, length(text) + 1),
        |      i -> ascii(substr(text, i::INTEGER, 1))::BIGINT)),
        |    (a, b) -> a + b) AS byte_sum,
        |  ascii(substr(text, 1, 1)) AS first_byte,
        |  len(range(1, length(text) + 1, 16)) AS n_frames,
        |  round(list_reduce(list_prepend(0::BIGINT,
        |      list_transform(range(1, length(text) + 1, 16),
        |        i -> ascii(substr(text, i::INTEGER, 1))::BIGINT)),
        |      (a, b) -> a + b)::DOUBLE /
        |    len(range(1, length(text) + 1, 16)), 6) AS mean_sampled
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
