package graft.engine

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Sketch aggregators (SURVEY.md §2.3 frequent/lossyFrequent windows,
  * §2.8 approximate: family).
  *
  * Siddhi analogs [unverified public-repo paths; /root/reference empty]:
  * `siddhi-core query/processor/stream/window/{FrequentWindowProcessor,
  * LossyFrequentWindowProcessor}.java` (Misra–Gries / lossy counting) and
  * `siddhi-execution-approximate` (HLL distinctCount, count-min).
  *
  * Implemented as typed `Aggregator[IN, BUF, OUT]`s — Spark's mergeable-
  * state UDAF SPI, the direct Catalyst analog of Siddhi's
  * AttributeAggregatorExecutor: per-partition partial sketches merge
  * map-side, so each is ONE shuffle of sketch-sized state (not rows) at
  * any data scale — the canonical 100 TB sketch shape.
  *
  * Determinism/oracle note: capacities are sized so that on the test
  * corpus no eviction triggers (capacity > distinct keys; CMS width ≫
  * keys) — estimates are then EXACTLY the true counts and the DuckDB
  * oracle checks the full aggregator plumbing. Approximation behavior
  * under pressure (evictions, collisions, merge order) is covered by
  * ScalaTest property tests instead, where the ±εN guarantees are
  * asserted rather than exact equality.
  */
object Sketches {
  import Tables._
  type Q = (SparkSession, String) => DataFrame

  /** Misra–Gries frequent-items sketch over Long keys. Mergeable variant:
    * sum counters, then decrement all by the (capacity+1)-largest count. */
  class MisraGries(capacity: Int)
      extends Aggregator[Long, Map[Long, Long], Map[Long, Long]] {
    def zero: Map[Long, Long] = Map.empty
    def reduce(b: Map[Long, Long], key: Long): Map[Long, Long] = {
      if (b.contains(key) || b.size < capacity)
        b.updated(key, b.getOrElse(key, 0L) + 1)
      else { // decrement all, drop zeros — the MG eviction step
        b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
      }
    }
    def merge(b1: Map[Long, Long], b2: Map[Long, Long]): Map[Long, Long] = {
      val sum = (b1.keySet ++ b2.keySet).iterator
        .map(k => k -> (b1.getOrElse(k, 0L) + b2.getOrElse(k, 0L))).toMap
      if (sum.size <= capacity) sum
      else {
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
        sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
      }
    }
    def finish(b: Map[Long, Long]): Map[Long, Long] = b
    def bufferEncoder: Encoder[Map[Long, Long]] =
      Encoders.kryo[Map[Long, Long]]
    def outputEncoder: Encoder[Map[Long, Long]] =
      Encoders.kryo[Map[Long, Long]]
  }

  /** Lossy counting (Manku–Motwani): (count, Δ) per key, eviction at
    * bucket boundaries; distributed merge sums counts and keeps min Δ. */
  class LossyCounting(bucketWidth: Int)
      extends Aggregator[Long, (Map[Long, (Long, Long)], Long),
                         Map[Long, Long]] {
    type Buf = (Map[Long, (Long, Long)], Long) // (key -> (f, delta), n)
    def zero: Buf = (Map.empty, 0L)
    def reduce(b: Buf, key: Long): Buf = {
      val (m, n0) = b
      val n = n0 + 1
      val bucket = n / bucketWidth
      val m1 = m.get(key) match {
        case Some((f, delta)) => m.updated(key, (f + 1, delta))
        case None => m.updated(key, (1L, bucket))
      }
      // bucket boundary: evict entries with f + delta <= bucket
      val m2 = if (n % bucketWidth == 0)
        m1.filter { case (_, (f, delta)) => f + delta > bucket } else m1
      (m2, n)
    }
    def merge(b1: Buf, b2: Buf): Buf = {
      val keys = b1._1.keySet ++ b2._1.keySet
      val m = keys.iterator.map { k =>
        val (f1, d1) = b1._1.getOrElse(k, (0L, Long.MaxValue))
        val (f2, d2) = b2._1.getOrElse(k, (0L, Long.MaxValue))
        k -> (f1 + f2, math.min(d1, d2))
      }.toMap
      (m, b1._2 + b2._2)
    }
    def finish(b: Buf): Map[Long, Long] =
      b._1.view.mapValues(_._1).toMap
    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[Map[Long, Long]] =
      Encoders.kryo[Map[Long, Long]]
  }

  /** Count–min sketch (depth × width matrix of counters, min over rows at
    * query time); deterministic MurmurHash3-seeded rows. */
  class CountMin(width: Int, depth: Int, queryKeys: Seq[Long])
      extends Aggregator[Long, Array[Long], Map[Long, Long]] {
    private def cell(row: Int, key: Long): Int = {
      val h = scala.util.hashing.MurmurHash3
        .productHash((row, key), 0x9747b28c)
      row * width + math.floorMod(h, width)
    }
    def zero: Array[Long] = new Array[Long](width * depth)
    def reduce(b: Array[Long], key: Long): Array[Long] = {
      var r = 0
      while (r < depth) { b(cell(r, key)) += 1; r += 1 }
      b
    }
    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }
    def finish(b: Array[Long]): Map[Long, Long] =
      queryKeys.map(k =>
        k -> (0 until depth).map(r => b(cell(r, k))).min).toMap
    def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    def outputEncoder: Encoder[Map[Long, Long]] =
      Encoders.kryo[Map[Long, Long]]
  }

  private def perTypeSketch(s: SparkSession, d: String,
      agg: Aggregator[Long, _, Map[Long, Long]],
      minCount: Long): DataFrame = {
    import s.implicits._
    events(s, d)
      .select(col("event_type"), col("user_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("sketch"))
      .flatMap { case (t, m) =>
        m.toSeq.filter(_._2 >= minCount)
          .map { case (u, c) => (t, u, c) }
      }
      .toDF("event_type", "user_id", "est_count")
      .orderBy("event_type", "user_id")
  }

  /** sketch_frequent_mg: `#window.frequent` analog — Misra–Gries top
    * occupants per event_type (capacity ≫ keys ⇒ exact on this corpus). */
  def frequentMg(s: SparkSession, d: String): DataFrame =
    perTypeSketch(s, d, new MisraGries(4096), minCount = 10L)

  /** sketch_lossy: `#window.lossyFrequent` analog — lossy counting with
    * bucket width 100k (no boundary hit at test SF ⇒ exact). */
  def lossy(s: SparkSession, d: String): DataFrame =
    perTypeSketch(s, d, new LossyCounting(100000), minCount = 10L)

  /** sketch_countmin: `approximate:count` analog — CMS estimates for the
    * first 20 user ids per event_type (width ≫ keys ⇒ exact). */
  def countMin(s: SparkSession, d: String): DataFrame =
    perTypeSketch(s, d, new CountMin(4096, 3, (0L until 20L).toSeq),
      minCount = 1L)

  /** sketch_approx_distinct: HLL++ `approx_count_distinct` next to the
    * exact count; the oracle checks the exact column and that the HLL
    * estimate lands within 10% (deterministic given data + impl). */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_exact"),
        approx_count_distinct(col("user_id"), 0.02).as("n_approx"))
      .select(col("event_type"), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")) <=
          col("n_exact") * 0.1).as("within_10pct"))
      .orderBy("event_type")

  /** sketch_approx_quantile: `approximate:percentile` analog — Spark's
    * built-in quantile sketch (Greenwald–Khanna via percentile_approx,
    * accuracy 1000) next to the exact percentile; the gate checks the
    * exact values and that each sketch estimate lands within 5% (the
    * approx_distinct within-tolerance pattern — deterministic given
    * data + implementation). GK partial sketches merge associatively, so
    * the aggregation is map-side combinable at any scale. */
  def approxQuantile(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5D)"), 4).as("exact_p50"),
        round(expr("percentile(value, 0.95D)"), 4).as("exact_p95"),
        expr("abs(percentile_approx(value, 0.5D, 1000) - " +
          "percentile(value, 0.5D)) <= " +
          "greatest(abs(percentile(value, 0.5D)) * 0.05D, 1.0D)")
          .as("p50_within_5pct"),
        expr("abs(percentile_approx(value, 0.95D, 1000) - " +
          "percentile(value, 0.95D)) <= " +
          "greatest(abs(percentile(value, 0.95D)) * 0.05D, 1.0D)")
          .as("p95_within_5pct"))
      .orderBy("event_type")

  /** `approximate:similarity` — MinHash ESTIMATE of Jaccard similarity
    * (vs Dedup's exact-verify LSH): 16 universal-hash minima per doc over
    * md5-derived 48-bit shingle hashes; estimate = matching components /
    * 16. Every hash is md5-derived, so the DuckDB oracle reproduces the
    * signatures (and hence the estimates) bit-for-bit — the estimator
    * itself is under the correctness gate, not just its bounds. Pairs are
    * length-block candidates (same blocking as dedup_ngram_jaccard);
    * output keeps estimates ≥ 4/16. */
  def minhashEstimate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p31 = 2147483647L
    val sigs = Tables.documents(s, d)
      .select(col("doc_id"), (col("n_chars") / 25).cast("int").as("blk"),
        col("text"))
      .repartition(s.sparkContext.defaultParallelism)
      .as[(Long, Int, String)]
      .mapPartitions(_.map { case (id, blk, text) =>
        val n = math.max(text.length - 4, 1)
        val hs = new scala.collection.mutable.HashSet[Long]
        var i = 0
        while (i < n) {
          hs += DedupKernels.md5Int48(
            text.substring(i, math.min(i + 5, text.length))) % p31
          i += 1
        }
        val mh = hs.toArray
        val sig = new Array[Long](16)
        var k = 0
        while (k < 16) {
          val a = math.floorMod(2654435761L * (k + 1), p31)
          val b = math.floorMod(40503L * (k + 1) * (k + 1) + 17, p31)
          var mn = Long.MaxValue
          var j = 0
          while (j < mh.length) {
            val v = (a * mh(j) + b) % p31
            if (v < mn) mn = v
            j += 1
          }
          sig(k) = mn
          k += 1
        }
        (id, blk, sig)
      })
      .toDF("doc_id", "blk", "sig")
      .withColumn("bkey", explode(array(col("blk"), col("blk") + 1)))
    sigs.as("a")
      .join(sigs.as("b"),
        col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.bkey") === greatest(col("a.blk"), col("b.blk")))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        // unrolled component match-count: 16 codegen'd comparisons
        // (a HOF filter would evaluate interpreted per candidate pair)
        ((1 to 16).map(i =>
          when(element_at(col("a.sig"), i) === element_at(col("b.sig"), i),
            1).otherwise(0)).reduce(_ + _) / 16.0).as("j_est"))
      .filter(col("j_est") >= 0.25)
      .orderBy("d1", "d2")
  }

  val queries: Map[String, Q] = Map(
    "sketch_frequent_mg"       -> (frequentMg _),
    "sketch_lossy"             -> (lossy _),
    "sketch_countmin"          -> (countMin _),
    "sketch_approx_distinct"   -> (approxDistinct _),
    "sketch_approx_quantile"   -> (approxQuantile _),
    "sketch_minhash_estimate"  -> (minhashEstimate _)
  )

  val oracle: Map[String, String] = Map(
    // signatures reproduced exactly: md5-derived 48-bit shingle hashes mod
    // p31, then the same 16 universal-hash permutations; j_est is k/16 —
    // exact in binary, no rounding needed
    "sketch_minhash_estimate" ->
      """WITH h AS (
        |  SELECT doc_id, CAST(n_chars // 25 AS INTEGER) AS blk,
        |    list_distinct(list_transform(
        |      range(1, greatest(length(text) - 4, 1) + 1),
        |      i -> CAST(('0x' || substr(md5(substr(text, i::INTEGER, 5)),
        |        1, 12)) AS BIGINT) % 2147483647)) AS mh
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, blk,
        |    list_transform(range(1, 17), k ->
        |      list_aggregate(list_transform(mh, m ->
        |        (((2654435761 * k) % 2147483647) * m +
        |         ((40503 * k * k + 17) % 2147483647)) % 2147483647),
        |        'min')) AS sig
        |  FROM h)
        |SELECT d1, d2, j_est FROM (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    len(list_filter(range(1, 17),
        |      i -> a.sig[i::INTEGER] = b.sig[i::INTEGER])) / 16.0 AS j_est
        |  FROM s a JOIN s b ON abs(a.blk - b.blk) <= 1
        |    AND a.doc_id < b.doc_id) t
        |WHERE j_est >= 0.25 ORDER BY d1, d2""".stripMargin,
    "sketch_frequent_mg" ->
      """SELECT event_type, user_id, count(*) AS est_count FROM events
        |GROUP BY event_type, user_id HAVING count(*) >= 10
        |ORDER BY event_type, user_id""".stripMargin,
    "sketch_lossy" ->
      """SELECT event_type, user_id, count(*) AS est_count FROM events
        |GROUP BY event_type, user_id HAVING count(*) >= 10
        |ORDER BY event_type, user_id""".stripMargin,
    "sketch_countmin" ->
      """SELECT event_type, user_id, count(*) AS est_count FROM events
        |WHERE user_id < 20
        |GROUP BY event_type, user_id
        |ORDER BY event_type, user_id""".stripMargin,
    "sketch_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
        |  true AS within_10pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // exact percentiles checked by value (continuous interpolation matches
    // Spark's percentile); the sketch estimates by the within-tolerance
    // contract, as in sketch_approx_distinct
    "sketch_approx_quantile" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS exact_p50,
        |  round(quantile_cont(value, 0.95), 4) AS exact_p95,
        |  true AS p50_within_5pct, true AS p95_within_5pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
