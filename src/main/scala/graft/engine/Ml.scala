package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Online (streaming) machine learning — the `streamingml:` family's
  * representative operator, re-expressed Spark-first.
  *
  * The reference's `streamingml:updatePerceptronModel` folds a perceptron
  * update over the event stream in arrival order. The Spark-native shape
  * is PER-KEY online learning: one model per partition key, trained by a
  * sequential fold inside `groupByKey.mapGroups` — keys distribute across
  * the cluster (the same keyed-state shape as the CEP NFA), while each
  * key's fold stays exactly sequential, which is what online-update
  * semantics require. At 100 TB this is model-per-entity training
  * (per-user, per-device, per-tenant) — embarrassingly parallel over
  * keys, shuffle = one exchange on the key.
  *
  * Determinism: the fold applies IEEE double ops in event-time order, so
  * the DuckDB oracle's recursive CTE reproduces the weights bit-for-bit
  * (rounded to 6 for presentation). The rest of the `streamingml:` family
  * (Hoeffding trees, online k-means, Bayesian regression) shares this
  * keyed-fold execution shape; batch-trained equivalents belong to MLlib
  * (SURVEY §2.8 note).
  */
object Ml {
  import Tables._
  type Q = (SparkSession, String) => DataFrame

  /** ml_perceptron_online: per-user perceptron (features: bias + event
    * value; label: purchase vs not), trained in event-time order with
    * learning rate 0.1; emits each user's final weights and the number
    * of mistake-driven updates. */
  def perceptronOnline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .select(col("user_id"), col("ts_ns"), col("event_id"),
        col("value"),
        when(col("event_type") === "purchase", 1.0).otherwise(-1.0)
          .as("y"))
      .as[(Long, Long, Long, Double, Double)]
      .groupByKey(_._1)
      .mapGroups { (uid, it) =>
        val evs = it.toArray.sortBy(e => (e._2, e._3))
        var w0 = 0.0; var w1 = 0.0; var mistakes = 0L
        var i = 0
        while (i < evs.length) {
          val x = evs(i)._4; val y = evs(i)._5
          if (y * (w0 + w1 * x) <= 0) {
            w0 += 0.1 * y
            w1 += 0.1 * y * x
            mistakes += 1
          }
          i += 1
        }
        (uid, w0, w1, mistakes)
      }
      .toDF("user_id", "w0", "w1", "n_updates")
      // + 0.0 normalizes IEEE -0.0 → +0.0 (a tiny negative weight rounds
      // to negative zero; both engines must land on the same bit pattern)
      .select(col("user_id"), (round(col("w0"), 6) + 0.0).as("w0"),
        (round(col("w1"), 6) + 0.0).as("w1"), col("n_updates"))
      .orderBy("user_id")
  }

  /** ml_kmeans_online: per-user incremental k-means (k=2, 1-D over the
    * event value — the `streamingml:kMeansIncremental` analog; the
    * multi-dim form is the same fold over arrays). Centroids initialize
    * from the user's first two events, then every event moves its
    * nearest centroid by lr=0.1 toward the point (ties toward c0);
    * emits final centroids and per-centroid assignment counts. */
  def kmeansOnline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .select(col("user_id"), col("ts_ns"), col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (uid, it) =>
        val evs = it.toArray.sortBy(e => (e._2, e._3))
        if (evs.length < 2) Iterator.empty
        else {
          var c0 = evs(0)._4; var c1 = evs(1)._4
          var n0 = 1L; var n1 = 1L
          var i = 2
          while (i < evs.length) {
            val x = evs(i)._4
            if (math.abs(x - c0) <= math.abs(x - c1)) {
              c0 += 0.1 * (x - c0); n0 += 1
            } else {
              c1 += 0.1 * (x - c1); n1 += 1
            }
            i += 1
          }
          Iterator((uid, c0, c1, n0, n1))
        }
      }
      .toDF("user_id", "c0", "c1", "n0", "n1")
      .select(col("user_id"), (round(col("c0"), 6) + 0.0).as("c0"),
        (round(col("c1"), 6) + 0.0).as("c1"), col("n0"), col("n1"))
      .orderBy("user_id")
  }

  val queries: Map[String, Q] = Map(
    "ml_perceptron_online" -> (perceptronOnline _),
    "ml_kmeans_online"     -> (kmeansOnline _)
  )

  val oracle: Map[String, String] = Map(
    "ml_kmeans_online" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, value, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS rn
        |  FROM events),
        |init AS (
        |  SELECT a.user_id, a.value AS c0, b.value AS c1
        |  FROM ev a JOIN ev b ON a.user_id = b.user_id
        |    AND a.rn = 1 AND b.rn = 2),
        |n AS (SELECT user_id, max(rn) AS mx FROM ev GROUP BY user_id),
        |step(user_id, rn, c0, c1, n0, n1) AS (
        |  SELECT user_id, 2, c0, c1, 1::BIGINT, 1::BIGINT FROM init
        |  UNION ALL
        |  SELECT s.user_id, s.rn + 1,
        |    CASE WHEN abs(e.value - s.c0) <= abs(e.value - s.c1)
        |      THEN s.c0 + 0.1::DOUBLE * (e.value - s.c0) ELSE s.c0 END,
        |    CASE WHEN abs(e.value - s.c0) <= abs(e.value - s.c1)
        |      THEN s.c1 ELSE s.c1 + 0.1::DOUBLE * (e.value - s.c1) END,
        |    s.n0 + CASE WHEN abs(e.value - s.c0) <= abs(e.value - s.c1)
        |      THEN 1 ELSE 0 END,
        |    s.n1 + CASE WHEN abs(e.value - s.c0) <= abs(e.value - s.c1)
        |      THEN 0 ELSE 1 END
        |  FROM step s JOIN ev e
        |    ON e.user_id = s.user_id AND e.rn = s.rn + 1)
        |SELECT s.user_id, round(s.c0, 6) + 0.0::DOUBLE AS c0,
        |  round(s.c1, 6) + 0.0::DOUBLE AS c1, s.n0, s.n1
        |FROM step s JOIN n ON n.user_id = s.user_id AND s.rn = n.mx
        |ORDER BY s.user_id""".stripMargin,
    // exact sequential-fold simulation: one recursion level per event in
    // each user's time-ordered stream (IEEE doubles, identical op order)
    "ml_perceptron_online" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, value,
        |    CASE WHEN event_type = 'purchase' THEN 1.0::DOUBLE
        |         ELSE -1.0::DOUBLE END AS y,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |n AS (SELECT user_id, max(rn) AS mx FROM ev GROUP BY user_id),
        |step(user_id, rn, w0, w1, mist) AS (
        |  SELECT user_id, 0, 0.0::DOUBLE, 0.0::DOUBLE, 0::BIGINT FROM n
        |  UNION ALL
        |  SELECT s.user_id, s.rn + 1,
        |    CASE WHEN e.y * (s.w0 + s.w1 * e.value) <= 0
        |      THEN s.w0 + 0.1::DOUBLE * e.y ELSE s.w0 END,
        |    CASE WHEN e.y * (s.w0 + s.w1 * e.value) <= 0
        |      THEN s.w1 + 0.1::DOUBLE * e.y * e.value ELSE s.w1 END,
        |    s.mist + CASE WHEN e.y * (s.w0 + s.w1 * e.value) <= 0
        |      THEN 1 ELSE 0 END
        |  FROM step s JOIN ev e
        |    ON e.user_id = s.user_id AND e.rn = s.rn + 1)
        |SELECT s.user_id, round(s.w0, 6) + 0.0::DOUBLE AS w0,
        |  round(s.w1, 6) + 0.0::DOUBLE AS w1,
        |  s.mist AS n_updates
        |FROM step s JOIN n ON n.user_id = s.user_id AND s.rn = n.mx
        |ORDER BY s.user_id""".stripMargin
  )
}
