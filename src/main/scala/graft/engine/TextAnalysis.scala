package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (beyond-reference ops;
  * builder brief + SURVEY.md §7.3 step 9): language-ID heuristic, quality
  * scoring, token counting, document fingerprinting.
  *
  * All pure per-row array/string expressions (one scan, whole-stage
  * codegen, no UDFs, no shuffle except the presentation sort) — the shape
  * that streams through 100 TB at scan speed.
  */
object TextAnalysis {
  import Tables._
  type Q = (SparkSession, String) => DataFrame

  private val stopList = Seq("the", "a", "of", "and", "to", "in", "is",
    "for", "on", "it")
  private val stopIn = stopList.map(w => s"'$w'").mkString("(", ", ", ")")

  /** text_langid: n-gram/stopword heuristic — stopword ratio over the
    * token stream decides en vs unknown; compared against the labeled
    * lang column for accuracy accounting. */
  def langId(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("n_stop", expr(
        s"size(filter(split(text, ' '), t -> t in $stopIn))"))
      .withColumn("stop_ratio",
        round(col("n_stop").cast("double") / col("n_tokens"), 6))
      .withColumn("pred_lang",
        when(col("stop_ratio") >= 0.05, "en").otherwise("unknown"))
      .select("doc_id", "lang", "pred_lang", "stop_ratio", "n_tokens")
      .orderBy("doc_id")

  /** text_quality: length/structure/stopword quality signals + a composite
    * score — the pre-training filter shape. */
  def quality(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_distinct", size(array_distinct(col("toks"))))
      .withColumn("mean_tok_len", round(
        expr("aggregate(toks, cast(0 as bigint), (acc, t) -> acc + " +
          "length(t)) / cast(size(toks) as double)"), 6))
      .withColumn("distinct_ratio",
        round(col("n_distinct") / col("n_tokens").cast("double"), 6))
      .withColumn("stop_ratio", round(expr(
        s"size(filter(toks, t -> t in $stopIn))") /
        col("n_tokens").cast("double"), 6))
      .withColumn("quality_score", round(
        lit(0.4) * least(col("n_tokens") / lit(100.0), lit(1.0)) +
          lit(0.4) * col("distinct_ratio") + lit(0.2) * col("stop_ratio"), 6))
      .select("doc_id", "n_chars", "n_tokens", "n_distinct", "mean_tok_len",
        "distinct_ratio", "stop_ratio", "quality_score")
      .orderBy("doc_id")

  /** text_tokens: whitespace tokens vs a BPE-ish regex tokenizer
    * (letter runs | digit runs | single non-alnum) vs chars. */
  def tokens(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("ws_tokens", size(split(col("text"), " ")))
      .withColumn("bpe_ish", expr(
        "size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))"))
      .withColumn("n_chars_m", length(col("text")))
      .select("doc_id", "ws_tokens", "bpe_ish", "n_chars_m")
      .orderBy("doc_id")

  /** text_fingerprint: order-sensitive rolling hash (mod-prime fold over
    * tokens) + order-insensitive canonical md5 (sorted distinct tokens). */
  def fingerprint(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("rolling_fp", expr(
        "aggregate(split(text, ' '), cast(7 as bigint), (acc, t) -> " +
          "(acc * 31 + length(t) * ascii(substring(t, 1, 1))) % 1000000007)"))
      .withColumn("canonical_fp",
        md5(array_join(array_sort(array_distinct(split(col("text"), " "))),
          " ")))
      .select("doc_id", "rolling_fp", "canonical_fp")
      .orderBy("doc_id")

  /** text_winnow: winnowing fingerprints (the MOSS scheme): 48-bit md5
    * hashes of char-5-grams, sliding window of 4, keep each window's
    * minimum, fingerprint set = distinct selected minima. Guarantees any
    * shared substring ≥ 8 chars yields a shared fingerprint — the
    * standard local-dedup/plagiarism primitive. Typed per-row kernel
    * (md5 loop), one scan, spread across cores. */
  def winnow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d).select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val (n, fps) = DedupKernels.winnow(text)
        (id, n.toLong, fps.length.toLong, fps.sum, fps.min)
      })
      .toDF("doc_id", "n_grams", "n_fp", "fp_sum", "fp_min")
      .orderBy("doc_id")
  }

  /** text_tfidf: classic TF-IDF keyword extraction — explode tokens, one
    * hash aggregation for per-doc term frequency, one for document
    * frequency, score tf·ln(N/df), keep each doc's top-3 terms. All
    * hash aggregations with map-side combine; the corpus size N is one
    * driver-side parquet-metadata count inlined as a literal (a scalar,
    * not a joined relation — keeps the plan free of nested-loop joins).
    *
    * Skew: tf⋈df on raw `term` makes every stopword a hot key (at corpus
    * scale "the" carries one tf row PER DOCUMENT into a single reducer).
    * The join is salted: tf keys on (term, hash(doc_id) mod S), df rows
    * replicate S ways — each hot term fans across S tasks, df's shuffle
    * grows only |vocab|·S skinny rows. Result set is identical (salt is
    * a pure partitioning refinement), so the oracle is unchanged. */
  def tfidf(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val nDocs = docs.count()
    val salts = 16
    // tf feeds BOTH join sides (tf rows, and df = count over tf groups);
    // without a persist the explode + first aggregation run twice — the
    // most expensive passes in the query. tf is ~|distinct (doc,term)|
    // rows, far smaller than the exploded token stream; MEMORY_AND_DISK
    // spills rather than evicts at corpus scale. Freed via the same
    // localCheckpoint-then-unpersist pattern as minhashLsh (the result is
    // 3 rows/doc — tiny next to what the cache saves).
    val tf = docs
      .repartition(s.sparkContext.defaultParallelism) // one-file scan → cores
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val tfSalted = tf.withColumn("salt",
      pmod(xxhash64(col("doc_id")), lit(salts)).cast("int"))
    val dfSalted = df.withColumn("salt",
      explode(sequence(lit(0), lit(salts - 1))))
    val res = tfSalted.join(dfSalted, Seq("term", "salt")).drop("salt")
      .withColumn("tfidf",
        round(col("tf") * log(lit(nDocs) / col("df")), 6))
      .withColumn("rk", expr("row_number() over (partition by doc_id " +
        "order by tfidf desc, term)"))
      .filter(col("rk") <= 3)
      .select("doc_id", "rk", "term", "tf", "df", "tfidf")
      .orderBy("doc_id", "rk")
      .localCheckpoint()
    tf.unpersist()
    res
  }

  /** dedup_normalized: canonicalization-based exact dedup — lowercase,
    * strip non-alphanumerics, collapse whitespace, md5 the canonical
    * form; duplicate groups share a hash, the keeper is the smallest
    * doc_id. One scan + one shuffle on the 16-byte hash (never on the
    * document text) — the first-pass dedup of every corpus pipeline. */
  def dedupNormalized(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("norm_hash")
    documents(s, d)
      .withColumn("norm_hash", md5(trim(regexp_replace(regexp_replace(
        lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))))
      .withColumn("group_n", count(lit(1)).over(w))
      .withColumn("keeper_id", min("doc_id").over(w))
      .select(col("doc_id"), col("norm_hash"),
        (col("group_n") > 1).as("is_dup"), col("keeper_id"))
      .orderBy("doc_id")
  }

  /** corpus_pipeline: the full training-data pipeline as ONE composed
    * query — canonicalize → exact-dedup (keep smallest doc_id per
    * canonical hash) → quality gate (length + lexical diversity) →
    * language gate (stopword ratio) → emit the surviving corpus with its
    * metrics. Each stage is the same declarative shape as its standalone
    * query, so Catalyst fuses the scan + per-row stages into one
    * codegen'd pass, with the only shuffle being the dedup hash — the
    * composition IS the 100 TB argument: no materialization between
    * stages. */
  def corpusPipeline(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("norm_hash").orderBy("doc_id")
    documents(s, d)
      .withColumn("norm_hash", md5(trim(regexp_replace(regexp_replace(
        lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1) // dedup: keeper per canonical text
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("distinct_ratio",
        round(size(array_distinct(col("toks"))) /
          col("n_tokens").cast("double"), 6))
      .withColumn("stop_ratio", round(expr(
        s"size(filter(toks, t -> t in $stopIn))") /
        col("n_tokens").cast("double"), 6))
      .filter(col("n_tokens") >= 5 && col("distinct_ratio") >= 0.3)
      .filter(col("stop_ratio") >= 0.05) // language gate: en
      .select("doc_id", "norm_hash", "n_tokens", "distinct_ratio",
        "stop_ratio")
      .orderBy("doc_id")
  }

  /** Sorted-runs counting over a gram array, as one codegen'd `aggregate`:
    * array_sort groups equal grams into adjacent runs, the fold tracks
    * (prev, current run, best run, occurrences inside runs > 1). O(L log L)
    * per document with NO shuffle — repetition scoring stays a pure scan
    * stage at 100 TB (the alternative, explode + two-level groupBy, pays a
    * full-corpus shuffle keyed by gram). chr(0) is the init sentinel (no
    * gram can equal it; '' could, from irregular whitespace). */
  private def runsAgg(arr: String): String =
    s"""aggregate(array_sort($arr),
       |  named_struct('prev', chr(0), 'run', 0, 'best', 0, 'dup', 0),
       |  (a, x) -> named_struct(
       |    'prev', x,
       |    'run', IF(x = a.prev, a.run + 1, 1),
       |    'best', GREATEST(a.best, IF(x = a.prev, a.run + 1, 1)),
       |    'dup', a.dup + IF(x = a.prev, IF(a.run = 1, 2, 1), 0)),
       |  a -> named_struct('best', a.best, 'dup', a.dup))""".stripMargin

  /** text_repetition: Gopher-style repetition signals — the fraction of
    * the document covered by its most common 2-gram and by duplicated
    * 3-grams, the standard "templated/boilerplate text" filter inputs for
    * pre-training corpora. */
  def repetition(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("bi", expr(
        "transform(slice(toks, 1, greatest(size(toks) - 1, 0)), " +
          "(t, i) -> concat(t, ' ', element_at(toks, i + 2)))"))
      .withColumn("tri", expr(
        "transform(slice(toks, 1, greatest(size(toks) - 2, 0)), " +
          "(t, i) -> concat(t, ' ', element_at(toks, i + 2), ' ', " +
          "element_at(toks, i + 3)))"))
      .withColumn("b", expr(runsAgg("bi")))
      .withColumn("t3", expr(runsAgg("tri")))
      .select(col("doc_id"),
        size(col("bi")).cast("long").as("n_bigrams"),
        col("b.best").cast("long").as("top_bigram_n"),
        round(col("b.best") /
          greatest(size(col("bi")), lit(1)).cast("double"), 6)
          .as("top_bigram_frac"),
        size(col("tri")).cast("long").as("n_trigrams"),
        col("t3.dup").cast("long").as("dup_trigram_occ"),
        round(col("t3.dup") /
          greatest(size(col("tri")), lit(1)).cast("double"), 6)
          .as("dup_trigram_frac"))
      .orderBy("doc_id")

  private val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phonePat = "\\+1-555-[0-9]{4}"
  private val ipPat = "10\\.[0-9]{1,3}\\.0\\.1"

  /** text_pii_redact: regex PII detection + redaction (emails, phone
    * numbers, IPs) — the compliance pass every training corpus runs. The
    * corpus is synthetic clean text, so deterministic PII is first woven
    * in FROM table data (doc_id-derived contact line), then detected and
    * redacted; the oracle reproduces both weave and redaction, proving the
    * patterns byte-exact. Pure per-row regex — one scan, codegen, no
    * shuffle. */
  def piiRedact(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("dirty", concat(col("text"),
        lit(" contact user"), col("doc_id"),
        lit("@mail.example.com or +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" ip 10."), (col("doc_id") % 256).cast("string"), lit(".0.1")))
      .select(col("doc_id"),
        regexp_count(col("dirty"), lit(emailPat)).cast("long").as("n_email"),
        regexp_count(col("dirty"), lit(phonePat)).cast("long").as("n_phone"),
        regexp_count(col("dirty"), lit(ipPat)).cast("long").as("n_ip"),
        regexp_replace(regexp_replace(regexp_replace(col("dirty"),
          lit(emailPat), lit("<EMAIL>")),
          lit(phonePat), lit("<PHONE>")),
          lit(ipPat), lit("<IP>")).as("redacted"))
      .orderBy("doc_id")

  /** text_gopher_filter: the keep/drop DECISION layer over quality
    * signals (Gopher-rules shape): token-count band, mean word length
    * band, stopword floor, distinct-token floor. Thresholds compare the
    * EXACT int/int divisions (bit-identical across engines), never the
    * rounded display values. One scan, no shuffle. */
  def gopherFilter(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("mean_tok_len",
        expr("aggregate(toks, cast(0 as bigint), (acc, t) -> acc + " +
          "length(t))") / col("n_tokens").cast("double"))
      .withColumn("n_stop_hits", expr(
        s"size(filter(toks, t -> t in $stopIn))"))
      .withColumn("distinct_ratio",
        size(array_distinct(col("toks"))) / col("n_tokens").cast("double"))
      .withColumn("r_len",
        when(col("n_tokens") < 50 || col("n_tokens") > 100000,
          "doc_length"))
      .withColumn("r_mwl",
        when(col("mean_tok_len") < 3.0 || col("mean_tok_len") > 10.0,
          "mean_word_length"))
      .withColumn("r_stop", when(col("n_stop_hits") < 2, "stopword_floor"))
      .withColumn("r_rep", when(col("distinct_ratio") <= 0.2, "repetition"))
      .select(col("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        round(col("mean_tok_len"), 6).as("mean_tok_len"),
        col("n_stop_hits").cast("long").as("n_stop_hits"),
        round(col("distinct_ratio"), 6).as("distinct_ratio"),
        (col("r_len").isNull && col("r_mwl").isNull &&
          col("r_stop").isNull && col("r_rep").isNull).as("keep"),
        concat_ws(",", col("r_len"), col("r_mwl"), col("r_stop"),
          col("r_rep")).as("reasons"))
      .orderBy("doc_id")

  /** text_lm_perplexity: bigram-LM quality scoring (the CCNet-style
    * "perplexity filter" of pre-training pipelines), self-trained: global
    * bigram/unigram counts estimate P(w2|w1) = c(w1 w2)/c(w1) with no
    * smoothing needed (every doc bigram is in its own training set), and
    * each document scores mean log-prob over its bigram stream.
    *
    * Scale shape (same as tfidf): the exploded gram relation is persisted
    * and feeds all three aggregations (unigram, bigram, per-doc counts)
    * in ONE pass; the count tables are skinny O(vocab) aggregates whose
    * joins back to per-doc grams are SALTED — stopword-pair bigrams are
    * exactly the hot keys that would otherwise pile one reducer high. */
  def lmPerplexity(s: SparkSession, d: String): DataFrame = {
    val salts = 16
    val grams = documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        "transform(slice(toks, 1, greatest(size(toks) - 1, 0)), " +
          "(t, i) -> named_struct('w1', t, 'bg', concat(t, ' ', " +
          "element_at(toks, i + 2))))")).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.bg").as("bg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uni = grams.groupBy("w1").agg(count(lit(1)).as("c1"))
    val bi = grams.groupBy("bg").agg(count(lit(1)).as("c2"))
    val docBi = grams.groupBy("doc_id", "w1", "bg")
      .agg(count(lit(1)).as("k"))
      .withColumn("salt",
        pmod(xxhash64(col("doc_id")), lit(salts)).cast("int"))
    val biS = bi.withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
    val uniS = uni.withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
    val res = docBi
      .join(biS, Seq("bg", "salt"))
      .join(uniS, Seq("w1", "salt"))
      .withColumn("lp", log(col("c2") / col("c1").cast("double")))
      .groupBy("doc_id")
      .agg(sum("k").cast("long").as("n_bigrams"),
        round(sum(col("k") * col("lp")) / sum("k"), 6).as("avg_logp"))
      .orderBy("doc_id")
      .localCheckpoint()
    grams.unpersist()
    res
  }

  /** corpus_sample_mix: deterministic weighted MIXTURE SAMPLING — the
    * step that turns a filtered corpus into a training mix with
    * per-source weights. Each document draws a stable pseudo-uniform in
    * [0,1000) from md5(doc_id) (reproducible across engines and runs —
    * no RNG state, no seed coordination across 1000 executors) and is
    * kept iff the draw clears its source's per-mille rate (derived here
    * from the source id; a real mix passes a weights map). One scan +
    * one tiny per-source aggregate. */
  def sampleMix(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("draw",
        expr("conv(substr(md5(cast(doc_id as string)), 1, 15), 16, 10) " +
          "% 1000"))
      .withColumn("rate_pm",
        lit(250) + lit(50) * (expr("cast(substr(source, 4) as int)") % 10))
      .withColumn("kept", col("draw") < col("rate_pm"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        max("rate_pm").cast("long").as("rate_pm"),
        sum(when(col("kept"), col("doc_id"))).as("kept_id_sum"))
      .orderBy("source")

  /** corpus_shard_shuffle: deterministic global shuffle + N-way sharding
    * — the step that turns a filtered corpus into training shards whose
    * order is reproducible across engines, runs, and executor counts.
    * Every doc gets a stable shuffle key md5(doc_id); shard = 48-bit
    * key-int % 8; within a shard docs are ordered by the hex key. The
    * result pins the FULL permutation per shard: n_docs, token total,
    * the first/last docs in shuffle order, and an order-sensitive
    * checksum Σ position·doc_id that any reordering breaks.
    *
    * Scale shape: shard assignment is one hash — the only shuffle is the
    * repartition-by-shard that the within-shard sort rides on (no global
    * sort, no terasort: training order only needs to be deterministic
    * WITHIN a shard, and shards are hash-balanced by construction). */
  def shardShuffle(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("key", md5(col("doc_id").cast("string")))
      .withColumn("shard",
        expr("cast(conv(substr(key, 1, 15), 16, 10) as bigint) % 8"))
      .withColumn("tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("pos", expr(
        "row_number() over (partition by shard order by key)"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("tok").as("n_tokens"),
        min_by(col("doc_id"), col("pos")).as("first_doc"),
        max_by(col("doc_id"), col("pos")).as("last_doc"),
        sum(col("pos") * col("doc_id")).as("order_sig"))
      .orderBy("shard")

  /** corpus_pack_chunks: token-budget sequence packing (the concat-and-
    * chunk step that turns shuffled documents into fixed-size training
    * sequences): within each [[shardShuffle]] shard, docs concatenate in
    * shuffle-key order and a doc starts chunk ⌊tokens-before/2048⌋ —
    * greedy boundary assignment, so chunks overflow by at most one doc
    * (real pipelines split the straddling doc; the chunk MAP is what
    * matters and is what's pinned). Emits per (shard, chunk): doc count,
    * token count, start offset, and the order checksum.
    *
    * Scale shape: the running total is a per-shard window cumsum — the
    * sequential dependency training-order packing genuinely has — but
    * shards parallelize freely, which is exactly how a 1000-worker writer
    * packs: one ordered stream per output shard. */
  def packChunks(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("key", md5(col("doc_id").cast("string")))
      .withColumn("shard",
        expr("cast(conv(substr(key, 1, 15), 16, 10) as bigint) % 8"))
      .withColumn("tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("pos", expr(
        "row_number() over (partition by shard order by key)"))
      .withColumn("before", expr(
        "coalesce(sum(tok) over (partition by shard order by key " +
          "rows between unbounded preceding and 1 preceding), 0L)"))
      .withColumn("chunk", expr("cast(floor(before / 2048) as bigint)"))
      .groupBy("shard", "chunk")
      .agg(count(lit(1)).as("n_docs"),
        sum("tok").as("n_tokens"),
        min("before").as("start_tok"),
        sum(col("pos") * col("doc_id")).as("order_sig"))
      .orderBy("shard", "chunk")

  /** corpus_sample_stratified: deterministic stratified sampling with a
    * per-stratum cap — the data-mixing step that takes AT MOST n docs
    * per (lang, source) stratum, chosen by a stable md5 order (no RNG,
    * no seed coordination: every executor count and every rerun selects
    * the SAME documents, and kept_id_sum pins the exact selection).
    * One shuffle on the stratum key; the per-stratum rank is a window
    * whose partitioning the following aggregation reuses. */
  def sampleStratified(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("key", md5(concat_ws(":", col("lang"), col("source"),
        col("doc_id").cast("string"))))
      .withColumn("rk", expr(
        "row_number() over (partition by lang, source order by key)"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("rk") <= 25, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rk") <= 25, col("doc_id"))).as("kept_id_sum"),
        min_by(col("doc_id"), col("rk")).as("first_doc"))
      .orderBy("lang", "source")

  /** corpus_sample_temperature: temperature-weighted source rebalancing
    * (the multilingual/domain α-sampling standard, α = 0.5): retained
    * counts end up ∝ n_s^α via the per-doc keep probability
    * p_s = sqrt(n_min / n_s) — the n_min-referenced form needs NO
    * cross-source sum, so both engines compute bit-identical
    * probabilities (sqrt and division are correctly-rounded IEEE ops on
    * exact integer inputs; a normalization Σ n_s^α would fold in
    * engine-dependent order). Thresholds floor to per-million and match
    * against the doc's md5 draw — deterministic at any executor count.
    *
    * Scale shape: pass 1 is a tiny per-source count aggregate; the
    * global n_min folds over THAT (|sources| rows, never the corpus);
    * rates broadcast back onto the scan for the filter pass. */
  def sampleTemperature(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_total"))
    // global n_min as a window over the TINY counts relation (|sources|
    // rows on one partition — never the corpus; a crossJoin with the
    // 1-row min would plan a CartesianProduct the sweep test forbids)
    val rates = counts
      .withColumn("n_min", min("n_total").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("thr_pm", expr(
        "cast(floor(sqrt(cast(n_min as double) / " +
          "cast(n_total as double)) * 1000000) as bigint)"))
      .select("source", "n_total", "thr_pm")
    docs.join(broadcast(rates), Seq("source"))
      .withColumn("draw", expr(
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 15), 16, 10) " +
          "as bigint) % 1000000"))
      .groupBy("source")
      .agg(max("n_total").as("n_total"), max("thr_pm").as("thr_pm"),
        sum(when(col("draw") < col("thr_pm"), 1L).otherwise(0L))
          .as("n_kept"),
        sum(when(col("draw") < col("thr_pm"), col("doc_id")))
          .as("kept_id_sum"))
      .orderBy("source")
  }

  val queries: Map[String, Q] = Map(
    "corpus_sample_temperature" -> (sampleTemperature _),
    "corpus_sample_stratified" -> (sampleStratified _),
    "corpus_shard_shuffle" -> (shardShuffle _),
    "corpus_pack_chunks"   -> (packChunks _),
    "corpus_sample_mix"  -> (sampleMix _),
    "text_lm_perplexity" -> (lmPerplexity _),
    "text_repetition"    -> (repetition _),
    "text_pii_redact"    -> (piiRedact _),
    "text_gopher_filter" -> (gopherFilter _),
    "corpus_pipeline"  -> (corpusPipeline _),
    "text_tfidf"       -> (tfidf _),
    "dedup_normalized" -> (dedupNormalized _),
    "text_langid"      -> (langId _),
    "text_quality"     -> (quality _),
    "text_tokens"      -> (tokens _),
    "text_fingerprint" -> (fingerprint _),
    "text_winnow"      -> (winnow _)
  )

  private val stopInSql = stopList.map(w => s"'$w'").mkString("(", ", ", ")")

  val oracle: Map[String, String] = Map(
    "corpus_sample_temperature" ->
      """WITH c AS (SELECT source, count(*) AS n_total
        |  FROM documents GROUP BY source),
        |r AS (SELECT source, n_total,
        |    CAST(floor(sqrt((SELECT min(n_total) FROM c)::DOUBLE /
        |      n_total::DOUBLE) * 1000000) AS BIGINT) AS thr_pm
        |  FROM c)
        |SELECT d.source, max(r.n_total) AS n_total,
        |  max(r.thr_pm) AS thr_pm,
        |  sum(CASE WHEN CAST(('0x' || substr(md5(d.doc_id::VARCHAR),
        |      1, 15)) AS BIGINT) % 1000000 < r.thr_pm
        |    THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        |  sum(CASE WHEN CAST(('0x' || substr(md5(d.doc_id::VARCHAR),
        |      1, 15)) AS BIGINT) % 1000000 < r.thr_pm
        |    THEN d.doc_id END)::BIGINT AS kept_id_sum
        |FROM documents d JOIN r USING (source)
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "corpus_sample_stratified" ->
      """WITH r AS (SELECT lang, source, doc_id, row_number() OVER (
        |    PARTITION BY lang, source
        |    ORDER BY md5(lang || ':' || source || ':' || doc_id::VARCHAR)
        |  ) AS rk
        |  FROM documents)
        |SELECT lang, source, count(*) AS n_total,
        |  sum(CASE WHEN rk <= 25 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        |  sum(CASE WHEN rk <= 25 THEN doc_id END)::BIGINT AS kept_id_sum,
        |  min_by(doc_id, rk) AS first_doc
        |FROM r GROUP BY 1, 2 ORDER BY lang, source""".stripMargin,
    // same md5 shard + hex-key order; order_sig pins the permutation
    "corpus_shard_shuffle" ->
      """WITH k AS (
        |  SELECT doc_id, md5(doc_id::VARCHAR) AS key,
        |    CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 15)) AS BIGINT)
        |      % 8 AS shard,
        |    len(str_split(text, ' '))::BIGINT AS tok
        |  FROM documents),
        |p AS (SELECT *, row_number() OVER (PARTITION BY shard
        |    ORDER BY key) AS pos FROM k)
        |SELECT shard, count(*) AS n_docs, sum(tok)::BIGINT AS n_tokens,
        |  min_by(doc_id, pos) AS first_doc, max_by(doc_id, pos) AS last_doc,
        |  sum(pos * doc_id)::BIGINT AS order_sig
        |FROM p GROUP BY shard ORDER BY shard""".stripMargin,
    "corpus_pack_chunks" ->
      """WITH k AS (
        |  SELECT doc_id, md5(doc_id::VARCHAR) AS key,
        |    CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 15)) AS BIGINT)
        |      % 8 AS shard,
        |    len(str_split(text, ' '))::BIGINT AS tok
        |  FROM documents),
        |p AS (SELECT *,
        |    row_number() OVER (PARTITION BY shard ORDER BY key) AS pos,
        |    COALESCE(sum(tok) OVER (PARTITION BY shard ORDER BY key
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0)::BIGINT AS before
        |  FROM k)
        |SELECT shard, CAST(floor(before / 2048) AS BIGINT) AS chunk,
        |  count(*) AS n_docs, sum(tok)::BIGINT AS n_tokens,
        |  min(before) AS start_tok, sum(pos * doc_id)::BIGINT AS order_sig
        |FROM p GROUP BY 1, 2 ORDER BY shard, chunk""".stripMargin,
    "corpus_sample_mix" ->
      """WITH m AS (
        |  SELECT source, doc_id,
        |    CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 15)) AS BIGINT)
        |      % 1000 AS draw,
        |    250 + 50 * (CAST(substr(source, 4) AS INT) % 10) AS rate_pm
        |  FROM documents)
        |SELECT source, count(*) AS n_total,
        |  CAST(sum(CASE WHEN draw < rate_pm THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(max(rate_pm) AS BIGINT) AS rate_pm,
        |  CAST(sum(CASE WHEN draw < rate_pm THEN doc_id END) AS BIGINT)
        |    AS kept_id_sum
        |FROM m GROUP BY source ORDER BY source""".stripMargin,
    "text_lm_perplexity" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l
        |  FROM documents),
        |g AS (SELECT doc_id,
        |    unnest(list_filter(list_transform(l,
        |      (x, i) -> CASE WHEN i < len(l) THEN x END),
        |      v -> v IS NOT NULL)) AS w1,
        |    unnest(list_filter(list_transform(l,
        |      (x, i) -> CASE WHEN i < len(l) THEN x || ' ' || l[i+1] END),
        |      v -> v IS NOT NULL)) AS bg
        |  FROM t),
        |uni AS (SELECT w1, count(*) AS c1 FROM g GROUP BY 1),
        |bi AS (SELECT bg, count(*) AS c2 FROM g GROUP BY 1),
        |db AS (SELECT doc_id, w1, bg, count(*) AS k FROM g GROUP BY 1, 2, 3),
        |j AS (SELECT db.doc_id, db.k, ln(bi.c2 / uni.c1::DOUBLE) AS lp
        |  FROM db JOIN bi USING (bg) JOIN uni USING (w1))
        |SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
        |  round(sum(k * lp) / sum(k), 6) AS avg_logp
        |FROM j GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // group-count formulation (vs the engine's one-scan sorted-runs fold)
    // — independent derivation of the same metrics
    "text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l
        |  FROM documents),
        |b AS (SELECT doc_id, unnest(list_filter(list_transform(l,
        |    (x, i) -> CASE WHEN i < len(l) THEN x || ' ' || l[i+1] END),
        |    g -> g IS NOT NULL)) AS g FROM t),
        |bc AS (SELECT doc_id, g, count(*) AS c FROM b GROUP BY 1, 2),
        |bm AS (SELECT doc_id, sum(c) AS nb, max(c) AS top FROM bc
        |  GROUP BY 1),
        |tr AS (SELECT doc_id, unnest(list_filter(list_transform(l,
        |    (x, i) -> CASE WHEN i < len(l) - 1
        |      THEN x || ' ' || l[i+1] || ' ' || l[i+2] END),
        |    g -> g IS NOT NULL)) AS g FROM t),
        |tc AS (SELECT doc_id, g, count(*) AS c FROM tr GROUP BY 1, 2),
        |tm AS (SELECT doc_id, sum(c) AS nt,
        |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup FROM tc
        |  GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(bm.nb, 0) AS BIGINT) AS n_bigrams,
        |  CAST(coalesce(bm.top, 0) AS BIGINT) AS top_bigram_n,
        |  round(coalesce(bm.top, 0) /
        |    greatest(coalesce(bm.nb, 0), 1)::DOUBLE, 6) AS top_bigram_frac,
        |  CAST(coalesce(tm.nt, 0) AS BIGINT) AS n_trigrams,
        |  CAST(coalesce(tm.dup, 0) AS BIGINT) AS dup_trigram_occ,
        |  round(coalesce(tm.dup, 0) /
        |    greatest(coalesce(tm.nt, 0), 1)::DOUBLE, 6) AS dup_trigram_frac
        |FROM documents d
        |LEFT JOIN bm ON d.doc_id = bm.doc_id
        |LEFT JOIN tm ON d.doc_id = tm.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "text_pii_redact" ->
      """WITH w AS (
        |  SELECT doc_id, text || ' contact user' || doc_id::VARCHAR ||
        |    '@mail.example.com or +1-555-' ||
        |    lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
        |    ' ip 10.' || (doc_id % 256)::VARCHAR || '.0.1' AS dirty
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(dirty,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_email,
        |  CAST(len(regexp_extract_all(dirty, '\+1-555-[0-9]{4}')) AS BIGINT)
        |    AS n_phone,
        |  CAST(len(regexp_extract_all(dirty, '10\.[0-9]{1,3}\.0\.1'))
        |    AS BIGINT) AS n_ip,
        |  regexp_replace(regexp_replace(regexp_replace(dirty,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>',
        |    'g'), '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
        |    '10\.[0-9]{1,3}\.0\.1', '<IP>', 'g') AS redacted
        |FROM w ORDER BY doc_id""".stripMargin,
    "text_gopher_filter" ->
      s"""WITH m AS (
        |  SELECT doc_id, str_split(text, ' ') AS toks,
        |    len(str_split(text, ' ')) AS n_tokens,
        |    list_reduce(list_prepend(0::BIGINT,
        |      list_transform(str_split(text, ' '),
        |        x -> length(x)::BIGINT)), (a, b) -> a + b) /
        |      len(str_split(text, ' '))::DOUBLE AS mwl,
        |    len(list_filter(str_split(text, ' '), t -> t IN $stopInSql))
        |      AS n_stop_hits,
        |    len(list_distinct(str_split(text, ' '))) /
        |      len(str_split(text, ' '))::DOUBLE AS dr
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, n_tokens, mwl, n_stop_hits, dr,
        |    CASE WHEN n_tokens < 50 OR n_tokens > 100000
        |      THEN 'doc_length' END AS r_len,
        |    CASE WHEN mwl < 3.0 OR mwl > 10.0
        |      THEN 'mean_word_length' END AS r_mwl,
        |    CASE WHEN n_stop_hits < 2 THEN 'stopword_floor' END AS r_stop,
        |    CASE WHEN dr <= 0.2 THEN 'repetition' END AS r_rep
        |  FROM m)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  round(mwl, 6) AS mean_tok_len,
        |  CAST(n_stop_hits AS BIGINT) AS n_stop_hits,
        |  round(dr, 6) AS distinct_ratio,
        |  (r_len IS NULL AND r_mwl IS NULL AND r_stop IS NULL
        |    AND r_rep IS NULL) AS keep,
        |  concat_ws(',', r_len, r_mwl, r_stop, r_rep) AS reasons
        |FROM f ORDER BY doc_id""".stripMargin,
    "corpus_pipeline" ->
      s"""WITH h AS (
        |  SELECT doc_id, text, md5(trim(regexp_replace(regexp_replace(
        |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')))
        |    AS norm_hash
        |  FROM documents),
        |kept AS (
        |  SELECT doc_id, text, norm_hash, row_number() OVER (
        |    PARTITION BY norm_hash ORDER BY doc_id) AS rn
        |  FROM h),
        |m AS (
        |  SELECT doc_id, norm_hash, str_split(text, ' ') AS toks
        |  FROM kept WHERE rn = 1),
        |scored AS (
        |  SELECT doc_id, norm_hash, len(toks) AS n_tokens,
        |    round(len(list_distinct(toks)) / len(toks)::DOUBLE, 6)
        |      AS distinct_ratio,
        |    round(len(list_filter(toks, t -> t IN $stopInSql)) /
        |      len(toks)::DOUBLE, 6) AS stop_ratio
        |  FROM m)
        |SELECT doc_id, norm_hash, n_tokens, distinct_ratio, stop_ratio
        |FROM scored
        |WHERE n_tokens >= 5 AND distinct_ratio >= 0.3 AND stop_ratio >= 0.05
        |ORDER BY doc_id""".stripMargin,
    "text_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(str_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
        |  GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    round(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, term) AS rk FROM scored)
        |SELECT doc_id, rk, term, tf, df, tfidf FROM r WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,
    "dedup_normalized" ->
      """WITH h AS (
        |  SELECT doc_id, md5(trim(regexp_replace(regexp_replace(
        |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')))
        |    AS norm_hash
        |  FROM documents)
        |SELECT doc_id, norm_hash,
        |  count(*) OVER (PARTITION BY norm_hash) > 1 AS is_dup,
        |  min(doc_id) OVER (PARTITION BY norm_hash) AS keeper_id
        |FROM h ORDER BY doc_id""".stripMargin,
    // 48-bit md5 gram hash ≡ CAST('0x'||substr(md5(g),1,12) AS BIGINT);
    // window minima via list slicing; fingerprint set = distinct minima
    "text_winnow" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    list_transform(range(1, greatest(length(text) - 4, 1) + 1),
        |      i -> CAST(('0x' || substr(md5(substr(text, i::INTEGER, 5)),
        |        1, 12)) AS BIGINT)) AS hs
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, len(hs) AS n_grams,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(hs) - 4 + 1, 1) + 1),
        |      j -> list_aggregate(hs[j:least(j + 3, len(hs))], 'min')))
        |      AS fps
        |  FROM h)
        |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
        |  CAST(len(fps) AS BIGINT) AS n_fp,
        |  CAST(list_aggregate(fps, 'sum') AS BIGINT) AS fp_sum,
        |  CAST(list_aggregate(fps, 'min') AS BIGINT) AS fp_min
        |FROM w ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      s"""SELECT doc_id, lang,
        |  CASE WHEN round(len(list_filter(str_split(text, ' '),
        |      t -> t IN $stopInSql))::DOUBLE /
        |      len(str_split(text, ' ')), 6) >= 0.05
        |    THEN 'en' ELSE 'unknown' END AS pred_lang,
        |  round(len(list_filter(str_split(text, ' '),
        |      t -> t IN $stopInSql))::DOUBLE /
        |    len(str_split(text, ' ')), 6) AS stop_ratio,
        |  len(str_split(text, ' ')) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""WITH t AS (SELECT doc_id, n_chars, str_split(text, ' ') AS toks
        |  FROM documents),
        |m AS (SELECT doc_id, n_chars,
        |    len(toks) AS n_tokens,
        |    len(list_distinct(toks)) AS n_distinct,
        |    round(list_reduce(list_prepend(0::BIGINT,
        |        list_transform(toks, x -> length(x)::BIGINT)),
        |      (a, b) -> a + b) / len(toks)::DOUBLE, 6) AS mean_tok_len,
        |    round(len(list_distinct(toks)) / len(toks)::DOUBLE, 6)
        |      AS distinct_ratio,
        |    round(len(list_filter(toks, t -> t IN $stopInSql)) /
        |      len(toks)::DOUBLE, 6) AS stop_ratio
        |  FROM t)
        |SELECT doc_id, n_chars, n_tokens, n_distinct, mean_tok_len,
        |  distinct_ratio, stop_ratio,
        |  round(0.4 * least(n_tokens / 100.0, 1.0) + 0.4 * distinct_ratio
        |    + 0.2 * stop_ratio, 6) AS quality_score
        |FROM m ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  len(str_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))
        |    AS bpe_ish,
        |  length(text) AS n_chars_m
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(7::BIGINT,
        |    list_transform(str_split(text, ' '),
        |      t -> (length(t) * ascii(substr(t, 1, 1)))::BIGINT)),
        |    (acc, v) -> (acc * 31 + v) % 1000000007) AS rolling_fp,
        |  md5(array_to_string(list_sort(list_distinct(str_split(text, ' '))),
        |    ' ')) AS canonical_fp
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
