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
/** Primitive per-row kernels shared by the dedup operators (serializable,
  * executor-side; tight loops instead of interpreted HOF expressions). */
object DedupKernels extends Serializable {
  /** Exact Jaccard of two SORTED long arrays via one merge scan, rounded
    * to 6 (HALF_UP — matches Spark's and DuckDB's round). */
  def jaccardSorted(a: Array[Long], b: Array[Long]): Double = {
    var i = 0; var j = 0; var inter = 0L
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    BigDecimal(inter.toDouble / union)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Distinct char-5-gram shingles of `text`. */
  def shingleSet(text: String): Array[String] = {
    val n = math.max(text.length - 4, 1)
    val hs = new scala.collection.mutable.LinkedHashSet[String]
    var i = 0
    while (i < n) {
      hs += text.substring(i, math.min(i + 5, text.length)); i += 1
    }
    hs.toArray
  }

  /** 48-bit integer from the first 12 hex chars of md5 — identical to
    * Spark `conv(substring(md5(s),1,12),16,10)` and DuckDB
    * `CAST('0x'||substr(md5(s),1,12) AS BIGINT)`. */
  def md5Int48(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = md.digest(s.getBytes("UTF-8"))
    // first 12 hex chars = first 6 bytes
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v
  }

  /** Winnowing fingerprints (MOSS scheme, shared with text_winnow and
    * dedup_substring): 48-bit md5 hashes of char-5-grams, sliding window
    * of 4, keep each window's minimum; returns (n_grams, distinct minima
    * in first-selected order). Any shared substring ≥ 8 chars between two
    * texts guarantees a shared fingerprint. */
  def winnow(text: String): (Int, Array[Long]) = {
    val n = math.max(text.length - 4, 1)
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = md5Int48(text.substring(i, math.min(i + 5, text.length)))
      i += 1
    }
    val w = 4
    val nw = math.max(n - w + 1, 1)
    val sel = new scala.collection.mutable.LinkedHashSet[Long]
    var j = 0
    while (j < nw) {
      var mn = Long.MaxValue
      var k = j
      val end = math.min(j + w, n)
      while (k < end) { if (hs(k) < mn) mn = hs(k); k += 1 }
      sel += mn
      j += 1
    }
    (n, sel.toArray)
  }

  /** 48-bit simhash: majority vote per bit over the shingle md5 hashes
    * (bit set iff ≥ half of the shingles have it set). */
  def simhash48(shingles: Array[String]): Long = {
    val counts = new Array[Int](48)
    var si = 0
    while (si < shingles.length) {
      val h = md5Int48(shingles(si))
      var b = 0
      while (b < 48) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      si += 1
    }
    var v = 0L
    var b = 0
    while (b < 48) {
      if (2 * counts(b) >= shingles.length) v |= (1L << b)
      b += 1
    }
    v
  }
}

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
    * verified with exact Jaccard ≥ 0.6 over the shingle sets.
    *
    * Signature cost: ONE md5 per shingle (reduced mod p = 2^31-1), then 32
    * permutations as universal hashes h_i(m) = (a_i·m + b_i) mod p — pure
    * codegen arithmetic, 32× less hashing than md5-per-permutation. Both
    * factors stay < 2^31 so products fit in a long (no overflow, exactly
    * reproducible in the oracle's BIGINT arithmetic). */
  def minhashLsh(s: SparkSession, d: String): DataFrame = {
    val (banded, result) = minhashLshPlanned(s, d)
    val res = result.localCheckpoint() // materialize the (small) result …
    banded.unpersist()                 // … so the signature cache frees now
    res
  }

  /** The lazy LSH pipeline + its cached signature relation (separate from
    * [[minhashLsh]] so plan-shape tests can inspect the join strategy
    * before checkpointing truncates the lineage). */
  private[graft] def minhashLshPlanned(
      s: SparkSession, d: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val p31 = 2147483647L // 31-bit universe keeps a_i·m inside a long
    // shingle → minhash signatures + band keys in one narrow typed pass
    // (tight primitive loops; HOF exprs would run interpreted, ~50× slower).
    // The corpus parquet is one small file = ONE scan partition, which
    // would run this CPU-bound kernel single-threaded — repartition to the
    // core count first (at real scale the scan has many splits already;
    // the rule stands: size partitions to cores for kernel stages).
    val banded = documents(s, d).select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          // distinct char-5-gram shingles, 64-bit hashed, reduced mod p31
          val n = math.max(text.length - 4, 1)
          val hs = new scala.collection.mutable.HashSet[Long]
          var i = 0
          while (i < n) {
            val sgl = text.substring(i, math.min(i + 5, text.length))
            val h = (scala.util.hashing.MurmurHash3.stringHash(sgl, 0x9747b28c)
              .toLong << 32) |
              (scala.util.hashing.MurmurHash3.stringHash(sgl, 0x85ebca6b)
                .toLong & 0xffffffffL)
            hs += math.floorMod(h, p31)
            i += 1
          }
          val mh = hs.toArray
          // 32 universal-hash permutations h_i(m) = (a_i·m + b_i) mod p31
          val sig = new Array[Long](32)
          var k = 0
          while (k < 32) {
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
          val shSorted = mh.sorted // for the verify join
          (id, shSorted, sig)
        }
      }.toDF("doc_id", "sh", "sig").cache()
    // skinny band rows (doc_id, band_idx, band_hash) — the 8× explosion
    // never carries the shingle arrays through the shuffle
    val bands = banded.select(col("doc_id"),
        explode(expr("transform(sequence(0, 7), b -> named_struct(" +
          "'band_idx', b, 'band_hash', " +
          "element_at(sig, 4*b+1) * 31 + element_at(sig, 4*b+2) * 37 + " +
          "element_at(sig, 4*b+3) * 41 + element_at(sig, 4*b+4) * 43))"))
          .as("band"))
      .select(col("doc_id"), col("band.band_idx"), col("band.band_hash"))
    val candIds = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .dropDuplicates("d1", "d2")
    // re-attach the sets only to surviving candidate pairs. The candidate
    // list is join-derived, so its size is data-dependent and UNKNOWN at
    // plan time: template-heavy corpora grow band buckets linearly with
    // corpus size, hence candidates quadratically (measured: 6 K pairs at
    // sf0.01 → 643 K at sf0.1 → 122 M at 10×). An unconditional
    // broadcast() hint here OOMs the driver exactly when it matters —
    // leave the choice to AQE, which sees the REAL candidate size at
    // runtime (still broadcasts at small scale, shuffles at large). The
    // quadratic candidate growth itself is why production pipelines run
    // canonical/exact dedup (corpus_pipeline's first stage) before LSH:
    // template clusters collapse to one representative each.
    val sets = banded.select(col("doc_id"), col("sh"))
    val cand = candIds
      .join(sets.withColumnRenamed("doc_id", "d1")
        .withColumnRenamed("sh", "sh1"), Seq("d1"))
      .join(sets.withColumnRenamed("doc_id", "d2")
        .withColumnRenamed("sh", "sh2"), Seq("d2"))
      .select("d1", "d2", "sh1", "sh2")
    // exact-Jaccard verification over the sorted hash sets (typed merge
    // scan: O(|A|+|B|) per candidate pair)
    val res = cand.as[(Long, Long, Array[Long], Array[Long])]
      .map { case (d1, d2, a, b) =>
        (d1, d2, DedupKernels.jaccardSorted(a, b))
      }
      .toDF("d1", "d2", "j")
      .filter(col("j") >= 0.6)
      .orderBy("d1", "d2")
    (banded, res)
  }

  /** dedup_simhash: 48-bit simhash (majority vote per bit over shingle
    * hashes), 4×12-bit chunk banding, verified hamming ≤ 3.
    * Simhash values are md5-derived in a typed kernel — bit-identical to
    * the oracle's SQL formulation but computed in one tight pass. */
  def simhash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d)
      .select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism) // one-file scan → cores
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, DedupKernels.simhash48(DedupKernels.shingleSet(text)))
      })
      .toDF("doc_id", "sh48")
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

  /** Triangle-partitioning fan-out for ngramJaccard: number of hash groups
    * the docs of one length bucket are split into. A bucket of m docs
    * spreads its inherent m²/2 comparisons over g(g+1)/2 cells of ≤2m/g
    * docs each, so a degenerate corpus (every doc the same length — the
    * NORM for fixed-token-chunk pre-training data) parallelizes instead of
    * collapsing into one O(m²) task. Total compute is unchanged (exact
    * all-pairs within the band is the query's semantics); replication cost
    * is 2g rows per doc. */
  private[graft] val jaccardCellGroups = 4

  /** dedup_ngram_jaccard: word-trigram shingles, blocking on the n_chars
    * bucket (both docs in the same 100-char band), exact Jaccard ≥ 0.5.
    * Non-probabilistic alternative to LSH: block bound makes the join
    * O(block²) instead of O(n²). */
  def ngramJaccard(s: SparkSession, d: String): DataFrame =
    ngramJaccardOn(s, documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)) // one-file scan → cores

  /** Replicated cell-key stage of ngramJaccard, exposed so the bucket-size
    * invariant is testable on an arbitrary corpus (EngineSpec feeds a
    * uniform-length one). Emits one row per (length bucket, triangle cell)
    * replica: (bkey, lo, hi, doc_id, blk, grp, g3). */
  private[graft] def jaccardCellKeys(docs: DataFrame): DataFrame = {
    // trigrams hashed to 64-bit (xxhash64): set operations over longs are
    // ~10× cheaper than over strings; cardinalities (and hence j) are
    // unchanged absent 64-bit collisions. 25-char blocking keeps block
    // sizes bounded as the corpus grows (near-identical docs have
    // near-identical lengths).
    val grams = expr(
      "array_distinct(transform(sequence(1, greatest(size(split(text, ' '))" +
        " - 2, 1)), i -> xxhash64(concat_ws(' ', slice(split(text, ' '), " +
        "i, 3)))))")
    // each doc keys into its own and the next bucket, so every pair with
    // |Δn_chars| ≤ 25 meets in some bucket (no boundary misses). A pair
    // meets in EXACTLY the bucket greatest(blkA, blkB) (equal blocks share
    // both buckets but greatest picks one; adjacent blocks share only the
    // higher), so that in-loop predicate dedups pairs with no shuffle.
    //
    // WITHIN a bucket, docs are further hashed into g groups and each doc
    // replicated to the g triangle cells (min(grp,x), max(grp,x)) — a pair
    // with groups (a,b), a≠b, co-occurs exactly in cell (a,b); a same-
    // group pair co-occurs in every cell (a,x) but is compared only in
    // (a,a) (the in-loop group predicate). This bounds every task at
    // (2m/g)² work even when all docs share one length band — blocking on
    // length alone degenerates on fixed-size-chunk corpora.
    val g = jaccardCellGroups
    docs
      .select(col("doc_id"), (col("n_chars") / 25).cast("int").as("blk"),
        pmod(xxhash64(col("doc_id")), lit(g)).cast("int").as("grp"),
        array_sort(grams).as("g3"))
      .withColumn("bkey", explode(array(col("blk"), col("blk") + 1)))
      .withColumn("cell", explode(expr(
        s"transform(sequence(0, ${g - 1}), x -> " +
          "struct(least(grp, x) as lo, greatest(grp, x) as hi))")))
      .select(col("bkey"), col("cell.lo").as("lo"), col("cell.hi").as("hi"),
        col("doc_id"), col("blk"), col("grp"), col("g3"))
  }

  private[graft] def ngramJaccardOn(s: SparkSession,
                                    docs: DataFrame): DataFrame = {
    // Execution: shuffle the O(n·2g) doc replicas (with trigram arrays)
    // once by (bucket, cell), then run the pair loop INSIDE flatMapGroups —
    // each doc's array deserializes once per cell, not once per pair, and
    // no candidate-pair rows ever materialize; only survivors are emitted.
    // The cheap size-ratio test (j ≥ 0.5 ⇒ min/max ≥ 0.5) gates the
    // O(|A|+|B|) merge scan.
    import s.implicits._
    jaccardCellKeys(docs)
      .as[(Int, Int, Int, Long, Int, Int, Array[Long])]
      .groupByKey(t => (t._1, t._2, t._3))
      .flatMapGroups { (key, it) =>
        val (bkey, lo, hi) = key
        val ds = it.toArray
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Double)]
        var i = 0
        while (i < ds.length) {
          var k = i + 1
          while (k < ds.length) {
            val (x, y) = if (ds(i)._4 < ds(k)._4) (ds(i), ds(k))
                         else (ds(k), ds(i))
            // group predicate: mixed cells compare only cross-group pairs
            // (same-group pairs belong to their diagonal cell (a,a))
            if ((if (lo == hi) x._6 == y._6 else x._6 != y._6) &&
                bkey == math.max(x._5, y._5)) {
              val la = x._7.length; val lb = y._7.length
              if (math.min(la, lb) * 2 >= math.max(la, lb)) {
                val j = DedupKernels.jaccardSorted(x._7, y._7)
                if (j >= 0.5) out += ((x._4, y._4, j))
              }
            }
            k += 1
          }
          i += 1
        }
        out.iterator
      }
      .toDF("d1", "d2", "j")
      .orderBy("d1", "d2")
  }

  /** dedup_embedding_nn: per-vector EXACT nearest neighbour by cosine.
    *
    * Execution: BLOCK-PARTITIONED cross product, fully distributed — no
    * driver-side materialization of the matrix, ever. Vectors are hashed
    * into `nB` matrix blocks (`pmod(vec_id, nB)`, ~4k vectors each) and
    * probes into `pSh` hash shards; a COGROUP on (blk, shard) — probes
    * replicated per block, matrix rows per shard — gives each of the
    * nB·pSh tasks ONE decoded matrix block (bounded ~2 MB) and a probe
    * sub-iterator streamed past it through the primitive-double block
    * kernel (the inner loop every exact-NN system bottoms out in),
    * emitting one per-block partial argmax per probe; a final
    * key-partitioned max(struct) combines partials. Shuffle volume is
    * n·nB probe rows + n·pSh matrix rows — the O(n²) compute inherent to
    * exact NN, paid as bounded-size tasks instead of a driver OOM; truly
    * huge corpora route to the IVF/SRP paths in Similarity.scala.
    *
    * Determinism: cosine = sequential fold over dims (identical order to
    * the oracle's list_reduce; `aggregate(v, 0.0, +)` folds in element
    * order exactly like the while-loop), rounded to 6 before the argmax;
    * ties break toward the smaller neighbour id — within a block via the
    * (cos, id) comparison, across blocks via max(struct(cos, -id)). */
  def embeddingNn(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // nB from the row count (a metadata-only count, not a data collect):
    // ≥2 so the cross-block combine is always exercised, ~4096 vectors per
    // block (~2 MB of task-resident matrix) at scale.
    val nB = math.max(2,
      math.ceil(embeddings(s, d).count() / 4096.0).toInt)
    val e = embeddings(s, d).select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"),
      sqrt(expr("aggregate(transform(embedding, x -> cast(x as double)), " +
        "cast(0.0 as double), (a, x) -> a + x * x)")).as("nrm"))
      .repartition(s.sparkContext.defaultParallelism) // one-file scan → cores
    val pSh = s.sparkContext.defaultParallelism // probe shards per block
    val mat = e.select(
        pmod(col("vec_id"), lit(nB)).cast("int").as("blk"),
        explode(sequence(lit(0), lit(pSh - 1))).as("shard"),
        col("vec_id"), col("v"), col("nrm"))
      .as[(Int, Int, Long, Array[Double], Double)]
      .groupByKey(t => (t._1, t._2))
    val probes = e.select(
        explode(sequence(lit(0), lit(nB - 1))).as("blk"),
        pmod(xxhash64(col("vec_id")), lit(pSh)).cast("int").as("shard"),
        col("vec_id"), col("v"), col("nrm"))
      .as[(Int, Int, Long, Array[Double], Double)]
      .groupByKey(t => (t._1, t._2))
    probes.cogroup(mat) { (_, ps, ms) =>
      val m = ms.toArray // the block decodes ONCE per task, not per probe
      def dot(a: Array[Double], b: Array[Double]): Double = {
        var acc = 0.0; var i = 0
        while (i < a.length) { acc += a(i) * b(i); i += 1 }
        acc
      }
      ps.flatMap { case (_, _, pid, pv, pn) =>
        var bestId = -1L; var bestCos = Double.MinValue
        var i = 0
        while (i < m.length) {
          val (_, _, mid, mv, mn) = m(i)
          if (mid != pid) {
            val raw = dot(pv, mv) / (pn * mn)
            // rounding (BigDecimal, expensive) only when the raw value
            // could round to >= the current best: raw < best - 6e-7 can
            // never win, which skips the allocation for ~all of the
            // comparisons without changing the rounded-argmax semantics
            if (raw > bestCos - 6e-7) {
              val c = BigDecimal(raw)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              if (c > bestCos || (c == bestCos && mid < bestId)) {
                bestCos = c; bestId = mid
              }
            }
          }
          i += 1
        }
        if (bestId >= 0) Iterator((pid, bestId, bestCos))
        else Iterator.empty
      }
    }
      .toDF("vec_id", "nn_id", "nn_cos")
      .groupBy("vec_id")
      .agg(max(struct(col("nn_cos"), (-col("nn_id")).as("neg_id"))).as("m"))
      .select(col("vec_id"), (-col("m.neg_id")).as("nn_id"),
        col("m.nn_cos").as("nn_cos"))
      .orderBy("vec_id")
  }

  /** Distributed connected-components kernel: min-label propagation with
    * POINTER JUMPING. Input is a symmetric `(src, dst)` edge list; output
    * is `(node, lab)` where `lab` = the component's minimum node id, plus
    * the number of rounds the fixpoint took.
    *
    * Each round does two keyed joins:
    *   1. neighbor step — every node takes the min label over itself and
    *      its neighbors (the classic propagation hop);
    *   2. jump step — every node follows its own label pointer once more:
    *      `lab := min(lab, lab(lab))` (path doubling).
    * The jump is what turns O(diameter) rounds into O(log diameter): a
    * chain of length k converges in ~log₂k rounds because label pointers
    * double their reach every round, the same reason pointer-jumping PRAM
    * CC is logarithmic. At 100 TB this is the difference between a
    * 10-round job and a 10,000-round job on chain-shaped near-dup
    * clusters; per round the work stays two shuffles on node ids (the
    * jump's probe side has duplicate keys but unique build keys — output
    * size equals input size, no blow-up).
    *
    * Convergence via the label-sum invariant: labels are monotone
    * non-increasing per node, so the total strictly decreases on every
    * changing round and "sum unchanged" IS the fixpoint — one O(1)-row
    * aggregate per round instead of a diff join (decimal(38,0) so node-id
    * sums can't wrap at any corpus size). At the fixpoint, symmetric
    * edges force equal labels across every edge, and the minimum node of
    * a component labels itself, so the shared label is exactly the
    * component min. Deterministic at any parallelism.
    * `localCheckpoint` keeps per-round lineage flat. */
  def ccLabels(edges0: DataFrame): (DataFrame, Int) = {
    val sp = edges0.sparkSession
    val base = edges0.toDF("src", "dst").localCheckpoint()
    // r17's edge-count-derived shuffle sizing (+ scoped AQE-off) was
    // REVERTED in r18 after the isolated re-measure VERDICT r17 #4
    // asked for: interleaved A/B at 32 and 8 cores read 5.16/3.74 s
    // (sized) vs 4.74/4.19 s (session defaults) — inside the box's
    // noise band, no ≥10% win at either width (numbers in
    // OPTIMIZATION_r18.md). Removing it also removes the session-global
    // conf mutation ADVICE r17 flagged as a latent concurrent-query race
    // and the extra base.count() job.
    locally {
      val nodes = base.select(col("src").as("node")).distinct()
        .localCheckpoint()
      // self-loops fold "keep your own label" into the neighbor join, so a
      // round is ONE join + ONE aggregate (no per-round union)
      val edges = base.unionByName(
        nodes.select(col("node").as("src"), col("node").as("dst")))
        .localCheckpoint()
      var labels = nodes.withColumn("lab", col("node")).localCheckpoint()
      def labSum(df: DataFrame): java.math.BigDecimal =
        df.agg(sum(col("lab").cast("decimal(38,0)")).as("s"))
          .collect()(0).getDecimal(0)
      var prevSum = labSum(labels)
      var changed = true
      var rounds = 0
      while (changed) {
        // LAZY checkpoints (r18): a round used to be THREE driver
        // round-trips — eager prop checkpoint, eager jumped checkpoint,
        // labSum collect. With eager=false the single labSum job
        // materializes prop (computed once, cached by the checkpoint
        // even though jumped references it twice), then jumped, then
        // the O(1)-row sum — one job per round, identical values, and
        // the lineage still truncates at the checkpointed RDDs so later
        // rounds stay one-round deep.
        val prop = edges.join(labels, col("dst") === col("node"))
          .select(col("src").as("node"), col("lab"))
          .groupBy("node").agg(min("lab").as("lab"))
          .localCheckpoint(false)
        val jumped = prop.as("a")
          .join(prop.select(col("node").as("jn"), col("lab").as("jlab")),
            col("a.lab") === col("jn"), "left_outer")
          .select(col("a.node").as("node"),
            least(col("a.lab"), coalesce(col("jlab"), col("a.lab")))
              .as("lab"))
          .localCheckpoint(false)
        val s = labSum(jumped)
        changed = s.compareTo(prevSum) != 0
        prevSum = s
        labels = jumped
        rounds += 1
      }
      (labels, rounds)
    }
  }

  /** dedup_components: near-dup CLUSTERS — connected components over the
    * LSH dup-pair graph, so each group of transitively-linked documents
    * gets one canonical keeper (min doc_id) instead of a bag of pairs.
    * The fixpoint kernel is [[ccLabels]] (pointer-jumped min-label
    * propagation, O(log diameter) rounds). */
  def componentsWithRounds(s: SparkSession, d: String): (DataFrame, Int) = {
    val (banded, pairsDf) = minhashLshPlanned(s, d)
    val base = pairsDf.select(col("d1"), col("d2")).localCheckpoint()
    banded.unpersist()
    val edges = base
      .unionByName(base.select(col("d2").as("d1"), col("d1").as("d2")))
      .toDF("src", "dst")
    val (labels, rounds) = ccLabels(edges)
    val sizes = labels.groupBy("lab").agg(count(lit(1)).as("component_size"))
    val out = labels.join(sizes, "lab")
      .select(col("node").as("doc_id"), col("lab").as("component_id"),
        col("component_size"))
      .orderBy("doc_id")
    (out, rounds)
  }

  def components(s: SparkSession, d: String): DataFrame =
    componentsWithRounds(s, d)._1

  /** dedup_keeper_filter: the end of the dedup pipeline — the corpus
    * AFTER near-dup removal: every document not in any dup component, plus
    * each component's canonical keeper (min doc_id). This is the actual
    * "training set post-dedup" a pipeline materializes. */
  def keeperFilter(s: SparkSession, d: String): DataFrame = {
    val comp = components(s, d)
      .select(col("doc_id"), col("component_id"))
    documents(s, d).select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left_outer")
      .filter(col("component_id").isNull ||
        col("component_id") === col("doc_id"))
      .select(col("doc_id"),
        when(col("component_id").isNull, "unique").otherwise("keeper")
          .as("keep_reason"))
      .orderBy("doc_id")
  }

  /** dedup_substring: long-shared-substring detection via winnowing
    * fingerprints (the scalable stand-in for suffix-array exact-substring
    * dedup): docs sharing any substring ≥ 8 chars share a winnow
    * fingerprint, so pairs with many shared fingerprints share long /
    * repeated runs of text. Pipeline: per-doc fingerprint sets (typed
    * kernel, one scan) → explode → drop STOP FINGERPRINTS (absolute
    * document frequency > 25: a truly shared rare substring has df ≈
    * cluster size at ANY corpus scale, while boilerplate df grows with
    * the corpus — the absolute cap both kills the template noise and
    * bounds the join fan-out per key to df², making total join work
    * linear in distinct fingerprints) → self-equi-join on fingerprint →
    * count per pair, keep ≥ 8. Never an all-pairs comparison. */
  def substringPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d)
    val maxDf = 25L
    val fps = docs.select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        DedupKernels.winnow(text)._2.map(fp => (id, fp))
      })
      .toDF("doc_id", "fp")
    val stop = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("fp")
    val pruned = fps.join(broadcast(stop), Seq("fp"), "left_anti")
    pruned.as("a")
      .join(pruned.as("b"), col("a.fp") === col("b.fp") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 8)
      .orderBy("d1", "d2")
  }

  /** dedup_paragraph: sub-document exact dedup — split each document into
    * 20-token pseudo-paragraphs, report paragraphs appearing more than
    * once across the corpus (the boilerplate/header stripper of
    * pre-training pipelines). The paragraph is md5-hashed BEFORE the
    * groupBy so the corpus-wide shuffle carries 32-hex-char keys, not
    * 20-token strings — at 100 TB the shuffle is ~5% of corpus bytes and
    * uniformly keyed (hash keys can't skew). */
  def paragraphDedup(s: SparkSession, d: String): DataFrame = {
    val P = 20
    documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("hashes", expr(
        s"transform(sequence(0, greatest(cast(ceil(size(toks) / $P.0) " +
          s"as int) - 1, 0)), i -> md5(array_join(slice(toks, i * $P + 1, " +
          s"$P), ' ')))"))
      .select(col("doc_id"), explode(col("hashes")).as("para_hash"))
      .groupBy("para_hash")
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > 1)
      .orderBy("para_hash")
  }

  /** corpus_decontaminate: benchmark DECONTAMINATION — flag training
    * documents sharing any 8-token n-gram with the evaluation/benchmark
    * set (the standard pre-training hygiene step: eval contamination
    * inflates benchmark scores, so contaminated docs are dropped or
    * flagged before training). Here the benchmark set is the synthetic
    * stand-in `doc_id % 7 == 0`; a real pipeline feeds the actual eval
    * suites.
    *
    * Execution: one scan builds md5'd 8-gram streams for both sides;
    * the benchmark's DISTINCT gram set broadcasts (an eval suite is
    * fixed-size — MB-scale against a 100 TB corpus BY DEFINITION, which
    * is what makes decontamination a broadcast semi-join, not a
    * shuffle); corpus grams hash-join against it and aggregate per doc.
    * Like [[paragraphDedup]], grams are md5'd BEFORE any join so the
    * broadcast and probe carry 32-hex keys, not raw text. */
  def decontaminate(s: SparkSession, d: String): DataFrame = {
    val G = 8
    val grams = documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .where(size(col("toks")) >= G)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(toks) - $G), " +
          s"i -> md5(array_join(slice(toks, i + 1, $G), ' ')))"))
        .as("gram"))
    val bset = grams.where(pmod(col("doc_id"), lit(7)) === 0)
      .select("gram").distinct()
    grams.where(pmod(col("doc_id"), lit(7)) =!= 0)
      .join(broadcast(bset), Seq("gram"))
      .groupBy("doc_id")
      .agg(countDistinct("gram").as("n_shared"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "corpus_decontaminate" -> (decontaminate _),
    "dedup_paragraph"     -> (paragraphDedup _),
    "dedup_substring"     -> (substringPairs _),
    "dedup_keeper_filter" -> (keeperFilter _),
    "dedup_exact"         -> (exact _),
    "dedup_minhash_lsh"   -> (minhashLsh _),
    "dedup_simhash"       -> (simhash _),
    "dedup_ngram_jaccard" -> (ngramJaccard _),
    "dedup_embedding_nn"  -> (embeddingNn _),
    "dedup_components"    -> (components _)
  )

  private val shinglesSql =
    "list_distinct(list_transform(range(1, greatest(length(text)-4, 1) + 1)," +
      " i -> substr(text, i, 5)))"

  val oracle: Map[String, String] = Map(
    // DuckDB list slicing is 1-based inclusive: t[i:i+7] = 8 tokens
    "corpus_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(t) - 7),
        |    i -> md5(array_to_string(t[i:i+7], ' ')))) AS gram
        |  FROM toks WHERE len(t) >= 8),
        |bset AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 7 = 0)
        |SELECT g.doc_id, count(DISTINCT g.gram) AS n_shared
        |FROM grams g JOIN bset b USING (gram)
        |WHERE g.doc_id % 7 <> 0
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "dedup_paragraph" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l
        |  FROM documents),
        |p AS (SELECT doc_id, unnest(list_transform(
        |    generate_series(0, greatest(CAST(ceil(len(l) / 20.0) AS INT)
        |      - 1, 0)),
        |    i -> md5(array_to_string(l[(i*20+1):(i*20+20)], ' '))))
        |    AS para_hash
        |  FROM t)
        |SELECT para_hash, count(DISTINCT doc_id) AS n_docs,
        |  count(*) AS n_occ
        |FROM p GROUP BY 1 HAVING count(*) > 1
        |ORDER BY para_hash""".stripMargin,
    // same winnow CTE as text_winnow; stop-fingerprint prune at df > 50
    "dedup_substring" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    list_transform(range(1, greatest(length(text) - 4, 1) + 1),
        |      i -> CAST(('0x' || substr(md5(substr(text, i::INTEGER, 5)),
        |        1, 12)) AS BIGINT)) AS hs
        |  FROM documents),
        |w AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(hs) - 4 + 1, 1) + 1),
        |      j -> list_aggregate(hs[j:least(j + 3, len(hs))], 'min')))
        |      AS fps
        |  FROM h),
        |f AS (SELECT doc_id, unnest(fps) AS fp FROM w),
        |keep AS (
        |  SELECT fp FROM f GROUP BY fp HAVING count(*) <= 25),
        |pruned AS (SELECT f.doc_id, f.fp FROM f JOIN keep USING (fp)),
        |pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared
        |  FROM pruned a JOIN pruned b ON a.fp = b.fp
        |    AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2, n_shared FROM pairs WHERE n_shared >= 8
        |ORDER BY d1, d2""".stripMargin,
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
      """WITH g AS (SELECT doc_id, CAST(n_chars // 25 AS INTEGER) AS blk,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(str_split(text, ' ')) - 2, 1) + 1),
        |      i -> array_to_string(str_split(text, ' ')[i:i+2], ' '))) AS g3
        |  FROM documents)
        |SELECT * FROM (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    round(len(list_intersect(a.g3, b.g3))::DOUBLE /
        |      len(list_distinct(list_concat(a.g3, b.g3))), 6) AS j
        |  FROM g a JOIN g b ON abs(a.blk - b.blk) <= 1
        |    AND a.doc_id < b.doc_id) t
        |WHERE j >= 0.5 ORDER BY d1, d2""".stripMargin,
    "dedup_keeper_filter" ->
      s"""WITH RECURSIVE sh AS (
        |  SELECT doc_id, $shinglesSql AS tk FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE round(len(list_intersect(a.tk, b.tk))::DOUBLE /
        |    len(list_distinct(list_concat(a.tk, b.tk))), 6) >= 0.6),
        |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
        |  UNION SELECT d2, d1 FROM pairs),
        |reach(node, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.node),
        |comp AS (SELECT node, min(r) AS component_id FROM reach
        |  GROUP BY node)
        |SELECT d.doc_id,
        |  CASE WHEN c.node IS NULL THEN 'unique' ELSE 'keeper' END
        |    AS keep_reason
        |FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
        |WHERE c.node IS NULL OR c.component_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // same brute-force pair truth as dedup_minhash_lsh, closed transitively
    // by a recursive reachability CTE; component id = min reachable doc id
    "dedup_components" ->
      s"""WITH RECURSIVE sh AS (
        |  SELECT doc_id, $shinglesSql AS tk FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE round(len(list_intersect(a.tk, b.tk))::DOUBLE /
        |    len(list_distinct(list_concat(a.tk, b.tk))), 6) >= 0.6),
        |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
        |  UNION SELECT d2, d1 FROM pairs),
        |reach(node, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.node),
        |comp AS (SELECT node, min(r) AS component_id FROM reach
        |  GROUP BY node),
        |sz AS (SELECT component_id, count(*) AS component_size FROM comp
        |  GROUP BY 1)
        |SELECT c.node AS doc_id, c.component_id, s.component_size
        |FROM comp c JOIN sz s USING (component_id)
        |ORDER BY doc_id""".stripMargin,
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
