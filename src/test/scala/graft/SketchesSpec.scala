package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Sketches

/** Sketch guarantees under pressure (capacity < distinct keys), where the
  * oracle-gate queries intentionally run eviction-free. Exercises reduce
  * AND merge paths (chunked folds) to model Spark's partial aggregation.
  * Seeded random streams — deterministic. */
class SketchesSpec extends AnyFunSuite {

  private def stream(seed: Int): List[Long] = {
    val rnd = new scala.util.Random(seed)
    val n = 50 + rnd.nextInt(350)
    List.fill(n) {
      rnd.nextInt(10) match {
        case x if x < 5 => rnd.nextInt(5).toLong       // heavy hitters
        case x if x < 8 => 5L + rnd.nextInt(16)        // mid
        case _ => 21L + rnd.nextInt(180)               // tail
      }
    }
  }

  private def truthOf(xs: List[Long]): Map[Long, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("Misra-Gries: never overestimates; heavy hitters survive merges") {
    val capacity = 8
    val mg = new Sketches.MisraGries(capacity)
    for (seed <- 1 to 40) {
      val xs = stream(seed)
      val nChunks = 1 + seed % 5
      val chunks = xs.grouped(math.max(xs.length / nChunks, 1)).toList
      val buf = chunks.map(c => c.foldLeft(mg.zero)(mg.reduce))
        .reduce(mg.merge)
      val est = mg.finish(buf)
      val truth = truthOf(xs)
      val n = xs.length.toLong
      assert(est.size <= capacity + 1)
      est.foreach { case (k, e) =>
        assert(e <= truth(k), s"seed=$seed overestimate for $k")
      }
      // mergeable-MG guarantee: error ≤ n/(capacity+1) per summary path;
      // allow the merge slack of one decrement per chunk boundary
      val bound = n / (capacity + 1) + chunks.length
      truth.foreach { case (k, t) =>
        if (t > bound)
          assert(est.contains(k), s"seed=$seed heavy hitter $k lost t=$t")
      }
    }
  }

  test("lossy counting: true - eps*n <= est <= true; frequents kept") {
    val bucketWidth = 20 // eps = 1/20
    val lc = new Sketches.LossyCounting(bucketWidth)
    for (seed <- 1 to 40) {
      val xs = stream(seed)
      val est = lc.finish(xs.foldLeft(lc.zero)(lc.reduce))
      val truth = truthOf(xs)
      val n = xs.length.toLong
      est.foreach { case (k, e) =>
        assert(e <= truth(k), s"seed=$seed overestimate for $k")
        assert(truth(k) - e <= n / bucketWidth + 1,
          s"seed=$seed undercount beyond eps*n for $k")
      }
      truth.foreach { case (k, t) =>
        if (t > n / bucketWidth + 1)
          assert(est.contains(k), s"seed=$seed frequent key $k evicted")
      }
    }
  }

  test("count-min: never underestimates, exact sans collisions") {
    for (seed <- 1 to 40) {
      val xs = stream(seed)
      val keys = xs.distinct
      val cms = new Sketches.CountMin(64, 3, keys)
      val (h1, h2) = xs.splitAt(xs.length / 2)
      val buf = cms.merge(
        h1.foldLeft(cms.zero)(cms.reduce),
        h2.foldLeft(cms.zero)(cms.reduce))
      val est = cms.finish(buf)
      val truth = truthOf(xs)
      keys.foreach { k =>
        assert(est(k) >= truth(k), s"seed=$seed CMS underestimated $k")
      }
    }
  }
}
