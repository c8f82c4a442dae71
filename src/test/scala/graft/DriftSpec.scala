package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** s38's model contract on synthetic frames: a genuinely shifted
  * dimension crosses the PSI action bar, an identically-distributed
  * one does not, and the binning clamps out-of-range arrivals instead
  * of dropping them.
  */
class DriftSpec extends AnyFunSuite {

  private def psi(hist: Seq[(Long, Double)], arr: Seq[(Long, Double)]) = {
    val spark = TestSpark.spark
    import spark.implicits._
    Similarity.psiDrift(hist.toDF("dim", "x"), arr.toDF("dim", "x"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
  }

  test("a shifted dimension drifts; an identical one does not") {
    // dim 0: arrivals identical to history -> psi ~ 0 (only smoothing
    // noise). dim 1: history uniform on [0, 8), arrivals all in the
    // top bin -> massive psi.
    val histD0 = (0 until 64).map(i => 0L -> (i % 8).toDouble)
    val histD1 = (0 until 64).map(i => 1L -> (i % 8).toDouble)
    val arrD0 = (0 until 16).map(i => 0L -> (i % 8).toDouble)
    val arrD1 = (0 until 16).map(_ => 1L -> 7.9)
    val out = psi(histD0 ++ histD1, arrD0 ++ arrD1)
    assert(out(0L)._1 == 64L && out(0L)._2 == 16L)
    assert(!out(0L)._4, s"identical distribution flagged: ${out(0L)}")
    assert(out(1L)._4, s"concentrated shift not flagged: ${out(1L)}")
    assert(out(1L)._3 > out(0L)._3)
  }

  test("arrivals outside the frozen range clamp to the edge bins") {
    // History spans [0, 8); arrivals sit far outside on both sides.
    // The frozen-edge binning must CLAMP (bins 0 and 7), never drop —
    // every arrival row is accounted for in n_arr.
    val hist = (0 until 64).map(i => 0L -> (i % 8).toDouble)
    val arr = Seq(0L -> -100.0, 0L -> -5.0, 0L -> 100.0, 0L -> 50.0)
    val out = psi(hist, arr)
    assert(out(0L)._2 == 4L, "clamped arrivals must all be counted")
    assert(out(0L)._4, "an all-out-of-range arrival batch must drift")
  }

  test("a degenerate (constant) history dimension folds to bin 0") {
    val hist = (0 until 16).map(_ => 2L -> 3.0)
    val arr = (0 until 8).map(_ => 2L -> 3.0)
    val out = psi(hist, arr)
    assert(out(2L)._1 == 16L && out(2L)._2 == 8L)
    assert(!out(2L)._4)
  }
}
