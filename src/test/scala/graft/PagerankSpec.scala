package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** d44's model contract on synthetic graphs: rank mass conserves, the
  * power iteration distinguishes the hub-and-spokes profile from the
  * chain profile (the two cluster shapes CC labels cannot tell apart),
  * and symmetric positions tie exactly.
  */
class PagerankSpec extends AnyFunSuite {

  private def ranks(pairs: Seq[(Long, Long)]): Map[Long, (Long, Double)] = {
    val spark = TestSpark.spark
    import spark.implicits._
    Dedup.pagerankOverPairs(pairs.toDF("doc_a", "doc_b"), iters = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
  }

  test("star vs chain: same CC label set, opposite rank profiles") {
    // Star: 0 at the center of 1..4. Chain: 10-11-12-13-14.
    val out = ranks(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L)))
    assert(out.size == 10)
    // Σrank = 1 at the fixpoint of r' = 0.15/N + 0.85·Σ; after 10
    // iterations the mass is conserved to float accumulation error.
    val total = out.values.map(_._2).sum
    assert(math.abs(total - 1.0) < 1e-9, s"rank mass $total")
    // The star's hub dominates every spoke and every chain node.
    val hub = out(0L)._2
    assert(out(0L)._1 == 4L)
    (1L to 4L).foreach(i => assert(hub > out(i)._2))
    (10L to 14L).foreach(i => assert(hub > out(i)._2))
    // Symmetric positions tie EXACTLY (same fold, same doubles).
    assert((1L to 4L).map(out(_)._2).distinct.size == 1)
    assert(out(10L)._2 == out(14L)._2 && out(11L)._2 == out(13L)._2)
    // Chain interior outranks chain ends (two feeders vs one).
    assert(out(12L)._2 > out(10L)._2 && out(11L)._2 > out(10L)._2)
    // Degrees ride along: hub 4, spokes 1, chain interior 2, ends 1.
    assert(out(1L)._1 == 1L && out(11L)._1 == 2L && out(10L)._1 == 1L)
  }

  test("a single pair splits mass evenly") {
    val out = ranks(Seq((7L, 8L)))
    assert(out(7L)._2 == out(8L)._2)
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-12)
  }

  test("iters=30 stays analyzable: periodic checkpoint bounds plan depth") {
    // Without the every-5-rounds localCheckpoint the 30-deep nested
    // join/aggregate lineage makes Catalyst analysis cost superlinear
    // in iteration count (the unbounded form took minutes at this
    // depth); with it each segment re-plans at most a 5-deep tree. The
    // assertion is STRUCTURAL — the returned frame's analyzed plan
    // sits on the last checkpoint, so its node count is set by the
    // final <=5-round segment, independent of iters — because a
    // wall-clock bound flakes on a loaded CI box without catching
    // anything the plan size doesn't.
    val spark = TestSpark.spark
    import spark.implicits._
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L)).toDF("doc_a", "doc_b")
    val frame = Dedup.pagerankOverPairs(pairs, iters = 30)
    val nodes = frame.queryExecution.analyzed.collect { case n => n }.size
    assert(nodes < 120,
      s"analyzed plan has $nodes nodes — checkpointing no longer truncates lineage")
    val out = frame.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // Deeper iteration converges toward the same fixpoint: mass still
    // conserves and the hub still dominates.
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
    assert((1L to 4L).forall(i => out(0L) > out(i)))
  }
}
