package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** d45's model contract on synthetic graphs: label propagation splits
  * bridge-joined dense cores that CC labels as one component, the
  * fixed-round snapshot pins oscillating (bipartite) structures to a
  * well-defined state, and the synchronous update is a pure function
  * of the edge set (input order must not matter).
  */
class LabelPropSpec extends AnyFunSuite {

  private def communities(pairs: Seq[(Long, Long)],
                          iters: Int = 6): Map[Long, (Long, Long)] = {
    val spark = TestSpark.spark
    import spark.implicits._
    Dedup.labelPropOverPairs(pairs.toDF("doc_a", "doc_b"), iters)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  // Two triangles {0,1,2} and {10,11,12} joined by ONE bridge (2,10):
  // a single CC component, but each triangle's internal majority
  // holds against the bridge, so LP keeps two communities. (Hand
  // trace: the left triangle converges to label 0; the right inherits
  // label 2 THROUGH the bridge in round 1 and keeps it — a community
  // label identifies the community, it need not be a member.)
  private val bridged = Seq((0L, 1L), (0L, 2L), (1L, 2L),
    (10L, 11L), (10L, 12L), (11L, 12L), (2L, 10L))

  test("a bridge between two triangles does NOT merge their communities") {
    val out = communities(bridged)
    assert(out.size == 6)
    val left = Set(0L, 1L, 2L).map(out(_)._1)
    val right = Set(10L, 11L, 12L).map(out(_)._1)
    assert(left.size == 1, s"left triangle split: $left")
    assert(right.size == 1, s"right triangle split: $right")
    assert(left != right, "the bridge must not merge the triangles")
    assert(left.head == 0L)
    assert(out.values.forall(_._2 == 3L), s"both communities have 3 members: $out")
  }

  test("a star (bipartite) pins to the fixed-round snapshot: hub vs spokes") {
    // Star 5-(6,7,8,9) is bipartite, the classic synchronous-LP
    // oscillator: lp1 = (hub 6, spokes 5), lp2 = (hub 5, spokes 6),
    // and the parity repeats. The fixed-round snapshot makes the
    // output well-defined — at even iters the hub holds 5 and every
    // spoke holds 6.
    val out = communities(Seq((5L, 6L), (5L, 7L), (5L, 8L), (5L, 9L)))
    assert(out.size == 5)
    assert(out(5L) == ((5L, 1L)))
    (6L to 9L).foreach(i => assert(out(i) == ((6L, 4L))))
    // ...and the odd-round snapshot is the swapped state, same rule.
    val odd = communities(Seq((5L, 6L), (5L, 7L), (5L, 8L), (5L, 9L)), iters = 5)
    assert(odd(5L)._1 == 6L)
    (6L to 9L).foreach(i => assert(odd(i)._1 == 5L))
  }

  test("synchronous rounds are a pure function of the edge set: permuted input, same result") {
    val out1 = communities(bridged)
    val out2 = communities(new scala.util.Random(7).shuffle(bridged))
    assert(out1 == out2)
  }
}
