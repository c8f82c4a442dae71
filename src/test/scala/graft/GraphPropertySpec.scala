package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.ops.Dedup

/** Model-based property tests for the graph ops (d44 PageRank, d45
  * label propagation) over RANDOM bounded pair graphs: each sample
  * runs the ENGINE op and a driver-side replay of the exact same
  * deterministic recurrence (same fold order, same literals) and
  * demands bit equality — the fixed synthetic graphs in
  * PagerankSpec/LabelPropSpec pin known shapes; this sweeps shapes
  * nobody thought to construct. Sample count is small (each sample is
  * a Spark job), but every sample is an exact-equality oracle, not a
  * loose invariant.
  */
object GraphPropertySpec extends Properties("graph-ops") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withMaxDiscardRatio(10.0f)

  private val genPairs: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 9)
    m <- Gen.choose(1, 16)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0, n - 1)
      b0 <- Gen.choose(0, n - 2)
    } yield {
      val b = if (b0 >= a) b0 + 1 else b0
      (math.min(a, b).toLong, math.max(a, b).toLong)
    })
  } yield edges.distinct

  private def adjacency(pairs: List[(Long, Long)]): Map[Long, Seq[Long]] = {
    val dir = pairs ++ pairs.map(p => (p._2, p._1))
    dir.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
  }

  /** Driver replay of d44: contributions fold per target in SOURCE
    * order with a 0.0 seed — the engine's sorted-struct fold.
    */
  private def pagerankModel(pairs: List[(Long, Long)], iters: Int): Map[Long, Double] = {
    val adj = adjacency(pairs)
    val nodes = adj.keySet.toSeq.sorted
    val n = nodes.size
    val deg = adj.map { case (k, vs) => k -> vs.size }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      r = nodes.map { v =>
        // incoming sources of v = its neighbors (undirected), in
        // ascending source order, one IEEE divide each
        val contribs = adj(v).sorted.map(u => r(u) / deg(u).toDouble)
        v -> (0.15 / n + 0.85 * contribs.foldLeft(0.0)(_ + _))
      }.toMap
    }
    r
  }

  /** Driver replay of d45: synchronous majority label, min-label ties. */
  private def labelPropModel(pairs: List[(Long, Long)], iters: Int): Map[Long, Long] = {
    val adj = adjacency(pairs)
    var lab = adj.keySet.map(k => k -> k).toMap
    for (_ <- 1 to iters) {
      lab = adj.keys.map { v =>
        val counts = adj(v).map(lab).groupBy(identity).map { case (l, xs) => (l, xs.size) }
        val mc = counts.values.max
        v -> counts.collect { case (l, c) if c == mc => l }.min
      }.toMap
    }
    lab
  }

  // forAllNoShrink: the default List shrinker would walk a real
  // counterexample toward the EMPTY edge list, where the
  // mass-conservation arm fails vacuously (n = 0) — reporting List()
  // instead of the failing graph and destroying the diagnostic.
  property("d44 pagerank == the driver replay bit for bit; mass conserves") =
    Prop.forAllNoShrink(genPairs) { pairs =>
      val spark = TestSpark.spark
      import spark.implicits._
      val got = Dedup.pagerankOverPairs(pairs.toDF("doc_a", "doc_b"), iters = 10)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val want = pagerankModel(pairs, iters = 10)
      val deg = adjacency(pairs).map { case (k, vs) => k -> vs.size.toLong }
      val exact = got.keySet == want.keySet &&
        got.forall { case (k, (d, rank)) => d == deg(k) && rank == want(k) }
      val mass = math.abs(got.values.map(_._2).sum - 1.0) < 1e-9
      exact && mass
    }

  property("d45 label propagation == the driver replay; sizes partition the nodes") =
    Prop.forAllNoShrink(genPairs) { pairs =>
      val spark = TestSpark.spark
      import spark.implicits._
      val got = Dedup.labelPropOverPairs(pairs.toDF("doc_a", "doc_b"), iters = 6)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val want = labelPropModel(pairs, iters = 6)
      val labelsMatch = got.keySet == want.keySet &&
        got.forall { case (k, (l, _)) => l == want(k) }
      val sizes = got.values.groupBy(_._1).map { case (l, vs) => (l, vs.size.toLong) }
      val sizesMatch = got.values.forall { case (l, n) => sizes(l) == n }
      labelsMatch && sizesMatch &&
        sizes.values.sum == got.size.toLong
    }

  /** d46's takedown report against a driver recount on the same
    * random graph: exact equality on all seven counters, plus the two
    * structural invariants the report carries by construction —
    * n_pairs = dropped + kept, and before = dead + released + after.
    */
  property("d46 takedown audit == driver recount; conservation holds") =
    Prop.forAllNoShrink(genPairs) { pairs =>
      val s = TestSpark.spark
      import s.implicits._
      val dead = (id: Long) => id % 7 == 2
      val got = Dedup.takedownAuditOverPairs(pairs.toDF("doc_a", "doc_b"))
        .collect().head
      val (nPairs, dropped, kept) = (got.getLong(0), got.getLong(1), got.getLong(2))
      val (before, deadDocs, released, after) =
        (got.getLong(3), got.getLong(4), got.getLong(5), got.getLong(6))
      val wantDropped = pairs.count(p => dead(p._1) || dead(p._2)).toLong
      val docs = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val partners = pairs.flatMap(p => Seq(p._1 -> p._2, p._2 -> p._1))
        .groupBy(_._1).map { case (d, ps) => d -> ps.map(_._2) }
      val wantDead = docs.count(dead).toLong
      val wantReleased =
        docs.count(d => !dead(d) && partners(d).forall(dead)).toLong
      val wantAfter =
        docs.count(d => !dead(d) && partners(d).exists(x => !dead(x))).toLong
      val checks = Seq(
        s"n_pairs $nPairs" -> (nPairs == pairs.size.toLong),
        s"dropped $dropped != $wantDropped" -> (dropped == wantDropped),
        "pair partition" -> (kept == nPairs - dropped),
        s"before $before" -> (before == docs.size.toLong),
        s"dead $deadDocs != $wantDead" -> (deadDocs == wantDead),
        s"released $released != $wantReleased" -> (released == wantReleased),
        s"after $after != $wantAfter" -> (after == wantAfter),
        "conservation" -> (before == deadDocs + released + after))
      val bad = checks.collect { case (label, false) => label }
      Prop(bad.isEmpty) :| bad.mkString("; ")
    }
}
