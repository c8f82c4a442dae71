package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** d32's contraction proof: incremental label maintenance must produce
  * EXACTLY the labels a from-scratch connected-components run over the
  * full union graph (hist–hist capped pairs ∪ batch→hist probe edges)
  * would — on the affected docs it relabels, AND by omission: every
  * historical doc it does NOT touch must already hold the union-graph
  * fixpoint label. The second half is the scale claim (work ∝ batch,
  * untouched components never enter a shuffle) proven as a correctness
  * statement rather than a plan assertion.
  */
class IncrementalClusterSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private def dir = TestSpark.sfDir

  test("d32 contraction equals full union-graph CC on every emitted doc") {
    val s = spark
    import s.implicits._
    val (histPairs, probeEdges) = Dedup.incrementalClusterGraph(s, dir)
    val union = histPairs.union(probeEdges.toDF("doc_a", "doc_b"))
    val full = Dedup.connectedComponentsWithRounds(s, union)._1
      .toDF("doc_id", "full_lbl")
    val inc = Dedup.incrementalClusters(s, dir)
    assert(inc.count() > 0, "the sf0.001 corpus must produce probe matches")
    val joined = inc.join(full, Seq("doc_id"), "left")
    assert(joined.filter($"full_lbl".isNull).count() == 0,
      "an emitted doc is missing from the union graph entirely")
    val mismatch = joined.filter($"cluster_id" =!= $"full_lbl")
    assert(mismatch.count() == 0,
      s"contracted labels diverge from the full CC: ${mismatch.head(3).mkString(", ")}")
  }

  test("d32 omission is sound: untouched historical labels are already the fixpoint") {
    val s = spark
    import s.implicits._
    val (histPairs, probeEdges) = Dedup.incrementalClusterGraph(s, dir)
    val histLabels = Dedup.connectedComponentsWithRounds(s, histPairs)._1
      .toDF("doc_id", "hist_lbl")
    val full = Dedup.connectedComponentsWithRounds(
        s, histPairs.union(probeEdges.toDF("doc_a", "doc_b")))._1
      .toDF("doc_id", "full_lbl")
    val inc = Dedup.incrementalClusters(s, dir)
    val untouched = histLabels
      .join(inc.select($"doc_id"), Seq("doc_id"), "left_anti")
      .join(full, Seq("doc_id"))
      .filter($"hist_lbl" =!= $"full_lbl")
    assert(untouched.count() == 0,
      "a doc the maintenance skipped actually needed relabeling")
  }

  test("d32 verdict shape: arrival rows, prev labels, changed flag") {
    val s = spark
    import s.implicits._
    val inc = Dedup.incrementalClusters(s, dir)
    assert(inc.filter($"doc_id" % 5 === 0 && $"prev_cluster".isNotNull).count() == 0,
      "an arrival carries a pre-batch label")
    assert(inc.filter($"doc_id" % 5 =!= 0 && $"prev_cluster".isNull).count() == 0,
      "a historical doc lost its pre-batch label")
    assert(inc.filter($"changed" =!=
        ($"prev_cluster".isNull || $"prev_cluster" =!= $"cluster_id")).count() == 0,
      "changed flag inconsistent with the label delta")
    // the arrival rows are exactly the probe-matched batch docs
    val (_, probeEdges) = Dedup.incrementalClusterGraph(s, dir)
    val matched = probeEdges.select($"new_doc".as("doc_id")).distinct()
    val arrivals = inc.filter($"doc_id" % 5 === 0).select($"doc_id")
    assert(arrivals.exceptAll(matched).count() == 0 &&
           matched.exceptAll(arrivals).count() == 0,
      "arrival verdicts must cover the probe-matched batch exactly")
  }

  test("gen-2 fold relabels through an arrival-id cluster label (membership, not % 5)") {
    // The fold-composition trap: union-by-min can fold an ARRIVAL id in
    // as a cluster label (5 ≡ 0 mod 5). A later merge through that label
    // node must still relabel the folded rows — an id-arithmetic node
    // classification would misread node 5 as an arrival and split one
    // connected component across two labels.
    val s = spark
    import s.implicits._
    // Gen-1 folded sidecar: docs 5,6,7 all labeled by ex-arrival 5.
    val folded1 = Seq((5L, 5L), (6L, 5L), (7L, 5L)).toDF("doc_id", "cluster_id")
    // Gen-2 contracted CC: arrival 10 bridged label-node 5 and the
    // unseen singleton hist doc 3 — all three nodes now label 3.
    val merged = Seq((3L, 3L), (5L, 3L), (10L, 3L)).toDF("doc_id", "cluster_id")
    val v = Dedup.maintenanceVerdicts(merged, folded1)
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]), r.getLong(2))).toSet
    assert(v == Set(
      (3L, Some(3L), 3L),          // probed edgeless singleton
      (5L, Some(5L), 3L),          // the folded label node RELABELS
      (6L, Some(5L), 3L),          // …and carries its historical members
      (7L, Some(5L), 3L),
      (10L, None, 3L)),            // the genuine arrival
      s"verdicts mis-classified the arrival-id label node: $v")
    val folded2 = Dedup.foldMaintenanceLabels(merged, folded1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(folded2 == Map(3L -> 3L, 5L -> 3L, 6L -> 3L, 7L -> 3L, 10L -> 3L),
      s"gen-2 fold split one component across labels: $folded2")
  }
}
