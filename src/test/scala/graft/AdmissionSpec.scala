package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** d26 staged admission vs d25: the short-circuit cascade must reach
  * exactly d25's admit/reject decisions while measurably probing
  * fewer documents — the whole point of staging.
  */
class AdmissionSpec extends AnyFunSuite {

  test("d26 verdicts equal d25 and the cascade measurably reduces probes") {
    val spark = TestSpark.spark
    val d25 = Dedup.ingestAdmission(spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d26 = Dedup.stagedAdmission(spark, TestSpark.sfDir).collect()
    assert(d26.length == d25.size)

    d26.foreach { r =>
      val id = r.getLong(0)
      val stage = if (r.isNullAt(1)) null else r.getString(1)
      val (probedNear, probedSim, probedDecon, admit) =
        (r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))
      val full = d25(id)
      val (exactDup, nearDup, simDup, lowQ, dirty) = (full.getBoolean(1),
        full.getBoolean(2), full.getBoolean(3), full.getBoolean(4), full.getBoolean(5))
      // the one-bit verdict is identical
      assert(admit == full.getBoolean(7), s"doc $id: admit mismatch")
      // the firing stage is the d25 signal of highest precedence
      val expectStage =
        if (lowQ) "quality"
        else if (exactDup) "exact"
        else if (nearDup) "near"
        else if (simDup) "sim"
        else if (dirty) "contaminated"
        else null
      assert(stage == expectStage, s"doc $id: stage $stage want $expectStage")
      // probe flags encode exactly "survived everything earlier"
      assert(probedNear == (!lowQ && !exactDup), s"doc $id: probed_near")
      assert(probedSim == (probedNear && !nearDup), s"doc $id: probed_sim")
      assert(probedDecon == (probedSim && !simDup), s"doc $id: probed_decontam")
    }

    // measured reduction: each stage probes a strict subset of arrivals
    val n = d26.length
    val nNear = d26.count(_.getBoolean(3))
    val nSim = d26.count(_.getBoolean(4))
    val nDecon = d26.count(_.getBoolean(5))
    assert(nNear < n, s"MinHash probed all $n arrivals — no staging win")
    assert(nSim <= nNear && nDecon <= nSim, "cascade must be monotone")
    info(s"probe funnel: $n arrivals -> $nNear minhash -> $nSim simhash -> $nDecon decontam")
  }

  test("d28 extends d26 with a survivors-only pii stage") {
    val spark = TestSpark.spark
    val d26 = Dedup.stagedAdmission(spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(0) ->
        (Option(if (r.isNullAt(1)) null else r.getString(1)), r.getBoolean(6))).toMap
    val d28 = Dedup.piiAdmission(spark, TestSpark.sfDir).collect()
    assert(d28.length == d26.size)
    var nPii = 0
    d28.foreach { r =>
      val id = r.getLong(0)
      val stage = Option(if (r.isNullAt(1)) null else r.getString(1))
      val (probedPii, admit) = (r.getBoolean(5), r.getBoolean(6))
      val (stage26, admit26) = d26(id)
      // only d26 survivors pay for the regex pass
      assert(probedPii == admit26, s"doc $id: probed_pii")
      if (admit26) {
        // counts present, stage is either clean or 'pii'
        val (ne, np) = (r.getLong(2), r.getLong(3))
        assert(ne == id % 3 && np == id % 2, s"doc $id: planted counts")
        assert(stage == (if (ne + np > 0) Some("pii") else None), s"doc $id: stage")
        assert(admit == (ne + np == 0), s"doc $id: admit")
        if (stage.contains("pii")) nPii += 1
      } else {
        // earlier-stage verdicts pass through untouched, counts null
        assert(stage == stage26 && !admit, s"doc $id: pass-through")
        assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4), s"doc $id: nulls")
      }
    }
    assert(nPii > 0, "the fixture must exercise the pii rejection arm")
    info(s"pii stage rejected $nPii of ${d26.count(_._2._2)} survivors")
  }
}
