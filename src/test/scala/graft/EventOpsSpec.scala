package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventOps

/** e14/e15 share ONE events pass ([[EventOps.transitionStats]]): this
  * spec pins (1) the derivation — e14 is a projection + one window over
  * e15's aggregate, so materializing the stats frame once serves both
  * views — and (2) the plan shape — each registered query shuffles the
  * raw events exactly once (the user_id window exchange); every later
  * exchange carries only the |types|²-row aggregate.
  */
class EventOpsSpec extends AnyFunSuite {

  test("e14 is derivable from e15's aggregate (one shared events pass)") {
    val spark = TestSpark.spark
    val e14 = SparkEntry.queries("e14_transitions")(spark, TestSpark.sfDir).collect()
    val e15 = SparkEntry.queries("e15_dwell")(spark, TestSpark.sfDir).collect()
    assert(e14.nonEmpty && e14.length == e15.length)
    // identical (from, to, n) triples in identical order...
    assert(e14.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      e15.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq)
    // ...and e14's probability is exactly the window divide over e15's
    // counts (BIGINT÷BIGINT through double, recomputed driver-side).
    val fromTotals = e15.groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(2)).sum }
    e14.foreach { r =>
      val expect = r.getLong(2).toDouble / fromTotals(r.getString(0)).toDouble
      assert(r.getDouble(3) == expect, s"p mismatch on ${r.getString(0)}->${r.getString(1)}")
    }
  }

  test("e14/e15 executed plans shuffle raw events exactly once each") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    def shuffles(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
      case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
      case q: QueryStageExec => shuffles(q.plan)
      case r: ReusedExchangeExec => Seq.empty
      case s: ShuffleExchangeLike => s +: s.children.flatMap(shuffles)
      case other => other.children.flatMap(shuffles)
    }
    Seq("e14_transitions", "e15_dwell").foreach { name =>
      val df = SparkEntry.queries(name)(spark, TestSpark.sfDir)
      df.collect()
      // A shuffle still carrying user_id is a shuffle of raw event rows
      // (everything post-aggregate is keyed from_type/to_type only).
      val raw = shuffles(df.queryExecution.executedPlan)
        .filter(_.output.exists(_.name == "user_id"))
      assert(raw.length == 1,
        s"$name: expected exactly one raw-events exchange, got ${raw.length}")
    }
  }
}
