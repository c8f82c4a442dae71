package graft

import org.scalatest.funsuite.AnyFunSuite

/** The round-1 lesson as a standing gate: no registered query may plan
  * an all-pairs join. Every `SparkEntry.queries` entry is analyzed at
  * sf0.001 and its optimized plan must be free of cartesian products
  * and nested-loop joins — except the whitelisted scalar/codebook
  * broadcasts, whose build side is provably tiny by construction.
  */
class PlanAuditSpec extends AnyFunSuite {

  // crossJoin against a bounded broadcast side is the intended plan:
  //  - q16_above_avg: one-row global aggregate
  //  - s04_knn_ivf:   16-row coarse codebook
  //  - t13_tfidf:     one-row n_sources aggregate
  private val boundedCrossJoins = Set("q16_above_avg", "s04_knn_ivf", "t13_tfidf")

  test("no registered query plans a cartesian or nested-loop join") {
    val spark = TestSpark.spark
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, TestSpark.sfDir).queryExecution.optimizedPlan.toString
      val bad =
        (plan.contains("Join Cross") || plan.contains("CartesianProduct")) &&
          !boundedCrossJoins.contains(name)
      if (bad) Some(name) else None
    }
    assert(offenders.isEmpty, s"all-pairs plans in: ${offenders.mkString(", ")}")
  }

  test("executed plans of the pair generators use hash or merge joins only") {
    val spark = TestSpark.spark
    Seq("d08_lsh_pairs_capped", "d09_simhash_banded", "d10_embedding_bucketed",
        "e09_user_sim_bucketed", "d04_shingle_jaccard", "s03_label_purity")
      .foreach { name =>
        val df = SparkEntry.queries(name)(spark, TestSpark.sfDir)
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name: $plan")
        assert(!plan.contains("CartesianProduct"), s"$name: $plan")
      }
  }
}
