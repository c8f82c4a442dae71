package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The `observe()` surface: production pipelines attach data-quality
  * counters to the frames they ship (row counts, byte budgets,
  * null-rate canaries) and read them off the SAME execution that
  * wrote the artifact — a second counting pass over 100 TB would
  * double the cost, and a separately-computed count can silently
  * disagree with what was actually written. This pins that the
  * observed metrics equal the direct aggregates, ride a single
  * execution, and work through the curated-corpus write shape.
  */
class ObserveSpec extends AnyFunSuite {

  test("observed metrics equal the direct aggregate and ride one execution") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sfDir)
      .select($"doc_id", $"text", $"source")
    val observed = docs.observe("intake",
      count(lit(1)).as("n_docs"),
      sum(length($"text")).as("n_chars"),
      count(when($"text" === "", 1)).as("n_empty"))
    observed.collect()
    val m = observed.queryExecution.observedMetrics("intake")
    val direct = docs.agg(count(lit(1)), sum(length($"text")),
      count(when($"text" === "", 1))).head()
    assert(m.getLong(0) == direct.getLong(0))
    assert(m.getLong(1) == direct.getLong(1))
    assert(m.getLong(2) == direct.getLong(2))
    assert(m.getLong(0) > 0)
  }

  test("metrics observe the frame AT ITS STAGE: a downstream filter does not rewrite them") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sfDir).select($"doc_id")
    val observed = docs.observe("pre_filter", count(lit(1)).as("n"))
      .filter($"doc_id" % 2 === 0)
    // ONE execution returns only the filtered rows yet reports the
    // PRE-filter cardinality — the at-stage observation contract.
    val keptRows = observed.collect()
    val m = observed.queryExecution.observedMetrics("pre_filter")
    assert(m.getLong(0) > keptRows.length,
      s"observed ${m.getLong(0)} vs kept ${keptRows.length}")
    assert(m.getLong(0) == docs.count())
  }
}
