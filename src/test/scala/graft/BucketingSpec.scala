package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing on the FACT-TO-FACT pair — SourcesSpec2 proves the
  * discipline on a dimension-style join (orders ⋈ customer) and on the
  * persisted LSH index; this spec covers the remaining, biggest case:
  * lineitem ⋈ orders, the largest recurring data movement in the
  * q-family, where BOTH sides are fact-sized and neither can
  * broadcast at 100 TB. It also adds the negative control the positive
  * tests lack — the identical join over raw parquet must hash-shuffle
  * both sides — and asserts the two paths return identical rows
  * (co-location changes movement, never answers). Exchanges are
  * walked structurally on the executed plan (the AdaptiveSparkPlan /
  * QueryStage descent), not string-matched.
  */
class BucketingSpec extends AnyFunSuite {

  private def shuffles(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
    case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
    case q: QueryStageExec => shuffles(q.plan)
    case r: ReusedExchangeExec => Seq.empty
    case s: ShuffleExchangeLike => s +: s.children.flatMap(shuffles)
    case other => other.children.flatMap(shuffles)
  }

  test("bucketed fact-to-fact join runs with zero join-key exchanges; raw join shuffles both sides") {
    val spark = TestSpark.spark
    import spark.implicits._
    val li = Tables.lineitem(spark, TestSpark.sfDir).select($"l_orderkey", $"l_quantity")
    val ord = Tables.orders(spark, TestSpark.sfDir).select($"o_orderkey", $"o_orderdate")
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
    ord.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_bucketed")
    // Force the sort-merge path: at test scale the stats would broadcast
    // the small side, which also avoids a shuffle but proves nothing
    // about co-location.
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def joinKeyShuffles(df: org.apache.spark.sql.DataFrame): Int = {
        df.collect()
        shuffles(df.queryExecution.executedPlan)
          .count(_.output.exists(a =>
            a.name == "l_orderkey" || a.name == "o_orderkey"))
      }
      val bucketed = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderdate").count()
      // the join itself moves nothing: the only exchange left is the
      // final date aggregate, which never carries a join key
      assert(joinKeyShuffles(bucketed) == 0,
        "bucketed join should read co-located splits without an exchange")
      val raw = li.join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderdate").count()
      assert(joinKeyShuffles(raw) == 2,
        "raw-parquet join should hash-shuffle both sides on the key")
      // and the answers agree — co-location changes movement, not rows
      val a = bucketed.collect().map(r => (String.valueOf(r.get(0)), r.getLong(1))).sortBy(_._1)
      val b = raw.collect().map(r => (String.valueOf(r.get(0)), r.getLong(1))).sortBy(_._1)
      assert(a.toSeq == b.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
