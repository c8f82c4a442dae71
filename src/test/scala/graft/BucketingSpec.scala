package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing — the co-located-join discipline the scale notes cite
  * throughout (SURVEY §2/§7: "pre-partition both sides on the join key
  * so the fact-to-fact join never shuffles"): written once with
  * `bucketBy(n, key)`, both tables land pre-hashed into matching
  * buckets, and every subsequent equi-join on that key reads
  * co-located splits with ZERO exchanges — at 100 TB this turns the
  * recurring lineitem ⋈ orders shuffle (the single biggest data
  * movement in the q-family) into a metadata lookup, amortized across
  * every query that touches the pair.
  *
  * This spec EXECUTES the discipline rather than documenting it: the
  * same join is run over bucketed tables (expect: no shuffle carries a
  * join key) and over the raw parquet (expect: both sides shuffle),
  * proving the engine's table-layout path delivers the co-location the
  * docstrings promise.
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
