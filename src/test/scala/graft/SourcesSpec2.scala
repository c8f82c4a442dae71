package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: the co-located-join story executed, not just claimed. */
class SourcesSpec2 extends AnyFunSuite {

  test("bucketed tables join with zero shuffle exchanges") {
    val spark = TestSpark.spark
    import spark.implicits._
    val orders = Tables.orders(spark, TestSpark.sfDir)
    val customer = Tables.customer(spark, TestSpark.sfDir)

    spark.sql("DROP TABLE IF EXISTS g_orders_bkt")
    spark.sql("DROP TABLE IF EXISTS g_customer_bkt")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("g_orders_bkt")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("g_customer_bkt")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join code path so the assertion is about
      // bucketing, not about broadcast kicking in on the small corpus
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("g_orders_bkt")
        .join(spark.table("g_customer_bkt"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join must read bucket-aligned data: no exchange on either
      // join key anywhere in the plan (the final aggregation's
      // mktsegment exchange is the only one allowed)
      assert(!plan.contains("Exchange hashpartitioning(o_custkey"), plan)
      assert(!plan.contains("Exchange hashpartitioning(c_custkey"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      // same result as the unbucketed join
      val direct = orders.join(customer, $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      assert(joined.except(direct).count() == 0)
      assert(direct.except(joined).count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS g_orders_bkt")
      spark.sql("DROP TABLE IF EXISTS g_customer_bkt")
    }
  }

  test("bloom-filter runtime prefilter: superset of the semi-join, bounded FPs") {
    val spark = TestSpark.spark
    import spark.implicits._
    // The runtime-filter pattern for 100 TB joins: build a bloom filter
    // on the small side's keys, broadcast it, and drop fact rows before
    // the shuffle. False positives only cost extra shuffled rows — the
    // exact join afterwards removes them — so correctness never depends
    // on the sketch.
    val li = Tables.lineitem(spark, TestSpark.sfDir)
    val hot = Tables.orders(spark, TestSpark.sfDir)
      .filter($"o_totalprice" > 200000.0)
      .select($"o_orderkey")
    val nHot = hot.count()
    assert(nHot > 0)
    val bloom = hot.stat.bloomFilter("o_orderkey", nHot, 0.01)
    val bc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((k: Long) => bc.value.mightContain(k))
    val prefiltered = li.filter(mightContain($"l_orderkey"))
    val exact = li.join(hot, $"l_orderkey" === $"o_orderkey", "left_semi")
    val nPre = prefiltered.count()
    val nExact = exact.count()
    val nAll = li.count()
    // no false negatives: everything the semi-join keeps passes the bloom
    assert(exact.select($"l_orderkey").except(
      prefiltered.select($"l_orderkey")).count() == 0)
    // false-positive volume stays near the configured 1% of the rest
    assert(nPre - nExact <= math.max(50L, ((nAll - nExact) * 0.05).toLong),
      s"pre=$nPre exact=$nExact all=$nAll")
  }

  test("schema evolution: mergeSchema unions columns added over corpus generations") {
    val spark = TestSpark.spark
    import spark.implicits._
    // the 100 TB reality: the corpus schema grows over time; old
    // partitions lack new columns and must read as nulls
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(s"$dir/gen=1")
    Seq((3L, "gamma", 0.9)).toDF("doc_id", "text", "quality")
      .write.parquet(s"$dir/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.toSet == Set("doc_id", "text", "quality", "gen"))
    assert(merged.count() == 3)
    assert(merged.filter($"quality".isNull).count() == 2)  // old generation
    assert(merged.filter($"gen" === 2 && $"quality" === 0.9).count() == 1)
  }
}
