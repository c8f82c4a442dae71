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

  test("persisted bucketed LSH index: the incremental probe shuffles only the batch") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.functions.TextHashes.minhash_bands
    // The storage half of the incremental-dedup scale story (d14/d15):
    // the historical MinHash band index lives on disk bucketed by its
    // join key, so probing a new batch shuffles ONLY the batch — the
    // corpus-sized index side reads bucket-aligned with no exchange.
    val docs = Tables.documents(spark, TestSpark.sfDir).select($"doc_id", $"text")
    def bandsOf(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", posexplode(minhash_bands($"text")))
      .select($"pos".as("band"), $"col".as("bkey"), $"doc_id")
    val hist = bandsOf(docs.filter($"doc_id" % 5 =!= 0))
      .withColumnRenamed("doc_id", "hist_doc")
    spark.sql("DROP TABLE IF EXISTS g_lsh_index")
    hist.write.bucketBy(8, "band", "bkey").sortBy("band", "bkey")
      .saveAsTable("g_lsh_index")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle path so the assertion is about bucketing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val newBands = bandsOf(docs.filter($"doc_id" % 5 === 0))
      val probed = spark.table("g_lsh_index")
        .join(newBands, Seq("band", "bkey"))
        .groupBy($"doc_id").agg(min($"hist_doc").as("near_match"))
      probed.collect()
      // adaptive plan toString repeats the initial plan below the final
      // one — assert on the final section only
      val plan = probed.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("Bucketed: true"), plan)
      // exactly ONE exchange on the join key — the batch side; the
      // index side reads its buckets in place
      val nKeyExchanges = "Exchange hashpartitioning\\(band".r.findAllIn(plan).length
      assert(nKeyExchanges == 1, s"expected 1 join-key exchange, plan:\n$plan")
      // and the probe result equals the same join computed from scratch
      val direct = bandsOf(docs.filter($"doc_id" % 5 =!= 0))
        .withColumnRenamed("doc_id", "hist_doc")
        .join(newBands, Seq("band", "bkey"))
        .groupBy($"doc_id").agg(min($"hist_doc").as("near_match"))
      assert(probed.except(direct).count() == 0)
      assert(direct.except(probed).count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS g_lsh_index")
    }
  }
}
