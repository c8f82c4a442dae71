package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** Executed-plan proof that the uncapped shingle join (d04) survives a
  * skewed corpus via AQE skew-join splitting — the one registered
  * pair-generation path whose 100 TB story previously rested on prose.
  *
  * The corpus is built so ONE shingle is shared by every boilerplate
  * document (the template-reuse hot key): the shuffle partition holding
  * that key dwarfs the median, AQE must detect it and split the skewed
  * partition into parallel sub-reads on both join sides. The assertion
  * is on `queryExecution.executedPlan` AFTER collect() — the adaptive
  * final plan — exactly like PlanAuditSpec's gates.
  *
  * Thresholds are scaled down to test-sized data (the detection rule is
  * size > max(thresholdBytes, factor · median); production defaults are
  * 256 MB / 5×); what's under test is the PLAN SHAPE, which is
  * size-invariant: the same skew → same split at any scale.
  */
class SkewSpec extends AnyFunSuite {

  test("d04 under a hot-shingle corpus: AQE splits the skewed join partition") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString

    // 1200 boilerplate docs all sharing the shingle (aaa,bbb,ccc) — one
    // hot join key — plus a unique tail shingle each; 300 fully-unique
    // docs keep the median partition honestly small.
    val hot = (0 until 1200).map(i => (i.toLong, s"aaa bbb ccc u$i"))
    val unique = (0 until 300).map(i => (100000L + i, s"w${i}a w${i}b w${i}c w${i}d"))
    (hot ++ unique).toDF("doc_id", "text")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.coalescePartitions.enabled",
    ).map(k => k -> util.Try(conf.get(k)).toOption).toMap
    try {
      // Production-default RULE, test-sized thresholds.
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      // The join output feeds a re-keyed aggregate (already a fresh
      // shuffle), so splitting adds no extra exchange in production;
      // force makes the decision deterministic under tiny test stats.
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      val df = Dedup.shingleJaccardPairs(spark, dir)
      val rows = df.collect()
      // Correctness under skew: every boilerplate pair shares 1 of its
      // 2 shingles → jaccard 1/3 ≥ 0.3 → all 1200·1199/2 pairs emitted.
      assert(rows.length == 1200 * 1199 / 2, s"got ${rows.length} pairs")

      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(4000))
      // The adaptive final plan must carry the skew-split markers on
      // the join and its shuffle reads.
      assert(plan.contains("skew=true"), s"no skew-handled join in:\n${plan.take(4000)}")
      assert("AQEShuffleRead [^\n]*skewed".r.findFirstIn(plan).isDefined,
        s"no skewed AQEShuffleRead in:\n${plan.take(4000)}")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None)    => conf.unset(k)
      }
    }
  }
}
