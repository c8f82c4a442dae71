package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink surface beyond the driver parquet: round-trips through
  * csv, json, orc and partitioned parquet, schema preserved — the
  * formats a user of the engine reads and writes day to day.
  */
class SourcesSpec extends AnyFunSuite {

  test("csv/json/orc round-trips preserve data") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sources").toString
    val df = Tables.customer(spark, TestSpark.sfDir)
      .select($"c_custkey", $"c_name", $"c_acctbal", $"c_mktsegment")
    val expected = df.orderBy($"c_custkey").collect().toSeq

    df.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    val backCsv = spark.read.option("header", "true")
      .schema(df.schema).csv(s"$dir/csv")
    assert(backCsv.orderBy($"c_custkey").collect().toSeq == expected)

    df.write.mode("overwrite").json(s"$dir/json")
    val backJson = spark.read.schema(df.schema).json(s"$dir/json")
    assert(backJson.orderBy($"c_custkey").collect().toSeq == expected)

    df.write.mode("overwrite").orc(s"$dir/orc")
    assert(spark.read.orc(s"$dir/orc").orderBy($"c_custkey").collect().toSeq == expected)
  }

  test("partitioned parquet write prunes partitions on read") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_part").toString
    Tables.orders(spark, TestSpark.sfDir)
      .withColumn("status", $"o_orderstatus")
      .write.mode("overwrite").partitionBy("status").parquet(s"$dir/orders")

    val pruned = spark.read.parquet(s"$dir/orders").filter($"status" === "F")
    // partition pruning: the plan's file index only selects status=F dirs
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ==
      Tables.orders(spark, TestSpark.sfDir).filter($"o_orderstatus" === "F").count())
    assert(plan.contains("PartitionFilters") || pruned.inputFiles.forall(_.contains("status=F")))
  }

  test("dynamic partition pruning: a filtered dim prunes the fact scan at runtime") {
    // The 100 TB scan-reduction feature the STATIC pruning test can't
    // reach: no literal filter exists on the fact side — the partition
    // filter is only knowable at RUNTIME from the joined dim's
    // surviving keys. Catalyst must inject a dynamicpruning subquery
    // into the fact scan's partition filters (fed by the reused
    // broadcast), so the fact table reads one status directory instead
    // of all three. On a date-partitioned 100 TB fact table this is
    // the difference between scanning a day and scanning the corpus.
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dpp").toString
    Tables.orders(spark, TestSpark.sfDir)
      .withColumn("status", $"o_orderstatus")
      .write.mode("overwrite").partitionBy("status").parquet(s"$dir/orders")
    val fact = spark.read.parquet(s"$dir/orders")
    // the dim must be file-backed: an inline Seq constant-folds to a
    // LocalRelation with the filter absorbed, and the pruning rule
    // sees no selective predicate left to derive a runtime filter from
    Seq(("F", "closed"), ("O", "open"), ("P", "pending"))
      .toDF("status", "label")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
    val joined = fact.join(dim.filter($"label" === "closed"), Seq("status"))
      .groupBy($"status").agg(count(lit(1)).as("n"))

    val expected = Tables.orders(spark, TestSpark.sfDir)
      .filter($"o_orderstatus" === "F").count()
    val rows = joined.collect()
    assert(rows.length == 1 && rows.head.getString(0) == "F"
      && rows.head.getLong(1) == expected)
    // the injected runtime filter is visible in the optimized plan...
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dynamicpruning"),
      s"no dynamicpruning subquery in:\n$optimized")
    // ...and it actually pruned: the executed fact scan EMITTED only
    // the F partition's rows (an unpruned scan reads all three
    // statuses — ~3x the rows — before the join drops them)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case q: QueryStageExec        => scansOf(q.plan)
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("/orders")) =>
        Seq(s)
      case other => other.children.flatMap(scansOf)
    }
    val scans = scansOf(joined.queryExecution.executedPlan)
    assert(scans.nonEmpty, "fact FileSourceScanExec not found")
    assert(scans.head.metrics("numOutputRows").value == expected,
      s"fact scan emitted ${scans.head.metrics("numOutputRows").value} rows; " +
        s"an effective runtime prune emits exactly the $expected F-partition rows")
  }
}
