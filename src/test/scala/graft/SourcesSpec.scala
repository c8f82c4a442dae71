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
}
