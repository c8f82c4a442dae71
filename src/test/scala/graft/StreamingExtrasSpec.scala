package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Streaming shapes beyond the reference's single pipeline: stream ⋈
  * static dimension enrichment, and arbitrary stateful processing via
  * flatMapGroupsWithState (the KeyValueGroupedDataset custom-state
  * surface).
  */
class StreamingExtrasSpec extends AnyFunSuite {

  test("stream-static broadcast join enriches events with dimension rows") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[Long]
    val events = input.toDF().toDF("user_id")
    val q = events.join(broadcast(dim), Seq("user_id"), "left")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      input.addData(1L, 2L, 3L)
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(rows == Map(1L -> Some("gold"), 2L -> Some("basic"), 3L -> None))
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps custom per-key state across triggers") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val ds = input.toDS()
    val runningMax = ds.groupByKey(_._1)
      .flatMapGroupsWithState[Double, (Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[Double]) =>
          val mx = (rows.map(_._2) ++ state.getOption.iterator).max
          state.update(mx)
          Iterator((user, mx))
      }
    val q = runningMax.toDF("user_id", "max_v").writeStream
      .format("memory").queryName("fmgws").outputMode("append").start()
    try {
      input.addData((1L, 5.0), (1L, 3.0), (2L, 1.0))
      q.processAllAvailable()
      input.addData((1L, 4.0), (2L, 9.0))
      q.processAllAvailable()
      val out = spark.table("fmgws").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      // batch 1: max(5,3)=5 for user1, 1 for user2; batch 2: state kept →
      // user1 stays 5 (4 < 5), user2 rises to 9
      assert(out.count { case (u, v) => u == 1L && v == 5.0 } == 2)
      assert(out.contains((2L, 1.0)) && out.contains((2L, 9.0)))
    } finally q.stop()
  }
}
