package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.EntityPipeline
import graft.streaming.StreamJob

/** Batch semantics of the reference pipeline (P1-P7, U1-U2, A1) and the
  * streaming parity behaviors (ST1-ST7) via MemoryStream.
  */
class EntityPipelineSpec extends AnyFunSuite {

  private def article(title: String, description: String = null, content: String = null): String = {
    def q(s: String) = if (s == null) "null" else "\"" + s + "\""
    s"""{"source":null,"author":null,"title":${q(title)},"description":${q(description)},
        "url":"http://x","publishedAt":"2024-01-01T00:00:00Z","content":${q(content)},
        "fetchedAt":"2024-01-01T00:00:00Z","query":"q"}""".replaceAll("\n\\s*", "")
  }

  test("parse: malformed JSON gives null struct, concat_ws null-skip gives empty text") {
    val spark = TestSpark.spark
    import spark.implicits._
    val raw = Seq("not json at all", article("Spark wins", null, null)).toDF("value")
    val parsed = EntityPipeline.parseArticles(raw).collect()
    assert(parsed.length == 2)
    val texts = parsed.map(_.getString(1)).toSeq
    assert(texts.contains(""))          // malformed row: all fields null → ""
    assert(texts.contains("Spark wins"))
  }

  test("explode drops articles with no entities (not explode_outer)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val raw = Seq(article("nothing lowercase here"), article("Spark rises")).toDF("value")
    val counts = EntityPipeline.countEntities(EntityPipeline.parseArticles(raw)).collect()
    // only the second article contributes; no null/empty entity rows
    assert(counts.map(_.getString(0)).toSet == Set("Spark"))
  }

  test("batch counts: duplicates within one article count separately (A1)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val raw = Seq(article("spark spark Window")).toDF("value")
    val counts = EntityPipeline.countEntities(EntityPipeline.parseArticles(raw))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("spark" -> 2L, "Window" -> 1L))
  }

  test("streaming complete mode: counts are running totals across triggers (A1/ST2)") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[String]
    val raw = input.toDF().select($"value".cast("binary").as("value"))
    val q = StreamJob.entityCounts(raw).writeStream
      .format("memory").queryName("ec_complete").outputMode("complete").start()
    try {
      input.addData(article("spark rises"), article("Spark falls"))
      q.processAllAvailable()
      val t1 = spark.table("ec_complete").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(t1 == Map("spark" -> 1L, "Spark" -> 1L))

      input.addData(article("spark again"))
      q.processAllAvailable()
      val t2 = spark.table("ec_complete").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(t2 == Map("spark" -> 2L, "Spark" -> 1L)) // running total, state kept
    } finally q.stop()
  }

  test("sink serialization carries entity, count and timestamp (P7)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val raw = Seq(article("Spark")).toDF("value")
    val out = StreamJob.transform(raw).collect()
    assert(out.length == 1)
    val json = out.head.getString(0)
    assert(json.contains("\"entity\":\"Spark\"") && json.contains("\"count\":1")
      && json.contains("timestamp"))
  }

  test("checkpoint restart recovers aggregate state (ST5)") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val input = MemoryStream[String]
    val raw = input.toDF().select($"value".cast("binary").as("value"))
    def start(name: String) = StreamJob.entityCounts(raw).writeStream
      .format("memory").queryName(name).outputMode("complete")
      .option("checkpointLocation", ckpt).start()

    val q1 = start("ec_ckpt1")
    input.addData(article("spark one"))
    q1.processAllAvailable()
    q1.stop()

    val q2 = start("ec_ckpt2")
    try {
      input.addData(article("spark two"))
      q2.processAllAvailable()
      val t = spark.table("ec_ckpt2").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(t == Map("spark" -> 2L)) // pre-restart state restored from checkpoint
    } finally q2.stop()
  }

  test("dropDuplicatesWithinWatermark dedups by url within the watermark (ST7)") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val articles = input.toDF().toDF("url", "ts")
    val q = StreamJob.dedupWithinWatermark(articles, "10 minutes").writeStream
      .format("memory").queryName("dedup_wm").outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:01:00")
      input.addData(("http://a", t0), ("http://a", t1), ("http://b", t0))
      q.processAllAvailable()
      val urls = spark.table("dedup_wm").collect().map(_.getString(0)).toSeq.sorted
      assert(urls == Seq("http://a", "http://b"))
    } finally q.stop()
  }

  test("watermarked tumbling windows emit closed windows in append mode (ST3/ST4)") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val events = input.toDF().toDF("ts", "key")
    val q = StreamJob.windowedCounts(events, "10 minutes", "5 minutes").writeStream
      .format("memory").queryName("win_append").outputMode("append").start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData((ts("2024-01-01 00:00:10"), "a"), (ts("2024-01-01 00:01:00"), "a"))
      q.processAllAvailable()
      // advance the watermark far past the first window's end
      input.addData((ts("2024-01-01 01:00:00"), "b"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 02:00:00"), "b"))
      q.processAllAvailable()
      val rows = spark.table("win_append").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(rows.contains(("2024-01-01 00:00:00.0", "a", 2L)))
    } finally q.stop()
  }
}
