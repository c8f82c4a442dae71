package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.EntityPipeline

class ArticlesSourceSpec extends AnyFunSuite {

  private def read(pages: Int, pageSize: Int = 20) =
    TestSpark.spark.read.format("graft.sources.ArticlesSource")
      .option("pages", pages).option("pageSize", pageSize)
      .option("query", "bitcoin").load()

  test("DSv2 source: schema matches the producer fetch fields, one partition per page") {
    val spark = TestSpark.spark
    val df = read(pages = 4, pageSize = 10)
    assert(df.schema == graft.streaming.IngestSim.fetchSchema)
    assert(df.count() == 40)
    assert(df.rdd.getNumPartitions == 4)
    // deterministic: two reads are identical
    assert(df.except(read(pages = 4, pageSize = 10)).count() == 0)
  }

  test("DSv2 source feeds the reference pipeline end to end") {
    val spark = TestSpark.spark
    import spark.implicits._
    val articles = read(pages = 3)
    // duplicate urls exist by construction (the paged-feed drift)...
    val nUrls = articles.select($"url").distinct().count()
    assert(nUrls < articles.count())
    // ...and the title surface runs through the entity counter: serialize
    // the article the way the producer would, then count entities
    val asKafkaValue = articles.select(to_json(struct(articles.columns.map(col): _*)).as("value"))
    val counts = EntityPipeline.countEntities(EntityPipeline.parseArticles(asKafkaValue))
    // every one of the 3x20 titles carries the gazetteer token "stream"
    // (HeadlineNNN fails the capitalized-word regex by design: entity
    // tokens are letters-only, so ids never pollute the counts)
    assert(counts.filter($"entity" === "stream").head().getLong(1) == 60L)
  }

  test("streaming form: page offsets advance under the pages-per-trigger cap") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft-articles-ckpt").toString
    val stream = spark.readStream.format("graft.sources.ArticlesSource")
      .option("pages", 5).option("pageSize", 10)
      .option("pagesPerTrigger", 2).option("query", "bitcoin")
      .load()
    val q = stream.writeStream.format("memory").queryName("articles_stream")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("articles_stream").count() == 50)
      // rate cap: no micro-batch admitted more than 2 pages x 10 rows,
      // and draining 5 pages needed at least 3 batches
      val withInput = q.recentProgress.filter(_.numInputRows > 0)
      assert(withInput.length >= 3, withInput.map(_.numInputRows).mkString(","))
      withInput.foreach(p => assert(p.numInputRows <= 20, p.numInputRows))
      // exactly the batch rows, streamed
      val batch = spark.read.format("graft.sources.ArticlesSource")
        .option("pages", 5).option("pageSize", 10).option("query", "bitcoin").load()
      assert(spark.table("articles_stream").except(batch).count() == 0)
      assert(batch.except(spark.table("articles_stream")).count() == 0)
    } finally q.stop()
  }

  test("checkpointed restart resumes at the committed page offset — no page re-emitted") {
    val spark = TestSpark.spark
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-articles-restart")
    val ckpt = s"$base/ckpt"
    val out = s"$base/out"
    // Memory sinks refuse checkpoint recovery (not fault-tolerant), so
    // the restart boundary is proven against the parquet file sink —
    // the recovery-capable sink production would use, whose commit log
    // also makes re-emission visible as duplicate rows in the output.
    def start(pages: Int) =
      spark.readStream.format("graft.sources.ArticlesSource")
        .option("pages", pages).option("pageSize", 10)
        .option("pagesPerTrigger", 1).option("query", "bitcoin")
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()

    // Run 1: drain a 3-page feed, stop cleanly — offsets are committed
    // to the checkpoint through the engine's JSON offset round-trip.
    val q1 = start(pages = 3)
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() == 30)

    // Run 2: SAME checkpoint, the feed has grown to 6 pages. The
    // restarted stream must deserialize the committed offset (page 3)
    // and admit only pages 4..6 — a re-emitted page would surface as
    // extra rows and duplicate urls in the output.
    val q2 = start(pages = 6)
    try {
      q2.processAllAvailable()
      // admission control survives the restart: exactly the 3 new
      // pages were admitted, one page per trigger
      val withInput = q2.recentProgress.filter(_.numInputRows > 0)
      assert(withInput.map(_.numInputRows).sum == 30,
        withInput.map(_.numInputRows).mkString(","))
      assert(withInput.length >= 3, withInput.map(_.numInputRows).mkString(","))
      withInput.foreach(p => assert(p.numInputRows <= 10, p.numInputRows))
    } finally q2.stop()
    // the two runs together are exactly the 6-page batch read, once
    val streamedAll = spark.read.parquet(out)
    assert(streamedAll.count() == 60, s"total rows = ${streamedAll.count()}")
    val batch = read(pages = 6, pageSize = 10)
    assert(streamedAll.except(batch).count() == 0)
    assert(batch.except(streamedAll).count() == 0)
  }

  test("DSv2 stream drives the entity pipeline: complete-mode counts equal the batch run") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft-articles-e2e").toString
    // S4 (DSv2 micro-batch, rate-capped) → P7 to_json → P1/P2/P3/P4
    // parse → U1 NER → U2 explode → A1 grouped count, complete mode —
    // the whole reference pipeline driven by the in-engine source.
    val articles = spark.readStream.format("graft.sources.ArticlesSource")
      .option("pages", 3).option("pageSize", 20)
      .option("pagesPerTrigger", 1).option("query", "bitcoin")
      .load()
    val asKafkaValue = articles
      .select(to_json(struct(articles.columns.map(col): _*)).as("value"))
    val counts = EntityPipeline.countEntities(EntityPipeline.parseArticles(asKafkaValue))
    val q = counts.writeStream.outputMode("complete")
      .format("memory").queryName("articles_e2e_counts")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("articles_e2e_counts")
      val batchArticles = read(pages = 3, pageSize = 20)
      val batchCounts = EntityPipeline.countEntities(EntityPipeline.parseArticles(
        batchArticles.select(to_json(struct(batchArticles.columns.map(col): _*)).as("value"))))
      assert(streamed.except(batchCounts).count() == 0)
      assert(batchCounts.except(streamed).count() == 0)
      // and it genuinely ran micro-batched under the page cap
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
    } finally q.stop()
  }

  test("DSv2 stream composes with the ingest dedup: duplicate urls dropped in flight") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft-articles-dedup-ckpt").toString
    val articles = spark.readStream.format("graft.sources.ArticlesSource")
      .option("pages", 4).option("pageSize", 10)
      .option("pagesPerTrigger", 1).option("query", "bitcoin")
      .load()
      .withColumn("ts", coalesce(
        to_timestamp($"publishedAt", "yyyy-MM-dd'T'HH:mm:ss'Z'"), current_timestamp()))
    val deduped = graft.streaming.IngestSim.dedupFirstSeen(
      graft.streaming.IngestSim.payload(articles, "bitcoin"))
    val q = deduped.select($"url").writeStream
      .format("memory").queryName("articles_deduped")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val urls = spark.table("articles_deduped").as[String].collect()
      // the source emits ~10% duplicate urls by construction; after the
      // watermark dedup every url is unique and nothing else was lost
      assert(urls.length == urls.distinct.length)
      assert(urls.length == 36, urls.length) // 40 articles, 4 dup urls
    } finally q.stop()
  }
}
