package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{IngestSim, StreamJob, StreamMain}

class IngestSimSpec extends AnyFunSuite {

  test("StreamMain precedence: flag beats env beats default (reference arg names)") {
    val defaults = StreamMain.parse(Nil, Map.empty)
    assert(defaults == StreamJob.Config(
      "localhost:9092", "topic1", "topic2",
      "/tmp/spark_entity_counter_checkpoint", "30 seconds"))
    val env = Map(
      "KAFKA_BOOTSTRAP_SERVERS" -> "envhost:9092", "INPUT_TOPIC" -> "envin",
      "OUTPUT_TOPIC" -> "envout", "TRIGGER" -> "5 seconds",
      "CHECKPOINT_DIR" -> "/tmp/envckpt")
    val fromEnv = StreamMain.parse(Nil, env)
    assert(fromEnv == StreamJob.Config(
      "envhost:9092", "envin", "envout", "/tmp/envckpt", "5 seconds"))
    val fromArgs = StreamMain.parse(
      Seq("--bootstrap-servers", "arghost:9092", "--trigger", "1 seconds"), env)
    assert(fromArgs.bootstrapServers == "arghost:9092")
    assert(fromArgs.trigger == "1 seconds")
    assert(fromArgs.inputTopic == "envin") // env still fills unflagged fields
    intercept[IllegalArgumentException](StreamMain.parse(Seq("--nope"), Map.empty))
    assert(StreamMain.usage.contains("--bootstrap-servers"))
    assert(StreamMain.usage.contains("--input-topic"))
    assert(StreamMain.usage.contains("--output-topic"))
    assert(StreamMain.usage.contains("--trigger"))
  }

  test("kafka source boundary: connector absent resolves to the pinned Spark error") {
    val spark = TestSpark.spark
    // The parity job's source format is Spark's own connector
    // (readme.md:78); this image ships without it, so starting the job
    // must fail at data-source resolution — not silently misbehave.
    val e = intercept[Exception] {
      StreamJob.run(spark, StreamJob.Config(checkpointDir =
        Files.createTempDirectory("graft-kafka-ckpt").toString))
    }
    val msg = Option(e.getMessage).getOrElse("") + e.getClass.getName
    assert(msg.toLowerCase.contains("kafka"), msg)
  }

  test("ingest simulator: rate-capped triggers, LRU-analog dedup, producer payload") {
    val spark = TestSpark.spark
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft-ingest-in").toString
    val ckpt = Files.createTempDirectory("graft-ingest-ckpt").toString

    def article(url: String, title: String): String =
      s"""{"source":"{\\"id\\":null,\\"name\\":\\"x\\"}","author":"a","title":"$title",""" +
        s""""description":"d","url":"$url","publishedAt":"2024-01-01T00:00:00Z","content":"c"}"""

    // Three "pages" written BEFORE the stream starts; maxFilesPerTrigger=1
    // must spread them across >=3 triggers (ST8 rate capping).
    Files.write(Paths.get(s"$inDir/p1.json"),
      Seq(article("http://a", "A"), article("http://b", "B")).mkString("\n").getBytes)
    Files.write(Paths.get(s"$inDir/p2.json"),
      Seq(article("http://a", "A dup"), article("http://c", "C")).mkString("\n").getBytes)
    Files.write(Paths.get(s"$inDir/p3.json"),
      Seq(article("http://b", "B dup"), article("http://d", "D")).mkString("\n").getBytes)

    val query = IngestSim.run(spark, inDir, ckpt, query = "bitcoin",
      maxFilesPerTrigger = 1, sinkFormat = "memory", sinkOptions = Map.empty,
      queryName = Some("ingest_out"),
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    try {
      assert(query.awaitTermination(120000), "ingest query did not drain in time")
      val out = spark.table("ingest_out").as[String].collect()
      // LRU-analog dedup: http://a and http://b appear once each.
      assert(out.length == 4, out.mkString("\n"))
      val urls = out.map(j => ujsonField(j, "url")).sorted
      assert(urls.toSeq == Seq("http://a", "http://b", "http://c", "http://d"))
      // Producer payload projection: fetchedAt stamped, query echoed.
      out.foreach { j =>
        assert(ujsonField(j, "query") == "bitcoin")
        assert(ujsonField(j, "fetchedAt").endsWith("Z"))
      }
      // ST8: with maxFilesPerTrigger=1, no trigger ingested more rows
      // than one file holds, and it took >=3 triggers with input.
      val withInput = query.recentProgress.filter(_.numInputRows > 0)
      assert(withInput.length >= 3, withInput.map(_.numInputRows).mkString(","))
      withInput.foreach(p => assert(p.numInputRows <= 2, p.numInputRows))
    } finally query.stop()
  }

  private def ujsonField(json: String, field: String): String = {
    val m = ("\"" + field + "\":\"((?:[^\"\\\\]|\\\\.)*)\"").r.findFirstMatchIn(json)
    assert(m.isDefined, s"$field missing in $json")
    m.get.group(1)
  }

  test("full topology: producer-analog output feeds the entity counter end to end") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    import spark.implicits._
    val pagesDir = Files.createTempDirectory("graft-topo-pages").toString
    val topicDir = Files.createTempDirectory("graft-topo-topic").toString
    val ckptP = Files.createTempDirectory("graft-topo-ckpt-p").toString
    val ckptC = Files.createTempDirectory("graft-topo-ckpt-c").toString

    def article(url: String, title: String): String =
      s"""{"source":"x","author":"a","title":"$title","description":"d",""" +
        s""""url":"$url","publishedAt":"2024-01-01T00:00:00Z","content":"c"}"""

    Files.write(Paths.get(s"$pagesDir/p1.json"), Seq(
      article("http://a", "Spark streams"),
      article("http://b", "Alice joins spark")).mkString("\n").getBytes)
    Files.write(Paths.get(s"$pagesDir/p2.json"), Seq(
      article("http://a", "Spark streams"), // dup url: must not count twice
      article("http://c", "spark wins")).mkString("\n").getBytes)

    val producer = IngestSim.run(spark, pagesDir, ckptP, query = "demo",
      maxFilesPerTrigger = 1, sinkFormat = "text",
      sinkOptions = Map("path" -> topicDir),
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    assert(producer.awaitTermination(120000))

    val raw = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .text(topicDir)
    val consumer = StreamJob.entityCounts(raw).writeStream
      .format("memory").queryName("topo_counts_t")
      .option("checkpointLocation", ckptC)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(consumer.awaitTermination(120000))

    val counts = spark.table("topo_counts_t")
      .as[(String, Long)].collect().toMap
    // dedup dropped the repeated http://a article, so "Spark" counts once
    // from it; entities follow RuleNer over title (titles only contain
    // the capitalized/gazetteer words)
    assert(counts.get("spark").contains(2L), counts)   // "joins spark", "spark wins"
    assert(counts.get("Spark").contains(1L), counts)   // dup page dropped
    assert(counts.get("Alice").contains(1L), counts)
  }
}
