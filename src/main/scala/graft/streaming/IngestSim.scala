package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.pipeline.ArticleSchema

/** In-engine ingest simulator — the producer half of the reference's
  * two-process story (news_producer.py:64-167), re-expressed as a
  * Structured Streaming job so the full NewsAPI→Kafka→Spark topology
  * can run offline:
  *
  *  - a file source stands in for the NewsAPI poll loop; each dropped
  *    file is one "page" of articles, and `maxFilesPerTrigger` caps
  *    per-trigger intake exactly where the reference bounds a poll
  *    (page_size, news_producer.py:81-82) — ST8's rate-capping knob,
  *    exercised in IngestSimSpec;
  *  - dedup key = url, falling back to title|publishedAt
  *    (news_producer.py:120), suppressed with
  *    `dropDuplicatesWithinWatermark` — the engine's bounded-state
  *    dedup operator, the honest analog of the producer's LRU set
  *    (news_producer.py:30-47): the LRU evicts the oldest keys past a
  *    size bound, the watermark evicts keys older than a time horizon;
  *    both re-admit a key after eviction, both bound state. (A custom
  *    eviction policy would be a flatMapGroupsWithState op — see
  *    StreamingExtrasSpec — but Spark's built-in is the right default:
  *    its state is store-backed, codegen'd, and AQE/checkpoint-safe.)
  *  - the emitted payload is the producer's projection
  *    (news_producer.py:126-136): the article fields with fetchedAt
  *    stamped at ingest and the query echoed.
  *
  * At 100 TB-scale ingest the shape holds: dedup state shards by key
  * hash across executors, per-trigger intake is bounded by the rate
  * cap, and the watermark keeps per-shard state finite.
  */
object IngestSim {

  /** Raw article fields as fetched — before the producer stamps
    * fetchedAt/query (news_producer.py:126-134).
    */
  val fetchSchema: StructType = StructType(
    ArticleSchema.schema.fields.filterNot(f => f.name == "fetchedAt" || f.name == "query"))

  /** First-seen filter with watermark-bounded keyed state (the LRU
    * analog). `articles` must carry an event-time `ts` column; state
    * for a key is dropped once the watermark passes ts + ttl.
    */
  def dedupFirstSeen(articles: DataFrame, ttl: String = "10 minutes"): DataFrame = {
    val spark = articles.sparkSession
    import spark.implicits._
    articles
      .withColumn("dedup_key",
        coalesce($"url", concat_ws("|", $"title", $"publishedAt")))
      .filter($"dedup_key".isNotNull && $"dedup_key" =!= "")
      .withWatermark("ts", ttl)
      .dropDuplicatesWithinWatermark("dedup_key")
  }

  /** The producer's payload projection over a schema'd article frame:
    * stamps fetchedAt (wall clock, like time.gmtime() in
    * news_producer.py:134) and echoes the query term.
    */
  def payload(articles: DataFrame, query: String): DataFrame = {
    val spark = articles.sparkSession
    import spark.implicits._
    articles.withColumn("payload_json", to_json(struct(
      $"source", $"author", $"title", $"description", $"url",
      $"publishedAt", $"content",
      date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("fetchedAt"),
      lit(query).as("query"))))
  }

  /** The whole simulator: watch a directory of article-JSON files
    * (rate-capped), dedup, project, and emit `value` rows shaped for a
    * Kafka sink — run offline against any sink format. Event time is
    * publishedAt when parseable, else ingest wall clock.
    */
  def run(spark: SparkSession, inDir: String, checkpointDir: String,
          query: String, maxFilesPerTrigger: Int,
          sinkFormat: String, sinkOptions: Map[String, String],
          queryName: Option[String] = None,
          trigger: Trigger = Trigger.ProcessingTime("0 seconds")): StreamingQuery = {
    import spark.implicits._
    val raw = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(inDir)
      .select(from_json(col("value"), fetchSchema).as("a"))
      .select("a.*")
      .withColumn("ts", coalesce(
        to_timestamp($"publishedAt", "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        current_timestamp()))
    val out = dedupFirstSeen(payload(raw, query)).select($"payload_json".as("value"))
    val writer = out.writeStream
      .format(sinkFormat)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(trigger)
    val named = queryName.fold(writer)(writer.queryName)
    sinkOptions.foldLeft(named) { case (w, (k, v)) => w.option(k, v) }.start()
  }
}
