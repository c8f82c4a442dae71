package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.pipeline.EntityPipeline

/** The reference's streaming job, reproduced one-to-one in Scala
  * Structured Streaming (spark_entity_counter.py:117-156):
  *
  *   Kafka topic1 → cast/parse/concat → NER → explode →
  *   groupBy(entity).count() [complete mode, unbounded state] →
  *   to_json(struct(entity, count, timestamp)) → Kafka topic2,
  *   processing-time trigger (default 30 s), checkpointed.
  *
  * The Python/Arrow worker boundary of the reference (its costliest
  * stage, SURVEY.md §3.1) does not exist here — the NER expression is
  * JVM-native and stays in the executor.
  *
  * The transform is factored so tests drive it from `MemoryStream`
  * (the Kafka connector's behavior is Spark's, not ours — SURVEY.md
  * §7.2): [[transform]] takes any DataFrame bearing a Kafka-shaped
  * `value` column and returns the sink-ready frame.
  */
object StreamJob {

  /** CLI surface of the reference (readme.md:88-96 / .env.example).
    * `trigger` is the interval string exactly as the reference takes it
    * (spark_entity_counter.py:95, e.g. "30 seconds"); the checkpoint
    * dir defaults to the reference's hardcoded path
    * (spark_entity_counter.py:153) but is overridable.
    */
  final case class Config(
      bootstrapServers: String = "localhost:9092",
      inputTopic: String = "topic1",
      outputTopic: String = "topic2",
      checkpointDir: String = "/tmp/spark_entity_counter_checkpoint",
      trigger: String = "30 seconds")

  /** Kafka-value stream → entity-count stream serialized for the sink.
    * `current_timestamp` stamps rows per-trigger exactly like the
    * reference (spark_entity_counter.py:142) — hence excluded from
    * oracle-checked outputs (SURVEY.md §7.4).
    */
  def transform(raw: DataFrame): DataFrame =
    EntityPipeline.countEntities(EntityPipeline.parseArticles(raw))
      .select(to_json(struct(
        col("entity"),
        col("count"),
        current_timestamp().as("timestamp"))).as("value"))

  /** Entity-count stream without the sink serialization — the form the
    * MemoryStream tests assert on (complete-mode running counts).
    */
  def entityCounts(raw: DataFrame): DataFrame =
    EntityPipeline.countEntities(EntityPipeline.parseArticles(raw))

  /** Full parity job against Kafka — source options identical to
    * spark_entity_counter.py:117-124, sink to :147-156. Requires the
    * spark-sql-kafka connector on the classpath (not present in the
    * offline test image; covered there by the MemoryStream suite).
    */
  def run(spark: SparkSession, cfg: Config): StreamingQuery = {
    val raw = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("subscribe", cfg.inputTopic)
      .option("startingOffsets", "latest")
      .load()
    transform(raw).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("topic", cfg.outputTopic)
      .option("checkpointLocation", cfg.checkpointDir)
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.ProcessingTime(cfg.trigger))
      .start()
  }

  /** Extension beyond parity (ST3/ST4): watermarked tumbling-window
    * counts — the bounded-state form of the reference's unbounded
    * aggregate, for event-time streams. Works over any frame with
    * (ts: timestamp, key: string).
    */
  def windowedCounts(events: DataFrame, watermark: String, windowLen: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("key"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("key"), col("n"))

  /** Extension (ST7): the honest in-engine analog of the producer's
    * bounded LRU dedup — watermark-bounded state instead of an
    * unbounded distinct set.
    */
  def dedupWithinWatermark(articles: DataFrame, watermark: String): DataFrame =
    articles.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("url")
}
