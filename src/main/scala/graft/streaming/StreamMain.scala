package graft.streaming

import org.apache.spark.sql.SparkSession

/** CLI entry point for the parity streaming job — the analog of
  * `spark-submit app/spark_entity_counter.py` (readme.md:77-96):
  * argument names, env-var fallbacks, and defaults match
  * spark_entity_counter.py:91-98 one to one
  * (`--bootstrap-servers`/KAFKA_BOOTSTRAP_SERVERS,
  * `--input-topic`/INPUT_TOPIC, `--output-topic`/OUTPUT_TOPIC,
  * `--trigger`/TRIGGER), plus `--checkpoint-dir`/CHECKPOINT_DIR over
  * the reference's hardcoded path (spark_entity_counter.py:153).
  *
  *   sbt "runMain graft.streaming.StreamMain --help"
  *   sbt "runMain graft.streaming.StreamMain --bootstrap-servers host:9092 \
  *        --input-topic topic1 --output-topic topic2 --trigger '30 seconds'"
  *
  * Precedence: explicit flag > environment variable > default — the
  * same resolution argparse's `default=os.getenv(...)` gives the
  * reference. Requires the spark-sql-kafka connector on the classpath
  * (readme.md:78); in connector-less environments the job fails at
  * source resolution with Spark's standard missing-data-source error
  * (pinned in StreamMainSpec).
  */
object StreamMain {

  val usage: String =
    """usage: graft.streaming.StreamMain [options]
      |
      |  --bootstrap-servers <host:port,...>  Kafka brokers        [env KAFKA_BOOTSTRAP_SERVERS, default localhost:9092]
      |  --input-topic <name>                 topic to read        [env INPUT_TOPIC, default topic1]
      |  --output-topic <name>                topic to write       [env OUTPUT_TOPIC, default topic2]
      |  --trigger <interval>                 processing trigger   [env TRIGGER, default "30 seconds"]
      |  --checkpoint-dir <path>              checkpoint location  [env CHECKPOINT_DIR, default /tmp/spark_entity_counter_checkpoint]
      |  --help                               print this message and exit
      |""".stripMargin

  /** Pure arg/env resolution (flag > env > default), separated from
    * main() so precedence is unit-testable without a JVM exit.
    */
  def parse(args: Seq[String], env: Map[String, String]): StreamJob.Config = {
    def fromEnv(key: String, default: String) = env.getOrElse(key, default)
    val defaults = StreamJob.Config(
      bootstrapServers = fromEnv("KAFKA_BOOTSTRAP_SERVERS", "localhost:9092"),
      inputTopic = fromEnv("INPUT_TOPIC", "topic1"),
      outputTopic = fromEnv("OUTPUT_TOPIC", "topic2"),
      checkpointDir = fromEnv("CHECKPOINT_DIR", "/tmp/spark_entity_counter_checkpoint"),
      trigger = fromEnv("TRIGGER", "30 seconds"))
    @annotation.tailrec
    def loop(rest: List[String], cfg: StreamJob.Config): StreamJob.Config = rest match {
      case Nil => cfg
      case "--bootstrap-servers" :: v :: t => loop(t, cfg.copy(bootstrapServers = v))
      case "--input-topic" :: v :: t => loop(t, cfg.copy(inputTopic = v))
      case "--output-topic" :: v :: t => loop(t, cfg.copy(outputTopic = v))
      case "--trigger" :: v :: t => loop(t, cfg.copy(trigger = v))
      case "--checkpoint-dir" :: v :: t => loop(t, cfg.copy(checkpointDir = v))
      case other :: _ =>
        throw new IllegalArgumentException(s"unknown or incomplete argument: $other\n$usage")
    }
    loop(args.toList, defaults)
  }

  def main(args: Array[String]): Unit = {
    if (args.contains("--help")) { println(usage); return }
    val cfg = parse(args.toSeq, sys.env)
    val spark = SparkSession.builder()
      .appName("spark_entity_counter")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val query = StreamJob.run(spark, cfg)
    query.awaitTermination()
  }
}
