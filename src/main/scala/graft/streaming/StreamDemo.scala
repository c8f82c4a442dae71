package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Self-contained runnable demo of the parity streaming pipeline with a
  * file source standing in for Kafka (no broker in the test image):
  * writes JSON article batches into a temp directory, streams them
  * through the reference pipeline (complete mode), and prints the
  * running entity counts after each batch — the observable behavior of
  * spark_entity_counter.py end to end.
  *
  *   sbt "runMain graft.streaming.StreamDemo"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stream-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val inDir = Files.createTempDirectory("graft_demo_in").toString
    val ckpt = Files.createTempDirectory("graft_demo_ckpt").toString

    def article(title: String): String =
      s"""{"source":null,"author":null,"title":"$title","description":null,""" +
        s""""url":"http://x","publishedAt":"2024-01-01T00:00:00Z","content":null,""" +
        s""""fetchedAt":"2024-01-01T00:00:00Z","query":"demo"}"""

    // file source delivers one column `value` — same shape the Kafka
    // source exposes after the CAST (P1).
    val raw = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .text(inDir)
      .toDF("value")

    val query = StreamJob.entityCounts(raw).writeStream
      .format("memory").queryName("demo_counts")
      .option("checkpointLocation", ckpt)
      .outputMode("complete")
      .start()

    def feed(name: String, lines: Seq[String]): Unit = {
      Files.write(java.nio.file.Paths.get(s"$inDir/$name.json"),
        lines.mkString("\n").getBytes("UTF-8"))
      query.processAllAvailable()
      println(s"--- after batch $name ---")
      spark.table("demo_counts").orderBy($"count".desc, $"entity").show(false)
    }

    feed("b1", Seq(article("Spark streams the table"), article("Alice joins spark")))
    feed("b2", Seq(article("spark spark everywhere"), article("Bob merges the stream")))

    query.stop()
    spark.stop()
  }
}
