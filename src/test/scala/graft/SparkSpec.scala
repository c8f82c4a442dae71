package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole test JVM (suites run sequentially
  * in sbt's forked test JVM).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.sql.shuffle.partitions", "4")
      // see Bench.scala: inferred-constraint inlining re-evaluates folds
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"

  /** Timestamp from a Row column that may be TIMESTAMP
    * (java.sql.Timestamp) or TIMESTAMP_NTZ (java.time.LocalDateTime —
    * how Spark 4 reads the generator's unadjusted `timestamp[us]`
    * parquet). Sessions here are UTC, so the NTZ wall-clock IS the
    * instant.
    */
  def rowTs(r: org.apache.spark.sql.Row, i: Int): java.sql.Timestamp =
    r.get(i) match {
      case t: java.sql.Timestamp => t
      case l: java.time.LocalDateTime =>
        java.sql.Timestamp.from(l.toInstant(java.time.ZoneOffset.UTC))
    }
}
