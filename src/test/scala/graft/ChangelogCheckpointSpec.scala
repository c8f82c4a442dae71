package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pin RocksDB CHANGELOG CHECKPOINTING — the production knob that
  * makes large-state checkpoints incremental (per batch the store
  * uploads only the batch's own changelog instead of a full RocksDB
  * snapshot; snapshots still happen, but in the background at the
  * maintenance interval). At 100 TB this is the difference between
  * checkpoint cost scaling with STATE SIZE and scaling with BATCH
  * DELTA, so the engine's doors must run correctly under it — pinned
  * here the way DPP/TTL/PIPE were pinned as spec-level surfaces:
  *
  *  - the door runs with the conf on and the checkpoint layout really
  *    shows `.changelog` files (the conf was honored, not ignored);
  *  - a forced replay (dropped commit marker, restart) reproduces
  *    byte-identical verdicts — state restore through changelog replay
  *    preserves the exactly-once story the doors certify elsewhere
  *    under full-snapshot checkpoints.
  *
  * Probed-then-skipped if this Spark build lacks the changelog writer
  * (the spark-avro discipline); Spark 4.1 ships it.
  */
class ChangelogCheckpointSpec extends AnyFunSuite {

  private val ChangelogKey =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  test("LRU door under changelog checkpointing: layout shows changelogs; forced replay is exactly-once") {
    assume(scala.util.Try(Class.forName(
      "org.apache.spark.sql.execution.streaming.state.StateStoreChangelogWriter"
    )).isSuccess, "this Spark build has no state-store changelog support")
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val arrivals = (0L until 120L).map(i => (i, i, s"k${i % 17}"))
    val batches = Seq(arrivals.take(40), arrivals.slice(40, 80), arrivals.drop(80))
    val maxsize = 10

    def runDoor(parts: Seq[Seq[(Long, Long, String)]],
                forceReplayAfter: Option[Int]): Seq[String] = {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_clog_ckpt").toString
      val out = java.nio.file.Files.createTempDirectory("graft_clog_out").toString
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, String)]
      val stream = input.toDF().toDF("seq", "doc_id", "key")
      def start() = graft.streaming.StreamingLru.run(stream, maxsize, out, ckpt)
      val upTo = forceReplayAfter.getOrElse(parts.length)
      val q1 = start()
      try parts.take(upTo).foreach { b =>
        input.addData(b); q1.processAllAvailable()
      } finally q1.stop()
      forceReplayAfter.foreach { n =>
        // crash between offset log and commit: drop the LAST commit
        // marker (and its local-FS checksum sibling) so the restart
        // MUST re-execute that batch id from changelog-restored state
        val commits = new java.io.File(s"$ckpt/commits").listFiles()
          .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
        assert(commits.map(_.getName.toLong).toSeq == (0L until n).toSeq)
        val lastId = commits.last.getName
        assert(commits.last.delete())
        val crc = new java.io.File(s"$ckpt/commits/.$lastId.crc")
        if (crc.exists()) assert(crc.delete())
        val q2 = start()
        try {
          q2.processAllAvailable() // replays the uncommitted batch
          parts.drop(n).foreach { b => input.addData(b); q2.processAllAvailable() }
        } finally q2.stop()
      }
      // the conf was honored: per-batch changelog files in the layout
      // (walk stream holds directory handles — close it)
      val changelogs = scala.util.Using.resource(
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$ckpt/state"))) {
        _.filter(p => p.getFileName.toString.endsWith(".changelog")).count()
      }
      assert(changelogs >= parts.length,
        s"expected one changelog per committed batch under $ckpt/state, found $changelogs")
      spark.read.parquet(out).drop("batch_id")
        .orderBy($"seq").collect().toSeq.map(_.toString)
    }

    val prev = spark.conf.getOption(ChangelogKey)
    spark.conf.set(ChangelogKey, "true")
    try {
      val clean = runDoor(batches, forceReplayAfter = None)
      val replayed = runDoor(batches, forceReplayAfter = Some(2))
      assert(clean.nonEmpty && replayed == clean,
        "forced replay under changelog checkpointing must emit identical verdicts")
    } finally prev match {
      case Some(v) => spark.conf.set(ChangelogKey, v)
      case None    => spark.conf.unset(ChangelogKey)
    }
  }
}
