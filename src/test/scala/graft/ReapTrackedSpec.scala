package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.LogicalRDD

/** Regression for the tracked() reap-set race: the original
  * implementation diffed the session-global getPersistentRDDs map
  * around `body`, so an RDD pinned CONCURRENTLY by another component
  * (a second door starting in parallel, a CorpusIndexes.memo build)
  * landed in the reap set and termination unpersisted it — severing a
  * lineage-free localCheckpoint unrecoverably. The fix collects pins
  * explicitly off each checkpointed plan's LogicalRDD leaf; this spec
  * pins a foreign checkpoint while a tracked body runs and proves the
  * reap releases exactly the body's own pins.
  */
class ReapTrackedSpec extends AnyFunSuite {

  private def backingRdd(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }.head

  test("tracked reaps exactly its own pins; a concurrent foreign checkpoint survives") {
    val spark = TestSpark.spark
    import spark.implicits._
    // A foreign component's checkpoint, pinned while the tracked body
    // runs (the interleaving the diff-based version mis-captured).
    val foreign = Seq(1L, 2L, 3L).toDF("x").localCheckpoint()
    val foreignRdd = backingRdd(foreign)
    try {
      val ((a, b), reap) =
        graft.streaming.ReapOnTerminate.tracked(spark) { pin =>
          val first = pin(Seq(4L, 5L).toDF("x"))
          // interleave another foreign pin INSIDE the body's window —
          // the exact case the global diff could not distinguish
          val mid = Seq(9L).toDF("x").localCheckpoint()
          (first, (pin(Seq(6L).toDF("x")), mid))
        }
      val (second, mid) = b
      val (aRdd, sRdd, midRdd) = (backingRdd(a), backingRdd(second), backingRdd(mid))
      val persisted = spark.sparkContext.getPersistentRDDs
      assert(persisted.contains(aRdd.id) && persisted.contains(sRdd.id))
      try {
        reap()
        val after = spark.sparkContext.getPersistentRDDs
        // its own pins are released...
        assert(!after.contains(aRdd.id), "tracked pin survived its reap")
        assert(!after.contains(sRdd.id), "tracked pin survived its reap")
        // ...both foreign checkpoints stay pinned and still compute
        assert(after.contains(foreignRdd.id), "pre-existing foreign pin reaped")
        assert(after.contains(midRdd.id), "interleaved foreign pin reaped")
        assert(foreign.count() == 3L && mid.count() == 1L)
      } finally midRdd.unpersist(false)
    } finally foreignRdd.unpersist(false)
  }
}
