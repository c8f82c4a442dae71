package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** Run-scoped resource reaping for streaming doors: [[install]] starts
  * the query via `start` and guarantees `reap` runs EXACTLY ONCE when
  * that query terminates — or immediately, when `start()` itself
  * throws. The listener registers BEFORE start so a query that fails
  * or terminates at once still reaps (termination events are buffered
  * until the query id is known, and whichever side — listener thread
  * or caller — observes both facts first performs the one reap); the
  * listener path reaps on a daemon thread so blocking cleanup
  * (broadcast destroy, checkpoint-RDD unpersist) never stalls the
  * shared listener bus.
  *
  * Extracted from StreamingBloomPrescreen's lifecycle fix so every
  * door that pins run-scoped state (broadcast filters, model-table
  * checkpoints) shares ONE audited implementation instead of each
  * re-deriving the registration-order and double-reap subtleties.
  */
/** The RocksDB state-store provider `transformWithState` requires —
  * ONE constant for every door on the new API. The provider binds
  * when a query STARTS: a door that owns its start() sets it around
  * the start and restores after ([[StreamingLru.run]]); a builder
  * that returns a Dataset must leave the setting to whoever starts
  * the query ([[StreamTransitions2.transitions]]).
  */
object RocksDbProvider {
  val Key = "spark.sql.streaming.stateStore.providerClass"
  val Value =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
}

object ReapOnTerminate {

  def install(s: SparkSession, start: () => StreamingQuery,
              reap: () => Unit): StreamingQuery = {
    val reaped = new java.util.concurrent.atomic.AtomicBoolean(false)
    val qidRef =
      new java.util.concurrent.atomic.AtomicReference[java.util.UUID](null)
    val seenTerminated =
      java.util.concurrent.ConcurrentHashMap.newKeySet[java.util.UUID]()
    def reapOnce(async: Boolean): Unit =
      if (reaped.compareAndSet(false, true)) {
        if (async) {
          val t = new Thread(() => reap(), "graft-door-reap")
          t.setDaemon(true)
          t.start()
        } else reap()
      }
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
        seenTerminated.add(e.id)
        if (e.id == qidRef.get) {
          reapOnce(async = true)
          s.streams.removeListener(this)
        }
      }
    }
    s.streams.addListener(listener)
    val q =
      try start()
      catch {
        case t: Throwable =>
          s.streams.removeListener(listener)
          reapOnce(async = false)
          throw t
      }
    qidRef.set(q.id)
    if (seenTerminated.contains(q.id)) {
      reapOnce(async = false)
      s.streams.removeListener(listener)
    }
    q
  }

  /** Run `body` (typically a batch of localCheckpoint loads) and
    * return its result plus a reap closure that unpersists exactly
    * the RDDs `body` pinned through the `pin` callback it receives —
    * `pin(df)` localCheckpoints the frame and records the RDD backing
    * the checkpoint, read EXPLICITLY off the checkpointed plan's
    * LogicalRDD leaf. An earlier version diffed the session-global
    * `getPersistentRDDs` map around `body`; that diff captured RDDs
    * pinned CONCURRENTLY by other components (a second door starting
    * in parallel, a CorpusIndexes.memo build), and reaping those
    * severed the other component's lineage-free checkpoints
    * unrecoverably. Explicit collection has no such window.
    */
  def tracked[T](s: SparkSession)(
      body: (org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) => T)
      : (T, () => Unit) = {
    val pinned =
      scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.rdd.RDD[_]]
    val pin: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = { df =>
      val cp = df.localCheckpoint()
      cp.queryExecution.analyzed.foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          pinned.synchronized { pinned += l.rdd }
        case _ => ()
      }
      cp
    }
    val out = body(pin)
    val rdds = pinned.synchronized(pinned.toList)
    (out, () => rdds.foreach(_.unpersist(false)))
  }
}
