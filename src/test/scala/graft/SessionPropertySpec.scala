package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.ops.EventOps

/** Model-based property tests for the session-window family over
  * random event logs whose inter-arrival deltas are drawn from a
  * BOUNDARY-HEAVY set — exact 10- and 30-minute gaps, one-microsecond
  * neighbors on either side, and zero-delta ties. The generated sf
  * corpora can never produce an exact-boundary pair (microsecond
  * timestamps), so the crafted pins in EventOpsSpec are single points;
  * this sweeps the whole class: every sample demands the engine's
  * session_window (static 10-minute form and e43's dynamic per-event
  * gap form) equal a driver fold of the probed semantics — inclusive
  * merge at the exact end, split only strictly past it, session end =
  * running max of per-event ts+gap.
  */
object SessionPropertySpec extends Properties("session-windows") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withMaxDiscardRatio(10.0f)

  private val baseUs = 1704067200000000L // 2024-01-01T00:00:00Z in µs
  private val tenMinUs = 600000000L
  private val thirtyMinUs = 1800000000L

  // deltas cluster on the boundaries: the exact gap, ±1 µs, ties, and
  // a few unremarkable fillers
  private val genDelta: Gen[Long] = Gen.oneOf(
    0L, 1L, 30000000L, 59000000L,
    tenMinUs - 1L, tenMinUs, tenMinUs + 1L,
    thirtyMinUs - 1L, thirtyMinUs, thirtyMinUs + 1L)

  private val genType: Gen[String] =
    Gen.frequency(3 -> "view", 2 -> "click", 2 -> "purchase")

  /** Per user: 2-8 events as cumulative boundary-heavy deltas. */
  private val genLog: Gen[List[(Long, Long, String)]] = for {
    nUsers <- Gen.choose(1, 3)
    logs <- Gen.sequence[List[List[(Long, Long, String)]], List[(Long, Long, String)]](
      (1 to nUsers).toList.map { u =>
        for {
          n <- Gen.choose(2, 8)
          deltas <- Gen.listOfN(n, genDelta)
          types <- Gen.listOfN(n, genType)
        } yield {
          val ts = deltas.scanLeft(baseUs)(_ + _).tail
          ts.zip(types).map { case (t, tp) => (u.toLong, t, tp) }
        }
      })
  } yield logs.flatten

  private def tsOf(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))

  private def usOf(t: java.sql.Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  /** The probed semantics as a driver fold: sorted by ts, split only
    * STRICTLY past the running-max end. Order-insensitive under ties
    * (max is commutative; tied rows share the split verdict).
    */
  private def model(log: List[(Long, Long, String)], gapUs: String => Long)
      : Set[(Long, Long, Long, Long)] = {
    log.groupBy(_._1).toSeq.flatMap { case (uid, evs) =>
      val sorted = evs.map(e => (e._2, e._3)).sortBy(_._1)
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
      var start = sorted.head._1
      var end = sorted.head._1 + gapUs(sorted.head._2)
      var n = 1L
      var np = if (sorted.head._2 == "purchase") 1L else 0L
      sorted.tail.foreach { case (t, tp) =>
        if (t > end) {
          out += ((uid, start, n, np)); start = t; n = 0L; np = 0L; end = t
        }
        end = math.max(end, t + gapUs(tp))
        n += 1L
        if (tp == "purchase") np += 1L
      }
      out += ((uid, start, n, np))
      out
    }.toSet
  }

  property("static 10-minute session_window == the strict-> running fold") =
    Prop.forAllNoShrink(genLog) { evlog =>
      val spark = TestSpark.spark
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val df = evlog.map { case (u, t, tp) => (u, tsOf(t), tp) }
        .toDF("user_id", "ts", "event_type")
      val got = df.groupBy(session_window($"ts", "10 minutes"), $"user_id")
        .agg(count(lit(1)).as("n"))
        .select($"user_id", $"session_window.start".as("s"), $"n")
        .collect()
        .map(r => (r.getLong(0), usOf(TestSpark.rowTs(r, 1)), r.getLong(2)))
        .toSet
      val want = model(evlog, _ => tenMinUs).map(s => (s._1, s._2, s._3))
      got == want
    }

  property("e43 dynamic-gap frame == the running-max fold incl. purchase counts") =
    Prop.forAllNoShrink(genLog) { evlog =>
      val spark = TestSpark.spark
      import spark.implicits._
      val df = evlog.map { case (u, t, tp) => (u, tsOf(t), tp) }
        .toDF("user_id", "ts", "event_type")
      val got = EventOps.dynamicSessionFrame(df).collect()
        .map(r => (r.getLong(0), usOf(TestSpark.rowTs(r, 1)),
          r.getLong(2), r.getLong(3)))
        .toSet
      val want = model(evlog,
        tp => if (tp == "purchase") thirtyMinUs else tenMinUs)
      got == want
    }
}
