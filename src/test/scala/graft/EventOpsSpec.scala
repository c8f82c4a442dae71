package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventOps

/** e14/e15 share ONE events pass ([[EventOps.transitionStats]]): this
  * spec pins (1) the derivation — e14 is a projection + one window over
  * e15's aggregate, so materializing the stats frame once serves both
  * views — and (2) the plan shape — each registered query shuffles the
  * raw events exactly once (the user_id window exchange); every later
  * exchange carries only the |types|²-row aggregate.
  */
class EventOpsSpec extends AnyFunSuite {

  test("e14 is derivable from e15's aggregate (one shared events pass)") {
    val spark = TestSpark.spark
    val e14 = SparkEntry.queries("e14_transitions")(spark, TestSpark.sfDir).collect()
    val e15 = SparkEntry.queries("e15_dwell")(spark, TestSpark.sfDir).collect()
    assert(e14.nonEmpty && e14.length == e15.length)
    // identical (from, to, n) triples in identical order...
    assert(e14.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      e15.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq)
    // ...and e14's probability is exactly the window divide over e15's
    // counts (BIGINT÷BIGINT through double, recomputed driver-side).
    val fromTotals = e15.groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(2)).sum }
    e14.foreach { r =>
      val expect = r.getLong(2).toDouble / fromTotals(r.getString(0)).toDouble
      assert(r.getDouble(3) == expect, s"p mismatch on ${r.getString(0)}->${r.getString(1)}")
    }
  }

  test("e14/e15 executed plans shuffle raw events exactly once each") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    def shuffles(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
      case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
      case q: QueryStageExec => shuffles(q.plan)
      case r: ReusedExchangeExec => Seq.empty
      case s: ShuffleExchangeLike => s +: s.children.flatMap(shuffles)
      case other => other.children.flatMap(shuffles)
    }
    Seq("e14_transitions", "e15_dwell").foreach { name =>
      val df = SparkEntry.queries(name)(spark, TestSpark.sfDir)
      df.collect()
      // A shuffle still carrying user_id is a shuffle of raw event rows
      // (everything post-aggregate is keyed from_type/to_type only).
      val raw = shuffles(df.queryExecution.executedPlan)
        .filter(_.output.exists(_.name == "user_id"))
      assert(raw.length == 1,
        s"$name: expected exactly one raw-events exchange, got ${raw.length}")
    }
  }

  test("e16 windowed top-k agrees with the full e01-style day matrix") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = graft.ops.EventOps.windowedTopTypes(spark, TestSpark.sfDir).collect()
      .map(r => (TestSpark.rowTs(r, 0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    // driver recount from raw events: day-truncate, count, rank
    val events = Tables.events(spark, TestSpark.sfDir)
      .select($"ts", $"event_type").collect()
      .map(r => (TestSpark.rowTs(r, 0), r.getString(1)))
    val perDay = events.groupBy { case (ts, _) =>
      val c = java.util.Calendar.getInstance(java.util.TimeZone.getTimeZone("UTC"))
      c.setTime(ts); c.set(java.util.Calendar.HOUR_OF_DAY, 0)
      c.set(java.util.Calendar.MINUTE, 0); c.set(java.util.Calendar.SECOND, 0)
      c.set(java.util.Calendar.MILLISECOND, 0)
      new java.sql.Timestamp(c.getTimeInMillis)
    }.map { case (day, evs) => day -> evs.groupBy(_._2).map { case (t, a) => t -> a.length.toLong } }
    val expected = perDay.toSeq.sortBy(_._1.getTime).flatMap { case (day, counts) =>
      val total = counts.values.sum
      counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(3).zipWithIndex.map {
        case ((t, n), i) => (day, (i + 1).toLong, t, n, n.toDouble / total.toDouble)
      }
    }
    assert(got.toSeq == expected)
  }

  test("e19 funnel lag populations equal e11's stage counts") {
    val spark = TestSpark.spark
    val lags = graft.ops.EventOps.funnelLagPercentiles(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val f = graft.ops.EventOps.funnel(spark, TestSpark.sfDir).collect().head
    val (clickUsers, purchaseUsers) = (f.getLong(1), f.getLong(2))
    assert(lags("view_to_click")._1 == clickUsers)
    assert(lags("click_to_purchase")._1 == purchaseUsers)
    lags.values.foreach { case (n, p50, p90) =>
      assert(n > 0 && p50 <= p90 && p50 >= 0.0)
    }
  }

  test("e18 session features agree with e03's sessionization and bound sanely") {
    val spark = TestSpark.spark
    import spark.implicits._
    val feat = graft.ops.EventOps.sessionFeatures(spark, TestSpark.sfDir).collect()
      .map(r => ((r.getLong(0), r.get(1).toString),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    val e03 = graft.ops.EventOps.sessions(spark, TestSpark.sfDir).collect()
      .map(r => ((r.getLong(0), r.get(1).toString), r.getLong(2))).toMap
    // same sessions, same event counts
    assert(feat.keySet == e03.keySet && feat.nonEmpty)
    feat.foreach { case (k, (n, dur, nTypes, _)) =>
      assert(n == e03(k), s"$k: n_events")
      assert(dur >= 0 && (n > 1 || dur == 0), s"$k: duration")
      assert(nTypes >= 1 && nTypes <= math.min(n, 5), s"$k: n_types")
    }
    assert(feat.values.exists(_._4) && feat.values.exists(!_._4),
      "both conversion outcomes must occur")
  }

  test("e17 dwell percentiles equal a driver-side interpolation; rank gate holds") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = graft.ops.EventOps.transitionDwellPercentiles(spark, TestSpark.sfDir)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6)))).toMap
    assert(got.nonEmpty)
    val gaps = graft.ops.EventOps.transitionGaps(spark, TestSpark.sfDir)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    // linear interpolation at rank p*(n-1), the percentile/quantile_cont convention
    // Spark's Percentile form: lower*(1-d) + higher*d (NOT
    // lower + d*(higher-lower) — they differ by ULPs)
    def q(xs: Array[Long], p: Double): Double = {
      val pos = p * (xs.length - 1)
      val lo = pos.toInt
      if (lo == xs.length - 1) xs(lo).toDouble
      else xs(lo) * (1.0 - (pos - lo)) + xs(lo + 1) * (pos - lo)
    }
    assert(got.keySet == gaps.keySet)
    got.foreach { case (k, (n, p50, p90, p99, ok)) =>
      val xs = gaps(k)
      assert(n == xs.length)
      assert(p50 == q(xs, 0.5) && p90 == q(xs, 0.9) && p99 == q(xs, 0.99), s"$k")
      assert(p50 <= p90 && p90 <= p99)
      assert(ok, s"$k: approx rank gate must hold")
    }
  }

  test("e21 hourly uniques: exact counts recomputed, sketch inside tolerance") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = graft.ops.EventOps.hourlyUniques(spark, TestSpark.sfDir).collect()
    val raw = graft.Tables.events(spark, TestSpark.sfDir)
      .select($"ts".cast("timestamp"), $"user_id").collect()
      .map(r => (TestSpark.rowTs(r, 0).getTime / 3600000L, r.getLong(1)))
    val byHour = raw.groupBy(_._1)
    assert(rows.length == byHour.size)
    rows.foreach { r =>
      val hour = TestSpark.rowTs(r, 0).getTime / 3600000L
      val evs = byHour(hour)
      assert(r.getLong(1) == evs.map(_._2).distinct.length.toLong,
        s"hour $hour exact uniques")
      assert(r.getLong(2) == evs.length.toLong, s"hour $hour event count")
      assert(r.getBoolean(3), s"hour $hour: sketch must sit inside 5%")
      assert(r.getLong(1) <= r.getLong(2))
    }
  }

  test("e23 hour-of-day profile: matrix recomputed, shares and ranks consistent") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = graft.ops.EventOps.hourOfDayProfile(spark, TestSpark.sfDir)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    val raw = graft.Tables.events(spark, TestSpark.sfDir)
      .select($"event_type", $"ts".cast("timestamp")).collect()
      .map { r =>
        val cal = java.util.Calendar.getInstance(
          java.util.TimeZone.getTimeZone("UTC"))
        cal.setTime(TestSpark.rowTs(r, 1))
        (r.getString(0), cal.get(java.util.Calendar.HOUR_OF_DAY).toLong)
      }
    val expected = raw.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    assert(got.keySet == expected.keySet)
    val byType = raw.groupBy(_._1).map { case (t, xs) => t -> xs.length.toLong }
    got.foreach { case ((t, hod), (n, share, _)) =>
      assert(n == expected((t, hod)), s"($t,$hod)")
      assert(share == n.toDouble / byType(t).toDouble)
    }
    // ranks are a permutation of 1..cells per type, ordered by count desc
    got.keys.map(_._1).toSeq.distinct.foreach { t =>
      val cells = got.filter(_._1._1 == t).values.toSeq
      assert(cells.map(_._3).sorted == (1L to cells.length))
      val byRank = cells.sortBy(_._3).map(_._1)
      byRank.sliding(2).foreach {
        case Seq(a, b) => assert(a >= b, s"$t ranks not count-ordered")
        case _ =>
      }
      assert(math.abs(cells.map(_._2).sum - 1.0) < 1e-12)
    }
  }

  test("e22 concurrency: interval counts recomputed from e03's session definition") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = graft.ops.EventOps.hourlyConcurrency(spark, TestSpark.sfDir)
      .collect()
      .map(r => (TestSpark.rowTs(r, 0).getTime / 3600000L,
        r.getLong(1), r.getLong(2)))
    // driver-side sessionization with the same 10-minute gap, in exact
    // MICROseconds (getTime truncates to ms; a sub-ms boundary gap
    // would misfile — the engine splits at µs precision)
    def us(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    val raw = graft.Tables.events(spark, TestSpark.sfDir)
      .select($"ts".cast("timestamp"), $"user_id").collect()
      .map(r => (r.getLong(1), us(TestSpark.rowTs(r, 0))))
    val gapUs = 10L * 60000000L
    val sessions = raw.groupBy(_._1).toSeq.flatMap { case (uid, evs) =>
      val ts = evs.map(_._2).sorted
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      var start = ts.head; var last = ts.head
      ts.tail.foreach { t =>
        if (t - last > gapUs) { out += ((uid, start, last)); start = t }
        last = t
      }
      out += ((uid, start, last))
      out
    }
    val expected = sessions
      .flatMap { case (uid, s0, s1) =>
        (s0 / 3600000000L to s1 / 3600000000L).map(h => (h, uid))
      }
      .groupBy(_._1)
      .map { case (h, xs) => (h, xs.size.toLong, xs.map(_._2).distinct.size.toLong) }
      .toSeq.sortBy(_._1)
    assert(got.toSeq == expected)
    // a session can span hours: total session-hours must be >= session count
    assert(got.map(_._2).sum >= sessions.length.toLong)
    got.foreach { case (h, ns, nu) => assert(nu <= ns, s"hour $h") }
  }

  test("e24 inter-arrival bands: driver recompute of the BIGINT algebra") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = SparkEntry.queries("e24_interarrival")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val raw = spark.read.parquet(TestSpark.sfDir + "/events.parquet")
      .selectExpr("user_id", "unix_micros(cast(ts as timestamp)) AS us", "event_id")
      .as[(Long, Long, Long)].collect()
    val expected = raw.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      val us = evs.sortBy(e => (e._2, e._3)).map(_._2)
      val gaps = us.zip(us.tail).map { case (a, b) => (b - a) / 1000000L }
      if (gaps.isEmpty) None
      else {
        val n = gaps.length.toLong
        val sg = gaps.sum; val ss = gaps.map(g => g * g).sum
        val band =
          if (n < 16) "lt16" else if (n < 64) "16to63"
          else if (n < 256) "64to255" else "ge256"
        Some((band, n * ss >= 2 * sg * sg, n, sg, gaps.max))
      }
    }
    val byBand = expected.groupBy(_._1).map { case (b, xs) =>
      b -> (xs.size.toLong, xs.count(_._2).toLong,
        xs.map(_._3).sum, xs.map(_._4).sum, xs.map(_._5).max)
    }
    assert(got == byBand)
    // every event beyond a user's first contributes exactly one gap
    val nEvents = raw.length.toLong
    val nUsers = raw.map(_._1).distinct.length.toLong
    assert(got.values.map(_._3).sum == nEvents - nUsers)
  }

  test("e26 lateness audit: constructed out-of-order log hits every arm; corpus is in-order") {
    val spark = TestSpark.spark
    import spark.implicits._
    // arrival sequence with three disorder magnitudes: an event 2 min
    // late, one 15 min late, one 2 h late — each must land in exactly
    // the arms its lateness exceeds
    val M = 1000000L
    val log = Seq(
      (1L, 0L), (2L, 3600L * M), (3L, 3600L * M - 120L * M), // 2 min late
      (4L, 7200L * M), (5L, 7200L * M - 900L * M),           // 15 min late
      (6L, 20000L * M), (7L, 20000L * M - 7200L * M),        // 2 h late
      (8L, 20001L * M))
    val got = graft.ops.EventOps.latenessAuditFrame(log.toDF("event_id", "us"))
      .collect().head
    assert(got.getLong(0) == 8L)
    assert(got.getLong(1) == 3L, "late_1m counts all three stragglers")
    assert(got.getLong(2) == 2L, "late_10m counts the 15min and 2h ones")
    assert(got.getLong(3) == 1L, "late_1h counts only the 2h one")
    assert(got.getLong(4) == 7200L)
    // the driver corpus arrives in event-id order: the audit must
    // report ZERO lateness (that all-zero row is the watermark
    // licence, not a vacuous fixture — this constructed case carries
    // the late arms)
    val corpus = SparkEntry.queries("e26_watermark_audit")(spark, TestSpark.sfDir)
      .collect().head
    assert(corpus.getLong(1) == 0L && corpus.getLong(4) == 0L)
    assert(corpus.getLong(0) == spark.read
      .parquet(TestSpark.sfDir + "/events.parquet").count())
  }

  test("e25 session lift: pair counts bounded by marginals, sessions match e03") {
    val spark = TestSpark.spark
    val rows = SparkEntry.queries("e25_session_lift")(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    // ONE session universe: every pair row carries the same n_sessions,
    // and it equals e03's session count (same islands boundary).
    val nSessions = rows.map(_.getLong(5)).distinct
    assert(nSessions.length == 1)
    val e03 = SparkEntry.queries("e03_sessions")(spark, TestSpark.sfDir).count()
    assert(nSessions.head == e03)
    rows.foreach { r =>
      val (both, na, nb, ns) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(r.getString(0) < r.getString(1))
      assert(both <= math.min(na, nb) && math.max(na, nb) <= ns)
      assert(r.getBoolean(6) == (both * ns > na * nb))
    }
  }

  test("e28 transition entropy: driver recompute, bounds, population ties to event counts") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = SparkEntry.queries("e28_transition_entropy")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val raw = spark.read.parquet(TestSpark.sfDir + "/events.parquet")
      .selectExpr("user_id", "unix_micros(cast(ts as timestamp)) AS us",
        "event_id", "event_type")
      .as[(Long, Long, Long, String)].collect()
    val expected = raw.groupBy(_._1).map { case (u, evs) =>
      val types = evs.sortBy(e => (e._2, e._3)).map(_._4)
      val keys = types.zip(types.tail).map { case (a, b) => s"$a>$b" }
      val cs = keys.groupBy(identity).map(_._2.length.toLong).toSeq
      val n = cs.sum
      val h = math.log(n.toDouble) -
        cs.sorted.map(c => c * math.log(c.toDouble)).sum / n.toDouble
      u -> (cs.size.toLong, n, h)
    }
    assert(got.keySet == expected.keySet)
    expected.foreach { case (u, (nd, nt, h)) =>
      val (gNd, gNt, gH, gNorm) = got(u)
      assert(gNd == nd && gNt == nt, s"user $u counts")
      // driver fold order differs from the segmented fold — ulp slack
      assert(math.abs(gH - h) < 1e-12, s"user $u entropy")
      assert(gH >= -1e-12 && gH <= math.log(nd.toDouble) + 1e-12, s"user $u bounds")
      if (nd > 1) assert(gNorm >= 0.0 && gNorm <= 1.0 + 1e-12) else assert(gNorm == 0.0)
      // every event beyond the user's first contributes one transition
      assert(nt == raw.count(_._1 == u).toLong - 1L, s"user $u population")
    }
  }

  test("e28 drops transitions touching a NULL event_type (oracle's term IS NOT NULL)") {
    // concat is null-propagating, so the oracle's `WHERE term IS NOT
    // NULL` removes any transition with a NULL endpoint; the Spark
    // side must filter BOTH endpoints, not just next_type — this pins
    // the parity for a future corpus with a nullable event_type (the
    // generator's column is never null, so the sf oracles can't).
    val spark = TestSpark.spark
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-e28-null").toString
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L, Option("view"), 0.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 7L, Option.empty[String], 0.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 7L, Option("click"), 0.0, "{}"),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 00:03:00"), 7L, Option("view"), 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")
    val rows = EventOps.userTransitionEntropy(spark, tmp).collect()
    // of the three adjacent pairs only click>view survives: view>NULL
    // and NULL>click both carry a NULL endpoint
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 7L && r.getLong(1) == 1L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
  }

  test("e30 periodicity: lag products recomputed driver-side, Cauchy-Schwarz bound holds") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = SparkEntry.queries("e30_periodicity")(spark, TestSpark.sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getDouble(8), r.getBoolean(9)))
      .toMap
    val raw = spark.read.parquet(TestSpark.sfDir + "/events.parquet")
      .selectExpr("event_type", "unix_micros(cast(ts as timestamp)) div 3600000000 as h")
      .as[(String, Long)].collect()
    val byType = raw.groupBy(_._1)
    assert(got.keySet == byType.keySet)
    byType.foreach { case (t, es) =>
      val c = es.groupBy(_._2).map { case (h, g) => h -> g.size.toLong }
      def r(lag: Long) = c.map { case (h, v) =>
        v * c.getOrElse(h + lag, 0L)
      }.sum
      val (nh, ne, r0, r1, r23, r24, r25, score, peak) = got(t)
      assert(nh == c.size.toLong && ne == es.length.toLong, s"$t counts")
      assert(r0 == r(0) && r1 == r(1) && r23 == r(23) && r24 == r(24) && r25 == r(25),
        s"$t lag products")
      // Cauchy-Schwarz: no shifted product exceeds the energy
      Seq(r1, r23, r24, r25).foreach(x => assert(x <= r0, s"$t CS bound"))
      assert(score == r24.toDouble / r0.toDouble)
      assert(peak == (r24 > r23 && r24 > r25))
    }
  }

  test("e31 changepoints: the all-integer CUSUM recomputed driver-side") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = SparkEntry.queries("e31_changepoints")(spark, TestSpark.sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
      .toMap
    val raw = spark.read.parquet(TestSpark.sfDir + "/events.parquet")
      .selectExpr("event_type", "unix_micros(cast(ts as timestamp)) div 86400000000 as d")
      .as[(String, Long)].collect()
    val byType = raw.groupBy(_._1)
    assert(got.keySet == byType.keySet)
    byType.foreach { case (t, es) =>
      val daily = es.groupBy(_._2).map { case (d, g) => d -> g.size.toLong }
        .toSeq.sortBy(_._1)
      val n = daily.size.toLong
      val total = daily.map(_._2).sum
      val curve = daily.zipWithIndex.map { case ((d, _), i) =>
        val pref = daily.take(i + 1).map(_._2).sum
        (d, i + 1L, n * pref - (i + 1L) * total)
      }
      val peak = curve.minBy { case (d, _, s) => (-math.abs(s), d) }
      val (nd, ne, pd, pt, ps, pa, sh) = got(t)
      assert(nd == n && ne == total, s"$t totals")
      assert(pd == peak._1 && pt == peak._2 && ps == peak._3, s"$t peak")
      assert(pa == math.abs(peak._3))
      assert(sh == (20L * math.abs(peak._3) > n * total), s"$t shift flag")
      // the last prefix is exactly the total, so S'_n == 0 always —
      // a peak at t_idx == n would mean a flat curve
      assert(curve.last._3 == 0L)
    }
  }

  test("e32 retention decay: pooled rates and the OLS closed form recomputed driver-side") {
    val spark = TestSpark.spark
    import spark.implicits._
    val r = SparkEntry.queries("e32_retention_decay")(spark, TestSpark.sfDir).head()
    val raw = spark.read.parquet(TestSpark.sfDir + "/events.parquet")
      .selectExpr("user_id", "cast(cast(ts as timestamp) as date) as day")
      .distinct().as[(Long, java.sql.Date)].collect()
      .map { case (u, d) => (u, d.toLocalDate.toEpochDay) }
    val first = raw.groupBy(_._1).map { case (u, g) => u -> g.map(_._2).min }
    val ages = raw.map { case (u, d) => (first(u), d - first(u)) }
    val fullCohorts = ages.groupBy(_._1)
      .collect { case (c, g) if g.map(_._2).max >= 3 => c }.toSet
    def num(a: Long) = ages.count(x => fullCohorts.contains(x._1) && x._2 == a).toLong
    val (den, n1, n2, n3) = (num(0), num(1), num(2), num(3))
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((den, n1, n2, n3)), "pooled counts")
    val y = Seq(n1, n2, n3).map(n => math.log(n.toDouble) - math.log(den.toDouble))
    val slope = (3.0 * (y(0) + 2.0 * y(1) + 3.0 * y(2)) - 6.0 * y.sum) / 6.0
    val intercept = (y.sum - slope * 6.0) / 3.0
    assert(math.abs(r.getDouble(7) - slope) < 1e-12 &&
      math.abs(r.getDouble(8) - intercept) < 1e-12, "fit")
    if (slope < 0.0)
      assert(math.abs(r.getDouble(9) - (-math.log(2.0) / slope)) < 1e-9, "half-life")
    else assert(r.isNullAt(9), "no half-life on a non-decaying fit")
    // retention is a probability: every pooled rate is <= 1 so y <= 0
    assert(y.forall(_ <= 1e-12))
  }

  test("e33 activity gini: driver recompute, bit-exact, invariant to the range count") {
    val spark = TestSpark.spark
    import spark.implicits._
    def run() = SparkEntry.queries("e33_activity_gini")(spark, TestSpark.sfDir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val got = run()
    assert(got.length == 1)
    val (nUsers, nEvents, num, gini) = got.head
    // driver recompute: global rank by (count, user_id) ascending
    val counts = spark.read.parquet(TestSpark.sfDir + "/events.parquet")
      .groupBy($"user_id").count().as[(Long, Long)].collect()
      .sortBy(t => (t._2, t._1))
    val u = counts.length.toLong
    val tot = counts.map(_._2).sum
    val expNum = counts.zipWithIndex.map { case ((_, c), i) =>
      (2L * (i + 1) - (u + 1)) * c
    }.sum
    assert(nUsers == u && nEvents == tot && num == expNum)
    assert(java.lang.Double.doubleToLongBits(gini) ==
      java.lang.Double.doubleToLongBits(expNum.toDouble / (u * tot).toDouble))
    assert(gini >= 0.0 && gini < 1.0)
    // the two-pass rank must not depend on how many ranges the layout
    // uses: force a different range count and demand the same row
    val key = "spark.graft.pareto.ranges"
    spark.conf.set(key, "3")
    try assert(run() == got, "result changed with the range count")
    finally spark.conf.unset(key)
  }

  test("e39 weekday ANOVA: SS identities recomputed driver-side; eta2 in [0, 1]") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = SparkEntry.queries("e39_dow_seasonality")(spark, TestSpark.sfDir)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    val daily = spark.read.parquet(TestSpark.sfDir + "/events.parquet")
      .selectExpr("CAST(ts AS DATE) AS day").as[java.sql.Date].collect()
      .map(_.toLocalDate).groupBy(identity)
      .map { case (d, g) => d -> g.size.toLong }
    val n = daily.size.toLong
    val s = daily.values.sum
    val q = daily.values.map(c => c * c).sum
    // DuckDB/op weekday numbering: Sunday = 0
    val byDow = daily.toSeq.groupBy(_._1.getDayOfWeek.getValue % 7)
      .map { case (dw, g) => dw -> (g.map(_._2).sum, g.size.toLong) }
    val betweenRaw = byDow.toSeq.sortBy(_._1).foldLeft(0.0) {
      case (acc, (_, (sg, ng))) => acc + (sg * sg).toDouble / ng.toDouble
    }
    val meanTerm = (s * s).toDouble / n.toDouble
    assert(r.getLong(0) == n && r.getLong(1) == s && r.getLong(2) == byDow.size.toLong)
    assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ==
      java.lang.Double.doubleToLongBits(betweenRaw - meanTerm))
    assert(java.lang.Double.doubleToLongBits(r.getDouble(4)) ==
      java.lang.Double.doubleToLongBits(q.toDouble - meanTerm))
    assert(java.lang.Double.doubleToLongBits(r.getDouble(5)) ==
      java.lang.Double.doubleToLongBits((betweenRaw - meanTerm) / (q.toDouble - meanTerm)))
    assert(r.getDouble(5) >= -1e-12 && r.getDouble(5) <= 1.0 + 1e-12)
  }

  test("e38 bounce rate: sessions, openers, and rates recomputed driver-side; totals conserve") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = SparkEntry.queries("e38_bounce_rate")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val ev = spark.read.parquet(TestSpark.sfDir + "/events.parquet")
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .as[(Long, java.sql.Timestamp, Long, String)].collect()
    // driver gaps-and-islands: 10-minute gap in exact MICROseconds
    // (getTime alone truncates to ms — boundary gaps would misfile)
    def us(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    val sessions = ev.groupBy(_._1).values.toSeq.flatMap { g =>
      val sorted = g.sortBy(t => (us(t._2), t._3))
      val out = scala.collection.mutable.ArrayBuffer.empty[List[(Long, java.sql.Timestamp, Long, String)]]
      var cur = List.empty[(Long, java.sql.Timestamp, Long, String)]
      var prev: Option[Long] = None
      sorted.foreach { e =>
        if (prev.exists(p => us(e._2) - p <= 600000000L)) cur :+= e
        else { if (cur.nonEmpty) out += cur; cur = List(e) }
        prev = Some(us(e._2))
      }
      if (cur.nonEmpty) out += cur
      out.toSeq
    }
    val expected = sessions.groupBy(_.head._4).map { case (ft, ss) =>
      val n = ss.length.toLong
      val b = ss.count(_.length == 1).toLong
      ft -> (n, b, b.toDouble / n.toDouble)
    }
    assert(got == expected)
    // conservation: session counts over entry types sum to all sessions
    assert(got.values.map(_._1).sum == sessions.length.toLong)
    got.values.foreach { case (n, b, r) => assert(b <= n && r >= 0.0 && r <= 1.0) }
  }

  test("e37 bot signals: recomputed driver-side; each disjunct fires on a planted bot") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = SparkEntry.queries("e37_bot_signals")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
      .toMap
    // corpus recompute
    val ev = spark.read.parquet(TestSpark.sfDir + "/events.parquet")
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .as[(Long, java.sql.Timestamp, Long, String)].collect()
    val byUser = ev.groupBy(_._1)
    assert(got.keySet == byUser.keySet)
    byUser.foreach { case (u, g) =>
      val nEvents = g.length.toLong
      val burst = g.groupBy(t => t._2.getTime / 60000L).values.map(_.size).max.toLong
      val nTypes = g.map(_._4).distinct.length.toLong
      val seq0 = g.sortBy(t => (t._2.getTime, t._3)).map(_._4)
      val pairs = seq0.dropRight(1).zip(seq0.drop(1))
      val nTr = pairs.length.toLong
      val loops = pairs.count(p => p._1 == p._2).toLong
      val flag = burst >= 5 || (nTypes <= 2 && nEvents >= 20) || loops * 3 > nTr * 2
      assert(got(u) == ((nEvents, burst, nTypes, nTr, loops, flag)), s"user $u")
    }
    // planted fixtures: one bot per disjunct plus a clean human — the
    // rules must separate them
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val fixture = Seq.newBuilder[(Long, java.sql.Timestamp, Long, String)]
    for (i <- 0 until 10) fixture += ((1L, ts(i), i.toLong, s"t${i % 5}"))          // burst bot
    for (i <- 0 until 25) fixture += ((2L, ts(i * 120L), 100L + i, s"t${i % 2}"))   // narrow bot
    for (i <- 0 until 10) fixture += ((3L, ts(i * 120L), 200L + i, "click"))        // self-loop bot
    for (i <- 0 until 10) fixture += ((4L, ts(i * 120L), 300L + i, s"t${i % 5}"))   // human
    val out = graft.ops.EventOps.botSignalsOver(
        fixture.result().toDF("user_id", "ts", "event_id", "event_type"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(out == Map(1L -> true, 2L -> true, 3L -> true, 4L -> false), s"$out")
  }

  test("e33 empty input emits ONE null-sum row (the oracle's shape), not an empty frame") {
    val spark = TestSpark.spark
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("user_id", "c")
    val rows = graft.ops.EventOps.giniOver(empty).collect()
    assert(rows.length == 1, "one audit row per tick even when nothing arrived")
    val r = rows.head
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("e36 markov accuracy: prediction is the per-type argmax; score recomputed") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = SparkEntry.queries("e36_markov_accuracy")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toMap
    // driver recompute of the transition matrix
    val ev = spark.read.parquet(TestSpark.sfDir + "/events.parquet")
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .as[(Long, java.sql.Timestamp, Long, String)].collect()
    val trans = ev.groupBy(_._1).values.toSeq.flatMap { g =>
      val s = g.sortBy(t => (t._2.getTime, t._3)).map(_._4)
      s.dropRight(1).zip(s.drop(1))
    }
    val m = trans.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val froms = m.keySet.map(_._1)
    assert(got.keySet == froms)
    froms.foreach { f =>
      val row = m.collect { case ((`f`, t), n) => (t, n) }.toSeq
      val pred = row.sortWith((a, b) => a._2 > b._2 ||
        (a._2 == b._2 && a._1 < b._1)).head._1
      val total = row.map(_._2).sum
      val correct = row.collect { case (`pred`, n) => n }.sum
      val (gp, gt, gc, ga) = got(f)
      assert(gp == pred && gt == total && gc == correct, s"from $f")
      assert(java.lang.Double.doubleToLongBits(ga) ==
        java.lang.Double.doubleToLongBits(correct.toDouble / total.toDouble))
      // the argmax prediction beats (or ties) every other single guess
      assert(row.forall { case (_, n) => n <= correct }, s"from $f argmax")
    }
  }

  test("e35 spike attribution: peak day, excesses, and lift recomputed driver-side") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = SparkEntry.queries("e35_spike_attribution")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))
    val ev = spark.read.parquet(TestSpark.sfDir + "/events.parquet")
      .selectExpr("user_id", "CAST(ts AS DATE) AS day")
      .as[(Long, java.sql.Date)].collect()
      .map(t => (t._1, t._2.toLocalDate))
    val n = ev.length.toLong
    val daily = ev.groupBy(_._2).map { case (d, g) => d -> g.length.toLong }
    val (peakDay, tDay) = daily.toSeq
      .sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1.isBefore(b._1))).head
    val uTot = ev.groupBy(_._1).map { case (u, g) => u -> g.length.toLong }
    val dayCounts = ev.filter(_._2 == peakDay).groupBy(_._1)
      .map { case (u, g) => u -> g.length.toLong }
    val expected = dayCounts.toSeq.map { case (u, c) =>
      (peakDay, u, c, uTot(u), tDay, n, c * n - uTot(u) * tDay,
        (c * n).toDouble / (uTot(u) * tDay).toDouble)
    }.sortWith((a, b) => a._7 > b._7 || (a._7 == b._7 && a._2 < b._2)).take(10)
    assert(got.toSeq == expected)
    // excesses must sum to zero over ALL the day's users (shares are
    // relative) — so the reported head is genuinely above-share
    val allExcess = dayCounts.map { case (u, c) => c * n - uTot(u) * tDay }.sum
    assert(allExcess == 0L, s"excess decomposition must conserve, got $allExcess")
    assert(got.head._7 > 0L)
  }

  test("e34 heavy hitters: CMS recomputed driver-side; estimate never under-counts ANY user") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = SparkEntry.queries("e34_heavy_hitters")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val counts = spark.read.parquet(TestSpark.sfDir + "/events.parquet")
      .groupBy($"user_id").count().as[(Long, Long)].collect().toMap
    def bucket(i: Int, u: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$u".getBytes("UTF-8"))
      (java.lang.Long.parseLong(
        md.take(4).map(x => f"${x & 0xff}%02x").mkString, 16) % 64).toInt
    }
    val cms = Array.ofDim[Long](4, 64)
    counts.foreach { case (u, c) =>
      for (i <- 0 until 4) cms(i)(bucket(i, u)) += c
    }
    def est(u: Long): Long = (0 until 4).map(i => cms(i)(bucket(i, u))).min
    val top = counts.toSeq.sortWith((a, b) => a._2 > b._2 ||
      (a._2 == b._2 && a._1 < b._1)).take(10)
    assert(got.keySet == top.map(_._1).toSet, "top-10 selection")
    top.foreach { case (u, c) =>
      val (exact, e, over) = got(u)
      assert(exact == c && e == est(u) && over == e - c, s"user $u")
    }
    // the one-sided CMS guarantee, checked over EVERY user, not just
    // the reported ten
    counts.foreach { case (u, c) =>
      assert(est(u) >= c, s"CMS under-counted user $u")
    }
  }

  test("e27 stickiness: driver recompute of the trailing-7-day distinct; DAU ≤ WAU") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = SparkEntry.queries("e27_stickiness")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getDate(0).toLocalDate.toEpochDay ->
        (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val dayUser = spark.read.parquet(TestSpark.sfDir + "/events.parquet")
      .selectExpr("unix_date(to_date(ts)) AS d", "user_id")
      .as[(Int, Long)].collect().map(t => (t._1.toLong, t._2)).distinct
    val activeDays = dayUser.map(_._1).distinct.sorted
    val expected = activeDays.map { d =>
      val dau = dayUser.count(_._1 == d).toLong
      val wau = dayUser.filter(x => x._1 >= d - 6 && x._1 <= d)
        .map(_._2).distinct.length.toLong
      d -> (dau, wau, dau.toDouble / wau.toDouble)
    }.toMap
    assert(got == expected)
    // invariants: every active day reported; DAU ≤ WAU (day d's actives
    // are inside [d−6, d]); stickiness in (0, 1]
    assert(got.keySet == activeDays.toSet)
    got.values.foreach { case (dau, wau, st) =>
      assert(dau >= 1L && dau <= wau)
      assert(st > 0.0 && st <= 1.0)
    }
  }

  test("e43 dynamic gap: long-gap purchase bridges short-gap events; the exact end merges (inclusive)") {
    // The two semantics this pins, on crafted rows:
    // (1) INTERVAL MERGE, not lag-reach — e3 at 00:20 is past e2's own
    //     end (00:05 view + 10 min = 00:15) but inside e1's purchase
    //     window (00:00 + 30 min = 00:30); a lag-based rewrite splits
    //     here, the running-max merge (and Spark) does not.
    // (2) BOUNDARY-INCLUSIVE merge — e4 lands at exactly the session's
    //     running-max end (00:30) and Spark EXTENDS the session (probed
    //     empirically; MergingSessionsIterator admits start <= end). An
    //     event strictly past the end (user 9's pair, 00:00 → 00:10.000001
    //     with a 10-min gap) starts a new session. The oracles' islands
    //     rewrite must therefore split on `>`, not `>=`.
    val spark = TestSpark.spark
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-e43").toString
    def t(hms: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hms")
    Seq(
      (1L, t("00:00:00"), 7L, "purchase", 0.0, "{}"),
      (2L, t("00:05:00"), 7L, "view", 0.0, "{}"),
      (3L, t("00:20:00"), 7L, "view", 0.0, "{}"),
      (4L, t("00:30:00"), 7L, "view", 0.0, "{}"),
      (5L, t("00:45:00"), 7L, "view", 0.0, "{}"),
      (6L, t("00:00:00"), 9L, "view", 0.0, "{}"),
      (7L, t("00:10:00.000001"), 9L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")
    val got = EventOps.dynamicSessions(spark, tmp).collect()
      .map(r => (r.getLong(0), TestSpark.rowTs(r, 1).toString,
        r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      // e4 AT the 00:30 end merges and extends the reach to 00:40;
      // e5 at 00:45 is strictly past it -> new session
      (7L, "2024-01-01 00:00:00.0", 4L, 1L),
      (7L, "2024-01-01 00:45:00.0", 1L, 0L),
      (9L, "2024-01-01 00:00:00.0", 1L, 0L),
      (9L, "2024-01-01 00:10:00.000001", 1L, 0L)))
  }

  test("e03 static gap: the exact 10-minute boundary also merges (inclusive)") {
    // The static form shares the merge rule: an event at exactly
    // prev_ts + gap EXTENDS the session. The generator's microsecond
    // timestamps never land on an exact boundary, so the sf oracles
    // cannot distinguish `>` from `>=` — this crafted pin is what holds
    // the oracle family to the `>` (strictly-past-the-end) split.
    val spark = TestSpark.spark
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-e03b").toString
    def t(hms: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hms")
    Seq(
      (1L, t("00:00:00"), 7L, "view", 0.0, "{}"),
      (2L, t("00:10:00"), 7L, "view", 0.0, "{}"),
      (3L, t("00:20:00.000001"), 7L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")
    val got = EventOps.sessions(spark, tmp).collect()
      .map(r => (r.getLong(0), TestSpark.rowTs(r, 1).toString, r.getLong(2)))
    assert(got.toSeq == Seq(
      (7L, "2024-01-01 00:00:00.0", 2L),
      (7L, "2024-01-01 00:20:00.000001", 1L)))
  }

  test("e43 on sf data: running-max interval merge recomputed driver-side") {
    val spark = TestSpark.spark
    import spark.implicits._
    // exact MICROsecond model (getTime truncates to ms; the engine
    // merges at µs precision — a sub-ms boundary gap would misfile)
    def us(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    val got = SparkEntry.queries("e43_dynamic_sessions")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), us(TestSpark.rowTs(r, 1)),
        r.getLong(2), r.getLong(3)))
    val raw = graft.Tables.events(spark, TestSpark.sfDir)
      .select($"ts".cast("timestamp"), $"user_id", $"event_type").collect()
      .map(r => (r.getLong(1), us(TestSpark.rowTs(r, 0)), r.getString(2)))
    def gapUs(tp: String) =
      if (tp == "purchase") 30L * 60000000L else 10L * 60000000L
    val expected = raw.groupBy(_._1).toSeq.flatMap { case (uid, evs) =>
      val sorted = evs.map(e => (e._2, e._3)).sortBy(_._1)
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
      var start = sorted.head._1
      var end = sorted.head._1 + gapUs(sorted.head._2)
      var n = 1L
      var np = if (sorted.head._2 == "purchase") 1L else 0L
      sorted.tail.foreach { case (ts, tp) =>
        if (ts > end) { // only STRICTLY past the end splits (inclusive merge)
          out += ((uid, start, n, np)); start = ts; n = 0L; np = 0L; end = ts
        }
        end = math.max(end, ts + gapUs(tp)) // running max, not last reach
        n += 1L
        if (tp == "purchase") np += 1L
      }
      out += ((uid, start, n, np))
      out
    }.sortBy(x => (x._1, x._2))
    assert(got.toSeq == expected)
    // the corpus must actually exercise the dynamic arm: at least one
    // session where a purchase's 30-min reach admitted an event that
    // the uniform 10-min gap would have split off
    val static = SparkEntry.queries("e03_sessions")(spark, TestSpark.sfDir).count()
    assert(got.length < static,
      "dynamic 30-min purchase gap merged no sessions — fixture too sparse to pin the dynamic arm")
  }
}
