package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ner.RuleNer
import graft.pipeline.EntityPipeline

/** Property-style invariants (seeded random inputs, SURVEY.md §5.4):
  * count conservation through explode/groupBy, dedup idempotence,
  * null-safety of the NER contract.
  */
class InvariantSpec extends AnyFunSuite {

  private val rnd = new Random(42)
  private val vocab = Vector("spark", "table", "the", "word", "Alice", "bob", "Window", "x1")

  /** The t22/t24 term segment: first md5 byte (= first two hex chars),
    * 0..255 — must match `conv(substring(md5(term), 1, 2), 16, 10)`.
    */
  private def md5Seg(t: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8"))
    (d(0).toInt & 0xff).toLong
  }

  private def randomText(): String =
    Seq.fill(rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  test("sum of grouped counts equals total entities emitted") {
    val spark = TestSpark.spark
    import spark.implicits._
    val texts = Seq.fill(60)(randomText())
    val df = texts.toDF("text")
    val counted = EntityPipeline.countEntities(df)
      .agg(sum($"count")).head().getLong(0)
    val direct = texts.map(t => RuleNer.extractEntities(t).length.toLong).sum
    assert(counted == direct)
  }

  test("explode row count equals sum of array sizes") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq.fill(40)(randomText()).toDF("text")
      .select(RuleNer.entitiesCol($"text").as("es"))
    val exploded = df.select(explode($"es")).count()
    val sizes = df.select(sum(size($"es"))).head().getLong(0)
    assert(exploded == sizes)
  }

  test("dedup is idempotent") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq.fill(50)(vocab(rnd.nextInt(3))).toDF("url")
    val once = df.dropDuplicates("url")
    val twice = once.dropDuplicates("url")
    assert(once.count() == twice.count())
    assert(once.count() == df.select($"url").distinct().count())
  }

  test("NER never throws and never returns null on arbitrary strings") {
    val weird = Seq(null, "", " ", "\t\n", "ünïcödé Wörds", "123 456", "UPPER lower",
      "a" * 1000, (0 until 50).map(_ => "\"'\\").mkString(" "))
    weird.foreach { s =>
      val out = RuleNer.extractEntities(s)
      assert(out != null)
    }
  }

  test("dup clusters: labels are component minima and respect the pair graph") {
    val spark = TestSpark.spark
    import spark.implicits._
    val clusters = graft.ops.Dedup.dupClusters(spark, TestSpark.sfDir)
    val pairs = graft.ops.Dedup.minhashLshPairsCapped(spark, TestSpark.sfDir)
    // every clustered doc appears in some pair, label <= doc_id, and the
    // label is itself a member of the same cluster (a canonical rep)
    assert(clusters.filter($"cluster_id" > $"doc_id").count() == 0)
    val reps = clusters.select($"cluster_id".as("cid")).distinct()
      .join(clusters, $"cid" === $"doc_id", "left_anti")
    assert(reps.count() == 0)
    // both endpoints of every pair landed in the same cluster
    val lbl = clusters.toDF("d", "c")
    val crossCluster = pairs
      .join(lbl.toDF("d", "c_a"), $"doc_a" === $"d").drop("d")
      .join(lbl.toDF("d", "c_b"), $"doc_b" === $"d").drop("d")
      .filter($"c_a" =!= $"c_b")
    assert(crossCluster.count() == 0)
  }

  test("hash split: deterministic, total, and stable under corpus growth") {
    val spark = TestSpark.spark
    import spark.implicits._
    val full = graft.ops.TextOps.hashSplit(spark, TestSpark.sfDir)
    assert(full.select($"split").distinct().count() == 3)
    // re-evaluation is identical (no RNG state anywhere)
    assert(full.except(graft.ops.TextOps.hashSplit(spark, TestSpark.sfDir)).count() == 0)
    // a document's assignment depends only on its id: any subset of the
    // corpus assigns identically
    val subset = graft.ops.TextOps.hashSplit(spark, TestSpark.sfDir)
      .filter($"doc_id" % 2 === 0)
    assert(subset.except(full.filter($"doc_id" % 2 === 0)).count() == 0)
  }

  test("t19 novelty: bounded, consistent with the df table, zero for exact dups") {
    val spark = TestSpark.spark
    import spark.implicits._
    val nov = graft.ops.TextOps.noveltyScore(spark, TestSpark.sfDir)
    val rows = nov.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, novel, frac) =>
      assert(novel >= 0 && novel <= n)
      assert(frac == novel.toDouble / n)
    }
    // independent recount: total novel shingles must equal the number
    // of (doc, shingle) rows whose shingle has corpus frequency 1
    import graft.functions.TextHashes.shingle_hashes
    val sh = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select($"doc_id", explode(shingle_hashes($"text")).as("shash"))
    val singletons = sh.groupBy($"shash").agg(count(lit(1)).as("df"))
      .filter($"df" === 1).count()
    assert(rows.map(_._3).sum == singletons)
    // every member of an exact-duplicate group shares ALL its shingles
    // with its twin → novelty exactly zero (vacuous when the tiny sf
    // has no exact dups; sf0.01 has them and d01 covers that scale)
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select($"doc_id", md5($"text").as("h"))
    val dupDocs = docs.withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"h")))
      .filter($"n" >= 2).select($"doc_id").collect().map(_.getLong(0)).toSet
    val novMap = rows.map(r => r._1 -> r._4).toMap
    dupDocs.foreach { id =>
      novMap.get(id).foreach(f => assert(f == 0.0, s"dup doc $id has novelty $f"))
    }
  }

  test("e11 funnel equals a driver-side recomputation and is monotone") {
    val spark = TestSpark.spark
    val ev = graft.Tables.events(spark, TestSpark.sfDir)
      .selectExpr("user_id", "event_type",
        "unix_micros(cast(ts as timestamp)) as us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def firstAfter(tpe: String, bound: Map[Long, Long]): Map[Long, Long] =
      ev.filter(e => e._2 == tpe && bound.get(e._1).exists(e._3 > _))
        .groupBy(_._1).map { case (u, es) => u -> es.map(_._3).min }
    val t1 = ev.filter(_._2 == "view").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._3).min }
    val t2 = firstAfter("click", t1)
    val t3 = firstAfter("purchase", t2)
    val row = graft.ops.EventOps.funnel(spark, TestSpark.sfDir).collect().head
    assert(row.getLong(0) == t1.size && row.getLong(1) == t2.size && row.getLong(2) == t3.size)
    assert(row.getLong(0) >= row.getLong(1) && row.getLong(1) >= row.getLong(2))
    assert(row.getLong(3) == t2.map { case (u, t) => t - t1(u) }.sum)
    assert(row.getLong(4) == t3.map { case (u, t) => t - t2(u) }.sum)
  }

  test("e12 retention: age-0 cell equals cohort size, matrix covers every active user-week") {
    val spark = TestSpark.spark
    import spark.implicits._
    val m = graft.ops.EventOps.retentionCohorts(spark, TestSpark.sfDir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(m.nonEmpty)
    m.foreach { case (_, age, n) => assert(age >= 0 && n > 0) }
    // every user is active in their own first week, so the age-0 cell
    // must count the entire cohort — and be the max of its row
    val byCohort = m.groupBy(_._1)
    byCohort.foreach { case (c, cells) =>
      val age0 = cells.find(_._2 == 0L)
      assert(age0.isDefined, s"cohort $c missing age 0")
      assert(cells.forall(_._3 <= age0.get._3), s"cohort $c: age-0 not max")
    }
    // total cells = distinct (user, week) pairs grouped — cross-check
    // the matrix total against a direct distinct count
    val direct = graft.Tables.events(spark, TestSpark.sfDir)
      .select($"user_id", date_trunc("week", $"ts").as("w")).distinct().count()
    assert(m.map(_._3).sum == direct)
  }

  test("d19 dedup report is consistent with the d11 cluster labeling") {
    val spark = TestSpark.spark
    import spark.implicits._
    val clusters = graft.ops.Dedup.dupClusters(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val report = graft.ops.Dedup.dedupMaterialize(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(report.nonEmpty)
    val sizes = clusters.groupBy(_._2).map { case (c, m) => c -> m.length }
    assert(report.map(r => r._1 -> r._2.toInt).toMap == sizes)
    report.foreach { case (_, members, dropped, chars) =>
      assert(dropped == members - 1)
      assert(chars > 0) // every cluster drops at least one real doc
    }
  }

  test("e13 anomaly flags equal the integer 2-sigma rule recomputed driver-side") {
    val spark = TestSpark.spark
    import spark.implicits._
    val hourly = graft.Tables.events(spark, TestSpark.sfDir)
      .groupBy($"event_type", date_trunc("hour", $"ts").as("h"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), TestSpark.rowTs(r, 1), r.getLong(2)))
    val byType = hourly.groupBy(_._1)
    val expected = hourly.map { case (t, h, c) =>
      val cs = byType(t).map(_._3)
      val n = cs.length.toLong; val sSum = cs.sum; val q = cs.map(x => x * x).sum
      val dev = c * n - sSum
      ((t, h), dev * dev > 4L * (n * q - sSum * sSum))
    }.toMap
    val got = graft.ops.EventOps.hourlyAnomalies(spark, TestSpark.sfDir).collect()
      .map(r => ((r.getString(0), TestSpark.rowTs(r, 1)), r.getBoolean(3))).toMap
    assert(got.size == expected.size && got == expected)
  }

  test("t20 unigram NLL equals a term-ordered driver-side fold") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").toSeq))
    val allToks = docs.flatMap(_._2)
    val tf = allToks.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val total = allToks.length.toLong
    val expected = docs.filter(_._2.nonEmpty).map { case (id, toks) =>
      val dt = toks.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
      // same order as sort_array(struct(term, _)): unsigned-byte UTF-8
      val nll = dt.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (t, n)) =>
        acc + (-n.toDouble * math.log(tf(t).toDouble / total))
      }
      id -> ((toks.length.toLong, nll, nll / toks.length))
    }.toMap
    val got = graft.ops.TextOps.unigramLogProb(spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.nonEmpty)
    assert(got == expected)
  }

  test("d20 chunk dedup equals a driver-side window recount") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").toSeq))
    // recompute: non-overlapping 10-word windows, drop trailing partials
    val occ = docs.flatMap { case (id, ws) =>
      ws.grouped(10).filter(_.length == 10).map(c => (c.mkString(" "), id))
    }
    val expected = occ.groupBy(_._1).collect {
      case (chunk, xs) if xs.map(_._2).distinct.length >= 2 =>
        chunk -> ((xs.map(_._2).distinct.length.toLong, xs.length.toLong, xs.map(_._2).min))
    }
    val got = graft.ops.Dedup.chunkDedup(spark, TestSpark.sfDir).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected.toMap)
    // every reported span really recurs across documents
    got.values.foreach { case (nDocs, nOcc, _) => assert(nDocs >= 2 && nOcc >= nDocs) }
  }

  test("d21 semantic clusters: labels are component minima over the d10 pair graph") {
    val spark = TestSpark.spark
    import spark.implicits._
    val clusters = graft.ops.Dedup.semanticClusters(spark, TestSpark.sfDir)
    val pairs = graft.ops.Dedup.embeddingDupPairsBucketed(spark, TestSpark.sfDir)
      .select($"id_a", $"id_b")
    assert(clusters.filter($"cluster_id" > $"vec_id").count() == 0)
    // every representative is a member of its own cluster
    val reps = clusters.select($"cluster_id".as("cid")).distinct()
      .join(clusters, $"cid" === $"vec_id", "left_anti")
    assert(reps.count() == 0)
    // both endpoints of every near-dup pair share a cluster
    val lbl = clusters.toDF("d", "c")
    val crossCluster = pairs
      .join(lbl.toDF("d", "c_a"), $"id_a" === $"d").drop("d")
      .join(lbl.toDF("d", "c_b"), $"id_b" === $"d").drop("d")
      .filter($"c_a" =!= $"c_b")
    assert(crossCluster.count() == 0)
    // exactly the vectors implicated in a pair appear (no singletons)
    val inPairs = pairs.select($"id_a".as("v")).union(pairs.select($"id_b")).distinct()
    assert(clusters.count() == inPairs.count())
  }

  test("t21 sequence packing equals a driver-side greedy recount and conserves tokens") {
    val spark = TestSpark.spark
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def shard(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 8
    }
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select($"source", $"doc_id", $"text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2).split("\\s+").length.toLong))
    // greedy concat-then-cut per (source, shard), docs in id order
    val expected = docs.groupBy(d => (d._1, shard(d._2))).toSeq.flatMap {
      case ((src, sh), ds) =>
        val sorted = ds.sortBy(_._2)
        val cums = sorted.scanLeft(0L)(_ + _._3)
        sorted.zip(cums).map { case ((_, id, n), before) => (src, sh, before / 256, id, n) }
    }.groupBy(x => (x._1, x._2, x._3)).map { case ((src, sh, seq), xs) =>
      (src, sh, seq) -> ((xs.length.toLong, xs.map(_._5).sum, xs.map(_._4).min, xs.map(_._4).max))
    }
    val got = graft.ops.TextOps.sequencePack(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == expected)
    // token conservation: the packing plan accounts for every token once
    assert(got.values.map(_._2).sum == docs.map(_._3).sum)
  }

  test("t22 source divergence equals a term-ordered driver-side fold and is non-negative") {
    val spark = TestSpark.spark
    import spark.implicits._
    val toks = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select($"source", $"text").collect()
      .flatMap(r => r.getString(1).split("\\s+").map(t => (r.getString(0), t)))
    val st = toks.groupBy(identity).map { case ((s0, t), xs) => (s0, t, xs.length.toLong) }.toSeq
    val tf = st.groupBy(_._2).map { case (t, xs) => t -> xs.map(_._3).sum }
    val ns = st.groupBy(_._1).map { case (s0, xs) => s0 -> xs.map(_._3).sum }
    val nTotal = tf.values.sum
    val expected = st.groupBy(_._1).map { case (src, xs) =>
      // the round-12 SEGMENTED fold: terms hash into 256 md5 segments,
      // term order within a segment (sort_array's unsigned-byte UTF-8),
      // segment order across the 0.0-seeded segment sums
      val kl = xs.groupBy(x => md5Seg(x._2)).toSeq.sortBy(_._1)
        .foldLeft(0.0) { case (outer, (_, segTerms)) =>
          outer + segTerms.sortBy(_._2).foldLeft(0.0) { case (acc, (_, t, c)) =>
            acc + (c.toDouble / ns(src)) *
              Math.log((c.toDouble * nTotal) / (ns(src).toDouble * tf(t)))
          }
        }
      src -> ((xs.length.toLong, ns(src), kl))
    }
    val got = graft.ops.TextOps.sourceDivergence(spark, TestSpark.sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.nonEmpty)
    assert(got == expected)
    // KL(source ‖ corpus) is non-negative up to float rounding
    got.values.foreach { case (_, _, kl) => assert(kl >= -1e-12) }
  }

  test("d22 CDC chunking equals a driver-side recount and is alignment-independent") {
    val spark = TestSpark.spark
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket8(w: String): Long = {
      val hex = md.digest(w.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 8
    }
    // driver-side recount on the real corpus
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").toSeq))
    val occ = docs.flatMap { case (id, ws) =>
      val chunkNos = ws.scanLeft(0L)((acc, w) => acc + (if (bucket8(w) == 0) 1 else 0)).tail
      ws.zip(chunkNos).groupBy(_._2).values
        .filter(_.length >= 5).map(c => (c.map(_._1).mkString(" "), id))
    }
    val expected = occ.groupBy(_._1).collect {
      case (chunk, xs) if xs.map(_._2).distinct.length >= 2 =>
        chunk -> ((xs.map(_._2).distinct.length.toLong, xs.length.toLong, xs.map(_._2).min))
    }.toMap
    val got = graft.ops.Dedup.chunkDedupCdc(spark, TestSpark.sfDir).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected)

    // alignment independence: a span shared at DIFFERENT offsets is
    // found by CDC and provably missed by d20's fixed windows
    val pool = (0 until 400).map(i => s"w$i")
    val bWords = pool.filter(bucket8(_) == 0)
    val xWords = pool.filter(bucket8(_) != 0)
    assert(bWords.length >= 2 && xWords.length >= 20)
    val span = (bWords(0) +: xWords.take(5)) :+ bWords(1) // chunk = b x1..x5
    val docA = (xWords.slice(6, 8) ++ span ++ xWords.slice(11, 14)).mkString(" ")
    val docB = (xWords.slice(14, 17) ++ span ++ xWords.slice(17, 19)).mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cdc = graft.ops.Dedup.chunkDedupCdc(spark, dir).collect()
    val wanted = (bWords(0) +: xWords.take(5)).mkString(" ")
    assert(cdc.exists(r => r.getString(1) == wanted && r.getLong(2) == 2L))
    // both docs are 12 tokens, span offsets 2 vs 3 — no aligned 10-window
    assert(graft.ops.Dedup.chunkDedup(spark, dir).count() == 0)
  }

  test("t23 temperature resample equals driver-side rates and flattens the mix") {
    val spark = TestSpark.spark
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 1000000
    }
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select($"source", $"doc_id", $"text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2).split("\\s+").length.toLong))
    val ns = docs.groupBy(_._1).map { case (src, xs) => src -> xs.map(_._3).sum }
    val nMin = ns.values.min
    val rate = ns.map { case (src, n) => src -> Math.sqrt(nMin.toDouble / n.toDouble) }
    val expected = docs.filter { case (src, id, _) => bucket(id).toDouble < rate(src) * 1000000.0 }
      .map(_._2).toSet
    val got = graft.ops.TextOps.temperatureResample(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(1), r.getString(0), r.getDouble(3)))
    assert(got.map(_._1).toSet == expected)
    // rates are bit-exact and the smallest source keeps everything
    got.foreach { case (_, src, r) => assert(r == rate(src)) }
    val smallest = ns.minBy(_._2)._1
    assert(rate(smallest) == 1.0)
    // flattening: every source's kept-token share moves toward uniform —
    // the max/min kept-token ratio never exceeds the original ratio
    val keptNs = got.groupBy(_._2).map { case (src, xs) =>
      src -> docs.filter(d => xs.exists(_._1 == d._2)).map(_._3).sum }
    if (keptNs.size >= 2 && ns.size >= 2) {
      val before = ns.values.max.toDouble / ns.values.min
      val after = keptNs.values.max.toDouble / keptNs.values.min
      assert(after <= before * 1.05) // md5-bucket realization noise margin
    }
  }

  test("t18 stratified sample honors per-language rates and is rerun-stable") {
    val spark = TestSpark.spark
    import spark.implicits._
    val sampled = graft.ops.TextOps.stratifiedSample(spark, TestSpark.sfDir)
    val rates = Map("en" -> 25L, "de" -> 50L, "fr" -> 50L, "es" -> 75L, "zh" -> 100L)
    // every kept row's bucket is under its language's rate
    val viol = sampled.collect().filter(r => r.getLong(3) >= rates(r.getString(1)))
    assert(viol.isEmpty)
    // the keep decision is a pure function of doc_id: recompute md5
    // buckets driver-side and compare the kept id set exactly
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select($"doc_id", $"lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.filter { case (id, lang) => bucket(id) < rates(lang) }
      .map(_._1).toSet
    assert(sampled.select($"doc_id").collect().map(_.getLong(0)).toSet == expected)
    assert(expected.nonEmpty && expected.size < docs.length)
  }

  test("e14 transition counts conserve pairs and P(to|from) sums to 1") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = graft.ops.EventOps.transitions(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // driver recount: sort each user's events by (ts, event_id), count
    // consecutive pairs
    val ev = graft.Tables.events(spark, TestSpark.sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type").collect()
      .map { r =>
        val t = TestSpark.rowTs(r, 1)
        // full-precision key: epoch seconds + nanos (getTime alone
        // truncates to millis and could reorder sub-ms ties)
        (r.getLong(0), (t.getTime / 1000, t.getNanos), r.getLong(2), r.getString(3))
      }
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3)).map(_._4)
      sorted.zip(sorted.drop(1))
    }.groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }
    assert(got.map(g => (g._1, g._2, g._3)).toSet == expected.toSet)
    // each from-type's probabilities are n/total exactly and sum to ~1
    got.groupBy(_._1).foreach { case (_, rows) =>
      val tot = rows.map(_._3).sum
      rows.foreach(r => assert(r._4 == r._3.toDouble / tot))
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9)
    }
  }

  test("t24 entropy matches a driver-side ordered fold and is bounded") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = graft.ops.TextOps.sourceEntropy(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySource = docs.groupBy(_._1).map { case (src, rows) =>
      val counts = rows.flatMap(_._2.split("\\s+")).groupBy(identity)
        .map { case (t, v) => (t, v.size.toLong) }
      src -> counts
    }
    got.foreach { case (src, vocab, nTokens, entropy, norm) =>
      val counts = bySource(src)
      val n = counts.values.sum
      assert(vocab == counts.size && nTokens == n)
      // same segmented fold (md5 segment, term order within, segment
      // order across), same Math.log: bit-exact
      val exp = counts.toSeq.groupBy(x => md5Seg(x._1)).toSeq.sortBy(_._1)
        .foldLeft(0.0) { case (outer, (_, segTerms)) =>
          outer + segTerms.sortBy(_._1).foldLeft(0.0) { case (acc, (_, c)) =>
            val p = c.toDouble / n.toDouble
            acc + -(p * Math.log(p))
          }
        }
      assert(entropy == exp, s"$src: got $entropy want $exp")
      assert(norm == entropy / Math.log(vocab.toDouble))
      assert(entropy >= 0.0 && norm <= 1.0 + 1e-12)
    }
  }

  test("t31 sketch curriculum: manifest equals t25's and sketch agreement clears the floor") {
    val spark = TestSpark.spark
    import spark.implicits._
    // The registered row: exact manifest + all-true agreement gate.
    val t31 = graft.ops.TextOps.curriculumSketch(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val t25 = graft.ops.TextOps.curriculum(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(5)))).toMap
    assert(t31.keySet == t25.keySet)
    t31.foreach { case (k, (nDocs, phTok, agreeOk)) =>
      assert((nDocs, phTok) == t25(k), s"$k manifest drifted from the exact ntile arm")
      assert(agreeOk, s"$k: sketch agreement below the 90% floor")
    }
    // The real measured agreement, pinned above the registered floor
    // with margin: the sketch loses only tie/rank-convention boundary
    // docs, never a phase's worth.
    val agree = graft.ops.TextOps.curriculumSketchAgreement(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(agree.nonEmpty)
    agree.foreach { case (src, n, nAgree) =>
      assert(nAgree * 10 >= n * 9, s"$src: $nAgree/$n below floor")
    }
  }

  test("s15 k-means step: segmented-fold means are bit-exact and improve the Lloyd objective") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = graft.ops.Similarity.kmeansStep(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    // driver-side reassignment + segmented-fold recount
    val embs = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cells = embs.keys.toSeq.sorted.map { id =>
      id -> (0L until 16L).minBy(c => (-cos(embs(id), embs(c)), c))
    }
    val byCell = cells.groupBy(_._2).map { case (c, ms) => c -> ms.map(_._1).sorted }
    byCell.foreach { case (cell, members) =>
      (0 until 64).foreach { dim =>
        val (oldC, newC, n) = got((cell, dim.toLong))
        assert(n == members.length.toLong)
        assert(oldC == embs(cell)(dim))
        // the registered fold order: vec_id%256 segments, vec_id order
        // within, segment order across, each level 0.0-seeded
        val exp = members.groupBy(_ % 256).toSeq.sortBy(_._1)
          .foldLeft(0.0) { case (acc, (_, seg)) =>
            acc + seg.sorted.foldLeft(0.0)((a, id) => a + embs(id)(dim))
          } / members.length
        assert(newC == exp, s"cell $cell dim $dim: got $newC want $exp")
      }
    }
    // Lloyd guarantee: per cell the mean minimizes the summed squared
    // L2 to members, so the update never worsens it vs the seed
    byCell.foreach { case (cell, members) =>
      def sse(c: Int => Double): Double = members.map { id =>
        (0 until 64).map(d => { val e = embs(id)(d) - c(d); e * e }).sum
      }.sum
      val before = sse(d => got((cell, d.toLong))._1)
      val after = sse(d => got((cell, d.toLong))._2)
      assert(after <= before + 1e-9, s"cell $cell: $after > $before")
    }
  }

  test("t32 funnel stages are monotone and the quality stage equals t11's selection") {
    val spark = TestSpark.spark
    val rows = graft.ops.TextOps.curationFunnel(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDocs, nExact, nNear, nQuality, nClean, tokens) =>
      assert(nDocs >= nExact && nExact >= nNear && nNear >= nQuality &&
        nQuality >= nClean, s"$src: funnel not monotone")
      assert((nClean == 0) == (tokens == 0L) || nClean > 0, src)
    }
    // the quality stage IS t11's selection predicate (canonical ∧
    // non-junior ∧ quality ≥ 0.8), so the totals must agree exactly
    val t11 = graft.ops.TextOps.trainingSelection(spark, TestSpark.sfDir).count()
    assert(rows.map(_._5).sum == t11)
    // the fixture must attrition somewhere or the gates are vacuous
    assert(rows.map(_._6).sum < rows.map(_._2).sum)
  }

  test("kmeansTrain: SSE descends monotonically and the assignment reaches a fixed point") {
    val spark = TestSpark.spark
    val (centroids, sseHist, iters) =
      graft.ops.Similarity.kmeansTrain(spark, TestSpark.sfDir, k = 16, maxIters = 16)
    assert(centroids.length == 16 && centroids.forall(_.length == 64))
    assert(iters < 16, s"did not converge in $iters iterations")
    assert(sseHist.nonEmpty)
    // the Lloyd guarantee, with a relative tolerance absorbing the
    // shuffle-order noise of the diagnostic SSE sum
    sseHist.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a * (1 + 1e-9), s"SSE rose: $a -> $b in $sseHist")
      case _ =>
    }
    // training moved the codebook away from the raw seeds
    val seeds = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("vec_id") < 16)
      .orderBy("vec_id").select("vec_id", "embedding").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    assert(centroids.zip(seeds).exists { case (c, s0) =>
      c.zip(s0).exists { case (x, y) => math.abs(x - y) > 1e-12 }
    })
  }

  test("t25 curriculum phases are equal-size cuts in quality order") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = graft.ops.TextOps.curriculum(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val perSource = got.groupBy(_._1)
    val docCounts = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .groupBy($"source").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    perSource.foreach { case (src, phases) =>
      assert(phases.map(_._2).sorted.toSeq == (1L to phases.length))
      // ntile: sizes differ by at most 1, larger phases first
      val sizes = phases.sortBy(_._2).map(_._3)
      assert(sizes.sum == docCounts(src))
      assert(sizes.max - sizes.min <= 1)
      assert(sizes.sorted.reverse.toSeq == sizes.toSeq)
      // quality ranges are non-overlapping and increasing with phase
      val sorted = phases.sortBy(_._2)
      sorted.zip(sorted.drop(1)).foreach { case (lo, hi) =>
        assert(lo._4 <= lo._5 && lo._5 <= hi._4,
          s"$src: phase ${lo._2} [${lo._4},${lo._5}] overlaps phase ${hi._2} [${hi._4},${hi._5}]")
      }
    }
  }

  test("s09 cells partition the corpus and reps dominate their cells") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = graft.ops.Similarity.centroidReps(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val total = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet").count()
    assert(got.map(_._2).sum == total)
    assert(got.map(_._1).distinct.length == got.length && got.length <= 16)
    got.foreach { case (cell, n, rep, repCos, minCos) =>
      assert(repCos >= minCos, s"cell $cell: rep $repCos < min $minCos")
      assert(n >= 1 && rep >= 0)
      // each seed vector lands in its own cell, so the seed IS the
      // representative and rep_cos is 1 up to the dot/(sqrt·sqrt)
      // rounding of the self-cosine (±1 ULP)
      if (cell == rep) assert(math.abs(repCos - 1.0) < 1e-12)
    }
    // the 16 seeds assign to themselves: rep of cell k is vector k
    got.foreach { case (cell, _, rep, _, _) => assert(rep == cell) }
  }

  test("e15 dwell gaps are consistent with e14 counts and non-negative") {
    val spark = TestSpark.spark
    val dwell = graft.ops.EventOps.transitionDwell(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    val counts = graft.ops.EventOps.transitions(spark, TestSpark.sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(dwell.nonEmpty && dwell.length == counts.size)
    dwell.foreach { case (from, to, n, total, mn, mx, mean) =>
      // same pair universe and the same counts as e14
      assert(counts((from, to)) == n)
      // the successor is strictly later or simultaneous, never earlier
      assert(mn >= 0L && mx >= mn)
      assert(total >= n * mn && total <= n * mx)
      assert(mean == total.toDouble / n.toDouble)
    }
  }

  test("t27 mixture plan: allocations fit sources, exactly one binding min") {
    val spark = TestSpark.spark
    val got = graft.ops.TextOps.mixturePlan(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getDouble(5)))
    assert(got.nonEmpty)
    // recompute the budget driver-side from the emitted (n_s, ppm)
    val budget = got.map { case (_, n, ppm, _, _, _) => n * 1000000L / ppm }.min
    got.foreach { case (src, n, ppm, keep, binding, util) =>
      assert(keep == ppm * budget / 1000000L)
      // downsample-only: the allocation never exceeds the source
      assert(keep <= n, s"$src allocated $keep > available $n")
      assert(binding == (n * 1000000L / ppm == budget))
      assert(util == keep.toDouble / n.toDouble && util <= 1.0)
    }
    // at least one source binds, and a binding source is fully used up
    // to the two floor divides (combined slack < (ppm + 10^6)/10^6 < 2)
    assert(got.exists(_._5))
    got.filter(_._5).foreach { case (src, n, _, keep, _, _) =>
      assert(n - keep <= 1L, s"binding $src wastes ${n - keep} tokens")
    }
  }

  test("t26 bigram NLL equals a bigram-ordered driver-side fold") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = graft.ops.TextOps.bigramLogProb(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").toSeq))
    val allBigrams = docs.flatMap { case (_, t) => t.zip(t.drop(1)).map(p => s"${p._1} ${p._2}") }
    val cb = allBigrams.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val cf = cb.groupBy(_._1.split(" ")(0)).map { case (w, v) => (w, v.values.sum) }
    val vocab = docs.flatMap(_._2).distinct.size.toLong
    val expected = docs.filter(_._2.size >= 2).map { case (id, t) =>
      val db = t.zip(t.drop(1)).map(p => s"${p._1} ${p._2}")
        .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      val nll = db.toSeq.sortBy(_._1).map { case (bgr, n) =>
        -n.toDouble * Math.log((cb(bgr) + 1L).toDouble / (cf(bgr.split(" ")(0)) + vocab).toDouble)
      }.foldLeft(0.0)(_ + _)
      (id, db.values.sum, nll)
    }.map { case (id, n, nll) => id -> (n, nll) }.toMap
    assert(got.length == expected.size)
    got.foreach { case (id, n, nll, avg) =>
      val (en, enll) = expected(id)
      assert(n == en && nll == enll, s"doc $id: got ($n,$nll) want ($en,$enll)")
      assert(avg == nll / n)
    }
  }

  test("s10 quantization audit equals a driver-side recount, codes fit uint8") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = graft.ops.Similarity.quantizationAudit(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))
    val vecs = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
      .select($"embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val dims = vecs.head.length
    assert(got.length == dims)
    got.foreach { case (dim, dMin, dMax, scale, qSum, maxErr) =>
      val xs = vecs.map(v => v(dim.toInt).toDouble)
      assert(dMin == xs.min && dMax == xs.max)
      assert(scale == (dMax - dMin) / 255.0)
      val qs = xs.map(x => math.floor((x - dMin) * 255.0 / (dMax - dMin)).toLong)
      assert(qs.forall(q => q >= 0 && q <= 255))
      assert(qSum == qs.sum)
      val errs = xs.zip(qs).map { case (x, q) =>
        math.abs(q.toDouble * ((dMax - dMin) / 255.0) + dMin - x) }
      assert(maxErr == errs.max)
      // reconstruction is within one quantization step everywhere
      assert(maxErr <= scale + 1e-15)
    }
  }

  test("d23 cluster tightness agrees with d18 edges and d11 labels") {
    val spark = TestSpark.spark
    val rows = graft.ops.Dedup.clusterTightness(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5)))
    val labels = graft.ops.Dedup.dupClusters(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val edges = graft.ops.Dedup.minhashAccuracy(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val byCluster = edges.groupBy { case (a, _, _) => labels(a) }
    assert(rows.nonEmpty && rows.map(_._1).toSet == byCluster.keySet)
    rows.foreach { case (cid, nm, ne, minJ, wa, wb) =>
      val es = byCluster(cid)
      assert(ne == es.length, s"cluster $cid: edge count")
      assert(nm == labels.count(_._2 == cid).toLong, s"cluster $cid: members")
      // a connected component with nm members needs >= nm-1 edges
      assert(ne >= nm - 1, s"cluster $cid: not spanning")
      val weakest = es.minBy { case (a, b, j) => (j, a, b) }
      assert((wa, wb) == ((weakest._1, weakest._2)) && minJ == weakest._3,
        s"cluster $cid: weakest edge mismatch")
      assert(labels(wa) == cid && labels(wb) == cid)
    }
  }

  test("t28 vocab growth equals a driver-side recount and is monotone") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = graft.ops.TextOps.vocabGrowth(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").toSeq))
    val n = docs.length.toLong
    // driver recount: decile of a doc, cumulative docs/tokens/vocab
    def decile(id: Long): Long = id * 10 / n + 1
    val expected = (1L to 10L).map { k =>
      val in = docs.filter(d => decile(d._1) <= k)
      (k, in.length.toLong, in.map(_._2.length.toLong).sum,
        in.flatMap(_._2).toSet.size.toLong)
    }
    assert(rows.length == 10)
    rows.zip(expected).foreach { case ((d, cd, ct, cv, ttr), (ek, ecd, ect, ecv)) =>
      assert(d == ek && cd == ecd && ct == ect,
        s"decile $d: docs/tokens ($cd,$ct) want ($ecd,$ect)")
      // cum_vocab counts FIRST occurrences — equals the distinct set size
      assert(cv == ecv, s"decile $d: vocab $cv want $ecv")
      assert(ttr == cv.toDouble / ct)
    }
    // monotone growth, full coverage at decile 10
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(identity).toSeq)
    assert(rows.last._2 == n)
  }

  test("t28 rejects sparse (non-contiguous) doc_ids at plan-build time") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-t28-sparse").toString
    // gap at id 2: ids {0,1,3} with n_docs=3 breaks max = n_docs - 1
    Seq((0L, "a b c"), (1L, "b c d"), (3L, "c d e"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ex = intercept[IllegalArgumentException] {
      graft.ops.TextOps.vocabGrowth(spark, dir)
    }
    assert(ex.getMessage.contains("contiguous"))
  }

  test("t30 frequency spectrum conserves token and type mass vs a driver recount") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = graft.ops.TextOps.freqSpectrum(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    val tokens = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select($"text").collect().flatMap(_.getString(0).split("\\s+"))
    val tf = tokens.groupBy(identity).map { case (_, a) => a.length.toLong }
    val expected = tf.groupBy(identity).map { case (r, a) => r -> a.size.toLong }
    assert(rows.map(r => r._1 -> r._2).toMap == expected)
    // conservation: sum r*N_r = corpus tokens, sum N_r = vocabulary
    assert(rows.map(r => r._1 * r._2).sum == tokens.length.toLong)
    assert(rows.map(_._2).sum == tf.size.toLong)
    // r* defined exactly where the next band is r+1, with the GT value
    val byR = rows.map(r => r._1 -> r._2).toMap
    rows.foreach { case (r, n, rStar) =>
      byR.get(r + 1) match {
        case Some(nNext) =>
          assert(rStar.contains((r + 1) * nNext.toDouble / n.toDouble), s"r=$r")
        case None => assert(rStar.isEmpty, s"r=$r should have no r*")
      }
    }
  }

  test("t29 source jaccard equals a driver-side set recount") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = graft.ops.TextOps.sourceJaccard(spark, TestSpark.sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    val bySource = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1).split("\\s+").toSet))
      .groupBy(_._1).map { case (s0, a) => s0 -> a.flatMap(_._2).toSet }
    val sources = bySource.keys.toSeq.sorted
    val expectedPairs = for {
      a <- sources; b <- sources if a < b
      inter = (bySource(a) & bySource(b)).size if inter > 0
    } yield (a, b)
    assert(rows.keySet == expectedPairs.toSet)
    rows.foreach { case ((a, b), (na, nb, nc, j)) =>
      assert(na == bySource(a).size && nb == bySource(b).size)
      assert(nc == (bySource(a) & bySource(b)).size)
      assert(j == nc.toDouble / (na + nb - nc).toDouble)
      assert(nc <= math.min(na, nb) && j > 0.0 && j <= 1.0)
    }
  }

  test("d27 canonical selection: quality argmax per cluster, one survivor each") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = graft.ops.Dedup.canonicalSelection(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    // decision rows cover exactly the d11 labeling
    val labels = graft.ops.Dedup.dupClusters(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.map(r => r._1 -> r._2).toMap == labels)
    rows.groupBy(_._2).foreach { case (cluster, members) =>
      // exactly one kept member, and it is the canonical of every row
      val kept = members.filter(_._4)
      assert(kept.length == 1)
      val canon = kept.head._1
      assert(members.forall(_._3 == canon))
      // argmax by (quality desc, doc_id asc)
      val best = members.minBy(m => (-m._5, m._1))
      assert(canon == best._1, s"cluster $cluster kept $canon, expected ${best._1}")
    }
  }

  test("t33 piiScan: counts and redaction over a literal frame, clean text untouched") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(
      (1L, "reach me at jo.doe+x@corp.example.org or 555-123-4567 now"),
      (2L, "two mails a@b.io c.d@e.f.co one ip 192.168.0.1"),
      (3L, "no pii here just words and 12345 and 1.2 decimals"),
      (4L, "call 555-000-1111 or 555-222-3333 from 10.0.0.7")
    ).toDF("doc_id", "text")
    val got = graft.ops.TextOps.piiScan(df, "text")
      .select($"doc_id", $"n_emails", $"n_phones", $"n_ipv4", $"redacted")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).sortBy(_._1)
    assert(got(0) == ((1L, 1L, 1L, 0L,
      "reach me at [EMAIL] or [PHONE] now")))
    assert(got(1) == ((2L, 2L, 0L, 1L, "two mails [EMAIL] [EMAIL] one ip [IP]")))
    assert(got(2) == ((3L, 0L, 0L, 0L,
      "no pii here just words and 12345 and 1.2 decimals")))
    assert(got(3) == ((4L, 0L, 2L, 1L, "call [PHONE] or [PHONE] from [IP]")))
  }

  test("t33 fixture plants doc_id%3 emails, doc_id%2 phones, one ip per doc") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = graft.ops.TextOps.piiScanQuery(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (id, ne, np, ni) =>
      assert(ne == id % 3 && np == id % 2 && ni == 1L, s"doc $id: $ne $np $ni")
    }
  }

  test("d30 savings by source: conserves docs and tokens against d27") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = graft.ops.Dedup.dedupSavingsBySource(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val nDropped27 = graft.ops.Dedup.canonicalSelection(spark, TestSpark.sfDir)
      .filter(!$"kept").count()
    assert(rows.map(_._3).sum == nDropped27, "drop counts must match d27")
    val totals = graft.Tables.documents(spark, TestSpark.sfDir)
      .groupBy($"source")
      .agg(count(lit(1)).as("n"),
        sum(size(split($"text", "\\s+")).cast("long")).as("tok"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (src, n, nd, td, tkKept) =>
      val (nAll, tokAll) = totals(src)
      assert(n == nAll && nd <= n)
      assert(td + tkKept == tokAll, s"$src: token conservation")
    }
  }

  test("d29 lsh calibration: monotone counts, S-curve, and a driver recount") {
    val spark = TestSpark.spark
    val rows = graft.ops.Dedup.lshThresholdCalibration(spark, TestSpark.sfDir)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) Double.NaN else r.getDouble(5), r.getDouble(6)))
      .sortBy(_._1)
    assert(rows.length == 9)
    val pairs = graft.ops.Dedup.minhashAccuracy(spark, TestSpark.sfDir)
      .collect().map(r => (r.getDouble(2), r.getDouble(3)))
    rows.foreach { case (tau, n, ne, nt, nb, prec, coll) =>
      assert(n == pairs.length)
      assert(ne == pairs.count(_._1 >= tau) && nt == pairs.count(_._2 >= tau))
      assert(nb == pairs.count(p => p._1 >= tau && p._2 >= tau))
      assert(nb <= math.min(ne, nt))
      if (ne > 0) assert(prec == nb.toDouble / ne.toDouble)
      val t3 = tau * tau * tau
      assert(coll == 1.0 - ((1.0 - t3) * (1.0 - t3)) * ((1.0 - t3) * (1.0 - t3)))
    }
    // thresholds only tighten: pass counts fall, collision prob rises
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 >= b._3 && a._4 >= b._4 && a._7 <= b._7)
    case _ => }
  }

  test("t35 calibration: quartiles partition each source with ordered quality ranges") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = graft.ops.TextOps.qualityCalibration(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_._1)
    val srcCounts = graft.Tables.documents(spark, TestSpark.sfDir)
      .groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { case (src, qs) =>
      // Cell-bar quartiles put all ties of a quality cell in ONE
      // quartile, so an id can be skipped under heavy ties — ids are
      // distinct, ascending, within 1..4, and quartile 1 always
      // exists (the minimum cell is <= every bar).
      val ids = qs.map(_._2).sorted.toSeq
      assert(ids == ids.distinct && ids.head == 1L && ids.last <= 4L,
        s"$src quartile ids $ids")
      assert(qs.map(_._3).sum == srcCounts(src), s"$src: quartiles must partition")
      val ordered = qs.sortBy(_._2)
      ordered.foreach { case (_, _, n, qmin, qmax, med) =>
        assert(n > 0 && qmin <= qmax && med >= 0L)
      }
      // quality ranges are non-overlapping in quartile order: a later
      // quartile's docs sit in strictly greater quality CELLS, so its
      // realized quality minimum exceeds the earlier maximum.
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._5 < b._4, s"$src: ranges overlap")
        case _ =>
      }
      // no quartile swallows its whole source (the cell convention
      // permits uneven splits under ties, so this is the strongest
      // tie-robust bound; the oracle certifies the exact counts)
      val n = srcCounts(src)
      ordered.foreach { case (_, q, cnt, _, _, _) =>
        assert(cnt < n, s"$src q$q holds the whole source")
      }
    }
  }

  test("t37 BM25: scores and ranking recomputed driver-side") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = graft.ops.TextOps.bm25Rank(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(got.length == 10)
    assert(got.map(_._1).toSeq == (1L to 10L))
    val terms = Seq("hash", "join", "stream")
    val toks = graft.Tables.documents(spark, TestSpark.sfDir)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+")))
    val n = toks.length.toDouble
    val avgdl = toks.map(_._2.length.toLong).sum.toDouble / n
    val dfm = terms.map(q => q -> toks.count(_._2.contains(q)).toDouble).toMap
    val scores = toks.map { case (id, arr) =>
      val dl = arr.length.toDouble
      id -> terms.map { q =>
        val t = arr.count(_ == q).toDouble
        val idf = math.log((n - dfm(q) + 0.5) / (dfm(q) + 0.5) + 1.0)
        idf * t * 2.2 / (t + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl)))
      }.sum
    }.toMap
    val expected = scores.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(10)
    got.zip(expected).foreach { case ((_, id, th, tj, ts, dl, sc), (eid, esc)) =>
      assert(id == eid, s"ranking diverges at doc $id vs $eid")
      assert(math.abs(sc - esc) < 1e-9, s"doc $id score $sc vs $esc")
      val arr = toks.find(_._1 == id).get._2
      assert(th == arr.count(_ == "hash") && tj == arr.count(_ == "join") &&
        ts == arr.count(_ == "stream") && dl == arr.length.toLong)
    }
    // tf saturation: the marginal contribution of the (t+1)-th
    // occurrence shrinks — the property that separates BM25 from the
    // linear tf of t13 (checked on the formula with corpus constants)
    val idfH = math.log((n - dfm("hash") + 0.5) / (dfm("hash") + 0.5) + 1.0)
    def c(t: Double) = idfH * t * 2.2 / (t + 1.2 * (1.0 - 0.75 + 0.75 * 1.0))
    val gains = (1 to 5).map(t => c(t.toDouble) - c(t.toDouble - 1.0))
    assert(gains.sliding(2).forall { case Seq(a, b) => b < a }, "tf must saturate")
  }

  test("t38 Zipf fit: OLS recomputed driver-side; slope negative on a ranked law") {
    val spark = TestSpark.spark
    import spark.implicits._
    val Array(row) = graft.ops.TextOps.zipfSlope(spark, TestSpark.sfDir).collect()
    val (nPts, slope, intercept) =
      (row.getLong(0), row.getDouble(1), row.getDouble(2))
    val counts = graft.Tables.documents(spark, TestSpark.sfDir)
      .select($"text").collect()
      .flatMap(_.getString(0).split("\\s+"))
      .groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
      .toSeq.sortBy { case (t, n) => (-n, t) }.take(50)
    // the corpus vocabulary is smaller than the 50-term cap — the fit
    // uses every term there is (and would cap at 50 on a larger one)
    assert(nPts == counts.length.toLong && nPts <= 50)
    val pts = counts.zipWithIndex.map { case ((_, n), i) =>
      (math.log((i + 1).toDouble), math.log(n.toDouble))
    }
    val np = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val eSlope = (np * sxy - sx * sy) / (np * sxx - sx * sx)
    assert(math.abs(slope - eSlope) < 1e-9, s"slope $slope vs $eSlope")
    assert(math.abs(intercept - (sy - eSlope * sx) / np) < 1e-9)
    // frequencies decay with rank, so the fitted slope must be negative
    assert(slope < 0.0)
  }

  test("t39 Heaps fit: OLS over t28's curve recomputed; saturation shows as β << 1") {
    val spark = TestSpark.spark
    val Array(row) = graft.ops.TextOps.heapsFit(spark, TestSpark.sfDir).collect()
    val (nPts, slope, intercept) =
      (row.getLong(0), row.getDouble(1), row.getDouble(2))
    val growth = graft.ops.TextOps.vocabGrowth(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(nPts == growth.length.toLong && nPts == 10)
    val pts = growth.map { case (_, tok, voc) =>
      (math.log(tok.toDouble), math.log(voc.toDouble))
    }
    val np = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val eSlope = (np * sxy - sx * sy) / (np * sxx - sx * sx)
    assert(math.abs(slope - eSlope) < 1e-9)
    assert(math.abs(intercept - (sy - eSlope * sx) / np) < 1e-9)
    // vocab can only grow, so β ≥ 0; the generator's closed vocabulary
    // saturates in decile 1, so β is far below natural text's ~0.5 —
    // the detector firing exactly as designed
    assert(slope >= 0.0 && slope < 0.1, s"expected saturating beta, got $slope")
  }

  test("t40 lang-id confusion: matrix conserves t03's predictions, shares sum to 1") {
    val spark = TestSpark.spark
    val preds = graft.ops.TextOps.langId(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(1), r.getString(3)))
    val got = graft.ops.TextOps.langIdConfusion(spark, TestSpark.sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val expected = preds.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, (n, tot, share)) =>
      assert(n == expected(k))
      assert(tot == preds.count(_._1 == k._1).toLong)
      assert(share == n.toDouble / tot.toDouble)
    }
    // per declared language, shares sum to 1 exactly enough
    preds.map(_._1).distinct.foreach { lang =>
      val s = got.filter(_._1._1 == lang).values.map(_._3).sum
      assert(math.abs(s - 1.0) < 1e-12, s"$lang shares")
    }
    // every cell's count conserves the corpus
    assert(got.values.map(_._1).sum == preds.length.toLong)
  }

  test("t41 multi-suite decontam: agrees with t16 on suite A, verdicts exhaustive") {
    val spark = TestSpark.spark
    val got = graft.ops.TextOps.multiSuiteContamination(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(got.nonEmpty)
    // suite-A hit counts equal t16's on the shared candidate set
    // (t41 additionally excludes suite-B members from candidacy)
    val t16 = graft.ops.TextOps.contamination(spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (id, (a, b, v)) =>
      assert(id % 97 != 0 && id % 89 != 0, s"suite member $id leaked into candidates")
      assert(a > 0 || b > 0, s"doc $id emitted with zero hits")
      if (a > 0) assert(t16(id) == a, s"doc $id suite-A count diverges from t16")
      assert(v == (if (a > 0 && b > 0) "both" else if (a > 0) "suite_a" else "suite_b"))
    }
    // t16 hits on docs outside suite B must all reappear
    t16.keys.filter(_ % 89 != 0).foreach { id =>
      assert(got.contains(id), s"t16 hit $id missing from the multi-suite report")
    }
    // the fixture exercises every verdict class at this SF
    assert(got.values.map(_._3).toSet == Set("both", "suite_a", "suite_b"))
  }

  test("d33 threshold ablation: both clusterings recomputed driver-side, splits real") {
    val spark = TestSpark.spark
    val got = graft.ops.Dedup.thresholdAblation(spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    // exact-Jaccard pairs recomputed from the raw corpus
    val docs = graft.Tables.documents(spark, TestSpark.sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def h32(t: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).take(4).map(b => "%02x".format(b & 0xff))
        .mkString, 16)
    val shingles = docs.map { case (id, t) =>
      val th = t.split("\\s+").map(h32)
      id -> th.sliding(3).filter(_.length == 3)
        .map(w => ((w(0) * 31 + w(1)) % 2147483647L * 31 + w(2)) % 2147483647L)
        .toSet
    }.toMap
    val ids = docs.map(_._1)
    val pairs = for {
      i <- ids; jd <- ids if i < jd
      inter = (shingles(i) & shingles(jd)).size
      if inter > 0
      jac = inter.toDouble / (shingles(i).size + shingles(jd).size - inter)
      if jac >= 0.3
    } yield (i, jd, jac)
    def cluster(es: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.HashMap[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val m = ra.min(rb); parent(ra.max(rb)) = m }
      }
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
      // min-label convention: the root IS the component minimum under
      // union-by-min
      nodes.map(n => n -> find(n)).toMap
    }
    val lo = cluster(pairs.map(p => (p._1, p._2)))
    val hi = cluster(pairs.filter(_._3 >= 0.95).map(p => (p._1, p._2)))
    val expected = lo.groupBy(_._2).map { case (c, members) =>
      val groups = members.keys.map(d => hi.getOrElse(d, d)).toSet
      c -> (members.size.toLong, groups.size.toLong, groups.size > 1)
    }
    assert(got == expected)
    // the ablation must catch a real weak-edge merge on this corpus
    assert(got.values.exists(_._3), "no cluster splits at the strict threshold")
    assert(got.values.exists(!_._3), "every cluster splits — thresholds degenerate")
  }

  test("t42 effective vocab: exp(t24 entropy) bit-exact, bounds hold") {
    val spark = TestSpark.spark
    val t24 = graft.ops.TextOps.sourceEntropy(spark, TestSpark.sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val got = graft.ops.TextOps.effectiveVocab(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.map(_._1).toSet == t24.keySet)
    got.foreach { case (src, vocab, h, eff, frac) =>
      val (v24, h24) = t24(src)
      assert(vocab == v24 && h == h24, s"$src entropy diverges from t24")
      assert(eff == math.exp(h), s"$src: platform_exp must be Math.exp")
      assert(frac == eff / vocab.toDouble)
      // exp(H) ≤ |support| (equality iff uniform), and ≥ 1
      assert(eff >= 1.0 && eff <= vocab.toDouble * (1 + 1e-12), s"$src bounds")
      assert(frac > 0.0 && frac <= 1.0 + 1e-12)
    }
  }

  test("t34 span decontamination: interval union recomputed driver-side") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = graft.ops.TextOps.spanDecontamination(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    // same doc set as t16, at span granularity
    val t16Docs = graft.ops.TextOps.contamination(spark, TestSpark.sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(got.map(_._1).toSet == t16Docs)
    got.foreach { case (id, nHits, first, last, covered, nToks, frac) =>
      assert(nHits >= 1 && first <= last)
      // union of [pos, pos+3] intervals: between 4 and min(4*nHits, span+4)
      assert(covered >= 4 && covered <= 4 * nHits)
      assert(covered <= last - first + 4)
      assert(covered <= nToks)
      assert(frac == covered.toDouble / nToks.toDouble, s"doc $id frac")
    }
  }

  test("d34 catches a shared span that d20 (alignment) and d22 (boundaries) both miss") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.ops.Dedup
    // Build the adversarial shared span CONSTRUCTIVELY: 20 words none
    // of which is a CDC boundary token (md5 bucket % 8 == 0 opens a
    // d22 chunk), selected by the very predicate d22 runs — the spec
    // derives the blind spot from the operator's own definition
    // instead of hardcoding md5 facts.
    val pool = (1 to 80).map(i => f"span$i%02dword")
    val nonBoundary = pool.toDF("word")
      .filter(expr(
        "cast(conv(substring(md5(word), 1, 8), 16, 10) as bigint) % 8 != 0"))
      .as[String].collect()
    assert(nonBoundary.length >= 20, "candidate pool too boundary-rich")
    val span = nonBoundary.take(20)
    // Prefix lengths 3 vs 6: the span sits at offsets 3 and 6 — different
    // classes mod 10, so no d20 window pair can align; unique context
    // tokens on both sides keep every chunk that leaks past the span
    // carrier-specific.
    val doc1 = (Seq("alphaone", "alphatwo", "alphathree") ++ span ++
      Seq("omegaone", "omegatwo")).mkString(" ")
    val doc2 = (Seq("betaone", "betatwo", "betathree", "betafour",
      "betafive", "betasix") ++ span ++ Seq("psione")).mkString(" ")
    val docs = Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")
    // d20: fixed 10-token windows are phase-locked to the document —
    // misaligned carriers share no full window.
    assert(Dedup.chunkDedupFrame(docs, 10).count() == 0,
      "d20 must miss the misaligned span")
    // d22: zero boundary tokens inside the span means every chunk
    // touching it extends into differing context — no shared chunk.
    assert(Dedup.chunkDedupCdcFrame(docs, 5).count() == 0,
      "d22 must miss the boundary-free span")
    // d34: the span surfaces in BOTH carriers, maximal, verbatim, at
    // each carrier's own alignment.
    val got = Dedup.repeatedSpanRows(docs, 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val spanText = span.mkString(" ")
    assert(got == Set((1L, 3L, 20L, spanText), (2L, 6L, 20L, spanText)))
  }

  test("d35 cut pass: canonical carrier keeps the span, every other carrier loses exactly it") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.ops.Dedup
    // Three carriers of one 20-token span (reusing the d34 blind-spot
    // construction); min doc_id is canonical and must NOT appear in
    // the output at all, the other two lose exactly the span tokens.
    val pool = (1 to 80).map(i => f"span$i%02dword")
    val span = pool.toDF("word")
      .filter(expr(
        "cast(conv(substring(md5(word), 1, 8), 16, 10) as bigint) % 8 != 0"))
      .as[String].collect().take(20)
    val pre1 = Seq("alphaone", "alphatwo")
    val pre2 = Seq("betaone", "betatwo", "betathree")
    val pre3 = Seq("gammaone")
    val docs = Seq(
      (7L, (pre1 ++ span ++ Seq("omegaone")).mkString(" ")),
      (9L, (pre2 ++ span ++ Seq("psione", "psitwo")).mkString(" ")),
      (4L, (pre3 ++ span ++ Seq("zetaone")).mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.spanDedupApplyRows(docs, 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 4 (min id) is canonical: untouched, absent from the report.
    assert(out.map(_._1).toSeq == Seq(7L, 9L))
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(7L) == ((7L, 23L, 20L, (pre1 :+ "omegaone").mkString(" "))))
    assert(byId(9L) == ((9L, 25L, 20L,
      (pre2 ++ Seq("psione", "psitwo")).mkString(" "))))
  }

  test("t43 BPE training: greedy overlap, frequency weighting, lexicographic ties") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Hand-checkable corpus. Word counts: aaa x2, abab, low x3, lower,
    // lowest, newer, newest. Expected trace:
    //  1. (l,o) 5  — ties (o,w) 5; 'l' < 'o' breaks it
    //  2. (lo,w) 5
    //  3. (a,a) 4  — OVERLAPPING pairs both counted per 'aaa'
    //  4. (a,b) 2  — ties (aa,a), (e,r), (e,s); 'a','b' smallest
    //  5. (aa,a) 2 — greedy left-to-right made 'aaa' -> [aa, a]
    //  6. (e,r) 2  — 'r' < 's'
    val docs = Seq("aaa aaa abab low lower lowest", "low low newer newest")
      .toDF("text")
    val got = graft.ops.TextOps.bpeMergesFrame(spark, docs, 6).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == Seq((1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "a", "a", 4L),
      (4, "a", "b", 2L), (5, "aa", "a", 2L), (6, "e", "r", 2L)))
  }

  test("t45 char entropy: bounds, count conservation, driver recompute") {
    val spark = TestSpark.spark
    val rows = SparkEntry.queries("t45_char_entropy")(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val texts = spark.read.parquet(TestSpark.sfDir + "/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size)
    rows.foreach { case (id, charset, n, ent, norm) =>
      val cs = texts(id).toCharArray.groupBy(identity).map(_._2.length.toLong)
      assert(n == texts(id).length.toLong && charset == cs.size.toLong, s"doc $id counts")
      // H = ln n - (sum c ln c)/n recomputed with the same Math.log;
      // driver fold order differs, so compare within a few ulps only
      val expect = math.log(n.toDouble) -
        cs.toSeq.sorted.map(c => c * math.log(c.toDouble)).sum / n.toDouble
      assert(math.abs(ent - expect) < 1e-12, s"doc $id entropy")
      assert(ent >= 0.0 && ent <= math.log(charset.toDouble) + 1e-12, s"doc $id bounds")
      if (charset > 1) assert(norm >= 0.0 && norm <= 1.0 + 1e-12, s"doc $id norm")
    }
  }

  test("t46 BPE efficiency: zero merges degenerate to chars; 20 merges strictly compress") {
    val spark = TestSpark.spark
    val eff20 = SparkEntry.queries("t46_bpe_efficiency")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // with NO merges every symbol is one character, so the subtoken
    // budget IS the character budget — the untrained baseline
    val eff0 = graft.ops.TextOps.bpeEfficiency(spark, TestSpark.sfDir, 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(eff0.forall { case (_, _, subtok, chars) => subtok == chars })
    // same word/char totals under both tokenizers; training only
    // changes the segmentation
    assert(eff0.map(t => (t._1, t._2, t._4)).toSeq ==
      eff20.map(t => (t._1, t._2, t._4)).toSeq)
    eff20.foreach { case (src, words, subtok, chars) =>
      assert(words <= subtok, s"$src: a word is at least one subtoken")
      assert(subtok < chars, s"$src: 20 merges must beat the char baseline")
    }
  }

  test("d38 bloom prescreen: verdict recomputed, filter has no false negatives") {
    val spark = TestSpark.spark
    import spark.implicits._
    val r = SparkEntry.queries("d38_bloom_prescreen")(spark, TestSpark.sfDir)
      .collect().head
    val docs = spark.read.parquet(TestSpark.sfDir + "/documents.parquet")
      .selectExpr("doc_id", "md5(text) AS h").as[(Long, String)].collect()
    val hist = docs.filter(_._1 % 5 != 0).map(_._2).toSet
    val batch = docs.filter(_._1 % 5 == 0)
    assert(r.getLong(0) == batch.length.toLong)
    assert(r.getLong(1) == batch.count(d => hist.contains(d._2)).toLong)
    assert(r.getBoolean(2), "a Bloom filter can never report a stored key absent")
    assert(r.getBoolean(3), "fp count must sit inside 3x its expectation")
    // the filter itself, rebuilt with the same params, contains every
    // historical digest — the invariant the verdict column certifies
    val histDf = docs.filter(_._1 % 5 != 0).toSeq.toDF("doc_id", "h")
    val bloom = histDf.stat.bloomFilter("h", math.max(hist.size.toLong, 1L), 0.03)
    assert(hist.forall(bloom.mightContain), "rebuilt filter lost a key")
  }

  test("t48 split leakage: recomposed from d04 pairs and t14 splits; totals conserve") {
    val spark = TestSpark.spark
    val got = SparkEntry.queries("t48_split_leakage")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val split = SparkEntry.queries("t14_hash_split")(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val rk = Map("train" -> 0, "val" -> 1, "test" -> 2)
    val pairs = SparkEntry.queries("d04_shingle_jaccard")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs.map { case (a, b) =>
      val (sa, sb) = (split(a), split(b))
      if (rk(sa) <= rk(sb)) (sa, sb, a, b) else (sb, sa, b, a)
    }.groupBy(t => (t._1, t._2)).map { case (k, xs) =>
      k -> (xs.length.toLong,
        xs.map(_._3).distinct.length.toLong, xs.map(_._4).distinct.length.toLong)
    }
    assert(got == expected)
    // conservation: every d04 pair lands in exactly one split cell
    assert(got.values.map(_._1).sum == pairs.length.toLong)
    // the audit's reason to exist: this corpus leaks across the split
    assert(got.keys.exists { case (lo, hi) => lo != hi },
      "no cross-split near-dup found — fixture no longer exercises the leak arm")
  }

  test("d39 b-bit minwise: bits recomputed from d02 sigs, dominance over full agreement, same pairs as d18") {
    val spark = TestSpark.spark
    val rows = SparkEntry.queries("d39_bbit_minwise")(spark, TestSpark.sfDir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
    assert(rows.nonEmpty)
    val d18 = SparkEntry.queries("d18_mh_accuracy")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rows.map(_._1).toSet == d18.keySet, "d39 must audit exactly d18's candidate set")
    val sigs = SparkEntry.queries("d02_minhash_sigs")(spark, TestSpark.sfDir)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.sortBy(_.getLong(1)).map(_.getLong(2)) }
    rows.foreach { case ((a, b), (bits, e1, eF, _)) =>
      val expBits = sigs(a).zip(sigs(b)).count { case (x, y) => x % 2 == y % 2 }.toLong
      assert(bits == expBits, s"pair ($a,$b) bit agreement")
      assert(e1 == (2 * bits - 12).toDouble / 12, s"pair ($a,$b) estimator")
      assert(eF == d18((a, b)), s"pair ($a,$b) full estimate must match d18")
      // a fully-agreeing component always agrees on its low bit, so the
      // bit count dominates: est_b1's extra matches are the NOISE the
      // audit measures
      assert(bits >= math.round(eF * 12), s"pair ($a,$b) dominance")
      assert(e1 >= -1.0 && e1 <= 1.0)
    }
  }

  test("t47 readability: counts and score recomputed; vowel-group heuristic and clamps hold") {
    val spark = TestSpark.spark
    val rows = SparkEntry.queries("t47_readability")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val texts = spark.read.parquet(TestSpark.sfDir + "/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size)
    val vg = "[aeiouy]+".r
    rows.foreach { case (id, sents, words, syls, flesch) =>
      val t = texts(id)
      val eSents = math.max(1L, "[.!?]+".r.findAllIn(t).length.toLong)
      val ws = t.toLowerCase.split("\\s+")
      val eSyls = ws.map(w => math.max(1L, vg.findAllIn(w).length.toLong)).sum
      assert(sents == eSents && words == ws.length.toLong && syls == eSyls,
        s"doc $id counts")
      // exact same left-associated IEEE expression — bit equality
      val expect = 206.835 - 1.015 * (words.toDouble / sents.toDouble) -
        84.6 * (syls.toDouble / words.toDouble)
      assert(flesch == expect, s"doc $id score")
      assert(syls >= words, "every word carries at least one syllable")
    }
    // the heuristic must discriminate: not every doc shares one score
    assert(rows.map(_._5).distinct.length > 1)
  }

  test("d40 SemDeDup: driver recompute of cells, groups, and the farthest-from-centroid keep") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = SparkEntry.queries("d40_semdedup")(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    val embs = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cell = embs.keys.map { id =>
      id -> (0L until 16L).minBy(c => (-cos(embs(id), embs(c)), c))
    }.toMap
    // within-cell tau-pairs, then min-label connected components
    val ids = embs.keys.toSeq.sorted
    val pairs = for {
      a <- ids; b <- ids
      if a < b && cell(a) == cell(b) && cos(embs(a), embs(b)) >= 0.4
    } yield (a, b)
    val label = scala.collection.mutable.Map(
      pairs.flatMap(p => Seq(p._1, p._2)).distinct.map(x => x -> x): _*)
    var changed = true
    while (changed) {
      changed = false
      pairs.foreach { case (a, b) =>
        val m = math.min(label(a), label(b))
        if (label(a) != m || label(b) != m) { label(a) = m; label(b) = m; changed = true }
      }
    }
    // exactly the implicated set, with the recomputed cell and group
    assert(rows.map(_._1).toSet == label.keySet)
    rows.foreach { case (id, c, grp, cc, _) =>
      assert(c == cell(id), s"vec $id cell")
      assert(grp == label(id), s"vec $id group")
      assert(math.abs(cc - cos(embs(id), embs(cell(id)))) < 1e-12, s"vec $id cos_c")
    }
    // one keep per group, and it is the FARTHEST-from-centroid member
    // (lowest cos_c; ties by id) — the SemDeDup keep rule
    rows.groupBy(_._3).foreach { case (grp, ms) =>
      assert(ms.length >= 2, s"group $grp is a real duplicate group")
      assert(ms.count(_._5) == 1, s"group $grp keeps exactly one")
      val kept = ms.filter(_._5).head
      val best = ms.minBy(m => (m._4, m._1))
      assert(kept._1 == best._1, s"group $grp keep rule")
      assert(ms.map(_._2).distinct.length == 1, s"group $grp spans one cell")
    }
  }

  test("s34 silhouette: linearized scores equal the O(n^2) textbook definition") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = SparkEntry.queries("s34_silhouette")(spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val embs = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cell = embs.keys.map { id =>
      id -> (0L until 16L).minBy(c => (-cos(embs(id), embs(c)), c))
    }.toMap
    val byCell = embs.keys.toSeq.groupBy(cell)
    assert(got.keySet == embs.keySet)
    embs.keys.foreach { id =>
      val (gc, aD, bD, sil) = got(id)
      assert(gc == cell(id), s"vec $id cell")
      // textbook silhouette: a = mean pairwise distance to OWN cell
      // (self excluded), b = min over other cells of mean distance —
      // the op computes the same quantities via one dot per cell
      // against the normalized-sum vector, so they agree to float
      // noise, never by construction of the same code path
      val ownOthers = byCell(cell(id)).filter(_ != id)
      if (ownOthers.nonEmpty) {
        val a = ownOthers.map(o => 1.0 - cos(embs(id), embs(o))).sum / ownOthers.size
        val b = byCell.collect { case (c, ms) if c != cell(id) =>
          ms.map(o => 1.0 - cos(embs(id), embs(o))).sum / ms.size
        }.min
        val sTrue = (b - a) / math.max(a, b)
        assert(math.abs(aD - a) < 1e-9, s"vec $id a: $aD vs $a")
        assert(math.abs(bD - b) < 1e-9, s"vec $id b: $bD vs $b")
        assert(math.abs(sil - sTrue) < 1e-9, s"vec $id sil")
      } else assert(sil == 0.0, s"singleton vec $id takes s = 0")
      assert(sil >= -1.0 - 1e-12 && sil <= 1.0 + 1e-12)
    }
    // the audit discriminates: both well- and badly-quantized vectors
    assert(got.values.exists(_._4 > 0) && got.values.exists(_._4 < 0))
  }

  test("d41 signal agreement: composes exactly from the d27 and d40 decision tables") {
    val spark = TestSpark.spark
    val got = SparkEntry.queries("d41_signal_agreement")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val lex = SparkEntry.queries("d27_canonical_keep")(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val sem = SparkEntry.queries("d40_semdedup")(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    def verdict(m: Map[Long, Boolean], id: Long) =
      m.get(id).map(k => if (k) "keep" else "drop").getOrElse("uninvolved")
    val expected = (lex.keySet ++ sem.keySet).toSeq
      .map(id => (verdict(lex, id), verdict(sem, id), id))
      .groupBy(t => (t._1, t._2))
      .map { case (k, g) => k -> (g.size.toLong, g.map(_._3).min) }
    assert(got == expected)
    // the table must witness real cross-family disagreement: at least
    // one doc dropped by one family while the other keeps or ignores it
    val disagree = got.collect {
      case ((l, s2), (n, _)) if l != s2 && (l == "drop" || s2 == "drop") => n
    }.sum
    assert(disagree > 0, "no cross-family disagreement to audit")
  }

  test("t50 memorization rate: splits, gram sets, and fractions recomputed driver-side") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = SparkEntry.queries("t50_memorization_rate")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    val docs = spark.read.parquet(TestSpark.sfDir + "/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def md5bucket(x: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    def split(id: Long): String = {
      val b = md5bucket(id.toString) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    def grams(text: String): Set[Long] = {
      val th = text.split("\\s+").map(t => md5bucket(t))
      th.sliding(3).filter(_.length == 3)
        .map(w => ((w(0) * 31 + w(1)) % 2147483647L * 31 + w(2)) % 2147483647L)
        .toSet
    }
    val trainSet = docs.collect { case (id, t) if split(id) == "train" => grams(t) }
      .foldLeft(Set.empty[Long])(_ ++ _)
    val evalDocs = docs.filter { case (id, t) =>
      split(id) != "train" && grams(t).nonEmpty
    }
    assert(rows.keySet == evalDocs.keySet)
    evalDocs.foreach { case (id, t) =>
      val g = grams(t)
      val seen = g.count(trainSet.contains).toLong
      val (sp, ng, ns, fr) = rows(id)
      assert(sp == split(id), s"doc $id split")
      assert(ng == g.size.toLong && ns == seen, s"doc $id counts")
      assert(fr == seen.toDouble / g.size.toDouble, s"doc $id frac")
      assert(fr >= 0.0 && fr <= 1.0)
    }
    // the audit must discriminate: not all eval docs equally covered
    assert(rows.values.map(_._4).toSet.size > 1)
  }

  test("t49 DSIR weights: driver recompute, target slice scores higher, gram conservation") {
    val spark = TestSpark.spark
    val rows = SparkEntry.queries("t49_dsir_weights")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val docs = spark.read.parquet(TestSpark.sfDir + "/documents.parquet")
      .selectExpr("doc_id", "lang", "text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows.length == docs.size)
    // n_grams = tokens - 1 for every doc (word bigrams over one doc)
    rows.foreach { case (id, ng, _, _) =>
      assert(ng == docs(id)._2.split("\\s+").length.toLong - 1L, s"doc $id grams")
    }
    // driver recompute of the full scoring chain (any-order double sums
    // under a tolerance; the bit-exact claim is the DuckDB oracle's job)
    val grams = docs.toSeq.flatMap { case (id, (lang, text)) =>
      val t = text.split("\\s+")
      t.dropRight(1).zip(t.drop(1)).map { case (a, b) =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest((a + " " + b).getBytes("UTF-8"))
        val bucket = java.lang.Long.parseLong(
          md.take(4).map(x => f"${x & 0xff}%02x").mkString, 16) % 64
        (id, lang, bucket)
      }
    }
    val raw = grams.groupBy(_._3).map { case (b, g) => b -> g.size.toLong }
    val tgt = grams.filter(_._2 == "en").groupBy(_._3)
      .map { case (b, g) => b -> g.size.toLong }
    val nRaw = raw.values.sum; val nTgt = tgt.values.sum
    val expected = grams.groupBy(_._1).map { case (id, g) =>
      val f = g.groupBy(_._3).map { case (b, x) => b -> x.size.toLong }
      val feat = f.toSeq.sortBy(_._1).map { case (b, n) =>
        n.toDouble * (math.log(tgt.getOrElse(b, 0L).toDouble + 1.0) -
          math.log(raw(b).toDouble + 1.0))
      }.sum
      id -> (feat + g.size.toDouble *
        (math.log(nRaw.toDouble + 64.0) - math.log(nTgt.toDouble + 64.0)))
    }
    rows.foreach { case (id, _, logw, sel) =>
      assert(math.abs(logw - expected(id)) < 1e-9, s"doc $id logw")
      assert(sel == (logw > 0.0))
    }
    // the weights must do their job: the target slice scores higher on
    // average than the rest, and not everything is selected
    val (en, other) = rows.partition(r => docs(r._1)._1 == "en")
    val meanEn = en.map(_._3).sum / en.length
    val meanOther = other.map(_._3).sum / other.length
    assert(meanEn > meanOther, s"en $meanEn vs other $meanOther")
    assert(rows.exists(_._4) && rows.exists(!_._4))
  }

  test("d43 cap ablation: cap-16 clusters nest inside cap-64; rollup recomputed") {
    val spark = TestSpark.spark
    val got = SparkEntry.queries("d43_cap_ablation")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    val hi = graft.ops.Dedup.dupClusterLabels(spark, TestSpark.sfDir, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val lo = graft.ops.Dedup.dupClusterLabels(spark, TestSpark.sfDir, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // nesting: the cap-16 pair set is a subset of cap-64's, so every
    // cap-16 cluster maps into exactly ONE cap-64 cluster
    assert(lo.keySet.subsetOf(hi.keySet), "cap-16 labels docs cap-64 misses")
    lo.groupBy(_._2).foreach { case (c16, members) =>
      val parents = members.keys.map(hi).toSet
      assert(parents.size == 1, s"cap-16 cluster $c16 spans cap-64 clusters $parents")
    }
    // rollup recompute
    val expected = hi.groupBy(_._2).map { case (c64, members) =>
      val groups = members.keys.map(d => lo.getOrElse(d, d)).toSet
      c64 -> (members.size.toLong, groups.size.toLong, groups.size > 1)
    }
    assert(got == expected)
  }

  test("d42 syndication: rollup recomputed from the label table; kept_source is the label's") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = SparkEntry.queries("d42_syndication")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3),
        r.getBoolean(4)))
      .toMap
    val src = spark.read.parquet(TestSpark.sfDir + "/documents.parquet")
      .selectExpr("doc_id", "source").as[(Long, String)].collect().toMap
    val labels = graft.ops.Dedup.dupClusterLabels(spark, TestSpark.sfDir, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = labels.groupBy(_._2).collect {
      case (cl, g) if g.length >= 2 =>
        val members = g.map(_._1)
        cl -> (members.length.toLong, members.map(src).distinct.length.toLong,
          src(members.min), members.map(src).distinct.length >= 2)
    }
    assert(got == expected)
    // the kept representative IS the cluster label (member minimum),
    // so kept_source must be the label doc's own source
    got.foreach { case (cl, (_, _, ks, _)) => assert(ks == src(cl), s"cluster $cl") }
  }

  test("t53 MATTR: windows recomputed driver-side; short docs excluded; bounds hold") {
    val spark = TestSpark.spark
    val got = SparkEntry.queries("t53_mattr")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val docs = spark.read.parquet(TestSpark.sfDir + "/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.flatMap { case (id, text) =>
      val t = text.split("\\s+")
      val wins = t.grouped(50).filter(_.length == 50).toSeq
      if (wins.isEmpty) None
      else {
        val sd = wins.map(_.distinct.length.toLong).sum
        Some(id -> ((wins.length.toLong, sd,
          sd.toDouble / (wins.length * 50L).toDouble)))
      }
    }.toMap
    assert(got == expected)
    // docs shorter than one full window are absent by definition
    val short = docs.filter(_._2.split("\\s+").length < 50).map(_._1)
    short.foreach(id => assert(!got.contains(id), s"short doc $id reported"))
    got.values.foreach { case (_, _, m) => assert(m > 0.0 && m <= 1.0) }
  }

  test("t52 chi-square: statistic recomputed driver-side; marginals conserve; df correct") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = SparkEntry.queries("t52_lang_source_chi2")(spark, TestSpark.sfDir)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    val docs = spark.read.parquet(TestSpark.sfDir + "/documents.parquet")
      .selectExpr("lang", "source").as[(String, String)].collect()
    val cells = docs.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val rm = docs.groupBy(_._1).map { case (l, g) => l -> g.length.toLong }
    val cm = docs.groupBy(_._2).map { case (sr, g) => sr -> g.length.toLong }
    val n = docs.length.toLong
    assert(r.getLong(0) == n && r.getLong(1) == rm.size.toLong &&
      r.getLong(2) == cm.size.toLong && r.getLong(3) == cells.size.toLong)
    // same algebraized terms, same (lang, source) fold order
    val chi2 = cells.toSeq.sortBy(_._1).foldLeft(0.0) {
      case (acc, ((l, sr), o)) =>
        val d = n * o - rm(l) * cm(sr)
        acc + (d * d).toDouble / (n * rm(l) * cm(sr)).toDouble
    }
    assert(java.lang.Double.doubleToLongBits(r.getDouble(4)) ==
      java.lang.Double.doubleToLongBits(chi2))
    assert(r.getLong(5) == (rm.size.toLong - 1) * (cm.size.toLong - 1))
    assert(chi2 >= 0.0)
  }

  test("t51 Gopher rules: dup-n-gram chars recomputed driver-side, verdict cross-multiplied") {
    val spark = TestSpark.spark
    val rows = SparkEntry.queries("t51_gopher_rules")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8), r.getBoolean(9)))
      .toMap
    val docs = spark.read.parquet(TestSpark.sfDir + "/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.size == docs.size)
    docs.foreach { case (id, text) =>
      val t = text.split("\\s+")
      val totalChars = t.map(_.length.toLong).sum + t.length - 1L
      def dupChars(n: Int): Long =
        t.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
          .groupBy(identity).valuesIterator
          .collect { case g if g.size >= 2 => g.size.toLong * g.head.length }
          .sum
      val (nTok, tc, d2, d3, d4, f2, f3, f4, ok) = rows(id)
      assert(nTok == t.length.toLong && tc == totalChars, s"doc $id totals")
      assert(d2 == dupChars(2) && d3 == dupChars(3) && d4 == dupChars(4),
        s"doc $id dup chars")
      // fractions are the same single IEEE divide the engine ran
      assert(f2 == d2.toDouble / tc.toDouble && f3 == d3.toDouble / tc.toDouble &&
        f4 == d4.toDouble / tc.toDouble, s"doc $id fracs")
      assert(ok == (d2 * 5 <= tc && d3 * 50 <= tc * 9 && d4 * 25 <= tc * 4),
        s"doc $id verdict")
    }
    // the rule set must discriminate on this corpus (tiny template
    // vocabulary → many repeated phrases): both verdicts appear
    val verdicts = rows.values.map(_._9).toSet
    assert(verdicts == Set(true, false), s"verdicts $verdicts")
  }
}
