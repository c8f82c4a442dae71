package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CorpusIndexes

/** The DURABLE sidecar layer: `CorpusIndexes.persistSidecars` writes
  * the session sidecars (shingle/token/band/aHash/labels/IVF/PQ) as
  * bucketed parquet tables under a caller-given root, and any session
  * pointed at that root via `graft.sidecar.dir` serves every consumer
  * from disk instead of rebuilding. Asserted here:
  *
  *  - RESULT IDENTITY: the four sidecar-heaviest registered queries
  *    (d04 shingles, t11 shingles+labels, m12 aHash+image labels, s08
  *    IVF+PQ) return row-identical results from the disk form and the
  *    session form — the spec the round-12 verdict names.
  *  - The disk path is REALLY exercised (the reading session's plans
  *    scan the sidecar root; the catalog holds the registered tables).
  *  - BUCKETED LAYOUT: an equality filter on the bucket column prunes
  *    to 1 of 8 buckets, and a bucket-column aggregate runs with zero
  *    exchanges (the BucketingSpec discipline on the persisted index).
  *  - SNAPSHOT GUARD: a root whose `_graft_source` marker names a
  *    different corpus dir is ignored — consumers silently rebuild.
  *  - The streaming probe-index round-trip: the three probe tables
  *    reloaded from disk give bit-identical multi-signal verdicts.
  */
class SidecarDiskSpec extends AnyFunSuite {

  private val keys = Seq("d04_shingle_jaccard", "t11_training_selection",
    "m12_image_dedup_report", "s08_knn_ivfpq")

  private lazy val root: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sidecars").toString
    CorpusIndexes.persistSidecars(TestSpark.spark, TestSpark.sfDir, dir)
    dir
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString)

  private def diskSession(): SparkSession = {
    val s2 = TestSpark.spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set(CorpusIndexes.SidecarDirKey, root)
    s2
  }

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(scans)
  }

  private def shuffles(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
    case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
    case q: QueryStageExec => shuffles(q.plan)
    case _: ReusedExchangeExec => Seq.empty
    case s: ShuffleExchangeLike => s +: s.children.flatMap(shuffles)
    case other => other.children.flatMap(shuffles)
  }

  test("disk-sidecar results are identical to session-sidecar results (d04/t11/m12/s08)") {
    val base = TestSpark.spark
    val s2 = diskSession()
    keys.foreach { q =>
      val expect = rows(SparkEntry.queries(q)(base, TestSpark.sfDir))
      val disk = SparkEntry.queries(q)(s2, TestSpark.sfDir)
      assert(rows(disk) == expect, s"$q: disk form diverged from session form")
    }
    // the disk path was really taken: the registered tables exist and
    // a consumer plan scans files under the sidecar root
    assert(s2.catalog.tableExists(CorpusIndexes.tableName(root, "shingles")))
    val sh = graft.ops.Dedup.shingleJaccardPairs(s2, TestSpark.sfDir)
    sh.collect()
    val scanned = scans(sh.queryExecution.executedPlan)
      .flatMap(_.relation.location.rootPaths.map(_.toString))
    assert(scanned.exists(_.contains(root)),
      s"expected a scan under $root, got $scanned")
  }

  test("persisted sidecars are bucketed: filter prunes to one bucket, bucket-key aggregate has zero exchanges") {
    val s2 = diskSession()
    s2.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val sh = CorpusIndexes.readSidecar(s2, root, "shingles")
      val someHash = sh.select("shash").head().getLong(0)
      val filtered = sh.filter(sh("shash") === someHash)
      filtered.collect()
      val sc = scans(filtered.queryExecution.executedPlan)
      assert(sc.nonEmpty)
      assert(sc.head.metadata.get("SelectedBucketsCount").exists(_.contains("1 out of 8")),
        s"bucket pruning missing: ${sc.head.metadata.get("SelectedBucketsCount")}")
      val agg = sh.groupBy("shash").count()
      agg.collect()
      assert(shuffles(agg.queryExecution.executedPlan).isEmpty,
        "bucket-column aggregate should not exchange")
    } finally s2.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
  }

  test("a sidecar root written for a different corpus dir is ignored") {
    val s2 = TestSpark.spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set(CorpusIndexes.SidecarDirKey, root)
    // same root, different data dir: the marker names sf0.001, so a
    // query over another dir must rebuild in-session — and stay right
    val otherDir = java.nio.file.Files.createTempDirectory("graft-otherdocs").toString
    import s2.implicits._
    Seq((0L, "alpha beta gamma delta epsilon zeta"),
        (1L, "alpha beta gamma delta epsilon zeta"),
        (2L, "totally different words here now yes"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$otherDir/documents.parquet")
    val pairs = graft.ops.Dedup.shingleJaccardPairs(s2, otherDir)
    pairs.collect()
    val scanned = scans(pairs.queryExecution.executedPlan)
      .flatMap(_.relation.location.rootPaths.map(_.toString))
    assert(!scanned.exists(_.contains(root)),
      "mismatched-source sidecar must not be read")
  }

  test("StreamingDedup run against the disk index equals the batch answer") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val docs = Tables.documents(spark, TestSpark.sfDir).select($"doc_id", $"text")
    val hist = docs.filter($"doc_id" % 5 =!= 0)
    val newDocs = docs.filter($"doc_id" % 5 === 0)
      .as[(Long, String)].collect().sortBy(_._1)
    val idxDir = java.nio.file.Files.createTempDirectory("graft-sd-idx").toString
    graft.ops.Dedup.persistTextProbeIndex(hist, idxDir)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sd-ckpt2").toString
    val out = java.nio.file.Files.createTempDirectory("graft-sd-out2").toString
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    // hist is NOT passed: the run must stand entirely on the disk index
    val q = graft.streaming.StreamingDedup.run(stream,
      hist = null, out, ckpt, indexDir = Some(idxDir))
    try {
      input.addData(newDocs.take(newDocs.length / 2).toSeq)
      q.processAllAvailable()
      input.addData(newDocs.drop(newDocs.length / 2).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out).drop("batch_id")
    val batchRun = graft.ops.Dedup.incrementalDedupMulti(spark, TestSpark.sfDir)
    assert(streamed.count() == batchRun.count())
    assert(streamed.except(batchRun).count() == 0)
    assert(batchRun.except(streamed).count() == 0)
  }

  test("incremental probe-index refresh equals a from-scratch rebuild, including a cap crossing") {
    val s = TestSpark.spark
    import s.implicits._
    val docs = Tables.documents(s, TestSpark.sfDir).select($"doc_id", $"text")
    val hist = docs.filter($"doc_id" % 5 =!= 0)
    val batch = docs.filter($"doc_id" % 5 === 0)
    // day 1: two thirds of the history; day 2: the rest arrives
    val day1 = hist.filter($"doc_id" % 3 =!= 0)
    val day2 = hist.filter($"doc_id" % 3 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-probe-inc").toString
    graft.ops.Dedup.persistTextProbeIndex(day1, dir)
    graft.ops.Dedup.refreshTextProbeIndex(day2, dir)
    val refreshed = graft.ops.Dedup.loadTextProbeIndex(s, dir)
    val scratch = graft.ops.Dedup.buildTextProbeIndex(hist)
    val a = rows(graft.ops.Dedup.multiSignalProbeIndexed(batch, refreshed)
      .orderBy($"doc_id"))
    val b = rows(graft.ops.Dedup.multiSignalProbeIndexed(batch, scratch)
      .orderBy($"doc_id"))
    assert(a == b && a.nonEmpty,
      "refreshed index must probe identically to a from-scratch rebuild")

    // cap crossing: 40 identical docs fit under the cap; 30 more
    // identical arrivals push the shared band keys over 64 — the
    // refreshed load must drop them exactly like a scratch build
    val mk = (ids: Range) => ids.map(i =>
      (i.toLong, "the same boilerplate sentence repeated for the cap test"))
      .toDF("doc_id", "text")
    val dir2 = java.nio.file.Files.createTempDirectory("graft-probe-cap").toString
    graft.ops.Dedup.persistTextProbeIndex(mk(0 until 40), dir2)
    val before = graft.ops.Dedup.loadTextProbeIndex(s, dir2)
    assert(before.cappedBands.count() > 0, "under the cap: bands kept")
    graft.ops.Dedup.refreshTextProbeIndex(mk(40 until 70), dir2)
    val after = graft.ops.Dedup.loadTextProbeIndex(s, dir2)
    assert(after.cappedBands.count() == 0,
      "over the cap after the delta: every shared band key must drop")
    assert(after.md5s.count() == 70, "md5 store keeps appending")
  }

  test("probe-index compaction: one file per bucket again, verdicts bit-identical") {
    val s = TestSpark.spark
    import s.implicits._
    val docs = Tables.documents(s, TestSpark.sfDir).select($"doc_id", $"text")
    val hist = docs.filter($"doc_id" % 5 =!= 0)
    val batch = docs.filter($"doc_id" % 5 === 0)
    val day1 = hist.filter($"doc_id" % 3 === 1)
    val day2 = hist.filter($"doc_id" % 3 === 2)
    val day3 = hist.filter($"doc_id" % 3 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-probe-compact").toString
    graft.ops.Dedup.persistTextProbeIndex(day1, dir)
    graft.ops.Dedup.refreshTextProbeIndex(day2, dir)
    graft.ops.Dedup.refreshTextProbeIndex(day3, dir)

    def bucketFiles(key: String): Int =
      new java.io.File(s"$dir/$key").listFiles()
        .count(f => f.getName.startsWith("part-"))

    // three append generations: more than one file per bucket
    assert(bucketFiles("probe_raw_bands") > 8,
      "fixture must accumulate multiple files per bucket before compaction")
    val before = graft.ops.Dedup.loadTextProbeIndex(s, dir)
    val beforeVerdicts = rows(
      graft.ops.Dedup.multiSignalProbeIndexed(batch, before).orderBy($"doc_id"))
    val beforeBands = before.cappedBands.count()

    graft.ops.Dedup.compactTextProbeIndex(s, dir)

    Seq("probe_md5s", "probe_raw_bands", "probe_sim_bands").foreach { key =>
      assert(bucketFiles(key) == 8,
        s"$key: compaction must restore one file per bucket")
    }
    val after = graft.ops.Dedup.loadTextProbeIndex(s, dir)
    assert(after.cappedBands.count() == beforeBands)
    val afterVerdicts = rows(
      graft.ops.Dedup.multiSignalProbeIndexed(batch, after).orderBy($"doc_id"))
    assert(afterVerdicts == beforeVerdicts && afterVerdicts.nonEmpty,
      "compaction must not change a single probe verdict")
  }

  test("streaming probe index round-trips through disk with identical verdicts") {
    val s = TestSpark.spark
    import s.implicits._
    val docs = Tables.documents(s, TestSpark.sfDir).select($"doc_id", $"text")
    val hist = docs.filter($"doc_id" % 5 =!= 0)
    val batch = docs.filter($"doc_id" % 5 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-probeidx").toString
    graft.ops.Dedup.persistTextProbeIndex(hist, dir)
    val built = graft.ops.Dedup.buildTextProbeIndex(hist)
    val loaded = graft.ops.Dedup.loadTextProbeIndex(s, dir)
    val a = rows(graft.ops.Dedup.multiSignalProbeIndexed(batch, built)
      .orderBy($"doc_id"))
    val b = rows(graft.ops.Dedup.multiSignalProbeIndexed(batch, loaded)
      .orderBy($"doc_id"))
    assert(a == b, "disk probe index diverged from built probe index")
    assert(a.nonEmpty)
  }

  test("probe-index lifecycle: refresh and compact interleave without drift") {
    val s = TestSpark.spark
    import s.implicits._
    val docs = Tables.documents(s, TestSpark.sfDir).select($"doc_id", $"text")
    val hist = docs.filter($"doc_id" % 5 =!= 0)
    val batch = docs.filter($"doc_id" % 5 === 0)
    val days = (0 to 3).map(k => hist.filter($"doc_id" % 4 === k))
    val dir = java.nio.file.Files.createTempDirectory("graft-probe-life").toString
    // day 0 snapshot, then: refresh, compact, refresh, compact —
    // the cadence a quarter of daily crawls actually runs
    graft.ops.Dedup.persistTextProbeIndex(days(0), dir)
    graft.ops.Dedup.refreshTextProbeIndex(days(1), dir)
    graft.ops.Dedup.compactTextProbeIndex(s, dir)
    graft.ops.Dedup.refreshTextProbeIndex(days(2), dir)
    graft.ops.Dedup.compactTextProbeIndex(s, dir)
    graft.ops.Dedup.refreshTextProbeIndex(days(3), dir)
    val lived = rows(graft.ops.Dedup.multiSignalProbeIndexed(batch,
      graft.ops.Dedup.loadTextProbeIndex(s, dir)).orderBy($"doc_id"))
    val scratch = rows(graft.ops.Dedup.multiSignalProbeIndexed(batch,
      graft.ops.Dedup.buildTextProbeIndex(hist)).orderBy($"doc_id"))
    assert(lived == scratch && lived.nonEmpty,
      "interleaved refresh/compact must equal a from-scratch build")
  }

  test("text probe index deletes: masked serving equals rebuild-minus-deleted; compaction folds physically; re-add guarded until the fold") {
    val s = TestSpark.spark
    import s.implicits._
    import org.apache.spark.sql.functions.lit
    import graft.ops.Dedup
    val docs = Tables.documents(s, TestSpark.sfDir).select($"doc_id", $"text")
    val hist = docs.filter($"doc_id" % 5 =!= 0).localCheckpoint()
    val batch = docs.filter($"doc_id" % 5 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-probe-del").toString
    Dedup.persistTextProbeIndex(hist, dir)
    def serve(idx: Dedup.TextProbeIndex) =
      rows(Dedup.multiSignalProbeIndexed(batch, idx).orderBy($"doc_id"))
    val before = serve(Dedup.loadTextProbeIndex(s, dir))

    // Take down EMITTED match carriers (half of them) — deleting an id
    // that some verdict's best_match names guarantees the takedown is
    // observable, the exact phantom-veto the delete log exists to end.
    val matched = Dedup.multiSignalProbeIndexed(batch, Dedup.loadTextProbeIndex(s, dir))
      .filter($"best_match".isNotNull).select($"best_match".as("doc_id"))
      .distinct().as[Long].collect().sorted
    assert(matched.nonEmpty, "fixture must emit matches")
    val deadIds = matched.zipWithIndex.collect { case (id, i) if i % 2 == 0 => id }
    val dead = deadIds.toSeq.toDF("doc_id")
    // two waves: the log APPENDS like the index it shadows
    val mid = deadIds(deadIds.length / 2)
    Dedup.deleteFromTextProbeIndex(dead.filter($"doc_id" < mid), dir)
    Dedup.deleteFromTextProbeIndex(dead.filter($"doc_id" >= mid), dir)

    // (a) masked serving == probing a rebuild WITHOUT the deleted docs,
    // bit for bit — including any band the deletions pull back under
    // the df cap (the cap re-derives over masked rows).
    val after = serve(Dedup.loadTextProbeIndex(s, dir))
    assert(after == serve(Dedup.buildTextProbeIndex(
      hist.join(dead, Seq("doc_id"), "left_anti"))))
    assert(after != before, "deleted carrier never served — fixture too weak")

    // (b) a tombstoned doc cannot re-enter through refresh until the
    // log folds — the serving mask would strand it forever...
    val deadOne = hist.filter($"doc_id" === deadIds.head).localCheckpoint()
    intercept[IllegalArgumentException] {
      Dedup.refreshTextProbeIndex(deadOne, dir)
    }
    // ...but a fresh arrival appends fine with the log live.
    Dedup.refreshTextProbeIndex(
      deadOne.select(lit(1000001L).as("doc_id"), $"text"), dir)
    val served2 = serve(Dedup.loadTextProbeIndex(s, dir))

    // (c) compaction folds the log into ALL THREE tables: the log is
    // cleared, rows physically absent, serving bit-identical.
    Dedup.compactTextProbeIndex(s, dir)
    assert(Dedup.loadTextProbeTombstones(s, dir)
      .map(_.count()).getOrElse(0L) == 0L,
      "compaction must clear every folded tombstone (only rows appended " +
        "after the fold's snapshot may survive)")
    Seq("probe_md5s", "probe_raw_bands", "probe_sim_bands").foreach { key =>
      val kept = s.read.parquet(s"$dir/$key").select($"hist_doc").as[Long]
        .collect().toSet
      assert(kept.intersect(deadIds.toSet).isEmpty,
        s"$key keeps tombstoned rows after the fold")
      assert(kept.contains(1000001L) || key != "probe_md5s",
        s"$key lost the live refresh row")
    }
    assert(serve(Dedup.loadTextProbeIndex(s, dir)) == served2,
      "folding the delete log must not change a single probe verdict")

    // (d) after the fold the id is free again — the re-add rejected in
    // (b) now lands and serves.
    Dedup.refreshTextProbeIndex(deadOne, dir)
    assert(Dedup.loadTextProbeIndex(s, dir).md5s
      .filter($"hist_doc" === deadIds.head).count() == 1)

    // (e) the emptied log REGENERATES cleanly: a new delete wave after
    // the fold starts a fresh log generation, masks immediately, and
    // folds again (the empty-table read/append edge).
    Dedup.deleteFromTextProbeIndex(Seq(deadIds.head).toDF("doc_id"), dir)
    assert(Dedup.loadTextProbeIndex(s, dir).md5s
      .filter($"hist_doc" === deadIds.head).count() == 0,
      "a post-fold delete must mask immediately")
    Dedup.compactTextProbeIndex(s, dir)
    assert(Dedup.loadTextProbeTombstones(s, dir)
      .map(_.count()).getOrElse(0L) == 0L)
    assert(s.read.parquet(s"$dir/probe_md5s")
      .filter($"hist_doc" === deadIds.head).count() == 0,
      "the second fold must physically remove the re-deleted doc")
  }

  test("StreamingDedup honors a takedown between triggers without restart") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.ops.Dedup
    val docs = Tables.documents(spark, TestSpark.sfDir).select($"doc_id", $"text")
    val hist = docs.filter($"doc_id" % 5 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-probe-del-live").toString
    Dedup.persistTextProbeIndex(hist, dir)
    val probeSlice = docs.filter($"doc_id" % 5 === 0)
      .as[(Long, String)].collect().sortBy(_._1)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pdl-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-pdl-out").toString
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val q = graft.streaming.StreamingDedup.run(stream, hist = null, out, ckpt,
      indexDir = Some(dir))
    try {
      input.addData(probeSlice.toSeq)
      q.processAllAvailable()
      val b0 = spark.read.parquet(s"$out/batch_id=0")
      val carriers = b0.filter($"best_match".isNotNull)
        .select($"best_match").distinct().as[Long].collect()
      assert(carriers.nonEmpty, "fixture must emit matches in batch 0")
      // takedown lands BETWEEN triggers — no restart
      Dedup.deleteFromTextProbeIndex(carriers.toSeq.toDF("doc_id"), dir)
      input.addData(probeSlice.toSeq) // the SAME docs re-probe
      q.processAllAvailable()
      val b1 = spark.read.parquet(s"$out/batch_id=1")
      val still = b1.filter($"best_match".isin(carriers.toSeq: _*)).count()
      assert(still == 0,
        s"$still verdict(s) still name a taken-down carrier after the delete")
      // and the next batch equals a batch probe of the masked index
      val expect = Dedup.multiSignalProbeIndexed(
        probeSlice.toSeq.toDF("doc_id", "text"),
        Dedup.loadTextProbeIndex(spark, dir))
      assert(b1.count() == expect.count())
      assert(b1.except(expect).count() == 0 && expect.except(b1).count() == 0)
    } finally q.stop()
  }

  test("image index deletes: masked serving equals rebuild-minus-deleted; fold at compaction; re-add guarded") {
    val s = TestSpark.spark
    import s.implicits._
    import graft.ops.Multimodal
    val pngs = Multimodal.pngTable(s, TestSpark.sfDir)
    val hist = pngs.filter($"doc_id" % 5 =!= 0)
    val batch = pngs.filter($"doc_id" % 5 === 0).toDF()
    val dir = java.nio.file.Files.createTempDirectory("graft-iidx-del").toString
    Multimodal.persistImageIndex(hist, dir)
    def idx(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"ahash_hi", $"ahash_lo")
    def serve() = rows(Multimodal.imageProbeBatch(batch,
      idx(Multimodal.loadImageIndex(s, dir))).orderBy($"doc_id"))
    val before = serve()
    // take down the emitted dup carriers (every one observable)
    val carriers = Multimodal.imageProbeBatch(batch,
        idx(Multimodal.loadImageIndex(s, dir)))
      .filter($"dup_of".isNotNull).select($"dup_of".as("doc_id")).distinct()
      .localCheckpoint()
    assert(carriers.count() > 0, "fixture must emit image dups")
    Multimodal.deleteFromImageIndex(carriers, dir)
    val after = serve()
    assert(after != before, "takedown never served — fixture too weak")
    // masked serving == rebuild minus deleted: the raw rows minus the
    // log probe identically (hash rows are per-image, so the rebuild
    // IS the anti-joined table)
    val rebuilt = rows(Multimodal.imageProbeBatch(batch,
      idx(s.read.parquet(s"$dir/png_ahash")
        .join(carriers, Seq("doc_id"), "left_anti"))).orderBy($"doc_id"))
    assert(after == rebuilt)
    // re-add guard until the fold
    val deadOne = hist.filter($"doc_id".isin(
      carriers.as[Long].collect().toSeq: _*)).limit(1)
    intercept[IllegalArgumentException] {
      Multimodal.refreshImageIndex(deadOne.as[Multimodal.PngRow], dir)
    }
    // fold: log cleared, rows physically absent, serving unchanged
    Multimodal.compactImageIndex(s, dir)
    assert(Multimodal.loadImageTombstones(s, dir)
      .map(_.count()).getOrElse(0L) == 0L,
      "compaction must clear every folded image tombstone")
    val deadIds = carriers.as[Long].collect().toSet
    assert(s.read.parquet(s"$dir/png_ahash").select($"doc_id").as[Long]
      .collect().toSet.intersect(deadIds).isEmpty)
    assert(serve() == after,
      "folding the image delete log must not change a single verdict")
    // after the fold the id is free again
    Multimodal.refreshImageIndex(deadOne.as[Multimodal.PngRow], dir)
    val readded = deadOne.select($"doc_id").as[Long].head()
    assert(Multimodal.loadImageIndex(s, dir)
      .filter($"doc_id" === readded).count() == 1)
  }

  test("an index EMPTIED by takedown stays maintainable and readable (the TombLog property's crash)") {
    // Found by TombLogPropertySpec (seed hotP0i4VEo6…): delete EVERY
    // id, fold, then run maintenance again. The fold leaves a
    // generation with ZERO part files (the bucketed writer emits none
    // for zero rows), and compactBucketedTable's plain parquet read
    // died on footer inference — a takedown wave that empties a small
    // index bricked all later maintenance. Pinned here
    // deterministically: the second compact no-ops, the delete→fold
    // cycle keeps working on the empty generation, a fresh catalog
    // (new session) reads the empty generation via the schema marker,
    // and a re-add restores service.
    val s = TestSpark.spark
    import s.implicits._
    import graft.ops.{CorpusIndexes, Multimodal}
    val ids = (0L until 8L)
    def media(sel: Seq[Long]) =
      sel.sorted.map(id => (id, Multimodal.PngCodec.encode(id)))
        .toDF("doc_id", "payload").as[Multimodal.PngRow]
    val dir = java.nio.file.Files.createTempDirectory("graft-iidx-empty").toString
    Multimodal.persistImageIndex(media(ids), dir)
    Multimodal.deleteFromImageIndex(ids.toDF("doc_id"), dir)
    assert(Multimodal.loadImageIndex(s, dir).count() == 0L, "all masked")
    Multimodal.compactImageIndex(s, dir) // folds: zero part files remain
    Multimodal.compactImageIndex(s, dir) // the crash site: must no-op
    assert(Multimodal.loadImageIndex(s, dir).count() == 0L)
    // the delete→fold cycle still works against the empty generation
    Multimodal.deleteFromImageIndex(ids.toDF("doc_id"), dir)
    intercept[IllegalArgumentException] {
      Multimodal.refreshImageIndex(media(ids.take(2)), dir)
    }
    Multimodal.compactImageIndex(s, dir)
    // a FRESH session has no catalog entry: drop it and prove the
    // empty generation is still readable (schema marker, not footer)
    s.sql(s"DROP TABLE IF EXISTS " +
      CorpusIndexes.tableName(dir, "png_ahash"))
    assert(Multimodal.loadImageIndex(s, dir).count() == 0L)
    assert(Multimodal.loadImageIndex(s, dir).columns.contains("ahash_hi"),
      "the marker must reproduce the real schema, not a stub")
    // service restores on re-add
    Multimodal.refreshImageIndex(media(ids.take(3)), dir)
    assert(Multimodal.loadImageIndex(s, dir).select($"doc_id").as[Long]
      .collect().toSet == ids.take(3).toSet)
  }

  test("video and audio index deletes: masked serving equals rebuild-minus-deleted; fold at compaction; re-add guarded") {
    val s = TestSpark.spark
    import s.implicits._
    import graft.ops.Multimodal
    // ---- video: frames mask BEFORE the earliest-carrier aggregate
    val gifs = Multimodal.gifTable(s, TestSpark.sfDir)
    val vHist = gifs.filter($"doc_id" % 5 =!= 0)
    val vBatch = gifs.filter($"doc_id" % 5 === 0).toDF()
    val vDir = java.nio.file.Files.createTempDirectory("graft-vidx-del").toString
    Multimodal.persistVideoIndex(vHist, vDir)
    def vServe() = rows(Multimodal.videoProbeBatch(vBatch,
      Multimodal.loadVideoFrameIndex(s, vDir)).orderBy($"doc_id"))
    val vBefore = vServe()
    val vCarriers = Multimodal.videoProbeBatch(vBatch,
        Multimodal.loadVideoFrameIndex(s, vDir))
      .filter($"first_hist".isNotNull).select($"first_hist".as("doc_id"))
      .distinct().localCheckpoint()
    assert(vCarriers.count() > 0, "fixture must emit video carriers")
    Multimodal.deleteFromVideoIndex(vCarriers, vDir)
    val vAfter = vServe()
    assert(vAfter != vBefore, "video takedown never served")
    val vRebuilt = rows(Multimodal.videoProbeBatch(vBatch,
      Multimodal.frameIndexOf(s.read.parquet(s"$vDir/gif_frames")
        .join(vCarriers, Seq("doc_id"), "left_anti"))).orderBy($"doc_id"))
    assert(vAfter == vRebuilt,
      "masked video serving must equal rebuild-minus-deleted")
    val vDeadIds = vCarriers.as[Long].collect().toSet
    val vDeadOne = vHist.filter($"doc_id" === vDeadIds.head)
    intercept[IllegalArgumentException] {
      Multimodal.refreshVideoIndex(vDeadOne, vDir)
    }
    Multimodal.compactVideoIndex(s, vDir)
    assert(Multimodal.loadVideoTombstones(s, vDir)
      .map(_.count()).getOrElse(0L) == 0L)
    assert(s.read.parquet(s"$vDir/gif_frames").select($"doc_id").as[Long]
      .collect().toSet.intersect(vDeadIds).isEmpty,
      "folded video rows must be physically absent")
    assert(vServe() == vAfter, "video fold must not change a verdict")
    Multimodal.refreshVideoIndex(vDeadOne, vDir)
    assert(s.read.parquet(s"$vDir/gif_frames")
      .filter($"doc_id" === vDeadIds.head).count() > 0,
      "video re-add after the fold must land")

    // ---- audio: the nearest-neighbor serving path
    val wavs = Multimodal.wavTable(s, TestSpark.sfDir)
    val aHist = wavs.filter($"doc_id" % 5 =!= 0)
    val aBatch = wavs.filter($"doc_id" % 5 === 0).toDF()
    val aDir = java.nio.file.Files.createTempDirectory("graft-aidx-del").toString
    Multimodal.persistAudioIndex(aHist, aDir)
    def aServe() = rows(Multimodal.audioProbeBatch(aBatch,
      Multimodal.loadAudioIndex(s, aDir)).orderBy($"doc_id"))
    val aBefore = aServe()
    val aCarriers = Multimodal.audioProbeBatch(aBatch,
        Multimodal.loadAudioIndex(s, aDir))
      .filter($"nn_id".isNotNull).select($"nn_id".as("doc_id"))
      .distinct().localCheckpoint()
    assert(aCarriers.count() > 0, "fixture must emit audio neighbors")
    Multimodal.deleteFromAudioIndex(aCarriers, aDir)
    val aAfter = aServe()
    assert(aAfter != aBefore, "audio takedown never served")
    val aRebuilt = rows(Multimodal.audioProbeBatch(aBatch,
      s.read.parquet(s"$aDir/wav_fp")
        .join(aCarriers, Seq("doc_id"), "left_anti")).orderBy($"doc_id"))
    assert(aAfter == aRebuilt,
      "masked audio serving must equal rebuild-minus-deleted")
    val aDeadIds = aCarriers.as[Long].collect().toSet
    val aDeadOne = aHist.filter($"doc_id" === aDeadIds.head)
    intercept[IllegalArgumentException] {
      Multimodal.refreshAudioIndex(aDeadOne, aDir)
    }
    Multimodal.compactAudioIndex(s, aDir)
    assert(Multimodal.loadAudioTombstones(s, aDir)
      .map(_.count()).getOrElse(0L) == 0L)
    assert(s.read.parquet(s"$aDir/wav_fp").select($"doc_id").as[Long]
      .collect().toSet.intersect(aDeadIds).isEmpty,
      "folded audio rows must be physically absent")
    assert(aServe() == aAfter, "audio fold must not change a verdict")
    Multimodal.refreshAudioIndex(aDeadOne, aDir)
    assert(s.read.parquet(s"$aDir/wav_fp")
      .filter($"doc_id" === aDeadIds.head).count() > 0,
      "audio re-add after the fold must land")
  }

  test("writeCuratedCorpus ships exactly the d27 survivors, partition-pruned by source") {
    val s = TestSpark.spark
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-curated").toString
    graft.ops.Dedup.writeCuratedCorpus(s, TestSpark.sfDir, out)
    val decision = graft.ops.Dedup.canonicalSelection(s, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val allIds = Tables.documents(s, TestSpark.sfDir)
      .select($"doc_id").as[Long].collect().toSet
    val expect = allIds.filter(id => decision.getOrElse(id, true))
    val shipped = s.read.parquet(out)
    assert(shipped.select($"doc_id").as[Long].collect().toSet == expect)
    assert(expect.size < allIds.size, "some documents must actually drop")
    // source partitioning really prunes: a one-source read scans a
    // strict subset of the files
    val one = s.read.parquet(out).filter($"source" === "src0")
    one.collect()
    val scanned = scans(one.queryExecution.executedPlan)
    assert(scanned.nonEmpty && scanned.forall(_.metadata("Location").contains(out)))
    val total = new java.io.File(out).listFiles().count(_.getName.startsWith("source="))
    assert(total > 1, "multiple source partitions must exist")
    assert(one.queryExecution.executedPlan.toString.contains("source=") ||
      scanned.exists(_.partitionFilters.nonEmpty),
      "the source predicate must reach the scan as a partition filter")
  }

  test("video frame sidecar serves m15/m17 from disk: identical results, scan under the root, no GIF decode") {
    val base = TestSpark.spark
    val s2 = diskSession()
    Seq("m15_video_frame_dedup", "m17_incremental_video").foreach { q =>
      val expect = rows(SparkEntry.queries(q)(base, TestSpark.sfDir))
      assert(rows(SparkEntry.queries(q)(s2, TestSpark.sfDir)) == expect,
        s"$q: disk form diverged from session form")
    }
    assert(s2.catalog.tableExists(CorpusIndexes.tableName(root, "gif_frames")))
    // the disk path is really taken AND no decode pass runs: the plan
    // scans gif_frames under the root and never touches documents
    // (the GIF encode source)
    val vd = graft.ops.Multimodal.videoFrameDedup(s2, TestSpark.sfDir)
    vd.collect()
    val scanned = scans(vd.queryExecution.executedPlan)
      .flatMap(_.relation.location.rootPaths.map(_.toString))
    assert(scanned.exists(_.contains(s"$root/gif_frames")),
      s"expected a gif_frames scan under $root, got $scanned")
    assert(!scanned.exists(_.contains("documents")),
      "disk-form video dedup must not re-read (and re-encode) the corpus")
  }

  test("patch sidecar serves m26/m28 from disk: identical results, scan under the root, no PNG decode") {
    val base = TestSpark.spark
    val s2 = diskSession()
    Seq("m26_vit_patches", "m28_repeated_patches").foreach { q =>
      val expect = rows(SparkEntry.queries(q)(base, TestSpark.sfDir))
      assert(rows(SparkEntry.queries(q)(s2, TestSpark.sfDir)) == expect,
        s"$q: disk form diverged from session form")
    }
    assert(s2.catalog.tableExists(CorpusIndexes.tableName(root, "png_patches")))
    // the disk path is really taken AND no decode runs: the m28 plan
    // scans png_patches under the root, never documents (the PNG
    // encode source), and its pkey aggregate needs no exchange before
    // the aggregate itself (bucketed on pkey)
    val rp = graft.ops.Multimodal.repeatedPatches(s2, TestSpark.sfDir)
    rp.collect()
    val scanned = scans(rp.queryExecution.executedPlan)
      .flatMap(_.relation.location.rootPaths.map(_.toString))
    assert(scanned.exists(_.contains(s"$root/png_patches")),
      s"expected a png_patches scan under $root, got $scanned")
    assert(!scanned.exists(_.contains("documents")),
      "disk-form patch audit must not re-read (and re-decode) the corpus")
  }

  test("StreamingVideoDedup run from a durable index dir equals batch m17 with no run-start decode") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.ops.Multimodal
    val idxDir = java.nio.file.Files.createTempDirectory("graft-vidx").toString
    Multimodal.persistVideoIndex(
      Multimodal.gifTable(spark, TestSpark.sfDir).filter($"doc_id" % 5 =!= 0),
      idxDir)
    val newRows = Tables.documents(spark, TestSpark.sfDir).select($"doc_id")
      .filter($"doc_id" % 5 === 0).as[Long].collect().sorted
      .map(id => (id, Multimodal.GifCodec.encode(id)))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-vidx-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-vidx-out").toString
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Byte])]
    val stream = input.toDF().toDF("doc_id", "payload")
    // index is NOT passed: the run must stand entirely on the disk form
    val q = graft.streaming.StreamingVideoDedup.run(stream, index = null,
      out, ckpt, indexDir = Some(idxDir))
    try {
      input.addData(newRows.take(newRows.length / 2).toSeq)
      q.processAllAvailable()
      input.addData(newRows.drop(newRows.length / 2).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out).drop("batch_id")
    val batchRun = Multimodal.incrementalVideoDedup(spark, TestSpark.sfDir)
    assert(streamed.count() == batchRun.count())
    assert(streamed.except(batchRun).count() == 0)
    assert(batchRun.except(streamed).count() == 0)
  }

  test("StreamingImageDedup run from a durable index dir equals batch m13") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.ops.Multimodal
    val idxDir = java.nio.file.Files.createTempDirectory("graft-iidx").toString
    Multimodal.persistImageIndex(
      Multimodal.pngTable(spark, TestSpark.sfDir).filter($"doc_id" % 5 =!= 0),
      idxDir)
    val newRows = Tables.documents(spark, TestSpark.sfDir).select($"doc_id")
      .filter($"doc_id" % 5 === 0).as[Long].collect().sorted
      .map(id => (id, Multimodal.PngCodec.encode(id)))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-iidx-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-iidx-out").toString
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Byte])]
    val stream = input.toDF().toDF("doc_id", "payload")
    val q = graft.streaming.StreamingImageDedup.run(stream, index = null,
      out, ckpt, indexDir = Some(idxDir))
    try {
      input.addData(newRows.take(newRows.length / 2).toSeq)
      q.processAllAvailable()
      input.addData(newRows.drop(newRows.length / 2).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out).drop("batch_id")
    val batchRun = Multimodal.incrementalImageDedup(spark, TestSpark.sfDir)
    assert(streamed.count() == batchRun.count())
    assert(streamed.except(batchRun).count() == 0)
    assert(batchRun.except(streamed).count() == 0)
  }

  test("image index lifecycle: refresh equals from-scratch, compaction restores one file per bucket, verdicts identical") {
    val s = TestSpark.spark
    import s.implicits._
    import graft.ops.Multimodal
    val pngs = Multimodal.pngTable(s, TestSpark.sfDir)
    val hist = pngs.filter($"doc_id" % 5 =!= 0)
    val batch = pngs.filter($"doc_id" % 5 === 0).toDF()
    val dir = java.nio.file.Files.createTempDirectory("graft-iidx-life").toString
    // day 0 persist, then two refresh days — the text-probe cadence
    Multimodal.persistImageIndex(hist.filter($"doc_id" % 3 === 0), dir)
    Multimodal.refreshImageIndex(hist.filter($"doc_id" % 3 === 1), dir)
    Multimodal.refreshImageIndex(hist.filter($"doc_id" % 3 === 2), dir)
    def idx(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"ahash_hi", $"ahash_lo")
    val scratch = rows(Multimodal.imageProbeBatch(batch,
      idx(Multimodal.historicalAHashIndex(s, TestSpark.sfDir))).orderBy($"doc_id"))
    val refreshed = rows(Multimodal.imageProbeBatch(batch,
      idx(Multimodal.loadImageIndex(s, dir))).orderBy($"doc_id"))
    assert(refreshed == scratch && refreshed.nonEmpty,
      "refreshed image index must probe identically to the from-scratch sidecar")
    def files() = new java.io.File(s"$dir/png_ahash").listFiles()
      .count(_.getName.startsWith("part-"))
    assert(files() > 8, "three generations must leave more than one file per bucket")
    Multimodal.compactImageIndex(s, dir)
    assert(files() == 8, "compaction must restore one file per bucket")
    val compacted = rows(Multimodal.imageProbeBatch(batch,
      idx(Multimodal.loadImageIndex(s, dir))).orderBy($"doc_id"))
    assert(compacted == refreshed,
      "image index compaction must not change a single verdict")
  }

  test("video index lifecycle: refresh equals from-scratch, compaction restores one file per bucket, verdicts identical") {
    val s = TestSpark.spark
    import s.implicits._
    import graft.ops.Multimodal
    val gifs = Multimodal.gifTable(s, TestSpark.sfDir)
    val hist = gifs.filter($"doc_id" % 5 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-vidx-life").toString
    Multimodal.persistVideoIndex(hist.filter($"doc_id" % 3 === 0), dir)
    Multimodal.refreshVideoIndex(hist.filter($"doc_id" % 3 === 1), dir)
    Multimodal.refreshVideoIndex(hist.filter($"doc_id" % 3 === 2), dir)
    val newSlice = gifs.filter($"doc_id" % 5 === 0).toDF()
    val scratch = rows(Multimodal.incrementalVideoDedup(s, TestSpark.sfDir))
    val refreshed = rows(Multimodal.videoProbeBatch(newSlice,
      Multimodal.loadVideoFrameIndex(s, dir)).orderBy($"doc_id"))
    assert(refreshed == scratch && refreshed.nonEmpty,
      "refreshed video index must probe identically to the session sidecar")
    def files() = new java.io.File(s"$dir/gif_frames").listFiles()
      .count(_.getName.startsWith("part-"))
    assert(files() > 8, "three generations must leave more than one file per bucket")
    Multimodal.compactVideoIndex(s, dir)
    assert(files() == 8, "compaction must restore one file per bucket")
    val compacted = rows(Multimodal.videoProbeBatch(newSlice,
      Multimodal.loadVideoFrameIndex(s, dir)).orderBy($"doc_id"))
    assert(compacted == refreshed,
      "video index compaction must not change a single verdict")
  }

  test("audio fingerprint sidecar serves m14/m18 from disk: identical results, scan under the root, no WAV decode of the corpus") {
    val base = TestSpark.spark
    val s2 = diskSession()
    Seq("m14_audio_nn", "m18_incremental_audio").foreach { q =>
      val expect = rows(SparkEntry.queries(q)(base, TestSpark.sfDir))
      assert(rows(SparkEntry.queries(q)(s2, TestSpark.sfDir)) == expect,
        s"$q: disk form diverged from session form")
    }
    assert(s2.catalog.tableExists(CorpusIndexes.tableName(root, "wav_fp")))
    val ad = graft.ops.Multimodal.incrementalAudioDedup(s2, TestSpark.sfDir)
    ad.collect()
    val scanned = scans(ad.queryExecution.executedPlan)
      .flatMap(_.relation.location.rootPaths.map(_.toString))
    assert(scanned.exists(_.contains(s"$root/wav_fp")),
      s"expected a wav_fp scan under $root, got $scanned")
    assert(!scanned.exists(_.contains("documents")),
      "disk-form audio dedup must not re-read (and re-encode) the corpus")
  }

  test("audio index lifecycle: refresh equals from-scratch, compaction restores at most one file per bucket, verdicts identical") {
    val s = TestSpark.spark
    import s.implicits._
    import graft.ops.Multimodal
    val wavs = Multimodal.wavTable(s, TestSpark.sfDir)
    val hist = wavs.filter($"doc_id" % 5 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-aidx-life").toString
    Multimodal.persistAudioIndex(hist.filter($"doc_id" % 3 === 0), dir)
    Multimodal.refreshAudioIndex(hist.filter($"doc_id" % 3 === 1), dir)
    Multimodal.refreshAudioIndex(hist.filter($"doc_id" % 3 === 2), dir)
    val newSlice = wavs.filter($"doc_id" % 5 === 0).toDF()
    val scratch = rows(Multimodal.incrementalAudioDedup(s, TestSpark.sfDir))
    def probe() = rows(Multimodal.audioProbeBatch(newSlice,
      Multimodal.loadAudioIndex(s, dir)).orderBy($"doc_id"))
    val refreshed = probe()
    assert(refreshed == scratch && refreshed.nonEmpty,
      "refreshed audio index must probe identically to the session sidecar")
    def files() = new java.io.File(s"$dir/wav_fp").listFiles()
      .count(_.getName.startsWith("part-"))
    assert(files() > 8, "three generations must leave more than one file per bucket")
    Multimodal.compactAudioIndex(s, dir)
    // n_frames has only 7 distinct values over 8 buckets — an empty
    // hash bucket writes no file
    assert(files() <= 8, "compaction must restore at most one file per bucket")
    assert(probe() == refreshed,
      "audio index compaction must not change a single verdict")
  }

  test("IVF index upsert: serve-after-append equals serve-after-rebuild; retrained rebuild agrees on unaffected cells") {
    val s = TestSpark.spark
    import s.implicits._
    import graft.ops.Similarity
    val all = Similarity.normedVectors(s, TestSpark.sfDir)
    val hist = all.filter($"vec_id" % 7 =!= 2)
    val arrivals = Tables.embeddings(s, TestSpark.sfDir)
      .filter($"vec_id" % 7 === 2).select($"vec_id", $"embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-upsert").toString
    val histIdx = Similarity.assignByCodebook(hist, Similarity.codebookOf(hist))
    Similarity.persistIvfIndex(histIdx, dir)
    // TWO refreshes, and the FIRST one appends arrivals with
    // vec_id < 16 (vecs 2 and 9) — the codebook-pollution trap: the
    // second refresh must still assign over the FROZEN 14-cell
    // codebook, not a re-derivation that now sees 16 rows
    Similarity.refreshIvfIndex(arrivals.filter($"vec_id" < 250), dir)
    Similarity.refreshIvfIndex(arrivals.filter($"vec_id" >= 250), dir)
    // the persisted codebook is the historical one, bit for bit, and
    // is NOT polluted by the appended vec 2/9 rows
    assert(rows(Similarity.loadIvfCodebook(s, dir).orderBy($"cell_id")) ==
      rows(Similarity.codebookOf(hist).orderBy($"cell_id")))

    // (a) appended index == frozen-codebook rebuild over the union,
    // row for row (assignment depends only on the frozen codebook)
    val appended = Similarity.loadIvfIndex(s, dir)
      .select($"vec_id", $"cell_id")
    val frozenRebuild = Similarity.assignByCodebook(all, Similarity.codebookOf(hist))
      .select($"vec_id", $"cell_id")
    assert(appended.except(frozenRebuild).count() == 0)
    assert(frozenRebuild.except(appended).count() == 0)
    assert(appended.count() == all.count())

    // (b) the serve path sees [index ∪ delta]: probing the loaded
    // index equals probing the frozen rebuild, bit for bit
    val queries = Tables.embeddings(s, TestSpark.sfDir)
      .filter($"vec_id" % 13 === 1)
      .select($"vec_id".as("q_id"), $"embedding")
    val frozenCb = Similarity.codebookOf(hist).localCheckpoint()
    def serve(idx: org.apache.spark.sql.DataFrame) =
      rows(Similarity.ivfProbeBatch(queries, idx, excludeSelf = false,
        codebook = Some(frozenCb)).orderBy($"q_id", $"rank"))
    val servedAppend = serve(Similarity.loadIvfIndex(s, dir))
    assert(servedAppend == serve(frozenRebuild
      .join(all, "vec_id").select($"vec_id", $"embedding", $"nrm", $"cell_id")),
      "serving the appended index must equal serving a frozen-codebook rebuild")
    assert(servedAppend.nonEmpty)
    // EVERY query is served under the frozen codebook — with a
    // polluted (re-derived) codebook a query arg-maxed onto phantom
    // cell 2/9 would join no index row and silently vanish
    val nQueries = queries.count()
    assert(Similarity.ivfProbeBatch(queries, Similarity.loadIvfIndex(s, dir),
        excludeSelf = false, codebook = Some(Similarity.loadIvfCodebook(s, dir)))
      .select($"q_id").distinct().count() == nQueries,
      "a query vanished from serving — codebook not frozen")

    // (c) vs the RETRAINED full rebuild (16-cell codebook): for query
    // cells no retrained-vs-frozen assignment change touches, results
    // are identical
    val retrained = Similarity.ivfIndex(s, TestSpark.sfDir)
    val moved = Similarity.loadIvfIndex(s, dir).select($"vec_id", $"cell_id")
      .join(retrained.select($"vec_id", $"cell_id".as("r_cell")), "vec_id")
      .filter($"cell_id" =!= $"r_cell")
    val touched = moved.select($"cell_id").union(moved.select($"r_cell"))
      .distinct().as[Long].collect().toSet
    val fromAppend = Similarity.ivfProbeBatchWithCell(queries,
        Similarity.loadIvfIndex(s, dir), excludeSelf = false,
        codebook = Some(frozenCb))
      .filter(!$"q_cell".isin(touched.toSeq: _*)).drop("q_cell")
    val fromRetrain = Similarity.ivfProbeBatchWithCell(queries, retrained,
        excludeSelf = false)
      .filter(!$"q_cell".isin(touched.toSeq: _*)).drop("q_cell")
    assert(rows(fromAppend.orderBy($"q_id", $"rank")) ==
      rows(fromRetrain.orderBy($"q_id", $"rank")),
      "unaffected cells must serve identically under append and retrain")

    // compaction after the upsert: file count restored, serving unchanged
    def files() = new java.io.File(s"$dir/ivf_assigned").listFiles()
      .count(_.getName.startsWith("part-"))
    assert(files() > 8)
    Similarity.compactIvfIndex(s, dir)
    // at most one file per bucket — cell_id has only ~16 distinct
    // values, so a hash bucket can be empty and write no file
    assert(files() <= 8, "compaction must restore at most one file per bucket")
    assert(serve(Similarity.loadIvfIndex(s, dir)) == servedAppend,
      "compaction must not change a single served neighbor")
  }

  test("IVF index deletes: masked serving equals rebuild-minus-deleted; compaction folds physically; re-add guarded until the fold") {
    val s = TestSpark.spark
    import s.implicits._
    import graft.ops.Similarity
    val all = Similarity.normedVectors(s, TestSpark.sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-del").toString
    val idx0 = Similarity.assignByCodebook(all, Similarity.codebookOf(all))
      .localCheckpoint()
    Similarity.persistIvfIndex(idx0, dir)
    val cb = Similarity.loadIvfCodebook(s, dir).localCheckpoint()
    val queries = Tables.embeddings(s, TestSpark.sfDir)
      .filter($"vec_id" % 13 === 1)
      .select($"vec_id".as("q_id"), $"embedding")
    def serve(idx: org.apache.spark.sql.DataFrame) =
      rows(Similarity.ivfProbeBatch(queries, idx, excludeSelf = false,
        codebook = Some(cb)).orderBy($"q_id", $"rank"))
    val before = serve(Similarity.loadIvfIndexServing(s, dir))

    // Two delete waves (the log APPENDS like the index it shadows).
    val dead = all.filter($"vec_id" % 11 === 3)
    Similarity.deleteFromIvfIndex(
      dead.filter($"vec_id" < 250).select($"vec_id"), dir)
    Similarity.deleteFromIvfIndex(
      dead.filter($"vec_id" >= 250).select($"vec_id"), dir)

    // (a) masked serving == serving a rebuild WITHOUT the deleted rows,
    // bit for bit — and the deletes really changed some neighbor.
    val after = serve(Similarity.loadIvfIndexServing(s, dir))
    assert(after == serve(idx0.filter($"vec_id" % 11 =!= 3)))
    assert(after != before, "delete slice never served — fixture too weak")

    // (b) the streaming serve path masks too (empty delta root).
    val emptyDelta = java.nio.file.Files.createTempDirectory("graft-ivf-del-d").toString
    assert(serve(graft.streaming.StreamingAnnIngest.servingIndex(s, dir, emptyDelta))
      == after)

    // (c) a tombstoned id cannot come back through refresh until the
    // log folds — the mask would strand the re-added row forever.
    val deadOne = idx0.filter($"vec_id" % 11 === 3)
      .orderBy($"vec_id").limit(1).select($"vec_id", $"embedding")
      .localCheckpoint()
    intercept[IllegalArgumentException] {
      Similarity.refreshIvfIndex(deadOne, dir)
    }
    // ...but a fresh arrival appends fine with the log live.
    val fresh = Tables.embeddings(s, TestSpark.sfDir).filter($"vec_id" === 1)
      .select(org.apache.spark.sql.functions.lit(100001L).as("vec_id"), $"embedding")
    Similarity.refreshIvfIndex(fresh, dir)
    val served2 = serve(Similarity.loadIvfIndexServing(s, dir))
    val ids2 = Similarity.loadIvfIndexServing(s, dir)
      .select($"vec_id").as[Long].collect().toSet
    assert(ids2.contains(100001L))
    assert(!ids2.exists(id => id % 11 == 3 && id < 100000L))

    // (d) compaction folds the log: deleted rows physically absent
    // from the raw files, the log cleared, serving bit-identical.
    Similarity.compactIvfIndex(s, dir)
    assert(Similarity.loadIvfTombstones(s, dir)
      .map(_.count()).getOrElse(0L) == 0L,
      "compaction must clear every folded tombstone (only rows appended " +
        "after the fold's snapshot may survive)")
    val physical = s.read.parquet(s"$dir/ivf_assigned")
    assert(physical.filter($"vec_id" % 11 === 3 && $"vec_id" < 100000L).count() == 0,
      "tombstoned rows must be physically absent after the fold")
    assert(physical.filter($"vec_id" === 100001L).count() == 1)
    assert(serve(Similarity.loadIvfIndexServing(s, dir)) == served2,
      "folding the delete log must not change a single served neighbor")

    // (e) after the fold the id is free again — the re-add that was
    // rejected in (c) now lands and serves.
    Similarity.refreshIvfIndex(deadOne, dir)
    val deadId = deadOne.select($"vec_id").as[Long].head()
    assert(Similarity.loadIvfIndexServing(s, dir)
      .filter($"vec_id" === deadId).count() == 1)
  }

  test("PQ and SRP delete logs: masked serving, physical fold at compaction, re-add guarded until the fold") {
    val s = TestSpark.spark
    import s.implicits._
    import org.apache.spark.sql.DataFrame
    import graft.ops.Similarity
    val vecs = Tables.embeddings(s, TestSpark.sfDir)
      .select($"vec_id", $"embedding").localCheckpoint()
    // One delete-log contract, three logs: the IVF test above proves
    // the serving semantics in depth; this drives the SAME lifecycle
    // through the other two durable families.
    case class Fam(name: String, persist: String => Unit,
                   del: (DataFrame, String) => Unit,
                   serve: String => DataFrame,
                   refresh: (DataFrame, String) => Unit,
                   compact: String => Unit, dataSub: String,
                   tombs: String => Option[DataFrame])
    val fams = Seq(
      Fam("pq", d => Similarity.persistPqIndex(vecs, d),
        Similarity.deleteFromPqIndex, d => Similarity.loadPqIndexServing(s, d),
        Similarity.refreshPqIndex, d => Similarity.compactPqIndex(s, d),
        "pq_codes", d => Similarity.loadPqTombstones(s, d)),
      Fam("srp", d => Similarity.persistSrpIndex(vecs, d),
        Similarity.deleteFromSrpIndex, d => Similarity.loadSrpIndexServing(s, d),
        Similarity.refreshSrpIndex, d => Similarity.compactSrpIndex(s, d),
        "srp_sigs", d => Similarity.loadSrpTombstones(s, d)))
    fams.foreach { f =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-${f.name}-del").toString
      f.persist(dir)
      val dead = vecs.filter($"vec_id" % 11 === 3).select($"vec_id")
      f.del(dead.filter($"vec_id" < 250), dir)
      f.del(dead.filter($"vec_id" >= 250), dir)
      val ids = f.serve(dir).select($"vec_id").as[Long].collect().toSet
      assert(ids.nonEmpty && !ids.exists(_ % 11 == 3),
        s"${f.name}: tombstoned ids still served")
      val deadOne = vecs.filter($"vec_id" % 11 === 3)
        .orderBy($"vec_id").limit(1).localCheckpoint()
      intercept[IllegalArgumentException] { f.refresh(deadOne, dir) }
      f.compact(dir)
      assert(f.tombs(dir).map(_.count()).getOrElse(0L) == 0L,
        s"${f.name}: compaction must clear every folded tombstone")
      val phys = s.read.parquet(s"$dir/${f.dataSub}")
        .select($"vec_id").as[Long].collect().toSet
      assert(phys == ids, s"${f.name}: fold must leave exactly the served rows")
      f.refresh(deadOne, dir)
      val deadId = deadOne.select($"vec_id").as[Long].head()
      assert(f.serve(dir).filter($"vec_id" === deadId).count() == 1,
        s"${f.name}: re-add after the fold must serve")
    }
  }

  test("SRP index upsert: append equals from-scratch for ALL queries; compaction invisible; nothing but the delta hashed") {
    val s = TestSpark.spark
    import s.implicits._
    import graft.ops.Similarity
    val dir = java.nio.file.Files.createTempDirectory("graft-srp-upsert").toString
    val emb = Tables.embeddings(s, TestSpark.sfDir).select($"vec_id", $"embedding")
    val hist = emb.filter($"vec_id" % 7 =!= 2)
    val arrivals = emb.filter($"vec_id" % 7 === 2)
    Similarity.persistSrpIndex(hist, dir)
    Similarity.refreshSrpIndex(arrivals, dir)

    // (a) appended == from-scratch signatures of the union, row for row
    // — the frozen md5 seed makes this exact for EVERY row, with no
    // codebook/model table read anywhere in the refresh
    val appended = Similarity.loadSrpIndex(s, dir)
    val scratch = Similarity.srpSignatures(emb)
    assert(appended.except(scratch).count() == 0)
    assert(scratch.except(appended).count() == 0)
    assert(appended.count() == emb.count())

    // (b) Hamming serving over the loaded index equals serving over
    // the from-scratch signatures, bit for bit, for every query
    val queries = Similarity.srpSignatures(emb.filter($"vec_id" % 13 === 1))
      .toDF("q_id", "q_sig")
    def serve(idx: DataFrame) =
      rows(Similarity.srpProbe(idx, queries, k = 8))
    val servedAppend = serve(Similarity.loadSrpIndex(s, dir))
    assert(servedAppend == serve(scratch))
    assert(servedAppend.nonEmpty)

    // (c) compaction: bucket layout restored, serving unchanged
    def files() = new java.io.File(s"$dir/srp_sigs").listFiles()
      .count(_.getName.startsWith("part-"))
    assert(files() > 8)
    Similarity.compactSrpIndex(s, dir)
    assert(files() <= 8, "compaction must restore at most one file per bucket")
    assert(serve(Similarity.loadSrpIndex(s, dir)) == servedAppend,
      "compaction must not change a single served neighbor")

    // (d) the registered s26 equals probing the persisted historical
    // slice with the arrival signatures — the disk form of the query
    val histDisk = java.nio.file.Files.createTempDirectory("graft-srp-hist").toString
    Similarity.persistSrpIndex(hist, histDisk)
    val arrSigs = Similarity.srpSignatures(arrivals).toDF("q_id", "q_sig")
    assert(rows(Similarity.srpProbe(Similarity.loadSrpIndex(s, histDisk), arrSigs, k = 8))
      == rows(Similarity.srpUpsertServe(s, TestSpark.sfDir)))
  }

  test("PQ index upsert: encode-after-append equals frozen rebuild; ADC serving over index ∪ delta identical; compaction invisible") {
    val s = TestSpark.spark
    import s.implicits._
    import graft.ops.Similarity
    val all = Tables.embeddings(s, TestSpark.sfDir).select($"vec_id", $"embedding")
    val hist = all.filter($"vec_id" % 7 =!= 2)
    val arrivals = all.filter($"vec_id" % 7 === 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-upsert").toString
    Similarity.persistPqIndex(hist, dir)
    Similarity.refreshPqIndex(arrivals, dir)

    // the persisted codebook is the historical one, frozen
    val cbHist = Similarity.loadPqCodebook(s, dir)
    val appended = Similarity.loadPqIndex(s, dir)
    val frozenRebuild = Similarity.pqEncodeWith(all, cbHist)
    assert(appended.count() == all.count())
    assert(appended.except(frozenRebuild).count() == 0)
    assert(frozenRebuild.except(appended).count() == 0)

    // ADC serving over [index ∪ delta] through the LOAD path equals
    // serving the frozen rebuild — and survives compaction untouched
    val queries = all.filter($"vec_id" % 13 === 1)
    def serve(codes: org.apache.spark.sql.DataFrame) =
      rows(Similarity.pqServeShortlist(queries, codes, cbHist)
        .orderBy($"q_id", $"srank"))
    val served = serve(Similarity.loadPqIndex(s, dir))
    assert(served == serve(frozenRebuild) && served.nonEmpty,
      "serving the appended PQ index must equal serving a frozen-codebook rebuild")
    def files() = new java.io.File(s"$dir/pq_codes").listFiles()
      .count(_.getName.startsWith("part-"))
    assert(files() > 8)
    Similarity.compactPqIndex(s, dir)
    assert(files() == 8, "compaction must restore one file per bucket")
    assert(serve(Similarity.loadPqIndex(s, dir)) == served,
      "PQ compaction must not change a single shortlist row")
  }

  test("StreamingAnn serves the upserted sidecar without a rebuild, equal to the batch probe") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.ops.Similarity
    val all = Similarity.normedVectors(spark, TestSpark.sfDir)
    val hist = all.filter($"vec_id" % 7 =!= 2)
    val arrivals = Tables.embeddings(spark, TestSpark.sfDir)
      .filter($"vec_id" % 7 === 2).select($"vec_id", $"embedding")
    val root = java.nio.file.Files.createTempDirectory("graft-ann-upsert").toString
    Similarity.persistIvfIndex(
      Similarity.assignByCodebook(hist, Similarity.codebookOf(hist)), root)
    Similarity.refreshIvfIndex(arrivals, root)
    val queries = Tables.embeddings(spark, TestSpark.sfDir)
      .filter($"vec_id" % 13 === 1)
      .select($"vec_id".as("q_id"), $"embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ann-up-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-ann-up-out").toString
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
    val stream = input.toDF().toDF("q_id", "embedding")
    val q = graft.streaming.StreamingAnn.runFromSidecar(stream, root, out, ckpt)
    try {
      input.addData(queries.take(queries.length / 2).toSeq)
      q.processAllAvailable()
      input.addData(queries.drop(queries.length / 2).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out).drop("batch_id")
    val batchRun = Similarity.ivfProbeBatch(
      Tables.embeddings(spark, TestSpark.sfDir).filter($"vec_id" % 13 === 1)
        .select($"vec_id".as("q_id"), $"embedding"),
      Similarity.loadIvfIndex(spark, root))
    assert(streamed.count() == batchRun.count() && streamed.count() > 0)
    assert(streamed.except(batchRun).count() == 0)
    assert(batchRun.except(streamed).count() == 0)
  }

  test("cluster-maintenance label lifecycle: fold equals from-scratch d32 labels, snapshots reset, folded table serves generation two") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.ops.Dedup
    val arrivals = Tables.documents(spark, TestSpark.sfDir)
      .filter($"doc_id" % 5 === 0)
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    val slices = Seq(arrivals.take(arrivals.length / 2),
      arrivals.drop(arrivals.length / 2))
    val out = java.nio.file.Files.createTempDirectory("graft-fold-out").toString
    val st = java.nio.file.Files.createTempDirectory("graft-fold-state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fold-ckpt").toString
    val lblRoot = java.nio.file.Files.createTempDirectory("graft-fold-lbl").toString
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingClusterMaintenance.run(
      input.toDF().toDF("doc_id", "text"), TestSpark.sfDir, out, st, ckpt)
    try slices.foreach { sl => input.addData(sl.toSeq); q.processAllAvailable() }
    finally q.stop()

    graft.streaming.StreamingClusterMaintenance.foldIntoSidecar(
      spark, TestSpark.sfDir, st, lblRoot)

    // (a) fold == from-scratch d32: the folded table must equal the
    // label table derived from the BATCH d32 verdicts (the
    // oracle-checked incrementalClusters output) applied over the
    // historical labeling — built here independently of the fold code
    // path's input (streamed state).
    def labelMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hist = Dedup.histClusterLabels(spark, TestSpark.sfDir)
    val verdicts = Dedup.incrementalClusters(spark, TestSpark.sfDir)
      .select($"doc_id", $"cluster_id")
    val expected = labelMap(hist) ++ labelMap(verdicts)
    val folded = Dedup.loadMaintLabels(spark, lblRoot)
    assert(labelMap(folded) == expected,
      "folded sidecar must equal from-scratch d32 labels over history")
    assert(expected.nonEmpty)

    // (b) snapshots reset: per-tick driver state is now bounded by the
    // fold cadence — nothing left to accrete under stateDir.
    val leftover = new java.io.File(st).listFiles()
      .filter(_.getName.startsWith("batch_id="))
    assert(leftover.isEmpty, s"snapshots survive the fold: ${leftover.mkString(",")}")

    // (c) generation handoff: a fresh run served from the folded
    // sidecar starts at batch 0 with empty state; re-feeding the same
    // arrivals must label every arrival with its FOLDED cluster id
    // (gen-2 contraction against current labels composes — the
    // foldMaintenanceLabels edge-union argument, observed end to end).
    val st2 = java.nio.file.Files.createTempDirectory("graft-fold-st2").toString
    val out2 = java.nio.file.Files.createTempDirectory("graft-fold-out2").toString
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-fold-ck2").toString
    val input2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q2 = graft.streaming.StreamingClusterMaintenance.run(
      input2.toDF().toDF("doc_id", "text"), TestSpark.sfDir, out2, st2, ckpt2,
      labelsRoot = Some(lblRoot))
    try { input2.addData(arrivals.toSeq); q2.processAllAvailable() }
    finally q2.stop()
    val gen2 = labelMap(spark.read.parquet(s"$st2/batch_id=0"))
    val foldedMap = labelMap(folded)
    arrivals.map(_._1).foreach { d =>
      assert(gen2.get(d) == foldedMap.get(d),
        s"arrival $d: gen-2 label ${gen2.get(d)} != folded ${foldedMap.get(d)}")
    }
  }

  test("compactSidecars leaves every consumer result unchanged, one file per bucket") {
    val base = TestSpark.spark
    val before = rows(SparkEntry.queries("d04_shingle_jaccard")(diskSession(), TestSpark.sfDir))
    CorpusIndexes.compactSidecars(base, root)
    Seq("shingles", "bands").foreach { key =>
      val n = new java.io.File(s"$root/$key").listFiles()
        .count(_.getName.startsWith("part-"))
      assert(n == 8, s"$key: expected one file per bucket after compaction, got $n")
    }
    val after = rows(SparkEntry.queries("d04_shingle_jaccard")(diskSession(), TestSpark.sfDir))
    assert(after == before && after.nonEmpty,
      "sidecar compaction must be invisible to consumers")
  }

  // ---- crash injection for the generation-swap windows (round 20) --
  // The swap protocol's crash-safety was argued in doc comments and
  // asserted only on the happy path; these tests EXECUTE each window:
  // CorpusIndexes.crashHook throws at a named point between two
  // filesystem steps, and the assertions prove (a) every state except
  // the instant between the two renames leaves a complete readable
  // live generation, and (b) the NEXT maintenance call — not a human —
  // heals every state, including the between-renames one, via
  // recoverSwap's marker-certified roll-forward / roll-back.

  private def withCrashAt[A](point: String)(body: => A): Unit = {
    CorpusIndexes.crashHook =
      pt => if (pt == point) sys.error(s"injected crash at $pt")
    try {
      intercept[RuntimeException](body)
      ()
    } finally CorpusIndexes.crashHook = _ => ()
  }

  private val swapPoints =
    Seq("tmp-written", "marker-written", "live-aside", "swapped-in")

  test("crash injection: every compaction swap window recovers at the next maintenance call") {
    val s = TestSpark.spark
    import s.implicits._
    val lay = CorpusIndexes.Layout(4, "id", Seq("id"))
    swapPoints.foreach { point =>
      val dir = java.nio.file.Files.createTempDirectory("graft-crash-c").toString
      val path = s"$dir/tbl"
      val tbl = CorpusIndexes.tableName(dir, "crashc")
      CorpusIndexes.writeBucketedTable(
        (1L to 100L).toDF("id").withColumn("v", $"id" * 2), path, tbl, lay)
      CorpusIndexes.writeBucketedTable( // second generation: compaction has work
        (101L to 200L).toDF("id").withColumn("v", $"id" * 2), path, tbl, lay,
        append = true)
      val want = rows(s.read.parquet(path).orderBy($"id"))
      withCrashAt(point) {
        CorpusIndexes.compactBucketedTable(s, path, tbl, lay)
      }
      // readability of the crash state itself: all windows except the
      // one between the two renames leave a complete live generation
      if (point != "live-aside")
        assert(rows(s.read.parquet(path).orderBy($"id")) == want,
          s"$point: live generation must stay complete and readable")
      // recovery: the next maintenance call heals and then compacts
      CorpusIndexes.compactBucketedTable(s, path, tbl, lay)
      assert(rows(s.read.parquet(path).orderBy($"id")) == want,
        s"$point: rows must survive crash + recovery bit-for-bit")
      Seq("__old", "__compact", "__new").foreach { sfx =>
        assert(!new java.io.File(path + sfx).exists,
          s"$point: recovery must leave no $sfx residue")
      }
      val files = new java.io.File(path).listFiles()
        .count(_.getName.startsWith("part-"))
      assert(files == 4, s"$point: recovered table must be compacted, got $files files")
    }
  }

  test("crash injection: overwrite swap windows recover — including the empty-generation overwrite") {
    val s = TestSpark.spark
    import s.implicits._
    val lay = CorpusIndexes.Layout(4, "id", Seq("id"))
    swapPoints.foreach { point =>
      val dir = java.nio.file.Files.createTempDirectory("graft-crash-w").toString
      val path = s"$dir/tbl"
      val tbl = CorpusIndexes.tableName(dir, "crashw")
      CorpusIndexes.writeBucketedTable(
        (1L to 50L).toDF("id").withColumn("v", $"id"), path, tbl, lay)
      val old = rows(s.read.parquet(path).orderBy($"id"))
      val next = (200L to 260L).toDF("id").withColumn("v", $"id" + 7)
      withCrashAt(point) {
        CorpusIndexes.writeBucketedTable(next, path, tbl, lay)
      }
      if (point != "live-aside") {
        // before any rename the OLD generation is truth; after the
        // swap-in the NEW one is — either way a complete generation
        val live = rows(s.read.parquet(path).orderBy($"id"))
        val expected =
          if (point == "swapped-in") rows(next.orderBy($"id")) else old
        assert(live == expected, s"$point: live generation wrong after crash")
      }
      // recovery by re-issuing the write (any maintenance call heals)
      CorpusIndexes.writeBucketedTable(next, path, tbl, lay)
      s.catalog.refreshTable(tbl)
      assert(rows(CorpusIndexes.readBucketedTable(s, path, tbl, lay)
        .orderBy($"id")) == rows(next.orderBy($"id")),
        s"$point: overwrite must land intact after crash + retry")
      Seq("__old", "__new").foreach { sfx =>
        assert(!new java.io.File(path + sfx).exists,
          s"$point: recovery must leave no $sfx residue")
      }
    }
    // The round-19 advice window verbatim: an EMPTY dataframe's
    // overwrite dies right after the files land (zero part files) and
    // before the old-path marker write would have run. The live path
    // must still hold the previous complete generation, and the
    // re-issued empty overwrite must leave a marker-readable empty
    // generation.
    val dir = java.nio.file.Files.createTempDirectory("graft-crash-e").toString
    val path = s"$dir/tbl"
    val tbl = CorpusIndexes.tableName(dir, "crashe")
    CorpusIndexes.writeBucketedTable(
      (1L to 30L).toDF("id").withColumn("v", $"id"), path, tbl, lay)
    val empty = (1L to 30L).toDF("id").withColumn("v", $"id").filter($"id" < 0)
    withCrashAt("tmp-written") {
      CorpusIndexes.writeBucketedTable(empty, path, tbl, lay)
    }
    assert(s.read.parquet(path).count() == 30L,
      "old generation must survive the crashed empty overwrite")
    CorpusIndexes.writeBucketedTable(empty, path, tbl, lay)
    s.catalog.refreshTable(tbl)
    val reread = CorpusIndexes.readBucketedTable(s, path, tbl, lay)
    assert(reread.count() == 0L && reread.schema.fieldNames.toSeq == Seq("id", "v"),
      "empty generation must be schema-readable from its marker")
  }

  test("crash injection: a TombLog fold interrupted mid-rewrite heals at the next compact; no tombstoned row resurfaces") {
    val s = TestSpark.spark
    import s.implicits._
    import graft.ops.Dedup
    val docs = Tables.documents(s, TestSpark.sfDir).select($"doc_id", $"text")
    val hist = docs.filter($"doc_id" % 5 =!= 0).localCheckpoint()
    val batch = docs.filter($"doc_id" % 5 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-crash-fold").toString
    Dedup.persistTextProbeIndex(hist, dir)
    def serve() = rows(Dedup.multiSignalProbeIndexed(batch,
      Dedup.loadTextProbeIndex(s, dir)).orderBy($"doc_id"))
    val matched = Dedup.multiSignalProbeIndexed(batch, Dedup.loadTextProbeIndex(s, dir))
      .filter($"best_match".isNotNull).select($"best_match".as("doc_id"))
      .distinct().as[Long].collect().sorted
    assert(matched.nonEmpty, "fixture must emit matches")
    val dead = matched.zipWithIndex.collect { case (id, i) if i % 2 == 0 => id }
      .toSeq.toDF("doc_id")
    Dedup.deleteFromTextProbeIndex(dead, dir)
    val masked = serve() // tombstones masked at read; the fold must preserve this
    // kill the fold between the two renames of the FIRST rewritten
    // table — the worst window: that table's live dir is missing, the
    // other tables are still unfolded, and the log still holds rows
    withCrashAt("live-aside") {
      Dedup.compactTextProbeIndex(s, dir)
    }
    // the next maintenance call heals the half-swapped table, re-runs
    // the fold across all tables, and clears the log
    Dedup.compactTextProbeIndex(s, dir)
    assert(Dedup.loadTextProbeTombstones(s, dir)
      .map(_.count()).getOrElse(0L) == 0L,
      "the re-run fold must clear every folded tombstone")
    assert(serve() == masked,
      "post-fold serving must equal the masked serving bit-for-bit")
    assert(serve() == rows(Dedup.multiSignalProbeIndexed(batch,
      Dedup.buildTextProbeIndex(
        hist.join(dead, Seq("doc_id"), "left_anti"))).orderBy($"doc_id")),
      "no tombstoned row may resurface after the interrupted fold")
  }

  test("crash injection: the delete log's OWN swap crash (fold's last table) heals before the next fold reads the log") {
    // The fold compacts the three probe tables first and the log
    // LAST; a crash between the LOG's two renames leaves the log's
    // live dir missing while every probe table is already folded. The
    // hazard is specific: foldInto decides whether tombstones exist by
    // READING the log before any per-table compact (whose entry heal
    // would fix it) runs — so foldInto must heal the log path itself.
    val s = TestSpark.spark
    import s.implicits._
    import graft.ops.Dedup
    val docs = Tables.documents(s, TestSpark.sfDir).select($"doc_id", $"text")
    val hist = docs.filter($"doc_id" % 5 =!= 0).localCheckpoint()
    val batch = docs.filter($"doc_id" % 5 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-crash-log").toString
    Dedup.persistTextProbeIndex(hist, dir)
    def serve() = rows(Dedup.multiSignalProbeIndexed(batch,
      Dedup.loadTextProbeIndex(s, dir)).orderBy($"doc_id"))
    val matched = Dedup.multiSignalProbeIndexed(batch, Dedup.loadTextProbeIndex(s, dir))
      .filter($"best_match".isNotNull).select($"best_match".as("doc_id"))
      .distinct().as[Long].collect().sorted
    assert(matched.nonEmpty, "fixture must emit matches")
    val dead = matched.take(math.max(1, matched.length / 2)).toSeq.toDF("doc_id")
    Dedup.deleteFromTextProbeIndex(dead, dir)
    val masked = serve()
    // fourth live-aside = the log's own swap (3 probe tables fold first)
    var seen = 0
    CorpusIndexes.crashHook = pt =>
      if (pt == "live-aside") {
        seen += 1
        if (seen == 4) sys.error("injected crash at the log's own swap")
      }
    try {
      intercept[RuntimeException](Dedup.compactTextProbeIndex(s, dir))
      ()
    } finally CorpusIndexes.crashHook = _ => ()
    assert(seen == 4, "the crash must have hit the log's swap, not a table's")
    // every probe table is folded; serving is already correct even
    // with the log's live dir missing (nothing left to mask)
    assert(serve() == masked,
      "crashed-log state must serve the folded tables unmasked-and-correct")
    // the next fold heals the log FIRST (roll-forward of its folded,
    // empty generation), then finds no tombstones and no-ops the fold
    Dedup.compactTextProbeIndex(s, dir)
    assert(Dedup.loadTextProbeTombstones(s, dir)
      .map(_.count()).getOrElse(0L) == 0L,
      "the healed log must be the folded (cleared) generation")
    assert(serve() == masked, "serving must be unchanged through the heal")
    Seq("__old", "__compact").foreach { sfx =>
      assert(!new java.io.File(s"$dir/probe_tombstones$sfx").exists,
        s"heal must clear the log's $sfx residue")
    }
  }
}
