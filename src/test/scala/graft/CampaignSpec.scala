package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Curation, Dedup, TextOps}

/** c01's composition contract: the campaign's single-plan decision set
  * must equal the stage-by-stage decisions of the standalone ops it
  * composes, the funnel must be a partition of the corpus, and the
  * shipped artifact must hold exactly the kept docs with exactly the
  * staged bytes.
  */
class CampaignSpec extends AnyFunSuite {

  test("composed decisions equal the stage-by-stage sets") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = TestSpark.sfDir
    val staged = Curation.stagedDecisions(spark, dir)
      .select($"doc_id", $"stage").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    // Stage 1: quality — exactly the t51 failures.
    val qualityFail = TextOps.gopherRules(spark, dir)
      .filter(!$"gopher_ok").select($"doc_id").as[Long].collect().toSet
    assert(staged.filter(_._2 == "quality").keySet == qualityFail)

    // Stage 2: dedup — d27 drops among quality survivors.
    val dedupDrop = Dedup.canonicalSelection(spark, dir)
      .filter(!$"kept").select($"doc_id").as[Long].collect().toSet
    assert(staged.filter(_._2 == "dedup").keySet == (dedupDrop -- qualityFail))

    // Stage 3: decontam — suite members plus t41 hits, among the
    // docs surviving the first two gates.
    val dirty = TextOps.multiSuiteContamination(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    val suiteIds = Tables.documents(spark, dir)
      .filter(TextOps.suiteMember($"doc_id"))
      .select($"doc_id").as[Long].collect().toSet
    val suiteOrDirty = staged.keySet.filter(id =>
      suiteIds.contains(id) || dirty.contains(id))
    assert(staged.filter(_._2 == "decontam").keySet ==
      (suiteOrDirty -- qualityFail -- dedupDrop))

    // Stage 4: span_emptied — d35 cut the doc to nothing.
    val emptied = Dedup.spanDedupApply(spark, dir)
      .filter($"text_clean" === "").select($"doc_id").as[Long].collect().toSet
    assert(staged.filter(_._2 == "span_emptied").keySet ==
      (emptied -- qualityFail -- dedupDrop -- suiteOrDirty))

    // Everything else is kept; the stages partition the corpus.
    val nDocs = Tables.documents(spark, dir).count()
    assert(staged.size == nDocs)
    assert(staged.values.forall(Set("quality", "dedup", "decontam",
      "span_emptied", "kept").contains))
  }

  test("funnel conservation: raw = drops + kept per source") {
    val spark = TestSpark.spark
    val rows = SparkEntry.queries("c01_curation_campaign")(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val raw = r.getAs[Long]("n_docs_raw")
      val parts = Seq("n_quality_drop", "n_dedup_drop", "n_decontam_drop",
        "n_span_emptied", "n_kept").map(r.getAs[Long](_)).sum
      assert(raw == parts, s"funnel leak in source ${r.getString(0)}")
      // The mixture can never plan more tokens than survived.
      assert(r.getAs[Long]("keep_tokens") <= r.getAs[Long]("tokens_kept"))
      // Packing covers every kept token: >= ceil(tokens/budget) over 8
      // shards collapses to a weak but always-true floor.
      assert(r.getAs[Long]("n_seqs") >= 1L)
    }
    // Exactly one binding source pins the budget (ties would mark
    // several; at least one must bind by construction of min()).
    assert(rows.count(_.getAs[Boolean]("is_binding")) >= 1)
  }

  test("the shipped artifact holds exactly the kept docs and bytes") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = TestSpark.sfDir
    // Force the write memo before reading the artifact path back
    // through the registered query (idempotent).
    SparkEntry.queries("c01_curation_campaign")(spark, dir).collect()
    val staged = Curation.stagedDecisions(spark, dir)
      .filter($"stage" === "kept")
      .select($"doc_id", $"text_final").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    val art = spark.read
      .parquet(s"${sys.props("java.io.tmpdir")}/graft_campaign_$h/corpus")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(art.keySet == staged.keySet)
    art.foreach { case (id, text) =>
      assert(text == staged(id), s"artifact bytes diverge for doc $id")
    }
  }

  test("c02 equals the door's batch core under the shipped bar") {
    // The registered ingest campaign computes the JM bar in-plan (the
    // snapshot's t54 bar); the door takes the same bar CELL frozen in
    // config — one quantized-cell rule on both paths, so the two
    // compositions must be row-identical for EVERY input, including
    // novel arrivals at the cell boundary (a raw double threshold
    // would diverge there).
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val c02 = graft.ops.Curation.ingestCampaign(spark, TestSpark.sfDir)
      .localCheckpoint()
    val barCell = graft.ops.TextOps.jmScoredWithBar(spark, TestSpark.sfDir)
      ._2.head().getLong(0)
    val arrivals = Tables.documents(spark, TestSpark.sfDir)
      .select($"doc_id", $"text").filter($"doc_id" % 5 === 0)
    val idx = graft.ops.Dedup.textProbeSidecar(spark, TestSpark.sfDir, 64)
    val grams = graft.ops.CorpusIndexes.benchGrams(spark, TestSpark.sfDir)
    val ref = Tables.documents(spark, TestSpark.sfDir)
      .filter($"lang" === "en").select(split($"text", "\\s+").as("t"))
    val (runi, rbg, ctx) = graft.ops.TextOps.jmModel(ref)
    val door = graft.ops.Curation.campaignProbeBatch(
      arrivals, idx, grams, runi, rbg, ctx, barCell,
      graft.ops.TextOps.dsirModel(spark, TestSpark.sfDir))
      .select(c02.columns.map(col): _*)
    assert(c02.except(door).count() == 0)
    assert(door.except(c02).count() == 0)
    // The composed chain exercises several gates on this corpus.
    val stages = c02.select($"stage").distinct().collect().map(_.getString(0)).toSet
    assert(stages.contains("kept") && stages.size >= 2, s"stages: $stages")
  }
}
