package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ner.RuleNer

/** Contract U1 (SURVEY.md §2.3): null-safe, deterministic, duplicates
  * preserved, empty-on-empty.
  */
class RuleNerSpec extends AnyFunSuite {

  test("null and empty text yield empty array, never throw") {
    assert(RuleNer.extractEntities(null).isEmpty)
    assert(RuleNer.extractEntities("").isEmpty)
    assert(RuleNer.extractEntities("   ").isEmpty)
  }

  test("gazetteer and capitalized tokens are extracted, duplicates kept") {
    val out = RuleNer.extractEntities("the spark table loves Spark spark")
    // "spark" (gazetteer, twice), "table" (gazetteer), "Spark" (capitalized)
    assert(out.toSeq == Seq("spark", "table", "Spark", "spark"))
  }

  test("deterministic: same input, same output") {
    val s = "Alice met Bob at the spark summit"
    assert(RuleNer.extractEntities(s).toSeq == RuleNer.extractEntities(s).toSeq)
  }

  test("Column implementation agrees with the Scala function") {
    val spark = TestSpark.spark
    import spark.implicits._
    val texts = Seq(
      "the spark table loves Spark spark",
      "Alice met Bob", "", "lower only words", "Mixed case Window window")
    val df = texts.toDF("text")
    val colOut = df.select(RuleNer.entitiesCol($"text").as("e"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    val fnOut = texts.map(t => RuleNer.extractEntities(t).toSeq)
    assert(colOut == fnOut)
  }

  test("UDF implementation agrees with the Column implementation") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Tables.documents(spark, TestSpark.sfDir).select($"text").limit(50)
    val both = df.select(
      RuleNer.entitiesCol($"text").as("a"),
      RuleNer.extractEntitiesUdf($"text").as("b")).collect()
    both.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("p02 typed gazetteer: table wins over the heuristic, types stay in contract") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Surface contract of the reference model: every emitted type is one
    // of PER/ORG/LOC/MISC, a gazetteer surface is typed by the table
    // (never the capitalized-word guess), and the fallback types unknown
    // proper nouns as PER.
    val gaz = RuleNer.TypedGazetteer.toMap
    assert(gaz.values.toSet.subsetOf(Set("PER", "ORG", "LOC", "MISC")))
    assert(gaz.size == RuleNer.TypedGazetteer.size, "gazetteer surfaces must be unique")
    val out = graft.pipeline.EntityPipeline
      .typedEntityCounts(spark, TestSpark.sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (entity, tpe, n) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(Set("PER", "ORG", "LOC", "MISC").contains(tpe))
      assert(n > 0)
      gaz.get(entity) match {
        case Some(t) => assert(tpe == t, s"$entity: gazetteer type $t beaten by $tpe")
        case None => assert(tpe == "PER" && entity.matches(RuleNer.CapitalizedRe),
          s"$entity: non-gazetteer entity must come from the PER fallback")
      }
    }
    // Non-degenerate on the shipped corpus: the ORG and MISC rows match.
    val types = out.map(_.getString(1)).toSet
    assert(types.contains("ORG") && types.contains("MISC"))
    // And the total count per entity agrees with the untyped p01 row for
    // shared gazetteer surfaces (same tokenization, same corpus).
    val p01 = graft.pipeline.EntityPipeline.entityCounts(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.filter(r => RuleNer.Gazetteer.contains(r.getString(0))).foreach { r =>
      assert(p01(r.getString(0)) == r.getLong(2),
        s"${r.getString(0)}: typed count ${r.getLong(2)} != p01 ${p01(r.getString(0))}")
    }
  }

  test("p03 span contract: consecutive same-type tokens merge, boundaries split") {
    val spark = TestSpark.spark
    import spark.implicits._
    // The grouped-entities analog, pinned on literal corpora:
    //  - adjacent capitalized tokens are ONE surface ("New York");
    //  - a type boundary splits even when positions are adjacent
    //    ("spark stream" = ORG then MISC, two spans);
    //  - a non-entity token splits a run ("Alice met Bob");
    //  - same-type gazetteer runs merge ("hash join merge" is one MISC
    //    span, exactly HF simple-aggregation's same-group merge);
    //  - null/empty text emits nothing;
    //  - duplicates count per occurrence across docs.
    val docs = Seq(
      (1L, "Alice met Bob in New York"),
      (2L, "the spark stream runs"),
      (3L, "hash join merge wins"),
      (4L, null.asInstanceOf[String]),
      (5L, ""),
      (6L, "New York New York")).toDF("doc_id", "text")
    val spans = graft.pipeline.EntityPipeline.spanRows(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(spans == Set(
      (1L, "Alice", "PER"), (1L, "Bob", "PER"), (1L, "New York", "PER"),
      (2L, "spark", "ORG"), (2L, "stream", "MISC"),
      (3L, "hash join merge", "MISC"),
      // doc 6: four adjacent PER tokens are one maximal run — the
      // HF simple strategy would merge them identically.
      (6L, "New York New York", "PER")))
    // And the registered aggregate counts surfaces per occurrence.
    val counted = graft.pipeline.EntityPipeline.entitySpans(spark, TestSpark.sfDir)
    val rows = counted.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set("PER", "ORG", "LOC", "MISC").contains(r.getString(1))))
    // Multi-token spans actually occur on the shipped corpus (the
    // whole point of p03 over p02) — at least one surface has a space.
    assert(rows.exists(_.getString(0).contains(" ")),
      "expected at least one multi-token span on the test corpus")
  }

  test("p04 co-occurrence: pairs recomputed from the span rows; per-doc dedup honored") {
    val spark = TestSpark.spark
    val got = SparkEntry.queries("p04_entity_cooccur")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // driver recompute from the same span seam
    val spans = graft.pipeline.EntityPipeline.spanRows(
      graft.Tables.documents(spark, TestSpark.sfDir)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text")))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .distinct
    val byDoc: Map[Long, List[String]] =
      spans.toList.groupBy(_._1).map { case (d, g) => d -> g.map(_._2).sorted }
    val pairCounts: Map[(String, String), Long] = byDoc.values.toList.flatMap { es =>
      for { a <- es; b <- es if a < b } yield (a, b)
    }.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val expected = pairCounts.toSeq
      .map { case ((a, b), n) => (a, b, n) }
      .sortBy { case (a, b, n) => (-n, a, b) }
      .take(100)
    assert(got.toSeq == expected)
    // a pair appearing twice in one doc counts that doc ONCE — implied
    // by equality above, and the top pair co-occurs in many docs
    assert(got.head._3 >= 2L)
  }
}
