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
}
