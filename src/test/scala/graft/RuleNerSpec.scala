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
}
