package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftFunctionsSpec extends AnyFunSuite {

  test("registered SQL functions: rule_ner and vec_dot work from SQL text") {
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    import spark.implicits._

    Seq("the spark table loves Spark").toDF("text").createOrReplaceTempView("v_texts")
    val entities = spark.sql(
      "SELECT entity FROM v_texts LATERAL VIEW explode(rule_ner(text)) AS entity")
      .collect().map(_.getString(0)).toSeq
    assert(entities == Seq("spark", "table", "Spark"))

    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("v_vecs")
    val dot = spark.sql("SELECT vec_dot(a, b) FROM v_vecs").head().getDouble(0)
    assert(dot == 11.0)
  }

  test("full SQL pipeline: the reference query shape in pure SQL") {
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    Tables.documents(spark, TestSpark.sfDir).createOrReplaceTempView("v_docs")
    val counts = spark.sql("""
      SELECT entity, count(1) AS n FROM v_docs
      LATERAL VIEW explode(rule_ner(text)) AS entity
      GROUP BY entity ORDER BY n DESC, entity""")
    val viaDf = graft.pipeline.EntityPipeline.entityCounts(spark, TestSpark.sfDir)
    assert(counts.collect().toSeq.map(r => (r.getString(0), r.getLong(1))) ==
           viaDf.collect().toSeq.map(r => (r.getString(0), r.getLong(1))))
  }
}
