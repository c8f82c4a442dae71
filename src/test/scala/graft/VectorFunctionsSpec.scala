package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends AnyFunSuite {

  test("dot product accumulates in double, left to right") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val got = df.select(vec_dot($"a", $"b")).head().getDouble(0)
    assert(got == 32.0)
  }

  test("codegen and interpreted paths agree on real data") {
    val spark = TestSpark.spark
    import spark.implicits._
    val e = Tables.embeddings(spark, TestSpark.sfDir).limit(20)
      .select($"vec_id", $"embedding")
    val pairs = e.toDF("ia", "va").crossJoin(e.toDF("ib", "vb"))
    val viaExpr = pairs.select($"ia", $"ib", vec_dot($"va", $"vb").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // reference: plain Scala fold over collected arrays
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    viaExpr.foreach { case ((ia, ib), d) =>
      var s = 0.0
      val (x, y) = (vecs(ia), vecs(ib))
      var i = 0
      while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }
      assert(s == d, s"mismatch for ($ia,$ib)")
    }
  }

  test("null inputs propagate to null") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(df.select(vec_dot($"a", $"b")).head().isNullAt(0))
  }

  test("cosine of a vector with itself is 1") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(Tuple1(Array(0.6f, 0.8f))).toDF("a")
    val c = df.select(cosine($"a", $"a")).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }
}
