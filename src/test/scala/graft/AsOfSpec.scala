package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOf

class AsOfSpec extends AnyFunSuite {

  test("as-of join picks latest right row at-or-before left ts, null when none") {
    val spark = TestSpark.spark
    import spark.implicits._
    def ts(m: Int) = new java.sql.Timestamp(m * 60000L)
    val purchases = Seq((101L, 1L, ts(10)), (102L, 1L, ts(5)), (103L, 2L, ts(7)))
      .toDF("purchase_id", "user_id", "ts")
    val signups = Seq((1L, ts(5), 201L), (1L, ts(8), 202L), (3L, ts(1), 203L))
      .toDF("user_id", "ts", "signup_id")

    val out = AsOf.asOfJoin(purchases, signups, "user_id", "ts",
        rightPayload = Seq("signup_id"), rightTieBreak = "signup_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap

    assert(out(101L) == Some(202L)) // latest signup before ts=10 is ts=8
    assert(out(102L) == Some(201L)) // equality: signup at ts=5 matches (<= semantics)
    assert(out(103L) == None)       // user 2 has no signup
  }
}
