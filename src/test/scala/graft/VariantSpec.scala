package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** e42's VARIANT contract on literal fixtures: typed path extraction,
  * missing-path and type-mismatch behavior, and nested access — the
  * semantics the registered rollup relies on (its corpus only
  * exercises the flat happy path).
  */
class VariantSpec extends AnyFunSuite {

  private def extract(js: String, path: String, typ: String): Any = {
    val spark = TestSpark.spark
    import spark.implicits._
    Seq(js).toDF("j")
      .selectExpr(s"try_variant_get(parse_json(j), '$path', '$typ') AS v")
      .head().get(0)
  }

  test("typed extraction returns the exact integer") {
    assert(extract("""{"k": 87}""", "$.k", "bigint") == 87L)
    assert(extract("""{"k": 0}""", "$.k", "bigint") == 0L)
  }

  test("a missing path extracts NULL, not an error") {
    assert(extract("""{"other": 1}""", "$.k", "bigint") == null)
  }

  test("try_variant_get maps every non-castable value to NULL; integral doubles widen") {
    // a JSON string cannot cast to bigint -> null under try_
    assert(extract("""{"k": "abc"}""", "$.k", "bigint") == null)
    // an integral double widens exactly; a fractional one TRUNCATES
    // toward zero (the ANSI numeric cast — DuckDB's TRY_CAST of the
    // JSON-typed extract behaves identically, the e42 oracle parity);
    // numeric STRINGS parse on both engines
    assert(extract("""{"k": 87.0}""", "$.k", "bigint") == 87L)
    assert(extract("""{"k": 2.5}""", "$.k", "bigint") == 2L)
    assert(extract("""{"k": "87"}""", "$.k", "bigint") == 87L)
  }

  test("STRICT variant_get agrees on the happy path and THROWS on a mismatch — why e42 uses try_") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ok = Seq("""{"k": 87}""").toDF("j")
      .selectExpr("variant_get(parse_json(j), '$.k', 'bigint') AS v")
      .head().getLong(0)
    assert(ok == 87L)
    // one bad row would abort a whole corpus scan under the strict
    // form — the registered rollup must use try_variant_get
    intercept[Exception] {
      Seq("""{"k": "abc"}""").toDF("j")
        .selectExpr("variant_get(parse_json(j), '$.k', 'bigint') AS v")
        .collect()
    }
  }

  test("nested paths address through objects and arrays") {
    assert(extract("""{"a": {"b": [10, 20, 30]}}""", "$.a.b[1]", "bigint") == 20L)
  }

  test("the registered rollup equals the from_json form on the corpus") {
    // VARIANT extraction and schema'd from_json must agree wherever
    // the fixed schema fits — the migration-safety claim.
    val spark = TestSpark.spark
    import spark.implicits._
    val viaVariant = graft.ops.EventOps.variantRollup(spark, TestSpark.sfDir)
    val viaFromJson = Tables.events(spark, TestSpark.sfDir)
      .select($"event_type",
        from_json($"props",
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"), count($"k").as("n_with_k"),
        sum($"k").as("sum_k"), min($"k").as("min_k"), max($"k").as("max_k"))
      .orderBy($"event_type")
    assert(viaVariant.collect().toSeq == viaFromJson.collect().toSeq)
  }
}
