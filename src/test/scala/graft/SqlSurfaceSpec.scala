package graft

import org.scalatest.funsuite.AnyFunSuite

/** Parameterized SQL — the templating surface a production deployment
  * uses instead of string interpolation (injection-safe, plan-cache
  * friendly): named parameter markers (`:cut`), positional markers
  * (`?`), the IDENTIFIER() clause for binding table/column NAMES
  * (names are not data — a value parameter cannot name a table, and a
  * raw-interpolated name is the SQL-injection vector IDENTIFIER
  * exists to close), and EXECUTE IMMEDIATE for running SQL held in a
  * variable. Each form is pinned row-identical to the literal query it
  * templates, over the engine's own tables.
  */
class SqlSurfaceSpec extends AnyFunSuite {

  test("named and positional parameter markers bind values, not text") {
    val spark = TestSpark.spark
    import spark.implicits._
    graft.Tables.orders(spark, TestSpark.sfDir)
      .createOrReplaceTempView("v_orders_sql")
    val literal = spark.sql("""
      SELECT o_orderpriority, count(*) AS n FROM v_orders_sql
      WHERE o_totalprice > 100000.0 AND o_orderstatus = 'F'
      GROUP BY o_orderpriority ORDER BY o_orderpriority""").collect().toSeq

    val named = spark.sql(
      """SELECT o_orderpriority, count(*) AS n FROM v_orders_sql
         WHERE o_totalprice > :cut AND o_orderstatus = :st
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
      Map("cut" -> 100000.0, "st" -> "F")).collect().toSeq
    assert(named == literal)

    val positional = spark.sql(
      """SELECT o_orderpriority, count(*) AS n FROM v_orders_sql
         WHERE o_totalprice > ? AND o_orderstatus = ?
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
      Array(100000.0, "F")).collect().toSeq
    assert(positional == literal)

    // the binding is a VALUE, not spliced text: a malicious string
    // stays a comparison operand (matches no status) instead of
    // rewriting the query
    val hostile = spark.sql(
      """SELECT count(*) AS n FROM v_orders_sql WHERE o_orderstatus = :st""",
      Map("st" -> "F' OR '1'='1")).collect()
    assert(hostile.head.getLong(0) == 0L,
      "a parameter value must never be parsed as SQL")
  }

  test("IDENTIFIER() binds table and column names safely; EXECUTE IMMEDIATE runs held SQL") {
    val spark = TestSpark.spark
    graft.Tables.orders(spark, TestSpark.sfDir)
      .createOrReplaceTempView("v_orders_sql2")
    val literal = spark.sql(
      "SELECT o_orderstatus, count(*) AS n FROM v_orders_sql2 GROUP BY 1 ORDER BY 1")
      .collect().toSeq

    // names bound through IDENTIFIER — the query text never
    // interpolates the table or column string
    val viaIdentifier = spark.sql(
      """SELECT IDENTIFIER(:col) AS o_orderstatus, count(*) AS n
         FROM IDENTIFIER(:tbl) GROUP BY 1 ORDER BY 1""",
      Map("tbl" -> "v_orders_sql2", "col" -> "o_orderstatus")).collect().toSeq
    assert(viaIdentifier == literal)

    // a hostile "name" fails to RESOLVE as an identifier instead of
    // executing as SQL
    val ex = intercept[Exception] {
      spark.sql("SELECT count(*) FROM IDENTIFIER(:tbl)",
        Map("tbl" -> "v_orders_sql2 WHERE 1=0")).collect()
    }
    assert(ex.getMessage != null)

    // EXECUTE IMMEDIATE: SQL text held in a string, parameters bound
    // via USING — the dynamic-dispatch form migration scripts use
    val viaExec = spark.sql(
      """EXECUTE IMMEDIATE
           'SELECT o_orderstatus, count(*) AS n FROM v_orders_sql2
            WHERE o_totalprice > ? GROUP BY 1 ORDER BY 1'
         USING 0.0""").collect().toSeq
    assert(viaExec == literal)
  }
}
