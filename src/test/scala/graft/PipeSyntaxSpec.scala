package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.plans.logical.Aggregate

/** Spark 4 SQL PIPE syntax (`|>`, SPARK-49555): the linear FROM →
  * WHERE → EXTEND → AGGREGATE → ORDER BY form of a query. This is a
  * SURFACE proof, not a new registered query — the semantics are
  * exactly q01's (a registered, oracle-certified query), so
  * registering the pipe form would duplicate the registry (the s39
  * lesson). What the spec pins instead:
  *
  *   1. the pipe program and the certified DataFrame program return
  *      BIT-IDENTICAL rows (same decimal discipline, same casts), and
  *   2. the pipe parser lowers to the SAME single-Aggregate plan — the
  *      `|>` stages are parse-time sugar, not extra operators, so the
  *      scale story (one shuffle of 6 groups, partial aggregation)
  *      carries over verbatim.
  */
class PipeSyntaxSpec extends AnyFunSuite {

  test("pipe-syntax q01 == certified DataFrame q01, rows and plan shape") {
    val spark = TestSpark.spark
    val df = SparkEntry.queries("q01_pricing_summary")(spark, TestSpark.sfDir)

    graft.Tables.lineitem(spark, TestSpark.sfDir)
      .createOrReplaceTempView("v_lineitem_pipe")
    val pipe = spark.sql("""
      FROM v_lineitem_pipe
      |> WHERE l_shipdate <= CAST('2000-12-01' AS TIMESTAMP)
      |> EXTEND CAST(l_extendedprice AS DECIMAL(18,4))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,3)))
           AS disc_price
      |> EXTEND disc_price
           * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,3)))
           AS charge
      |> AGGREGATE
           count(*) AS n_rows,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base,
           CAST(sum(disc_price) AS DOUBLE) AS sum_disc_price,
           CAST(sum(charge) AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(4,3))) AS DOUBLE) / count(*) AS avg_disc
         GROUP BY l_returnflag, l_linestatus
      |> ORDER BY l_returnflag, l_linestatus""")

    assert(pipe.columns.toSeq == df.columns.toSeq,
      "pipe AGGREGATE must emit group cols then aggregates, q01's order")
    assert(pipe.collect().toSeq == df.collect().toSeq,
      "pipe and DataFrame q01 must be bit-identical")
    // parse-time sugar: ONE Aggregate in the optimized plan — the
    // EXTEND stages fold into the aggregate's child projection, no
    // stacked subquery aggregates
    val aggs = pipe.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
    assert(aggs.length == 1, s"expected one Aggregate, got ${aggs.length}")
  }
}
