package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables._

/** Relational operator surface: scans, filters, multi-way joins,
  * aggregations, windows, sorts, set operations.
  *
  * The reference delegates all relational planning to Catalyst
  * (spark_entity_counter.py:117-156 is its single linear pipeline); we do
  * the same — every query here is a declarative DataFrame program so that
  * predicate pushdown, column pruning, join reordering, AQE and
  * whole-stage codegen apply untouched.
  *
  * Cross-engine determinism (DuckDB oracle): all money arithmetic is done
  * in exact DECIMAL and only the final aggregate is cast to DOUBLE, so
  * both engines compute the identical numeric value regardless of
  * partitioning / summation order. Every query ends in a total ORDER BY.
  */
object Relational {

  /** Exact decimal view of a double money/quantity column: scale 4 is
    * strictly wider than the 2-decimal generated data, so the cast never
    * rounds and SUM is exact (order-insensitive — safe under any shuffle).
    */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))
  /** Small exact decimal for rates (discount/tax in [0, 0.10]). */
  private def rate(c: Column): Column = c.cast(DecimalType(4, 3))

  private def sumMoney(c: Column): Column = sum(dec(c)).cast("double")

  /** TPC-H Q1-shaped pricing summary: single-pass grouped aggregate with
    * partial (map-side) aggregation; shuffles only 6 groups.
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = lineitem(s, dir).filter($"l_shipdate" <= lit("2000-12-01").cast("timestamp"))
    val discPrice = dec($"l_extendedprice") * (lit(1).cast(DecimalType(3, 2)) - rate($"l_discount"))
    val charge    = discPrice * (lit(1).cast(DecimalType(3, 2)) + rate($"l_tax"))
    li.groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        count(lit(1)).as("n_rows"),
        sumMoney($"l_quantity").as("sum_qty"),
        sumMoney($"l_extendedprice").as("sum_base"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        (sum(dec($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec($"l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
        (sum(rate($"l_discount")).cast("double") / count(lit(1))).as("avg_disc"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** TPC-H Q3-shaped: 3-way join with filters pushed below the joins,
    * grouped revenue, top-10. No broadcast hint on customer: it GROWS
    * with scale factor (a forced broadcast is a driver OOM at 100 TB),
    * so stats + AQE decide at runtime — broadcast while the filtered
    * side fits, shuffled hash join beyond that. Only constant-size
    * dimensions (nation/region) ever deserve a hard hint.
    */
  def topOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cut = lit("1998-01-01").cast("timestamp")
    val c = customer(s, dir).filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val o = orders(s, dir).filter($"o_orderdate" < cut)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val l = lineitem(s, dir).filter($"l_shipdate" > cut)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val rev = dec($"l_extendedprice") * (lit(1).cast(DecimalType(3, 2)) - rate($"l_discount"))
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(sum(rev).cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  /** TPC-H Q5-shaped: 6-way join (region→nation→customer→orders→lineitem
    * →supplier with the s_nationkey = c_nationkey locality predicate).
    * Only the CONSTANT-size dimensions nation (25 rows) and region (5)
    * carry broadcast hints; customer and supplier grow linearly with
    * scale factor, so their join strategy is left to stats + AQE — they
    * broadcast at small SF and degrade gracefully to shuffled hash
    * joins at 100 TB instead of OOMing the driver.
    */
  def regionRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = dec($"l_extendedprice") * (lit(1).cast(DecimalType(3, 2)) - rate($"l_discount"))
    val r = region(s, dir)
    val n = nation(s, dir)
    val c = customer(s, dir)
    val o = orders(s, dir).filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
                                  $"o_orderdate" <  lit("1999-01-01").cast("timestamp"))
    val l = lineitem(s, dir)
    val sup = supplier(s, dir)
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(sup, $"l_suppkey" === $"s_suppkey" && $"s_nationkey" === $"c_nationkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_items"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** Dim-join aggregate: fact ⋈ part. NO broadcast hint: part is an
    * SF-SCALING table (TPC-H SF×200k rows — tens of billions at a
    * 100 TB SF), so pinning it to the driver would be wrong at scale;
    * AQE broadcasts it whenever it actually fits and falls back to a
    * shuffle join when it doesn't. The 25-brand aggregate map-combines
    * either way.
    */
  def brandVolume(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir).select($"l_partkey", $"l_quantity", $"l_extendedprice")
      .join(part(s, dir).select($"p_partkey", $"p_brand"),
            $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_items"),
           sumMoney($"l_quantity").as("sum_qty"),
           sumMoney($"l_extendedprice").as("sum_price"))
      .orderBy($"p_brand")
  }

  /** Ranking window: top-3 orders per customer. Single shuffle on
    * o_custkey; rank computed within partitions, no global sort until the
    * final (already reduced) output ordering.
    */
  def topOrdersPerCustomer(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    orders(s, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .orderBy($"o_custkey", $"rn")
  }

  /** Global top-N: Spark plans TakeOrderedAndProject — per-partition
    * top-100 then a single-reducer merge of 100-row heaps; never a full
    * global sort. The per-key tiebreak makes it deterministic.
    */
  def topLineitems(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
      .limit(100)
  }

  /** Set operations: INTERSECT / EXCEPT are hash-aggregated semi-joins in
    * Spark (no sort), both sides pre-projected to the single join column.
    */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val building = customer(s, dir).filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val richOrF  = customer(s, dir).filter($"c_acctbal" > 5000).select($"c_custkey")
    val withF    = orders(s, dir).filter($"o_orderstatus" === "F")
      .select($"o_custkey".as("c_custkey"))
    building.intersect(withF).union(richOrF.except(withF)).distinct()
      .orderBy($"c_custkey")
  }

  /** ROLLUP grouping-sets aggregate (subtotals + grand total). */
  def rollupSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n_rows"), sumMoney($"l_quantity").as("sum_qty"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  /** Exact distinct aggregation (expand + two-phase aggregate). The
    * approximate HLL variant for 100 TB is in TextOps.approxDistinct.
    */
  def distinctCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir).groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n_parts"),
           countDistinct($"l_suppkey").as("n_supps"),
           count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  /** Anti-join (NOT EXISTS): customers with no finished order, counted by
    * segment. Broadcast the distinct custkeys of the filtered orders side
    * when small; at scale it stays a shuffled left-anti hash join.
    */
  def customersWithoutF(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val withF = orders(s, dir).filter($"o_orderstatus" === "F")
      .select($"o_custkey").distinct()
    customer(s, dir)
      .join(withF, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  /** Conditional aggregation (CASE WHEN pivot) in one scan. */
  def priorityBreakdown(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    orders(s, dir).groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
           sum(when($"o_orderstatus" === "F", 1L).otherwise(0L)).as("n_finished"),
           sum(when($"o_totalprice" > 100000, 1L).otherwise(0L)).as("n_large"),
           (sum(dec($"o_totalprice")).cast("double") / count(lit(1))).as("avg_price"))
      .orderBy($"o_orderpriority")
  }

  /** Running (prefix) sum per supplier — frame ROWS UNBOUNDED PRECEDING.
    * Filtered to a key subset so the output stays bounded; the window
    * itself shuffles once on l_suppkey and sorts within partitions only.
    */
  def runningSupplierVolume(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lineitem(s, dir)
      .filter($"l_suppkey" <= 5)
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
              sum(dec($"l_quantity")).over(w).cast("double").as("running_qty"))
      .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
  }

  /** Salted two-phase aggregation — the hot-key discipline spelled out
    * as a query: phase 1 aggregates on (key, salt) so a skewed key's
    * rows spread over 16 reducers; phase 2 merges the 16 partials per
    * key. With 3 return flags over the whole corpus, a plain groupBy
    * sends a third of 100 TB through single reducers; salting bounds
    * every task at 1/16 of a key. Decimal partials make the two-phase
    * sum bit-equal to the direct aggregate, and the oracle IS the
    * direct aggregate — proving salting changes the plan, not the
    * result. (Spark's own partial aggregation covers sum/count; explicit
    * salt is the pattern for the cases it can't, e.g. exact distinct
    * collections per hot key.)
    */
  def saltedFlagTotals(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .select($"l_returnflag", ($"l_orderkey" % 16).as("salt"),
        dec($"l_quantity").as("qty"))
      .groupBy($"l_returnflag", $"salt")
      .agg(sum($"qty").as("part_qty"), count(lit(1)).as("part_n"))
      .groupBy($"l_returnflag")
      .agg(sum($"part_qty").cast("double").as("sum_qty"),
           sum($"part_n").as("n_rows"))
      .orderBy($"l_returnflag")
  }
}
