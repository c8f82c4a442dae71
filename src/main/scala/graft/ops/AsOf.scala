package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the payload of
  * the latest right row with `right.ts <= left.ts` on the same key.
  *
  * Spark has no built-in as-of join, and the naive formulation
  * (`l JOIN r ON key AND r.ts <= l.ts` + max-window) explodes into a
  * per-key cross product. This implementation is the union-and-sweep
  * form: tag both sides, union, and run one `last(_, ignoreNulls)`
  * window ordered by (ts, side). Cost is a single hash shuffle on the
  * key plus an in-partition sort — linear in |L|+|R|, no cross product,
  * no skew amplification — which is the plan that survives 100 TB
  * (both inputs co-partitioned on the key by the same exchange).
  *
  * Tie semantics: at equal timestamps the right row sorts first
  * (side 0 < side 1), so a right row exactly at `left.ts` IS matched —
  * the `<=` convention, matching DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`
  * which the oracle uses.
  */
object AsOf {

  /** @param left        probe side
    * @param right       reference side (its payload gets attached)
    * @param key         equality key column present on both sides
    * @param ts          event-time column present on both sides
    * @param rightPayload right-side columns to carry (must not collide
    *                     with left column names)
    * @param rightTieBreak extra right-side ordering column for
    *                     deterministic pick among equal (key, ts) rows
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightPayload: Seq[String], rightTieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast(right.schema(rightTieBreak).dataType))
    val lAligned = rightPayload.foldLeft(l) { (df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val r0 = right.select((Seq(key, ts, rightTieBreak) ++ rightPayload.filterNot(_ == rightTieBreak)).map(col): _*)
      .withColumn("_side", lit(0))
      .withColumn("_tie", col(rightTieBreak))
    val rAligned = leftCols.filterNot(c => c == key || c == ts).foldLeft(r0) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(lAligned.columns.map(col): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("_side").asc, col("_tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = rightPayload.foldLeft(lAligned.unionByName(rAligned)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 1).select((leftCols ++ rightPayload).map(col): _*)
  }
}
