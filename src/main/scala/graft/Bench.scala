package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Constraint propagation re-derives isnotnull() constraints from
      // join keys and filters and substitutes the FULL defining
      // expression of derived columns into scan-stage filters — for
      // this engine's interpreted higher-order folds (MinHash/SimHash
      // signatures) that re-evaluates the whole hash pipeline per row.
      // No query here relies on inferred constraints (keys are never
      // null); turning it off keeps every fold single-evaluation.
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet-footer paths once so the first timed
    // query doesn't absorb session startup (~3-4 s of one-time cost that
    // otherwise lands on an arbitrary map-ordered query).
    spark.range(1000).selectExpr("sum(id)").collect()
    try { Tables.lineitem(spark, sfDir).limit(1).count() } catch { case _: Throwable => }
    // Optional name filter for local iteration on a single query:
    //   SPARK_GRAFT_ONLY=d11_dup_clusters sbt "runMain graft.Bench"
    val only = sys.env.get("SPARK_GRAFT_ONLY")
    val selected = only.fold(SparkEntry.queries)(re =>
      SparkEntry.queries.filter { case (k, _) => k.matches(re) })
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          false
      }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // A failed query must surface as a failure, never as a fast timing:
    // the total goes NaN-free but the JSON carries the failed names.
    val failed = results.filter(!_._3).map(_._1)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failedJson,"n_failed":${failed.length},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
