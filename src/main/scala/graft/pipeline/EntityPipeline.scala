package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ner.RuleNer

/** The reference's one and only query, as a reusable DataFrame→DataFrame
  * transform (spark_entity_counter.py:117-156):
  *
  *   raw JSON value → from_json(9-field schema) → concat_ws(" ", title,
  *   description, content) → NER → explode → groupBy(entity).count()
  *
  * Identical code serves batch (oracle-checkable over the driver's
  * `documents` table, whose `text` column is the batch analog of the
  * concat output — FIXTURES.md §2) and streaming (StreamJob wires it
  * between Kafka source and sink). All stages are Catalyst built-ins, so
  * projection collapse / column pruning / JSON field pruning apply as
  * they do in the reference (SURVEY.md §4).
  */
object EntityPipeline {

  /** JSON article value → parsed struct + concatenated text.
    * P1 cast, P2 from_json, P3 field access, P4 concat_ws of the survey's
    * operator inventory. Null-tolerant: malformed JSON → null struct →
    * concat_ws skips nulls → "" (spark_entity_counter.py semantics,
    * SURVEY.md §1.2).
    */
  def parseArticles(raw: DataFrame): DataFrame = {
    val df = raw.selectExpr("CAST(value AS STRING) AS json_str")
      .select(from_json(col("json_str"), ArticleSchema.schema).as("data"))
    df.select(
      col("data"),
      concat_ws(" ", col("data.title"), col("data.description"), col("data.content"))
        .as("text"))
  }

  /** text column → one row per extracted entity → running counts.
    * U1 NER, U2 explode (empty arrays drop rows, exactly like the
    * reference's `explode`), A1 grouped count.
    */
  def countEntities(withText: DataFrame): DataFrame =
    withText
      .select(explode(RuleNer.entitiesCol(col("text"))).as("entity"))
      .groupBy(col("entity"))
      .count()

  /** Batch form over the driver `documents` table, with a deterministic
    * total order for the oracle hash-compare.
    */
  def entityCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    countEntities(Tables.documents(s, dir).select($"text"))
      .withColumnRenamed("count", "n")
      .orderBy($"n".desc, $"entity")
  }

  /** DuckDB oracle for [[entityCounts]] — the same tokenize → rule-filter
    * → count, expressed in ANSI SQL.
    */
  val oracle: String = {
    val gaz = RuleNer.Gazetteer.map(g => s"'$g'").mkString(", ")
    s"""
    SELECT tok AS entity, count(*) AS n FROM (
      SELECT unnest(regexp_split_to_array(text, '\\s+')) AS tok FROM documents) t
    WHERE tok IN ($gaz) OR regexp_full_match(tok, '[A-Z][A-Za-z]+')
    GROUP BY tok ORDER BY n DESC, tok"""
  }
}
