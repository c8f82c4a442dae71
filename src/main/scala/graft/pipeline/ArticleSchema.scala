package graft.pipeline

import org.apache.spark.sql.types._

/** The reference consumer's declared article read schema — nine nullable
  * string fields (spark_entity_counter.py:105-115), reproduced exactly.
  *
  * Note the deliberate `source: StringType`: the producer actually sends
  * a JSON *object* there (news_producer.py:127), so `from_json` yields
  * null for that field. That mismatch is reference behavior and is
  * preserved for parity (SURVEY.md §1.2, §7.4).
  */
object ArticleSchema {
  val schema: StructType = StructType(Seq(
    StructField("source",      StringType),
    StructField("author",      StringType),
    StructField("title",       StringType),
    StructField("description", StringType),
    StructField("url",         StringType),
    StructField("publishedAt", StringType),
    StructField("content",     StringType),
    StructField("fetchedAt",   StringType),
    StructField("query",       StringType),
  ))
}
