package graft.ner

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic rule-based named-entity extractor — the engine-grade
  * replacement for the reference's HuggingFace NER pandas UDF
  * (spark_entity_counter.py:48-87). The transformer model cannot run in
  * an offline JVM; what we preserve is the UDF's *contract* (U1 in
  * SURVEY.md §2.3):
  *
  *  - `null` / empty text → empty array, never throws
  *    (spark_entity_counter.py:65-66)
  *  - output is an array of entity surface strings, duplicates kept
  *    (duplicates within one article count separately — A1)
  *  - pure function of the input text (the reference pins a single model,
  *    so it is deterministic too)
  *
  * The rules themselves: a token is an entity iff it is a Capitalized
  * word (proper-noun heuristic — PER/ORG/LOC surface forms in article
  * text) or a member of a fixed tech gazetteer (ORG/MISC-style hits in
  * the lowercase test corpus). Both rules are expressible in ANSI SQL, so
  * the DuckDB oracle can check the whole pipeline end-to-end.
  */
object RuleNer {

  /** Fixed gazetteer (sorted, deduplicated). */
  val Gazetteer: Seq[String] =
    Seq("hash", "join", "merge", "spark", "stream", "table", "vector", "window")

  /** Typed gazetteer — (surface, type) rows emitting the reference
    * model's PER/ORG/LOC/MISC surface contract. All lists are public
    * knowledge: LOC is well-known world cities, PER common given names,
    * ORG/MISC the engine vocabulary the synthetic corpus actually
    * contains. The table is broadcast-joined below the explode
    * (p02/typedEntityCounts); a surface absent from the corpus simply
    * never matches — the LOC/PER rows exercise the join contract even
    * on the lowercase technical test corpus.
    */
  val TypedGazetteer: Seq[(String, String)] = Seq(
    "spark" -> "ORG",
    "hash" -> "MISC", "join" -> "MISC", "merge" -> "MISC",
    "stream" -> "MISC", "table" -> "MISC", "vector" -> "MISC",
    "window" -> "MISC",
    "berlin" -> "LOC", "cairo" -> "LOC", "lima" -> "LOC",
    "london" -> "LOC", "oslo" -> "LOC", "paris" -> "LOC",
    "quito" -> "LOC", "tokyo" -> "LOC",
    "alice" -> "PER", "bob" -> "PER", "carol" -> "PER",
    "dave" -> "PER", "erin" -> "PER", "frank" -> "PER")

  val CapitalizedRe = "^[A-Z][A-Za-z]+$"

  /** Plain-Scala extractor — the shape the reference uses (a row-at-a-time
    * UDF). Kept for the streaming parity path and for property tests; the
    * batch query path uses [[entitiesCol]] which stays inside codegen.
    */
  def extractEntities(text: String): Array[String] =
    if (text == null || text.isEmpty) Array.empty[String]
    else text.split("\\s+").filter(isEntity)

  def isEntity(tok: String): Boolean =
    tok.nonEmpty && (Gazetteer.contains(tok) || tok.matches(CapitalizedRe))

  /** Same rules as a UDF column — one JVM call per row, no Python/Arrow
    * boundary (the costliest stage of the reference, SURVEY.md §3.1).
    */
  val extractEntitiesUdf = udf(extractEntities _)

  /** Same rules as pure built-in Column expressions (`filter` over
    * `split`) — fully codegen'd, the preferred form for batch plans.
    */
  def entitiesCol(text: Column): Column =
    filter(
      split(coalesce(text, lit("")), "\\s+"),
      tok => tok.isin(Gazetteer: _*) || tok.rlike(CapitalizedRe))
}
