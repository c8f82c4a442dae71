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

  /** p02 — gazetteer-augmented typed NER: the p01 spine (tokenize below
    * a shared explode) with a broadcast (surface → PER/ORG/LOC/MISC)
    * gazetteer join deciding the type, and the p01 capitalized-word
    * heuristic kept as the PER fallback for proper nouns the gazetteer
    * does not know. Gazetteer hits take precedence over the heuristic
    * (a known surface is typed by the table, not guessed). This narrows
    * the fidelity gap to the reference's transformer NER within public
    * knowledge: the output carries the model's typed surface contract,
    * and every rule stays ANSI-SQL-expressible so the oracle models the
    * gazetteer table directly as a VALUES relation.
    *
    * Scale shape: the gazetteer is a KB-sized broadcast below the
    * explode — tokens never shuffle untyped; the only exchange is the
    * final (entity, type) count aggregation, with map-side partial
    * aggregation on the exploded tokens.
    */
  def typedEntityCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gaz = RuleNer.TypedGazetteer.toDF("surface", "entity_type")
    Tables.documents(s, dir)
      .select(explode(split(coalesce($"text", lit("")), "\\s+")).as("entity"))
      .filter($"entity" =!= "")
      .join(broadcast(gaz), $"entity" === $"surface", "left")
      .withColumn("entity_type",
        coalesce($"entity_type",
          when($"entity".rlike(RuleNer.CapitalizedRe), "PER")))
      .filter($"entity_type".isNotNull)
      .groupBy($"entity", $"entity_type")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"entity")
  }

  /** p03 — MULTI-TOKEN ENTITY SPANS: the grouped-entities analog of
    * the reference's NER (spark_entity_counter.py:56
    * `grouped_entities=True`, aggregation_strategy="simple"): maximal
    * runs of CONSECUTIVE same-type entity tokens emit as ONE surface
    * ("New York", not ["New","York"]), typed with the p02 precedence
    * (gazetteer hit wins; capitalized-word heuristic is the PER
    * fallback). This closes the last reproducible fidelity gap to the
    * transformer pipeline's output contract: the model's "simple"
    * aggregation merges adjacent tokens of one entity_group exactly
    * like the positional run-merge here.
    *
    * Mechanics: positional tokenize (posexplode), per-token typing
    * below a broadcast gazetteer, then gaps-and-islands — run id =
    * pos − row_number() over (doc, type) ordered by pos, so two
    * same-type tokens are one island iff their positions are adjacent
    * — and the span surface rebuilds in position order via a sorted
    * per-island fold.
    *
    * Scale shape: the gazetteer broadcast sits below the explode
    * (tokens never shuffle untyped); the islands window partitions by
    * (doc_id, entity_type) — document-sized partitions, never global —
    * and the island aggregate reuses that exchange (its grouping
    * extends the window's partition keys). The per-island collect is
    * bounded by the span length (a few tokens). The only other
    * shuffle is the final surface-keyed count with map-side combine.
    */
  def entitySpans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    spanRows(Tables.documents(s, dir).select($"doc_id", $"text"))
      .groupBy($"entity", $"entity_type")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"entity", $"entity_type")
  }

  /** One row per entity span: (doc_id, entity, entity_type) — the
    * contract seam RuleNerSpec tests against tiny literal corpora.
    */
  private[graft] def spanRows(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val gaz = RuleNer.TypedGazetteer.toDF("surface", "entity_type")
    val typed = docs
      .select(col("doc_id"),
        posexplode(split(coalesce($"text", lit("")), "\\s+")).as(Seq("pos", "tok")))
      .filter($"tok" =!= "")
      .join(broadcast(gaz), $"tok" === $"surface", "left")
      .withColumn("entity_type",
        coalesce($"entity_type",
          when($"tok".rlike(RuleNer.CapitalizedRe), "PER")))
      .filter($"entity_type".isNotNull)
    val w = Window.partitionBy($"doc_id", $"entity_type").orderBy($"pos")
    typed
      .withColumn("grp", $"pos" - row_number().over(w))
      .groupBy($"doc_id", $"entity_type", $"grp")
      .agg(array_join(
        transform(array_sort(collect_list(struct($"pos", $"tok"))),
          x => x("tok")), " ").as("entity"))
      .select($"doc_id", $"entity", $"entity_type")
  }

  /** The shared DuckDB span-replay prefix of [[spansOracle]] and
    * [[cooccurOracle]]: gazetteer VALUES, positional tokenize, typing,
    * islands, per-island surfaces — ending with `spans(doc_id,
    * entity_type, entity)`.
    */
  private val spansOraclePrefix: String = {
    val gazRows = RuleNer.TypedGazetteer
      .map { case (sf, ty) => s"('$sf', '$ty')" }.mkString(", ")
    s"""
    WITH gaz(surface, entity_type) AS (VALUES $gazRows),
    d AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks
          FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS tok,
              unnest(range(1, len(toks) + 1)) AS pos FROM d),
    typed AS (SELECT t.doc_id, t.pos, t.tok,
                COALESCE(g.entity_type,
                  CASE WHEN regexp_full_match(t.tok, '[A-Z][A-Za-z]+')
                       THEN 'PER' END) AS entity_type
              FROM tok t LEFT JOIN gaz g ON t.tok = g.surface
              WHERE t.tok <> ''),
    runs AS (SELECT doc_id, entity_type, pos, tok,
               pos - row_number() OVER (PARTITION BY doc_id, entity_type
                                        ORDER BY pos) AS grp
             FROM typed WHERE entity_type IS NOT NULL),
    spans AS (SELECT doc_id, entity_type,
                string_agg(tok, ' ' ORDER BY pos) AS entity
              FROM runs GROUP BY doc_id, entity_type, grp)"""
  }

  /** DuckDB oracle for [[entitySpans]] — parallel unnest zips (tok,
    * pos), the same islands window, string_agg ordered by pos. The
    * engines' pos bases differ (0- vs 1-based) but the island id only
    * ever serves as a group key, never an output.
    */
  val spansOracle: String = spansOraclePrefix + """
    SELECT entity, entity_type, count(*) AS n FROM spans
    GROUP BY entity, entity_type
    ORDER BY n DESC, entity, entity_type"""

  /** p04 — ENTITY CO-OCCURRENCE: the graph layer over the NER output —
    * for every pair of distinct entity surfaces appearing in the SAME
    * document, in how many documents they co-occur. This is what an
    * entity-counting pipeline grows into next (the reference counts
    * surfaces in isolation; any downstream knowledge-graph/trend
    * product needs the pair table), and it reuses the p03 span
    * machinery unchanged.
    *
    * Scale shape: spans reduce to DISTINCT (doc, entity) rows first
    * (per-doc entity vocabulary, tiny vs tokens), the pair join is
    * doc-keyed (per-doc fan-out bounded by that vocabulary squared,
    * never corpus²), and the pair count map-side combines; top-100
    * with full tiebreak bounds the dump.
    */
  def entityCooccurrence(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ents = spanRows(Tables.documents(s, dir).select($"doc_id", $"text"))
      .select($"doc_id", $"entity").distinct()
    val a = ents.toDF("doc_id", "ent_a")
    val b = ents.toDF("doc_id", "ent_b")
    a.join(b, Seq("doc_id"))
      .filter($"ent_a" < $"ent_b")
      .groupBy($"ent_a", $"ent_b")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"n_docs".desc, $"ent_a", $"ent_b")
      .limit(100)
  }

  /** DuckDB oracle for [[entityCooccurrence]] — the span prefix, a
    * distinct (doc, entity) reduction, the same doc-keyed pair join.
    */
  val cooccurOracle: String = spansOraclePrefix + """,
    ents AS (SELECT DISTINCT doc_id, entity FROM spans)
    SELECT a.entity AS ent_a, b.entity AS ent_b, count(*) AS n_docs
    FROM ents a JOIN ents b ON a.doc_id = b.doc_id AND a.entity < b.entity
    GROUP BY ent_a, ent_b
    ORDER BY n_docs DESC, ent_a, ent_b LIMIT 100"""

  /** DuckDB oracle for [[typedEntityCounts]] — the gazetteer modeled
    * directly as a VALUES relation, same left join + PER fallback.
    */
  val typedOracle: String = {
    val gazRows = RuleNer.TypedGazetteer
      .map { case (sf, ty) => s"('$sf', '$ty')" }.mkString(", ")
    s"""
    WITH gaz(surface, entity_type) AS (VALUES $gazRows),
    toks AS (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS tok
             FROM documents),
    typed AS (SELECT t.tok,
                COALESCE(g.entity_type,
                  CASE WHEN regexp_full_match(t.tok, '[A-Z][A-Za-z]+')
                       THEN 'PER' END) AS entity_type
              FROM toks t LEFT JOIN gaz g ON t.tok = g.surface
              WHERE t.tok <> '')
    SELECT tok AS entity, entity_type, count(*) AS n FROM typed
    WHERE entity_type IS NOT NULL
    GROUP BY tok, entity_type ORDER BY n DESC, entity"""
  }
}
