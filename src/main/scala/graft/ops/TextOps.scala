package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline extensions: token statistics, quality scoring,
  * language-ID heuristics, document fingerprinting, term/n-gram
  * frequencies. Everything is built-in Column expressions (array
  * higher-order functions), fully codegen'd — no UDFs in the hot path,
  * so whole-stage codegen spans the entire plan at any scale.
  */
object TextOps {

  /** English-ish stopword list used by quality / lang-id scoring.
    * Deliberately tiny and fixed so the DuckDB oracle can inline it.
    */
  val Stopwords: Seq[String] = Seq("a", "the")

  private[ops] def toks(text: Column): Column = split(text, "\\s+")

  /** Per-document token statistics: counts, distinct counts, char
    * length, mean token length — single narrow scan, no shuffle at all.
    */
  def tokenStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .select($"doc_id",
        size(toks($"text")).cast("long").as("n_tokens"),
        size(array_distinct(toks($"text"))).cast("long").as("n_distinct"),
        length($"text").cast("long").as("n_chars"))
      .withColumn("avg_token_len",
        ($"n_chars" - ($"n_tokens" - 1)).cast("double") / $"n_tokens")
      .orderBy($"doc_id")
  }

  /** Heuristic quality score: mix of stopword ratio, type-token ratio
    * and a length saturation term — the standard cheap pre-filter for
    * LLM training corpora. Expression order is fixed and identical to
    * the oracle so the double arithmetic is bit-reproducible.
    */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = toks($"text")
    val nTok = size(t).cast("double")
    val nStop = size(filter(t, c => c.isin(Stopwords: _*))).cast("double")
    val ttr = size(array_distinct(t)).cast("double") / nTok
    val stopRatio = nStop / nTok
    val lenScore = least(nTok / lit(50.0), lit(1.0))
    documents(s, dir)
      .select($"doc_id",
        stopRatio.as("stop_ratio"),
        ttr.as("ttr"),
        lenScore.as("len_score"),
        (lit(0.4) * (lit(1.0) - stopRatio) + lit(0.3) * ttr + lit(0.3) * lenScore).as("quality"))
      .orderBy($"doc_id")
  }

  /** Language-ID heuristic: stopword-hit-rate thresholding. (The corpus
    * shares one vocabulary across declared langs, so this is the
    * deterministic n-gram-scoring *mechanism*, checkable by the oracle;
    * swapping in per-language stopword tables is a data change only.)
    */
  def langId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = toks($"text")
    val score = size(filter(t, c => c.isin(Stopwords: _*))).cast("double") / size(t)
    documents(s, dir)
      .select($"doc_id", $"lang".as("declared_lang"), score.as("en_score"),
        when(score >= 0.04, "en").otherwise("unk").as("pred_lang"))
      .orderBy($"doc_id")
  }

  /** Canonical-form document fingerprint: md5 over the sorted distinct
    * token set. Groups under the fingerprint are (order- and
    * multiplicity-insensitive) duplicate clusters.
    */
  def fingerprints(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .select($"doc_id",
        md5(concat_ws(" ", array_sort(array_distinct(toks($"text"))))).as("fingerprint"))
      .groupBy($"fingerprint")
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("min_doc_id"))
      .orderBy($"fingerprint")
  }

  /** Corpus-level term frequencies, top 20. At 100 TB this is the
    * classic two-phase aggregate: partial counts map-side, 31-key
    * shuffle, then a single-reducer top-k (TakeOrderedAndProject).
    */
  def topTerms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .select(explode(toks($"text")).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"term")
      .limit(20)
  }

  /** Word-bigram frequencies, top 20 — n-gram construction via the
    * `transform(sequence(...))` higher-order expression (no UDF, no
    * self-join).
    *
    * The token array is projected FIRST and materialized behind a
    * repartition barrier before the lambda indexes it. Without the
    * barrier, CollapseProject substitutes `split(text)` into the lambda
    * body, and Catalyst re-evaluates the split for every index i —
    * O(tokens²) per document (measured 17× slower at sf0.1).
    */
  def topBigrams(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .select($"doc_id", split($"text", "\\s+").as("t"))
      .repartition($"doc_id")
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2), i -> concat_ws(' ', t[i], t[i+1]))")).as("bigram"))
      .groupBy($"bigram").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"bigram")
      .limit(20)
  }

  /** BPE-ish subtoken counting: greedy ≤4-char alpha chunks via
    * regexp_extract_all — the cheap stand-in for a real tokenizer's
    * piece count, alongside the whitespace token count.
    */
  def subtokenCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .select($"doc_id",
        size(toks($"text")).cast("long").as("n_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]{1,4}', 0)")).cast("long").as("n_subtokens"))
      .withColumn("pieces_per_token", $"n_subtokens".cast("double") / $"n_tokens")
      .orderBy($"doc_id")
  }

  /** t36 — PMI collocation mining: the corpus's most-associated word
    * pairs, ranked by pointwise mutual information — the phrase/
    * collocation extraction step tokenizer-vocabulary and
    * phrase-merging pipelines (word2vec-phrases style) run over a
    * training corpus. PMI = log(c_ab·N / (c_a·c_b)); log is monotone,
    * so the RANKING needs only the ratio — emitted as the family's one
    * exact operation: both products stay in BIGINT (exact — counts
    * here are far under 2⁵³), each casts to double exactly, and ONE
    * IEEE divide produces the score, so ordering and emitted doubles
    * replay bit for bit in the oracle without touching `ln` (pow/log
    * are not correctly-rounded in either engine — the d29 lesson).
    * A min-count floor (c_ab ≥ 5) applies first: PMI's known failure
    * mode is hapax pairs scoring arbitrarily high.
    *
    * Scale shape: one tokenized scan feeds both the unigram and the
    * adjacent-pair aggregate (map-side combined, vocabulary-sized
    * results); the floor prunes the bigram table BEFORE the two
    * vocabulary equi-joins; N is a one-row broadcast (the t35
    * corpus-total convention). Top-20 is a single-reducer
    * TakeOrderedAndProject over the floored survivors.
    */
  def pmiCollocations(s: SparkSession, dir: String, minCount: Long = 5L): DataFrame = {
    import s.implicits._
    val tk = documents(s, dir)
      .select($"doc_id", toks($"text").as("t"))
      .repartition($"doc_id")
    val uni = tk.select(explode($"t").as("term"))
      .groupBy($"term").agg(count(lit(1)).as("c"))
    val big = tk.select(explode(expr(
        "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i+1] AS w2))")).as("bg"))
      .select($"bg.w1", $"bg.w2")
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("c_ab"))
      .filter($"c_ab" >= minCount)
    // N = Σ (tokens−1): the adjacent-pair total without a second
    // explode pass (integer arithmetic on the already-projected array).
    val nTotal = tk.agg(
      sum(greatest(size($"t") - 1, lit(0)).cast("long")).as("n_big"))
    big
      .join(uni.toDF("w1", "c_a"), Seq("w1"))
      .join(uni.toDF("w2", "c_b"), Seq("w2"))
      .crossJoin(broadcast(nTotal))
      .select(concat_ws(" ", $"w1", $"w2").as("bigram"),
        $"c_ab", $"c_a", $"c_b",
        (($"c_ab" * $"n_big").cast("double") /
          ($"c_a" * $"c_b").cast("double")).as("pmi_ratio"))
      .orderBy($"pmi_ratio".desc, $"bigram")
      .limit(20)
  }

  /** Order-sensitive document fingerprint: polynomial rolling hash over
    * the per-token md5 hashes, via the codegen'd
    * [[graft.functions.RollingHash]] (one static call per row — see
    * TextHashes.scala for the fold-replacement rationale).
    */
  def rollingFingerprints(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .select($"doc_id",
        graft.functions.TextHashes.rolling_hash($"text").as("rolling_hash"))
      .orderBy($"doc_id")
  }

  /** Top-5 terms per source via the typed [[graft.functions.TopKTerms]]
    * aggregator — bounded k-entry partial buffers instead of a window's
    * full per-partition sort (see the Aggregator's scaladoc for the
    * shuffle math). The oracle checks it against the window formulation,
    * proving the two are equivalent.
    */
  def topTermsPerSource(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = documents(s, dir)
      .select($"source", explode(toks($"text")).as("term"))
      .groupBy($"source", $"term").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)]
    counts.groupByKey(_._1)
      .agg(new graft.functions.TopKTerms(5).toColumn.name("topk"))
      .toDF("source", "topk")
      .select($"source", posexplode($"topk"))
      .select($"source", ($"pos" + 1).cast("long").as("rank"),
        $"col.term".as("term"), $"col.n".as("n"))
      .orderBy($"source", $"rank")
  }

  /** The end-to-end training-set selection pipeline — the composite the
    * individual operators exist for: keep a document iff
    *  (1) its quality score clears the bar,
    *  (2) it is the canonical (min doc_id) member of its exact-duplicate
    *      fingerprint group, and
    *  (3) it is not the junior member of any near-duplicate pair
    *      (shingle Jaccard ≥ 0.3 — the senior doc survives).
    * Plan shape: one narrow scan feeds the quality filter; dedup checks
    * are two anti-join-style probes against aggregates — at 100 TB
    * these are the same LSH/fingerprint structures, just persisted.
    */
  def trainingSelection(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = toks($"text")
    val nTok = size(t).cast("double")
    val quality =
      lit(0.4) * (lit(1.0) - size(filter(t, c => c.isin(Stopwords: _*))).cast("double") / nTok) +
      lit(0.3) * (size(array_distinct(t)).cast("double") / nTok) +
      lit(0.3) * least(nTok / lit(50.0), lit(1.0))
    val scored = documents(s, dir).select($"doc_id", quality.as("quality"))
      .filter($"quality" >= 0.8)

    val canonical = fingerprints(s, dir)
      .select($"min_doc_id".as("doc_id"))

    val juniors = graft.ops.Dedup.shingleJaccardPairs(s, dir)
      .select($"doc_b".as("doc_id")).distinct()

    scored
      .join(canonical, Seq("doc_id"), "left_semi")
      .join(juniors, Seq("doc_id"), "left_anti")
      .orderBy($"doc_id")
  }

  /** Text normalization — the canonical pre-tokenization cleanup pass:
    * lowercase, strip non-alphanumerics to spaces, collapse runs of
    * whitespace, trim. Emits the cleaned text plus before/after lengths
    * (narrow map, no shuffle — at 100 TB this runs fused into whatever
    * consumes it).
    */
  def normalizeText(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cleaned = trim(regexp_replace(
      regexp_replace(lower($"text"), "[^a-z0-9 ]", " "), " +", " "))
    documents(s, dir)
      .select($"doc_id",
        length($"text").cast("long").as("raw_len"),
        cleaned.as("clean_text"),
        length(cleaned).cast("long").as("clean_len"))
      .orderBy($"doc_id")
  }

  /** TF-IDF top-5 terms per source: tf = term count within a source's
    * corpus, df = number of sources containing the term, idf =
    * ln(n_sources / df). One shuffle builds the (source, term) counts,
    * a vocab-sized aggregate derives df, and n_sources arrives as a
    * one-row broadcast (scalar cross join — never a per-row subquery).
    * The final ranking windows over the aggregated vocab table, not the
    * corpus, so its input is bounded by |sources| × |vocab| regardless
    * of corpus size. Expression structure (cast-then-divide-then-ln) is
    * identical to the oracle for bit-reproducible doubles.
    */
  def tfIdf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tf = documents(s, dir)
      .select($"source", explode(toks($"text")).as("term"))
      .groupBy($"source", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val nSources = documents(s, dir).agg(countDistinct($"source").as("n_sources"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(nSources))
      // platform_ln for the same reason as t20: the idf ratio set is
      // data-dependent (grows with the source count), so only the
      // libm-exact ln is guaranteed to match the oracle at every SF.
      .withColumn("tfidf",
        $"tf".cast("double") * graft.functions.VectorFunctions.platform_ln(
          $"n_sources".cast("double") / $"df".cast("double")))
    val w = Window.partitionBy($"source").orderBy($"tfidf".desc, $"term")
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 5)
      .select($"source", $"rank", $"term", $"tf", $"df", $"tfidf")
      .orderBy($"source", $"rank")
  }

  /** Deterministic train/val/test assignment by content-free hash
    * sharding: bucket = md5(doc_id) mod 100, split by 80/10/10. The
    * canonical way to partition a 100 TB corpus — no RNG state, no
    * shuffle, stable under reruns and backfills (a doc's split never
    * changes when the corpus grows), and expressible identically in any
    * engine. One narrow scan, zero exchanges before the presentation
    * sort.
    */
  def hashSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bucket = expr(
      "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint) % 100")
    documents(s, dir)
      .select($"doc_id", $"source", bucket.as("bucket"))
      .withColumn("split",
        when($"bucket" < 80, "train").when($"bucket" < 90, "val").otherwise("test"))
      .orderBy($"doc_id")
  }

  /** Deterministic stratified sampling — rebalancing an over-
    * represented stratum is the step between corpus profiling and
    * training-set cut. Each language keeps a fixed share (en 25 %,
    * de/fr 50 %, es 75 %, zh 100 %) decided by the same md5 bucket
    * primitive as [[hashSplit]], so the sample is rerun-stable: a doc
    * is in or out forever, independent of partitioning, corpus growth,
    * or which executor saw it — `df.sample()` guarantees none of that.
    *
    * Scale shape: a narrow scan + filter (no shuffle at all before the
    * presentation sort); the per-stratum rate is a 5-arm CASE on a
    * column already read. At 100 TB this is the exact plan you want —
    * sampling must never cost a shuffle.
    */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bucket = expr(
      "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint) % 100")
    val rate = when($"lang" === "en", 25)
      .when($"lang" === "de" || $"lang" === "fr", 50)
      .when($"lang" === "es", 75)
      .otherwise(100)
    documents(s, dir)
      .select($"doc_id", $"lang", $"source", bucket.as("bucket"))
      .filter($"bucket" < rate)
      .orderBy($"doc_id")
  }

  /** Unigram language-model score — the model-free stand-in for the
    * perplexity filter every corpus-quality pipeline runs: each doc's
    * mean negative log-probability under the corpus's own unigram
    * distribution. Fluent/common text scores low, gibberish and rare-
    * token soup score high. Float discipline: per-doc contributions are
    * folded in TERM ORDER (sort_array + aggregate, left-to-right, `0.0
    * + x` exact), so the sum is bit-identical in any engine at any
    * parallelism — a plain float sum() over a shuffle would not be.
    *
    * Scale shape: term frequencies are a vocabulary-sized aggregate,
    * the corpus total a one-row broadcast, and the per-(doc, term)
    * grouping bounds the collect_list at each doc's distinct-term
    * count. Two shuffles (term join, doc group), both map-combined.
    */
  def unigramLogProb(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tok = documents(s, dir).select($"doc_id", explode(toks($"text")).as("term"))
    val tf = tok.groupBy($"term").agg(count(lit(1)).as("cnt"))
    // corpus total derived from tf — the tokenizing scan runs twice
    // (tf, dt), not three times
    val tot = tf.agg(sum($"cnt").as("total_tokens"))
    val dt = tok.groupBy($"doc_id", $"term").agg(count(lit(1)).as("n_dt"))
    dt.join(tf, Seq("term"))
      .crossJoin(broadcast(tot))
      // platform_ln, not log: Spark's builtin is StrictMath-based and
      // differs from DuckDB's libm ln by 1 ULP on ~4 % of ratios —
      // invisible at sf0.01's vocabulary, a 200-row hash mismatch at
      // sf0.1 (found by the sf0.1 oracle sweep, round 9).
      .withColumn("contrib", -$"n_dt" * graft.functions.VectorFunctions.platform_ln(
        $"cnt".cast("double") / $"total_tokens"))
      .groupBy($"doc_id")
      .agg(sum($"n_dt").as("n_tokens"),
           expr("aggregate(transform(sort_array(collect_list(struct(term, contrib))), x -> x.contrib), 0D, (a, x) -> a + x)").as("nll"))
      .withColumn("avg_nll", $"nll" / $"n_tokens")
      .orderBy($"doc_id")
  }

  /** t35 — quality-score CALIBRATION: does the cheap t02 heuristic
    * actually order documents by language-model score? Per source and
    * per quality quartile, the doc count, the quartile's quality
    * range, and the MEDIAN t20 unigram NLL. A mixing planner reads
    * this before trusting quality-gated selection (t11/t32): a source
    * whose NLL medians do not fall as quality rises is a source where
    * the heuristic is mis-calibrated (boilerplate scores "high
    * quality", or the stopword table misfits the language) and its
    * quality bar needs retuning.
    *
    * Both order statistics run the t54 quantized-cell discipline, so
    * NO aggregation buffer or window partition grows with the corpus:
    *  - quartile ASSIGNMENT: quality quantizes to a 1e-4 cell
    *    (quality ∈ [0,1] → ≤ 10001 cells per source); the per-source
    *    cell histogram's cumulative counts yield the three quartile
    *    bars (first cells where 4·cum ≥ k·n, k=1..3), and a doc's
    *    quartile is 1 + the number of bars strictly below its cell.
    *    Unlike ntile, ties (same cell) land in ONE quartile — the
    *    deterministic convention a frozen campaign wants, with no
    *    doc_id tiebreak and no per-source sort window.
    *  - median NLL: per (source, quartile) the exact lower median of
    *    the 1e-4-quantized avg_nll (first cell where 2·cum ≥ n —
    *    rank ceil(n/2)), emitted as the bar CELL (BIGINT), never a
    *    realized double (the t54 freeze rule). avg_nll ≤ ln(total
    *    tokens), so the cell domain is O(1e4·ln N) — logarithmic in
    *    corpus size.
    *
    * Exactness: counts, min/max, integer cell ranks — every emitted
    * statistic is order-free, and the quantization (floor(x·1e4)) is
    * one IEEE multiply+floor both engines compute bit-identically.
    *
    * Scale shape: the NLL side is t20's vocabulary-bounded pipeline;
    * every window partitions over a CELL HISTOGRAM (≤ 1e4-ish rows
    * per source / per group, set by the grid, not the corpus); the
    * final aggregate is 4·|sources| rows.
    */
  def qualityCalibration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nll = unigramLogProb(s, dir).select($"doc_id", $"avg_nll")
    val qc = qualityScored(s, dir)
      .select($"source", $"doc_id", $"quality",
        floor($"quality" * lit(1e4)).as("q_cell"))
    // Per-source quality-cell histogram → cumulative counts → the
    // three quartile bar cells. The window input is the histogram
    // (≤ 10001 rows per source by the grid), never the doc table.
    val hist = qc.groupBy($"source", $"q_cell").agg(count(lit(1)).as("n_cell"))
    val wCum = Window.partitionBy($"source").orderBy($"q_cell")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy($"source")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val bars = hist
      .withColumn("cum", sum($"n_cell").over(wCum))
      .withColumn("n_src", sum($"n_cell").over(wAll))
      .groupBy($"source")
      .agg(min(when($"cum" * 4 >= $"n_src", $"q_cell")).as("b1"),
        min(when($"cum" * 4 >= $"n_src" * 2, $"q_cell")).as("b2"),
        min(when($"cum" * 4 >= $"n_src" * 3, $"q_cell")).as("b3"))
    val dq = qc.join(bars, "source")
      .withColumn("quartile", (lit(1) + ($"q_cell" > $"b1").cast("int")
        + ($"q_cell" > $"b2").cast("int")
        + ($"q_cell" > $"b3").cast("int")).cast("long"))
      .join(nll, "doc_id")
      .withColumn("nll_cell", floor($"avg_nll" * lit(1e4)))
    // ONE pass over the labeled frame (dq embeds the whole t20 NLL
    // pipeline — a second consumer would re-run it): the per-cell
    // pre-aggregate carries the doc counts AND the quality extrema,
    // so the group stats and the quantized median both fold out of
    // the same bounded cell histogram.
    val h2 = dq.groupBy($"source", $"quartile", $"nll_cell")
      .agg(count(lit(1)).as("n_cell"),
        min($"quality").as("cq_min"), max($"quality").as("cq_max"))
    val wCum2 = Window.partitionBy($"source", $"quartile").orderBy($"nll_cell")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll2 = Window.partitionBy($"source", $"quartile")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    h2.withColumn("cum", sum($"n_cell").over(wCum2))
      .withColumn("n_grp", sum($"n_cell").over(wAll2))
      .groupBy($"source", $"quartile")
      .agg(sum($"n_cell").as("n_docs"),
        min($"cq_min").as("q_min"), max($"cq_max").as("q_max"),
        min(when($"cum" * 2 >= $"n_grp", $"nll_cell")).as("med_nll_cell"))
      .orderBy($"source", $"quartile")
  }

  /** Bigram language-model score with add-one smoothing — t20's
    * unigram NLL upgraded to first-order context: each doc's mean
    * negative log-probability of its bigrams under the corpus's own
    * bigram model, P(w₂|w₁) = (c(w₁w₂)+1) / (c(w₁·)+V). Catches what
    * unigrams can't — a doc made of common words in impossible order
    * (shuffled text, keyword stuffing) scores high here while t20
    * scores it fluent. The Laplace prior keeps unseen transitions
    * finite without a backoff table.
    *
    * Float discipline: per-doc contributions fold in BIGRAM ORDER (the
    * t20/t22 recipe) with [[PlatformLn]], so sums are engine-exact.
    *
    * Scale shape: corpus bigram counts are a bigram-vocabulary-sized
    * aggregate, first-token totals RE-AGGREGATE that table (no third
    * scan of text), vocabulary is a one-row broadcast, and the
    * per-(doc, bigram) grouping bounds every collect_list at the doc's
    * distinct-bigram count.
    */
  def bigramLogProb(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.VectorFunctions.platform_ln
    val tk = documents(s, dir).select($"doc_id", toks($"text").as("t"))
    // Guard the descending-sequence trap: Spark's sequence(1, 0) yields
    // [1, 0] (implicit step -1) so a 1-token doc would evaluate
    // element_at(t, 0) and throw; DuckDB's generate_series(1, 0) is
    // empty and just omits the doc. Filtering to >=2 tokens matches
    // the oracle exactly (a bigram-less doc appears in neither).
    val bg = tk.filter(size($"t") >= 2).select($"doc_id", explode(expr(
      "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))")).as("bigram"))
    // ONE explode scan feeds every bigram table: corpus counts and
    // first-token totals RE-AGGREGATE the per-(doc, bigram) table
    // (identical subtrees → ReusedExchange evaluates the explode once),
    // instead of re-scanning text per table.
    val db = bg.groupBy($"doc_id", $"bigram").agg(count(lit(1)).as("n_db"))
    val cb = db.groupBy($"bigram").agg(sum($"n_db").as("cnt_bg"))
    val cf = cb.groupBy(substring_index($"bigram", " ", 1).as("w1"))
      .agg(sum($"cnt_bg").as("cnt_w1"))
    val v = tk.select(explode($"t").as("term"))
      .agg(count_distinct($"term").as("vocab"))
    db.join(cb, Seq("bigram"))
      .join(cf, substring_index($"bigram", " ", 1) === $"w1")
      .crossJoin(broadcast(v))
      .withColumn("contrib", -$"n_db".cast("double") * platform_ln(
        ($"cnt_bg" + lit(1L)).cast("double") / ($"cnt_w1" + $"vocab").cast("double")))
      .groupBy($"doc_id")
      .agg(sum($"n_db").as("n_bigrams"),
        expr("aggregate(transform(sort_array(collect_list(struct(bigram, contrib))), x -> x.contrib), 0D, (a, x) -> a + x)").as("nll"))
      .withColumn("avg_nll", $"nll" / $"n_bigrams")
      .orderBy($"doc_id")
  }

  /** Sequence packing — the step between a curated corpus and a
    * training run: documents are concatenated in a deterministic order
    * and cut into fixed token-budget sequences; this reports the
    * packing plan (which sequence each budget window starts, how many
    * docs and tokens land in it). A doc belongs to the sequence its
    * first token falls into (`cum_before div budget`), i.e. greedy
    * concat-then-cut packing.
    *
    * Scale shape: the running sum is a window partitioned by
    * (source, shard) where shard is the same md5 bucket primitive as
    * t14 — windows are bounded by the shard width, never a single
    * global sort, and the shard assignment is rerun-stable, so the
    * packing is reproducible across runs and cluster sizes. One
    * narrow scan + one bounded window + one aggregate.
    */
  def sequencePack(s: SparkSession, dir: String, budget: Int = 256): DataFrame = {
    import s.implicits._
    val shard = expr(
      "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint) % 8")
    val w = Window.partitionBy($"source", $"shard").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    documents(s, dir)
      .select($"source", $"doc_id", shard.as("shard"),
        size(toks($"text")).cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum($"n_tokens").over(w), lit(0L)))
      .withColumn("seq_id", expr(s"cum_before div $budget"))
      .groupBy($"source", $"shard", $"seq_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("seq_tokens"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .orderBy($"source", $"shard", $"seq_id")
  }

  /** Per-source distribution drift — KL(source ‖ corpus) over unigram
    * term distributions: the data-mixing monitor that tells a training
    * pipeline when one shard's language has wandered from the blend
    * (crawl drift, a broken extractor, an injected corpus). Low KL =
    * the source reads like the corpus; spikes localize the divergent
    * source without reading a single document.
    *
    * Float discipline: contributions fold in a SEGMENTED fixed order
    * (the t20 recipe, bounded): terms hash into 256 md5 segments, each
    * segment's contributions fold in term order, and the 256 segment
    * sums fold in segment order — one fixed association order, so the
    * sum is bit-identical in any engine at any parallelism, and no
    * aggregation buffer ever holds more than one segment (~|V_s|/256
    * expected). The round-11 form folded the WHOLE per-source
    * vocabulary in one collect_list buffer — exact, but at 100 TB a
    * web-scale source's vocabulary is a multi-GB single buffer in one
    * task; the segmented fold is the same deterministic sum with
    * buffers bounded by the segment width (PlanAuditSpec gates the
    * discipline).
    *
    * Scale shape: everything derives from ONE (source, term) aggregate
    * of the token explode — corpus term frequencies and per-source
    * totals re-aggregate it (map-combined, vocabulary-sized), and the
    * corpus total is a one-row broadcast. No second pass over text.
    */
  def sourceDivergence(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val st = documents(s, dir)
      .select($"source", explode(toks($"text")).as("term"))
      .groupBy($"source", $"term").agg(count(lit(1)).as("c_st"))
    val tf = st.groupBy($"term").agg(sum($"c_st").as("c_t"))
    val ns = st.groupBy($"source").agg(sum($"c_st").as("n_s"))
    val tot = tf.agg(sum($"c_t").as("n_total"))
    st.join(tf, Seq("term")).join(ns, Seq("source")).crossJoin(broadcast(tot))
      // platform_ln, not log: Spark's log is StrictMath-based and
      // differs from DuckDB's libm ln by 1 ULP on ~4 % of these ratios.
      .withColumn("contrib",
        ($"c_st".cast("double") / $"n_s".cast("double")) *
          graft.functions.VectorFunctions.platform_ln(
            ($"c_st".cast("double") * $"n_total".cast("double")) /
              ($"n_s".cast("double") * $"c_t".cast("double"))))
      .withColumn("seg", segOf($"term"))
      .groupBy($"source", $"seg")
      .agg(count(lit(1)).as("n_terms_seg"), sum($"c_st").as("n_tokens_seg"),
        expr(segFold).as("f_seg"))
      .groupBy($"source")
      .agg(sum($"n_terms_seg").as("n_terms"), sum($"n_tokens_seg").as("n_tokens"),
        expr(outerFold).as("kl"))
      .orderBy($"source")
  }

  /** d37 — CURATION IMPACT: KL(post-dedup ‖ pre-dedup) of each
    * source's unigram distribution, where post = the corpus after
    * applying d27's decision table (the exact keep set
    * `writeCuratedCorpus` ships). The before/after audit a curation
    * run publishes next to its savings report: d30 says how many
    * tokens left; this says whether what remains still READS like the
    * source (near-zero = dedup removed redundancy without skewing the
    * language; a spike = the drop set was concentrated in one kind of
    * text). Well-defined without smoothing: the kept corpus is a
    * subset, so every post-distribution term has pre-mass.
    *
    * Float discipline: the t22 segmented fixed-order fold with
    * [[PlatformLn]] — bit-identical across engines at any
    * parallelism, buffers segment-bounded.
    *
    * Scale shape: ONE token explode with the broadcast drop flag
    * joined per document BEFORE the explode, one (source, term)
    * aggregate carrying both counts, per-source totals re-aggregated
    * — the drop list is the only extra input vs t22, and it is
    * label-sidecar-sized.
    */
  def curationShift(s: SparkSession, dir: String, cap: Int = 64): DataFrame = {
    import s.implicits._
    val dropped = graft.ops.Dedup.canonicalSelection(s, dir, cap)
      .filter(!$"kept").select($"doc_id").withColumn("is_dropped", lit(true))
    // No broadcast hint (the d30 rule): the drop set scales with the
    // corpus's duplicate fraction — shuffle equi-join, AQE decides.
    val tok = documents(s, dir)
      .join(dropped, Seq("doc_id"), "left")
      .select($"source", coalesce($"is_dropped", lit(false)).as("dropped"),
        explode(toks($"text")).as("term"))
    val st = tok.groupBy($"source", $"term")
      .agg(count(lit(1)).as("c_pre"),
        sum(when($"dropped", 0L).otherwise(1L)).as("c_post"))
    val ns = st.groupBy($"source")
      .agg(sum($"c_pre").as("n_pre"), sum($"c_post").as("n_post"))
    st.filter($"c_post" > 0)
      .join(ns, Seq("source"))
      .withColumn("contrib",
        ($"c_post".cast("double") / $"n_post".cast("double")) *
          graft.functions.VectorFunctions.platform_ln(
            ($"c_post".cast("double") * $"n_pre".cast("double")) /
              ($"n_post".cast("double") * $"c_pre".cast("double"))))
      .withColumn("seg", segOf($"term"))
      .groupBy($"source", $"seg")
      .agg(count(lit(1)).as("n_terms_seg"), sum($"c_post").as("n_tok_seg"),
        expr(segFold).as("f_seg"))
      .groupBy($"source")
      .agg(sum($"n_terms_seg").as("n_terms_post"),
        sum($"n_tok_seg").as("n_tokens_post"),
        expr(outerFold).as("kl_shift"))
      .orderBy($"source")
  }

  /** 256-way md5 term segmentation + the two-level deterministic fold
    * shared by t22/t24 (applies to a column named `term`): within a
    * segment contributions fold in term order, segment sums fold in
    * segment order. Both levels are the same `0D`-seeded left fold as
    * t20, so the association order is fixed and engine-exact while
    * every buffer is segment-bounded.
    */
  private[ops] def segOf(term: Column): Column =
    expr("cast(conv(substring(md5(term), 1, 2), 16, 10) as bigint)")

  private[ops] val segFold =
    "aggregate(transform(sort_array(collect_list(struct(term, contrib))), x -> x.contrib), 0D, (a, x) -> a + x)"

  private[ops] val outerFold =
    "aggregate(transform(sort_array(collect_list(struct(seg, f_seg))), x -> x.f_seg), 0D, (a, x) -> a + x)"

  /** Temperature-scaled source resampling — the multinomial α-rebalance
    * (α = 0.5, the mT5/XLM-R recipe) that keeps dominant sources from
    * drowning small ones in the training mix: target share q_s ∝ p_s^α,
    * realized downsample-only, so the keep rate reduces to
    * r_s = (n_min / n_s)^(1−α) = sqrt(n_min / n_s) — no normalization
    * SUM anywhere, so every float step (IEEE divide, sqrt, multiply) is
    * correctly rounded and bit-identical across engines; max/min are
    * order-free. The keep decision reuses the t14/t18 md5-bucket
    * primitive (parts-per-million resolution), so the sample is
    * rerun-stable and independent of partitioning.
    *
    * Scale shape: per-source token totals are a 5-row aggregate, the
    * corpus minimum a one-row broadcast, and the selection itself a
    * narrow scan + broadcast-joined constant rate — no shuffle touches
    * document text.
    */
  def temperatureResample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bucket = expr(
      "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint) % 1000000")
    val docs = documents(s, dir)
      .select($"source", $"doc_id", size(toks($"text")).cast("long").as("n_tokens"))
    val ns = docs.groupBy($"source").agg(sum($"n_tokens").as("n_s"))
    val minNs = ns.agg(min($"n_s").as("n_min"))
    val rates = ns.crossJoin(broadcast(minNs))
      .select($"source",
        sqrt($"n_min".cast("double") / $"n_s".cast("double")).as("rate"))
    docs.join(broadcast(rates), Seq("source"))
      .withColumn("bucket", bucket)
      .filter($"bucket".cast("double") < $"rate" * 1000000.0)
      .select($"source", $"doc_id", $"n_tokens", $"rate")
      .orderBy($"doc_id")
  }

  /** Mixture-realization plan — the step BEFORE t23's sampling: given
    * per-source target weights (parts-per-million), find the largest
    * total token budget T the corpus can realize downsample-only
    * (T = min_s ⌊n_s·10⁶ / ppm_s⌋ — the binding source caps the run),
    * then per source the kept-token allocation ⌊ppm_s·T / 10⁶⌋, its
    * utilization of the source, and whether it is the binding one.
    * This is what a mixture spec compiles to before any doc is touched:
    * which source limits the run, and how much of each source ships.
    * All math is BIGINT (floor divides), so every cell is engine-exact.
    * Weights here derive from the source suffix (20–60 % by index mod
    * 5) — a stand-in for the config a real run broadcasts.
    *
    * Scale shape: one narrow scan → a |sources|-row aggregate; the
    * budget minimum is a one-row broadcast folded back over the tiny
    * aggregate. Document text is never rescanned.
    */
  def mixturePlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ns = documents(s, dir)
      .select($"source", size(toks($"text")).cast("long").as("n_tokens"))
      .groupBy($"source").agg(sum($"n_tokens").as("n_s"))
      .withColumn("ppm",
        lit(200000L) + lit(100000L) *
          (regexp_extract($"source", "(\\d+)", 1).cast("long") % 5L))
      .withColumn("max_t", expr("n_s * 1000000 div ppm"))
    val budget = ns.agg(min($"max_t").as("t_budget"))
    ns.crossJoin(broadcast(budget))
      .select($"source", $"n_s".as("n_tokens"), $"ppm",
        expr("ppm * t_budget div 1000000").as("keep_tokens"),
        ($"max_t" === $"t_budget").as("is_binding"))
      .withColumn("utilization",
        $"keep_tokens".cast("double") / $"n_tokens".cast("double"))
      .orderBy($"source")
  }

  /** Cross-document novelty: per document, the fraction of its
    * distinct shingles that appear NOWHERE else in the corpus. The
    * inverse signal of boilerplate — a doc whose shingles are all
    * corpus-unique is fresh content; a doc at 0 novelty is assembled
    * entirely from text that exists elsewhere (t17 measures repetition
    * WITHIN a doc; this measures it ACROSS the corpus).
    *
    * Scale shape: one shingle explode feeds both sides of a df
    * aggregate + equi-join on the shingle hash — the same inverted
    * index as d04/t16, co-partitioned so the join adds no extra
    * shuffle. Output is one row per doc with ≥1 shingle.
    */
  def noveltyScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // The shared shingle sidecar (CorpusIndexes) — same inverted index
    // as d04/d12/d17, built once per run.
    val sh = graft.ops.CorpusIndexes.shingles(s, dir)
      .select($"doc_id", $"shash")
    val df = sh.groupBy($"shash").agg(count(lit(1)).as("df"))
    sh.join(df.hint("merge"), Seq("shash"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
           sum(when($"df" === 1, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novel_frac", $"n_novel".cast("double") / $"n_shingles")
      .orderBy($"doc_id")
  }

  /** Document-length histogram in fixed 200-char bins — the corpus
    * profile every curation run starts from. Integer bin math keeps it
    * engine-exact; one aggregate, bin-count-sized output regardless of
    * corpus size.
    */
  def lengthHistogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .select($"doc_id", floor($"n_chars" / 200.0).cast("long").as("bin"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("bin_lo", ($"bin" * 200).cast("long"))
      .select($"bin", $"bin_lo", $"n_docs")
      .orderBy($"bin")
  }

  /** Benchmark decontamination — the training-pipeline op that near-dup
    * dedup does NOT cover: find corpus documents containing any n-token
    * run from a held-out benchmark set (here a deterministic ~1%
    * doc_id slice standing in for the eval suite). n = 4 on this
    * synthetic corpus so the check is non-trivial (its 31-word random
    * text shares no longer runs); real deployments use 8-13-gram runs —
    * the knob is one literal. Grams come from the
    * codegen'd [[graft.functions.NGramHashes]]; the benchmark gram set
    * is tiny by nature, so the membership probe broadcasts it and the
    * corpus streams through one scan — at 100 TB this is a broadcast
    * semi-join (or a bloom prefilter, see SourcesSpec2) against a gram
    * set that fits in memory, never a corpus shuffle.
    */
  def contamination(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextHashes.ngram_hashes
    val docs = documents(s, dir)
    docs.filter($"doc_id" % 97 =!= 0)
      .select($"doc_id", explode(ngram_hashes($"text", 4)).as("g"))
      .join(CorpusIndexes.benchGrams(s, dir), "g")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_hits"))
      .orderBy($"doc_id")
  }

  /** t34 — SPAN-level decontamination: where t16 says WHICH documents
    * collide with the benchmark gram set, this says WHERE and HOW MUCH
    * — per contaminated doc every hit gram POSITION (multiplicity, not
    * t16's distinct-gram count), the first/last hit, and the
    * covered-token budget: the length of the union of the [pos, pos+3]
    * intervals a scrubber must cut to remove every benchmark 4-gram.
    * The interval union is gaps-and-islands over the hit positions
    * (first hit charges 4 tokens, each later hit charges
    * min(gap, 4)), so the scrub plan is integer-exact.
    *
    * Scale shape: the t16 broadcast semi-join with posexplode instead
    * of explode; the lag window partitions by doc_id over HIT rows
    * only (sparse by construction — a heavily-hit doc is being cut
    * anyway), never over the corpus gram stream.
    */
  def spanDecontamination(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextHashes.ngram_hashes_all
    val docs = documents(s, dir)
    // ngram_hashes_all, NOT ngram_hashes: the membership form dedups
    // grams, so posexplode over it shifts positions one past a doc's
    // first repeated gram (the sf0.1 sweep caught 2 such docs).
    val hits = docs.filter($"doc_id" % 97 =!= 0)
      .select($"doc_id", posexplode(ngram_hashes_all($"text", 4)))
      .select($"doc_id", $"pos".cast("long").as("pos"), $"col".as("g"))
      .join(CorpusIndexes.benchGrams(s, dir), "g")
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val agg = hits
      .withColumn("gap", $"pos" - lag($"pos", 1).over(w))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_hit_positions"),
        min($"pos").as("first_pos"), max($"pos").as("last_pos"),
        sum(when($"gap".isNull, lit(4L))
          .otherwise(least($"gap", lit(4L)))).as("covered_tokens"))
    agg.join(docs.select($"doc_id",
        size(toks($"text")).cast("long").as("n_tokens")), Seq("doc_id"))
      .withColumn("frac_covered",
        $"covered_tokens".cast("double") / $"n_tokens".cast("double"))
      .select($"doc_id", $"n_hit_positions", $"first_pos", $"last_pos",
        $"covered_tokens", $"n_tokens", $"frac_covered")
      .orderBy($"doc_id")
  }

  /** Approximate distinct terms per source (HyperLogLog++) next to the
    * exact count — the 100 TB path is the approx one (constant memory,
    * one pass); exact is there to bound the sketch.
    *
    * The HLL estimate itself is engine-specific, so the oracle-checkable
    * output is (exact count, within_tol): the sketch runs at rsd=0.01 and
    * the query asserts |approx - exact| <= 5% * exact as a boolean column
    * that must be all-true. The oracle recomputes the exact count and
    * emits TRUE, making rows+schema+hash exact again while still
    * executing (and gating) the approximate path.
    */
  def approxDistinctTerms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Mixing countDistinct with a non-distinct aggregate makes Catalyst
    // rewrite through an Expand that doubles every input row. HLL
    // insertion is idempotent, so sketching the DISTINCT (source, term)
    // pairs gives the bit-identical estimate — and the distinct is a
    // map-side partial aggregate, so the shuffle carries unique pairs
    // (bounded by vocabulary, not corpus: the 100 TB shape).
    documents(s, dir)
      .select($"source", explode(toks($"text")).as("term"))
      .distinct()
      .groupBy($"source")
      .agg(approx_count_distinct($"term", 0.01).as("approx_terms"),
           count(lit(1)).as("exact_terms"))
      .select($"source", $"exact_terms",
        (abs($"approx_terms" - $"exact_terms") <= $"exact_terms" * 0.05)
          .as("within_tol"))
      .orderBy($"source")
  }

  /** Repetition-based quality filters — the Gopher-style axis t02's
    * length/punctuation/stopword score does not cover: documents whose
    * text repeats itself (boilerplate loops, template stutter, token
    * runs) are flagged by three integer-exact signals per doc:
    *
    *  - `top_token_n`: occurrences of the most frequent token
    *    (flag if > n_tokens/6),
    *  - `top_bigram_n`: occurrences of the most frequent adjacent
    *    bigram, via lead() so the positions pipeline is reused — never
    *    `transform(sequence, i -> arr[i])` indexing (flag if
    *    > (n_tokens-1)/12),
    *  - `max_run`: the longest run of one token repeated consecutively,
    *    gaps-and-islands over (pos − row_number per (doc, token))
    *    (flag if ≥ 3).
    *
    * `rep_ok` composes the three. All thresholds compare integers
    * (count·k ≤ total), so the flag is bit-deterministic — no float
    * ratios. Shuffles: one by (doc_id, tok) for counts+runs, one by
    * doc_id for the bigram window and final stats — all key-bounded,
    * no self-joins.
    */
  def repetitionFilters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tok = documents(s, dir)
      .select($"doc_id", posexplode(toks($"text")))
      .select($"doc_id", ($"pos" + 1).cast("long").as("pos"), $"col".as("tok"))
    val tc = tok.groupBy($"doc_id", $"tok").agg(count(lit(1)).as("c"))
    val tokstats = tc.groupBy($"doc_id").agg(
      sum($"c").as("n_tokens"), count(lit(1)).as("n_distinct"),
      max($"c").as("top_token_n"))
    val wb = Window.partitionBy($"doc_id").orderBy($"pos")
    val bgstats = tok
      .select($"doc_id", concat($"tok", lit(" "), lead($"tok", 1).over(wb)).as("bigram"))
      .filter($"bigram".isNotNull)
      .groupBy($"doc_id", $"bigram").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(max($"c").as("top_bigram_n"))
    val wr = Window.partitionBy($"doc_id", $"tok").orderBy($"pos")
    val rstats = tok.withColumn("grp", $"pos" - row_number().over(wr))
      .groupBy($"doc_id", $"tok", $"grp").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(max($"c").as("max_run"))
    tokstats.join(bgstats, "doc_id").join(rstats, "doc_id")
      .select($"doc_id", $"n_tokens", $"n_distinct", $"top_token_n",
        $"top_bigram_n", $"max_run",
        ($"max_run" <= 2 && $"top_token_n" * 6 <= $"n_tokens" &&
         $"top_bigram_n" * 12 <= $"n_tokens" - 1).as("rep_ok"))
      .orderBy($"doc_id")
  }

  /** Per-source Shannon entropy of the unigram term distribution —
    * H_s = −Σ_t p_t ln p_t — plus the vocabulary-normalized form
    * H_s / ln |V_s| ∈ [0,1]. The information-theoretic companion of
    * t22's KL divergence: KL localizes WHICH source drifted from the
    * blend; entropy tells whether a source is degenerate in itself
    * (near 0 = a few tokens dominate — templated/boilerplate text;
    * near 1 = uniform usage). Training mixtures weight high-entropy
    * sources up because they carry more information per token.
    *
    * Float discipline: contributions fold in the t22 SEGMENTED fixed
    * order (256 md5 term segments, term order within a segment,
    * segment order across sums) with [[PlatformLn]], so the sums are
    * bit-identical in any engine at any parallelism and no aggregation
    * buffer holds more than one segment's terms — the 100 TB-safe form
    * of the ordered fold (see t22's scaladoc for the buffer argument).
    *
    * Scale shape: everything derives from ONE (source, term) aggregate
    * of the token explode (map-side combined, vocabulary-sized);
    * per-source totals re-aggregate it and broadcast back. No second
    * pass over text, no window over the corpus.
    */
  def sourceEntropy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.VectorFunctions.platform_ln
    val st = documents(s, dir)
      .select($"source", explode(toks($"text")).as("term"))
      .groupBy($"source", $"term").agg(count(lit(1)).as("c_st"))
    val ns = st.groupBy($"source").agg(sum($"c_st").as("n_s"))
    st.join(broadcast(ns), Seq("source"))
      .withColumn("p", $"c_st".cast("double") / $"n_s".cast("double"))
      .withColumn("contrib", -($"p" * platform_ln($"p")))
      .withColumn("seg", segOf($"term"))
      .groupBy($"source", $"seg")
      .agg(count(lit(1)).as("n_terms_seg"), sum($"c_st").as("n_tokens_seg"),
        expr(segFold).as("f_seg"))
      .groupBy($"source")
      .agg(sum($"n_terms_seg").as("vocab"), sum($"n_tokens_seg").as("n_tokens"),
        expr(outerFold).as("entropy"))
      .withColumn("norm_entropy",
        $"entropy" / platform_ln($"vocab".cast("double")))
      .orderBy($"source")
  }

  /** t45 — PER-DOCUMENT CHARACTER ENTROPY: Shannon entropy of each
    * doc's character distribution plus the charset-normalized form —
    * the gibberish/boilerplate detector that works BELOW the token
    * level (t24 scores sources by token entropy; a base64 blob or a
    * run of one repeated character has normal token shape but
    * degenerate char entropy, the classic pretraining-quality fast
    * filter alongside t05's ratio heuristics).
    *
    * Float discipline: H = ln n − (Σ_c c·ln c)/n — the INTEGER-LOG
    * decomposition, not −Σ p·ln p. `Math.log` and DuckDB's libm log
    * disagree by 1 ulp on ~3·10⁻⁵ of inputs, and the fraction form
    * hit one (ln(24/325) at sf0.1); logs of the corpus's integer
    * counts are verified divergence-free (all 567 distinct c/n/k
    * values across the three SFs, bit-compared Java-vs-glibc), and
    * the remaining float ops (c·ln c product, the segmented pinned-
    * order fold, ONE divide by n, one subtract) are IEEE-identical
    * in both engines. `norm_entropy` guards the one-char charset
    * (ln 1 = 0) to 0.0 instead of NaN.
    *
    * Scale shape: one char explode (fan-out = n_chars, the same order
    * as tokenization) → (doc, char) aggregate, map-side combined; the
    * per-doc total re-joins co-partitioned on doc_id; folds buffer at
    * most one doc's ≤|charset| chars per segment. Output is doc-sized.
    */
  def charEntropy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.VectorFunctions.platform_ln
    val st = documents(s, dir)
      .select($"doc_id", explode(split($"text", "")).as("term"))
      .filter($"term" =!= "")
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("c_st"))
    st.withColumn("contrib",
        $"c_st".cast("double") * platform_ln($"c_st".cast("double")))
      .withColumn("seg", segOf($"term"))
      .groupBy($"doc_id", $"seg")
      .agg(count(lit(1)).as("n_chars_seg"), sum($"c_st").as("n_total_seg"),
        expr(segFold).as("f_seg"))
      .groupBy($"doc_id")
      .agg(sum($"n_chars_seg").as("charset"), sum($"n_total_seg").as("n_chars"),
        expr(outerFold).as("s_clnc"))
      .withColumn("entropy",
        platform_ln($"n_chars".cast("double")) -
          $"s_clnc" / $"n_chars".cast("double"))
      .withColumn("norm_entropy",
        when($"charset" > 1, $"entropy" / platform_ln($"charset".cast("double")))
          .otherwise(lit(0.0)))
      .select($"doc_id", $"charset", $"n_chars", $"entropy", $"norm_entropy")
      .orderBy($"doc_id")
  }

  /** t28 — vocabulary-growth (Heaps-law) audit: cumulative distinct
    * vocabulary vs cumulative token count at ten corpus checkpoints
    * (doc-id deciles). The curve a data curator reads before sizing a
    * tokenizer vocabulary or estimating how much MORE data keeps
    * adding new types — sublinear growth flattening early means the
    * corpus is saturating (more of the same); a curve that keeps
    * climbing means the next shard still buys coverage.
    *
    * The distributed form never re-scans the corpus per checkpoint:
    * each token's FIRST-occurrence document (`min(doc_id)` over the
    * token explode — the same vocabulary-sized inverted-index shuffle
    * as d18/t24) assigns it to exactly one decile; per-decile new-type
    * counts and token counts then cumulate through a ten-row window.
    * The decile boundary is all-BIGINT floor division
    * (`(doc_id * 10) div n_docs`, the t27 discipline), so bucketing is
    * engine-exact; the type-token ratio is one exact integer division
    * per output row.
    *
    * Scale shape: one token explode → vocabulary-sized min-aggregate
    * (map-side combined); one narrow doc scan → 10-row aggregate; the
    * cumulative window runs over TEN rows, not the corpus. The one-row
    * doc-count aggregate is a broadcast crossJoin (whitelisted, t13
    * class).
    *
    * Id contract: the decile key `(doc_id * 10) div n_docs` assumes
    * doc_ids are 0-based and contiguous (the testdata fixture's
    * layout); 1-based or sparse ids would land the max id in an 11th
    * bucket and silently shift checkpoint semantics. ENFORCED at
    * runtime: the one-row count aggregate also carries min/max doc_id
    * and the driver asserts `min = 0 ∧ max = n_docs − 1` before the
    * plan runs — a 1-row collect, free at any corpus size. A global
    * `row_number` re-key would restore sparse-id support but costs a
    * single-partition sort at 100 TB; corpora with sparse ids should
    * pre-rank once at ingest instead.
    */
  def vocabGrowth(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = documents(s, dir)
    // One-row doc count, checkpointed: both decile branches reference
    // it, and each reference would otherwise re-run the count scan.
    // The same row carries the id-contract witness (min/max doc_id).
    val stats = d.agg(count(lit(1)).as("n_docs"),
      min($"doc_id").as("min_id"), max($"doc_id").as("max_id"))
      .localCheckpoint()
    val row = stats.head()
    val (nDocs, minId, maxId) = (row.getLong(0), row.getLong(1), row.getLong(2))
    require(minId == 0L && maxId == nDocs - 1L,
      s"t28 vocabGrowth requires 0-based contiguous doc_ids " +
        s"(got min=$minId max=$maxId n_docs=$nDocs); rank ids at ingest first")
    val n = stats.select($"n_docs")
    val docDeciles = d
      .select($"doc_id", size(toks($"text")).cast("long").as("n_toks"))
      .crossJoin(broadcast(n))
      .withColumn("b", expr("(doc_id * 10) div n_docs"))
      .groupBy($"b").agg(count(lit(1)).as("nd"), sum($"n_toks").as("nt"))
    val typeDeciles = d
      .select($"doc_id", explode(toks($"text")).as("term"))
      .groupBy($"term").agg(min($"doc_id").as("first_doc"))
      .crossJoin(broadcast(n))
      .withColumn("b", expr("(first_doc * 10) div n_docs"))
      .groupBy($"b").agg(count(lit(1)).as("nv"))
    val w = Window.orderBy($"b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docDeciles.join(typeDeciles, Seq("b"), "left")
      .withColumn("decile", $"b" + 1)
      .withColumn("cum_docs", sum($"nd").over(w))
      .withColumn("cum_tokens", sum($"nt").over(w))
      .withColumn("cum_vocab", sum(coalesce($"nv", lit(0L))).over(w))
      .withColumn("ttr", $"cum_vocab".cast("double") / $"cum_tokens".cast("double"))
      .select($"decile", $"cum_docs", $"cum_tokens", $"cum_vocab", $"ttr")
      .orderBy($"decile")
  }

  /** t30 — term-frequency spectrum with Good-Turing discounts: N_r =
    * how many vocabulary types occur exactly r times, plus the
    * Good-Turing re-estimate r* = (r+1)·N_{r+1}/N_r. The classic
    * audit row behind smoothing and coverage decisions: the singleton
    * band's share of total tokens (N_1/N) IS the Good-Turing estimate
    * of unseen-vocabulary mass — the companion number to t28's
    * saturation curve (t28 says how fast vocabulary grew; this says
    * how much probability mass the next shard's NEW types will carry).
    * A corpus whose spectrum lacks a fat singleton band is templated
    * (cross-check t17/t24); one that is all singletons won't support
    * a bigram LM (cross-check t26).
    *
    * Determinism: every column is either an exact integer or one exact
    * BIGINT÷BIGINT divide; the r* lead lookup is a window over
    * SPECTRUM-sized rows (distinct frequency values — dozens), never
    * the corpus.
    *
    * Scale shape: one token explode → vocabulary-sized count aggregate
    * (map-side combined) → spectrum-sized count-of-counts aggregate.
    * The corpus never shuffles twice; the window input is bounded by
    * the number of DISTINCT frequencies regardless of corpus size.
    */
  def freqSpectrum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tf = documents(s, dir)
      .select(explode(toks($"text")).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("r"))
    val spectrum = tf.groupBy($"r").agg(count(lit(1)).as("n_terms"))
    val w = Window.orderBy($"r")
    spectrum
      .withColumn("next_r", lead($"r", 1).over(w))
      .withColumn("next_n", lead($"n_terms", 1).over(w))
      .withColumn("r_star",
        when($"next_r" === $"r" + 1,
          (($"r" + 1) * $"next_n").cast("double") / $"n_terms".cast("double")))
      .select($"r", $"n_terms", $"r_star")
      .orderBy($"r")
  }

  /** t29 — source-pair Jaccard similarity over distinct vocabularies:
    * the SOURCE-level near-duplicate detector. Two feeds that are
    * mirrors of each other (a crawl and its re-crawl, a dump and its
    * fork) show near-identical token sets long before any document
    * pair is hashed — this matrix is the first thing to read when
    * deciding whether a whole source should be dropped rather than
    * deduped document by document (the d19 savings report's
    * upstream sibling).
    *
    * Scale shape: everything derives from the DISTINCT (source, term)
    * projection — vocabulary × sources sized, map-side combined, tiny
    * next to the corpus. The self-join is keyed on term, and its
    * fan-out is STRUCTURALLY bounded: a term in k sources emits
    * k·(k−1)/2 ≤ |sources|²/2 pair rows, so the worst-case output is
    * vocabulary · |sources|² — no df cap needed (compare d12, where
    * per-DOCUMENT fan-out does need one). Per-source set sizes are a
    * |sources|-row broadcast.
    */
  def sourceJaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // The distinct (source, term) projection is referenced three times
    // (both self-join sides + the size table) and the toDF renames keep
    // ReuseExchange from sharing the subtree — checkpoint the
    // vocabulary-sized table once so the corpus is scanned once, not
    // four times (at 100 TB this projection is the persisted sidecar).
    val st = documents(s, dir)
      .select($"source", explode(toks($"text")).as("term"))
      .distinct()
      .localCheckpoint()
    val inter = st.toDF("src_a", "term")
      .join(st.toDF("src_b", "term"), Seq("term"))
      .filter($"src_a" < $"src_b")
      .groupBy($"src_a", $"src_b").agg(count(lit(1)).as("n_common"))
    val sizes = st.groupBy($"source").agg(count(lit(1)).as("n_terms"))
    inter
      .join(broadcast(sizes.toDF("src_a", "n_a")), Seq("src_a"))
      .join(broadcast(sizes.toDF("src_b", "n_b")), Seq("src_b"))
      .withColumn("jaccard",
        $"n_common".cast("double") / ($"n_a" + $"n_b" - $"n_common").cast("double"))
      .select($"src_a", $"src_b", $"n_a", $"n_b", $"n_common", $"jaccard")
      .orderBy($"src_a", $"src_b")
  }

  /** Curriculum binning: within each source, documents are ranked by
    * the t02 quality score (doc_id tiebreak → a total order) and cut
    * into 4 equal-size phases with ntile — the curriculum-learning
    * schedule (train on phase 4 first or last, per recipe) realized as
    * a deterministic column. Output is the per-(source, phase) manifest
    * a training run consumes: doc count, quality range, token budget.
    *
    * Scale shape: the rank window partitions by SOURCE, so no global
    * sort ever happens — each window is bounded by its source's size.
    * At 100 TB with few huge sources, the same schedule comes from
    * broadcast approx-quantile cutpoints (the q23 sketch) instead of a
    * rank; the ntile form is the exact-arithmetic variant the oracle
    * can replay.
    */
  def curriculum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"source").orderBy($"quality", $"doc_id")
    qualityScored(s, dir)
      .withColumn("phase", ntile(4).over(w).cast("long"))
      .groupBy($"source", $"phase")
      .agg(count(lit(1)).as("n_docs"), min($"quality").as("q_min"),
        max($"quality").as("q_max"), sum($"n_tokens").as("phase_tokens"))
      .orderBy($"source", $"phase")
  }

  /** (source, doc_id, quality, n_tokens) — the t02 quality scoring
    * shared by the two curriculum forms (t25 exact ntile, t31 sketch)
    * and the d27 canonical-survivor selection.
    */
  private[ops] def qualityScored(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = toks($"text")
    val nTok = size(t).cast("double")
    val nStop = size(filter(t, c => c.isin(Stopwords: _*))).cast("double")
    val ttr = size(array_distinct(t)).cast("double") / nTok
    val stopRatio = nStop / nTok
    val lenScore = least(nTok / lit(50.0), lit(1.0))
    val quality = lit(0.4) * (lit(1.0) - stopRatio) + lit(0.3) * ttr + lit(0.3) * lenScore
    documents(s, dir)
      .select($"source", $"doc_id", quality.as("quality"),
        size(t).cast("long").as("n_tokens"))
  }

  /** t31 — the 100 TB form of t25's curriculum: phase boundaries come
    * from BROADCAST approx-quantile cutpoints (the q23 sketch, one
    * |sources|-row aggregate) instead of a per-source rank window. The
    * rank form is exact but pays a per-source sort whose partitions
    * scale with the biggest source — one web-scale source and the
    * window runs hot; the sketch form assigns each document its phase
    * with a narrow scan against three broadcast doubles, no window at
    * all on the assignment path.
    *
    * Oracle discipline (the t07/q23 tolerance pattern): the sketch
    * assignment is engine-specific, so the emitted manifest is the
    * EXACT ntile one (n_docs/phase_tokens per phase — recomputable by
    * the oracle) plus `agree_ok`, asserting per source that the sketch
    * agrees with the exact rank on ≥ 90 % of documents (an integer
    * ×10/×9 compare, engine-exact; the oracle emits TRUE). Ties and
    * quantile-rank conventions cost the sketch a few boundary
    * documents — InvariantSpec pins the measured agreement.
    *
    * Scale shape: one scored scan → the ntile manifest (audit arm,
    * exact, oracle-checkable) + one approx_percentile aggregate
    * (|sources| rows, broadcast back) → per-(source, phase) integer
    * agreement counts. The sketch never shuffles documents.
    */
  def curriculumSketch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = qualityScored(s, dir)
    val w = Window.partitionBy($"source").orderBy($"quality", $"doc_id")
    val exact = scored.withColumn("phase", ntile(4).over(w).cast("long"))
    val cuts = scored.groupBy($"source")
      .agg(expr("approx_percentile(quality, array(0.25D, 0.5D, 0.75D), 10000)")
        .as("cut"))
    val sw = Window.partitionBy($"source")
    exact.join(broadcast(cuts), Seq("source"))
      .withColumn("sketch_phase",
        lit(1L) + ($"quality" > $"cut" (0)).cast("long") +
          ($"quality" > $"cut" (1)).cast("long") +
          ($"quality" > $"cut" (2)).cast("long"))
      .groupBy($"source", $"phase")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("phase_tokens"),
        sum(($"sketch_phase" === $"phase").cast("long")).as("n_agree_ph"))
      .withColumn("agree_ok",
        sum($"n_agree_ph").over(sw) * 10 >= sum($"n_docs").over(sw) * 9)
      .select($"source", $"phase", $"n_docs", $"phase_tokens", $"agree_ok")
      .orderBy($"source", $"phase")
  }

  /** t32 — the CURATION FUNNEL: the per-source waterfall report a
    * curation campaign ships before a training run — how many
    * documents (and tokens) survive each gate, in pipeline order:
    *
    *   n_docs → n_exact (canonical member of its t04 fingerprint
    *   group) → n_near (not the junior of any d04 shingle-Jaccard
    *   pair) → n_quality (t02 score ≥ 0.8) → n_clean (not in the t16
    *   benchmark slice and sharing no 4-gram run with it) →
    *   tokens_kept (final survivors' token budget).
    *
    * This is t11's selection composite widened to the report the
    * mixture planner (t27) consumes: WHERE documents die, per source —
    * a source losing everything at the near-dup gate is a mirror
    * crawl (cross-check t29); one dying at quality is boilerplate
    * (t17/t24); one dying at decontamination overlaps the eval suite.
    *
    * Scale shape: every gate is an existing bounded structure — the
    * fingerprint aggregate (digest-keyed), the shared-sidecar shingle
    * pair join (CorpusIndexes, df-bounded), a narrow quality scan, the
    * broadcast gram semi-join (t16) — composed with left-semi/anti
    * probes on doc_id and reduced to a |sources|-row report. Documents
    * never shuffle whole.
    */
  def curationFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextHashes.ngram_hashes
    val t = toks($"text")
    val nTok = size(t).cast("double")
    val quality =
      lit(0.4) * (lit(1.0) - size(filter(t, c => c.isin(Stopwords: _*))).cast("double") / nTok) +
      lit(0.3) * (size(array_distinct(t)).cast("double") / nTok) +
      lit(0.3) * least(nTok / lit(50.0), lit(1.0))
    val docs = documents(s, dir).select($"source", $"doc_id",
      size(t).cast("long").as("n_tokens"), quality.as("quality"))

    val canonical = fingerprints(s, dir).select($"min_doc_id".as("doc_id"))
    val juniors = graft.ops.Dedup.shingleJaccardPairs(s, dir)
      .select($"doc_b".as("doc_id")).distinct()
    val contaminated = documents(s, dir).filter($"doc_id" % 97 =!= 0)
      .select($"doc_id", explode(ngram_hashes($"text", 4)).as("g"))
      .join(CorpusIndexes.benchGrams(s, dir), "g")
      .select($"doc_id").distinct()

    // Every gate is a boolean COLUMN (left joins, no filtering), so one
    // aggregate counts every funnel stage in one pass.
    val staged = docs
      .join(canonical.withColumn("is_canon", lit(true)), Seq("doc_id"), "left")
      .join(juniors.withColumn("is_junior", lit(true)), Seq("doc_id"), "left")
      .join(contaminated.withColumn("dirty", lit(true)), Seq("doc_id"), "left")
      .withColumn("exact_ok", $"is_canon".isNotNull)
      .withColumn("near_ok", $"exact_ok" && $"is_junior".isNull)
      .withColumn("quality_ok", $"near_ok" && $"quality" >= 0.8)
      .withColumn("clean_ok",
        $"quality_ok" && ($"doc_id" % 97 =!= 0) && $"dirty".isNull)
    staged.groupBy($"source").agg(
        count(lit(1)).as("n_docs"),
        sum($"exact_ok".cast("long")).as("n_exact"),
        sum($"near_ok".cast("long")).as("n_near"),
        sum($"quality_ok".cast("long")).as("n_quality"),
        sum($"clean_ok".cast("long")).as("n_clean"),
        sum(when($"clean_ok", $"n_tokens").otherwise(0L)).as("tokens_kept"))
      .orderBy($"source")
  }

  /** PII pattern surface shared by [[piiScan]] and its oracle: plain
    * ASCII regexes chosen to parse identically under Java regex (Spark
    * codegen) and RE2 (DuckDB) — character classes, bounded repeats and
    * `\b` only; no lookaround (RE2 has none).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** t33 — PII detection + redaction over ANY text column: per row the
    * match counts for the three standard scrub classes (email, NANP
    * phone, IPv4) and the redacted text with each match replaced by a
    * typed placeholder. The compliance gate every shipped training
    * corpus passes before tokenization — detection feeds the audit
    * report, redaction feeds the corpus that ships.
    *
    * Counts are computed on the ORIGINAL text (non-overlapping
    * leftmost-first in both engines), so redaction order cannot mask a
    * class; redaction applies email → phone → IPv4, deterministic
    * because the three patterns cannot overlap (emails require `@`,
    * the other two are digit-runs with different separators).
    *
    * Scale shape: a pure per-row projection — four codegen'd regex
    * passes, no shuffle, no UDF; at 100 TB this pipelines inside
    * whatever scan stage feeds it.
    */
  def piiScan(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", regexp_count(t, lit(EmailRe)).cast("long"))
      .withColumn("n_phones", regexp_count(t, lit(PhoneRe)).cast("long"))
      .withColumn("n_ipv4", regexp_count(t, lit(Ipv4Re)).cast("long"))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "[EMAIL]"),
            PhoneRe, "[PHONE]"),
          Ipv4Re, "[IP]"))
  }

  /** The t33 fixture: the corpus text with PII planted
    * DETERMINISTICALLY from doc_id (the WavCodec discipline — the
    * corpus itself is digit-free word salad, so a scan over it alone
    * would be vacuous). doc_id % 3 emails, doc_id % 2 phones, exactly
    * one IPv4 per document; the DuckDB oracle rebuilds the same string
    * from the same formula, so the hash check certifies detection
    * counts AND the redacted output byte for byte.
    */
  private[graft] def piiFixture(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).selectExpr("doc_id",
      """text
         || repeat(' contact user' || CAST(doc_id AS STRING)
                   || '@mail.example.com', CAST(doc_id % 3 AS INT))
         || repeat(' call 555-' || lpad(CAST(doc_id % 1000 AS STRING), 3, '0')
                   || '-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0'),
                   CAST(doc_id % 2 AS INT))
         || ' from ' || CAST(doc_id % 223 + 1 AS STRING)
         || '.' || CAST(doc_id % 256 AS STRING)
         || '.' || CAST((doc_id div 7) % 256 AS STRING)
         || '.' || CAST(doc_id % 254 + 1 AS STRING) AS text""")

  /** The registered t33 query: [[piiScan]] over [[piiFixture]]. */
  def piiScanQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    piiScan(piiFixture(s, dir), "text")
      .select($"doc_id", $"n_emails", $"n_phones", $"n_ipv4", $"redacted")
      .orderBy($"doc_id")
  }

  /** t37 — BM25 RANKING: the classic retrieval score (Robertson/
    * Lucene form) for a fixed three-term query ("hash join stream")
    * over the corpus, top-10 documents. TF-IDF (t13) profiles terms
    * per source; BM25 is the other direction — scoring DOCUMENTS for
    * a query — with the two extra ingredients t13 lacks: tf
    * saturation (k1) and document-length normalization (b).
    *
    *   idf(t)  = ln((N - df + 0.5) / (df + 0.5) + 1)      [always > 0]
    *   c(t, d) = idf(t) * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl/avgdl))
    *   score   = c(hash, d) + c(join, d) + c(stream, d)   [fixed order]
    *
    * Scale shape: per-document tf for a FIXED query needs no explode
    * and no (doc, term) shuffle at all — each tf is a codegen'd
    * `size(filter(tokens, = term))` inside the scan projection, so
    * the corpus is read exactly once, however many documents. The
    * corpus constants (N, Σdl, per-term df) reduce to ONE row and
    * return as a broadcast scalar cross join (the t13/t20
    * convention); the top-10 is a TakeOrderedAndProject. Double
    * determinism: avgdl is an exact long sum divided once (never
    * `avg`), idf goes through platform_ln, the three contributions
    * add in fixed literal order, and `2.2` is a literal on both
    * sides (computing k1+1 would differ from the literal by an ULP).
    */
  def bm25Rank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val terms = Seq("hash", "join", "stream")
    val t = toks($"text")
    val base = documents(s, dir).select(
      $"doc_id" +: size(t).cast("long").as("dl") +:
        terms.map(q => size(filter(t, c => c === q)).cast("long").as(s"tf_$q")): _*)
    val statCols = count(lit(1)).as("n_docs") +: sum($"dl").as("sum_dl") +:
      terms.map(q => sum(when(col(s"tf_$q") > 0, 1L).otherwise(0L)).as(s"df_$q"))
    val stats = base.agg(statCols.head, statCols.tail: _*)
    val avgdl = $"sum_dl".cast("double") / $"n_docs".cast("double")
    def contrib(q: String): Column = {
      val idf = graft.functions.VectorFunctions.platform_ln(
        ($"n_docs".cast("double") - col(s"df_$q").cast("double") + lit(0.5)) /
          (col(s"df_$q").cast("double") + lit(0.5)) + lit(1.0))
      idf * col(s"tf_$q").cast("double") * lit(2.2) /
        (col(s"tf_$q").cast("double") +
          lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * ($"dl".cast("double") / avgdl)))
    }
    val scored = base.crossJoin(broadcast(stats))
      .withColumn("score", contrib("hash") + contrib("join") + contrib("stream"))
    // Cut to 10 rows FIRST (TakeOrderedAndProject — per-partition
    // top-k, no global sort), then rank the survivors; the
    // single-task window only ever sees 10 rows.
    val top = scored.orderBy($"score".desc, $"doc_id").limit(10)
    val w = Window.orderBy($"score".desc, $"doc_id")
    top
      .withColumn("rank", row_number().over(w).cast("long"))
      .select($"rank", $"doc_id", $"tf_hash", $"tf_join", $"tf_stream", $"dl", $"score")
      .orderBy($"rank")
  }

  /** t41 — MULTI-SUITE DECONTAMINATION with attribution: t16 probes
    * ONE benchmark's grams; a real curation pipeline screens against
    * MANY eval suites at once and must report WHICH suite fired (the
    * attribution decides whether a doc is dropped, masked, or
    * escalated — suites have different licensing/severity). Two
    * fingerprint sets here (the t16 suite, doc_id ≡ 0 mod 97, and a
    * second at mod 89); candidates outside both suites probe the
    * UNION of labeled gram sets in ONE pass and aggregate per-suite
    * hit counts conditionally — adding a suite adds label rows, not
    * corpus passes.
    *
    * Scale shape: both fingerprints are suite-sized broadcasts (the
    * bench_grams discipline); the candidate side explodes once,
    * joins once, and aggregates by doc — per-doc output bounded by
    * docs with ≥1 hit in any suite.
    */
  /** ONE definition of eval-suite membership (the fixture's stand-in
    * for "this doc belongs to a held-out benchmark"): suite a =
    * doc_id ≡ 0 (mod 97), suite b = doc_id ≡ 0 (mod 89). Shared by
    * t41 and the c01 campaign's decontam stage so the two can never
    * silently diverge (in production this predicate is a membership
    * join against the external suite tables).
    */
  private[graft] def suiteMember(docId: Column): Column =
    docId % 97 === 0 || docId % 89 === 0

  def multiSuiteContamination(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextHashes.ngram_hashes
    val docs = documents(s, dir)
    def suiteGrams(mod: Int) = docs.filter($"doc_id" % mod === 0)
      .select(explode(ngram_hashes($"text", 4)).as("g")).distinct()
    val suites = suiteGrams(97).withColumn("suite", lit("a"))
      .unionByName(suiteGrams(89).withColumn("suite", lit("b")))
    docs.filter(!suiteMember($"doc_id"))
      .select($"doc_id", explode(ngram_hashes($"text", 4)).as("g"))
      .join(broadcast(suites), "g")
      .groupBy($"doc_id")
      .agg(sum(when($"suite" === "a", 1L).otherwise(0L)).as("n_hits_a"),
        sum(when($"suite" === "b", 1L).otherwise(0L)).as("n_hits_b"))
      .withColumn("verdict",
        when($"n_hits_a" > 0 && $"n_hits_b" > 0, "both")
          .when($"n_hits_a" > 0, "suite_a").otherwise("suite_b"))
      .orderBy($"doc_id")
  }

  /** t42 — EFFECTIVE VOCABULARY (perplexity of the source unigram
    * distribution): exp(H) — the number of equally-likely types that
    * would produce the same entropy — and its fraction of the actual
    * vocabulary. The interpretable form of t24's entropy: a source
    * whose eff_frac collapses is template/boilerplate-dominated even
    * when its raw vocabulary looks large — the corpus-mix diagnostic
    * read next to t27's mixture plan. exp goes through the new
    * [[graft.functions.PlatformExp]] (libm, matches DuckDB bit for
    * bit — Spark's builtin exp is StrictMath, one ULP off on this
    * data).
    *
    * Scale shape: t24's segmented exact fold does all corpus-sized
    * work (shared via the same frame); this is a projection over
    * |sources| rows.
    */
  def effectiveVocab(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.VectorFunctions.platform_exp
    sourceEntropy(s, dir)
      .select($"source", $"vocab", $"entropy",
        platform_exp($"entropy").as("eff_vocab"),
        (platform_exp($"entropy") / $"vocab".cast("double")).as("eff_frac"))
      .orderBy($"source")
  }

  /** t40 — LANG-ID CONFUSION MATRIX: t03's predictions evaluated
    * against the declared labels — the (declared, predicted) count
    * matrix with per-row shares, i.e. the recall diagonal a language
    * classifier ships with. The evaluation-harness shape: ANY
    * predictor column vs ANY label column reduces the same way.
    *
    * Scale shape: one narrow scan scores every document (t03's
    * codegen'd predicate), the matrix aggregate is |langs|·|classes|
    * keys, and the row-share window runs over that tiny matrix —
    * corpus size never reaches a window.
    */
  def langIdConfusion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"declared_lang")
    langId(s, dir)
      .groupBy($"declared_lang", $"pred_lang")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("declared_total", sum($"n_docs").over(w))
      .withColumn("row_share",
        $"n_docs".cast("double") / $"declared_total".cast("double"))
      .orderBy($"declared_lang", $"pred_lang")
  }

  /** t38 — ZIPF FIT: ordinary-least-squares fit of ln(freq) against
    * ln(rank) over the top-50 terms — the standard corpus-health
    * check (natural text slopes ≈ −1; generator/spam corpora bend).
    * t30 profiles the raw frequency spectrum; this fits the law to it
    * and emits the three numbers a monitoring gate thresholds on.
    *
    * Determinism is the interesting part: OLS needs Σx, Σy, Σxy, Σx²
    * over doubles, and a plain `sum()` re-associates across
    * partitions. The 50 (rank, freq) points instead collect into ONE
    * array sorted by rank and fold LEFT-TO-RIGHT with the
    * `aggregate` higher-order function — the oracle replays the same
    * fold with `list_reduce` in the same order, so every partial sum
    * is bit-identical (`0.0 + x₁ ≡ x₁` makes the seeded and
    * seedless folds agree). ln is platform_ln (libm) throughout.
    *
    * Scale shape: one vocab-sized count shuffle (shared with t05),
    * a TakeOrderedAndProject top-50, and a 50-element driverless
    * fold — corpus size only ever touches the first aggregate.
    */
  /** Deterministic OLS over a ONE-ROW frame holding a sorted
    * `pts: array<struct<...>>` column: Σx/Σy/Σxy/Σx² fold
    * left-to-right with the `aggregate` HOF (bit-identical to the
    * oracle's `list_reduce` — 0.0+x ≡ x makes the seeded and seedless
    * folds agree), then the closed-form slope/intercept. Shared by
    * t38 (Zipf) and t39 (Heaps).
    */
  private def olsFromPts(pts: DataFrame,
      fx: Column => Column, fy: Column => Column): DataFrame = {
    def fold(f: Column => Column): Column =
      aggregate(transform(col("pts"), p => f(p)), lit(0.0), (a, x) => a + x)
    val folded = pts.select(
      size(col("pts")).cast("double").as("np"),
      fold(fx).as("sx"),
      fold(fy).as("sy"),
      fold(p => fx(p) * fy(p)).as("sxy"),
      fold(p => fx(p) * fx(p)).as("sxx"))
    val slope = (col("np") * col("sxy") - col("sx") * col("sy")) /
      (col("np") * col("sxx") - col("sx") * col("sx"))
    folded.select(
      col("np").cast("long").as("n_pts"),
      slope.as("slope"),
      ((col("sy") - slope * col("sx")) / col("np")).as("intercept"))
  }

  private def ln(c: Column): Column =
    graft.functions.VectorFunctions.platform_ln(c)

  def zipfSlope(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val top = documents(s, dir)
      .select(explode(toks($"text")).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"term")
      .limit(50)
    val w = Window.orderBy($"n".desc, $"term")
    val pts = top
      .withColumn("r", row_number().over(w))
      .agg(array_sort(collect_list(struct($"r", $"n"))).as("pts"))
    olsFromPts(pts,
      p => ln(p("r").cast("double")),
      p => ln(p("n").cast("double")))
  }

  /** t39 — HEAPS-LAW FIT: OLS of ln(cum_vocab) against ln(cum_tokens)
    * over t28's ten decile points — fitting V = k·Nᵝ to the measured
    * vocabulary-growth curve (β ≈ 0.4-0.6 for natural text; a
    * saturating β near 0 is the closed-vocabulary signature, which is
    * exactly what this generator corpus shows and what the fit is FOR:
    * detecting synthetic/templated corpora by their growth curve).
    * Reuses t28's frame (the decile aggregates) and t38's
    * deterministic fold — the explicit `limit(10)` bound is what the
    * collect_list plan gate keys on.
    *
    * Scale shape: everything corpus-sized happens inside t28's two
    * aggregates (shared via the session memo when both run); the fit
    * itself folds 10 points.
    */
  def heapsFit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pts = vocabGrowth(s, dir)
      .select(struct($"decile", $"cum_tokens", $"cum_vocab").as("p"))
      .orderBy($"p.decile")
      .limit(10)
      .agg(array_sort(collect_list($"p")).as("pts"))
    olsFromPts(pts,
      p => ln(p("cum_tokens").cast("double")),
      p => ln(p("cum_vocab").cast("double")))
  }

  /** Per-source sketch-vs-exact agreement counts — the test seam for
    * t31's floor (InvariantSpec reads the real fraction).
    */
  private[graft] def curriculumSketchAgreement(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = qualityScored(s, dir)
    val w = Window.partitionBy($"source").orderBy($"quality", $"doc_id")
    val exact = scored.withColumn("phase", ntile(4).over(w).cast("long"))
    val cuts = scored.groupBy($"source")
      .agg(expr("approx_percentile(quality, array(0.25D, 0.5D, 0.75D), 10000)")
        .as("cut"))
    exact.join(broadcast(cuts), Seq("source"))
      .withColumn("sketch_phase",
        lit(1L) + ($"quality" > $"cut" (0)).cast("long") +
          ($"quality" > $"cut" (1)).cast("long") +
          ($"quality" > $"cut" (2)).cast("long"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(($"sketch_phase" === $"phase").cast("long")).as("n_agree"))
  }

  /** t43 — TRUE BPE MERGE-TABLE TRAINING: the learned artifact an LLM
    * tokenizer pipeline actually ships (t08's "BPE-ish" subtokens
    * apply a FIXED segmentation; this trains the merge list). Classic
    * Sennrich BPE over the word vocabulary: symbols start as
    * characters, each round counts adjacent symbol pairs weighted by
    * word frequency (overlapping occurrences counted, the reference
    * implementations' convention), merges the most frequent pair —
    * ties broken lexicographically on (left, right), so the loop is
    * fully deterministic — and rewrites the vocabulary by greedy
    * LEFT-TO-RIGHT non-overlapping replacement ("aaa" + merge (a,a) →
    * [aa, a]; the fold's just-merged symbol can never re-match its
    * own left half).
    *
    * Scale shape: ONE corpus-sized shuffle (the word-count aggregate);
    * every training round then runs over the VOCABULARY table —
    * sub-linear in corpus size and the reason real BPE trainers
    * pre-aggregate words — with the driver holding only the N-row
    * merge table (one ≤1-row collect per round, the CC-loop
    * discipline; superseded checkpoints freed as they die). The
    * rewrite is a codegen'd `aggregate` fold per word.
    *
    * The DuckDB oracle replays the identical loop as N chained
    * MATERIALIZED CTE stages (inlining would re-evaluate each stage's
    * multi-referenced frames exponentially); greedy left-to-right
    * selection is expressed positionally — in each maximal run of
    * consecutive pair-occurrence positions keep the odd-ranked ones
    * (overlaps only occur when left = right) — which the spec pins
    * against the fold on adversarial runs.
    */
  def bpeMergeTable(s: SparkSession, dir: String, nMerges: Int = 20): DataFrame =
    // Session sidecar (the dupClusterLabels discipline): the merge
    // table is a per-corpus-snapshot ARTIFACT — train once, read
    // everywhere (t21 packing / t27 mixtures tokenize with it).
    withBpeTrained(s, dir, nMerges) { (merges, _) =>
      CorpusIndexes.memo(s, dir, s"bpe_merges_$nMerges") {
        import s.implicits._
        s.sparkContext.parallelize(merges, 1)
          .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
          .orderBy($"merge_rank")
      }
    }

  /** Shared per-(session, dir, nMerges) trained-BPE artifact: the
    * merge list and the FINAL vocabulary state, trained ONCE per
    * session — t43/t44/t46 all derive from this one entry, so the
    * 20-round training loop never reruns within a session. The final
    * vocabulary frame is vocabulary-sized (tens of rows on this
    * corpus, ~10⁵ in production), so one pinned checkpoint costs KBs;
    * the loop already frees every superseded intermediate. The cache
    * is a 4-entry LRU: a long-lived session sweeping many corpora or
    * nMerges values unpersists the eldest entry's checkpoint RDDs
    * instead of growing block-manager residency without bound (every
    * registered consumer materializes its own CorpusIndexes.memo
    * checkpoint eagerly at first build, so an evicted entry has no
    * live downstream lineage). Purge-on-access keeps dead sessions
    * out (the CorpusIndexes.purgeStopped discipline).
    */
  private type BpeEntry =
    (Seq[(Int, String, String, Long)], DataFrame, Seq[org.apache.spark.rdd.RDD[_]])
  /** One cache slot: the trained value (built lazily under THIS
    * holder's monitor — never under the map lock), a refcount of
    * in-flight consumers, and the eviction mark. An evicted entry's
    * checkpoint RDDs unpersist when the LAST consumer releases (or
    * immediately at eviction when none is in flight) — local
    * checkpoints sever lineage, so evict-during-use would fail the
    * consumer's job unrecoverably, not slow it.
    */
  private final class BpeHolder {
    var value: BpeEntry = _ // guarded by this
    val refs = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var evicted = false
    def unpersistAll(): Unit = {
      val v = value
      if (v != null)
        v._3.foreach(r => if (!r.sparkContext.isStopped) r.unpersist(false))
    }
  }
  private val bpeCacheMax = 4
  private val bpeCache =
    new java.util.LinkedHashMap[(SparkSession, String, Int), BpeHolder](
      16, 0.75f, true)

  /** Per-(session, dir, nMerges) serialization, GLOBAL map lock held
    * only for map bookkeeping: an earlier version ran the whole
    * 20-round training job AND the consumer's memo materialization
    * under one JVM-wide monitor, so a slow training job on one corpus
    * blocked unrelated sessions/directories indefinitely. Now the
    * build runs under the entry's own monitor (same-key consumers
    * wait, different keys proceed), `f` runs under no lock at all,
    * and eviction safety is kept by the holder's refcount instead of
    * a critical section.
    */
  private def withBpeTrained[T](s: SparkSession, dir: String, nMerges: Int)
      (f: (Seq[(Int, String, String, Long)], DataFrame) => T): T = {
    val key = (s, dir, nMerges)
    val holder = bpeCache.synchronized {
      // purge dead sessions (their contexts are stopped — nothing to
      // unpersist; mark evicted so late releasers don't resurrect)
      val it = bpeCache.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey._1.sparkContext.isStopped) {
          e.getValue.evicted = true; it.remove()
        }
      }
      var h = bpeCache.get(key)
      if (h == null) {
        h = new BpeHolder
        bpeCache.put(key, h)
        while (bpeCache.size() > bpeCacheMax) {
          val eldest = bpeCache.entrySet().iterator().next()
          bpeCache.remove(eldest.getKey)
          val ev = eldest.getValue
          ev.evicted = true
          if (ev.refs.get() == 0) ev.unpersistAll()
        }
      }
      h.refs.incrementAndGet()
      h
    }
    try {
      val v = holder.synchronized {
        if (holder.value == null)
          holder.value =
            bpeTrain(s, documents(s, dir).select(col("text")), nMerges)
        holder.value
      }
      f(v._1, v._2)
    } finally {
      if (holder.refs.decrementAndGet() == 0 && holder.evicted)
        holder.unpersistAll()
    }
  }

  /** t44 — the trained segmentation APPLIED: the per-word subword
    * split the t43 merge table produces, with its frequency and
    * subtoken count — the train→apply pair every tokenizer pipeline
    * ships together (t43 is the artifact, this is what running it
    * over the vocabulary yields; the loop's final vocabulary state IS
    * the application, no second apply pass exists to diverge from
    * training). Top-200 by frequency for a bounded, stable report —
    * on this corpus's deliberately small template vocabulary that is
    * the whole table.
    */
  def bpeSegmentation(s: SparkSession, dir: String, nMerges: Int = 20): DataFrame =
    withBpeTrained(s, dir, nMerges) { (_, words) =>
      CorpusIndexes.memo(s, dir, s"bpe_seg_$nMerges") {
        import s.implicits._
        words.select($"word", $"n",
            size($"syms").cast("long").as("n_syms"),
            array_join($"syms", "|").as("seg"))
          .orderBy($"n".desc, $"word").limit(200)
      }
    }

  /** t46 — TOKEN-BUDGET EFFICIENCY of the trained tokenizer, per
    * source: words, subtokens under the t43 merge table's final
    * segmentation, characters, and the two ratios a mixing planner
    * actually budgets with — subtokens/word (fertility) and
    * chars/subtoken (compression). The question t27's mixture math
    * needs answered per SOURCE: a source whose fertility is high
    * inflates its token bill relative to its document share, so ppm
    * targets set on documents mis-state the training mix. Composes
    * t43/t44's trained artifact with the corpus-side frequency table
    * — the first consumer of the trained BPE beyond the vocabulary
    * dump itself.
    *
    * Determinism: counts and products are BIGINT; each ratio is ONE
    * IEEE divide of exact integers. Scale shape: the segmentation is
    * VOCABULARY-sized (broadcast — a production BPE vocab is ~10⁵
    * rows); one (source, word) aggregate over the token explode,
    * map-side combined; output is |sources| rows. The training loop
    * itself is the shared [[bpeTrained]] session memo that t43/t44
    * also read, so this query never retrains.
    */
  def bpeEfficiency(s: SparkSession, dir: String, nMerges: Int = 20): DataFrame =
    withBpeTrained(s, dir, nMerges) { (_, words) =>
      CorpusIndexes.memo(s, dir, s"bpe_eff_$nMerges") {
      import s.implicits._
      val vocab = words.select($"word", size($"syms").cast("long").as("n_syms"))
      documents(s, dir)
        .select($"source", explode(split($"text", "\\s+")).as("word"))
        .filter($"word" =!= "")
        .groupBy($"source", $"word").agg(count(lit(1)).as("c"))
        .join(broadcast(vocab), Seq("word"))
        .groupBy($"source")
        .agg(sum($"c").as("n_words"),
          sum($"c" * $"n_syms").as("n_subtokens"),
          sum($"c" * length($"word")).as("n_chars"))
        .withColumn("subtok_per_word",
          $"n_subtokens".cast("double") / $"n_words".cast("double"))
        .withColumn("chars_per_subtok",
          $"n_chars".cast("double") / $"n_subtokens".cast("double"))
        .orderBy($"source")
      }
    }

  /** The DuckDB replay of [[bpeEfficiency]]: the t43/t44 stage chain
    * to the final vocabulary state, joined to a (source, word) count.
    */
  private[graft] def bpeEffOracle(n: Int): String =
    bpeOracleStages(n) + s""",
      sw AS (SELECT source, word, CAST(count(*) AS BIGINT) AS c FROM (
               SELECT source, unnest(regexp_split_to_array(text, '\\s+')) AS word
               FROM documents) t
             WHERE word <> '' GROUP BY 1, 2)
      SELECT source,
        CAST(sum(c) AS BIGINT) AS n_words,
        CAST(sum(c * len(w.syms)) AS BIGINT) AS n_subtokens,
        CAST(sum(c * len(word)) AS BIGINT) AS n_chars,
        CAST(sum(c * len(w.syms)) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
          AS subtok_per_word,
        CAST(sum(c * len(word)) AS DOUBLE) / CAST(sum(c * len(w.syms)) AS DOUBLE)
          AS chars_per_subtok
      FROM sw JOIN w$n w USING (word)
      GROUP BY source ORDER BY source"""

  /** [[bpeMergeTable]] over an explicit (text) frame — the spec seam. */
  private[graft] def bpeMergesFrame(s: SparkSession, docs: DataFrame,
                                    nMerges: Int): DataFrame = {
    import s.implicits._
    val (merges, _, rdds) = bpeTrain(s, docs, nMerges)
    rdds.foreach(_.unpersist(blocking = false))
    s.sparkContext.parallelize(merges, 1)
      .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
      .orderBy($"merge_rank")
  }

  /** The shared training loop: returns the merge list, the FINAL
    * vocabulary state (word, n, syms — checkpointed; its pinned RDDs
    * are returned so the caller frees them after taking what it
    * needs), and those RDDs.
    */
  private def bpeTrain(s: SparkSession, docs: DataFrame, nMerges: Int)
      : (Seq[(Int, String, String, Long)], DataFrame,
         Seq[org.apache.spark.rdd.RDD[_]]) = {
    import s.implicits._
    val sc = s.sparkContext
    // The RDD is read EXPLICITLY off the checkpointed plan's LogicalRDD
    // leaf (never a getPersistentRDDs diff, which would capture RDDs a
    // CONCURRENT component pins and unpersist them out from under it).
    def tracked(df: DataFrame): (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
      val out = df.localCheckpoint()
      (out, out.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      })
    }
    // coalesce(8): every training round schedules 2 jobs over this
    // table; at vocabulary scale 8 tasks/job keeps 20 rounds of
    // scheduling overhead bounded without an extra shuffle.
    var (words, wordsRdds) = tracked(
      docs.select(explode(split($"text", "\\s+")).as("word"))
        .filter($"word" =!= "")
        .groupBy($"word").agg(count(lit(1)).as("n"))
        .withColumn("syms",
          expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
        .coalesce(8))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var done = false
    for (k <- 1 to nMerges if !done) {
      val top = words
        .select($"n", explode(expr(
          "transform(slice(syms, 1, size(syms)-1), (x, i) -> struct(x AS a, syms[i+1] AS b))")).as("p"))
        .groupBy($"p.a".as("a"), $"p.b".as("b")).agg(sum($"n").as("cnt"))
        .orderBy($"cnt".desc, $"a", $"b").limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((k, a, b, cnt))
        // Greedy left-to-right rewrite: merge iff the accumulator's
        // LAST symbol is exactly `a` — a symbol produced by this very
        // merge is `a+b`, never `a`, so overlapping re-merges are
        // structurally impossible.
        val applied = aggregate($"syms", array().cast("array<string>"),
          (acc, x) => when(size(acc) > 0 &&
              get(acc, size(acc) - 1) === lit(a) && x === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
            .otherwise(concat(acc, array(x))))
        val (next, nextRdds) = tracked(words.select($"word", $"n", applied.as("syms")))
        wordsRdds.foreach(_.unpersist(blocking = false))
        words = next
        wordsRdds = nextRdds
      }
    }
    (merges.toSeq, words, wordsRdds)
  }

  /** The DuckDB replay of [[bpeMergeTable]]: `n` chained MATERIALIZED
    * CTE stages — per stage the pair count, the (cnt desc, a, b)
    * argmax, the occurrence positions, the greedy odd-rank selection
    * inside consecutive-position runs, and the rewritten vocabulary.
    */
  private[graft] def bpeOracle(n: Int): String =
    bpeOracleStages(n) + (1 to n)
      .map(k => s"SELECT $k AS merge_rank, a AS left_sym, b AS right_sym, cnt AS pair_count FROM t$k")
      .mkString("\n", "\nUNION ALL ", "\nORDER BY merge_rank")

  /** The DuckDB replay of [[bpeSegmentation]]: the same `n` chained
    * stages, reading the FINAL vocabulary state instead of the merge
    * rows.
    */
  private[graft] def bpeSegOracle(n: Int): String =
    bpeOracleStages(n) + s"""
      SELECT word, n, CAST(len(syms) AS BIGINT) AS n_syms,
        array_to_string(syms, '|') AS seg
      FROM w$n ORDER BY n DESC, word LIMIT 200"""

  private def bpeOracleStages(n: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH w0 AS MATERIALIZED (
      SELECT word, CAST(count(*) AS BIGINT) AS n,
        list_transform(range(1, len(word)+1), i -> word[i:i]) AS syms
      FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word FROM documents)
      WHERE word <> '' GROUP BY word)"""
    for (k <- 1 to n) {
      val p = s"w${k - 1}"
      sb ++= s""",
      e$k AS MATERIALIZED (SELECT word, n, unnest(syms) AS sym,
               unnest(range(1, len(syms)+1)) AS pos FROM $p),
      pc$k AS MATERIALIZED (SELECT x.sym AS a, y.sym AS b,
               CAST(sum(x.n) AS BIGINT) AS cnt
             FROM e$k x JOIN e$k y ON x.word = y.word AND y.pos = x.pos + 1
             GROUP BY x.sym, y.sym),
      t$k AS MATERIALIZED (SELECT a, b, cnt FROM pc$k ORDER BY cnt DESC, a, b LIMIT 1),
      o$k AS MATERIALIZED (SELECT x.word AS word, x.pos AS pos
             FROM e$k x JOIN e$k y ON x.word = y.word AND y.pos = x.pos + 1
             CROSS JOIN t$k WHERE x.sym = t$k.a AND y.sym = t$k.b),
      k$k AS MATERIALIZED (SELECT word, pos FROM (
               SELECT word, pos, row_number() OVER (PARTITION BY word, grp ORDER BY pos) AS rn
               FROM (SELECT word, pos,
                       pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp
                     FROM o$k)) WHERE rn % 2 = 1),
      w$k AS MATERIALIZED (SELECT e.word, any_value(e.n) AS n,
               list(CASE WHEN kp.pos IS NOT NULL
                         THEN (SELECT a FROM t$k) || (SELECT b FROM t$k)
                         ELSE e.sym END ORDER BY e.pos)
                 FILTER (WHERE kd.pos IS NULL) AS syms
             FROM e$k e
             LEFT JOIN k$k kp ON e.word = kp.word AND e.pos = kp.pos
             LEFT JOIN k$k kd ON e.word = kd.word AND e.pos = kd.pos + 1
             GROUP BY e.word)"""
    }
    sb.toString
  }

  /** t48 — SPLIT-LEAKAGE audit: near-duplicate pairs that CROSS the
    * t14 train/val/test assignment — the hygiene check every
    * pre-training pipeline runs after hashing its split, because a
    * deterministic doc-id split is only leak-free at EXACT-duplicate
    * granularity: a near-dup of a training document sitting in test
    * inflates eval scores exactly like verbatim contamination (the
    * within-split pairs are reported too — they are ordinary d04
    * dedup work, the cross-split rows are the leaks). Per ordered
    * split pair: pair count and the distinct docs implicated on each
    * side.
    *
    * Scale shape: rides the d04 scored-pair core — a shared-shingle
    * inverted-index equi-join, so pairs never come from a corpus
    * self-join, but NOTE it carries no df cap or minhash banding
    * (those live in d12/d08); a 100 TB run with hot boilerplate
    * shingles should swap in the capped d12 pair source before this
    * audit — plus two narrow split-label joins on doc_id and a 6-row
    * aggregate; the split label costs one md5 per doc inside the scan
    * projection.
    */
  def splitLeakage(s: SparkSession, dir: String, tau: Double = 0.3): DataFrame = {
    import s.implicits._
    val bucket = expr(
      "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint) % 100")
    val splits = documents(s, dir)
      .select($"doc_id", bucket.as("bucket"))
      .withColumn("split",
        when($"bucket" < 80, "train").when($"bucket" < 90, "val").otherwise("test"))
      .withColumn("rk",
        when($"bucket" < 80, 0).when($"bucket" < 90, 1).otherwise(2))
      .select($"doc_id", $"split", $"rk")
    val pairs = graft.ops.Dedup.scoredJaccardPairs(s, dir, tau)
      .select($"doc_a", $"doc_b")
      .join(splits.toDF("doc_a", "split_a", "rk_a"), Seq("doc_a"))
      .join(splits.toDF("doc_b", "split_b", "rk_b"), Seq("doc_b"))
      .select(
        when($"rk_a" <= $"rk_b", $"split_a").otherwise($"split_b").as("split_lo"),
        when($"rk_a" <= $"rk_b", $"split_b").otherwise($"split_a").as("split_hi"),
        when($"rk_a" <= $"rk_b", $"doc_a").otherwise($"doc_b").as("doc_lo"),
        when($"rk_a" <= $"rk_b", $"doc_b").otherwise($"doc_a").as("doc_hi"))
    // Materialize the pair list once (the banded pipeline is the
    // expensive branch), then TWO single-distinct aggregates — one
    // countDistinct each plans as the ordinary two-phase distinct; two
    // in one aggregate would plan an Expand (the q24 discipline).
    val p = pairs.localCheckpoint()
    val counts = p.groupBy($"split_lo", $"split_hi")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct($"doc_lo").as("n_docs_lo"))
    val hi = p.groupBy($"split_lo", $"split_hi")
      .agg(countDistinct($"doc_hi").as("n_docs_hi"))
    counts.join(hi, Seq("split_lo", "split_hi"))
      .orderBy($"split_lo", $"split_hi")
  }

  /** t49 — DSIR importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023): score every document by how much
    * more likely its hashed-n-gram features are under a TARGET
    * distribution than under the raw-corpus distribution — the
    * standard cheap way to select "looks like the domain I want" data
    * from a 100 TB crawl without running a model. Features are word
    * bigrams hashed into 64 buckets (the paper's hashed n-gram
    * featurization, t14's md5 bucket primitive); the target here is
    * the English slice (`lang = 'en'`), the raw distribution the whole
    * corpus; both get add-one smoothing. Per doc:
    * log w = Σ_b n_db·[ln(c_tgt(b)+1) − ln(c_raw(b)+1)]
    *         + n_grams·[ln(N_raw+64) − ln(N_tgt+64)],
    * and `selected` = log w > 0 (more target-like than corpus-average;
    * the deterministic stand-in for the paper's Gumbel resample).
    *
    * Determinism: every ln argument is an INTEGER-valued double (the
    * t45 discipline — smoothed counts and totals, never a fraction),
    * bucket contributions fold per doc in BUCKET ORDER (t20's
    * sort_array + aggregate), and the two-total correction is one
    * fixed sub/mul/add chain — identical IEEE ops in both engines.
    *
    * Scale shape: ONE tokenize+explode scan feeds the doc features,
    * the raw histogram, and the target histogram (identical subtrees →
    * ReusedExchange); the histograms are 64-row broadcasts, the totals
    * a one-row broadcast (whitelisted), and the per-doc fold is
    * bounded at 64 entries by construction — no join ever carries the
    * corpus on both sides, and adding a second target re-uses the same
    * gram pass.
    */
  def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.VectorFunctions.platform_ln
    val tk = documents(s, dir).select($"doc_id", $"lang", toks($"text").as("t"))
    // size >= 2 guard: see bigramLogProb — Spark's sequence(1, 0)
    // descends and would throw on a 1-token doc; DuckDB omits it.
    val bg = tk.filter(size($"t") >= 2).select($"doc_id", $"lang", explode(expr(
        "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))")).as("bigram"))
      .withColumn("bucket", expr(
        "cast(conv(substring(md5(bigram), 1, 8), 16, 10) as bigint) % 64"))
    val dbl = bg.groupBy($"doc_id", $"lang", $"bucket").agg(count(lit(1)).as("n_db"))
    val raw = dbl.groupBy($"bucket").agg(sum($"n_db").as("c_raw"))
    val tgt = dbl.filter($"lang" === "en")
      .groupBy($"bucket").agg(sum($"n_db").as("c_tgt"))
    val tots = raw.agg(sum($"c_raw").as("n_raw"))
      .crossJoin(tgt.agg(sum($"c_tgt").as("n_tgt")))
    dbl.join(broadcast(raw), Seq("bucket"))
      .join(broadcast(tgt), Seq("bucket"), "left")
      .withColumn("contrib", $"n_db".cast("double") *
        (platform_ln((coalesce($"c_tgt", lit(0L)) + lit(1L)).cast("double")) -
         platform_ln(($"c_raw" + lit(1L)).cast("double"))))
      .groupBy($"doc_id")
      .agg(sum($"n_db").as("n_grams"),
        expr("aggregate(transform(sort_array(collect_list(struct(bucket, contrib))), x -> x.contrib), 0D, (a, x) -> a + x)").as("feat_term"))
      .crossJoin(broadcast(tots))
      .withColumn("logw", $"feat_term" + $"n_grams".cast("double") *
        (platform_ln(($"n_raw" + lit(64L)).cast("double")) -
         platform_ln(($"n_tgt" + lit(64L)).cast("double"))))
      .withColumn("selected", $"logw" > lit(0.0))
      .select($"doc_id", $"n_grams", $"logw", $"selected")
      .orderBy($"doc_id")
  }

  /** The FROZEN DSIR selection model: the 64-bucket raw and target
    * hashed-bigram histograms as ONE total table (missing target
    * buckets materialized as c_tgt = 0, so the disk schema carries
    * the smoothing's zero explicitly). The totals the t49 correction
    * term needs re-derive by summing the 64 rows at load — the model
    * is self-contained, the s22/s28 frozen-artifact convention
    * applied to the selection family.
    */
  private[graft] def dsirModel(s: SparkSession, dir: String): DataFrame =
    CorpusIndexes.memo(s, dir, "dsir_model") {
    // Session sidecar (the jm_scored discipline): the 64-row frozen
    // model is the persisted `dsir_model` artifact at campaign scale
    // (persistDsirModel writes exactly this frame); locally the memo
    // keeps its full-corpus bigram pass to once per (session, dir)
    // instead of once per consumer (c02's gate + the snapshot persist).
    import s.implicits._
    val tk = documents(s, dir).select($"doc_id", $"lang", toks($"text").as("t"))
    val bg = tk.filter(size($"t") >= 2).select($"lang", explode(expr(
        "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))")).as("bigram"))
      .withColumn("bucket", expr(
        "cast(conv(substring(md5(bigram), 1, 8), 16, 10) as bigint) % 64"))
    bg.groupBy($"bucket")
      .agg(count(lit(1)).as("c_raw"),
        sum(when($"lang" === "en", 1L).otherwise(0L)).as("c_tgt"))
      .select($"bucket", $"c_raw", $"c_tgt")
    }

  /** Score one batch of (doc_id, text) arrivals against a FROZEN
    * [[dsirModel]] frame — t49's exact per-doc formula (same fold
    * order, same platform_ln calls), with the model's absent buckets
    * smoothing to ln(0+1): scoring the full corpus against its own
    * model is bit-identical to [[dsirWeights]] (StreamingExtrasSpec
    * pins it), and per-batch scores depend only on the batch and the
    * frozen histograms, so batch unions compose.
    */
  private[graft] def dsirScoreBatch(batch: DataFrame, model: DataFrame): DataFrame = {
    val s = batch.sparkSession
    import s.implicits._
    import graft.functions.VectorFunctions.platform_ln
    val tots = model.agg(sum($"c_raw").as("n_raw"), sum($"c_tgt").as("n_tgt"))
    val tk = batch.select($"doc_id", toks($"text").as("t"))
    val dbl = tk.filter(size($"t") >= 2).select($"doc_id", explode(expr(
        "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))")).as("bigram"))
      .withColumn("bucket", expr(
        "cast(conv(substring(md5(bigram), 1, 8), 16, 10) as bigint) % 64"))
      .groupBy($"doc_id", $"bucket").agg(count(lit(1)).as("n_db"))
    dbl.join(broadcast(model), Seq("bucket"), "left")
      .withColumn("contrib", $"n_db".cast("double") *
        (platform_ln((coalesce($"c_tgt", lit(0L)) + lit(1L)).cast("double")) -
         platform_ln((coalesce($"c_raw", lit(0L)) + lit(1L)).cast("double"))))
      .groupBy($"doc_id")
      .agg(sum($"n_db").as("n_grams"),
        expr("aggregate(transform(sort_array(collect_list(struct(bucket, contrib))), x -> x.contrib), 0D, (a, x) -> a + x)").as("feat_term"))
      .crossJoin(broadcast(tots))
      .withColumn("logw", $"feat_term" + $"n_grams".cast("double") *
        (platform_ln(($"n_raw" + lit(64L)).cast("double")) -
         platform_ln(($"n_tgt" + lit(64L)).cast("double"))))
      .withColumn("selected", $"logw" > lit(0.0))
      .select($"doc_id", $"n_grams", $"logw", $"selected")
  }

  /** t54 — INTERPOLATED BIGRAM LM QUALITY FILTER (the CCNet-standard
    * gate): every document's perplexity under a Jelinek-Mercer
    * interpolated bigram model trained on the REFERENCE slice
    * (`lang = 'en'`, t49's target convention), with OOV handling —
    * P(w₂|w₁) = 0.7·P_ML(w₂|w₁) + 0.3·P₁(w₂), where P_ML is the
    * reference's maximum-likelihood bigram, P₁ the add-one-smoothed
    * reference unigram over vocabulary V∪{'<unk>'}, and any scored
    * token outside the reference vocabulary maps to '<unk>' (an
    * unseen CONTEXT degrades to the unigram term alone — JM's
    * graceful OOV, which t20/t26's point-NLL add-one models lack:
    * they flatten every unseen transition to the same 1/(c+V) mass,
    * while JM still ranks by the continuation word's frequency —
    * JmFilterSpec separates the two on a witness corpus). `keep` =
    * avg_nll at or below the corpus median (the CCNet keep/drop
    * split, deterministic because both engines compute identical
    * doubles).
    *
    * Float discipline: each bigram's probability algebraizes to ONE
    * integer fraction — num/den = (7·c_bg·D + 3·(c_uni+1)·c_w1) /
    * (10·c_w1·D) with D = N_ref+V_ref+1 (the unseen-context branch
    * drops the ML term: 3·(c_uni+1) / (10·D)) — so every platform_ln
    * argument is an INTEGER-valued double (the t45 discipline; at
    * test scale products stay under 2⁵³, at 100 TB the float form
    * replaces the exact-integer one), contributions fold per doc in
    * (w1, w2) order, and the median is the q14/t35 percentile
    * selection.
    *
    * Scale shape: the model tables (unigrams, bigrams, contexts) are
    * reference-vocabulary-sized broadcasts (a curated target corpus,
    * not the crawl); the scored side is ONE bigram explode reduced to
    * per-(doc, w1, w2) counts before any join, and the per-doc fold
    * is bounded by the doc's distinct bigrams.
    *
    * The keep bar is the EXACT LOWER MEDIAN OF THE 1e-4-QUANTIZED
    * score — never an exact single-group `percentile` (whose buffer
    * holds every per-doc score: unbounded at corpus scale) and never
    * a GK sketch (whose selection depends on partition merge order —
    * per-doc keep bits must stay engine-exact for the oracle). The
    * scores reduce map-side to a CELL HISTOGRAM whose cardinality is
    * bounded by the score's RANGE (avg_nll ∈ [0, ln(10·D²)] — set by
    * the frozen model's smoothing constant D, not by the crawl), the
    * cumulative window runs over those bounded cells only, and the
    * bar is the first cell where 2·cum ≥ n (rank ceil(n/2), DuckDB's
    * quantile_disc convention). A 1e-4-nat threshold resolution is
    * far inside the noise of any CCNet-style percentile cut.
    */
  def jmQualityFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (perDoc, bar) = jmScoredWithBar(s, dir)
    perDoc.crossJoin(broadcast(bar))
      .withColumn("keep", $"q_nll" <= $"bar_cell")
      .select($"doc_id", $"n_bigrams", $"n_oov", $"avg_nll", $"keep")
      .orderBy($"doc_id")
  }

  /** t54's two halves as explicit frames — the full-corpus scored
    * table (with the 1e-4-quantized `q_nll`) and the one-row campaign
    * bar — so the composed ingest campaign (c02) reuses the SNAPSHOT's
    * threshold definition verbatim instead of restating it.
    */
  private[graft] def jmScoredWithBar(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    // Session sidecar (the dupClusterLabels discipline): the per-doc
    // score table is the campaign's persisted ARTIFACT — at 100 TB a
    // snapshot scores once and every consumer (t54's report, c02's
    // gate, the shipped bar) reads the artifact; locally the memo
    // plays that role for the two registered consumers.
    val perDoc = CorpusIndexes.memo(s, dir, "jm_scored") {
      val tk = documents(s, dir).select($"doc_id", $"lang", toks($"text").as("t"))
      jmScored(tk.filter($"lang" === "en").select($"t"),
        tk.select($"doc_id", $"t"))
        .withColumn("q_nll", floor($"avg_nll" * lit(1e4)))
    }
    (perDoc, quantizedBar(perDoc))
  }

  /** The t54 keep bar over a scored frame bearing `q_nll`: the first
    * quantized cell where 2·cum ≥ n (rank ceil(n/2) — the exact lower
    * median of the quantized scores, computed over the BOUNDED cell
    * histogram). One definition, three consumers: t54 itself, c02,
    * and the snapshot persist step.
    */
  private[graft] def quantizedBar(perDoc: DataFrame): DataFrame = {
    val s = perDoc.sparkSession
    import s.implicits._
    val hist = perDoc.groupBy($"q_nll").agg(count(lit(1)).as("n_cell"))
    val nAll = perDoc.agg(count(lit(1)).as("n_all"))
    val wc = Window.orderBy($"q_nll")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.withColumn("cum", sum($"n_cell").over(wc))
      .crossJoin(broadcast(nAll))
      .filter($"cum" * 2 >= $"n_all")
      .agg(min($"q_nll").as("bar_cell"))
  }

  /** [[jmQualityFilter]]'s scoring core over explicit frames — `ref`
    * bears token arrays `t`, `docs` bears (doc_id, t). Returns
    * (doc_id, n_bigrams, n_oov, nll, avg_nll); docs with fewer than
    * two tokens are omitted (no bigrams — the t26 contract).
    */
  private[graft] def jmScored(ref: DataFrame, docs: DataFrame): DataFrame = {
    val (runi, rbg, ctx) = jmModel(ref)
    jmScoreAgainst(docs, runi, rbg, ctx)
  }

  /** The frozen JM model tables built from a reference frame bearing
    * token arrays `t`: unigram counts (term, c_uni), bigram counts
    * (w1, w2, c_bg), and context totals (w1, c_w1). All
    * reference-vocabulary-sized; the smoothing stats (N_ref, V_ref)
    * re-derive from the unigram table, so the three tables are
    * self-contained (the dsir_model convention).
    */
  private[graft] def jmModel(ref: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val s = ref.sparkSession
    import s.implicits._
    val runi = ref.select(explode($"t").as("term"))
      .groupBy($"term").agg(count(lit(1)).as("c_uni"))
    val bigrams = expr(
      "transform(sequence(1, size(t) - 1), i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))")
    val rbg = ref.filter(size($"t") >= 2).select(explode(bigrams).as("b"))
      .groupBy($"b.w1".as("w1"), $"b.w2".as("w2")).agg(count(lit(1)).as("c_bg"))
    val ctx = rbg.groupBy($"w1").agg(sum($"c_bg").as("c_w1"))
    (runi, rbg, ctx)
  }

  /** Score (doc_id, t) rows against an explicit frozen JM model — the
    * per-batch form [[graft.streaming.StreamingJm]] runs; bit-equal to
    * [[jmScored]] for the same model (same folds, same platform_ln).
    */
  private[graft] def jmScoreAgainst(docs: DataFrame, runi: DataFrame,
                                    rbg: DataFrame, ctx: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    import graft.functions.VectorFunctions.platform_ln
    val rstats = runi.agg(sum($"c_uni").as("n_ref"), count(lit(1)).as("v_ref"))
    val bigrams = expr(
      "transform(sequence(1, size(t) - 1), i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))")
    // OOV sides fold to '<unk>' AFTER the per-(doc, bigram) aggregate
    // (token mapping commutes with bigram construction), so the vocab
    // joins touch distinct doc-bigrams, never the token stream.
    val vocab = runi.select($"term")
    val db = docs.filter(size($"t") >= 2)
      .select($"doc_id", explode(bigrams).as("b"))
      .groupBy($"doc_id", $"b.w1".as("w1"), $"b.w2".as("w2"))
      .agg(count(lit(1)).as("n_db"))
      .join(broadcast(vocab.toDF("w1").withColumn("in1", lit(true))),
        Seq("w1"), "left")
      .join(broadcast(vocab.toDF("w2").withColumn("in2", lit(true))),
        Seq("w2"), "left")
      .select($"doc_id",
        when($"in1", $"w1").otherwise(lit("<unk>")).as("w1"),
        when($"in2", $"w2").otherwise(lit("<unk>")).as("w2"),
        $"n_db")
      .groupBy($"doc_id", $"w1", $"w2").agg(sum($"n_db").as("n_db"))
    db.join(broadcast(rbg), Seq("w1", "w2"), "left")
      .join(broadcast(ctx), Seq("w1"), "left")
      .join(broadcast(runi.toDF("w2", "c_uni")), Seq("w2"), "left")
      .crossJoin(broadcast(rstats))
      .withColumn("d_smooth", $"n_ref" + $"v_ref" + lit(1L))
      .withColumn("num", when(coalesce($"c_w1", lit(0L)) > 0L,
          lit(7L) * coalesce($"c_bg", lit(0L)) * $"d_smooth" +
            lit(3L) * (coalesce($"c_uni", lit(0L)) + lit(1L)) * $"c_w1")
        .otherwise(lit(3L) * (coalesce($"c_uni", lit(0L)) + lit(1L))))
      .withColumn("den", when(coalesce($"c_w1", lit(0L)) > 0L,
          lit(10L) * $"c_w1" * $"d_smooth")
        .otherwise(lit(10L) * $"d_smooth"))
      .withColumn("contrib", $"n_db".cast("double") *
        (platform_ln($"den".cast("double")) - platform_ln($"num".cast("double"))))
      .withColumn("is_oov", $"w1" === "<unk>" || $"w2" === "<unk>")
      .groupBy($"doc_id")
      .agg(sum($"n_db").as("n_bigrams"),
        sum(when($"is_oov", $"n_db").otherwise(0L)).as("n_oov"),
        expr("aggregate(transform(sort_array(collect_list(struct(w1, w2, contrib))), x -> x.contrib), 0D, (a, x) -> a + x)").as("nll"))
      .withColumn("avg_nll", $"nll" / $"n_bigrams".cast("double"))
  }

  /** Shared `WITH`-body of the t54 JM replay: model tables off the
    * lang='en' reference, per-doc scores over ALL documents (`qd`:
    * doc_id, n_bigrams, n_oov, avg_nll, q_nll) and the one-row
    * quantized-median bar (`md`: bar_cell). t54's oracle and the c02
    * ingest-campaign oracle compose it.
    */
  private[graft] val jmScoreReplaySql: String = """rtk AS (SELECT regexp_split_to_array(text, '\s+') AS t
                     FROM documents WHERE lang = 'en'),
        runi AS MATERIALIZED (SELECT term, CAST(count(*) AS BIGINT) AS c_uni
                FROM (SELECT unnest(t) AS term FROM rtk) q GROUP BY term),
        rstats AS (SELECT CAST(sum(c_uni) AS BIGINT) AS n_ref,
                     CAST(count(*) AS BIGINT) AS v_ref FROM runi),
        rbg AS MATERIALIZED (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_bg FROM (
                SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                  i -> struct_pack(w1 := t[i], w2 := t[i+1])), recursive := true)
                FROM rtk) q
              GROUP BY w1, w2),
        ctx AS (SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_w1 FROM rbg GROUP BY w1),
        atk AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents),
        db0 AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS n_db FROM (
                SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
                  i -> struct_pack(w1 := t[i], w2 := t[i+1])), recursive := true)
                FROM atk) q
              GROUP BY doc_id, w1, w2),
        db AS MATERIALIZED (SELECT doc_id,
                CASE WHEN u1.term IS NULL THEN '<unk>' ELSE d.w1 END AS w1,
                CASE WHEN u2.term IS NULL THEN '<unk>' ELSE d.w2 END AS w2,
                CAST(sum(d.n_db) AS BIGINT) AS n_db
              FROM db0 d LEFT JOIN runi u1 ON d.w1 = u1.term
                         LEFT JOIN runi u2 ON d.w2 = u2.term
              GROUP BY 1, 2, 3),
        sc AS (SELECT d.doc_id, d.w1, d.w2, d.n_db,
                (d.w1 = '<unk>' OR d.w2 = '<unk>') AS is_oov,
                CASE WHEN coalesce(c.c_w1, 0) > 0
                  THEN 7 * coalesce(b.c_bg, 0) * (s.n_ref + s.v_ref + 1)
                       + 3 * (coalesce(u.c_uni, 0) + 1) * c.c_w1
                  ELSE 3 * (coalesce(u.c_uni, 0) + 1) END AS num,
                CASE WHEN coalesce(c.c_w1, 0) > 0
                  THEN 10 * c.c_w1 * (s.n_ref + s.v_ref + 1)
                  ELSE 10 * (s.n_ref + s.v_ref + 1) END AS den
              FROM db d LEFT JOIN rbg b ON d.w1 = b.w1 AND d.w2 = b.w2
                        LEFT JOIN ctx c ON d.w1 = c.w1
                        LEFT JOIN runi u ON d.w2 = u.term
                        CROSS JOIN rstats s),
        pd AS MATERIALIZED (SELECT doc_id,
                CAST(sum(n_db) AS BIGINT) AS n_bigrams,
                CAST(sum(CASE WHEN is_oov THEN n_db ELSE 0 END) AS BIGINT) AS n_oov,
                list_reduce(list(CAST(n_db AS DOUBLE) *
                    (ln(CAST(den AS DOUBLE)) - ln(CAST(num AS DOUBLE)))
                  ORDER BY w1, w2), (a, b) -> a + b) AS nll
              FROM sc GROUP BY doc_id),
        qd AS (SELECT doc_id, n_bigrams, n_oov,
                 nll / CAST(n_bigrams AS DOUBLE) AS avg_nll,
                 CAST(floor((nll / CAST(n_bigrams AS DOUBLE)) * 1e4) AS BIGINT) AS q_nll
               FROM pd),
        hist AS (SELECT q_nll, CAST(count(*) AS BIGINT) AS n_cell
                 FROM qd GROUP BY q_nll),
        nall AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM qd),
        md AS (SELECT min(q_nll) AS bar_cell FROM (
                 SELECT q_nll, sum(n_cell) OVER (ORDER BY q_nll
                   ROWS UNBOUNDED PRECEDING) AS cum
                 FROM hist) h CROSS JOIN nall WHERE cum * 2 >= n_all)"""

  /** Shared `WITH`-body of the t49 DSIR replay, CTE names prefixed
    * `x` so it composes next to the admission chain (which owns
    * `tk`/`bg`): per-doc weights over ALL documents against the
    * full-corpus raw/target histograms (`xf`: doc_id, n_grams,
    * feat_term; totals in `xtots`). t49's oracle and the c02
    * ingest-campaign oracle compose it.
    */
  private[graft] val dsirReplaySql: String = """xtk AS (SELECT doc_id, lang, regexp_split_to_array(text, '\s+') AS t
                    FROM documents),
        xbg AS (SELECT doc_id, lang,
                 unnest(list_transform(generate_series(1, len(t) - 1),
                   i -> t[i] || ' ' || t[i+1])) AS bigram
               FROM xtk),
        xbk AS (SELECT doc_id, lang,
                 CAST(('0x' || substr(md5(bigram), 1, 8)) AS BIGINT) % 64 AS bucket
               FROM xbg),
        xdbl AS (SELECT doc_id, lang, bucket, count(*) AS n_db
                FROM xbk GROUP BY doc_id, lang, bucket),
        xraw AS (SELECT bucket, CAST(sum(n_db) AS BIGINT) AS c_raw
                FROM xdbl GROUP BY bucket),
        xtgt AS (SELECT bucket, CAST(sum(n_db) AS BIGINT) AS c_tgt
                FROM xdbl WHERE lang = 'en' GROUP BY bucket),
        xtots AS (SELECT (SELECT CAST(sum(c_raw) AS BIGINT) FROM xraw) AS n_raw,
                        (SELECT CAST(sum(c_tgt) AS BIGINT) FROM xtgt) AS n_tgt),
        xc AS (SELECT xdbl.doc_id, xdbl.bucket, xdbl.n_db,
                CAST(xdbl.n_db AS DOUBLE) *
                  (ln(CAST(COALESCE(xtgt.c_tgt, 0) + 1 AS DOUBLE)) -
                   ln(CAST(xraw.c_raw + 1 AS DOUBLE))) AS contrib
              FROM xdbl JOIN xraw ON xdbl.bucket = xraw.bucket
                       LEFT JOIN xtgt ON xdbl.bucket = xtgt.bucket),
        xf AS (SELECT doc_id, CAST(sum(n_db) AS BIGINT) AS n_grams,
                list_reduce(list(contrib ORDER BY bucket), (a, b) -> a + b) AS feat_term
              FROM xc GROUP BY doc_id)"""

  /** t55 — DETERMINISTIC WEIGHTED SAMPLING (Efraimidis–Spirakis A-ES):
    * per source the top-k documents by the key u^(1/w) with w = token
    * count and u an md5-derived uniform — weighted sampling WITHOUT
    * replacement, the standard way to realize a token-weighted mixture
    * draw (t27 plans token budgets; this picks the documents) while
    * staying rerun-stable (the t14/t18 md5 discipline: no RNG state,
    * any executor count, same sample).
    *
    * Determinism: the key is ranked in log space — ln(u)/w with
    * u = (h+1)/2³² decomposed to (ln(h+1) − ln(2³²))/w, so every
    * platform_ln argument is an INTEGER-valued double (the t45
    * discipline; h+1 ≤ 2³² is exact), the divide is one IEEE op, and
    * ties break on doc_id.
    *
    * Scale shape: one narrow scan computes the key inside the
    * projection; the per-source rank window is the t25 class (bounded
    * by source — for one web-scale source the key is monotone, so a
    * bounded-heap top-k aggregate (the t10 Aggregator) replaces the
    * partition sort).
    */
  def weightedSample(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import s.implicits._
    import graft.functions.VectorFunctions.platform_ln
    val d = documents(s, dir).select($"source", $"doc_id",
        size(toks($"text")).cast("long").as("n_tokens"))
      .withColumn("hseed", expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)"))
      .withColumn("es_key",
        (platform_ln(($"hseed" + lit(1L)).cast("double")) -
         platform_ln(lit(4294967296.0))) / $"n_tokens".cast("double"))
    val w = Window.partitionBy($"source").orderBy($"es_key".desc, $"doc_id")
    d.withColumn("sel_rank", row_number().over(w).cast("long"))
      .filter($"sel_rank" <= k)
      .select($"source", $"sel_rank", $"doc_id", $"n_tokens", $"es_key")
      .orderBy($"source", $"sel_rank")
  }

  /** Ship the frozen JM model (unigram / bigram / context tables,
    * trained on the `lang = 'en'` reference slice) as durable bucketed
    * sidecars under `root/jm_{uni,bg,ctx}` — what
    * [[graft.streaming.StreamingJm]] loads so a scoring run starts
    * with NO corpus pass.
    */
  def persistJmModel(s: SparkSession, dir: String, root: String): Unit = {
    import s.implicits._
    val ref = documents(s, dir).filter($"lang" === "en")
      .select(toks($"text").as("t"))
    val (runi, rbg, ctx) = jmModel(ref)
    Seq(("jm_uni", runi), ("jm_bg", rbg), ("jm_ctx", ctx)).foreach {
      case (key, df) =>
        CorpusIndexes.writeBucketedTable(df, s"$root/$key",
          CorpusIndexes.tableName(root, key), CorpusIndexes.layouts(key))
    }
  }

  /** [[persistJmModel]] AND the campaign bar in ONE model build: the
    * three model tables materialize once (vocabulary-sized
    * checkpoints), the sidecar write and the full-corpus scoring pass
    * both read those frames, and the returned value is the snapshot's
    * t54 bar CELL — the config [[graft.ops.Curation
    * .persistCampaignSnapshot]] ships. Building the model twice
    * (persist, then a separate t54 run for the threshold) would pay a
    * redundant reference-corpus pass at snapshot-build time.
    */
  private[graft] def persistJmModelWithBar(s: SparkSession, dir: String,
                                           root: String): Long = {
    import s.implicits._
    val tk = documents(s, dir).select($"doc_id", $"lang", toks($"text").as("t"))
    val (runi0, rbg0, ctx0) = jmModel(tk.filter($"lang" === "en").select($"t"))
    val (runi, rbg, ctx) =
      (runi0.localCheckpoint(), rbg0.localCheckpoint(), ctx0.localCheckpoint())
    Seq(("jm_uni", runi), ("jm_bg", rbg), ("jm_ctx", ctx)).foreach {
      case (key, df) =>
        CorpusIndexes.writeBucketedTable(df, s"$root/$key",
          CorpusIndexes.tableName(root, key), CorpusIndexes.layouts(key))
    }
    val perDoc = jmScoreAgainst(tk.select($"doc_id", $"t"), runi, rbg, ctx)
      .withColumn("q_nll", floor($"avg_nll" * lit(1e4)))
    quantizedBar(perDoc).head().getLong(0)
  }

  /** One scoring pass over an arriving (doc_id, text) batch against
    * the frozen model tables plus the FROZEN keep bar (the campaign
    * ships the snapshot's t54 bar CELL in config; the door never
    * recomputes it — a per-arrival-window median would make verdicts
    * depend on batch boundaries). The gate is the QUANTIZED-CELL
    * compare — exactly t54's registered keep rule — so a genuinely
    * novel arrival whose score falls between the snapshot's largest
    * kept double and the cell boundary gets the same verdict the
    * certified batch rule would give it (a raw double threshold
    * diverges there).
    */
  def jmScoreDocs(batch: DataFrame, runi: DataFrame, rbg: DataFrame,
                  ctx: DataFrame, barCell: Long): DataFrame = {
    val s = batch.sparkSession
    import s.implicits._
    jmScoreAgainst(batch.select($"doc_id", toks($"text").as("t")),
        runi, rbg, ctx)
      .withColumn("keep", floor($"avg_nll" * lit(1e4)) <= lit(barCell))
  }

  /** Read the durable model written by [[persistJmModel]]. */
  def loadJmModel(s: SparkSession, root: String): (DataFrame, DataFrame, DataFrame) = {
    val Seq(runi, rbg, ctx) = Seq("jm_uni", "jm_bg", "jm_ctx").map(key =>
      CorpusIndexes.readBucketedTable(s, s"$root/$key",
        CorpusIndexes.tableName(root, key), CorpusIndexes.layouts(key)))
    (runi, rbg, ctx)
  }

  /** Ship the frozen model as a durable bucketed sidecar under
    * `root/dsir_model` — what [[graft.streaming.StreamingDsir]] loads
    * so a scoring run starts with NO corpus pass.
    */
  def persistDsirModel(s: SparkSession, dir: String, root: String): Unit =
    CorpusIndexes.writeBucketedTable(dsirModel(s, dir),
      s"$root/dsir_model", CorpusIndexes.tableName(root, "dsir_model"),
      CorpusIndexes.layouts("dsir_model"))

  /** Read the durable model written by [[persistDsirModel]]. */
  def loadDsirModel(s: SparkSession, root: String): DataFrame =
    CorpusIndexes.readBucketedTable(s, s"$root/dsir_model",
      CorpusIndexes.tableName(root, "dsir_model"),
      CorpusIndexes.layouts("dsir_model"))

  /** t50 — MEMORIZATION-RATE audit: for every val/test document, the
    * fraction of its distinct shingles already present in the TRAIN
    * slice — the gram-granular companion to t48. t48 counts near-dup
    * PAIRS that cross the split (document-level leakage); this scores
    * every eval doc's n-gram overlap with train (the memorization
    * prior: an eval doc whose grams are 95% train-covered measures
    * recall, not generalization, even with no single near-dup
    * partner). The number an eval-suite curator thresholds before
    * trusting a held-out score.
    *
    * Determinism: counts are exact BIGINTs off the shared shingle
    * sidecar; seen_frac is ONE IEEE divide of two exact ints.
    *
    * Scale shape: rides the d04/t19 shingle sidecar (no new corpus
    * pass); the train gram set is one distinct aggregate and the
    * probe is a gram-keyed equi-join — train never joins eval at doc
    * granularity, and output is |eval docs| rows.
    */
  def memorizationRate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bucket = expr(
      "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint) % 100")
    val splits = documents(s, dir).select($"doc_id", bucket.as("bucket"))
      .withColumn("split",
        when($"bucket" < 80, "train").when($"bucket" < 90, "val").otherwise("test"))
      .select($"doc_id", $"split")
    val sh = graft.ops.CorpusIndexes.shingles(s, dir).select($"doc_id", $"shash")
    val withSplit = sh.join(splits, Seq("doc_id"))
    val trainGrams = withSplit.filter($"split" === "train")
      .select($"shash").distinct().withColumn("seen", lit(1L))
    withSplit.filter($"split" =!= "train")
      .join(trainGrams, Seq("shash"), "left")
      .groupBy($"doc_id", $"split")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce($"seen", lit(0L))).as("n_seen"))
      .withColumn("seen_frac", $"n_seen".cast("double") / $"n_grams".cast("double"))
      .orderBy($"doc_id")
  }

  /** t47 — READABILITY (Flesch reading ease): the classic
    * grade-level filter a curation pipeline runs beside t02's ratio
    * gates — 206.835 − 1.015·(words/sentences) − 84.6·(syllables/
    * words), with syllables approximated as vowel-group runs per word
    * (min 1 — the standard heuristic; exact syllabification needs a
    * dictionary). Sentences count [.!?]+ runs, clamped to ≥ 1 (this
    * corpus is punctuation-free, so every doc is one sentence — the
    * column stays honest and the score varies through the
    * syllables-per-word arm).
    *
    * Determinism: all three counts are exact BIGINTs from regex
    * counting inside the scan projection (no explode, no shuffle
    * before the one orderBy); the score is a FIXED left-associated
    * IEEE expression over exact-integer-valued doubles — two divides,
    * two multiplies, two subtracts — identical ops in both engines.
    *
    * Scale shape: a narrow per-row projection (codegen regex), no
    * join, no aggregate — embarrassingly parallel at any corpus size.
    */
  def readability(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .select($"doc_id",
        greatest(lit(1L),
          expr("CAST(regexp_count(text, '[.!?]+') AS BIGINT)")).as("n_sentences"),
        expr("CAST(size(split(text, '\\\\s+')) AS BIGINT)").as("n_words"),
        expr("aggregate(transform(split(lower(text), '\\\\s+'), " +
          "w -> greatest(1L, CAST(regexp_count(w, '[aeiouy]+') AS BIGINT))), " +
          "0L, (a, x) -> a + x)").as("n_syllables"))
      .withColumn("flesch",
        lit(206.835)
          - lit(1.015) * ($"n_words".cast("double") / $"n_sentences".cast("double"))
          - lit(84.6) * ($"n_syllables".cast("double") / $"n_words".cast("double")))
      .orderBy($"doc_id")
  }

  /** t53 — MATTR lexical diversity (Covington & McFall's moving-
    * average type-token ratio): mean distinct-token ratio over
    * consecutive COMPLETE 50-token windows — the length-robust form
    * of TTR (raw TTR falls with doc length, so it cannot rank docs
    * of different sizes; t42's effective vocab measures the corpus,
    * this scores each DOC). The window mean algebraizes completely:
    * every window has the same denominator, so
    * mattr = Σ distinct_w / (50·n_windows) — exact BIGINTs into ONE
    * IEEE divide, no per-window float ever exists. Docs shorter than
    * one full window are excluded (the standard definition), matching
    * the oracle exactly.
    *
    * Scale shape: one posexplode scan; windows key on (doc, pos/50)
    * — a per-doc integer, so the distinct runs as a map-side-combined
    * two-level aggregate; everything after is doc-cardinality.
    */
  def mattr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tok = documents(s, dir)
      .select($"doc_id", posexplode(toks($"text")))
      .select($"doc_id", expr("CAST(pos AS BIGINT) div 50").as("win"),
        $"col".as("tok"))
    // e21 discipline: never count(distinct …) next to a plain count —
    // its Expand doubles the exploded scan. Two-level instead: reduce
    // to (doc, win, tok) counts first, then d_w = count(*) and
    // n_in_win = sum(c) read the SAME reduced rows.
    val wins = tok.groupBy($"doc_id", $"win", $"tok")
      .agg(count(lit(1)).as("c"))
      .groupBy($"doc_id", $"win")
      .agg(sum($"c").as("n_in_win"), count(lit(1)).as("d_w"))
      .filter($"n_in_win" === 50L)
    wins.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_windows"), sum($"d_w").as("sum_distinct"))
      .withColumn("mattr", $"sum_distinct".cast("double") /
        ($"n_windows" * 50L).cast("double"))
      .orderBy($"doc_id")
  }

  /** t52 — LANGUAGE × SOURCE INDEPENDENCE (Pearson chi-square): is
    * the language mix the same across sources, or does some source
    * skew the corpus? The one-number stratification audit a mixture
    * designer reads next to t22's per-source KL — KL scores each
    * source against the corpus unigram mix; this tests the whole
    * lang×source contingency table at once and ships the χ² statistic
    * with its degrees of freedom. Each cell's term is algebraized to
    * (N·O − R·C)² / (N·R·C) — numerator and denominator both exact
    * BIGINT products — so the only floats are one divide per cell and
    * the pinned-order fold that sums them.
    *
    * Determinism: counts/marginals are exact BIGINTs; per-cell terms
    * fold in (lang, source) order via the t20 sorted-fold (the
    * source key rides as `src_seg`, a domain-bounded fold key —
    * |langs|·|sources| cells whatever the corpus); χ² is that one
    * fold, df an integer.
    *
    * Scale shape: ONE (lang, source) aggregate feeds cells, both
    * marginals, and the total (re-aggregations → ReusedExchange); the
    * marginal joins are |langs|- and |sources|-row broadcasts and the
    * total a one-row broadcast (whitelisted). Output is ONE row.
    */
  def langSourceChi2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = documents(s, dir).groupBy($"lang", $"source")
      .agg(count(lit(1)).as("o"))
    val rMarg = cells.groupBy($"lang").agg(sum($"o").as("r"))
    val cMarg = cells.groupBy($"source").agg(sum($"o").as("c"))
    val tot = rMarg.agg(sum($"r").as("n_docs"), count(lit(1)).as("n_langs"))
      .crossJoin(cMarg.agg(count(lit(1)).as("n_sources")))
    cells
      .join(broadcast(rMarg), Seq("lang"))
      .join(broadcast(cMarg), Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("src_seg", $"source")
      .withColumn("dnum", $"n_docs" * $"o" - $"r" * $"c")
      .withColumn("term", ($"dnum" * $"dnum").cast("double") /
        ($"n_docs" * $"r" * $"c").cast("double"))
      .groupBy($"n_docs", $"n_langs", $"n_sources")
      .agg(count(lit(1)).as("n_cells"),
        expr("aggregate(transform(sort_array(collect_list(struct(lang, src_seg, term))), " +
          "x -> x.term), 0D, (a, x) -> a + x)").as("chi2"))
      .withColumn("df", ($"n_langs" - 1) * ($"n_sources" - 1))
      .select($"n_docs", $"n_langs", $"n_sources", $"n_cells", $"chi2", $"df")
  }

  /** t51 — GOPHER DUPLICATE-N-GRAM RULES (Rae et al. 2021 §A1.1, the
    * repetition rule set Dolma/RedPajama reimplement): per doc, the
    * fraction of characters contained in duplicate 2-/3-/4-grams —
    * Σ_{grams with count ≥ 2} count·len(gram) over the doc's
    * whitespace-joined char length. This complements t17, which gates
    * on the single TOP token/bigram and the longest run: the Gopher
    * form charges EVERY repeated gram, so a doc padded with many
    * distinct-but-repeated phrases fails here while sliding under
    * t17's top-1 bars. Overlapping occurrences are counted per
    * occurrence (fractions can exceed 1 — the standard
    * implementation's behavior, kept deliberately). Verdict bars are
    * the paper's: dup2 ≤ 0.20, dup3 ≤ 0.18, dup4 ≤ 0.16, compared
    * cross-multiplied on exact integers (·5 ≤ tc, ·50 ≤ 9·tc,
    * ·25 ≤ 4·tc) so the verdict never touches a float.
    *
    * Determinism: counts and char sums are exact BIGINTs (gram length
    * = length() of the space-joined gram string — identical in both
    * engines); each reported fraction is ONE IEEE divide of two exact
    * ints.
    *
    * Scale shape: ONE tokenize scan; the three gram sizes come from
    * one doc-partitioned window (lead ×3 — no self-join, no second
    * scan) and explode 3× per position before the (doc, n, gram)
    * aggregate map-side combines; the rule table is a per-doc
    * conditional aggregate. Nothing ever shuffles at corpus-char
    * granularity except the gram rows themselves, exactly like
    * t06/t17.
    */
  def gopherRules(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tok = documents(s, dir)
      .select($"doc_id", posexplode(toks($"text")))
      .select($"doc_id", $"pos", $"col".as("tok"))
    val tot = tok.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (sum(length($"tok")) + count(lit(1)) - 1).as("total_chars"))
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val led = tok
      .withColumn("t1", lead($"tok", 1).over(w))
      .withColumn("t2", lead($"tok", 2).over(w))
      .withColumn("t3", lead($"tok", 3).over(w))
    val grams = led.select($"doc_id", explode(array(
        struct(lit(2L).as("n"),
          when($"t1".isNotNull, concat_ws(" ", $"tok", $"t1")).as("g")),
        struct(lit(3L).as("n"),
          when($"t2".isNotNull, concat_ws(" ", $"tok", $"t1", $"t2")).as("g")),
        struct(lit(4L).as("n"),
          when($"t3".isNotNull, concat_ws(" ", $"tok", $"t1", $"t2", $"t3")).as("g"))))
        .as("ng"))
      .select($"doc_id", $"ng.n".as("n"), $"ng.g".as("g"))
      .filter($"g".isNotNull)
    val dup = grams.groupBy($"doc_id", $"n", $"g")
      .agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(
        coalesce(sum(when($"n" === 2 && $"c" >= 2, $"c" * length($"g"))), lit(0L))
          .as("dup2_chars"),
        coalesce(sum(when($"n" === 3 && $"c" >= 2, $"c" * length($"g"))), lit(0L))
          .as("dup3_chars"),
        coalesce(sum(when($"n" === 4 && $"c" >= 2, $"c" * length($"g"))), lit(0L))
          .as("dup4_chars"))
    val frac = (d: Column) =>
      when($"total_chars" > 0, d.cast("double") / $"total_chars".cast("double"))
    tot.join(dup, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens", $"total_chars",
        coalesce($"dup2_chars", lit(0L)).as("dup2_chars"),
        coalesce($"dup3_chars", lit(0L)).as("dup3_chars"),
        coalesce($"dup4_chars", lit(0L)).as("dup4_chars"))
      .withColumn("frac2", frac($"dup2_chars"))
      .withColumn("frac3", frac($"dup3_chars"))
      .withColumn("frac4", frac($"dup4_chars"))
      .withColumn("gopher_ok",
        $"dup2_chars" * 5 <= $"total_chars" &&
        $"dup3_chars" * 50 <= $"total_chars" * 9 &&
        $"dup4_chars" * 25 <= $"total_chars" * 4)
      .orderBy($"doc_id")
  }
}
