package graft

import org.scalatest.funsuite.AnyFunSuite

/** The round-1 lesson as a standing gate: no registered query may plan
  * an all-pairs join. Every `SparkEntry.queries` entry is analyzed at
  * sf0.001 and its optimized plan must be free of cartesian products
  * and nested-loop joins — except the whitelisted scalar/codebook
  * broadcasts, whose build side is provably tiny by construction.
  */
class PlanAuditSpec extends AnyFunSuite {

  /** One QueryExecution per registered query, shared by every sweep
    * gate below. Six gates each re-analyzed and re-optimized all 266
    * plans (~35-40 s per sweep — ~4 min of the suite); QueryExecution
    * caches each phase after first touch, so the suite now pays ONE
    * analysis/optimization pass (plus one physical-planning pass for
    * the executed-plan gates) however many sweeps read it. Same sorted
    * construction order as the individual sweeps had, so temp-view and
    * sidecar side effects land identically.
    */
  private lazy val planned: Seq[(String, org.apache.spark.sql.execution.QueryExecution)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(TestSpark.spark, TestSpark.sfDir).queryExecution
    }

  // crossJoin against a bounded broadcast side is the intended plan:
  //  - q16_above_avg: one-row global aggregate
  //  - s04_knn_ivf:   16-row coarse codebook
  //  - d16_semantic_prune: same 16-row codebook (shared ivfAssigned)
  //  - s08_knn_ivfpq: same 16-row codebook (coarse stage of IVF-PQ)
  //  - t13_tfidf:     one-row n_sources aggregate
  //  - t20_unigram_nll: one-row corpus-total aggregate
  //  - t22_source_divergence: one-row corpus-total aggregate
  //  - t23_temp_resample: one-row corpus-minimum aggregate
  //  - s09_centroid_reps: same 16-row codebook as s04 (shared seeding)
  //  - t26_bigram_nll: one-row vocabulary-count aggregate
  //  - t27_mixture_plan: one-row budget-minimum aggregate
  //  - s11_recall_audit: same 16-row codebook as s08 (the audited index)
  //  - s12_cell_rebalance: one-row corpus-total aggregate + the 16x16
  //    codebook nearest-neighbor self-join (both broadcast, K-bounded)
  //  - s13_sq_rerank: one-row global (gmin, gmax) quantization range
  //  - t28_vocab_growth: one-row corpus doc-count aggregate
  //  - s14_knn_graph: same 16-row codebook as s04 (shared ivfAssigned)
  //  - s15_kmeans_step: same 16-row codebook (assignment + seed join)
  //  - s20_filtered_knn: same 16-row codebook (the queries' 2-probe
  //    cell ranking crosses 5 query rows with the broadcast codebook)
  //  - s22_ivf_upsert: the FROZEN 14-row historical codebook crossed
  //    with history (index build) and with the arrival delta (upsert
  //    assignment) — both broadcast, K-bounded
  //  - t35_quality_calibration: t20's one-row corpus-total aggregate
  //    (the NLL side reuses unigramLogProb verbatim)
  //  - s24_radius_search: same 16-row codebook as s20 (the queries'
  //    2-probe cell ranking)
  //  - t36_pmi_collocations: one-row total-bigram-count aggregate
  //  - q25_integrity_audit: one-row FK-orphan-count aggregate crossed
  //    with the one-row key-stats aggregate
  //  - t37_bm25: one-row corpus-stats aggregate (N, Σdl, per-term df)
  //  - q30_idle_rich: the one-row positive-balance threshold aggregate
  //  - s28_sq_upsert: the one-row frozen (gmin, gmax) export range
  //  - t39_heaps_fit: t28's one-row doc-count aggregate, inherited via
  //    the shared vocabGrowth frame (t28_vocab_growth is whitelisted
  //    above for the same join)
  //  - s25_srp_hamming / s26_srp_upsert: the one-row 16×64 ±1 plane
  //    matrix (a literal derived from md5, built once and broadcast)
  private val boundedCrossJoins =
    Set("q16_above_avg", "s04_knn_ivf", "d16_semantic_prune", "s08_knn_ivfpq",
        "t13_tfidf", "t20_unigram_nll", "t22_source_divergence",
        "t23_temp_resample", "s09_centroid_reps", "t26_bigram_nll",
        "t27_mixture_plan", "s11_recall_audit", "s12_cell_rebalance",
        "s13_sq_rerank", "t28_vocab_growth", "s14_knn_graph",
        "s15_kmeans_step", "s16_mutual_knn", "s20_filtered_knn",
        "t35_quality_calibration", "s22_ivf_upsert",
        "s24_radius_search", "t36_pmi_collocations", "q25_integrity_audit",
        "t37_bm25", "s25_srp_hamming", "s26_srp_upsert", "s27_srp_banded",
        "t39_heaps_fit", "q30_idle_rich", "s28_sq_upsert",
        // e25: the only cross join is the ONE-ROW broadcast session
        // total joined onto the |types|^2 pair aggregate.
        "e25_session_lift",
        // s31: query×codebook cell ranking (5 × 16 broadcast) and the
        // 5-query exact-arm broadcast — the s11/s20 audit shapes.
        "s31_nprobe_sweep",
        // s32: inherits s04's corpus×codebook broadcast assignment and
        // s25's 5-query signature broadcast; the fusion itself joins
        // two top-k lists on (q_id, vec_id) — no new cross join.
        "s32_rrf_fusion",
        // s33: s04's assignment cross join plus the one-row corpus
        // total broadcast onto five audit rows (the q25/t13 class).
        "s33_serving_cost",
        // t49: the one-row (n_raw, n_tgt) totals broadcast onto the
        // per-doc aggregate — the t20/t26 corpus-total class.
        "t49_dsir_weights",
        // d40: s04's 16-row codebook broadcast (assignment + the
        // cos-to-centroid rejoin); candidate pairs are a cell-equi
        // join, never a cross join.
        "d40_semdedup",
        // q36: the one-row key-range stats broadcast onto the scan and
        // onto each 16-row arm (the q16 corpus-stats class).
        "q36_zorder_layout",
        // s34: s04's codebook assignment cross join plus the 16-row
        // (cell sum-vector, count) broadcast the linearized scoring
        // pass dots against.
        "s34_silhouette",
        // d41: inherits d40's codebook cross join through the
        // semantic decision arm; nothing else crosses.
        "d41_signal_agreement",
        // e32: the one-row last-active-day broadcast onto the
        // days²-sized cohort matrix — the calendar-observability
        // gate (the q16/t49 corpus-stats class).
        "e32_retention_decay",
        // q39: four one-row stat arms (side totals, exact pair count,
        // 16-bucket histogram fold) assembled into the single audit
        // row — the q16/t13 corpus-stats class.
        "q39_join_estimate",
        // t52: the one-row (n_docs, n_langs, n_sources) totals
        // broadcast onto the |langs|x|sources| cell table — the
        // q16/t49 corpus-stats class.
        "t52_lang_source_chi2",
        // e35: the one-row corpus total broadcast onto the peak day's
        // user rows — the q16/t49 corpus-stats class.
        "e35_spike_attribution",
        // q43: the one-row view max broadcast onto the supplier-
        // cardinality revenue view — the q16 scalar-subquery class.
        "q43_top_supplier",
        // e39: the one-row daily-count totals broadcast onto the
        // <=7-row weekday fold — the q16/t49 corpus-stats class.
        "e39_dow_seasonality",
        // c01: the one-row t_budget minimum broadcast onto the
        // |sources| mixture rows — t27's whitelisted shape, inherited
        // by the campaign's mixture stage.
        "c01_curation_campaign",
        // t54: three one-row broadcasts — the (n_ref, v_ref) reference
        // totals onto the scored-bigram rows (the t20/t49 corpus-stats
        // class), the doc-count total onto the bounded cell histogram,
        // and the quantized median bar onto the per-doc rows.
        "t54_jm_quality_filter",
        // e40: the one-row observed-span broadcast, crossed twice —
        // onto the |types| spine seeds and onto the |types| report
        // rows (the q16 corpus-stats class).
        "e40_silent_gaps",
        // c02: inherits t54's one-row crosses (reference totals, cell
        // histogram total, quantized bar) plus t49's one-row model
        // totals — every cross side is a one-row aggregate.
        "c02_ingest_campaign",
        // d46: the pair-level and doc-level one-row stat arms crossed
        // into the single takedown report row (the q25/q39 class).
        "d46_takedown_audit")

  test("no registered query plans a cartesian or nested-loop join") {
    val offenders = planned.flatMap { case (name, qe) =>
      val plan = qe.optimizedPlan.toString
      val bad =
        (plan.contains("Join Cross") || plan.contains("CartesianProduct")) &&
          !boundedCrossJoins.contains(name)
      if (bad) Some(name) else None
    }
    assert(offenders.isEmpty, s"all-pairs plans in: ${offenders.mkString(", ")}")
  }

  test("small dimensions broadcast and aggregates combine map-side in executed plans") {
    val spark = TestSpark.spark
    def executed(name: String): String = {
      val df = SparkEntry.queries(name)(spark, TestSpark.sfDir)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    // q03's nation/region joins carry explicit broadcast hints (fixed
    // 25/5-row dimensions — safe at any scale factor), so the executed
    // plan must contain broadcast hash joins regardless of stats.
    val q03 = executed("q03_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(q03).length >= 2, q03.take(3000))
    // q04 broadcasts the part-brand projection (MB-scale at 100 TB).
    assert(executed("q04_brand_volume").contains("BroadcastHashJoin"))
    // s02's ANN probe broadcasts the small query set into the
    // bucket-equi join — the corpus is never shuffled.
    assert(executed("s02_knn_bucketed").contains("BroadcastHashJoin"))
    // q01 is the pure scan→aggregate shape: no join anywhere, and the
    // aggregation must combine map-side (partial_sum before the
    // exchange) — the shuffle carries groups, not rows.
    val q01 = executed("q01_pricing_summary")
    assert(!q01.contains("Join"), q01.take(3000))
    assert(q01.contains("partial_sum"), q01.take(3000))
  }

  test("d18 shuffles carry no arrays except the 12-int signatures") {
    // The round-9 form carried per-doc distinct-token ARRAYS through two
    // pair joins (O(doc tokens) per pair row); the rewrite recounts true
    // Jaccard from the token inverted index, so every shuffled pair row
    // is integers. The 12-slot minhash signature (est_jaccard's input)
    // is the ONLY array any exchange may carry.
    val spark = TestSpark.spark
    val df = SparkEntry.queries("d18_mh_accuracy")(spark, TestSpark.sfDir)
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    def shuffles(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
      case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
      case q: QueryStageExec => shuffles(q.plan)
      case r: ReusedExchangeExec => Seq.empty
      case s: ShuffleExchangeLike => s +: s.children.flatMap(shuffles)
      case other => other.children.flatMap(shuffles)
    }
    val ex = shuffles(df.queryExecution.executedPlan)
    assert(ex.nonEmpty, "expected shuffles in the LSH pair pipeline")
    ex.foreach { e =>
      val arrays = e.output
        .filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
        .map(_.name).filterNot(_.startsWith("sig"))
      assert(arrays.isEmpty,
        s"d18 shuffle carries array column(s) ${arrays.mkString(",")}: true " +
          "Jaccard must recount from the token index, not shuffle token arrays")
    }
  }

  test("no corpus-cardinality group carries an unbounded collect_list") {
    // The round-11 finding on t22/t24: an ordered fold whose
    // collect_list buffer is keyed by SOURCE alone grows with the
    // source's vocabulary — a multi-GB single buffer in one task at
    // 100 TB. The discipline: every collect_list must either group by
    // a per-item key (doc_id/vec_id/q_id — the buffer is bounded by
    // one document/query) or carry a second grouping column (the
    // 256-way term-hash segment, bounding the buffer at the segment
    // width). Checked mechanically across every registered query.
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.catalyst.expressions.aggregate.CollectList
    val itemKeys = Set("doc_id", "vec_id", "q_id")
    val offenders = planned.flatMap { case (name, qe) =>
      qe.optimizedPlan.collect {
        case a: Aggregate =>
          val lists = a.aggregateExpressions.flatMap(_.collect {
            case c: CollectList => c
          })
          // A collect over the 256 segment sums (references the `seg`
          // key) is domain-bounded even under a single grouping key —
          // that IS the outer level of the segmented fold. Same for
          // `dim` (the 64-wide embedding dimension, s34's per-cell
          // sum-vector assembly): both keys range over a fixed domain
          // by construction, so the buffer cannot grow with the
          // corpus. `hb16` is q39's hashed-histogram bucket
          // (`datediff % 16` — a fixed 16-value domain); `dow` is
          // e39's weekday (a fixed 7-value domain).
          // `bin` is s38's PSI histogram bin (a fixed 8-value domain).
          val domainKeys = Set("seg", "dim", "hb16", "dow", "bin")
          val unbounded = lists.filterNot(
            _.child.references.toSeq.map(_.name).exists(domainKeys.contains))
          val boundedGroup =
            a.groupingExpressions.size >= 2 ||
              a.groupingExpressions.flatMap(_.references.toSeq.map(_.name))
                .exists(itemKeys.contains)
          // A collect whose input passes through a Limit is bounded by
          // that limit whatever the grouping (t38's top-50 OLS fold) —
          // but ONLY when the Limit sits on the aggregate's DIRECT
          // input lineage (walk unary nodes only): a Limit buried in
          // one join branch must not exempt an unbounded collect fed
          // by the other branch.
          def limitOnLineage(
              p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
            p match {
              case _: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit => true
              case u: org.apache.spark.sql.catalyst.plans.logical.UnaryNode =>
                limitOnLineage(u.child)
              case _ => false
            }
          val limitBounded = limitOnLineage(a.child)
          if (unbounded.nonEmpty && !boundedGroup && !limitBounded)
            Some(s"$name: grouping=${a.groupingExpressions.map(_.sql).mkString(",")}")
          else None
      }.flatten
    }
    assert(offenders.isEmpty,
      s"unbounded collect_list buffers in: ${offenders.mkString("; ")}")
  }

  test("no registered query buffers an exact order statistic without a certificate covenant") {
    // The t54→t35 recurrence made mechanical: an exact order-statistic
    // aggregate (percentile / percentile_disc / mode) buffers its
    // GROUP'S whole value multiset in one aggregation state — linear
    // in corpus size whenever the grouping keys split the corpus into
    // a bounded number of groups. Hand-auditing missed t35 for three
    // rounds; this gate flags every registered plan containing one,
    // and the whitelist below names the deliberate survivors — each an
    // oracle-checkable CERTIFICATE arm whose 100 TB production path
    // (a mergeable sketch or the quantized cell-histogram rank) is
    // registered alongside. The house replacement for a new exact
    // median is TextOps.quantizedBar (1e-4 cells + integer rank —
    // exact, bounded, oracle-replayable); reach for this whitelist
    // only when the query's PURPOSE is certifying a sketch.
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Mode, PercentileBase}
    val certificateArms: Map[String, String] = Map(
      "q14_percentiles" -> ("the exact PERCENTILE_CONT surface op, kept " +
        "exact so the oracle checks values; q23 registers the t-digest scale path"),
      "q23_approx_percentiles" -> ("the exact arm IS the query: it gates " +
        "approx_percentile within tolerance, the t07 HLL audit design"),
      "e17_dwell_percentiles" -> ("per-(from,to) exact tail certificate over " +
        "|types|^2 groups; the gated approx sketch is the production path"),
      "e19_funnel_lags" -> ("2-stage exact lag certificate (the q14 " +
        "convention) over the sketch a 100 TB run would use"))
    val offenders = planned
      .filterNot { case (name, _) => certificateArms.contains(name) }
      .flatMap { case (name, qe) =>
        qe.optimizedPlan.collect {
          case a: Aggregate =>
            a.aggregateExpressions.flatMap(_.collect {
              case p: PercentileBase => s"$name: ${p.prettyName}"
              case m: Mode => s"$name: ${m.prettyName}"
            })
        }.flatten
      }
    assert(offenders.isEmpty,
      s"exact order-statistic buffers outside the certificate whitelist:\n${offenders.mkString("\n")}")
    certificateArms.keys.foreach(k =>
      assert(SparkEntry.queries.contains(k), s"stale whitelist entry $k"))
  }

  test("no registered query runs an unpartitioned window over unbounded input") {
    // The round-15 q31 lesson made mechanical: a logical Window whose
    // partitionSpec is empty or all-foldable (partitionBy(lit(1)) is
    // the same single task) moves its WHOLE input into one task.
    // Allowed only when (a) a GlobalLimit sits on the window's direct
    // input lineage — walking unary nodes only, the t37/t38
    // top-k-then-rank shape, same lineage rule as the collect_list
    // gate — or (b) the query claims a by-construction input bound BY
    // NAME below. This gate would have caught the original q31 global
    // cumsum (now the range-partitioned two-pass CDF).
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LogicalPlan, UnaryNode, Window => LogicalWindow}
    val boundedByConstruction: Map[String, String] = Map(
      "q26_rolling_revenue" -> ("RANGE-frame input is one row per calendar " +
        "day: |days| is bounded by the corpus time span, not its size"),
      "q28_market_share" -> "input is the nation-level aggregate: |nations| = 25 rows",
      "t28_vocab_growth" -> ("input is the decile table: grouping key " +
        "b = doc_id*10 div n_docs has 10 values"),
      "t30_freq_spectrum" -> ("input is the count-of-counts spectrum: " +
        "|distinct frequencies| = O(sqrt(total tokens)), sub-linear in corpus size"),
      "e07_type_shares" -> ("input is the event-type aggregate: " +
        "|event types| is a fixed small domain (6 here)"),
      "t39_heaps_fit" -> ("inlines t28's decile windows: same 10-row " +
        "decile table, under t39's own limit(10) fold"),
      "t54_jm_quality_filter" -> ("input is the quantized-score cell " +
        "histogram: |cells| <= 1e4 * ln(10*D^2) is set by the frozen " +
        "model's smoothing constant, not by the corpus"),
      "c02_ingest_campaign" -> ("inherits t54's bar computation: the " +
        "same bounded quantized-score cell histogram"))
    def limitOnLineage(p: LogicalPlan): Boolean = p match {
      case _: GlobalLimit => true
      case u: UnaryNode => limitOnLineage(u.child)
      case _ => false
    }
    val offenders = planned
      .filterNot { case (name, _) => boundedByConstruction.contains(name) }
      .flatMap { case (name, qe) =>
        qe.optimizedPlan.collect {
          case wnd: LogicalWindow
              if wnd.partitionSpec.forall(_.foldable) && !limitOnLineage(wnd.child) =>
            s"$name: window(${wnd.windowExpressions.map(_.name).mkString(",")})"
        }
      }
    assert(offenders.isEmpty,
      s"unpartitioned windows over unbounded input:\n${offenders.mkString("\n")}")
    // The whitelist must stay live: a renamed/retired query must not
    // leave a stale claim behind.
    boundedByConstruction.keys.foreach(k =>
      assert(SparkEntry.queries.contains(k), s"stale whitelist entry $k"))
  }

  test("wide-table scans prune columns: no registered query reads a full wide schema") {
    // The 100 TB IO gate made mechanical: a parquet scan of a wide
    // table (≥5 columns) that reads EVERY column is either a bug or a
    // query that genuinely consumes the whole row — and none here
    // does. Checked on the physical plan's requiredSchema, per scan,
    // across all registered queries.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val offenders = planned.flatMap { case (name, qe) =>
      val bad = scans(qe.executedPlan)
        .filter { s =>
          val full = s.relation.dataSchema.fields.length
          full >= 5 && s.requiredSchema.fields.length >= full
        }
      if (bad.nonEmpty)
        Some(s"$name reads full ${bad.map(_.requiredSchema.fieldNames.mkString("(", ",", ")")).mkString("; ")}")
      else None
    }
    assert(offenders.isEmpty,
      s"unpruned wide scans:\n${offenders.mkString("\n")}")
  }

  test("no broadcast hint pins an unbounded fact-scale frame") {
    // The round-16 review lesson (fe50b6a: unconditional broadcast()
    // on fact-scale FK parents) made mechanical, like the q31 window
    // gate: an explicit broadcast hint whose subtree reaches a
    // FACT-table parquet scan would materialize that table on the
    // driver at 100 TB. A hint is structurally safe only when every
    // fact scan under it passes through a cardinality-bounding node
    // first — a GlobalLimit, or an Aggregate whose grouping keys are
    // NOT per-item identities (a one-row corpus total, a by-source /
    // by-day / by-cell rollup are all domain-bounded; grouping by
    // doc_id/vec_id keeps corpus cardinality and bounds nothing).
    // Known limitation: memoized sidecars are localCheckpoint-backed
    // (LogicalRDD), so their upstream scans are invisible here — those
    // frames are vocabulary/codebook-sized by the sidecar contract and
    // covered by SidecarDiskSpec instead.
    val spark = TestSpark.spark
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    // part/supplier/customer are SF-scaling too (TPC-H: SF×200k /
    // SF×10k / SF×150k rows — tens of billions at a 100 TB SF), so a
    // broadcast hint on them is as wrong as one on lineitem. Only
    // nation (25) and region (5) are fixed-cardinality.
    val factTables = Seq("lineitem", "orders", "events", "documents",
      "embeddings", "part", "supplier", "customer")
    // Per-item identity keys: an Aggregate grouped on one of these has
    // the cardinality of the fact table itself and bounds nothing.
    val itemKeys = Set("doc_id", "vec_id", "q_id", "event_id",
      "l_orderkey", "o_orderkey")
    def factNames(r: LogicalRelation): Seq[String] = r.relation match {
      case f: HadoopFsRelation =>
        f.location.rootPaths.map(_.getName.stripSuffix(".parquet"))
          .filter(factTables.contains).toSeq
      case _ => Seq.empty
    }
    def boundingAgg(a: Aggregate): Boolean =
      a.groupingExpressions.flatMap(_.references.toSeq.map(_.name))
        .forall(!itemKeys.contains(_))
    // A Filter pinning an item key DIRECTLY against a literal
    // (vec_id < 16, doc_id < 50, doc_id = k, key IN (...)) bounds the
    // frame at the literal's magnitude whatever the corpus size — the
    // s-family query/codebook sets and the m13/m14 probe sets. A key
    // wrapped in arithmetic (doc_id % 97 = 0) deliberately does NOT
    // qualify: a modulo slice keeps corpus cardinality.
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, AttributeReference, Cast, EqualTo, Expression, In, LessThan, LessThanOrEqual}
    // The analyzer wraps comparison operands in implicit Casts; strip
    // them, but ONLY casts — a key inside arithmetic stays unbounded.
    def keyAttr(e: Expression): Boolean = e match {
      case a: AttributeReference => itemKeys.contains(a.name)
      case c: Cast => keyAttr(c.child)
      case _ => false
    }
    def literalBound(e: Expression): Boolean = e match {
      case CAnd(l, r) => literalBound(l) || literalBound(r)
      case LessThan(l, r) if r.foldable => keyAttr(l)
      case LessThanOrEqual(l, r) if r.foldable => keyAttr(l)
      case EqualTo(l, r) if r.foldable => keyAttr(l)
      case EqualTo(l, r) if l.foldable => keyAttr(r)
      case In(v, vs) if vs.forall(_.foldable) => keyAttr(v)
      case _ => false
    }
    // A literal-bound Filter exempts ONLY a plain scan-chain beneath it
    // (Project/Filter/scan): `vec_id < 16` directly over the embeddings
    // scan bounds that scan. A bounding predicate sitting ABOVE a join
    // (say `q_id < 5` applied after joining a full embeddings scan)
    // bounds the OUTPUT rows but not the work or the unrelated scans
    // under it — keep recursing there so a future fact-scale broadcast
    // can't hide beneath an incidental bound.
    // Generate (posexplode of a vector's dims) is row-LOCAL fan-out —
    // it preserves the bounded key column and multiplies rows only by
    // the per-row array size, so a literal key bound above it still
    // bounds the scan beneath it (the s-family query-set shape:
    // Filter(vec_id < k) > Project > Generate > embeddings).
    def scanChain(p: LogicalPlan): Boolean = p match {
      case _: LogicalRelation => true
      case pr: Project => scanChain(pr.child)
      case f: Filter => scanChain(f.child)
      case g: Generate => scanChain(g.child)
      case _ => false
    }
    def unboundedFacts(p: LogicalPlan): Seq[String] = p match {
      case _: GlobalLimit => Seq.empty
      case a: Aggregate if boundingAgg(a) => Seq.empty
      case f: Filter if literalBound(f.condition) && scanChain(f.child) =>
        Seq.empty
      case r: LogicalRelation => factNames(r)
      case other => other.children.flatMap(unboundedFacts)
        .map(t => s"${other.nodeName}>$t")
    }
    // Justified exceptions, each pinned by name like the cross-join
    // whitelist:
    val justified: Map[String, String] = Map(
      // t41 broadcasts the union of suite fingerprints; the fixture
      // carves suites out of the corpus (doc_id % 97 / % 89), but in
      // production the fingerprints come from FIXED external eval
      // suites whose size is set by the benchmark, not the corpus —
      // the same bounded-artifact contract as the benchGrams sidecar
      // its five single-suite consumers broadcast.
      "t41_multi_suite_decontam" -> "suite fingerprints are eval-suite-sized",
      // Arrival-delta broadcasts: the fixture slices arrivals by
      // modulo (vec_id % 7 = 2 / doc_id % 5 = 0), which this gate
      // correctly reads as corpus-cardinality — but the slice STANDS
      // IN for one ingest batch, bounded by intake cadence, never by
      // corpus size (the s22/s28 frozen-model upsert convention; the
      // streaming doors process the same deltas one trigger at a
      // time).
      "s22_ivf_upsert" -> "arrival-delta broadcast (ingest-batch-sized)",
      "s23_pq_upsert" -> "arrival-delta broadcast (ingest-batch-sized)",
      "s28_sq_upsert" -> "arrival-delta broadcast (ingest-batch-sized)",
      "m13_incremental_image" -> "arrival-delta broadcast (ingest-batch-sized)",
      // Rank-filtered shortlists over literal-bounded query sets: the
      // broadcast payload is Filter(row_number <= K) partitioned by
      // q_id, where q_id takes <= 5 literal-bounded values — <= 5·K
      // rows whatever the corpus. The full scan the gate sees under
      // the hint feeds the DISTRIBUTED equi-join that computes the
      // shortlist; it is never part of the broadcast payload itself.
      "s13_sq_rerank" -> "rank<=25 per <=5 queries: <=125-row broadcast",
      "s20_filtered_knn" -> "rank<=nprobe per <=5 queries: probe-set broadcast")
    val offenders = planned
      .filterNot { case (name, _) => justified.contains(name) }
      .flatMap { case (name, qe) =>
        qe.analyzed.collect {
          case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) =>
            unboundedFacts(h.child).map(t => s"$name: broadcast over $t")
        }.flatten
      }
    assert(offenders.isEmpty,
      s"fact-scale broadcast hints:\n${offenders.distinct.mkString("\n")}")
    justified.keys.foreach(k =>
      assert(SparkEntry.queries.contains(k), s"stale whitelist entry $k"))
  }

  test("executed plans of the pair generators use hash or merge joins only") {
    val spark = TestSpark.spark
    // (d16/s08 are absent: their bounded 16-row codebook broadcast is
    // BY DESIGN a BroadcastNestedLoopJoin — whitelisted above)
    Seq("d08_lsh_pairs_capped", "d09_simhash_banded", "d10_embedding_bucketed",
        "e09_user_sim_bucketed", "d04_shingle_jaccard", "s03_label_purity",
        "d17_containment", "d18_mh_accuracy", "t19_novelty")
      .foreach { name =>
        val df = SparkEntry.queries(name)(spark, TestSpark.sfDir)
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name: $plan")
        assert(!plan.contains("CartesianProduct"), s"$name: $plan")
      }
  }
}
