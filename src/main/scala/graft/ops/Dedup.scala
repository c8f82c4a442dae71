package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.TextHashes._
import graft.functions.VectorFunctions._

/** Deduplication operators for a training-data pipeline, over the
  * `documents` and `embeddings` tables: exact (hash groups), MinHash+LSH
  * (shingle → signature → banded buckets → candidate pairs), SimHash
  * (hamming-ball near-dup), n-gram Jaccard, and embedding-cosine
  * near-dup.
  *
  * Cross-engine hashing: every hash is `md5` (available in both Spark
  * and DuckDB); 32-bit integer hashes are the first 8 hex chars parsed
  * base-16 (`conv(..,16,10)` / `CAST('0x'||.. AS BIGINT)`), so signatures
  * are identical in both engines and the oracles check real values, not
  * just shapes.
  *
  * Scale story (100 TB): everything here is shuffle-bounded by design —
  * MinHash/SimHash signatures are one native codegen expression call
  * per document (graft.functions.TextHashes — no token explode, no
  * interpreted lambda folds), and candidate generation is an equi-join
  * on (band, bucket-key) — the LSH trick that replaces the quadratic
  * all-pairs comparison. Skewed buckets are bounded by caps (d08/d12)
  * or diluted by wide bands (d09); only the final verification of
  * candidate pairs (a tiny fraction) touches pairwise math. The
  * all-pairs forms (minhashLshPairs, simhashPairs, embeddingDupPairs)
  * are NOT registered queries: they are the exhaustive ground truth the
  * bucketed paths are recall-checked against on small inputs
  * (RecallSpec), and PlanAuditSpec gates every registered query against
  * cartesian plans.
  */
object Dedup {

  /** Exact duplicate groups by full-text md5. One narrow projection +
    * one aggregate on the 128-bit digest — the canonical exact-dedup at
    * any scale (the digest, not the document, is what shuffles).
    */
  def exactDupGroups(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .select($"doc_id", md5($"text").as("text_hash"))
      .groupBy($"text_hash")
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("min_doc_id"))
      .orderBy($"text_hash")
  }

  /** MinHash signatures in long form (doc_id, i, minhash) — the
    * oracle-checkable dump of the signature matrix. One md5 per token
    * (h32), then 12 cheap affine rehashes h_i(t) = ((2i+1)·h + 40503·i)
    * mod (2³¹−1) — the standard universal-hash trick that avoids 12
    * md5 evaluations per token — all inside the native codegen
    * expression [[graft.functions.MinHashSig]], one static call per row
    * (see TextHashes.scala for why the higher-order-function folds were
    * replaced: interpreted lambda dispatch per token×slot was the
    * measured floor under every dedup query).
    */
  def minhashSignatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .select($"doc_id", posexplode(minhash_sig($"text")))
      .select($"doc_id", $"pos".cast("long").as("i"), $"col".as("minhash"))
      .orderBy($"doc_id", $"i")
  }

  /** LSH candidate pairs: 4 bands × 3 signature rows, band keys packed
    * into one long (mod 2³¹−1; collisions only merge buckets,
    * identically in the oracle). Docs sharing any band key become a
    * candidate pair via an equi-join on (band, key) — linear shuffle,
    * never all-pairs. (Probability calibration: a pair with Jaccard j
    * collides with prob 1-(1-j³)⁴.)
    *
    * Skew note for 100 TB: on corpora with heavy template reuse a
    * single band bucket can hold thousands of docs (measured: max
    * bucket 2668 of 5000 docs on the synthetic corpus → 15M candidate
    * pairs). The standard mitigations compose here unchanged: cap
    * bucket size ([[minhashLshPairsCapped]]), salt the band key, or
    * lean on AQE skew-join splitting.
    */
  /** (band, bkey, doc_id) — the LSH index both pair generators share,
    * read from the session's [[CorpusIndexes]] cache (built once per
    * run, one codegen'd [[graft.functions.MinHashBands]] call per
    * document; at 100 TB this is the persisted band sidecar).
    */
  private def bandKeys(s: SparkSession, dir: String): DataFrame =
    CorpusIndexes.minhashBands(s, dir)

  def minhashLshPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = bandKeys(s, dir)
    val a = bands.toDF("band_a", "bkey_a", "doc_a")
    val b = bands.toDF("band_b", "bkey_b", "doc_b")
    a.join(b, $"band_a" === $"band_b" && $"bkey_a" <=> $"bkey_b" && $"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b").distinct()
      .orderBy($"doc_a", $"doc_b")
  }

  /** The scale-path variant of [[minhashLshPairs]]: band buckets larger
    * than a cap are dropped before pair generation. On template-heavy
    * corpora a single bucket can hold thousands of docs and the pair
    * explosion is quadratic per bucket; members of such buckets are
    * near-certain duplicates that the exact-fingerprint pass (d01) or a
    * cheaper representative-based sweep handles, so dropping the bucket
    * trades negligible recall for a hard bound on join output —
    * candidates ≤ cap² · buckets instead of max_bucket². The cap is a
    * group-count semi-join, identical in the oracle.
    */
  /** [[minhashLshPairsCapped]] without the presentation sort — the
    * form consumers like [[dupClusters]] build on (a global sort ahead
    * of further shuffles would be pure waste).
    */
  private def cappedPairsUnsorted(s: SparkSession, dir: String, cap: Int): DataFrame = {
    import s.implicits._
    val bands = bandKeys(s, dir)
    val smallBuckets = bands.groupBy($"band", $"bkey")
      .agg(count(lit(1)).as("bucket_n"))
      .filter($"bucket_n" <= cap && $"bucket_n" > 1)
      .select($"band", $"bkey")
    val inSmall = bands.join(smallBuckets, Seq("band", "bkey"))
    val a = inSmall.toDF("band_a", "bkey_a", "doc_a")
    val b = inSmall.toDF("band_b", "bkey_b", "doc_b")
    a.join(b, $"band_a" === $"band_b" && $"bkey_a" <=> $"bkey_b" && $"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b").distinct()
  }

  def minhashLshPairsCapped(s: SparkSession, dir: String, cap: Int = 64): DataFrame = {
    import s.implicits._
    cappedPairsUnsorted(s, dir, cap).orderBy($"doc_a", $"doc_b")
  }

  /** Duplicate-cluster assignment: connected components over the
    * capped-LSH candidate-pair graph ([[minhashLshPairsCapped]]), each
    * doc labeled with the min doc_id of its component — the step a real
    * dedup pipeline runs after pair generation, so "keep one per
    * cluster" becomes a plain filter (doc_id = cluster_id).
    *
    * Algorithm: min-label propagation with pointer jumping. Each round
    * does (1) a neighbor step — every node takes the min label over
    * itself and its neighbors (one equi-join of the edge list against
    * labels plus a min-aggregate) — and (2) a jump step — every node
    * shortcuts to its label's label (one self-join of the label table).
    * Both are linear shuffles, no all-pairs anywhere; the jump halves
    * the distance to the component minimum each round, so convergence
    * is O(log diameter) instead of O(diameter) — measured: template
    * chains at sf0.1 give diameters in the hundreds, which one-hop
    * propagation cannot afford (64 rounds and still unconverged).
    * Every round the label table is `localCheckpoint`ed: the loop's
    * output feeds the next iteration, and without truncation the
    * logical plan grows per round until analysis time dominates.
    * The driver holds only the per-round changed COUNT, never data.
    *
    * Exact and deterministic (min label is partition-order-free), so
    * the DuckDB oracle reproduces it with a recursive reachability CTE.
    */
  def dupClusters(s: SparkSession, dir: String, cap: Int = 64): DataFrame =
    dupClusterLabels(s, dir, cap).orderBy(col("doc_id"))

  /** d11's (doc_id, cluster_id) labeling without the presentation sort
    * — the text-cluster sidecar graph consumers join (d11, d19, d24).
    * A session sidecar (CorpusIndexes discipline): the CC labeling
    * runs once per (session, dir, cap) and every consumer reads the
    * checkpointed result — at scale this IS the persisted label table
    * a dedup campaign writes next to the corpus snapshot.
    */
  private[graft] def dupClusterLabels(s: SparkSession, dir: String,
                                      cap: Int = 64): DataFrame =
    CorpusIndexes.memo(s, dir, s"text_labels_$cap") {
      connectedComponents(s, cappedPairsUnsorted(s, dir, cap))
    }

  /** d33 — THRESHOLD ABLATION on the near-dup clustering: the same
    * exact-Jaccard pair scores clustered at a permissive τ (0.3, the
    * d04 setting) and at a strict τ (0.95), then diffed per cluster —
    * for each permissive cluster, how many strict groups it fragments
    * into (docs outside the strict clustering count as their own
    * singleton group). The review a τ choice actually gets: clusters
    * held together only by weak edges are where a lower threshold
    * over-merges, and this table names them.
    *
    * Scale shape: the scored pair list is computed ONCE (checkpointed)
    * and filtered twice — the ablation costs one extra CC pass over
    * the STRICT edge subset (≤ the permissive one), never a second
    * corpus scan; the diff is a labels-only join + cluster-sized
    * aggregate.
    */
  def thresholdAblation(s: SparkSession, dir: String,
      tauLo: Double = 0.3, tauHi: Double = 0.95): DataFrame = {
    import s.implicits._
    val scored = scoredJaccardPairs(s, dir, tauLo).localCheckpoint()
    val lo = connectedComponents(s, scored).toDF("doc_id", "lo_cluster")
    val hi = connectedComponents(s, scored.filter($"jaccard" >= tauHi))
      .toDF("doc_id", "hi_cluster")
    lo.join(hi, Seq("doc_id"), "left")
      .withColumn("hi_group", coalesce($"hi_cluster", $"doc_id"))
      .groupBy($"lo_cluster")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"hi_group").as("n_hi_groups"))
      .withColumn("splits_at_hi", $"n_hi_groups" > 1)
      .orderBy($"lo_cluster")
  }

  /** The dedup OUTCOME materialized — what a curation run reports and
    * ships: per duplicate cluster (d11's connected components over the
    * capped-LSH graph), the kept representative (the cluster label,
    * which InvariantSpec proves is the member minimum), how many
    * members collapse into it, and how many characters of near-dup
    * text leave the corpus. The global sums of these columns ARE the
    * campaign's savings report.
    *
    * Scale shape: d11's labeling plus one narrow join against
    * (doc_id, n_chars) and a cluster-sized aggregate — nothing new
    * shuffles but the labels themselves.
    */
  def dedupMaterialize(s: SparkSession, dir: String, cap: Int = 64): DataFrame = {
    import s.implicits._
    // Unordered labels: the report re-aggregates per cluster, so a
    // presentation sort on doc_id here would be a wasted global sort.
    dupClusterLabels(s, dir, cap)
      .join(documents(s, dir).select($"doc_id", $"n_chars"), Seq("doc_id"))
      .groupBy($"cluster_id")
      .agg(count(lit(1)).as("n_members"),
           (count(lit(1)) - 1).as("n_dropped"),
           sum(when($"doc_id" =!= $"cluster_id", $"n_chars").otherwise(0L)).as("chars_dropped"))
      .orderBy($"cluster_id")
  }

  /** d27 — QUALITY-AWARE canonical selection: the dedup DECISION table.
    * d11 labels the duplicate clusters and d19 charges the savings to
    * the min-id representative; a real curation run keeps the BEST
    * member instead — per cluster the survivor is the member with the
    * highest t02 quality score (tie → lowest doc_id), and every
    * implicated document gets an explicit (keep | drop, canonical)
    * verdict row. This is the artifact downstream jobs join against to
    * filter the corpus — the *apply* step the cluster labeling alone
    * doesn't give you.
    *
    * Determinism: the quality double is the t02 expression evaluated in
    * the t02 order (bit-reproducible across engines — the oracle hashes
    * t02's doubles verbatim), and ties break on doc_id, so the argmax
    * is engine-exact.
    *
    * Scale shape: the d11 label sidecar joined once against the narrow
    * (doc_id, quality) scan, then ONE window partitioned by cluster_id
    * — clusters are the connected components of the capped-LSH graph,
    * so partitions are component-sized (no corpus-scale window), and
    * only implicated docs (those with ≥1 near-dup edge) enter the
    * window at all.
    */
  def canonicalSelection(s: SparkSession, dir: String, cap: Int = 64): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"cluster_id")
      .orderBy($"quality".desc, $"doc_id".asc)
    dupClusterLabels(s, dir, cap)
      .join(TextOps.qualityScored(s, dir).select($"doc_id", $"quality"),
        Seq("doc_id"))
      .withColumn("canonical_id", first($"doc_id").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select($"doc_id", $"cluster_id", $"canonical_id",
        ($"doc_id" === $"canonical_id").as("kept"), $"quality")
      .orderBy($"doc_id")
  }

  /** Multi-signal duplicate clustering — what a production pipeline
    * actually runs: the candidate graph is the UNION of independent
    * near-dup signals (capped MinHash-LSH pairs ∪ banded SimHash pairs
    * at hamming ≤ 8), then one connected-components pass labels every
    * doc either signal implicated. Signals compose at the edge level
    * for free; each keeps its own skew bound.
    */
  def dupClustersMulti(s: SparkSession, dir: String, cap: Int = 64): DataFrame = {
    import s.implicits._
    connectedComponents(s,
      cappedPairsUnsorted(s, dir, cap)
        .union(bandedPairsUnsorted(s, dir).select($"doc_a", $"doc_b")))
      .orderBy($"doc_id")
  }

  /** Min-label propagation with pointer jumping over an undirected
    * (doc_a, doc_b) pair graph — see [[dupClusters]]'s scaladoc for the
    * round structure and convergence argument.
    *
    * Rounds vs diameter: the seed performs one neighbor step (radius
    * 1); each subsequent round performs one more neighbor step and one
    * pointer jump, so the distance the component minimum has travelled
    * at least doubles per round — ⌈log₂ d⌉ rounds reach every node of a
    * diameter-d component, plus one fixpoint-confirmation round in
    * which the label-sum witness is unchanged. ConvergenceSpec pins
    * this empirically with adversarial identity/descending chains of
    * diameter 300 (worst case for min-label: the minimum sits at one
    * end), asserting rounds ≤ ⌈log₂ d⌉ + 2. The 64-round guard is
    * therefore headroom for diameters ~2⁶², not a bound the algorithm
    * ever approaches.
    */
  private def connectedComponents(s: SparkSession, pairsDf: DataFrame): DataFrame =
    connectedComponentsWithRounds(s, pairsDf)._1

  /** The shared CC labeling over any (doc_a, doc_b) edge list — for
    * graph consumers outside this object (s16's mutual-kNN clusters).
    */
  private[ops] def connectedComponentsOver(s: SparkSession, pairsDf: DataFrame): DataFrame =
    connectedComponents(s, pairsDf)

  /** [[connectedComponents]] also reporting how many propagation rounds
    * ran — the test seam for the convergence bound. The second element
    * is the ONLY value the driver ever materializes per round (the
    * label-sum fixpoint witness is a scalar aggregate).
    *
    * Small-graph fast path (round 10): after the pair list materializes
    * (it always does — the loop needs it checkpointed anyway), its COUNT
    * is known for free, and when the edge list is broadcast-sized the
    * whole graph collapses to a driver union-find — the same
    * measured-size discipline as a broadcast hash join, applied to the
    * iterative loop. Rationale: each distributed round costs 2 actions
    * of fixed scheduling latency regardless of graph size, which
    * DOMINATES when the candidate graph is small (m12's image graph at
    * sf0.1: ~180 edges but ~4 s of round overhead); a ≤10⁶-edge graph
    * is ~16 MB — smaller than a default broadcast side. Union-by-min +
    * path compression makes every root the component MINIMUM, so the
    * labels are bit-identical to the loop's (five oracle rows — d11,
    * d13, d19, d21, m12 — plus a dedicated equivalence test pin this).
    * At 100 TB the gate reads the measured size, exactly like AQE: a
    * post-cap candidate graph that is actually big takes the
    * O(log diameter) loop unchanged. Fast path reports 0 rounds.
    */
  private[graft] def connectedComponentsWithRounds(
      s: SparkSession, pairsDf: DataFrame,
      driverMaxEdges: Long = 1000000L): (DataFrame, Int) = {
    import s.implicits._
    val sc = s.sparkContext
    // localCheckpoint pins its blocks in the block manager until the
    // driver GCs the RDD — which in a long session (the bench runs this
    // loop ~9 times: d11/d13/d19 × repeats) never happens promptly, so
    // superseded rounds accumulate as dead pinned blocks. Track the
    // persistent-RDD ids each checkpoint creates and free them
    // explicitly the moment they are superseded; only the FINAL label
    // table (which the returned plan references) stays pinned.
    // The RDD is read EXPLICITLY off the checkpointed plan's LogicalRDD
    // leaf (never a getPersistentRDDs diff, which would capture RDDs a
    // CONCURRENT component pins and unpersist them out from under it).
    def tracked(df: DataFrame): (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
      val out = df.localCheckpoint()
      (out, out.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      })
    }
    def free(rdds: Seq[org.apache.spark.rdd.RDD[_]]): Unit =
      rdds.foreach(_.unpersist(blocking = false))
    // Materialize the pair list ONCE before the symmetrizing
    // self-union — unioning the lazy frame with itself would run the
    // whole candidate pipeline twice.
    // Normalize to the leading (src-id, dst-id) pair FIRST: callers
    // legitimately hand over scored frames (d33 passes
    // (doc_a, doc_b, jaccard)), and the symmetrizing union below is
    // positional — a 3-vs-2-column union throws on the distributed
    // path even though the driver fast path reads positionally. The
    // projection also prunes the payload column out of the
    // checkpointed edge blocks.
    val (pairs, pairsRdds) = tracked(
      pairsDf.select(pairsDf.columns(0), pairsDf.columns(1))
        .toDF("doc_a", "doc_b"))
    // Deployments tune the gate without a code change; the parameter
    // default stays the documented ~16 MB edge bound.
    val maxEdges = s.conf.getOption("spark.graft.cc.driverMaxEdges")
      .map(_.toLong).getOrElse(driverMaxEdges)
    if (pairs.count() <= maxEdges) {
      val edgeArr = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
      free(pairsRdds)
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edgeArr.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val ra = find(a)
        val rb = find(b)
        // union by MIN: the root only ever decreases, so each final root
        // IS its component's minimum id — the loop's exact labeling.
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val labeled = parent.keysIterator.toSeq.sorted.map(n => (n, find(n)))
      // parallelize, not toDF-on-Seq: a Seq.toDF embeds the rows in the
      // plan as a LocalRelation that downstream consumers (d19-style
      // report joins) re-serialize per action; an RDD-backed frame
      // ships the rows to the block layer once.
      return (sc.parallelize(labeled, math.max(1, sc.defaultParallelism / 4))
        .toDF("doc_id", "cluster_id"), 0)
    }
    val (edges, edgesRdds) = tracked(
      pairs.union(pairs.select($"doc_b", $"doc_a")).toDF("src", "dst"))
    // Seed = min(node, min(neighbors)): the first neighbor step fused
    // into initialization (one aggregate instead of a full round).
    var (labels, labelsRdds) = tracked(
      edges.select($"dst".as("node"), $"src".as("lbl"))
        .union(edges.select($"src".as("node"), $"src".as("lbl")))
        .groupBy($"node").agg(min($"lbl").as("lbl")))
    // Labels only ever decrease, so the label-sum is a fixpoint
    // witness: one cheap aggregate per round instead of a
    // change-detection join.
    // coalesce: an empty edge set (legal for callers like m12 on a
    // corpus with no near-dups) sums to NULL, not 0.
    var lblSum = labels.agg(coalesce(sum($"lbl"), lit(0L))).head.getLong(0)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 64) {
      // (1) neighbor min
      val prop = edges.join(labels, edges("src") === labels("node"))
        .select($"dst".as("node"), $"lbl".as("nlbl"))
        .groupBy($"node").agg(min($"nlbl").as("nlbl"))
      val stepped = labels.join(prop, Seq("node"), "left")
        .select($"node", least($"lbl", coalesce($"nlbl", $"lbl")).as("lbl"))
      // (2) pointer jump: lbl := lbl(lbl) (labels are node ids, every
      // label has a row, so the inner join is total). A second jump per
      // round was measured and does NOT help — the extra self-join
      // costs what the saved round would have.
      val ptr = stepped.select($"node".as("p_node"), $"lbl".as("p_lbl"))
      val (next, nextRdds) = tracked(
        stepped.join(ptr, stepped("lbl") === ptr("p_node"))
          .select($"node", least($"lbl", $"p_lbl").as("lbl")))
      val nextSum = next.agg(coalesce(sum($"lbl"), lit(0L))).head.getLong(0)
      converged = nextSum == lblSum
      lblSum = nextSum
      free(labelsRdds) // superseded round — its blocks are dead now
      labels = next
      labelsRdds = nextRdds
      rounds += 1
    }
    // The candidate graph is never referenced past the loop.
    free(pairsRdds)
    free(edgesRdds)
    (labels.select($"node".as("doc_id"), $"lbl".as("cluster_id")), rounds)
  }

  /** Incremental dedup — the shape production actually runs: a NEW
    * batch (doc_id ≡ 0 mod 5, a deterministic 20% slice standing in for
    * today's crawl) is checked against the HISTORICAL corpus (the other
    * 80%, standing in for the persisted fingerprint/LSH index), never
    * against itself. Exact hits probe the md5 store; near hits probe
    * the banded MinHash index with the historical bucket-size cap
    * (at scale both sides of these joins are the new batch — tiny —
    * against index tables that are pre-bucketed and pre-capped on
    * disk, so the scan cost is the batch, not the corpus). Emits one
    * row per matched new doc with both flags and the earliest matching
    * historical doc.
    */
  def incrementalDedup(s: SparkSession, dir: String, cap: Int = 64): DataFrame = {
    import s.implicits._
    val docs = documents(s, dir)
    val isNew = $"doc_id" % 5 === 0
    val newHashes = docs.filter(isNew).select($"doc_id", md5($"text").as("h"))
    val histHashes = docs.filter(!isNew).select($"doc_id".as("hist_doc"), md5($"text").as("h"))
    val exact = newHashes.join(histHashes, "h")
      .groupBy($"doc_id").agg(min($"hist_doc").as("exact_match"))

    val bands = bandKeys(s, dir)
    val newBands = bands.filter($"doc_id" % 5 === 0)
    val histBands = bands.filter($"doc_id" % 5 =!= 0)
      .select($"band", $"bkey", $"doc_id".as("hist_doc"))
    val smallHist = histBands.groupBy($"band", $"bkey")
      .agg(count(lit(1)).as("n")).filter($"n" <= cap)
      .select($"band", $"bkey")
    val near = newBands
      .join(histBands.join(smallHist.hint("merge"), Seq("band", "bkey")), Seq("band", "bkey"))
      .groupBy($"doc_id").agg(min($"hist_doc").as("near_match"))

    exact.join(near, Seq("doc_id"), "full_outer")
      .select($"doc_id",
        $"exact_match".isNotNull.as("exact_dup"),
        $"near_match".isNotNull.as("near_dup"),
        least(coalesce($"exact_match", $"near_match"),
              coalesce($"near_match", $"exact_match")).as("best_match"))
      .orderBy($"doc_id")
  }

  /** d32 — INCREMENTAL cluster-label maintenance: the d14 slice
    * convention applied to the d11 LABELING itself. A dedup service
    * doesn't just flag arriving duplicates — it maintains the persisted
    * cluster-label sidecar as batches land, and recomputing CC over the
    * whole corpus per batch is exactly the cost incremental ingest
    * exists to avoid. The historical corpus (doc_id ≢ 0 mod 5) carries
    * its own capped-LSH labeling (the persisted label table); the
    * arriving batch probes the historical band index d14-style, and the
    * resulting (arrival, historical) edges are folded in by COMPONENT
    * CONTRACTION: every touched historical component collapses to its
    * label node, CC runs over the contracted graph only — sized by the
    * probe edges, NOT the corpus — and the merged labels fan back out
    * to members of touched components. Untouched components never
    * enter any join, shuffle, or relabel: maintenance work scales with
    * the batch (IncrementalClusterSpec proves their labels are already
    * the full-graph fixpoint).
    *
    * Correctness of the contraction: hist–hist connectivity inside a
    * component is exactly what the label node represents, and labels
    * are component MINIMA, so min-label over the contracted graph
    * equals min-label over the full union graph (arrival↔arrival
    * connectivity arises only through shared historical docs — true in
    * both forms by construction, since the batch never self-joins).
    * The oracle replays the full union graph with two recursive CTEs
    * and the hash match certifies the contraction.
    *
    * Output: one verdict row per AFFECTED doc — every matched arrival
    * (prev_cluster NULL) and every historical member of a touched
    * component (prev_cluster = its pre-batch label), with the merged
    * cluster_id and a changed flag. This IS the sidecar delta a
    * maintenance run writes back.
    */
  /** The two edge sets d32 maintains over — (hist–hist capped pairs,
    * batch→hist probe edges) — exposed so IncrementalClusterSpec can
    * recompute the FULL union-graph labeling from the identical edges
    * and prove the contraction exact.
    */
  private[graft] def incrementalClusterGraph(
      s: SparkSession, dir: String, cap: Int = 64): (DataFrame, DataFrame) = {
    import s.implicits._
    val bands = bandKeys(s, dir)
    val isNewBand = $"doc_id" % 5 === 0
    val newBands = bands.filter(isNewBand)
    val histBands = bands.filter(!isNewBand)
    val histCounts = histBands.groupBy($"band", $"bkey")
      .agg(count(lit(1)).as("n"))
    // The historical world's OWN pair graph (hist-only bucket caps —
    // the index as it stood before the batch arrived).
    val histSmall = histCounts.filter($"n" <= cap && $"n" > 1)
      .select($"band", $"bkey")
    val inSmall = histBands.join(histSmall, Seq("band", "bkey"))
    val ha = inSmall.toDF("band_a", "bkey_a", "doc_a")
    val hb = inSmall.toDF("band_b", "bkey_b", "doc_b")
    val histPairs = ha.join(hb,
        $"band_a" === $"band_b" && $"bkey_a" <=> $"bkey_b" && $"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b").distinct()
    // Probe edges: the d14 near-probe shape (batch bands vs capped
    // historical buckets), kept as the full edge list instead of
    // min-aggregated to one match per arrival.
    val probeSmall = histCounts.filter($"n" <= cap).select($"band", $"bkey")
    val probeEdges = newBands
      .join(histBands.select($"band", $"bkey", $"doc_id".as("hist_doc"))
        .join(probeSmall.hint("merge"), Seq("band", "bkey")), Seq("band", "bkey"))
      .select($"doc_id".as("new_doc"), $"hist_doc").distinct()
    (histPairs, probeEdges)
  }

  /** The historical labeling d32 maintains — a session sidecar, shared
    * with the streaming maintenance door.
    */
  private[graft] def histClusterLabels(s: SparkSession, dir: String,
                                       cap: Int = 64): DataFrame =
    CorpusIndexes.memo(s, dir, s"hist_labels_$cap") {
      connectedComponents(s, incrementalClusterGraph(s, dir, cap)._1)
    }

  /** The capped historical BAND index the maintenance probes — (band,
    * bkey, hist_doc) with the d14 bucket cap applied at build, so a
    * per-batch probe is one equi-join sized by the batch. Materialized:
    * the streaming door probes it every trigger.
    */
  private[graft] def clusterMaintenanceBands(s: SparkSession, dir: String,
                                             cap: Int = 64): DataFrame = {
    import s.implicits._
    CorpusIndexes.memo(s, dir, s"maint_bands_$cap") {
      val histBands = CorpusIndexes.minhashBands(s, dir)
        .filter($"doc_id" % 5 =!= 0)
      val probeSmall = histBands.groupBy($"band", $"bkey")
        .agg(count(lit(1)).as("n")).filter($"n" <= cap)
        .select($"band", $"bkey")
      histBands.select($"band", $"bkey", $"doc_id".as("hist_doc"))
        .join(probeSmall.hint("merge"), Seq("band", "bkey"))
    }
  }

  /** The d32 verdict rows from a MERGED contracted labeling (node →
    * merged label over arrival nodes and historical label nodes) —
    * shared by the batch op and the streaming maintenance door, so the
    * streamed state composes to the batch answer through the identical
    * frame transform. Node classification is by MEMBERSHIP in the
    * labeling (cluster ids + probed unlabeled singletons are label
    * nodes; the rest are arrivals) — see the inline note on why the
    * `% 5` shortcut breaks after a fold.
    */
  private[graft] def maintenanceVerdicts(merged: DataFrame,
                                         histLabels: DataFrame): DataFrame = {
    val s = merged.sparkSession
    import s.implicits._
    // Classify contracted nodes by MEMBERSHIP, not id arithmetic: a node
    // is a label node iff it IS a cluster id in the labeling, or it is an
    // unlabeled historical doc probed directly (edgeless singleton). The
    // obvious `% 5` shortcut is wrong in generation 2+: union-by-min can
    // fold an ARRIVAL id in as a cluster label (arrival 5 merges into
    // {6,7} → label 5), and a later merge through that label must relabel
    // the folded rows — misclassifying it as an arrival would split one
    // connected component across two labels.
    val labelByCid = merged.join(
      histLabels.select($"cluster_id".as("doc_id")).distinct(),
      Seq("doc_id"), "left_semi")
    val labelBySingleton = merged.filter($"doc_id" % 5 =!= 0)
      .join(histLabels.select($"doc_id").distinct(), Seq("doc_id"), "left_anti")
    val labelNodes = labelByCid.union(labelBySingleton).distinct()
    val relabel = labelNodes.toDF("hist_lbl", "new_lbl")
    val histRows = histLabels.toDF("m_doc", "m_lbl")
      .join(relabel, $"m_lbl" === $"hist_lbl")
      .select($"m_doc".as("doc_id"), $"m_lbl".as("prev_cluster"),
        $"new_lbl".as("cluster_id"))
      .union(
        // Probed edgeless singletons: their pre-batch "cluster" is
        // themselves and they appear in the contracted graph directly.
        relabel.join(histLabels.select($"doc_id"),
            relabel("hist_lbl") === histLabels("doc_id"), "left_anti")
          .select($"hist_lbl".as("doc_id"), $"hist_lbl".as("prev_cluster"),
            $"new_lbl".as("cluster_id")))
    val newRows = merged
      .join(labelNodes.select($"doc_id"), Seq("doc_id"), "left_anti")
      .select($"doc_id", lit(null).cast("long").as("prev_cluster"),
        $"cluster_id")
    histRows.union(newRows)
      .withColumn("changed",
        $"prev_cluster".isNull || $"prev_cluster" =!= $"cluster_id")
  }

  /** FOLD a maintained contracted labeling into the label table itself
    * — the durable-sidecar half of the streaming maintenance door's
    * lifecycle (every other index family's refresh discipline): the
    * folded table carries one (doc_id, cluster_id) row for every doc
    * the labeling knows — historical rows relabeled where a merge
    * touched their component, plus the probed singletons and arrival
    * docs the verdicts introduce. Docs absent from both inputs stay
    * absent (absence = own singleton cluster, the label-table
    * convention throughout the d11/d32 family).
    *
    * Composition: union-by-min labels depend only on the UNION of
    * edges, so folding generation n's contracted labels and then
    * contracting generation n+1 against the FOLDED table equals one
    * CC over all edges — the same edge-order-freedom argument as the
    * streaming door's batch-equivalence, applied across folds.
    *
    * Scale shape: one left join of the label sidecar against the
    * batch-sized verdict rows plus an anti-join for the new rows —
    * the corpus-sized side shuffles once on doc_id, which is the
    * folded table's own bucket column, so at scale both sides read
    * co-located.
    */
  private[graft] def foldMaintenanceLabels(merged: DataFrame,
                                           histLabels: DataFrame): DataFrame = {
    val s = merged.sparkSession
    import s.implicits._
    val verdicts = maintenanceVerdicts(merged, histLabels)
      .select($"doc_id", $"cluster_id")
    val overrides = verdicts.toDF("v_doc", "v_lbl")
    histLabels.join(overrides, $"doc_id" === $"v_doc", "left")
      .select($"doc_id", coalesce($"v_lbl", $"cluster_id").as("cluster_id"))
      .union(verdicts.join(histLabels.select($"doc_id"), Seq("doc_id"), "left_anti"))
  }

  private def maintLabelParts(root: String) =
    (s"$root/maint_labels", CorpusIndexes.tableName(root, "maint_labels"),
      CorpusIndexes.layouts("maint_labels"))

  /** Write a folded label table as the door's durable sidecar under
    * `root/maint_labels` (bucketed on doc_id). Callers that fold INTO
    * an existing root must materialize the folded frame first — the
    * overwrite would otherwise read its own target.
    */
  private[graft] def persistMaintLabels(labels: DataFrame, root: String): Unit = {
    val (p, t, l) = maintLabelParts(root)
    CorpusIndexes.writeBucketedTable(labels, p, t, l)
  }

  private[graft] def hasMaintLabels(s: SparkSession, root: String): Boolean =
    CorpusIndexes.sidecarPathExists(s, s"$root/maint_labels")

  private[graft] def loadMaintLabels(s: SparkSession, root: String): DataFrame = {
    val (p, t, l) = maintLabelParts(root)
    CorpusIndexes.readBucketedTable(s, p, t, l)
  }

  def incrementalClusters(s: SparkSession, dir: String, cap: Int = 64): DataFrame = {
    import s.implicits._
    val (_, probeEdges) = incrementalClusterGraph(s, dir, cap)
    val histLabels = histClusterLabels(s, dir, cap)
    // Contract: each probed historical doc stands in for its component
    // label (itself, if it was an edgeless singleton).
    val attach = probeEdges
      .join(histLabels.toDF("hist_doc", "hist_lbl"), Seq("hist_doc"), "left")
      .select($"new_doc".as("doc_a"),
        coalesce($"hist_lbl", $"hist_doc").as("doc_b"))
      .distinct()
    // CC over the contracted graph — probe-edge-sized, so the measured
    // driver fast path in connectedComponentsWithRounds applies at any
    // corpus scale where the BATCH is small (the incremental premise).
    val merged = connectedComponents(s, attach)
    maintenanceVerdicts(merged, histLabels).orderBy($"doc_id")
  }

  /** Multi-signal incremental dedup — [[incrementalDedup]] composing ALL
    * THREE signals at ingest the way [[dupClustersMulti]] composes them
    * for clustering: the new batch (doc_id ≡ 0 mod 5) probes (1) the
    * exact md5 store, (2) the capped banded-MinHash index, and (3) the
    * banded-SimHash index (hamming ≤ 8 verified on candidates, wide
    * 15-bit bands carrying the skew bound exactly as in d09). Each
    * probe is new-batch-vs-index only — the batch never self-joins, and
    * at scale each index is pre-bucketed on disk so the scan cost is
    * the batch, not the corpus. Emits one row per matched new doc with
    * a flag per signal and the earliest matching historical doc across
    * all signals (the least-of-coalesces form is null-skipping min,
    * identical in both engines).
    */
  def incrementalDedupMulti(s: SparkSession, dir: String, cap: Int = 64): DataFrame = {
    import s.implicits._
    val docs = documents(s, dir).select($"doc_id", $"text")
    multiSignalProbeIndexed(docs.filter($"doc_id" % 5 === 0),
                            textProbeSidecar(s, dir, cap))
      .orderBy($"doc_id")
  }

  /** The three historical probe indexes — md5 store, df-capped MinHash
    * bands, banded SimHash — derived from a (doc_id, text) corpus
    * slice. At 100 TB these ARE the persisted index tables a dedup
    * service keeps next to the corpus snapshot; the streaming jobs
    * build them ONCE per run (checkpointed) so per-batch probe cost
    * scales with the batch — re-deriving them per micro-batch would
    * re-hash the whole history every trigger.
    */
  final case class TextProbeIndex(md5s: DataFrame, cappedBands: DataFrame,
                                  simBands: DataFrame)

  /** The per-doc RAW probe rows — md5 store, UNCAPPED MinHash bands,
    * SimHash bands — for a (doc_id, text) slice. Shared by the
    * in-session index build and the durable writer/refresher: every
    * row here depends only on its own document, which is what makes
    * the durable index APPEND-ONLY under refresh.
    */
  private def rawProbeParts(docs: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val s = docs.sparkSession
    import s.implicits._
    val md5s = docs.select($"doc_id".as("hist_doc"), md5($"text").as("h"))
    val rawBands = docs
      .select($"doc_id", posexplode(minhash_bands($"text")))
      .select($"pos".as("band"), $"col".as("bkey"), $"doc_id".as("hist_doc"))
    val simBands = docs
      .select($"doc_id", simhash60($"text").as("simhash"))
      .select($"doc_id", $"simhash", posexplode(expr(
        "transform(sequence(0, 3), j -> (simhash >> (15 * j)) & 32767)")))
      .select($"doc_id".as("hist_doc"), $"simhash".as("sim_b"),
        $"pos".as("band"), $"col".as("bval"))
    (md5s, rawBands, simBands)
  }

  /** The df-cap applied to a raw band table — kept OUT of the stored
    * rows so the durable form stays append-only: the filter re-derives
    * from whatever rows exist at read time, which is exactly what
    * makes an incremental refresh equal a from-scratch rebuild (a key
    * that crosses the cap only after a delta arrives is dropped by
    * both, structurally).
    */
  private def capBands(rawBands: DataFrame, cap: Int): DataFrame = {
    val s = rawBands.sparkSession
    import s.implicits._
    val small = rawBands.groupBy($"band", $"bkey")
      .agg(count(lit(1)).as("n")).filter($"n" <= cap)
      .select($"band", $"bkey")
    rawBands.join(small.hint("merge"), Seq("band", "bkey"))
  }

  def buildTextProbeIndex(histDocs: DataFrame, cap: Int = 64,
                          materialize: Boolean = false): TextProbeIndex = {
    val (md5s, rawBands, simBands) = rawProbeParts(histDocs)
    val cappedBands = capBands(rawBands, cap)
    if (materialize)
      TextProbeIndex(md5s.localCheckpoint(), cappedBands.localCheckpoint(),
        simBands.localCheckpoint())
    else TextProbeIndex(md5s, cappedBands, simBands)
  }

  /** The probe index for the registered slice convention (history =
    * doc_id % 5 ≠ 0) as SESSION sidecars — d15, d25 and d26 all probe
    * the SAME three tables, so the history hashes once per (session,
    * dir) instead of once per consuming query (the CorpusIndexes
    * discipline; round-13 bench attribution showed every admission
    * query paying the full history hash).
    */
  private[graft] def textProbeSidecar(s: SparkSession, dir: String,
                                      cap: Int = 64): TextProbeIndex = {
    import s.implicits._
    lazy val idx = buildTextProbeIndex(
      documents(s, dir).select($"doc_id", $"text").filter($"doc_id" % 5 =!= 0), cap)
    TextProbeIndex(
      CorpusIndexes.memo(s, dir, "probe_md5s")(idx.md5s),
      CorpusIndexes.memo(s, dir, s"probe_bands_$cap")(idx.cappedBands),
      CorpusIndexes.memo(s, dir, "probe_sim")(idx.simBands))
  }

  private val probeLayouts = Seq(
    ("probe_md5s", CorpusIndexes.Layout(8, "h", Seq("h"))),
    ("probe_raw_bands", CorpusIndexes.Layout(8, "bkey", Seq("bkey"))),
    ("probe_sim_bands", CorpusIndexes.Layout(8, "bval", Seq("bval"))))

  /** DURABLE form of [[buildTextProbeIndex]]: write the three probe
    * tables under `outDir`, each bucketed on the column the per-batch
    * probe joins (md5 on `h`, MinHash bands on `bkey`, SimHash bands
    * on `bval`) — the snapshot artifact a dedup service builds once
    * and every streaming run reads. The band table stores the RAW
    * (uncapped) rows: every stored row depends only on its own
    * document, so a later crawl day appends ([[refreshTextProbeIndex]])
    * instead of rebuilding; the global df cap re-derives at load.
    * With the index side pre-bucketed, a probing batch shuffles only
    * ITSELF to the bucket layout; the history never moves again.
    */
  def persistTextProbeIndex(histDocs: DataFrame, outDir: String,
                            cap: Int = 64): Unit =
    writeProbeParts(histDocs, outDir, append = false)

  /** INCREMENTAL refresh: append a new slice's probe rows to the
    * durable index — the crawl-day ingestion path. Pure appends (the
    * rows are per-doc), so no text outside the delta is ever
    * re-hashed; the df cap is not stored but re-derived at load over
    * the merged rows, which makes the refreshed index equal a
    * from-scratch rebuild on the union STRUCTURALLY — including a
    * band key that crosses the cap only once the delta lands
    * (both forms drop it; asserted with a crossing witness in
    * SidecarDiskSpec). A tombstoned doc_id is REJECTED until the log
    * folds (the IVF re-add contract: the serving mask would strand
    * the re-added rows forever).
    */
  def refreshTextProbeIndex(newDocs: DataFrame, outDir: String): Unit = {
    probeTomb(outDir).guardArrivals(
      newDocs.select(col("doc_id").as("hist_doc")), "refreshTextProbeIndex")
    writeProbeParts(newDocs, outDir, append = true)
  }

  // ---- delete/takedown for the durable text probe index ------------
  //
  // The IVF delete contract (Similarity.deleteFromIvfIndex) on the
  // text modality: at 100 TB takedown (GDPR/DMCA) is a routine
  // operation and an append-only dedup index otherwise lets a DELETED
  // document keep vetoing arrivals as a phantom near-dup forever. The
  // log is a doc-keyed tombstone table next to the three probe tables;
  // serving masks (applied to the RAW band rows BEFORE the df cap
  // re-derives, so masked serving == a rebuild without the deleted
  // docs, including a band the deletions pull back under the cap);
  // compaction folds the log into the files and clears it; a
  // tombstoned id cannot re-enter through refresh until the fold.

  // hist_doc-keyed delete log over the ONE shared lifecycle
  // (CorpusIndexes.TombLog — masked serving, re-add guard,
  // fold-clears-exactly-the-folded-rows).
  private def probeTomb(outDir: String) =
    CorpusIndexes.TombLog(outDir, "probe_tombstones", "hist_doc")

  /** Append `ids` (doc_id) to the probe root's delete log. */
  def deleteFromTextProbeIndex(ids: DataFrame, outDir: String): Unit =
    probeTomb(outDir).append(ids.select(col("doc_id").as("hist_doc")))

  /** The probe root's delete log, if any unfolded delete exists. */
  def loadTextProbeTombstones(s: SparkSession, outDir: String): Option[DataFrame] =
    probeTomb(outDir).load(s)

  private def writeProbeParts(docs: DataFrame, outDir: String,
                              append: Boolean): Unit = {
    val (md5s, rawBands, simBands) = rawProbeParts(docs)
    probeLayouts.zip(Seq(md5s, rawBands, simBands)).foreach {
      case ((key, lay), df) =>
        CorpusIndexes.writeBucketedTable(df, s"$outDir/$key",
          CorpusIndexes.tableName(outDir, key), lay, append = append)
    }
  }

  /** d28 — the admission cascade COMPLETED with the compliance gate:
    * the d26 stages (quality → exact → MinHash → SimHash →
    * decontamination) and then, for the surviving docs ONLY, the t33
    * PII scan — a doc with detectable emails or phone numbers is
    * rejected at stage 'pii'; IPv4 hits are carried as a count but do
    * not reject (redaction, not rejection, is the IP remedy — the
    * counts feed the redact step that runs on admit). The scan runs on
    * the planted-PII fixture text (the t33 discipline — the raw corpus
    * is digit-free), and `probed_pii` records the cascade honesty:
    * only docs that cleared every cheaper gate paid for the regex
    * pass.
    *
    * Scale shape: the PII stage is a pure codegen projection over the
    * survivor slice — by far the cheapest probe in the cascade, placed
    * last only because its verdict (unlike dedup's) cannot be
    * pre-indexed; nothing new shuffles.
    */
  def piiAdmission(s: SparkSession, dir: String, cap: Int = 64): DataFrame = {
    import s.implicits._
    assemblePiiVerdict(stagedAdmission(s, dir, cap),
        survivors => TextOps.piiScan(
          TextOps.piiFixture(s, dir).join(survivors, "doc_id"), "text"))
      .orderBy($"doc_id")
  }

  /** The frame-level d28 core — the staged cascade plus the PII gate
    * over ONE (doc_id, text) frame, against a prebuilt index: the form
    * the streaming door runs per micro-batch (every verdict depends
    * only on its own doc vs the static sidecars, so per-batch runs
    * compose to this batch form bit for bit). Unsorted.
    */
  def piiAdmissionProbeIndexed(newDocs: DataFrame, idx: TextProbeIndex,
                               benchGrams: DataFrame): DataFrame = {
    val s = newDocs.sparkSession
    import s.implicits._
    assemblePiiVerdict(stagedAdmissionProbeIndexed(newDocs, idx, benchGrams),
      survivors => TextOps.piiScan(newDocs.join(survivors, "doc_id"), "text"))
  }

  /** Shared d28 verdict assembly: run `scanSurvivors` on the staged
    * cascade's admits only (cascade honesty — the regex pass is paid
    * by documents that cleared every cheaper gate), then extend the
    * verdict with the 'pii' stage.
    */
  private def assemblePiiVerdict(staged: DataFrame,
      scanSurvivors: DataFrame => DataFrame): DataFrame = {
    val s = staged.sparkSession
    import s.implicits._
    val pii = scanSurvivors(staged.filter($"admit").select($"doc_id"))
      .select($"doc_id", $"n_emails", $"n_phones", $"n_ipv4")
    staged.join(pii, Seq("doc_id"), "left")
      .withColumn("probed_pii", $"n_emails".isNotNull)
      .select($"doc_id",
        coalesce($"reject_stage",
          when($"n_emails" + $"n_phones" > 0, "pii")).as("reject_stage"),
        $"n_emails", $"n_phones", $"n_ipv4", $"probed_pii",
        ($"probed_pii" && ($"n_emails" + $"n_phones" === 0)).as("admit"))
  }

  /** d30 — dedup savings BY SOURCE, in tokens: the d27 decision table
    * rolled up into the currency the mixture planner (t27) budgets in.
    * Per source: total docs, docs dropped as non-canonical cluster
    * members, tokens dropped with them, tokens remaining. d19 reports
    * savings per CLUSTER in characters; a campaign negotiates with its
    * feeds per SOURCE in tokens — a source whose tokens_dropped share
    * is high is a feed being paid for twice.
    *
    * Scale shape: the drop set is label-sidecar-sized (broadcast); one
    * narrow corpus scan with a left join against it, |sources| rows
    * out.
    */
  def dedupSavingsBySource(s: SparkSession, dir: String,
                           cap: Int = 64): DataFrame = {
    import s.implicits._
    val dropped = canonicalSelection(s, dir, cap)
      .filter(!$"kept").select($"doc_id").withColumn("is_dropped", lit(true))
    // No broadcast hint: the dropped set scales with the corpus's
    // duplicate fraction (often most of raw web data at 100 TB) — the
    // doc_id equi-join must stay a shuffle join, with AQE free to
    // broadcast when a given run's drop set happens to be small.
    documents(s, dir)
      .select($"source", $"doc_id",
        size(split($"text", "\\s+")).cast("long").as("n_tokens"))
      .join(dropped, Seq("doc_id"), "left")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"is_dropped", 1L).otherwise(0L)).as("n_dropped"),
        sum(when($"is_dropped", $"n_tokens").otherwise(0L)).as("tokens_dropped"),
        sum(when($"is_dropped", 0L).otherwise($"n_tokens")).as("tokens_kept"))
      .orderBy($"source")
  }

  /** SHIP the deduplicated corpus: apply the d27 decision table and
    * write the surviving documents as source-partitioned parquet under
    * `outDir` — the artifact a training run actually reads. Documents
    * never implicated in a near-dup cluster pass through; implicated
    * documents survive only as their cluster's quality-argmax
    * canonical. Partitioning by `source` makes the downstream mixing
    * reads (t27's per-source budgets, t18's stratified sampling)
    * partition-pruned scans instead of full passes.
    *
    * Scale shape: one anti-join of the corpus against the d27 drop set
    * (label-sidecar-sized, broadcastable), then a partitioned write —
    * nothing shuffles but the drop list.
    */
  def writeCuratedCorpus(s: SparkSession, dir: String, outDir: String,
                         cap: Int = 64): Unit = {
    import s.implicits._
    val dropped = canonicalSelection(s, dir, cap)
      .filter(!$"kept").select($"doc_id")
    documents(s, dir)
      .join(dropped, Seq("doc_id"), "left_anti")
      .write.mode("overwrite").partitionBy("source").parquet(outDir)
  }

  /** d31 — the SHIPPED curated corpus read back under the oracle:
    * [[writeCuratedCorpus]] runs (once per session), then the query
    * reads the written parquet artifact — not the source tables — and
    * reports per source the surviving doc count and token sum. The
    * oracle recomputes the same numbers from the d27 decision CTE over
    * the original `documents` table, so a hash match certifies the
    * WRITE PATH end to end: exactly the d27 survivors landed, with
    * their text bytes intact, under the right source partitions
    * (tokens are recounted from the artifact's text column, not
    * carried through).
    *
    * Scale shape: the write is d27's broadcast anti-join + partitioned
    * write; the read-back is a partition-pruned scan and one
    * source-keyed aggregate — |sources| rows out.
    */
  def curatedReadback(s: SparkSession, dir: String, cap: Int = 64): DataFrame = {
    import s.implicits._
    val out = curatedOutDir(dir, cap)
    // one write per (session, dir, cap): the memoized one-row frame's
    // eager checkpoint runs the write exactly once; repeats (bench)
    // reuse the artifact. cap is part of BOTH the memo key and the
    // artifact path (the histClusterLabels convention) — a second cap
    // in the same session must not silently read the first cap's
    // artifact.
    CorpusIndexes.memo(s, dir, s"curated_write_$cap") {
      writeCuratedCorpus(s, dir, out, cap)
      s.range(1).toDF("done")
    }
    s.read.parquet(out)
      .select($"source", size(split($"text", "\\s+")).cast("long").as("n_tokens"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("tokens_kept"))
      .orderBy($"source")
  }

  /** Deterministic per-(corpus, cap) artifact path for
    * [[curatedReadback]] — session-independent so verify and bench
    * reuse the location; keyed by the data dir AND the cap so neither
    * scale factors nor cap settings collide.
    */
  private def curatedOutDir(dir: String, cap: Int): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    s"${sys.props("java.io.tmpdir")}/graft_curated_${h}_$cap"
  }

  /** COMPACT the durable probe index: rewrite each of the three probe
    * tables to one file per bucket. Every [[refreshTextProbeIndex]]
    * append adds a file per bucket per day; after a quarter of daily
    * crawls each probe join opens ~90 files per bucket, and the
    * per-file footer reads dwarf the row reads for 20-byte band rows.
    * Compaction restores the one-file-per-bucket layout without
    * changing a row — probe verdicts before and after are
    * bit-identical (asserted in SidecarDiskSpec), so a campaign runs
    * it on any cadence — in a maintenance window: the rename-aside
    * swap (CorpusIndexes.compactBucketedTable) leaves no instant with
    * the live path missing, but the old generation is deleted right
    * after the swap, so only already-open read handles survive it;
    * rotate roots where reader-concurrent compaction is needed.
    */
  def compactTextProbeIndex(s: SparkSession, outDir: String): Unit =
    probeTomb(outDir).foldInto(s, probeLayouts.map { case (key, lay) =>
      (s"$outDir/$key", CorpusIndexes.tableName(outDir, key), lay)
    })

  /** Read the probe index persisted by [[persistTextProbeIndex]] (and
    * any [[refreshTextProbeIndex]] appends) AS SERVED — what
    * StreamingDedup/StreamingAdmission pass per micro-batch when given
    * an index dir: no corpus pass at job start, the history reads
    * straight from the bucketed disk tables. The df cap applies here,
    * over whatever rows the tables hold; the cap's groupBy AND its
    * join back both run co-located on the bkey bucketing — one
    * zero-shuffle pass over 20-byte band rows per run, never a text
    * re-hash. When a delete log exists, every table masks against it
    * BEFORE the cap re-derives, so the served index equals a rebuild
    * without the deleted docs — a taken-down document stops vetoing
    * arrivals as a phantom near-dup, and a band its deletions pull
    * back under the cap re-enters exactly as a rebuild would admit it.
    */
  def loadTextProbeIndex(s: SparkSession, outDir: String,
                         cap: Int = 64): TextProbeIndex = {
    // ONE log snapshot masks all three tables: three independent loads
    // could resolve different log generations when a delete lands
    // mid-load (supported — the takedown door test appends while the
    // query runs), serving an index state no rebuild could produce
    // (band rows masked, md5 row still vetoing). One load also costs
    // one existence probe and one catalog resolution per trigger
    // instead of three.
    val ts = probeTomb(outDir).load(s)
    def mask(df: DataFrame): DataFrame =
      ts.map(t => df.join(t, Seq("hist_doc"), "left_anti")).getOrElse(df)
    val Seq(md5s, raw, sim) = probeLayouts.map { case (key, lay) =>
      mask(CorpusIndexes.readBucketedTable(s, s"$outDir/$key",
        CorpusIndexes.tableName(outDir, key), lay))
    }
    TextProbeIndex(md5s, capBands(raw, cap), sim)
  }

  /** The frame-based core of [[incrementalDedupMulti]], shared with the
    * streaming ingest shape (each foreachBatch micro-batch probes a
    * static historical index with exactly this plan — every output row
    * depends only on its own doc vs the index, so per-batch probes
    * compose to the batch result; asserted in StreamingExtrasSpec).
    * Both inputs are (doc_id, text); output is unsorted.
    */
  def multiSignalProbe(newDocs: DataFrame, histDocs: DataFrame,
                       cap: Int = 64): DataFrame =
    multiSignalProbeIndexed(newDocs, buildTextProbeIndex(histDocs, cap))

  /** [[multiSignalProbe]] against PREBUILT historical indexes — the
    * form the streaming jobs run per micro-batch (only the batch side
    * hashes text; the history reads as sidecar tables).
    */
  def multiSignalProbeIndexed(newDocs: DataFrame,
                              idx: TextProbeIndex): DataFrame = {
    val s = newDocs.sparkSession
    import s.implicits._
    val newHashes = newDocs.select($"doc_id", md5($"text").as("h"))
    val exact = newHashes.join(idx.md5s, "h")
      .groupBy($"doc_id").agg(min($"hist_doc").as("exact_match"))

    val newBands = newDocs
      .select($"doc_id", posexplode(minhash_bands($"text")))
      .select($"pos".as("band"), $"col".as("bkey"), $"doc_id")
    val near = newBands
      .join(idx.cappedBands, Seq("band", "bkey"))
      .groupBy($"doc_id").agg(min($"hist_doc").as("near_match"))

    val newSim = newDocs
      .select($"doc_id", simhash60($"text").as("simhash"))
      .select($"doc_id", $"simhash", posexplode(expr(
        "transform(sequence(0, 3), j -> (simhash >> (15 * j)) & 32767)")))
      .select($"doc_id", $"simhash".as("sim_a"), $"pos".as("band"), $"col".as("bval"))
    val sim = newSim.join(idx.simBands, Seq("band", "bval"))
      .filter(expr("cast(bit_count(sim_a ^ sim_b) as bigint)") <= 8)
      .groupBy($"doc_id").agg(min($"hist_doc").as("sim_match"))

    exact.join(near, Seq("doc_id"), "full_outer")
      .join(sim, Seq("doc_id"), "full_outer")
      .select($"doc_id",
        $"exact_match".isNotNull.as("exact_dup"),
        $"near_match".isNotNull.as("near_dup"),
        $"sim_match".isNotNull.as("sim_dup"),
        least(coalesce($"exact_match", $"near_match", $"sim_match"),
              coalesce($"near_match", $"sim_match", $"exact_match"),
              coalesce($"sim_match", $"exact_match", $"near_match")).as("best_match"))
  }

  /** d25 — INGEST ADMISSION: the t32 curation gates applied at the
    * boundary where production actually applies them — per ARRIVING
    * document, against static sidecars, before anything enters the
    * corpus. The new batch (doc_id ≡ 0 mod 5, the d14 slice
    * convention) is scored on every gate at once:
    *
    *  - `exact_dup` / `near_dup` / `sim_dup`: the three
    *    [[multiSignalProbe]] signals against the historical index
    *    (md5 store, capped MinHash-LSH bands, banded SimHash);
    *  - `low_quality`: the t02 score under 0.8, computed from the doc
    *    alone;
    *  - `contaminated`: shares a 4-token run with the benchmark slice
    *    (doc_id ≡ 0 mod 97 — the t16 eval set), a broadcast membership
    *    probe;
    *  - `admit`: no gate fired.
    *
    * One row per arriving doc (not just matches — rejects carry their
    * reason), with the earliest matching historical doc where a dedup
    * signal fired. The per-batch streaming form
    * (`graft.streaming.StreamingAdmission`) runs the identical frame
    * core per micro-batch; every output row depends only on its own
    * doc vs the static sidecars, so per-batch probes compose to this
    * batch query bit for bit.
    *
    * Scale shape: probes are batch-vs-index equi-joins (the batch is
    * the small side; at scale each index is the pre-bucketed persisted
    * sidecar), quality is a narrow map, and the benchmark gram set is
    * tiny by nature (broadcast). Admission cost scales with the batch,
    * never the corpus.
    */
  def ingestAdmission(s: SparkSession, dir: String, cap: Int = 64): DataFrame = {
    import s.implicits._
    val docs = documents(s, dir).select($"doc_id", $"text")
    admissionProbeIndexed(docs.filter($"doc_id" % 5 === 0),
        textProbeSidecar(s, dir, cap), CorpusIndexes.benchGrams(s, dir))
      .orderBy($"doc_id")
  }

  /** The frame-based core of [[ingestAdmission]], shared with the
    * streaming job: `newDocs`/`histDocs` bear (doc_id, text),
    * `benchGrams` is the broadcast eval-gram set (g). Unsorted.
    */
  def admissionProbe(newDocs: DataFrame, histDocs: DataFrame,
                     benchGrams: DataFrame, cap: Int = 64): DataFrame =
    admissionVerdict(newDocs, multiSignalProbe(newDocs, histDocs, cap), benchGrams)

  /** [[admissionProbe]] against a PREBUILT historical index — the form
    * the streaming job runs per micro-batch.
    */
  def admissionProbeIndexed(newDocs: DataFrame, idx: TextProbeIndex,
                            benchGrams: DataFrame): DataFrame =
    admissionVerdict(newDocs, multiSignalProbeIndexed(newDocs, idx), benchGrams)

  /** The t02-class quality score the admission gates share. */
  private def qualityCol: org.apache.spark.sql.Column = {
    val t = org.apache.spark.sql.functions.split(col("text"), "\\s+")
    val nTok = size(t).cast("double")
    lit(0.4) * (lit(1.0) - size(filter(t,
      c => c.isin(graft.ops.TextOps.Stopwords: _*))).cast("double") / nTok) +
    lit(0.3) * (size(array_distinct(t)).cast("double") / nTok) +
    lit(0.3) * least(nTok / lit(50.0), lit(1.0))
  }

  /** Quality + decontamination gates composed onto the dedup probe
    * rows — one verdict row per doc in `newDocs`.
    */
  private def admissionVerdict(newDocs: DataFrame, probes: DataFrame,
                               benchGrams: DataFrame): DataFrame = {
    val s = newDocs.sparkSession
    import s.implicits._
    val quality = qualityCol
    val dirty = newDocs
      .select($"doc_id", explode(graft.functions.TextHashes.ngram_hashes($"text", 4)).as("g"))
      .join(broadcast(benchGrams), "g")
      .select($"doc_id").distinct()
      .withColumn("is_dirty", lit(true))
    newDocs.select($"doc_id", quality.as("quality"))
      .join(probes, Seq("doc_id"), "left")
      .join(dirty, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"exact_dup", lit(false)).as("exact_dup"),
        coalesce($"near_dup", lit(false)).as("near_dup"),
        coalesce($"sim_dup", lit(false)).as("sim_dup"),
        ($"quality" < 0.8).as("low_quality"),
        $"is_dirty".isNotNull.as("contaminated"),
        $"best_match")
      .withColumn("admit",
        !$"exact_dup" && !$"near_dup" && !$"sim_dup" &&
          !$"low_quality" && !$"contaminated")
  }

  /** d26 — STAGED admission: [[ingestAdmission]]'s gates applied as a
    * short-circuit cascade, cheapest first — quality (a narrow
    * expression, no join), then exact md5, then capped MinHash-LSH,
    * then banded SimHash, then gram decontamination (the widest
    * per-doc expansion) — each stage probing ONLY the previous stage's
    * survivors. The verdict is provably d25's: every signal is
    * per-doc independent of the probed set, so skipping a later probe
    * for an already-rejected doc can never flip `admit` (the oracle
    * derives the staged columns from the full signal set by precedence
    * — a hash match IS the semantics proof; AdmissionSpec additionally
    * asserts verdict equality and the measured probe-count reduction).
    *
    * This is the production door at 100 TB: a re-crawl's arrivals are
    * mostly exact dups, so the expensive hashing (12 MinHash passes,
    * the 60-bit SimHash, the 4-gram explode) runs on the small
    * surviving fraction instead of every arrival. Emitted per doc:
    * the first firing gate (`reject_stage`, null = admitted), the
    * firing stage's earliest historical match, and the three
    * probed_* flags whose counts ARE the measured reduction.
    *
    * Scale shape: the cascade chains batch-sized anti-joins (each
    * against a match-id list no larger than the batch); every probe
    * join is batch-vs-bucketed-index; the doc scan per stage is
    * narrow. Nothing here touches the corpus beyond the shared
    * sidecars.
    */
  def stagedAdmission(s: SparkSession, dir: String, cap: Int = 64): DataFrame = {
    import s.implicits._
    val docs = documents(s, dir).select($"doc_id", $"text")
    stagedAdmissionProbeIndexed(docs.filter($"doc_id" % 5 === 0),
        textProbeSidecar(s, dir, cap), CorpusIndexes.benchGrams(s, dir))
      .orderBy($"doc_id")
  }

  /** The staged cascade against a PREBUILT index — the form a
    * streaming door runs per micro-batch (AdmissionSpec proves verdict
    * equality with [[admissionProbeIndexed]] on the same index).
    */
  def stagedAdmissionProbeIndexed(newDocs: DataFrame, idx: TextProbeIndex,
                                  benchGrams: DataFrame): DataFrame = {
    val s = newDocs.sparkSession
    import s.implicits._
    // Each survivor set is MATERIALIZED: every stage's plan would
    // otherwise re-run all earlier stages' hashing per branch (the
    // final assembly references all four), and the cascade exists
    // precisely so later stages touch fewer docs. The checkpoints are
    // batch-sized — at the door, the batch is small by definition.
    val base = newDocs.select($"doc_id", $"text", qualityCol.as("quality"))
      .localCheckpoint()
    val sv1 = base.filter($"quality" >= 0.8).select($"doc_id", $"text")
    val exact = sv1.select($"doc_id", md5($"text").as("h"))
      .join(idx.md5s, "h")
      .groupBy($"doc_id").agg(min($"hist_doc").as("m_exact"))
      .localCheckpoint()
    val sv2 = sv1.join(exact.select($"doc_id"), Seq("doc_id"), "left_anti")
    val near = sv2
      .select($"doc_id", posexplode(minhash_bands($"text")))
      .select($"pos".as("band"), $"col".as("bkey"), $"doc_id")
      .join(idx.cappedBands, Seq("band", "bkey"))
      .groupBy($"doc_id").agg(min($"hist_doc").as("m_near"))
      .localCheckpoint()
    val sv3 = sv2.join(near.select($"doc_id"), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val sim = sv3
      .select($"doc_id", simhash60($"text").as("simhash"))
      .select($"doc_id", $"simhash", posexplode(expr(
        "transform(sequence(0, 3), j -> (simhash >> (15 * j)) & 32767)")))
      .select($"doc_id", $"simhash".as("sim_a"), $"pos".as("band"), $"col".as("bval"))
      .join(idx.simBands, Seq("band", "bval"))
      .filter(expr("cast(bit_count(sim_a ^ sim_b) as bigint)") <= 8)
      .groupBy($"doc_id").agg(min($"hist_doc").as("m_sim"))
      .localCheckpoint()
    val sv4 = sv3.join(sim.select($"doc_id"), Seq("doc_id"), "left_anti")
    val dirty = sv4
      .select($"doc_id", explode(graft.functions.TextHashes.ngram_hashes($"text", 4)).as("g"))
      .join(broadcast(benchGrams), "g")
      .select($"doc_id").distinct()
      .withColumn("is_dirty", lit(true))
    base.select($"doc_id", $"quality")
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .join(sim, Seq("doc_id"), "left")
      .join(dirty, Seq("doc_id"), "left")
      .withColumn("reject_stage",
        when($"quality" < 0.8, "quality")
          .when($"m_exact".isNotNull, "exact")
          .when($"m_near".isNotNull, "near")
          .when($"m_sim".isNotNull, "sim")
          .when($"is_dirty".isNotNull, "contaminated"))
      .withColumn("probed_near", $"quality" >= 0.8 && $"m_exact".isNull)
      .withColumn("probed_sim", $"probed_near" && $"m_near".isNull)
      .withColumn("probed_decontam", $"probed_sim" && $"m_sim".isNull)
      .withColumn("best_match", coalesce($"m_exact", $"m_near", $"m_sim"))
      .withColumn("admit", $"reject_stage".isNull)
      .select($"doc_id", $"reject_stage", $"best_match", $"probed_near",
        $"probed_sim", $"probed_decontam", $"admit")
  }

  /** d38 — BLOOM-FILTER EXACT-DUP PRESCREEN: the constant-memory gate
    * production puts IN FRONT of d25's md5 equi-join — a Bloom filter
    * over the historical digest set answers "definitely new" without
    * touching the index, so only bloom-positive arrivals (true dups +
    * the fp fraction) ever reach the join; at 3 % fpp a mostly-novel
    * crawl batch shrinks the join input ~30×. Guarantees: NO false
    * negatives by construction (every true dup is bloom-positive —
    * audited here, not assumed), false positives only cost a wasted
    * probe. The audit runs BOTH arms over the d25 batch slice
    * (doc_id ≡ 0 mod 5 arrivals vs the rest as history) and emits one
    * verdict row the oracle can pin: batch/dup counts exactly, the
    * no-false-negative invariant, and the fp count inside 3× its
    * expectation (integer algebra: 100·fp ≤ 9·n_new + 1600) — the
    * t07/q23 sketch-gating pattern, since the fp COUNT itself is a
    * property of the filter's hash layout, not of the data.
    *
    * Determinism: Spark's BloomFilterImpl is seed-fixed Murmur3 over
    * the UTF-8 digest strings; the bit array is an OR of per-item
    * masks, so build parallelism and insertion order cannot change it.
    *
    * Scale shape: the build is one distributed treeAggregate over
    * history digests (`stat.bloomFilter`); the probe is a NARROW map
    * under a broadcast of the filter. At 100 TB a single filter over
    * billions of keys is GB-scale — production shards it by digest
    * range (per-shard blooms behind the same narrow probe; the
    * no-false-negative property composes across shards) or scopes it
    * to the hot-history window, exactly like the d14 probe sidecars.
    */
  def bloomPrescreen(s: SparkSession, dir: String, fpp: Double = 0.03): DataFrame = {
    import s.implicits._
    val docs = documents(s, dir).select($"doc_id", $"text")
    val (bloom, digests) = bloomIndex(docs.filter($"doc_id" % 5 =!= 0), fpp)
    bloomProbeBatch(docs.filter($"doc_id" % 5 === 0), bloom, digests)
      .agg(
        count(lit(1)).as("n_batch"),
        sum(when($"exact_dup", 1L).otherwise(0L)).as("n_exact_dup"),
        sum(when($"exact_dup" && !$"bloom_pos", 1L).otherwise(0L)).as("fn"),
        sum(when(!$"exact_dup" && $"bloom_pos", 1L).otherwise(0L)).as("fp"),
        sum(when(!$"exact_dup", 1L).otherwise(0L)).as("n_new"))
      .select($"n_batch", $"n_exact_dup",
        ($"fn" === 0L).as("no_false_negatives"),
        ($"fp" * 100L <= $"n_new" * 9L + 1600L).as("fp_rate_ok"))
  }

  /** The Bloom prescreen's static index: the SERIALIZED filter bytes
    * plus the exact digest table they front, built ONCE per run from
    * the historical slice (the streaming door holds both across
    * micro-batches). The filter is built by Spark's own
    * `BloomFilterAggregate` over `xxhash64(h)` — the identical
    * machinery `InjectRuntimeFilter` uses — in one distributed
    * aggregate (at 100 TB: the same treeAggregate shape, or
    * per-digest-range shard filters unioned by `mergeInPlace`). The
    * digest table is distinct'd and materialized so the filter build
    * and every later exact arm read one small store.
    */
  def bloomIndex(histDocs: DataFrame, fpp: Double = 0.03)
      : (Array[Byte], DataFrame) = {
    val s = histDocs.sparkSession
    import s.implicits._
    val digests = histDocs.select(md5($"text").as("h")).distinct().localCheckpoint()
    val n = math.max(digests.count(), 1L)
    val numBits =
      org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(n, fpp)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = org.apache.spark.sql.GraftBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        org.apache.spark.sql.GraftBridge.expression(xxhash64($"h")),
        Literal(n), Literal(numBits)).toAggregateExpression())
    val bytes = digests.agg(agg.as("bf")).head().getAs[Array[Byte]](0)
    // BloomFilterAggregate evals to NULL over zero rows; an EMPTY
    // filter (everything "definitely new") is the correct value for an
    // empty history — a null literal would three-value every verdict.
    val safe = Option(bytes).getOrElse {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.spark.util.sketch.BloomFilter.create(1L, fpp).writeTo(bos)
      bos.toByteArray
    }
    (safe, digests)
  }

  /** One prescreen pass over an arriving batch: per-doc
    * (doc_id, bloom_pos, exact_dup, definite_new). Every row depends
    * only on its own document versus the STATIC filter + digest
    * store, so per-batch probes compose to the whole-slice probe bit
    * for bit — the StreamingAdmission composition contract. The probe
    * is PLAN-NATIVE: `BloomFilterMightContain(<filter literal>,
    * xxhash64(h))` — the codegen'd expression Spark's injected
    * runtime filters execute, so no scalar UDF boxes rows and no
    * broadcast handle exists to leak across triggers; the filter
    * bytes ride the (torrent-broadcast) task binary like any foldable
    * literal. `definite_new` rows are the ones production admits
    * WITHOUT touching the digest join at all (the audit here still
    * joins everything so the fp/fn columns exist to be audited).
    */
  def bloomProbeBatch(batch: DataFrame,
                      filterBytes: Array[Byte],
                      histDigests: DataFrame): DataFrame = {
    val s = batch.sparkSession
    import s.implicits._
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    val pos = org.apache.spark.sql.GraftBridge.column(
      BloomFilterMightContain(
        Literal(filterBytes, org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.GraftBridge.expression(xxhash64($"h"))))
    probeCore(batch, pos, histDigests)
  }

  /** The streaming door's probe form: the filter ships as a Broadcast
    * handle ONCE for the run and the per-row probe is
    * `mightContainLong(xxhash64(h))` — the hash stays codegen'd, the
    * UDF boxes one long. Justification (the PlanAuditSpec whitelist
    * convention): the plan-native literal form re-embeds the filter
    * bytes in EVERY trigger's task binary — at production (GB-scale)
    * filter sizes that is a per-trigger driver re-serialization and a
    * lingering torrent copy per batch, strictly worse than per-row
    * long boxing; the one-shot d38 query keeps the literal form, where
    * the plan is built once and dies with the query. Bit-equivalent:
    * BloomFilterAggregate inserts putLong(xxhash64) and
    * BloomFilterMightContain probes mightContainLong on the same
    * value, so both forms read identical bits.
    */
  def bloomProbeBatch(batch: DataFrame,
                      bc: org.apache.spark.broadcast.Broadcast[
                        org.apache.spark.util.sketch.BloomFilter],
                      histDigests: DataFrame): DataFrame = {
    val s = batch.sparkSession
    import s.implicits._
    val probe = udf((h: Long) => bc.value.mightContainLong(h))
    probeCore(batch, probe(xxhash64($"h")), histDigests)
  }

  private def probeCore(batch: DataFrame, bloomPos: org.apache.spark.sql.Column,
                        histDigests: DataFrame): DataFrame = {
    val s = batch.sparkSession
    import s.implicits._
    batch.select($"doc_id", md5($"text").as("h"))
      .withColumn("bloom_pos", bloomPos)
      .join(histDigests.withColumn("is_dup", lit(true)), Seq("h"), "left")
      .select($"doc_id", $"bloom_pos",
        $"is_dup".isNotNull.as("exact_dup"),
        (!$"bloom_pos").as("definite_new"))
  }

  /** Word-3-gram Jaccard similarity over candidate pairs generated by a
    * shared-shingle equi-join (inverted-index style — only docs sharing
    * at least one shingle are ever paired, so sparsity bounds the work).
    * Shingles are md5-hashed to longs by the codegen'd
    * [[graft.functions.ShingleHashes]] before the explode: the join
    * shuffles 8-byte keys instead of ~20-char strings, and the pair
    * explosion compares primitives. (Hash collisions would fold two
    * shingles together — identically in the oracle, which hashes the
    * same way.)
    */
  /** (doc_a, doc_b, jaccard ≥ tau): the exact-Jaccard scored-pair core
    * shared by d04 ([[shingleJaccardPairs]], tau = 0.3) and d33's
    * threshold ablation — one definition, so a scoring change can
    * never silently diverge between the query and its ablation.
    */
  private[graft] def scoredJaccardPairs(s: SparkSession, dir: String,
      tau: Double): DataFrame = {
    import s.implicits._
    val sh = CorpusIndexes.shingles(s, dir)
    val a = sh.toDF("doc_a", "na", "sh_a")
    val b = sh.toDF("doc_b", "nb", "sh_b")
    // merge hint: identical shuffles on the shingle hash → the
    // tokenize/shingle pipeline is computed once via ReusedExchange.
    a.join(b.hint("merge"), $"sh_a" <=> $"sh_b" && $"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b", $"na", $"nb")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", $"inter".cast("double") / ($"na" + $"nb" - $"inter"))
      .filter($"jaccard" >= tau)
      .select($"doc_a", $"doc_b", $"jaccard")
  }

  def shingleJaccardPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    scoredJaccardPairs(s, dir, 0.3).orderBy($"doc_a", $"doc_b")
  }

  /** The skew-bounded form of [[shingleJaccardPairs]]: shingles whose
    * document frequency exceeds `cap` are dropped BEFORE pair
    * generation (a group-count semi-join, identical in the oracle).
    * Ubiquitous shingles — boilerplate trigrams shared by thousands of
    * docs — are exactly the hot join keys that explode the inverted
    * index quadratically, and they carry no discriminative signal for
    * near-dup detection; the cap bounds every shingle's pair
    * contribution at cap². Intersections count only surviving
    * (discriminative) shingles while denominators keep the full shingle
    * sets, so scores are conservative; the oracle computes the
    * identical capped semantics, value-checking the tradeoff.
    */
  /** (doc_a, doc_b, na, nb, inter) for every pair sharing ≥1 rare
    * shingle — the candidate-generation + overlap-count core shared by
    * [[shingleJaccardPairsCapped]] (symmetric Jaccard) and
    * [[shingleContainmentPairs]] (asymmetric containment). Frame-based
    * so specs can feed constructed corpora.
    */
  private[graft] def shinglePairCounts(docs: DataFrame, cap: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    shinglePairCountsFromIndex(s, docs
      .select($"doc_id", shingle_hashes($"text").as("sh"))
      .select($"doc_id", size($"sh").as("nsh"), explode($"sh").as("shash")), cap)
  }

  /** [[shinglePairCounts]] over a prebuilt (doc_id, nsh, shash) index —
    * the registered queries feed the shared [[CorpusIndexes.shingles]]
    * sidecar here; the frame-based wrapper above keeps constructed-corpus
    * specs working.
    */
  private def shinglePairCountsFromIndex(s: SparkSession, sh: DataFrame,
                                         cap: Int): DataFrame = {
    import s.implicits._
    val rare = sh.groupBy($"shash").agg(count(lit(1)).as("df"))
      .filter($"df" <= cap && $"df" > 1)
      .select($"shash")
    val kept = sh.join(rare.hint("merge"), Seq("shash"))
    val a = kept.toDF("sh_a", "doc_a", "na")
    val b = kept.toDF("sh_b", "doc_b", "nb")
    a.join(b.hint("merge"), $"sh_a" <=> $"sh_b" && $"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b", $"na", $"nb")
      .agg(count(lit(1)).as("inter"))
  }

  def shingleJaccardPairsCapped(s: SparkSession, dir: String, cap: Int = 256): DataFrame = {
    import s.implicits._
    shinglePairCountsFromIndex(s, CorpusIndexes.shingles(s, dir), cap)
      .withColumn("jaccard", $"inter".cast("double") / ($"na" + $"nb" - $"inter"))
      .filter($"jaccard" >= 0.3)
      .select($"doc_a", $"doc_b", $"jaccard")
      .orderBy($"doc_a", $"doc_b")
  }

  /** Containment near-dup pairs — the asymmetric metric Jaccard blinds
    * itself to: a short document pasted inside a long one scores
    * `inter/min(|A|,|B|)` ≈ 1 but Jaccard ≈ |A|/|B| ≈ 0. The standard
    * catch for doc-in-doc duplication (quote inflation, boilerplate
    * wrapping, concatenated crawls) in training-data pipelines. Same
    * df-capped inverted-index candidates and skew bound as d12 — only
    * the scoring denominator changes; both metrics are emitted so
    * downstream policy can distinguish "same doc" from "contains doc".
    */
  def shingleContainmentPairs(s: SparkSession, dir: String, cap: Int = 256): DataFrame = {
    import s.implicits._
    shinglePairCountsFromIndex(s, CorpusIndexes.shingles(s, dir), cap)
      .withColumn("containment", $"inter".cast("double") / least($"na", $"nb"))
      .withColumn("jaccard", $"inter".cast("double") / ($"na" + $"nb" - $"inter"))
      .filter($"containment" >= 0.2)
      .select($"doc_a", $"doc_b", $"containment", $"jaccard")
      .orderBy($"doc_a", $"doc_b")
  }

  /** 60-bit SimHash (Charikar-style; 60 bits = 15 md5 hex chars keeps
    * the value positive in a signed 64-bit int on BOTH engines),
    * computed by the codegen'd [[graft.functions.SimHash60]] — one
    * static call per row. The frequency-weighted bit vote
    * Σ_distinct-tokens cnt·(±1) equals the plain per-occurrence sum, so
    * no (doc, token) aggregate is needed at all.
    *
    * Width matters at scale: band buckets are keyed by simhash
    * fragments, so bucket count — and with it candidate-pair dilution
    * in [[simhashPairsBanded]] — grows exponentially with band width.
    * 8-bit bands (of a 32-bit hash) give 256 buckets and a
    * corpus-quadratic candidate volume; 15-bit bands give 32,768 and
    * keep the join output-bound by true near-dups.
    */
  private def simhashDf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .select($"doc_id", simhash60($"text").as("simhash"))
  }

  def simhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    simhashDf(s, dir).orderBy($"doc_id")
  }

  /** Near-dup pairs by SimHash hamming distance ≤ 8 — the ALL-PAIRS
    * recall oracle for [[simhashPairsBanded]], bounded to small inputs;
    * the banded equi-join is the registered scale path.
    */
  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sims = simhashDf(s, dir)
    val a = sims.toDF("doc_a", "sim_a")
    val b = sims.toDF("doc_b", "sim_b")
    a.join(b, $"doc_a" < $"doc_b")
      .withColumn("hamming", expr("cast(bit_count(sim_a ^ sim_b) as bigint)"))
      .filter($"hamming" <= 8)
      .select($"doc_a", $"doc_b", $"hamming")
      .orderBy($"doc_a", $"doc_b")
  }

  /** The scale path for [[simhashPairs]]: the 60-bit hash splits into
    * 4 15-bit bands; docs sharing any band value become candidates via
    * an equi-join on (band, value) — linear shuffle, quadratic only
    * within a band bucket, and with 32,768 possible values per band the
    * buckets dilute as the corpus grows instead of saturating (the
    * failure mode of narrow bands). Hamming ≤ 8 is verified on
    * candidates only. Pigeonhole: pairs at distance ≤ 3 are guaranteed
    * caught (4 bands cannot all differ); at distance 4-8 banding trades
    * recall for the bounded join exactly as d08 does. The oracle
    * computes the identical banded semantics, so the tradeoff is
    * value-checked.
    */
  /** (doc_id, simhash, band, bval) — the banded SimHash index shared by
    * the pair generator and the incremental probe: 4 15-bit bands of
    * the 60-bit hash.
    */
  private def simhashBands(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    simhashDf(s, dir)
      .select($"doc_id", $"simhash", posexplode(expr(
        "transform(sequence(0, 3), j -> (simhash >> (15 * j)) & 32767)")))
      .select($"doc_id", $"simhash", $"pos".as("band"), $"col".as("bval"))
  }

  private[ops] def bandedPairsUnsorted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = simhashBands(s, dir)
    val a = bands.toDF("doc_a", "sim_a", "band_a", "bv_a")
    val b = bands.toDF("doc_b", "sim_b", "band_b", "bv_b")
    // Hamming verification runs BEFORE the dedup of multi-band
    // collisions: the filter is a per-row bit_count inside the join
    // stage, so the distinct shuffles only verified near-dups (~10³)
    // instead of every band collision (~10⁷ at sf0.1) — same result,
    // 28M-row shuffle avoided.
    // Merge-join hint: broadcasting one side would compute the simhash
    // pipeline twice (a BroadcastExchange can't be reused against a
    // shuffle); with both sides shuffling on (band, value) the two
    // branches are identical exchanges and ReusedExchange evaluates the
    // fold pipeline ONCE for both (measured ~2× on d09).
    a.join(b.hint("merge"), $"band_a" === $"band_b" && $"bv_a" <=> $"bv_b" && $"doc_a" < $"doc_b")
      .withColumn("hamming", expr("cast(bit_count(sim_a ^ sim_b) as bigint)"))
      .filter($"hamming" <= 8)
      .select($"doc_a", $"doc_b", $"hamming").distinct()
  }

  def simhashPairsBanded(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bandedPairsUnsorted(s, dir).orderBy($"doc_a", $"doc_b")
  }

  /** Embedding-cosine near-duplicate pairs (cos ≥ 0.4) — the ALL-PAIRS
    * recall oracle for [[embeddingDupPairsBucketed]], bounded to small
    * inputs; the sign-bucketed equi-join is the registered scale path.
    * Norms are computed once per vector before the pair join; the pair
    * predicate uses the codegen'd FloatVectorDot.
    */
  def embeddingDupPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = embeddings(s, dir)
      .select($"vec_id", $"embedding", vec_norm($"embedding").as("nrm"))
    val a = e.toDF("id_a", "emb_a", "nrm_a")
    val b = e.toDF("id_b", "emb_b", "nrm_b")
    a.join(b, $"id_a" < $"id_b")
      .withColumn("cos", cosinePrenormed(vec_dot($"emb_a", $"emb_b"), $"nrm_a", $"nrm_b"))
      .filter($"cos" >= 0.4)
      .select($"id_a", $"id_b", $"cos")
      .orderBy($"id_a", $"id_b")
  }

  /** The scale path for [[embeddingDupPairs]]: candidate pairs come
    * from an equi-join on the same sign-plane LSH bucket s02 uses
    * (16 cells over the leading dimensions), then the cosine threshold
    * is verified with the codegen'd dot product on candidates only —
    * candidates drop ~16× versus all-pairs and the join is a plain
    * shuffle on the bucket key. Cross-bucket near-dups are the recall
    * tradeoff (a cos ≥ 0.4 pair rarely straddles sign flips in every
    * probed dimension — multi-probe recovers them at scale); the
    * oracle computes the identical bucketed semantics.
    */
  def embeddingDupPairsBucketed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    embeddingPairsBucketedUnsorted(s, dir).orderBy($"id_a", $"id_b")
  }

  /** [[embeddingDupPairsBucketed]] without the presentation sort — the
    * reusable edge list for graph consumers ([[semanticClusters]]).
    */
  private def embeddingPairsBucketedUnsorted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = embeddings(s, dir)
      .select($"vec_id", $"embedding", vec_norm($"embedding").as("nrm"),
        expr(Similarity.signBucketExpr).as("bucket"))
    val a = e.toDF("id_a", "emb_a", "nrm_a", "bucket_a")
    val b = e.toDF("id_b", "emb_b", "nrm_b", "bucket_b")
    a.join(b, $"bucket_a" === $"bucket_b" && $"id_a" < $"id_b")
      .withColumn("cos", cosinePrenormed(vec_dot($"emb_a", $"emb_b"), $"nrm_a", $"nrm_b"))
      .filter($"cos" >= 0.4)
      .select($"id_a", $"id_b", $"cos")
  }

  /** Semantic duplicate clusters — connected components over the
    * embedding near-dup graph (d10's sign-bucketed cos ≥ 0.4 pairs),
    * the embedding-space analog of d11's lexical clustering: chains of
    * paraphrases collapse into one cluster even when the endpoints'
    * cosine is below threshold. Only vectors implicated in at least
    * one near-dup pair appear; everything else is trivially its own
    * singleton and never shuffles.
    *
    * Scale shape: the edge list is the bounded bucketed equi-join
    * (never all-pairs), and the labeling is the same O(log diameter)
    * pointer-jumping loop as d11 — candidate generation and clustering
    * both survive the 100× corpus unchanged.
    */
  def semanticClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    connectedComponents(s,
      embeddingPairsBucketedUnsorted(s, dir).select($"id_a".as("doc_a"), $"id_b".as("doc_b")))
      .select($"doc_id".as("vec_id"), $"cluster_id")
      .orderBy($"vec_id")
  }

  /** d40 — SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication"): the
    * k-means-clustered form of embedding dedup a frontier-corpus
    * pipeline actually ships — the FULL form of what d16's greedy
    * prune approximates. Both share the trained s04 IVF cells (the
    * session/disk sidecar eight other consumers already read) and
    * within-cell cos ≥ τ candidate pairs; d16 then drops each vector
    * against its best LOWER-ID neighbor (one pass, no transitivity),
    * while this op builds the paper's actual semantics: near-dup
    * GROUPS by connected components (a paraphrase chain is ONE
    * group), and per group keeps the member FARTHEST from its
    * centroid (the paper's keep rule: the least prototypical exemplar
    * carries the most marginal information), ties by lowest vec_id —
    * a keep decision d16's id-ordered greedy cannot express. Output:
    * every implicated vector with its cell, duplicate group,
    * cosine-to-centroid, and the keep verdict.
    *
    * Determinism: cell assignment is the s04 broadcast argmax (cosine
    * desc, id tiebreak); every cosine is the codegen sequential-fold
    * vec_dot (bit-identical to DuckDB's list_dot_product); the keep
    * window orders by (cos_c asc, vec_id) — double compares over
    * bit-identical values, never arithmetic.
    *
    * Scale shape: candidates come from a cell-equi self-join — cells
    * are the trained partitioning, so pair volume is Σ|cell|², the
    * quantity SemDeDup's clustering exists to bound (vs the corpus²
    * naive form); the codebook joins are 16-row broadcasts; CC is the
    * d11 pointer-jumping loop; the keep window partitions by duplicate
    * group (bounded by the largest within-cell dup chain). At 100 TB
    * the assignment is the persisted IVF sidecar, so SemDeDup costs
    * one co-located self-join per cell plus a group-sized window —
    * no new corpus pass.
    */
  def semDedup(s: SparkSession, dir: String, tau: Double = 0.4): DataFrame = {
    import s.implicits._
    val assigned = Similarity.ivfAssigned(s, dir)
    val cb = Similarity.codebookOf(Similarity.normedVectors(s, dir))
    val withC = assigned.join(broadcast(cb), Seq("cell_id"))
      .withColumn("cos_c",
        cosinePrenormed(vec_dot($"embedding", $"c_emb"), $"nrm", $"c_nrm"))
      .select($"vec_id", $"embedding", $"nrm", $"cell_id", $"cos_c")
    val a = withC.select($"vec_id".as("id_a"), $"embedding".as("emb_a"),
      $"nrm".as("nrm_a"), $"cell_id")
    val b = withC.select($"vec_id".as("id_b"), $"embedding".as("emb_b"),
      $"nrm".as("nrm_b"), $"cell_id")
    val pairs = a.join(b, Seq("cell_id"))
      .filter($"id_a" < $"id_b")
      .withColumn("cos", cosinePrenormed(vec_dot($"emb_a", $"emb_b"), $"nrm_a", $"nrm_b"))
      .filter($"cos" >= tau)
      .select($"id_a".as("doc_a"), $"id_b".as("doc_b"))
    val labels = connectedComponents(s, pairs)
      .select($"doc_id".as("vec_id"), $"cluster_id")
    val kw = Window.partitionBy($"cluster_id").orderBy($"cos_c".asc, $"vec_id")
    withC.join(labels, Seq("vec_id"))
      .withColumn("keep", row_number().over(kw) === 1)
      .select($"vec_id", $"cell_id", $"cluster_id", $"cos_c", $"keep")
      .orderBy($"vec_id")
  }

  /** d41 — SIGNAL-AGREEMENT audit: the d27 lexical keep/drop decision
    * against the d40 semantic (SemDeDup) keep/drop decision, per
    * document — the review table a curation owner reads before
    * composing dedup signals, because the two families disagree by
    * construction (lexical near-dups share surface text, semantic
    * near-dups share meaning) and a doc DROPPED by one but UNTOUCHED
    * by the other is exactly the marginal-information question d24
    * asks across modalities, here asked across DECISION FAMILIES.
    * Output: one row per (lex, sem) verdict pair — keep / drop /
    * uninvolved — with doc counts and the lowest implicated id.
    * Docs without an embedding row are semantically `uninvolved`
    * (no vector ⇒ no semantic signal; at this corpus the embedding
    * table covers an id-aligned prefix, and a deployment joins
    * through its doc→vec mapping column the same way).
    *
    * Scale shape: both inputs are decision tables (implicated-doc-
    * sized, orders under the corpus), the join is a full outer on
    * doc_id, and the output is ≤ 9 rows — composition costs nothing
    * beyond the two family passes it audits, both of which serve from
    * session/disk sidecars.
    */
  def dedupSignalAgreement(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lex = canonicalSelection(s, dir)
      .select($"doc_id", when($"kept", "keep").otherwise("drop").as("lex"))
    val sem = semDedup(s, dir)
      .select($"vec_id".as("doc_id"), when($"keep", "keep").otherwise("drop").as("sem"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .select($"doc_id", coalesce($"lex", lit("uninvolved")).as("lex"),
        coalesce($"sem", lit("uninvolved")).as("sem"))
      .groupBy($"lex", $"sem")
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("first_doc"))
      .orderBy($"lex", $"sem")
  }

  /** Chunk-level exact substring dedup — the fixed-window form of the
    * suffix-dedup every LLM corpus pipeline runs (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"):
    * documents are cut into non-overlapping 10-token windows, each
    * window is hashed, and a window whose hash recurs in ≥ 2 distinct
    * documents is a repeated span — boilerplate, licence blocks,
    * templated passages — reported with its document frequency, total
    * occurrence count, and earliest carrier. Exact-doc dedup (d01)
    * misses these: two documents sharing one paragraph are different
    * documents but still leak the same training text.
    *
    * Scale shape: one token explode, then two md5-keyed aggregates
    * (chunk assembly is a per-(doc, window) group bounded at 10 rows;
    * the recurrence count groups by digest only — documents never
    * shuffle whole). The distinct-docs / total-occurrences pair is
    * computed Expand-free by aggregating (hash, doc) first and
    * re-aggregating, per the countDistinct rule.
    */
  def chunkDedup(s: SparkSession, dir: String, window: Int = 10): DataFrame =
    chunkDedupFrame(documents(s, dir).select(col("doc_id"), col("text")), window)

  /** [[chunkDedup]] over an explicit (doc_id, text) frame — the seam
    * the d34 blind-spot spec feeds literal corpora through.
    */
  private[graft] def chunkDedupFrame(docs: DataFrame, window: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // Chunk assembly is pure array slicing of the split result — the
    // k-th chunk IS slice k of the word array, and trailing partial
    // windows simply never materialize (floor(n/window) slices). The
    // previous form exploded every token and re-grouped by
    // (doc_id, chunk_no) — a corpus-wide shuffle of every word plus a
    // per-group sort_array(collect_list(struct)) fold — to rebuild
    // exactly the slices the array already held (§2.4: remove the
    // shuffle outright; §2.3: what still shuffles downstream is the
    // digest-keyed report, never tokens).
    val chunks = docs
      .select($"doc_id", split($"text", "\\s+").as("ws"))
      .select($"doc_id", explode(expr(
        s"""CASE WHEN size(ws) >= $window
              THEN transform(sequence(0, int(size(ws) div $window) - 1),
                   i -> array_join(slice(ws, i * $window + 1, $window), ' '))
              ELSE array() END""")).as("chunk"))
    spanReport(s, chunks)
  }

  /** Content-defined chunk dedup — [[chunkDedup]] with its alignment
    * blind spot closed. d20's fixed windows only match a shared span
    * when both carriers place it at the same offset mod window (insert
    * one token at the front of a document and every boundary shifts);
    * a fixed-STRIDE overlap doesn't fix that, it only widens the
    * matching offset classes. The alignment-independent construction
    * is content-defined chunking (the rsync/LBFS/winnowing idea):
    * a chunk boundary opens wherever a token's md5 bucket lands in
    * 1/8 of hash space, so boundary positions travel WITH the text —
    * two copies of a span chunk identically no matter where each copy
    * sits. Any shared span containing two boundary tokens ≥ minLen
    * apart yields an identical full chunk in every carrier (expected
    * chunk length = 8 tokens). Chunks shorter than minLen are noise
    * (single hot words) and drop.
    *
    * Scale shape: one token explode, a per-document prefix-sum window
    * (bounded by document length, never a global sort), then the same
    * digest-keyed report as d20 — documents never shuffle whole.
    */
  def chunkDedupCdc(s: SparkSession, dir: String, minLen: Int = 5): DataFrame =
    chunkDedupCdcFrame(documents(s, dir).select(col("doc_id"), col("text")), minLen)

  /** [[chunkDedupCdc]] over an explicit (doc_id, text) frame — the
    * seam the d34 blind-spot spec feeds literal corpora through.
    */
  private[graft] def chunkDedupCdcFrame(docs: DataFrame, minLen: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val boundary =
      expr("cast(conv(substring(md5(word), 1, 8), 16, 10) as bigint) % 8 = 0")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val chunks = docs
      .select($"doc_id", posexplode(split($"text", "\\s+")).as(Seq("pos", "word")))
      .withColumn("chunk_no", sum(boundary.cast("long")).over(w))
      .groupBy($"doc_id", $"chunk_no")
      .agg(count(lit(1)).as("n_words"),
        array_join(
          expr("transform(sort_array(collect_list(struct(pos, word))), x -> x.word)"),
          " ").as("chunk"))
      .filter($"n_words" >= minLen)
    spanReport(s, chunks)
  }

  /** Shared tail of the chunk-dedup family: (doc, chunk) occurrences →
    * repeated-span report keyed by digest, docs never shuffled whole.
    */
  private def spanReport(s: SparkSession, chunks: DataFrame): DataFrame = {
    import s.implicits._
    // Group on the chunk TEXT and derive the digest after aggregation:
    // the previous md5-keyed form carried min(chunk) through both agg
    // levels, and a variable-length agg BUFFER disqualifies
    // HashAggregateExec — the whole report ran as sort-based
    // aggregation (Sort + SortAggregate per level). Text-keyed groups
    // leave only fixed-width buffers (counts, min id), so both levels
    // hash-aggregate with map-side partial aggregation, and the
    // shuffled bytes are unchanged (the text travelled anyway as the
    // min(chunk) payload). Identical output: chunks equal ⇔ digests
    // equal (md5 is injective on this corpus; the md5-keyed form
    // already assumed exactly this when it picked min(chunk) as THE
    // text for a digest).
    val perDoc = chunks
      .groupBy($"chunk", $"doc_id")
      .agg(count(lit(1)).as("n_occ"))
    perDoc
      .groupBy($"chunk")
      .agg(count(lit(1)).as("n_docs"), sum($"n_occ").as("n_occ"),
        min($"doc_id").as("min_doc_id"))
      .filter($"n_docs" >= 2)
      .select(md5($"chunk").as("chunk_hash"), $"chunk", $"n_docs",
        $"n_occ", $"min_doc_id")
      .orderBy($"chunk_hash")
  }

  /** d34 — EXACT repeated substrings at ARBITRARY length: the
    * training-data-dedup literature standard (repeated spans of ≥ L
    * tokens shared across documents — Lee et al.'s "Deduplicating
    * Training Data Makes Language Models Better" uses exactly this
    * criterion) that d20 and d22 only approximate. d20's fixed
    * windows need BOTH carriers to place the span at the same offset
    * mod 10; d22's content-defined chunks need ≥ 2 boundary tokens
    * minLen apart INSIDE the span — a shared span that is
    * misaligned for d20 and boundary-free for d22 escapes both
    * (proven constructively in InvariantSpec). The
    * alignment-independent exact construction: every position's
    * L-gram polynomial hash (the positional gram index, shared
    * machinery with t34), a gram repeated across ≥ 2 distinct docs
    * marks its position, and maximal runs of consecutive marked
    * positions are the maximal duplicated regions — every L-window
    * inside a reported span occurs verbatim elsewhere in the corpus,
    * and any cross-doc repeated substring of ≥ L tokens is covered at
    * every alignment by construction.
    *
    * Scale shape: one posexplode over the codegen'd positional gram
    * expression (8-byte keys, text never shuffles), an Expand-free
    * two-level distinct-doc count on the gram key, one semi-join of
    * grams against the repeated-gram set (gram-keyed equi-join — at
    * campaign scale this is the bucketed gram sidecar), a per-DOC
    * islands window (document-sized partitions), and one final join
    * back to (doc_id, text) restricted to span-carrying docs to slice
    * the span text out.
    */
  def maximalRepeatedSpans(s: SparkSession, dir: String,
                           minTokens: Int = 20): DataFrame =
    repeatedSpanRows(documents(s, dir).select(col("doc_id"), col("text")),
      minTokens)

  /** Every position's L-gram hash for each doc — (doc_id, pos, g), the
    * positional gram index all three span ops (d34/d35/d36) explode
    * once and share, so a change to the gram construction can never
    * diverge them.
    */
  private def positionalGrams(docs: DataFrame, l: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select($"doc_id",
      posexplode(ngram_hashes_all($"text", l)).as(Seq("pos", "g")))
  }

  /** The shared span TAIL: marked gram positions → maximal islands →
    * (start_pos, span_tokens) → slice the span text back out of the
    * carrier doc. Used identically by d34 (hits = corpus-repeated
    * grams) and d36 (hits = grams present in the historical index) —
    * one definition of the islands/slice arithmetic for both.
    */
  private def spanSlices(hits: DataFrame, docs: DataFrame, l: Int): DataFrame = {
    val s = hits.sparkSession
    import s.implicits._
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    hits
      .withColumn("grp", $"pos" - row_number().over(w))
      .groupBy($"doc_id", $"grp")
      .agg(min($"pos").cast("long").as("start_pos"),
        (max($"pos") - min($"pos") + l).cast("long").as("span_tokens"))
      .join(docs, Seq("doc_id"))
      .select($"doc_id", $"start_pos", $"span_tokens",
        array_join(slice(split($"text", "\\s+"), ($"start_pos" + 1).cast("int"),
          $"span_tokens".cast("int")), " ").as("span_text"))
      .orderBy($"doc_id", $"start_pos")
  }

  /** [[maximalRepeatedSpans]] over an explicit (doc_id, text) frame —
    * the blind-spot spec's seam.
    */
  private[graft] def repeatedSpanRows(docs: DataFrame, l: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val grams = positionalGrams(docs, l)
    // Expand-free df ≥ 2 on the gram key: (g, doc) first, then g.
    val rep = grams.groupBy($"g", $"doc_id").agg(count(lit(1)).as("n"))
      .groupBy($"g").agg(count(lit(1)).as("n_docs"))
      .filter($"n_docs" >= 2)
      .select($"g")
    spanSlices(grams.join(rep, Seq("g"), "left_semi"), docs, l)
  }

  /** d35 — the APPLY step for d34 (the ExactSubstr-dedup cut pass):
    * every duplicated region is REMOVED from every carrier except the
    * gram's canonical one (min doc_id — matching the d11/d19/d27
    * earliest-carrier convention), and the cleaned text ships. A
    * token is cut iff some cross-doc-repeated L-gram window covers it
    * in a doc that is not that gram's canonical carrier; a doc can
    * keep one region (canonical there) while losing an overlapping
    * one (non-canonical), which is exactly the per-substring
    * cut-all-but-one semantics of the literature's exact-substring
    * dedup. Intra-doc repeats with no second carrier are NOT cut
    * (they are d20/t17's business, not cross-doc dedup's).
    *
    * Output: one row per AFFECTED doc with before/after token counts
    * and the cleaned text — the artifact a curation run writes back;
    * the hash match against the oracle certifies the exact bytes of
    * every cleaned document.
    *
    * Scale shape: d34's gram/df machinery unchanged (text never
    * shuffles into the gram index), cut positions fold to intervals
    * per doc (islands window, document-sized partitions), the
    * interval list collects per DOC (bounded by doc length), and the
    * token-filter HOF runs inside the scan projection of the one
    * join back to affected docs' text.
    */
  def spanDedupApply(s: SparkSession, dir: String, l: Int = 20): DataFrame =
    spanDedupApplyRows(documents(s, dir).select(col("doc_id"), col("text")), l)

  /** [[spanDedupApply]] over an explicit (doc_id, text) frame — the
    * canonical-carrier spec's seam.
    */
  private[graft] def spanDedupApplyRows(docs: DataFrame, l: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val grams = positionalGrams(docs, l)
    val rep = grams.groupBy($"g", $"doc_id").agg(count(lit(1)).as("n"))
      .groupBy($"g")
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("canon_doc"))
      .filter($"n_docs" >= 2)
      .select($"g", $"canon_doc")
    // (doc, pos) is unique in grams and each pos carries ONE gram, so
    // the join emits at most one cut row per position.
    val cut = grams.join(rep, Seq("g"))
      .filter($"doc_id" =!= $"canon_doc")
      .select($"doc_id", $"pos")
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val ivs = cut.withColumn("grp", $"pos" - row_number().over(w))
      .groupBy($"doc_id", $"grp")
      .agg(min($"pos").as("a"), (max($"pos") + l - 1).as("b"))
      .groupBy($"doc_id")
      .agg(sort_array(collect_list(struct($"a", $"b"))).as("ivs"))
    ivs.join(docs, Seq("doc_id"))
      .withColumn("toks", split($"text", "\\s+"))
      .withColumn("kept", expr(
        "filter(transform(toks, (t, i) -> struct(i AS i, t AS t)), " +
          "s -> !exists(ivs, v -> s.i >= v.a AND s.i <= v.b))"))
      .select($"doc_id",
        size($"toks").cast("long").as("n_tokens"),
        (size($"toks") - size($"kept")).cast("long").as("n_removed"),
        expr("array_join(transform(kept, s -> s.t), ' ')").as("text_clean"))
      .orderBy($"doc_id")
  }

  /** The historical POSITIONAL-GRAM set the incremental span probes
    * hit — distinct L-gram hashes of the history slice (doc_id ≢ 0
    * mod 5, the family's arrival convention). A session sidecar; at
    * campaign scale this is the persisted g-bucketed table
    * [[persistSpanGramIndex]] writes once per corpus snapshot.
    */
  private[graft] def spanGramIndex(s: SparkSession, dir: String,
                                   l: Int = 20): DataFrame = {
    import s.implicits._
    CorpusIndexes.memo(s, dir, s"span_grams_$l") {
      documents(s, dir).filter($"doc_id" % 5 =!= 0)
        .select(explode(ngram_hashes_all($"text", l)).as("g"))
        .distinct()
    }
  }

  /** Write the historical gram set as a durable g-bucketed sidecar
    * under `root/span_grams` — the disk form the streaming span door
    * probes (one equi-join per batch on the bucket column).
    */
  def persistSpanGramIndex(s: SparkSession, dir: String, root: String,
                           l: Int = 20): Unit =
    CorpusIndexes.writeBucketedTable(spanGramIndex(s, dir, l),
      s"$root/span_grams", CorpusIndexes.tableName(root, "span_grams"),
      CorpusIndexes.layouts("span_grams"))

  /** Read the durable gram sidecar written by [[persistSpanGramIndex]]. */
  def loadSpanGramIndex(s: SparkSession, root: String): DataFrame =
    CorpusIndexes.readBucketedTable(s, s"$root/span_grams",
      CorpusIndexes.tableName(root, "span_grams"),
      CorpusIndexes.layouts("span_grams"))

  /** d36 — INCREMENTAL repeated-span probe: d34 at ingest time. Each
    * arriving document (doc_id ≡ 0 mod 5) probes the HISTORICAL gram
    * set alone — never other arrivals, the incremental premise every
    * d14/d15/d32 probe shares — and reports its maximal regions whose
    * every L-window already exists in history: the leakage report a
    * crawl day gets against the training corpus BEFORE admission,
    * where d34 is the full-corpus retrospective.
    *
    * Scale shape: only the BATCH hashes text; the probe is one
    * semi-join of batch gram rows against the pre-built gram set
    * (g-bucketed on disk at scale — co-located), islands per arrival
    * doc, and one join back to arrival text for the span slice.
    */
  def incrementalSpanProbe(s: SparkSession, dir: String,
                           l: Int = 20): DataFrame = {
    import s.implicits._
    incrementalSpanRows(
      documents(s, dir).filter($"doc_id" % 5 === 0).select($"doc_id", $"text"),
      spanGramIndex(s, dir, l), l)
  }

  /** [[incrementalSpanProbe]]'s per-batch transform — shared verbatim
    * with the streaming door (`graft.streaming.StreamingSpanDedup`),
    * so the streamed union composes to batch d36 structurally: every
    * output row is a function of its own document and the static
    * index only.
    */
  private[graft] def incrementalSpanRows(batch: DataFrame, gramIdx: DataFrame,
                                         l: Int): DataFrame = {
    val s = batch.sparkSession
    import s.implicits._
    val hits = positionalGrams(batch, l).join(gramIdx, Seq("g"), "left_semi")
    spanSlices(hits, batch, l)
  }

  /** Estimator-quality audit for the MinHash index: on every d08
    * candidate pair, the Jaccard ESTIMATE from 12-component signature
    * agreement next to the TRUE distinct-token Jaccard. This is the
    * "measure, don't guess" query for the sketch itself — at 100 TB
    * the audit runs on a sampled pair set and its error distribution
    * decides whether the signature width (12) needs widening before a
    * dedup campaign trusts the index.
    *
    * Scale shape: candidates only (the capped LSH join), and the TRUE
    * Jaccard is recounted from the token inverted index — the d04
    * discipline — instead of carrying per-doc distinct-token ARRAYS
    * through the pair joins (the round-9 form; its per-pair payload was
    * O(doc tokens)): each pair fans out over doc_a's token hashes
    * (pairs ⋈ index on doc_a), the fan-out inner-joins the index again
    * on (doc_b, token), and the surviving row count IS |A ∩ B|. Every
    * shuffled pair row is (doc_a, doc_b, token-hash) — three longs —
    * and |A|, |B| arrive as precomputed per-doc counts. Tokens are
    * h32-hashed ([[graft.functions.TokenHashes]], one codegen call per
    * row); collisions fold tokens identically in the oracle. The only
    * arrays anywhere are the 12-int signatures the estimate needs.
    */
  def minhashAccuracy(s: SparkSession, dir: String, cap: Int = 64): DataFrame = {
    import s.implicits._
    pairSketchRows(s, dir, cap)
      .withColumn("agree", expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), b -> b))"))
      .select($"doc_a", $"doc_b",
        ($"agree".cast("double") / 12).as("est_jaccard"),
        ($"inter".cast("double") / ($"na" + $"nb" - $"inter")).as("true_jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** The d18/d39 shared core: per d08 candidate pair the exact token
    * intersection plus both docs' signatures and token counts —
    * everything any sketch-estimator audit derives from.
    */
  private def pairSketchRows(s: SparkSession, dir: String, cap: Int): DataFrame = {
    import s.implicits._
    val docs = documents(s, dir)
    // (doc_id, th): the token inverted index — 8-byte keys, no arrays;
    // shared via the session sidecar cache (d23 probes the same index).
    val tokIdx = CorpusIndexes.tokens(s, dir)
    // The pair list is consumed ONCE (the LSH pipeline is the expensive
    // branch; a second reference would evaluate it twice — broadcast
    // joins leave no identical exchange for ReusedExchange to share):
    // fan each pair out over doc_a's tokens, LEFT-probe doc_b's index —
    // (doc_b, th) is unique, so the probe never multiplies rows — and
    // re-aggregate. Misses count 0, so a zero-overlap candidate (an LSH
    // band collision does not guarantee a shared token — band keys are
    // mod 2³¹−1) surfaces with true_jaccard = 0 instead of vanishing.
    val pairCounts = cappedPairsUnsorted(s, dir, cap)
      .join(tokIdx.toDF("doc_a", "th"), Seq("doc_a"))
      .join(tokIdx.toDF("doc_b", "th").withColumn("hit", lit(1L)),
            Seq("doc_b", "th"), "left")
      .groupBy($"doc_a", $"doc_b").agg(sum(coalesce($"hit", lit(0L))).as("inter"))
    // Per-doc metadata re-joins AFTER the aggregate, onto candidate-count
    // rows: the 12-int signatures are the only arrays anywhere.
    val meta = documents(s, dir).select($"doc_id", minhash_sig($"text").as("sig"),
      size(token_hashes($"text")).cast("long").as("ntok"))
    pairCounts
      .join(meta.toDF("doc_a", "sig_a", "na"), Seq("doc_a"))
      .join(meta.toDF("doc_b", "sig_b", "nb"), Seq("doc_b"))
  }

  /** d39 — b-BIT MINWISE audit (b = 1, Li & König): store only the
    * LOWEST BIT of each minhash component — a 64× compression of the
    * 12-int signature (the difference between a signature store that
    * fits in RAM at 10¹⁰ docs and one that doesn't) — and estimate
    * Jaccard from bit agreement: E[bit match] = j + (1−j)/2, so
    * ĵ₁ = 2·A/k − 1 with A the agreeing components. Emitted per d08
    * candidate next to the full-signature estimate and the exact
    * token Jaccard, so the audit reads the accuracy COST of the 64×
    * compression directly (raw ĵ₁ is reported unclamped — negative
    * values are how the estimator says "below the random baseline",
    * and clamping would hide the variance the audit exists to
    * measure).
    *
    * Determinism: bit agreement is integer; both estimates are single
    * divides of exact integers; true Jaccard is the d18 recount.
    *
    * Scale shape: identical to d18 — candidates only, three-long pair
    * rows, signatures join after the aggregate.
    */
  def bbitMinwiseAudit(s: SparkSession, dir: String, cap: Int = 64): DataFrame = {
    import s.implicits._
    pairSketchRows(s, dir, cap)
      .withColumn("agree_full", expr(
        "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), b -> b))"))
      .withColumn("agree_bits", expr(
        "size(filter(zip_with(sig_a, sig_b, (x, y) -> (x % 2) = (y % 2)), b -> b))"))
      .select($"doc_a", $"doc_b",
        $"agree_bits".cast("long").as("agree_bits"),
        (($"agree_bits" * 2 - 12).cast("double") / 12).as("est_b1"),
        ($"agree_full".cast("double") / 12).as("est_full"),
        ($"inter".cast("double") / ($"na" + $"nb" - $"inter")).as("true_jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** d29 — LSH THRESHOLD calibration: the tuning read before a dedup
    * campaign picks its Jaccard bar. Over the d18 pair audit, for each
    * τ in 0.1 … 0.9: how many candidates the estimator would pass
    * (est ≥ τ), how many are truly ≥ τ, the precision of the
    * estimator's cut, and the THEORETICAL banded-LSH collision
    * probability 1 − (1 − τ^r)^b at this index's (r=3, b=4) — the
    * S-curve whose inflection tells you which τ this banding actually
    * selects for. Reading precision against the S-curve is how the
    * signature width / band shape gets chosen ("measure, don't
    * guess" applied to the index's own operating point).
    *
    * Exactness: counts + one divide per row; the S-curve is plain
    * literal multiplication (τ·τ·τ, squared twice) — `pow` is not
    * correctly-rounded in either engine, explicit products are.
    *
    * Scale shape: the pair table is the capped candidate set; the τ
    * grid is a 9-element per-row explode (no join), and the output is
    * 9 rows at any corpus size.
    */
  def lshThresholdCalibration(s: SparkSession, dir: String,
                              cap: Int = 64): DataFrame = {
    import s.implicits._
    minhashAccuracy(s, dir, cap)
      .select($"est_jaccard", $"true_jaccard",
        explode(expr("sequence(1, 9)")).as("i"))
      .withColumn("tau", $"i".cast("double") / 10.0)
      .groupBy($"i", $"tau")
      .agg(count(lit(1)).as("n_candidates"),
        sum(($"est_jaccard" >= $"tau").cast("long")).as("n_est_ge"),
        sum(($"true_jaccard" >= $"tau").cast("long")).as("n_true_ge"),
        sum(($"est_jaccard" >= $"tau" && $"true_jaccard" >= $"tau")
          .cast("long")).as("n_both_ge"))
      .withColumn("precision",
        when($"n_est_ge" > 0,
          $"n_both_ge".cast("double") / $"n_est_ge".cast("double")))
      .withColumn("collision_prob", expr(
        "1.0 - ((1.0 - tau*tau*tau) * (1.0 - tau*tau*tau)) * " +
          "((1.0 - tau*tau*tau) * (1.0 - tau*tau*tau))"))
      .select($"tau", $"n_candidates", $"n_est_ge", $"n_true_ge",
        $"n_both_ge", $"precision", $"collision_prob")
      .orderBy($"tau")
  }

  /** d23 — cluster-tightness audit: the methodological check on the
    * d11/d19 clustering family. Connected components is SINGLE-LINKAGE
    * clustering, and single linkage chains: A≈B and B≈C put A and C in
    * one cluster even when A and C share nothing — a dedup campaign
    * that keeps one representative per cluster then silently drops
    * documents that were never near-duplicates of the kept one. This
    * audit measures that risk per cluster: the candidate-edge count,
    * the WEAKEST edge's true Jaccard (recounted from the token
    * inverted index, the d18 discipline — est-Jaccard would audit the
    * sketch with the sketch), and which edge it is. A cluster whose
    * min_jaccard is far below the campaign threshold is a chained
    * cluster — split it (or verify-before-cluster) before shipping the
    * d19 report.
    *
    * Scale shape: the LSH pair list materializes once (it must — the
    * CC loop checkpoints it anyway) and feeds both the true-Jaccard
    * recount and the labeling; pair shuffles carry three longs (d18's
    * inverted-index probe, no token arrays); the weakest-edge pick is
    * a rank-1 window partitioned by cluster over EDGE rows; output is
    * cluster-count rows.
    */
  def clusterTightness(s: SparkSession, dir: String, cap: Int = 64): DataFrame = {
    import s.implicits._
    val docs = documents(s, dir)
    val tokIdx = CorpusIndexes.tokens(s, dir)
    // The labeling comes from the shared session sidecar (identical
    // pair generator as d11); the edge list feeds only the Jaccard
    // recount here, so one lazy derivation suffices — its band index
    // is itself the cached sidecar.
    val edges = cappedPairsUnsorted(s, dir, cap)
    val pairCounts = edges
      .join(tokIdx.toDF("doc_a", "th"), Seq("doc_a"))
      .join(tokIdx.toDF("doc_b", "th").withColumn("hit", lit(1L)),
            Seq("doc_b", "th"), "left")
      .groupBy($"doc_a", $"doc_b").agg(sum(coalesce($"hit", lit(0L))).as("inter"))
    val meta = docs.select($"doc_id",
      size(token_hashes($"text")).cast("long").as("ntok"))
    val tj = pairCounts
      .join(meta.toDF("doc_a", "na"), Seq("doc_a"))
      .join(meta.toDF("doc_b", "nb"), Seq("doc_b"))
      .select($"doc_a", $"doc_b",
        ($"inter".cast("double") / ($"na" + $"nb" - $"inter")).as("true_jaccard"))
    val labels = dupClusterLabels(s, dir, cap)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"cluster_id").orderBy($"true_jaccard".asc, $"doc_a", $"doc_b")
    tj.join(labels.toDF("doc_a", "cluster_id"), Seq("doc_a"))
      .withColumn("r", row_number().over(w))
      .groupBy($"cluster_id")
      .agg(count(lit(1)).as("n_edges"),
        min($"true_jaccard").as("min_jaccard"),
        max(when($"r" === 1, $"doc_a")).as("weak_a"),
        max(when($"r" === 1, $"doc_b")).as("weak_b"))
      .join(labels.groupBy($"cluster_id").agg(count(lit(1)).as("n_members")),
        Seq("cluster_id"))
      .select($"cluster_id", $"n_members", $"n_edges", $"min_jaccard",
        $"weak_a", $"weak_b")
      .orderBy($"cluster_id")
  }

  /** Semantic dedup (SemDeDup-style): embeddings are clustered by the
    * coarse IVF codebook shared with s04 (`Similarity.ivfAssigned` — a
    * KB-sized broadcast argmax, no shuffle), and WITHIN each cell a
    * vector is pruned when an earlier-id cell-mate is semantically
    * close (cos ≥ 0.35); the reported `kept_by` is the closest such
    * mate (cos desc, id tiebreak). This is the one-pass greedy form:
    * `kept_by` may itself be pruned (chains collapse transitively —
    * d11/d13 are the clustering forms that resolve that); production
    * SemDeDup works the same way per cluster.
    *
    * Scale shape at 100 TB: the pair join is an equi-join on cell_id —
    * 1/K of the corpus per probe in expectation, never all-pairs — and
    * the per-vector winner is a rank-1 window partitioned by vec_id.
    * Cell skew is bounded by the codebook (a real deployment k-means
    * re-trains when a cell grows hot; the df-cap of d12 is the same
    * discipline). Both self-join branches are identical exchanges, so
    * ReusedExchange evaluates the assignment pipeline once.
    */
  def semanticPrune(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assigned = Similarity.ivfAssigned(s, dir)
    val a = assigned.toDF("vec_id", "emb", "nrm", "cell_id")
    val b = assigned.toDF("kept_by", "emb_k", "nrm_k", "cell_k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"vec_id").orderBy($"cos".desc, $"kept_by")
    a.join(b.hint("merge"), $"cell_id" === $"cell_k" && $"kept_by" < $"vec_id")
      .withColumn("cos", cosinePrenormed(vec_dot($"emb", $"emb_k"), $"nrm", $"nrm_k"))
      .filter($"cos" >= 0.35)
      .withColumn("r", row_number().over(w))
      .filter($"r" === 1)
      .select($"vec_id", $"kept_by", $"cell_id", $"cos")
      .orderBy($"vec_id")
  }

  /** d43 — BUCKET-CAP ABLATION: the d33 shape applied to the OTHER
    * dedup knob — the LSH bucket cap. cap=64 is the campaign setting
    * (bands with ≤64 members generate pairs); cap=16 is the
    * aggressive-skew setting a 100 TB run might pick to bound join
    * fan-out. Since the cap-16 pair set is a subset of cap-64's,
    * every cap-16 cluster nests inside a cap-64 cluster; the audit
    * reports, per cap-64 cluster, how many cap-16 groups it
    * fragments into (docs that only pair under the looser cap count
    * as their own singleton) — the recall you BUY by accepting
    * bigger buckets, measured before committing the fan-out.
    *
    * Scale shape: both labelings ride the shared band sidecar (the
    * cap filter re-derives from the same raw band rows); the diff is
    * a labels-only join + cluster-sized aggregate, exactly d33's
    * cost shape with cap in place of τ.
    */
  def capAblation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hi = dupClusterLabels(s, dir, 64).toDF("doc_id", "c64")
    val lo = dupClusterLabels(s, dir, 16).toDF("doc_id", "c16")
    hi.join(lo, Seq("doc_id"), "left")
      .withColumn("lo_group", coalesce($"c16", $"doc_id"))
      .groupBy($"c64")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"lo_group").as("n_lo_groups"))
      .withColumn("splits_at_cap16", $"n_lo_groups" > 1)
      .orderBy($"c64")
  }

  /** The shared DuckDB MinHash/band prefix (tk/mh/sig/bands) every
    * label-replay oracle composes — ONE copy, so a hash-constant
    * tweak cannot diverge the d30/d42/d43 replays.
    */
  private val minhashBandsSql: String = s"""
        tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\\s+'),
                 t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT)) AS th
               FROM documents),
        mh AS (SELECT doc_id, i,
                 list_min(list_transform(th, h -> ((2*i + 1) * h + 40503 * i) % 2147483647)) AS m
               FROM tk, (SELECT unnest(generate_series(0, 11)) AS i) ii),
        sig AS (SELECT doc_id, list(m ORDER BY i) AS sig FROM mh GROUP BY doc_id),
        bands AS (SELECT doc_id, j,
                    ((sig[3*j+1] * 31 + sig[3*j+2]) % 2147483647 * 31 + sig[3*j+3]) % 2147483647 AS bkey
                  FROM sig, (SELECT unnest(generate_series(0, 3)) AS j) jj)"""

  /** The capped PAIR prefix of the chain (small/inb/pairs) — shared by
    * the CC label replays and d44's PageRank replay so the candidate
    * graph can never diverge between them.
    */
  private def pairsChainSql(tag: String, cap: Int): String = s"""
        small$tag AS (SELECT j, bkey FROM bands GROUP BY j, bkey
                  HAVING count(*) <= $cap AND count(*) > 1),
        inb$tag AS (SELECT b.* FROM bands b
                JOIN small$tag s ON b.j = s.j AND b.bkey = s.bkey),
        pairs$tag AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                  FROM inb$tag a JOIN inb$tag b
                  ON a.j = b.j AND a.bkey = b.bkey AND a.doc_id < b.doc_id)"""

  /** One capped pair→CC chain over `bands` (small/inb/pairs/edges/
    * walk/lab, CTE names suffixed by `tag`) — the d30 walk,
    * parameterized by the bucket cap.
    */
  private def ccChainSql(tag: String, cap: Int): String =
    pairsChainSql(tag, cap) + s""",
        edges$tag AS (SELECT doc_a AS src, doc_b AS dst FROM pairs$tag
                  UNION ALL SELECT doc_b, doc_a FROM pairs$tag),
        walk$tag(node, lbl) AS (
          SELECT src, src FROM edges$tag
          UNION
          SELECT e.dst, w.lbl FROM walk$tag w JOIN edges$tag e ON e.src = w.node),
        lab$tag AS (SELECT node AS doc_id, min(lbl) AS cluster_id
                FROM walk$tag GROUP BY node)"""

  /** `WITH RECURSIVE` body reproducing [[dupClusterLabels]] at the
    * campaign cap (unsuffixed CTE names, ending with `lab`) — the
    * single shared prefix of the d30/d42 oracles.
    */
  private[graft] val ccLabelReplaySql: String =
    minhashBandsSql + "," + ccChainSql("", 64)

  /** Plain-`WITH` body reproducing the capped candidate PAIR graph
    * (ending with `pairs`, no recursive CTE) — d44's replay prefix.
    */
  private[graft] val pairsReplaySql: String =
    minhashBandsSql + "," + pairsChainSql("", 64)

  /** Shared `WITH`-body of the d25 admission replay: the three dedup
    * signals (exact md5 / capped MinHash-LSH / banded SimHash) of the
    * % 5 arrival slice against the % 5 ≠ 0 history, the t02 quality
    * score, and the benchmark-gram decontamination probe — CTE list
    * ending with `dirty` (consumers append their own SELECT over
    * `q`/`merged`/`dirty`). d25's oracle and the c02 ingest-campaign
    * oracle compose it, so the gate replay can never drift between
    * them.
    */
  private[graft] val admissionReplaySql: String = """nh AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 5 = 0),
        hh AS (SELECT doc_id AS hist_doc, md5(text) AS h FROM documents WHERE doc_id % 5 <> 0),
        exact AS (SELECT nh.doc_id, min(hh.hist_doc) AS exact_match
                  FROM nh JOIN hh ON nh.h = hh.h GROUP BY nh.doc_id),
        tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
                 t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT)) AS th
               FROM documents),
        mh AS (SELECT doc_id, i,
                 list_min(list_transform(th, h -> ((2*i + 1) * h + 40503 * i) % 2147483647)) AS m
               FROM tk, (SELECT unnest(generate_series(0, 11)) AS i) ii),
        sig AS (SELECT doc_id, list(m ORDER BY i) AS sig FROM mh GROUP BY doc_id),
        bands AS (SELECT doc_id, j,
                    ((sig[3*j+1] * 31 + sig[3*j+2]) % 2147483647 * 31 + sig[3*j+3]) % 2147483647 AS bkey
                  FROM sig, (SELECT unnest(generate_series(0, 3)) AS j) jj),
        hb AS (SELECT j, bkey, doc_id AS hist_doc FROM bands WHERE doc_id % 5 <> 0),
        smallh AS (SELECT j, bkey FROM hb GROUP BY j, bkey HAVING count(*) <= 64),
        near AS (SELECT nb.doc_id, min(hb.hist_doc) AS near_match
                 FROM bands nb
                 JOIN hb ON nb.j = hb.j AND nb.bkey = hb.bkey
                 JOIN smallh sm ON hb.j = sm.j AND hb.bkey = sm.bkey
                 WHERE nb.doc_id % 5 = 0 GROUP BY nb.doc_id),
        tc AS (SELECT doc_id, tok, count(*) AS cnt FROM (
                 SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
                 FROM documents) x GROUP BY doc_id, tok),
        sh0 AS (SELECT doc_id, cnt, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM tc),
        sb AS (SELECT doc_id, i, sum(CASE WHEN (h >> i) & 1 = 1 THEN cnt ELSE -cnt END) AS w
               FROM sh0, (SELECT unnest(generate_series(0, 59)) AS i) ii GROUP BY doc_id, i),
        sh AS (SELECT doc_id, CAST(sum(CASE WHEN w >= 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
               FROM sb GROUP BY doc_id),
        sbands AS (SELECT doc_id, simhash, j, (simhash >> (15 * j)) & 32767 AS bv
                   FROM sh, (SELECT unnest(generate_series(0, 3)) AS j) jj),
        simm AS (SELECT a.doc_id, min(b.doc_id) AS sim_match
                 FROM sbands a JOIN sbands b ON a.j = b.j AND a.bv = b.bv
                 WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
                   AND bit_count(xor(a.simhash, b.simhash)) <= 8
                 GROUP BY a.doc_id),
        merged AS (SELECT COALESCE(e.doc_id, n.doc_id, s.doc_id) AS doc_id,
                     e.exact_match, n.near_match, s.sim_match
                   FROM exact e
                   FULL OUTER JOIN near n ON e.doc_id = n.doc_id
                   FULL OUTER JOIN simm s ON COALESCE(e.doc_id, n.doc_id) = s.doc_id),
        q AS (SELECT doc_id,
                0.4 * (1.0 - CAST(len(list_filter(t, c -> c = 'a' OR c = 'the')) AS DOUBLE) / len(t))
                  + 0.3 * (CAST(len(list_distinct(t)) AS DOUBLE) / len(t))
                  + 0.3 * least(len(t) / 50.0, 1.0) AS quality
              FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t
                    FROM documents WHERE doc_id % 5 = 0) b),
        grams AS (SELECT doc_id, list_distinct(list_transform(
                    generate_series(1, len(th) - 3),
                    i -> ((((((th[i]) * 31 + th[i+1]) % 2147483647) * 31 + th[i+2]) % 2147483647) * 31 + th[i+3]) % 2147483647)) AS gs
                  FROM tk WHERE len(th) >= 4),
        bg AS (SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 97 = 0),
        dirty AS (SELECT DISTINCT doc_id FROM
                    (SELECT doc_id, unnest(gs) AS g FROM grams
                     WHERE doc_id % 5 = 0) c
                  JOIN bg ON c.g = bg.g)"""

  /** d44 — PAGERANK over the capped near-dup candidate graph: which
    * implicated document is the most CENTRAL carrier of its duplicated
    * content? CC (d11) answers membership; the quality argmax (d27)
    * answers which member to keep; PageRank answers a third question
    * the first two can't — how concentrated a cluster's connectivity
    * is (a chain of pairwise-similar docs and a hub-and-spokes
    * template farm have identical labels but opposite rank profiles),
    * and it is THE canonical iterate-until-fixpoint graph workload a
    * Spark engine must express beyond connected components. 10 fixed
    * power iterations of r'(v) = 0.15/N + 0.85·Σ_{u→v} r(u)/deg(u)
    * over the undirected pair graph (no dangling mass: every node of
    * a pair graph has degree ≥ 1).
    *
    * Determinism: per-target contributions fold in SOURCE order (the
    * t20 sorted-struct fold; (src, dst) pairs are DISTINCT so the key
    * is unique), each contribution is ONE IEEE divide, the damping
    * update is a fixed literal expression, and the driver-computed
    * 1/N and 0.15/N literals are the same IEEE divides DuckDB replays.
    *
    * Scale shape: the edge list is the capped LSH candidate graph —
    * per-node degree is STRUCTURALLY bounded by cap × bands (256), so
    * every per-target fold buffer is ≤ 256 entries whatever the
    * corpus, and each iteration is ONE shuffle of the edge list on
    * dst joined to the rank table (AQE broadcasts the rank side when
    * small). The edge list materializes once (localCheckpoint; at
    * campaign scale: the persisted band sidecar's pair join) and all
    * ten iterations reuse it. The oracle replays the identical ten
    * stages as chained MATERIALIZED CTEs (the t43 loop convention).
    */
  def dupPagerank(s: SparkSession, dir: String, iters: Int = 10): DataFrame =
    pagerankOverPairs(cappedPairsUnsorted(s, dir, 64), iters)

  /** [[dupPagerank]] over an explicit DISTINCT (doc_a, doc_b) pair
    * frame — the synthetic-graph spec seam.
    */
  private[graft] def pagerankOverPairs(pairs: DataFrame, iters: Int): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val edges0 = pairs.select($"doc_a".as("src"), $"doc_b".as("doc_id"))
      .union(pairs.select($"doc_b".as("src"), $"doc_a".as("doc_id")))
    val deg = edges0.groupBy($"src").agg(count(lit(1)).as("deg"))
    val edges = edges0.join(deg, Seq("src")).localCheckpoint()
    val n = edges.select($"src").distinct().count()
    var r = edges.select($"src".as("node")).distinct()
      .withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iters) {
      r = edges.join(r, $"src" === $"node")
        .select($"doc_id", $"src", ($"rank" / $"deg".cast("double")).as("contrib"))
        .groupBy($"doc_id")
        .agg(expr("aggregate(transform(sort_array(collect_list(struct(src, contrib))), x -> x.contrib), 0D, (a, x) -> a + x)").as("s"))
        .select($"doc_id".as("node"), (lit(0.15 / n) + lit(0.85) * $"s").as("rank"))
      // The d11 iterate-to-fixpoint convention: truncate the rank
      // table's lineage every 5 rounds, else the nested join depth
      // grows one per iteration and Catalyst analysis cost grows
      // superlinearly with it (values are unchanged — the checkpoint
      // materializes the same doubles). The final round skips it: the
      // consumer below reads r once.
      if (i % 5 == 0 && i < iters) r = r.localCheckpoint()
    }
    // Final degree read from the CHECKPOINTED edge list (deg's own
    // lineage would re-run the whole capped pair generation).
    val degC = edges.groupBy($"src").agg(max($"deg").as("deg"))
    r.join(degC, $"node" === $"src")
      .select($"node".as("doc_id"), $"deg".cast("long").as("degree"), $"rank")
      .orderBy($"doc_id")
  }

  /** The DuckDB replay of [[dupPagerank]]: the shared pair prefix,
    * then `iters` chained MATERIALIZED rank stages with the identical
    * source-ordered fold and damping literals.
    */
  private[graft] def pagerankOracle(iters: Int): String = {
    val sb = new StringBuilder
    sb ++= "WITH\n" + pairsReplaySql + """,
        pedges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
                  UNION ALL SELECT doc_b, doc_a FROM pairs),
        pdeg AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS deg
                FROM pedges GROUP BY src),
        pn AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS n FROM pedges),
        pe AS MATERIALIZED (SELECT e.src, e.dst, d.deg
              FROM pedges e JOIN pdeg d USING (src)),
        pr0 AS (SELECT DISTINCT src AS node, 1.0 / CAST(pn.n AS DOUBLE) AS rank
                FROM pedges CROSS JOIN pn)"""
    for (k <- 1 to iters) {
      sb ++= s""",
        pr$k AS MATERIALIZED (
          SELECT e.dst AS node,
            0.15 / CAST(pn.n AS DOUBLE) + 0.85 * list_reduce(
              list(r.rank / CAST(e.deg AS DOUBLE) ORDER BY e.src),
              (a, b) -> a + b) AS rank
          FROM pe e JOIN pr${k - 1} r ON r.node = e.src CROSS JOIN pn
          GROUP BY e.dst, pn.n)"""
    }
    sb ++= s"""
        SELECT r.node AS doc_id, d.deg AS degree, r.rank
        FROM pr$iters r JOIN pdeg d ON d.src = r.node
        ORDER BY doc_id"""
    sb.toString
  }

  /** d45 — LABEL-PROPAGATION COMMUNITIES over the capped near-dup
    * candidate graph: d44's natural sibling and the third graph
    * question — CC (d11) answers reachability, PageRank (d44) answers
    * centrality, label propagation answers COHESION: a CC component
    * that chains two template farms through one bridge pair is ONE
    * cluster to d11 but TWO communities here, because each node adopts
    * the label held by the MAJORITY of its neighbors and the bridge
    * cannot outvote either side. GraphFrames-free: `iters` rounds of
    * synchronous LP composed as plain joins/aggregates in one plan.
    *
    * Determinism (the known LP pitfall, closed): every tie — equal
    * neighbor-label counts, and the init — resolves to the SMALLEST
    * label, and the update is fully synchronous (labels(t+1) reads
    * labels(t) only), so the result is a pure function of the edge
    * set; a fixed iteration count makes oscillating structures (pure
    * bipartite cores flip under synchronous LP) well-defined as the
    * round-`iters` snapshot, the d44 fixed-depth convention. The
    * whole computation is INTEGER-only: per-(node, label) counts, a
    * max, a min — no floats anywhere, so the oracle replay is exact
    * by construction.
    *
    * Scale shape: the edge list is the capped LSH candidate graph
    * (degree structurally ≤ cap × bands), materialized once and
    * reused by all rounds; each round is two key-local aggregates
    * (count per (dst, label) → max per dst) plus one equi-join back —
    * three shuffles on node keys, never a collect, never a window;
    * the rank table localCheckpoints every 5 rounds (the d11/d44
    * lineage discipline). The oracle replays the identical rounds as
    * chained MATERIALIZED CTEs (the t43 loop convention).
    */
  def dupCommunities(s: SparkSession, dir: String, iters: Int = 6): DataFrame =
    labelPropOverPairs(cappedPairsUnsorted(s, dir, 64), iters)

  /** [[dupCommunities]] over an explicit DISTINCT (doc_a, doc_b) pair
    * frame — the synthetic-graph spec seam.
    */
  private[graft] def labelPropOverPairs(pairs: DataFrame, iters: Int): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val edges = pairs.select($"doc_a".as("src"), $"doc_b".as("dst"))
      .union(pairs.select($"doc_b".as("src"), $"doc_a".as("dst")))
      .localCheckpoint()
    var lab = edges.select($"src".as("node")).distinct()
      .withColumn("lbl", $"node")
    for (i <- 1 to iters) {
      val cnt = edges.join(lab, $"src" === $"node")
        .groupBy($"dst", $"lbl").agg(count(lit(1)).as("c"))
      // argmax-by-struct: max(struct(c, -lbl)) is lexicographic —
      // highest count, then LOWEST label (labels are non-negative doc
      // ids, so negation orders ties correctly) — the same verdict as
      // a max-count filter + min-label re-aggregate, in ONE aggregate:
      // two shuffles per round instead of three (no join-back), and
      // the per-group state is one (c, lbl) pair. Integer-exact, so
      // the oracle's equivalent max+min-join replay matches on values.
      lab = cnt.groupBy($"dst")
        .agg(max(struct($"c", (-$"lbl").as("nl"))).as("m"))
        .select($"dst".as("node"), (-$"m.nl").as("lbl"))
      if (i % 5 == 0 && i < iters) lab = lab.localCheckpoint()
    }
    val sizes = lab.groupBy($"lbl").agg(count(lit(1)).as("n_members"))
    lab.join(sizes, Seq("lbl"))
      .select($"node".as("doc_id"), $"lbl".as("community"), $"n_members")
      .orderBy($"doc_id")
  }

  /** The DuckDB replay of [[dupCommunities]]: the shared pair prefix,
    * then `iters` chained MATERIALIZED count→max→min rounds — all
    * integer aggregates, exact in any engine.
    */
  private[graft] def labelPropOracle(iters: Int): String = {
    val sb = new StringBuilder
    sb ++= "WITH\n" + pairsReplaySql + """,
        le AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
                  UNION ALL SELECT doc_b, doc_a FROM pairs),
        lp0 AS (SELECT DISTINCT src AS node, src AS lbl FROM le)"""
    for (k <- 1 to iters) {
      sb ++= s""",
        cnt$k AS MATERIALIZED (
          SELECT e.dst AS node, l.lbl, CAST(count(*) AS BIGINT) AS c
          FROM le e JOIN lp${k - 1} l ON l.node = e.src
          GROUP BY e.dst, l.lbl),
        lp$k AS MATERIALIZED (
          SELECT c.node, min(c.lbl) AS lbl
          FROM cnt$k c JOIN (SELECT node, max(c) AS mc FROM cnt$k
                             GROUP BY node) m
            ON c.node = m.node AND c.c = m.mc
          GROUP BY c.node)"""
    }
    sb ++= s"""
        SELECT l.node AS doc_id, l.lbl AS community, z.n_members
        FROM lp$iters l JOIN (SELECT lbl, CAST(count(*) AS BIGINT) AS n_members
                              FROM lp$iters GROUP BY lbl) z ON z.lbl = l.lbl
        ORDER BY doc_id"""
    sb.toString
  }

  /** DuckDB replay of [[capAblation]]: one shared MinHash/band prefix,
    * two capped pair→CC chains (the d30 walk, parameterized by cap),
    * the same labels-only rollup.
    */
  private[graft] val capAblationOracle: String = s"""
        WITH RECURSIVE
        $minhashBandsSql,
        ${ccChainSql("64", 64)},
        ${ccChainSql("16", 16)}
        SELECT h.cluster_id AS c64, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(count(DISTINCT coalesce(l.cluster_id, h.doc_id)) AS BIGINT)
            AS n_lo_groups,
          count(DISTINCT coalesce(l.cluster_id, h.doc_id)) > 1 AS splits_at_cap16
        FROM lab64 h LEFT JOIN lab16 l ON h.doc_id = l.doc_id
        GROUP BY h.cluster_id ORDER BY c64"""

  /** d42 — SYNDICATION AUDIT: d11's duplicate clusters cross-tabbed
    * against the SOURCE column — is near-duplication intra-source
    * (a crawler re-fetching its own site) or cross-source (mirrors /
    * syndication networks)? The distinction drives different fixes
    * (crawl dedup config vs a domain-level blocklist), so the
    * campaign report splits on it: per duplicate cluster, member
    * count, distinct sources touched, the representative's source,
    * and the `cross_source` verdict. d30 sums SAVINGS by source; this
    * answers WHERE the duplication topology lives.
    *
    * Scale shape: rides the shared dupClusterLabels sidecar (no new
    * corpus pass); one narrow join against (doc_id, source) and a
    * cluster-sized aggregate with a SINGLE distinct (no Expand).
    * min_by picks the representative's source without a second join
    * back (the label IS the member minimum, InvariantSpec-proven, so
    * min_by(source, doc_id) is the kept doc's source).
    */
  def syndicationAudit(s: SparkSession, dir: String, cap: Int = 64): DataFrame = {
    import s.implicits._
    dupClusterLabels(s, dir, cap)
      .join(documents(s, dir).select($"doc_id", $"source"), Seq("doc_id"))
      .groupBy($"cluster_id")
      .agg(count(lit(1)).as("n_members"),
        countDistinct($"source").as("n_sources"),
        expr("min_by(source, doc_id)").as("kept_source"))
      .filter($"n_members" >= 2)
      .withColumn("cross_source", $"n_sources" >= 2)
      .orderBy($"cluster_id")
  }

  /** d46 — TAKEDOWN IMPACT AUDIT: the report a compliance run ships
    * BEFORE executing a delete wave against the dedup index (the
    * [[deleteFromTextProbeIndex]] lifecycle): over the capped LSH
    * candidate graph, how many near-dup pairs the wave drops, and —
    * the number the lifecycle exists for — how many surviving docs
    * are RELEASED (every one of their dup partners is taken down, so
    * the veto that suppressed them ends and they re-enter selection).
    * The takedown wave is the doc_id % 7 = 2 fixture (a realized
    * released arm at every SF).
    *
    * One verdict row, all exact BIGINTs, with the conservation
    * invariant the oracle hash enforces: n_dup_docs_before =
    * n_dead_docs + n_released + n_dup_docs_after.
    *
    * Scale shape: the pair graph is the shared capped generator
    * (degree ≤ cap × bands); the doc-level arm is one groupBy over
    * the symmetrized pairs, the pair-level arm one aggregate — two
    * one-row stat arms crossed into the single report row (the
    * q25/q39 corpus-stats class; whitelisted). The dead-set test is
    * ARITHMETIC on the id (the fixture stands in for a broadcast
    * tombstone list — batch-sized at any corpus scale).
    */
  def takedownAudit(s: SparkSession, dir: String, cap: Int = 64): DataFrame =
    takedownAuditOverPairs(cappedPairsUnsorted(s, dir, cap))

  /** [[takedownAudit]] over an explicit DISTINCT (doc_a, doc_b) pair
    * frame — the synthetic-graph spec seam (the d44/d45 convention).
    */
  private[graft] def takedownAuditOverPairs(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val pairAgg = pairs
      .withColumn("dropped",
        (($"doc_a" % 7 === 2) || ($"doc_b" % 7 === 2)).cast("long"))
      .agg(count(lit(1)).as("n_pairs"), sum($"dropped").as("n_pairs_dropped"))
      .withColumn("n_pairs_kept", $"n_pairs" - $"n_pairs_dropped")
    val half = pairs.select($"doc_a".as("doc"), $"doc_b".as("partner"))
      .union(pairs.select($"doc_b".as("doc"), $"doc_a".as("partner")))
    val docAgg = half
      .withColumn("doc_dead", $"doc" % 7 === 2)
      .withColumn("p_dead", ($"partner" % 7 === 2).cast("int"))
      .groupBy($"doc", $"doc_dead").agg(min($"p_dead").as("all_dead"))
      .agg(count(lit(1)).as("n_dup_docs_before"),
        sum(when($"doc_dead", 1L).otherwise(0L)).as("n_dead_docs"),
        sum(when(!$"doc_dead" && $"all_dead" === 1, 1L).otherwise(0L))
          .as("n_released"),
        sum(when(!$"doc_dead" && $"all_dead" === 0, 1L).otherwise(0L))
          .as("n_dup_docs_after"))
    pairAgg.crossJoin(docAgg)
      .select($"n_pairs", $"n_pairs_dropped", $"n_pairs_kept",
        $"n_dup_docs_before", $"n_dead_docs", $"n_released",
        $"n_dup_docs_after")
  }
}
