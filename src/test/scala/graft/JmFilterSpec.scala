package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** t54's model contract on a witness corpus: the Jelinek-Mercer
  * interpolation separates unseen transitions by their continuation
  * word's frequency — exactly the signal t20/t26's add-one point
  * models flatten — and the OOV / unseen-context branches produce the
  * pinned exact values.
  *
  * Reference = 3 copies of [the cat sat on the mat]:
  * unigrams the=6 cat=3 sat=3 on=3 mat=3 (N=18, V=5, D=N+V+1=24);
  * bigrams (the,cat)(cat,sat)(sat,on)(on,the)(the,mat) each ×3;
  * contexts the=6 cat=3 sat=3 on=3.
  */
class JmFilterSpec extends AnyFunSuite {

  private def score(docs: Seq[(Long, Seq[String])]) = {
    val spark = TestSpark.spark
    import spark.implicits._
    val ref = Seq.fill(3)(Seq("the", "cat", "sat", "on", "the", "mat"))
      .toDF("t")
    TextOps.jmScored(ref, docs.toDF("doc_id", "t"))
      .select($"doc_id", $"n_bigrams", $"n_oov", $"avg_nll")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
  }

  test("JM separates unseen transitions that add-one scores identically") {
    // Both docs are one UNSEEN transition out of 'sat' (c_bg = 0), so
    // t26's add-one model gives BOTH the same mass 1/(c_sat + V) = 1/8
    // — it cannot rank them. JM interpolates the continuation unigram:
    // (sat,the) -> 0.3·P1(the), (sat,mat) -> 0.3·P1(mat), and the=6
    // vs mat=3 separates them.
    val out = score(Seq(1L -> Seq("sat", "the"), 2L -> Seq("sat", "mat")))
    // num/den exact integers: A = (7·0·24 + 3·(6+1)·3) / (10·3·24),
    // B = (3·(3+1)·3) / (10·3·24)
    val a = Math.log(720.0) - Math.log(63.0)
    val b = Math.log(720.0) - Math.log(36.0)
    assert(out(1L) == ((1L, 0L, a)))
    assert(out(2L) == ((1L, 0L, b)))
    assert(a < b, "the frequent continuation must score more probable")
  }

  test("OOV tokens map to <unk> and stay finite; n_oov counts them") {
    // (the, zebra): zebra is out-of-vocabulary -> w2 = '<unk>',
    // c_bg = 0, c_uni(<unk>) = 0 -> num = 3·1·6, den = 10·6·24.
    val out = score(Seq(3L -> Seq("the", "zebra")))
    assert(out(3L) == ((1L, 1L, Math.log(1440.0) - Math.log(18.0))))
  }

  test("an unseen context degrades to the unigram term alone") {
    // 'mat' never appears as a context in the reference (it only ends
    // sentences), so (mat, the) takes the c_w1 = 0 branch:
    // P = 0.3·(c_the+1)/D -> num = 3·7, den = 10·24.
    val out = score(Seq(4L -> Seq("mat", "the")))
    assert(out(4L) == ((1L, 0L, Math.log(240.0) - Math.log(21.0))))
  }

  test("sub-bigram docs are omitted; multi-bigram folds average") {
    val out = score(Seq(
      5L -> Seq("the"), // no bigrams -> omitted
      6L -> Seq("the", "cat", "sat"))) // two SEEN transitions
    assert(!out.contains(5L))
    // (the,cat): num = 7·3·24 + 3·4·6 = 576, den = 10·6·24 = 1440;
    // (cat,sat): num = 7·3·24 + 3·4·3 = 540, den = 10·3·24 = 720.
    // Fold in (w1,w2) order: (cat,sat) then (the,cat); 0D seed.
    val nll = 0.0 + (Math.log(720.0) - Math.log(540.0)) +
      (Math.log(1440.0) - Math.log(576.0))
    assert(out(6L) == ((2L, 0L, nll / 2.0)))
  }

  test("t54 keep bar is the quantized lower median: at least half keep, both verdicts realized") {
    // The registered bar is the first 1e-4 cell where 2·cum >= n —
    // rank ceil(n/2) over quantized scores, never an unbounded exact
    // percentile buffer and never a merge-order-sensitive sketch.
    val spark = TestSpark.spark
    import spark.implicits._
    val out = TextOps.jmQualityFilter(spark, TestSpark.sfDir)
      .select($"avg_nll", $"keep").collect()
    val n = out.length
    val kept = out.count(_.getBoolean(1))
    assert(kept * 2 >= n, s"lower median must keep >= half: $kept of $n")
    assert(kept < n, "both verdicts must be realized on the corpus")
    // keep is exactly the quantized-cell compare: every kept score's
    // cell <= every dropped score's cell, with strict separation at
    // the bar (no dropped doc shares a kept doc's cell).
    val keptMax = out.filter(_.getBoolean(1)).map(r => math.floor(r.getDouble(0) * 1e4)).max
    val dropMin = out.filterNot(_.getBoolean(1)).map(r => math.floor(r.getDouble(0) * 1e4)).min
    assert(keptMax < dropMin)
  }
}
