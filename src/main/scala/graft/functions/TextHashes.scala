package graft.functions

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup/fingerprint hash
  * pipelines: tokenize → md5 → MinHash signature / LSH band keys /
  * 60-bit SimHash / shingle hashes / rolling fingerprint, each as ONE
  * codegen-friendly call per row.
  *
  * Why not the higher-order-function folds (`aggregate`/`zip_with`)
  * these replaced: HOFs don't participate in whole-stage codegen — each
  * lambda step is an interpreted Catalyst eval with per-element boxing,
  * and the MinHash/SimHash folds do 12-60 lambda steps per token. That
  * interpretation overhead was the measured floor under every dedup
  * query (1-2 s per query at sf0.1). These expressions emit a single
  * static call into the generated code; the loop body is plain JVM code
  * the JIT compiles, with one thread-local MessageDigest per task
  * thread (U3's lazy-singleton discipline at the expression level).
  *
  * Bit-compatibility contract (enforced by GraftFunctionsSpec's
  * fold-equivalence tests and the DuckDB oracles): every value is
  * EXACTLY what the documented SQL computes —
  * tokens = split(text, '\s+') (Java regex, limit -1);
  * h32(t) = first 8 md5 hex chars base-16; h60(t) = first 15;
  * minhash_i = min over tokens of ((2i+1)·h32 + 40503·i) mod (2³¹−1);
  * band_j = ((m_3j·31 + m_3j+1) mod M ·31 + m_3j+2) mod M;
  * simhash60 bit i set iff Σ_tokens (±1 by h60 bit i) ≥ 0;
  * shingle = ((h32_k·31 + h32_k+1) mod M ·31 + h32_k+2) mod M, distinct
  * in first-occurrence order; rolling = fold (acc·31 + h32) mod M.
  */
object GraftHash {

  private val M = 2147483647L
  private val Ws = Pattern.compile("\\s+")

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 8 md5 hex chars as a long (== first 4 digest bytes,
    * big-endian unsigned).
    */
  private def h32(token: String): Long = {
    val d = digests.get()
    d.reset()
    val b = d.digest(token.getBytes("UTF-8"))
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) | ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }

  /** First 15 md5 hex chars as a long (60 bits: 7 bytes + high nibble
    * of the 8th).
    */
  private def h60(token: String): Long = {
    val d = digests.get()
    d.reset()
    val b = d.digest(token.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    (v << 4) | ((b(7) & 0xffL) >>> 4)
  }

  private def tokens(text: UTF8String): Array[String] =
    Ws.split(text.toString, -1)

  def minhashSig(text: UTF8String): ArrayData = {
    val ts = tokens(text)
    val sig = Array.fill(12)(M)
    var k = 0
    while (k < ts.length) {
      val h = h32(ts(k))
      var i = 0
      while (i < 12) {
        val v = ((2 * i + 1) * h + 40503L * i) % M
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      k += 1
    }
    new GenericArrayData(sig)
  }

  def minhashBands(text: UTF8String): ArrayData = {
    val sig = minhashSig(text).asInstanceOf[GenericArrayData]
    val keys = new Array[Long](4)
    var j = 0
    while (j < 4) {
      val m0 = sig.getLong(3 * j)
      val m1 = sig.getLong(3 * j + 1)
      val m2 = sig.getLong(3 * j + 2)
      keys(j) = ((m0 * 31 + m1) % M * 31 + m2) % M
      j += 1
    }
    new GenericArrayData(keys)
  }

  def simhash60(text: UTF8String): Long = {
    val ts = tokens(text)
    val votes = new Array[Long](60)
    var k = 0
    while (k < ts.length) {
      val h = h60(ts(k))
      var i = 0
      while (i < 60) {
        votes(i) += (if (((h >> i) & 1L) == 1L) 1L else -1L)
        i += 1
      }
      k += 1
    }
    var sh = 0L
    var i = 0
    while (i < 60) {
      if (votes(i) >= 0) sh |= (1L << i)
      i += 1
    }
    sh
  }

  def shingleHashes(text: UTF8String): ArrayData = {
    val ts = tokens(text)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (ts.length >= 3) {
      val hs = new Array[Long](ts.length)
      var i = 0
      while (i < ts.length) { hs(i) = h32(ts(i)); i += 1 }
      var k = 2
      while (k < ts.length) {
        seen.add(((hs(k - 2) * 31 + hs(k - 1)) % M * 31 + hs(k)) % M)
        k += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Distinct token h32 hashes, first-occurrence order — the unigram
    * degenerate of [[shingleHashes]]: the token inverted-index key d18
    * recounts true Jaccard over (8-byte keys shuffle instead of token
    * strings or arrays; collisions fold tokens identically in the
    * oracle, which hashes the same way).
    */
  def tokenHashes(text: UTF8String): ArrayData = {
    val ts = tokens(text)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < ts.length) { seen.add(h32(ts(i))); i += 1 }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** Distinct polynomial hashes of every n-token window (the 3-gram
    * case is [[shingleHashes]]), first-occurrence order.
    */
  def ngramHashes(text: UTF8String, n: Int): ArrayData = {
    val ts = tokens(text)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (ts.length >= n) {
      val hs = new Array[Long](ts.length)
      var i = 0
      while (i < ts.length) { hs(i) = h32(ts(i)); i += 1 }
      var k = 0
      while (k + n <= ts.length) {
        var acc = 0L
        var j = 0
        while (j < n) { acc = (acc * 31 + hs(k + j)) % M; j += 1 }
        seen.add(acc)
        k += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** EVERY n-gram hash in positional order (no dedup) — index k in the
    * output IS token position k. [[ngramHashes]]' LinkedHashSet form is
    * right for membership probes, but its insertion order equals
    * positional order only for docs with no repeated gram — posexplode
    * over it silently shifts positions one past the first duplicate
    * (caught by the sf0.1 t34 sweep: 2 of 727 docs).
    */
  def ngramHashesAll(text: UTF8String, n: Int): ArrayData = {
    val ts = tokens(text)
    if (ts.length < n) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](ts.length)
    var i = 0
    while (i < ts.length) { hs(i) = h32(ts(i)); i += 1 }
    val out = new Array[Long](ts.length - n + 1)
    var k = 0
    while (k + n <= ts.length) {
      var acc = 0L
      var j = 0
      while (j < n) { acc = (acc * 31 + hs(k + j)) % M; j += 1 }
      out(k) = acc
      k += 1
    }
    new GenericArrayData(out)
  }

  def rollingHash(text: UTF8String): Long = {
    val ts = tokens(text)
    var acc = 0L
    var k = 0
    while (k < ts.length) {
      acc = (acc * 31 + h32(ts(k))) % M
      k += 1
    }
    acc
  }
}

/** One static call per row, inside whole-stage codegen. */
abstract class GraftHashExpr extends UnaryExpression {
  protected def staticCall: String
  override def nullSafeEval(t: Any): Any = evalImpl(t.asInstanceOf[UTF8String])
  protected def evalImpl(t: UTF8String): Any
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.$staticCall($c)")
}

case class MinHashSig(child: Expression) extends GraftHashExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def staticCall: String = "minhashSig"
  override protected def evalImpl(t: UTF8String): Any = GraftHash.minhashSig(t)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class MinHashBands(child: Expression) extends GraftHashExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def staticCall: String = "minhashBands"
  override protected def evalImpl(t: UTF8String): Any = GraftHash.minhashBands(t)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class SimHash60(child: Expression) extends GraftHashExpr {
  override def dataType: DataType = LongType
  override protected def staticCall: String = "simhash60"
  override protected def evalImpl(t: UTF8String): Any = GraftHash.simhash60(t)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class TokenHashes(child: Expression) extends GraftHashExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def staticCall: String = "tokenHashes"
  override protected def evalImpl(t: UTF8String): Any = GraftHash.tokenHashes(t)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class ShingleHashes(child: Expression) extends GraftHashExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def staticCall: String = "shingleHashes"
  override protected def evalImpl(t: UTF8String): Any = GraftHash.shingleHashes(t)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** n is a construction-time literal, so codegen emits a constant. */
case class NGramHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    GraftHash.ngramHashes(t.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.ngramHashes($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class NGramHashesAll(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    GraftHash.ngramHashesAll(t.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.ngramHashesAll($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class RollingHash(child: Expression) extends GraftHashExpr {
  override def dataType: DataType = LongType
  override protected def staticCall: String = "rollingHash"
  override protected def evalImpl(t: UTF8String): Any = GraftHash.rollingHash(t)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextHashes {
  private def col(e: Expression): Column = GraftBridge.column(e)
  def minhash_sig(c: Column): Column = col(MinHashSig(GraftBridge.expression(c)))
  def minhash_bands(c: Column): Column = col(MinHashBands(GraftBridge.expression(c)))
  def simhash60(c: Column): Column = col(SimHash60(GraftBridge.expression(c)))
  def shingle_hashes(c: Column): Column = col(ShingleHashes(GraftBridge.expression(c)))
  def token_hashes(c: Column): Column = col(TokenHashes(GraftBridge.expression(c)))
  def rolling_hash(c: Column): Column = col(RollingHash(GraftBridge.expression(c)))
  def ngram_hashes(c: Column, n: Int): Column = col(NGramHashes(GraftBridge.expression(c), n))
  def ngram_hashes_all(c: Column, n: Int): Column = col(NGramHashesAll(GraftBridge.expression(c), n))
}
