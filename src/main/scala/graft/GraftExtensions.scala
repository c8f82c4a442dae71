package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ArrayFilter, Coalesce, Expression, ExpressionInfo, In, LambdaFunction, Literal, NamedLambdaVariable, Or, RLike, StringSplit}
import org.apache.spark.sql.types.StringType

import graft.functions.{FloatVectorDot, MinHashBands, MinHashSig, PlatformExp, PlatformLn, RollingHash, ShingleHashes, SimHash60}
import graft.ner.RuleNer

/** SQL-surface registration for the engine's custom functions, so SQL
  * text can call them exactly like built-ins:
  *
  *   SELECT entity, count(1) FROM t
  *   LATERAL VIEW explode(rule_ner(text)) AS entity GROUP BY entity
  *
  *   SELECT vec_dot(a.embedding, b.embedding) FROM ...
  *
  * Two entry points, same builders:
  *  - [[GraftFunctions.register]] — imperative, for an existing session
  *    (what Verify/Bench/tests use);
  *  - [[GraftExtensions]] — the `spark.sql.extensions` route
  *    (`--conf spark.sql.extensions=graft.GraftExtensions`), the
  *    deployment-grade wiring for cluster jobs.
  */
object GraftFunctions {

  val vecDotBuilder: Seq[Expression] => Expression =
    exprs => FloatVectorDot(exprs(0), exprs(1))

  /** rule_ner(text) → array<string> — the U1 NER contract as a SQL
    * function: the same split → gazetteer∪capitalized filter as the
    * Column path, built as a raw Catalyst tree (a Column→Expression
    * bridge would embed unresolvable column nodes in the SQL plan).
    */
  val ruleNerBuilder: Seq[Expression] => Expression = { exprs =>
    val toks = StringSplit(Coalesce(Seq(exprs.head, Literal(""))), Literal("\\s+"), Literal(-1))
    val t = NamedLambdaVariable("t", StringType, nullable = true)
    val isEntity = Or(
      In(t, RuleNer.Gazetteer.map(Literal(_))),
      RLike(t, Literal(RuleNer.CapitalizedRe)))
    ArrayFilter(toks, LambdaFunction(isEntity, Seq(t)))
  }

  /** The text-hash expression family (TextHashes.scala), SQL-callable:
    * minhash_sig / minhash_bands / simhash60 / shingle_hashes /
    * rolling_hash, each a single codegen'd call over a string column.
    */
  val hashBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minhash_sig" -> (exprs => MinHashSig(exprs.head)),
    "minhash_bands" -> (exprs => MinHashBands(exprs.head)),
    "simhash60" -> (exprs => SimHash60(exprs.head)),
    "shingle_hashes" -> (exprs => ShingleHashes(exprs.head)),
    "rolling_hash" -> (exprs => RollingHash(exprs.head)),
    // platform-libm ln (vs the builtin ln's StrictMath) — what the
    // t22/t24/t26 oracle-exact float folds use; SQL-callable so SQL
    // text can reproduce them bit-for-bit too.
    "platform_ln" -> (exprs => PlatformLn(exprs.head)),
    "platform_exp" -> (exprs => PlatformExp(exprs.head)))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot", vecDotBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("rule_ner", ruleNerBuilder, "scala_udf")
    hashBuilders.foreach { case (n, b) => reg.createOrReplaceTempFunction(n, b, "scala_udf") }
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "vec_dot"),
      GraftFunctions.vecDotBuilder))
    e.injectFunction((
      FunctionIdentifier("rule_ner"),
      new ExpressionInfo(RuleNer.getClass.getName, "rule_ner"),
      GraftFunctions.ruleNerBuilder))
    GraftFunctions.hashBuilders.foreach { case (n, b) =>
      e.injectFunction((FunctionIdentifier(n),
        new ExpressionInfo(classOf[MinHashSig].getName, n), b))
    }
  }
}
