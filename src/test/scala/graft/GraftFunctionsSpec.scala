package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftFunctionsSpec extends AnyFunSuite {

  test("registered SQL functions: rule_ner and vec_dot work from SQL text") {
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    import spark.implicits._

    Seq("the spark table loves Spark").toDF("text").createOrReplaceTempView("v_texts")
    val entities = spark.sql(
      "SELECT entity FROM v_texts LATERAL VIEW explode(rule_ner(text)) AS entity")
      .collect().map(_.getString(0)).toSeq
    assert(entities == Seq("spark", "table", "Spark"))

    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("v_vecs")
    val dot = spark.sql("SELECT vec_dot(a, b) FROM v_vecs").head().getDouble(0)
    assert(dot == 11.0)
  }

  test("full SQL pipeline: the reference query shape in pure SQL") {
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    Tables.documents(spark, TestSpark.sfDir).createOrReplaceTempView("v_docs")
    val counts = spark.sql("""
      SELECT entity, count(1) AS n FROM v_docs
      LATERAL VIEW explode(rule_ner(text)) AS entity
      GROUP BY entity ORDER BY n DESC, entity""")
    val viaDf = graft.pipeline.EntityPipeline.entityCounts(spark, TestSpark.sfDir)
    assert(counts.collect().toSeq.map(r => (r.getString(0), r.getLong(1))) ==
           viaDf.collect().toSeq.map(r => (r.getString(0), r.getLong(1))))
  }

  test("native hash expressions are bit-identical to the HOF fold formulations") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.functions.TextHashes._
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sfDir)
      .select($"doc_id", $"text")

    // The pre-expression fold forms (see git history: Dedup.sigExpr,
    // bandsExpr, simhashExpr, shExpr; TextOps rolling fold) — kept here
    // verbatim as the executable spec of the hash math.
    val h32 = "cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint)"
    val th32 = s"transform(split(text, '\\\\s+'), t -> $h32)"
    val h60 = "cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)"
    val th60 = s"transform(split(text, '\\\\s+'), t -> $h60)"
    val sigExpr =
      s"aggregate($th32, array_repeat(cast(2147483647 as bigint), 12), " +
        "(acc, h) -> zip_with(acc, sequence(0, 11), " +
        "(m, i) -> least(m, ((2*i + 1) * h + 40503 * i) % 2147483647)))"
    val bandsExpr =
      s"aggregate($sigExpr, " +
        "named_struct('cnt', 0, 'cur', cast(0 as bigint), 'acc', cast(array() as array<bigint>)), " +
        "(a, m) -> named_struct(" +
        "'cnt', a.cnt + 1, " +
        "'cur', case when (a.cnt + 1) % 3 = 0 then cast(0 as bigint) " +
        "       else (a.cur * 31 + m) % 2147483647 end, " +
        "'acc', case when (a.cnt + 1) % 3 = 0 " +
        "       then array_append(a.acc, (a.cur * 31 + m) % 2147483647) else a.acc end), " +
        "a -> a.acc)"
    val simhashExpr =
      s"aggregate(aggregate($th60, array_repeat(cast(0 as bigint), 60), " +
        "(acc, h) -> zip_with(acc, sequence(0, 59), " +
        "(w, i) -> w + case when (h >> i) & 1 = 1 then 1 else -1 end)), " +
        "named_struct('i', 0, 'sh', cast(0 as bigint)), " +
        "(a, w) -> named_struct('i', a.i + 1, " +
        "'sh', a.sh + case when w >= 0 then shiftleft(cast(1 as bigint), a.i) " +
        "             else cast(0 as bigint) end), " +
        "a -> a.sh)"
    val shExpr =
      s"array_distinct(aggregate($th32, " +
        "named_struct('p2', cast(null as bigint), 'p1', cast(null as bigint), " +
        "'acc', cast(array() as array<bigint>)), " +
        "(a, h) -> named_struct('p2', a.p1, 'p1', h, " +
        "'acc', case when a.p2 is null then a.acc " +
        "       else array_append(a.acc, ((a.p2 * 31 + a.p1) % 2147483647 * 31 + h) % 2147483647) end), " +
        "a -> a.acc))"
    val rollExpr =
      s"aggregate($th32, cast(0 as bigint), (acc, h) -> (acc * 31 + h) % 2147483647)"

    val diff = docs.select($"doc_id",
        minhash_sig($"text").as("e_sig"), expr(sigExpr).as("f_sig"),
        minhash_bands($"text").as("e_bands"), expr(bandsExpr).as("f_bands"),
        simhash60($"text").as("e_sim"), expr(simhashExpr).as("f_sim"),
        shingle_hashes($"text").as("e_sh"), expr(shExpr).as("f_sh"),
        rolling_hash($"text").as("e_roll"), expr(rollExpr).as("f_roll"))
      .filter($"e_sig" =!= $"f_sig" || $"e_bands" =!= $"f_bands" ||
              $"e_sim" =!= $"f_sim" || $"e_sh" =!= $"f_sh" ||
              $"e_roll" =!= $"f_roll")
    assert(diff.count() == 0)

    // And the SQL registration exposes the same values.
    GraftFunctions.register(spark)
    docs.limit(5).createOrReplaceTempView("v_hash_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, simhash60(text) AS sh, rolling_hash(text) AS rh FROM v_hash_docs")
    val viaCol = docs.limit(5).select($"doc_id",
      simhash60($"text").as("sh"), rolling_hash($"text").as("rh"))
    assert(viaSql.except(viaCol).count() == 0)
  }

  test("platform_ln is SQL-callable and equal to Math.log, not builtin ln everywhere") {
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    // a value where StrictMath.log and Math.log may differ by 1 ULP is
    // platform-dependent; the hard contract is Math.log equality
    val rows = spark.sql(
      "SELECT x, platform_ln(x) AS pl FROM VALUES (0.3D), (2.5D), (123.456D) AS t(x)")
      .collect()
    rows.foreach(r => assert(r.getDouble(1) == Math.log(r.getDouble(0))))
  }

  test("platform_ln matches Math.log bit-for-bit over the corpus vocabulary") {
    // The t20/t26/t13/t22/t24 oracle contract in executable form: the
    // engine's ln IS the platform libm on the DATA-DEPENDENT argument
    // set those queries feed it (the unigram probability ratios of the
    // corpus vocabulary — the set where StrictMath diverges by 1 ULP on
    // ~4 % of arguments). A JDK bump that changes libm fails HERE, by
    // name, instead of surfacing as an unexplained oracle hash mismatch.
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tf = graft.Tables.documents(spark, TestSpark.sfDir)
      .select(explode(split($"text", "\\s+")).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("cnt"))
    val tot = tf.agg(sum($"cnt").as("total"))
    val rows = tf.crossJoin(broadcast(tot))
      .select(($"cnt".cast("double") / $"total".cast("double")).as("p"),
        graft.functions.VectorFunctions.platform_ln(
          $"cnt".cast("double") / $"total".cast("double")).as("pl"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(Math.log(r.getDouble(0))),
        s"platform_ln(${r.getDouble(0)}) != Math.log — the JDK's libm changed; " +
          "every ln-consuming oracle (t13/t20/t22/t24/t26) is now at risk")
    }
  }

  test("platform_exp matches Math.exp bit-for-bit over the corpus entropy range") {
    // The t42 oracle contract: eff_vocab = exp(entropy) must be the
    // platform libm exp (DuckDB's), not StrictMath. Swept over the
    // data-dependent argument set (per-source entropies) plus a seeded
    // range sweep; SQL registration checked too.
    val spark = TestSpark.spark
    import spark.implicits._
    val hs = graft.ops.TextOps.sourceEntropy(spark, TestSpark.sfDir).collect()
      .map(_.getDouble(3))
    val rnd = new scala.util.Random(11)
    val args = hs ++ (0 until 500).map(_ => rnd.nextDouble() * 20.0 - 10.0)
    val rows = args.zipWithIndex.toSeq.map { case (x, i) => (i.toLong, x) }
      .toDF("id", "x")
      .select($"x",
        graft.functions.VectorFunctions.platform_exp($"x").as("pe"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(Math.exp(r.getDouble(0))),
        s"platform_exp(${r.getDouble(0)}) != Math.exp — t42's oracle is at risk")
    }
    graft.GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT platform_exp(CAST(1.5 AS DOUBLE)) AS e")
      .head().getDouble(0)
    assert(java.lang.Double.doubleToLongBits(viaSql) ==
      java.lang.Double.doubleToLongBits(Math.exp(1.5)))
  }

  test("native hash expressions match the folds on adversarial random strings") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.functions.TextHashes._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val atoms = Vector("word", "a", "Zed", "\u00e9t\u00e9", "x1", "", " ", "\t", "\n",
      "  ", "\u4e2d\u6587", "mixed-case", "UP", "1", "!?")
    val texts = (0 until 200).map { _ =>
      (0 until (1 + rnd.nextInt(30))).map(_ => atoms(rnd.nextInt(atoms.size))).mkString("")
    } :+ "" :+ " leading" :+ "trailing " :+ "\ttab\nnewline mix  runs"
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

    val h32 = "cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint)"
    val th32 = s"transform(split(text, '\\\\s+'), t -> $h32)"
    val h60 = "cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)"
    val th60 = s"transform(split(text, '\\\\s+'), t -> $h60)"
    val sigExpr =
      s"aggregate($th32, array_repeat(cast(2147483647 as bigint), 12), " +
        "(acc, h) -> zip_with(acc, sequence(0, 11), " +
        "(m, i) -> least(m, ((2*i + 1) * h + 40503 * i) % 2147483647)))"
    val simhashExpr =
      s"aggregate(aggregate($th60, array_repeat(cast(0 as bigint), 60), " +
        "(acc, h) -> zip_with(acc, sequence(0, 59), " +
        "(w, i) -> w + case when (h >> i) & 1 = 1 then 1 else -1 end)), " +
        "named_struct('i', 0, 'sh', cast(0 as bigint)), " +
        "(a, w) -> named_struct('i', a.i + 1, " +
        "'sh', a.sh + case when w >= 0 then shiftleft(cast(1 as bigint), a.i) " +
        "             else cast(0 as bigint) end), " +
        "a -> a.sh)"
    val shExpr =
      s"array_distinct(aggregate($th32, " +
        "named_struct('p2', cast(null as bigint), 'p1', cast(null as bigint), " +
        "'acc', cast(array() as array<bigint>)), " +
        "(a, h) -> named_struct('p2', a.p1, 'p1', h, " +
        "'acc', case when a.p2 is null then a.acc " +
        "       else array_append(a.acc, ((a.p2 * 31 + a.p1) % 2147483647 * 31 + h) % 2147483647) end), " +
        "a -> a.acc))"
    val rollExpr =
      s"aggregate($th32, cast(0 as bigint), (acc, h) -> (acc * 31 + h) % 2147483647)"

    val diff = docs.select($"doc_id",
        minhash_sig($"text").as("e1"), expr(sigExpr).as("f1"),
        simhash60($"text").as("e2"), expr(simhashExpr).as("f2"),
        shingle_hashes($"text").as("e3"), expr(shExpr).as("f3"),
        rolling_hash($"text").as("e4"), expr(rollExpr).as("f4"))
      .filter($"e1" =!= $"f1" || $"e2" =!= $"f2" || $"e3" =!= $"f3" || $"e4" =!= $"f4")
    val bad = diff.collect()
    assert(bad.isEmpty, bad.take(3).mkString("\n"))
  }

  test("ngram_hashes_all is positional; the distinct form loses positions past a dup") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.functions.TextHashes.{ngram_hashes, ngram_hashes_all}
    // "a b a b a b c" has repeated 2-grams: distinct list is shorter
    // and its insertion order diverges from positions after the dup
    val df = Seq((1L, "a b a b a b c")).toDF("doc_id", "text")
    val r = df.select(ngram_hashes_all($"text", 2).as("all"),
        ngram_hashes($"text", 2).as("dist"))
      .collect().head
    val all = r.getSeq[Long](0)
    val dist = r.getSeq[Long](1)
    assert(all.length == 6, "7 tokens -> 6 positional 2-grams")
    assert(dist.length == 3, "only 3 distinct 2-grams (ab, ba, bc)")
    assert(all.toSet == dist.toSet, "same gram value set")
    assert(all(0) == all(2) && all(1) == all(3), "positional form keeps dups")
  }
}
