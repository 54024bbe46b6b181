package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the native expressions against the HOF forms they
  * replace, over RANDOM inputs (the NativeExprSpec equivalences run on
  * corpus data, which can't reach ragged/empty/adversarial shapes).
  * Raw ScalaCheck generators sampled deterministically (the shared
  * [[TestSpark.sample]]), one Spark job per property — the per-row
  * comparison happens on collected results.
  */
class NativeExprPropSpec extends AnyFunSuite {

  import TestSpark.{sample, spark}
  import spark.implicits._

  test("property: dot_l == HOF aggregate(zip_with) incl. ragged pairs") {
    graft.functions.DotProduct.register(spark)
    val arr = Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, Gen.choose(-1000L, 1000L)))
    val pairs = sample(Gen.zip(arr, arr), 300)
    val rows = pairs.toDF("a", "b").select(
      expr("dot_l(a, b)").as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1))
    }
  }

  test("property: dot_l == HOF under LEGACY arithmetic, with null elements") {
    // the wrapping branch of the mode split (the default-ANSI property
    // above exercises the checked branch): values stay bounded so the
    // two modes cannot diverge on overflow — what this pins is that the
    // legacy loop's null/ragged RESULTS match the HOF's, with NULL
    // ELEMENTS in the generator (the property above has none). The
    // builder captures the mode at analysis, so the whole select runs
    // inside the conf window.
    graft.functions.DotProduct.register(spark)
    val elem = org.scalacheck.Gen.frequency(
      9 -> Gen.choose(-1000L, 1000L).map(Option(_)),
      1 -> Gen.const(None: Option[Long]))
    val arr = Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, elem))
    val pairs = sample(Gen.zip(arr, arr), 300)
    graft.engine.Tables.withConf(spark, "spark.sql.ansi.enabled", "false") {
      val rows = pairs.toDF("a", "b").select(
        expr("dot_l(a, b)").as("native"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0L), (acc, v) => acc + v).as("hof"))
        .collect()
      rows.foreach { r =>
        assert(r.isNullAt(0) === r.isNullAt(1))
        if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1))
      }
    }
  }

  test("property: dot_d == HOF bit-exactly incl. ragged pairs") {
    graft.functions.DotProduct.register(spark)
    val arr = Gen.choose(0, 8)
      .flatMap(n => Gen.listOfN(n, Gen.choose(-10.0, 10.0)))
    val pairs = sample(Gen.zip(arr, arr), 300)
    val rows = pairs.toDF("a", "b").select(
      expr("dot_d(a, b)").as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("property: count_in == HOF size(filter(isin)) incl. empty arrays") {
    graft.functions.CountIn.register(spark)
    val stops = Seq("the", "a", "of")
    val word = Gen.oneOf("the", "a", "of", "and", "cat", "dog", "")
    val arr = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word))
    val rows = sample(arr, 300).map(Tuple1(_)).toDF("w").select(
      call_function("count_in", col("w"), typedlit(stops)).as("native"),
      size(filter(col("w"), t => t.isin(stops.map(lit): _*))).cast("long").as("hof"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("property: lsh_buckets == dot_d fold incl. ragged and null elements") {
    graft.functions.DotProduct.register(spark)
    val dim = 4
    val tables = 2
    val planes = 3
    def planeW(t: Int, p: Int): Seq[Double] =
      (0 until dim).map { d =>
        val h = new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(
          org.apache.spark.sql.catalyst.expressions.Literal(t),
          org.apache.spark.sql.catalyst.expressions.Literal(p),
          org.apache.spark.sql.catalyst.expressions.Literal(d)))
          .eval(null).asInstanceOf[Long]
        if (math.floorMod(h, 2L) == 0L) 1.0 else -1.0
      }
    def bucketFor(t: Int) =
      (0 until planes).foldLeft(lit(0L): org.apache.spark.sql.Column) { (acc, p) =>
        acc * 2 + when(
          call_function("dot_d", col("xd"), typedlit(planeW(t, p))) > 0, 1L)
          .otherwise(0L)
      }
    // random lengths 0..6 (ragged vs dim=4) with occasional null elements
    val elem = Gen.frequency(9 -> Gen.choose(-5.0, 5.0).map(Option(_)), 1 -> Gen.const(None))
    val arr = Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, elem))
    val rows = sample(arr, 300).map(Tuple1(_)).toDF("xd").select(
      call_function("lsh_buckets", col("xd"), lit(dim), lit(tables), lit(planes)).as("native"),
      array((0 until tables).map(bucketFor): _*).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("property: minhash_union == element-wise min over random groups") {
    graft.functions.MinHash.register(spark)
    val K = 4
    val sig = Gen.listOfN(K, Gen.choose(Long.MinValue / 2, Long.MaxValue / 2))
    val keyed = Gen.zip(Gen.choose(0, 5), sig)
    val data = sample(keyed, 300)
    val expected: Map[Int, Seq[Long]] = data.groupBy(_._1).map { case (k, rs) =>
      k -> (0 until K).map(i => rs.map(_._2(i)).min)
    }
    val got = data.toDF("k", "mh")
      .groupBy("k")
      .agg(call_function("minhash_union", col("mh"), lit(K)).as("sk"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, sk) => assert(sk === expected(k), s"key $k") }
  }

  test("property: minhash_sigs == nested-HOF form incl. empty/dup sets") {
    graft.functions.MinHash.register(spark)
    val K = 4
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val arr = Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, word))
    val rows = sample(arr, 300).map(Tuple1(_)).toDF("sh").select(
      call_function("minhash_sigs", col("sh"), lit(K)).as("native"),
      transform(sequence(lit(0), lit(K - 1)),
        k => array_min(transform(col("sh"), s => xxhash64(k, s)))).as("hof"))
      .collect()
    rows.foreach { r =>
      val native = r.getSeq[Long](0)
      // HOF yields nulls for empty sets where the native form yields the
      // documented sentinel — translate before comparing
      val hof = (0 until K).map { i =>
        if (r.getSeq[Any](1)(i) == null) graft.functions.MinHashSigs.EmptySlot
        else r.getSeq[Long](1)(i)
      }
      assert(native === hof)
    }
  }

  test("property: graft_tokens == HOF tokenizer incl. punct/ws/unicode edges") {
    graft.functions.GraftFunctions.register(spark)
    // characters chosen to hit every branch: the 6 regex-\s whitespace
    // chars, all four ASCII punct ranges (edge and interior), case in
    // ASCII and beyond (É, ß, İ is excluded — Java lowercases it to i̇
    // in both implementations since both call the same toLowerCase),
    // digits, and empty/all-punct/all-ws tokens
    // NEL (\u0085) and LS (\u2028) are token CHARS (not regex \s) that
    // Java's `$` anchor treats as line terminators — the input class
    // where a `[punct]+$` trailing-strip regex diverges from end-of-text
    // semantics (cleanToken anchors with \z for exactly this reason)
    val ch = Gen.oneOf(
      'a', 'Z', 'é', 'É', 'ß', '0', '!', '/', ':', '@', '[', '`', '{', '~',
      '.', ',', '\'', ' ', '\t', '\n', '\u000B', '\f', '\r',
      '\u0085', '\u2028')
    val str = Gen.choose(0, 24).flatMap(n => Gen.listOfN(n, ch)).map(_.mkString)
    val rows = sample(str, 500).map(Tuple1(_)).toDF("text").select(
      graft.functions.Text.tokens(col("text")).as("native"),
      graft.functions.Text.tokensHof(col("text")).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
  }

  test("property: graft_shingles == HOF windows incl. short/empty/NULL arrays") {
    graft.functions.GraftFunctions.register(spark)
    val word = Gen.oneOf("a", "bb", "ccc", "déjà", "x.y")
    // NULL input arrays included: the native expression is
    // null-intolerant (NULL → NULL) and the HOF twin's explicit NULL arm
    // must follow — not fall through to its otherwise-[] branch
    val arr: Gen[Option[List[String]]] = Gen.frequency(
      9 -> Gen.choose(0, 9).flatMap(n => Gen.listOfN(n, word)).map(Some(_)),
      1 -> Gen.const(None))
    val rows = sample(arr, 400).map(Tuple1(_)).toDF("t").select(
      graft.functions.Text.shingles(col("t"), 3).as("native"),
      graft.functions.Text.shinglesHof(col("t"), 3).as("hof"))
      .collect()
    assert(rows.exists(_.isNullAt(0)), "fixture must include NULL arrays")
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
  }
}
