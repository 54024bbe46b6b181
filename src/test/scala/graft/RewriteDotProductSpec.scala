package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RewriteDotProduct

/** The optimizer rule must turn the HOF dot-product pattern into the
  * codegen'd dot_l — plan-shape assertion plus result equality against
  * the un-rewritten run.
  */
class RewriteDotProductSpec extends AnyFunSuite {

  import TestSpark.spark
  import spark.implicits._

  // parquet-backed (a literal local relation would be constant-folded
  // away before the rule could be observed)
  private def hofDot = {
    spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => round(x.cast("double") * 1000).cast("long")).as("q"))
      .select(col("vec_id"),
        aggregate(zip_with(col("q"), col("q"), (x, y) => x * y),
          lit(0L), (acc, v) => acc + v).as("d"))
  }

  test("HOF dot-product pattern is rewritten to DotProductLong") {
    val before = hofDot.queryExecution.optimizedPlan.toString
    assert(before.contains("aggregate("), s"baseline plan should keep the HOF form:\n$before")
    val reference = hofDot.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    RewriteDotProduct.install(spark)
    try {
      val after = hofDot.queryExecution.optimizedPlan.toString
      assert(after.contains("dot_l"), s"rule did not fire; plan:\n$after")
      assert(!after.contains("aggregate("), "HOF form should be gone")
      assert(hofDot.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === reference)
    } finally RewriteDotProduct.uninstall(spark)
  }

  test("rule leaves non-matching aggregates alone") {
    RewriteDotProduct.install(spark)
    try {
      // sum of squares (aggregate over ONE array) — must not be rewritten
      val df = Seq(Array(1L, 2L)).toDF("a")
        .select(aggregate(col("a"), lit(0L), (acc, v) => acc + v * v).as("s"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("dot_l"))
      assert(df.collect().head.getLong(0) === 5L)
      // double arrays — type guard must reject
      val dd = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
        .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, v) => acc + v).as("d"))
      assert(!dd.queryExecution.optimizedPlan.toString.contains("dot_l"))
      assert(dd.collect().head.getDouble(0) === 11.0)
    } finally RewriteDotProduct.uninstall(spark)
  }

  test("mismatched lengths yield null — same as the HOF form it replaces") {
    graft.functions.DotProduct.register(spark)
    val df = Seq((Seq(1L, 2L, 3L), Seq(1L, 2L))).toDF("a", "b")
    // the HOF form: zip_with pads with nulls, so the sum is null
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("d")).collect().head
    assert(hof.isNullAt(0), "HOF dot product over ragged arrays must be null")
    // dot_l must agree, or the optimizer rewrite changes results
    val native = df.selectExpr("dot_l(a, b) AS d").collect().head
    assert(native.isNullAt(0), "dot_l over ragged arrays must be null")
  }

  test("null element propagates to null result through dot_l") {
    graft.functions.DotProduct.register(spark)
    val df = Seq((Seq(Some(1L), None, Some(3L)), Seq(Some(1L), Some(2L), Some(3L))))
      .toDF("a", "b")
      .selectExpr("dot_l(a, b) AS d")
    assert(df.collect().head.isNullAt(0))
  }

  test("overflow semantics follow the session's ANSI mode (rewrite + dot_l)") {
    graft.functions.DotProduct.register(spark)
    // 3037000500^2 > Long.MaxValue: under ANSI the HOF form throws, so
    // the rewritten/registered expression must throw too — a silently
    // wrapped value would mean the optimizer CHANGED results (review
    // r16). Under legacy mode both wrap to the same value.
    val big = 3037000500L
    def dotBig() = Seq((Seq(big), Seq(big))).toDF("a", "b")
      .selectExpr("dot_l(a, b) AS d").collect().head
    def hofBig() = Seq((Seq(big), Seq(big))).toDF("a", "b")
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("d")).collect().head
    // Input derived from range(1)'s id so ConstantFolding cannot
    // evaluate the whole expression before the rule sees it (the hofDot
    // comment's trap — a literal-array form folds to a LocalRelation
    // and no rewrite is observable)
    def hofBigViaRange() = spark.range(1)
      .select(array(col("id") + big).as("a"), array(col("id") + big).as("b"))
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("d"))
    // ArithmeticException, not bare Exception: SparkArithmeticException
    // extends it, while an AnalysisException (e.g. a registration
    // failure) must FAIL the test, not satisfy the throw assert. Checked
    // down the cause chain because a task-side throw surfaces wrapped in
    // SparkException, while a constant-folded one throws directly.
    def assertOverflows(body: => Any): Unit = {
      val ex = intercept[Exception](body)
      val chain = Iterator.iterate(ex: Throwable)(_.getCause)
        .takeWhile(_ != null).take(10).toSeq
      assert(chain.exists(_.isInstanceOf[ArithmeticException]),
        s"expected an ArithmeticException (ANSI overflow), got: $ex")
    }
    // all collects run INSIDE their conf window (the r14 test-trap
    // class: a restored conf before the action re-plans under the
    // wrong mode); withConf restores set-or-unset even on failure
    graft.engine.Tables.withConf(spark, "spark.sql.ansi.enabled", "true") {
      assertOverflows(hofBig())   // the reference behavior
      assertOverflows(dotBig())   // dot_l must match it
      // mixed null+overflow (review r16, second pass): zip_with
      // multiplies EVERY aligned pair, so an overflowing in-range pair
      // throws even when a null element (or ragged padding) has already
      // doomed the sum to NULL — an early null return in dot_l would
      // turn these throwing queries into NULL results
      def dotOf(a: Seq[Option[Long]], b: Seq[Option[Long]]) =
        Seq((a, b)).toDF("a", "b").selectExpr("dot_l(a, b) AS d").collect().head
      def hofOf(a: Seq[Option[Long]], b: Seq[Option[Long]]) =
        Seq((a, b)).toDF("a", "b")
          .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
            lit(0L), (acc, v) => acc + v).as("d")).collect().head
      val nullThenBig = (Seq(None, Some(big)), Seq(Option(1L), Some(big)))
      val raggedBig = (Seq(Some(big), Some(1L)), Seq(Option(big)))
      val paddedTail = (Seq(Option(1L)), Seq(Option(1L), Some(big)))
      assertOverflows(hofOf(nullThenBig._1, nullThenBig._2))
      assertOverflows(dotOf(nullThenBig._1, nullThenBig._2))
      assertOverflows(hofOf(raggedBig._1, raggedBig._2))
      assertOverflows(dotOf(raggedBig._1, raggedBig._2))
      // ...but a null-padded OVERLONG side never multiplies the
      // unaligned tail: NULL result, no throw (zip_with pads with null)
      assert(hofOf(paddedTail._1, paddedTail._2).isNullAt(0))
      assert(dotOf(paddedTail._1, paddedTail._2).isNullAt(0))
      // the REWRITE's ANSI branch end-to-end: the rule must carry the
      // operators' ANSI mode into failOnOverflow — a silently wrapped
      // value here is exactly the optimizer-changes-results bug class
      RewriteDotProduct.install(spark)
      try {
        val viaRule = hofBigViaRange()
        assert(viaRule.queryExecution.optimizedPlan.toString.contains("dot_l"))
        assertOverflows(viaRule.collect())
      } finally RewriteDotProduct.uninstall(spark)
    }
    graft.engine.Tables.withConf(spark, "spark.sql.ansi.enabled", "false") {
      val wrapped = big * big             // Java wrapping product
      assert(hofBig().getLong(0) === wrapped)
      assert(dotBig().getLong(0) === wrapped)
      // the REWRITE path under legacy mode: results equal the HOF's
      RewriteDotProduct.install(spark)
      try {
        val viaRule = hofBigViaRange()
        assert(viaRule.queryExecution.optimizedPlan.toString.contains("dot_l"))
        assert(viaRule.collect().head.getLong(0) === wrapped)
      } finally RewriteDotProduct.uninstall(spark)
    }
  }
}
