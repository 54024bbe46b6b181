package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native expressions must be BIT-IDENTICAL to the declarative HOF
  * forms they replace — they exist for codegen speed, not different
  * semantics. Each test evaluates both forms over real data and
  * compares exactly.
  */
class NativeExprSpec extends AnyFunSuite {

  import TestSpark.spark

  test("minhash_sigs equals the nested-HOF minhash formulation") {
    graft.functions.MinHash.register(spark)
    val K = 8
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select(col("doc_id"),
        array_distinct(graft.functions.Text.shingles(
          graft.functions.Text.tokens(col("text")), 3)).as("sh"))
      .filter(size(col("sh")) > 0)
    val both = docs.select(
      col("doc_id"),
      call_function("minhash_sigs", col("sh"), lit(K)).as("native"),
      transform(sequence(lit(0), lit(K - 1)),
        k => array_min(transform(col("sh"), s => xxhash64(k, s)))).as("hof"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2),
        s"minhash mismatch for doc ${r.getLong(0)}")
    }
  }

  test("dot_d equals the HOF double dot product, same summation order") {
    graft.functions.DotProduct.register(spark)
    val vecs = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("xd"))
    val both = vecs.select(
      col("vec_id"),
      call_function("dot_d", col("xd"), col("xd")).as("native"),
      aggregate(zip_with(col("xd"), col("xd"), (a, b) => a * b),
        lit(0.0), (acc, v) => acc + v).as("hof"))
    both.collect().foreach { r =>
      // exact bit equality, not approximate — summation order matters
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"dot_d mismatch for vec ${r.getLong(0)}")
    }
  }

  test("minhash_sigs: null elements match the HOF form; empty sets yield EmptySlot sentinels") {
    // the empty-set case deliberately DIVERGES from the HOF form
    // (array_min([]) is NULL; the native form emits the documented
    // EmptySlot sentinel — MinHashSignature.scala) — this pins the
    // sentinel contract, not HOF equality
    graft.functions.MinHash.register(spark)
    import spark.implicits._
    // null element: xxhash64(k, NULL) hashes only k — the HOF form's value
    val df = Seq((1L, Seq(Some("abc"), None))).toDF("id", "sh")
    val r = df.select(
      call_function("minhash_sigs", col("sh"), lit(4)).as("native"),
      transform(sequence(lit(0), lit(3)),
        k => array_min(transform(col("sh"), s => xxhash64(k, s)))).as("hof"))
      .collect().head
    assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    // empty set: all slots are the documented sentinel
    val empty = Seq((1L, Seq.empty[String])).toDF("id", "sh")
      .select(call_function("minhash_sigs", col("sh"), lit(4)).as("m"))
      .collect().head.getSeq[Long](0)
    assert(empty.forall(_ == graft.functions.MinHashSigs.EmptySlot))
  }

  test("lsh_buckets equals the dot_d-fold hyperplane formulation") {
    graft.functions.DotProduct.register(spark)
    // dim from the DATA, as lshBuckets derives it — hardcoding would let
    // a dimensionality change degrade both sides to all-zero buckets and
    // pin nothing
    val dim = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
      .selectExpr("size(embedding)").head.getInt(0)
    val tables = graft.operators.Similarity.NumTables
    val planes = graft.operators.Similarity.NumPlanes
    // the formulation lsh_buckets replaced: per table, Horner fold of
    // sign(dot_d(xd, ±1-plane)) with weights from xxhash64(t, p, d)
    def plane(t: Int, p: Int): Seq[Double] =
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
          call_function("dot_d", col("xd"), typedlit(plane(t, p))) > 0, 1L)
          .otherwise(0L)
      }
    val both = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("xd"))
      .select(col("vec_id"),
        call_function("lsh_buckets", col("xd"), lit(dim), lit(tables), lit(planes)).as("native"),
        array((0 until tables).map(bucketFor): _*).as("ref"))
      .collect()
    assert(both.nonEmpty)
    assert(both.exists(_.getSeq[Long](1).exists(_ != 0L)),
      "degenerate all-zero buckets — the equivalence would pin nothing")
    both.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2),
        s"bucket mismatch for vec ${r.getLong(0)}")
    }
  }

  test("lsh_buckets degraded inputs: ragged/null-element → zero buckets, null → null") {
    graft.functions.DotProduct.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(Some(1.0), Some(2.0)))),            // ragged (dim=4 below)
      (2L, Some(Seq(Some(1.0), None, Some(3.0), Some(4.0)))), // null element
      (3L, None)                                        // null array
    ).toDF("id", "xd")
    val rows = df.select(col("id"),
      call_function("lsh_buckets", col("xd"), lit(4), lit(2), lit(3)).as("b"))
      .collect().sortBy(_.getLong(0))
    assert(rows(0).getSeq[Long](1) === Seq(0L, 0L)) // ragged
    assert(rows(1).getSeq[Long](1) === Seq(0L, 0L)) // null element
    assert(rows(2).isNullAt(1))                     // null input → null
  }

  test("lsh_buckets NaN element follows Spark's nan-safe sign, like the dot_d fold") {
    graft.functions.DotProduct.register(spark)
    import spark.implicits._
    // a NaN element makes every plane's dot NaN; Spark's `>` is nan-safe
    // total ordering (NaN above everything), so the dot_d fold's
    // `when(dot > 0, 1)` takes the 1 branch on every plane — the native
    // expression must emit the same all-ones buckets, not Java's
    // NaN-comparisons-are-false all-zeros
    val df = Seq((1L, Seq(1.0, Double.NaN, 3.0, 4.0))).toDF("id", "xd")
    val r = df.select(
      call_function("lsh_buckets", col("xd"), lit(4), lit(2), lit(3)).as("native"),
      when(call_function("dot_d", col("xd"),
        typedlit(Seq(1.0, 1.0, 1.0, 1.0))) > 0, 1L).otherwise(0L).as("sparkSign"))
      .collect().head
    assert(r.getLong(1) === 1L, "Spark's > must send a NaN dot to the 1 branch")
    assert(r.getSeq[Long](0) === Seq(7L, 7L)) // 3 planes all-ones, both tables
  }

  test("SQL-surface misuse reads as a named argument error, not an internal crash") {
    graft.functions.GraftFunctions.register(spark)
    // wrong arity: named count, not IndexOutOfBoundsException
    val arity = intercept[Exception](
      spark.sql("SELECT minhash_sigs(array('a'))").collect())
    assert(arity.getMessage.contains("minhash_sigs expects 2 argument(s)"),
      arity.getMessage)
    // non-literal scalar parameter: named, not an unbound-attribute eval crash
    val nonLit = intercept[Exception](
      spark.sql("SELECT graft_shingles(array('a'), id) FROM range(3)").collect())
    assert(nonLit.getMessage.contains("must be a literal integer"), nonLit.getMessage)
    // a BIGINT literal is accepted (was a ClassCastException before the guard)
    val viaLong = spark.sql(
      "SELECT minhash_sigs(array('a'), CAST(4 AS BIGINT)) AS m").collect().head
    assert(viaLong.getSeq[Long](0).length === 4)
  }

  test("dot_d null semantics: ragged lengths and null elements yield null") {
    graft.functions.DotProduct.register(spark)
    import spark.implicits._
    val ragged = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
      .selectExpr("dot_d(a, b) AS d").collect().head
    assert(ragged.isNullAt(0))
    val withNull = Seq((Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0)))).toDF("a", "b")
      .selectExpr("dot_d(a, b) AS d").collect().head
    assert(withNull.isNullAt(0))
  }
}
