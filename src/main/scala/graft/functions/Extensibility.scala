package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** The engine's user-extension surface: scalar UDF registration, a typed
  * `Aggregator` UDAF, and approximate aggregation. The reference hard-codes
  * its map/reduce functions (generalization explicitly out of scope,
  * reference: instructions/instruction.md:49); Spark's UDF/UDAF machinery
  * is the replacement.
  *
  * Perf note (100 TB): built-in `functions` beat UDFs (codegen + no
  * serialization), so UDFs here exist to prove the extension point, and
  * each doc states the built-in expression a user should prefer. The
  * Aggregator DOES earn its place: arg-max with a deterministic tiebreak
  * has no single built-in, and the typed buffer gets Spark's partial
  * aggregation (map-side combine) for free — the shape that scales.
  */
object Extensibility {

  // ---- scalar UDF ----------------------------------------------------------

  /** Vowel ratio of a string. A production pipeline would use the
    * equivalent codegen'd expression
    * `length(regexp_replace(lower(s), "[^aeiou]", "")) /
    * nullif(length(s), 0)` — the nullif matches this UDF's ''→NULL
    * contract (a bare `/ length(s)` yields NaN from 0.0/0 instead);
    * the UDF exists to exercise `spark.udf.register`. Same IEEE division
    * on both engines → exact oracle. NULL and '' yield NULL — the SQL
    * semantics the oracle's `/ nullif(length, 0)` form states (a 0/0
    * ratio is undefined, not 0.0); an earlier 0.0-on-empty special case
    * diverged from the oracle on exactly the inputs TPC-H names never
    * contain (review r16 — latent, surfaced by reading, not by the
    * gate, whose c_custkey <= 200 slice is degenerate-free).
    */
  private val vowelRatio: String => java.lang.Double = { s =>
    if (s == null || s.isEmpty) null
    // Locale.ROOT: the oracle's lower() is locale-insensitive, while a
    // bare toLowerCase follows the JVM default locale (Turkish 'I' →
    // dotless 'ı', missing the vowel set)
    else java.lang.Double.valueOf(
      s.toLowerCase(java.util.Locale.ROOT)
        .count("aeiou".contains(_)).toDouble / s.length)
  }

  def udfVowelRatio(spark: SparkSession, dir: String): DataFrame = {
    spark.udf.register("vowel_ratio", vowelRatio)
    Tables.customer(spark, dir)
      .filter(col("c_custkey") <= 200)
      .selectExpr("c_custkey", "c_name", "vowel_ratio(c_name) AS vr")
  }

  val udfVowelRatioSql: String =
    """SELECT c_custkey, c_name,
      |  CAST(length(regexp_replace(lower(c_name), '[^aeiou]', '', 'g')) AS DOUBLE)
      |    / nullif(length(c_name), 0) AS vr
      |FROM customer WHERE c_custkey <= 200""".stripMargin

  // ---- typed Aggregator (UDAF) ---------------------------------------------

  /** Arg-max with deterministic tiebreak: richest customer per nation,
    * lowest custkey winning ties. Buffer is a (bal, key) pair; merge is
    * associative+commutative, so Catalyst runs it as partial aggregation
    * before the shuffle — only one (bal, key) pair per nation per
    * partition crosses the wire.
    */
  val richest: Aggregator[(Double, Long), (Double, Long), Long] =
    new Aggregator[(Double, Long), (Double, Long), Long] {
      def zero: (Double, Long) = (Double.NegativeInfinity, Long.MaxValue)
      def reduce(b: (Double, Long), a: (Double, Long)): (Double, Long) = merge(b, a)
      def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
        if (x._1 > y._1 || (x._1 == y._1 && x._2 < y._2)) x else y
      def finish(r: (Double, Long)): Long = r._2
      def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  def udafRichestPerNation(spark: SparkSession, dir: String): DataFrame = {
    spark.udf.register("arg_max_cust", udaf(richest))
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .agg(expr("arg_max_cust(c_acctbal, c_custkey)").as("richest_cust"))
  }

  val udafRichestPerNationSql: String =
    """SELECT nationkey, richest_cust FROM (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_custkey AS richest_cust,
      |    row_number() OVER (PARTITION BY c_nationkey
      |                       ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
      |  FROM customer) WHERE rn = 1""".stripMargin

  // ---- approximate aggregation ---------------------------------------------

  /** HyperLogLog++ distinct counts. Algorithm-dependent output → no SQL
    * oracle (rows-only check); the companion exact query (q_distinct_agg)
    * is the accuracy reference. At 100 TB approx_count_distinct is the
    * difference between one pass and a giant exact-distinct shuffle.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_suppkey")).as("approx_supps"))

  // ---- registry ------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "udf_vowel_ratio" -> (udfVowelRatio _),
    "udaf_richest_per_nation" -> (udafRichestPerNation _),
    "q_approx_distinct" -> (approxDistinct _))

  val oracles: Map[String, String] = Map(
    "udf_vowel_ratio" -> udfVowelRatioSql,
    "udaf_richest_per_nation" -> udafRichestPerNationSql)
    // q_approx_distinct: HLL++ sketch values are engine-specific → rows-only.
}
