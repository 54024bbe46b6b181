package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (sessions are expensive;
  * specs must not stop() it).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      // legacy annotated INT64 TIMESTAMP(NANOS) testdata encodings scan-fail
      // without this flag; set once at session build (never in accessors)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  val Sf0001 = "/root/testdata/sf0.001"
  val Sf001 = "/root/testdata/sf0.01"

  def corpusDir: String =
    getClass.getResource("/tiny_corpus").getPath

  /** Write `df` as a single parquet FILE named `fileName` inside
    * `dataDir` (the bare-file layout the engine's file-stream fixtures
    * expect) — shared by every planted-data spec. */
  def plantParquetFileInto(df: org.apache.spark.sql.DataFrame,
      dataDir: java.nio.file.Path, fileName: String): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    val stage = Files.createTempDirectory("graft_plant_stage")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val parts = Files.list(stage)
    val part =
      try parts.filter(_.toString.endsWith(".parquet")).findFirst().get()
      finally parts.close()
    Files.createDirectories(dataDir)
    Files.move(part, dataDir.resolve(fileName),
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** [[plantParquetFileInto]] a fresh temp dir; returns the dir. */
  def plantParquetFile(df: org.apache.spark.sql.DataFrame,
      fileName: String): String = {
    val dataDir = java.nio.file.Files
      .createTempDirectory("graft_plant").resolve("data")
    plantParquetFileInto(df, dataDir, fileName)
    dataDir.toString
  }

  /** All shuffle exchanges (hash, range, AND single-partition) in the
    * FINAL AQE plan — broadcast exchanges excluded. The plan-pin specs
    * must count these typed, not grep "Exchange hashpartitioning":
    * a reintroduced corpus-side orderBy (range partitioning) or
    * coalesce-to-one (SinglePartition) is exactly the regression class
    * they exist to catch and matches neither string. Call AFTER an
    * action so AQE has finalized. */
  def shuffleExchanges(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => q +: flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    flatten(df.queryExecution.executedPlan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
  }

  /** Row multiset (row → count) — a plain Set masks a bug that changes
    * row multiplicity without changing the set. ONE definition shared by
    * the encoding/schema specs so the compare cannot drift. */
  def multiset(rows: Array[org.apache.spark.sql.Row]): Map[Seq[Any], Int] =
    rows.map(_.toSeq).groupBy(identity).map { case (k, v) => (k, v.length) }

  /** Every non-null message down an exception's cause chain — failure
    * oracles assert against ALL of them (Spark wraps task failures, so
    * the interesting message sits a few causes deep). */
  def causeMessages(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x =>
      Option(x.getMessage).toSeq ++ causeMessages(x.getCause))

  /** Deterministic ScalaCheck sampling — one value per fixed seed
    * 0..n-1, so property specs replay identically on every run. ONE
    * definition shared by the property specs (NativeExprPropSpec,
    * CoMembershipStatsPropSpec), so the seed scheme cannot drift
    * between them. */
  def sample[T](g: org.scalacheck.Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.apply(org.scalacheck.Gen.Parameters.default,
      org.scalacheck.rng.Seed(i.toLong)).get)
}
