package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Pins the SURGICAL property of dynamic partition overwrite that the
  * DuckDB oracle (content-level) cannot see: a day-scoped backfill
  * rewrites ONLY that day's directory — every other partition keeps the
  * exact same files (names, sizes, mtimes). This is the difference
  * between re-writing one day and truncating the table at 100 TB.
  */
class DynamicOverwriteSpec extends AnyFunSuite {

  private def listing(root: Path): Map[String, (Long, Long)] =
    scala.util.Using.resource(Files.walk(root)) {
      _.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.getFileName.toString.startsWith("part-"))
        .map(p => root.relativize(p).toString ->
          (Files.size(p), Files.getLastModifiedTime(p).toMillis))
        .toMap
    }

  test("backfill rewrites only the targeted partition's files") {
    val spark = TestSpark.spark
    val dir = TestSpark.Sf0001
    val path = graft.sources.Formats.tmp("dynpart_spec", dir)
    val root = Paths.get(path)

    val ev = Tables.events(spark, dir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.write.mode("overwrite").partitionBy("day").parquet(path)
    val before = listing(root)
    assert(before.keys.exists(_.contains("day=2024-01-05")), "target day must exist")

    Tables.withConf(spark, "spark.sql.sources.partitionOverwriteMode", "dynamic") {
      ev.filter(col("day") === "2024-01-05")
        .withColumn("value", col("value") * 2.0)
        .write.mode("overwrite").partitionBy("day").parquet(path)
    }
    val after = listing(root)

    val (beforeTarget, beforeOthers) = before.partition(_._1.contains("day=2024-01-05"))
    val (afterTarget, afterOthers) = after.partition(_._1.contains("day=2024-01-05"))
    // untouched partitions: identical file sets, sizes, and mtimes
    assert(afterOthers === beforeOthers)
    // the targeted partition was rewritten (fresh files)
    assert(afterTarget.nonEmpty)
    // Spark writes fresh part- file names under a new job UUID, so the
    // rewritten partition shares no file names with its previous version
    assert(beforeTarget.keySet.intersect(afterTarget.keySet).isEmpty)

    // and the doubled values landed: exact decimal comparison
    val got = spark.read.parquet(path)
      .filter(date_format(col("day"), "yyyy-MM-dd") === "2024-01-05")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double")).first().getDouble(0)
    val want = ev.filter(col("day") === "2024-01-05")
      .agg(sum((col("value") * 2.0).cast("decimal(18,2)")).cast("double")).first().getDouble(0)
    assert(got === want)
  }
}
