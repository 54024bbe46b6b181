package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Watermark semantics: late events beyond the watermark are dropped
  * from windowed aggregation, on-time events are not. Three files
  * processed as separate micro-batches (maxFilesPerTrigger=1, source
  * ordered by modification time):
  *
  *  - batch a (10:10, 11:59) establishes max event time 11:59, so the
  *    30-minute watermark becomes 11:29;
  *  - batch b is a filler — Spark applies a new watermark with a
  *    one-batch delay (measured on this build: a late row in the batch
  *    immediately after the advancing batch is NOT yet filtered);
  *  - batch c delivers 08:05 (far below the now-effective 11:29
  *    watermark → dropped) and 11:50 (on time → counted).
  */
class WatermarkSpec extends AnyFunSuite {

  test("late events beyond the watermark are dropped; on-time survive") {
    val spark = TestSpark.spark
    import spark.implicits._

    val dir = Files.createTempDirectory("graft_wm_").toString
    // explicit, widely-spaced mtimes: the file source orders batches by
    // modification time, and relying on wall-clock sleeps between writes
    // is flaky on coarse-mtime filesystems / slow CI boxes
    var mtime = 1700000000000L
    def write(name: String, rows: Seq[(String, Long)]): Unit = {
      rows.toDF("ts_str", "user_id")
        .select(col("ts_str").cast("timestamp").as("ts"), col("user_id"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$name")
      mtime += 60000L
      Option(new java.io.File(s"$dir/$name").listFiles())
        .getOrElse(Array.empty).foreach(_.setLastModified(mtime))
    }
    write("batch_a", Seq(("2024-06-01 10:10:00", 1L), ("2024-06-01 11:59:00", 3L)))
    write("batch_b", Seq(("2024-06-01 11:45:00", 5L)))
    write("batch_c", Seq(("2024-06-01 08:05:00", 4L), ("2024-06-01 11:50:00", 6L)))

    val counts = spark.readStream
      .schema("ts timestamp, user_id long")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*")
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "HH:mm").as("ws"), col("n"))

    val name = s"wm_probe_${System.nanoTime()}"
    val q = counts.writeStream
      .format("memory").queryName(name)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // update mode emits per-batch revisions; counts per window are
    // monotone non-decreasing, so max is the final revision — order-free
    // (collect() order from a memory sink is an implementation detail)
    val finalCounts = spark.table(name).collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }

    // the late 08:05 must NOT have created or updated an 08:00 window
    assert(!finalCounts.contains("08:00"), s"late event leaked: $finalCounts")
    // on-time events all counted: 11:59 + 11:45 + 11:50
    assert(finalCounts("11:00") === 3L)
    assert(finalCounts("10:00") === 1L)
  }
}
