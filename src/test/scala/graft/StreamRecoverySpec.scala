package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.streaming.{RunningTotalsProcessor, StreamingWindows}

/** Checkpointed kill/restart recovery for the stateful streaming paths
  * (r18, VERDICT r17 task 3): every driver-gated streaming query runs
  * single-process to completion, so until this spec NOTHING asserted the
  * defining production property of Structured Streaming — that state
  * stores and sink commits survive a death and the restarted query
  * converges on the uninterrupted run's result. (The reference engine
  * LOSES a popped task forever on worker crash — driver.py:128,132,
  * SURVEY §2a bug list — so recovery is also the parity-plus story.)
  *
  * Three arms, each deterministic (no timing-dependent stops):
  *  1. dropDuplicatesWithinWatermark state is RESTORED across a restart:
  *     keys deduped before the stop must stay suppressed when they
  *     recur in files that arrive after the restart.
  *  2. transformWithState totals on RocksDB survive an injected
  *     mid-batch crash: the replayed batch emits totals that include
  *     pre-crash state, and the idempotent per-batchId sink write makes
  *     replay exactly-once.
  *  3. stream_upsert's snapshot apply recovers from a crash injected
  *     INSIDE the commit window (after `_next` is written, before the
  *     retire/promote renames) — and from the mid-swap state where the
  *     live snapshot is gone and only `_old` survives.
  */
class StreamRecoverySpec extends AnyFunSuite {

  private def freshDir(name: String): String = {
    val p = Paths.get(s"target/scratch/streamrec_$name")
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(del))
      f.delete(); ()
    }
    del(p.toFile)
    Files.createDirectories(p).toString
  }

  test("dedup state survives a restart: keys recur after the kill, stay suppressed") {
    val spark = TestSpark.spark
    import spark.implicits._
    val src = freshDir("dedup_src")
    val sink = freshDir("dedup_sink")
    val cp = freshDir("dedup_cp")

    val ev = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id"), col("event_type"), col("ts"))
    // chunk 2 repeats chunk 0/1's keys verbatim plus fresh synthetic
    // ones — the repeats are the recovery probe: without restored state
    // the restarted query re-emits them
    val half = ev.filter(col("user_id") % 2 === 0)
    val rest = ev.filter(col("user_id") % 2 === 1)
    TestSpark.plantParquetFileInto(half, Paths.get(src), "chunk0.parquet")
    TestSpark.plantParquetFileInto(rest, Paths.get(src), "chunk1.parquet")

    val schema = spark.read.parquet(src).schema
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(src)
      val q = StreamingWindows.dedupPipeline(stream).writeStream
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce() // run 1: chunks 0+1, then the query STOPS (state checkpointed)

    val repeats = half.limit(200)
    val fresh = spark.range(1, 4)
      .select((col("id") + 9000000L).as("user_id"),
        lit("recovery_probe").as("event_type"),
        lit(java.sql.Timestamp.valueOf("2024-01-03 04:05:06")).as("ts"))
    TestSpark.plantParquetFileInto(repeats.unionByName(fresh),
      Paths.get(src), "chunk2.parquet")
    runOnce() // run 2: SAME checkpoint — processes only chunk 2

    val got = TestSpark.multiset(spark.read.parquet(sink).collect())
    val want = TestSpark.multiset(
      spark.read.schema(schema).parquet(src)
        .select(col("user_id"), col("event_type"),
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .distinct()
        .collect())
    assert(got == want,
      "restarted dedup must equal one uninterrupted global dedup — a " +
        "multiset diff means lost state (re-emitted keys) or lost output")
  }

  test("transformWithState totals on RocksDB recover from a mid-batch crash") {
    val spark = TestSpark.spark
    import spark.implicits._
    val src = freshDir("tws_src")
    val out = freshDir("tws_out")
    val cp = freshDir("tws_cp")

    val cents = Tables.events(spark, TestSpark.Sf0001)
      .selectExpr("user_id", "CAST(round(value * 100) AS LONG) AS cents")
    TestSpark.plantParquetFileInto(cents.filter(col("user_id") % 2 === 0),
      Paths.get(src), "chunk0.parquet")
    TestSpark.plantParquetFileInto(cents, // every user again — totals must ACCUMULATE
      Paths.get(src), "chunk1.parquet")

    val schema = spark.read.parquet(src).schema
    val crashOnce = new AtomicBoolean(true)
    def runOnce(): Unit = {
      val typed = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .select(col("user_id"), col("cents")).as[(Long, Long)]
      val totals = typed.groupByKey(_._1)
        .transformWithState(new RunningTotalsProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "n_events", "val_sum")
      val q = totals.writeStream
        .foreachBatch { (batch: DataFrame, bid: Long) =>
          // crash BEFORE any work on the replayable batch: the restarted
          // query must re-deliver it with the same batchId, and the
          // per-batchId overwrite below makes the delivery exactly-once
          if (bid == 1 && crashOnce.compareAndSet(true, false))
            throw new RuntimeException("injected mid-stream crash (batch 1)")
          batch.withColumn("bid", lit(bid))
            .write.mode("overwrite").parquet(s"$out/batch_$bid")
        }
        .option("checkpointLocation", cp)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Tables.withConf(spark, "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        runOnce() // batch 0 commits; batch 1 dies before processing
      }
      runOnce() // restart: batch 1 replays against RESTORED batch-0 state
    }
    assert(!crashOnce.get(), "the injected crash must actually have fired")

    // last emission per user (update mode: later batches supersede)
    val emitted = spark.read.parquet(s"$out/batch_*")
    val last = emitted
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("bid").desc)))
      .filter(col("rn") === 1)
      .select("user_id", "n_events", "val_sum")
    val want = spark.read.schema(schema).parquet(src)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        (sum("cents") / 100.0).as("val_sum"))
    val got = TestSpark.multiset(last.collect())
    val exp = TestSpark.multiset(want.collect())
    assert(got == exp,
      "post-restart totals must include pre-crash state exactly once — " +
        "a diff means RocksDB state was lost or the batch replayed twice")
  }

  test("CDC snapshot apply recovers from a crash inside the commit window") {
    val spark = TestSpark.spark
    val base = Tables.orders(spark, TestSpark.Sf0001)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
    val cdc = freshDir("upsert_cdc")
    TestSpark.plantParquetFileInto(base.filter(col("o_orderkey") % 2 === 0),
      Paths.get(cdc), "a.parquet")
    TestSpark.plantParquetFileInto(base.filter(col("o_orderkey") % 2 === 1),
      Paths.get(cdc), "b.parquet")
    val schema = spark.read.parquet(cdc).schema

    def runApply(snap: String, cp: String, seam: Long => Unit): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(cdc)
        .writeStream
        .foreachBatch { (batch: DataFrame, bid: Long) =>
          StreamingWindows.applyCdcBatch(spark, snap, batch,
            beforeSwap = () => seam(bid))
        }
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // uninterrupted twin
    val snapU = freshDir("upsert_snap_u")
    base.write.mode("overwrite").parquet(snapU)
    runApply(snapU, freshDir("upsert_cp_u"), _ => ())
    val want = TestSpark.multiset(spark.read.parquet(snapU).collect())

    // crash in the commit window: _next fully written, renames not run
    val snapC = freshDir("upsert_snap_c")
    base.write.mode("overwrite").parquet(snapC)
    val cpC = freshDir("upsert_cp_c")
    val crashOnce = new AtomicBoolean(true)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runApply(snapC, cpC, bid =>
        if (bid == 1 && crashOnce.compareAndSet(true, false))
          throw new RuntimeException("injected crash before snapshot swap"))
    }
    runApply(snapC, cpC, _ => ()) // restart replays batch 1
    assert(!crashOnce.get(), "the injected crash must actually have fired")
    assert(TestSpark.multiset(spark.read.parquet(snapC).collect()) == want,
      "restarted CDC apply must converge on the uninterrupted snapshot")

    // mid-swap death: live gone, only _old survives — the restore arm
    // must bring the snapshot back and an (empty-delta) apply must
    // reproduce it unchanged, unattended
    val fs = new org.apache.hadoop.fs.Path(snapC)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(snapC),
      new org.apache.hadoop.fs.Path(snapC + "_old")),
      "test setup: simulate the retire-done/promote-lost window")
    StreamingWindows.applyCdcBatch(spark, snapC, base.limit(0))
    assert(TestSpark.multiset(spark.read.parquet(snapC).collect()) == want,
      "the restore arm must recover the retired snapshot without help")
  }
}
