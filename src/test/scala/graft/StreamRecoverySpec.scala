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
  *  4. (r19, VERDICT r18 task 7) stream-stream join state survives a
  *     restart: EVERY purchase arrives after the kill, so every emitted
  *     pair needs a click retained in restored join state.
  *  5. (r19) merging session windows in append mode survive a restart:
  *     the input is split on the event-time midline, so sessions
  *     straddling the kill must merge across it, and the emitted set
  *     must equal an uninterrupted run's.
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

  test("stream-stream join state survives a restart: purchases arrive only after the kill") {
    val spark = TestSpark.spark
    val src = freshDir("ssj_src")
    val sink = freshDir("ssj_sink")
    val cp = freshDir("ssj_cp")

    val ev = Tables.events(spark, TestSpark.Sf0001)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    // run 1 sees ONLY clicks; every purchase lands after the restart, so
    // every pair the joined stream can ever emit requires a click
    // retained in the RESTORED join state — the strongest-possible
    // probe: zero pairs are expressible within either run's own input
    val clicks = ev.filter(col("event_type") === "click")
    val purchases = ev.filter(col("event_type") === "purchase")
    TestSpark.plantParquetFileInto(clicks, Paths.get(src), "chunk0.parquet")

    val schema = spark.read.parquet(src).schema
    def runOnce(): Unit = {
      def leg() = spark.readStream.schema(schema).parquet(src)
      val q = StreamingWindows.streamJoinPipeline(leg(), leg()).writeStream
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce() // run 1: clicks buffered into join state, no purchase yet
    TestSpark.plantParquetFileInto(purchases, Paths.get(src), "chunk1.parquet")
    runOnce() // run 2: SAME checkpoint — purchases meet restored clicks

    // exact batch twin: the 365-day watermark drops nothing, so the
    // interval join over the full input is the uninterrupted answer
    val c = clicks.select(col("user_id").as("c_uid"), col("ts").as("c_ts"),
      col("event_id").as("click_id"))
    val p = purchases.select(col("user_id").as("p_uid"), col("ts").as("p_ts"),
      col("event_id").as("purchase_id"))
    val want = TestSpark.multiset(c.join(p,
        expr("""c_uid = p_uid AND p_ts >= c_ts AND
                p_ts <= c_ts + INTERVAL 1 HOUR"""))
      .select(col("click_id"), col("purchase_id"), col("c_uid").as("user_id"),
        expr("unix_micros(p_ts) - unix_micros(c_ts)").as("lag_us"))
      .collect())
    assert(want.nonEmpty,
      "vacuous probe: the fixture yields no click→purchase pairs at all")
    val got = TestSpark.multiset(spark.read.parquet(sink).collect())
    assert(got == want,
      "restarted stream-stream join must equal the batch interval join — " +
        "a multiset diff means click state was lost across the restart " +
        "(every pair here needs a pre-kill click)")
  }

  test("append-mode session windows merge across a restart at the event-time midline") {
    val spark = TestSpark.spark
    val src = freshDir("sess_src")
    val cp = freshDir("sess_cp")
    val sink = freshDir("sess_sink")

    val ev = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id"), col("ts"))
    // Cut the timeline INSIDE a session so it straddles the kill: its
    // run-1 half sits in checkpointed session state and must MERGE with
    // its run-2 events, not restart as a fresh session. A blind midline
    // finds no straddler at this sf (sessions are short and sparse), so
    // pick the cut deterministically: an intra-session consecutive event
    // pair (delta ≤ gap) nearest the global median instant, cut between
    // the two events.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us")
    val Array(minUs, maxUs) = ev
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray // bounded: one row
    val midUs = minUs + (maxUs - minUs) / 2
    val cand = ev.select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("nxt", lead(col("us"), 1).over(w))
      .filter(col("nxt") > col("us") &&
        col("nxt") - col("us") <= graft.operators.Events.SessionGapUs)
      .orderBy(abs(col("us") - lit(midUs)))
      .limit(1).collect() // bounded: one row
    assert(cand.nonEmpty,
      "vacuous probe: no session in this fixture has two events to cut between")
    val cutUs = cand.head.getAs[Long]("us") // first event early, next late
    val early = ev.filter(unix_micros(col("ts")) <= cutUs)
    val late = ev.filter(unix_micros(col("ts")) > cutUs)

    def runInto(dir: String, checkpoint: String): Unit = {
      val stream = spark.readStream.schema(ev.schema).parquet(dir)
      val q = StreamingWindows.sessionAgg(stream.withWatermark("ts", "3 days"))
        .writeStream
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    TestSpark.plantParquetFileInto(early, Paths.get(src), "chunk0.parquet")
    runInto(src, cp) // run 1: open sessions at mid stay in state
    val afterRun1 = spark.read.parquet(sink).count()
    TestSpark.plantParquetFileInto(late, Paths.get(src), "chunk1.parquet")
    runInto(src, cp) // run 2: SAME checkpoint — straddling sessions extend

    // uninterrupted twin: both chunks visible from the start, fresh
    // checkpoint, same pipeline — the recovery contract is emitted-set
    // equality with this run
    val got = TestSpark.multiset(spark.read.parquet(sink).collect())
    val sinkU = freshDir("sess_sink_u")
    val qU = StreamingWindows.sessionAgg(
        spark.readStream.schema(ev.schema).parquet(src)
          .withWatermark("ts", "3 days"))
      .writeStream
      .format("parquet")
      .option("path", sinkU)
      .option("checkpointLocation", freshDir("sess_cp_u"))
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    qU.awaitTermination()
    val want = TestSpark.multiset(spark.read.parquet(sinkU).collect())
    assert(got == want,
      "restarted session stream must emit the uninterrupted run's exact " +
        "session set — a diff means straddling sessions re-opened fresh " +
        "(lost state) or were emitted twice")
    assert(afterRun1 < want.size,
      "vacuous probe: run 1 already emitted everything — nothing was " +
        "left in state for the restart to recover")
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
