package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.{GroupStateTimeout, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** The production property none of the AvailableNow harness queries can
  * show (they run checkpoint-less to completion): a CHECKPOINTED stateful
  * stream restarted over a grown directory processes ONLY the new files
  * and reloads its state. Pass 1 sees file A; pass 2 (same checkpoint)
  * sees A+B but must emit exactly the keys B touched, with totals that
  * include A's contribution — state carried across the restart, input A
  * not reprocessed. This is the contract that makes incremental ingest
  * over a 100 TB event archive tractable: each run pays for the delta,
  * not the history.
  */
class IncrementalRestartSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("cents", LongType)))

  test("checkpointed restart: only new files processed, state reloaded") {
    val spark = TestSpark.spark
    import spark.implicits._
    val root = Files.createTempDirectory("graft_incr")
    val data = root.resolve("data"); Files.createDirectories(data)
    val ckpt = root.resolve("ckpt").toString

    def plant(name: String, rows: Seq[(Long, Long)]): Unit =
      TestSpark.plantParquetFileInto(rows.toDF("user_id", "cents"), data, name)

    def runPass(pass: Int): Map[Long, (Long, Long)] = {
      val totals = spark.readStream.schema(schema).parquet(data.toString)
        .as[(Long, Long)]
        .groupByKey(_._1)
        .mapGroupsWithState[(Long, Long), (Long, Long, Long)](
          GroupStateTimeout.NoTimeout) {
          case (uid, rows, state) =>
            var (n, cents) = state.getOption.getOrElse((0L, 0L))
            rows.foreach { r => n += 1; cents += r._2 }
            state.update((n, cents))
            (uid, n, cents)
        }
        .toDF("user_id", "n", "cents")
      // foreachBatch, not the memory sink: memory refuses checkpoint
      // recovery, and foreachBatch is the production sink shape anyway
      val seen = scala.collection.concurrent.TrieMap.empty[Long, (Long, Long)]
      val q = totals.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.collect().foreach(r =>
            seen(r.getLong(0)) = (r.getLong(1), r.getLong(2)))
        }
        .start()
      q.awaitTermination()
      seen.toMap
    }

    plant("a.parquet", Seq((1L, 100L), (2L, 200L)))
    assert(runPass(1) === Map(1L -> ((1L, 100L)), 2L -> ((1L, 200L))))

    plant("b.parquet", Seq((1L, 50L)))
    // ONLY user 1 may appear (user 2 untouched by the delta), and its
    // total must be 150 over 2 events — state reloaded, file A not re-read
    assert(runPass(2) === Map(1L -> ((2L, 150L))))
  }
}
