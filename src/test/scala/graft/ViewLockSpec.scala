package graft

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Events

/** Pins the Tables.withViews contract: engine-internal queries that
  * register a SESSION-GLOBAL temp view and then analyze SQL over it
  * must bind each caller's OWN dataset even when two callers race on
  * the same view name with different dirs (sbt provably overlaps
  * suites on the shared session — r14). Without the lock, a second
  * caller's createOrReplaceTempView can land between the first
  * caller's registration and its spark.sql analysis, binding the
  * first plan to the second dir's data — an intermittent wrong-data
  * bind this spec makes likely by racing the two callers repeatedly.
  * With the lock the register+analyze window is atomic and the
  * result is deterministic; execution (count) after the lock is safe
  * because analysis resolved the view INTO the plan.
  */
class ViewLockSpec extends AnyFunSuite {

  test("racing same-name view queries each bind their own dir") {
    val spark = TestSpark.spark
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    // fixture B: exactly ONE event, in a time window far from sf0.001's
    val dirB = TestSpark.plantParquetFile(
      Seq((1L, t("2030-01-01T00:00:00Z"), 1L, "click", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      "events.parquet")
    val dirA = TestSpark.Sf0001
    // the window query emits one row per input event
    val expectA = Events.eventsWindowTimeRange(spark, dirA).count()
    assert(expectA > 1L, "vacuous fixture — dir A must dwarf dir B")
    implicit val ec: ExecutionContext = ExecutionContext.global
    (1 to 8).foreach { round =>
      val fa = Future(Events.eventsWindowTimeRange(spark, dirA).count())
      val fb = Future(Events.eventsWindowTimeRange(spark, dirB).count())
      assert(Await.result(fa, 2.minutes) === expectA,
        s"round $round: dir A's plan bound the wrong dataset")
      assert(Await.result(fb, 2.minutes) === 1L,
        s"round $round: dir B's plan bound the wrong dataset")
    }
  }
}
