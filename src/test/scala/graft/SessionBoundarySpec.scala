package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact session-window boundary semantics on a crafted fixture,
  * pinned empirically: Spark's session interval is CLOSED at
  * lastEvent+gap — an event arriving exactly at the boundary still
  * merges; only strictly-greater gaps split. (The gaps-and-islands
  * oracle in Events.eventsSessionsSql uses `> INTERVAL '30 minutes'`
  * for the break condition, matching this.)
  */
class SessionBoundarySpec extends AnyFunSuite {

  test("session gap boundary: <=gap merges, >gap splits") {
    val spark = TestSpark.spark
    import spark.implicits._

    val rows = Seq(
      // user 1: 29m59s gap → one session of 2
      ("2024-01-01 10:00:00", 1L),
      ("2024-01-01 10:29:59", 1L),
      // user 2: exactly 30m gap → still ONE session (closed boundary)
      ("2024-01-01 10:00:00", 2L),
      ("2024-01-01 10:30:00", 2L),
      // user 4: 30m01s gap → two sessions of 1
      ("2024-01-01 10:00:00", 4L),
      ("2024-01-01 10:30:01", 4L),
      // user 3: chain of sub-gap steps spans far beyond one gap → still ONE session
      ("2024-01-01 10:00:00", 3L),
      ("2024-01-01 10:25:00", 3L),
      ("2024-01-01 10:50:00", 3L),
      ("2024-01-01 11:15:00", 3L))
      .toDF("ts_str", "user_id")
      .select(col("ts_str").cast("timestamp").as("ts"), col("user_id"))

    val sessions = rows
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.map(_.getLong(1)).sorted.toSeq }

    assert(sessions(1L) === Seq(2L), "sub-gap events must merge")
    assert(sessions(2L) === Seq(2L), "exact-gap events merge (closed boundary)")
    assert(sessions(3L) === Seq(4L), "chained sub-gap events must merge transitively")
    assert(sessions(4L) === Seq(1L, 1L), "past-gap events must split")
  }
}
