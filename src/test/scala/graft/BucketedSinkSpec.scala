package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WordCount

/** Reference-parity check for the bucketed text sink: exactly M part
  * files, each internally sorted by word ascending, lines
  * `"<word> <count>"`, words routed to pmod(codepoint, M) buckets
  * (reference: src/worker.py:134-137, instructions/instruction.md:43-47).
  */
class BucketedSinkSpec extends AnyFunSuite {

  // M=4 is the reference's shipped config (config.yaml:9); M=8 proves the
  // bucket-sink contract generalizes to any -Dgraft.buckets value.
  for (m <- Seq(4, 8))
    test(s"bucketed sink writes $m sorted part files partitioned by codepoint") {
      val out = Files.createTempDirectory("graft_sink_").toString
      val counted = WordCount.wordcountText(TestSpark.spark, TestSpark.corpusDir)
      WordCount.writeBucketedText(counted, out, m)

      val parts = Files.list(Paths.get(out)).iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-")).toSeq.sortBy(_.toString)
      assert(parts.size === m)

      val seen = scala.collection.mutable.Map[String, Long]()
      parts.zipWithIndex.foreach { case (p, idx) =>
        val lines = Files.readAllLines(p).asScala.toSeq
        val words = lines.map(_.split(" ")(0))
        // per-file sort ascending (binary order = codepoint order for BMP)
        assert(words === words.sorted, s"file $p not sorted")
        // file index IS the bucket id (reference: out-<bucket>)
        words.foreach { w =>
          assert(w.codePointAt(0) % m === idx,
            s"word $w in wrong file $p")
        }
        lines.foreach { l =>
          val Array(w, c) = l.split(" ")
          seen(w) = c.toLong
        }
      }
      // union of the M files reproduces the full counted relation
      val expected = counted.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(seen.toMap === expected)
    }

  test("degenerate keys: empty and NULL words land in bucket 0, never crash the write") {
    // The partitioner fires AFTER the destructive output-dir delete, so a
    // degenerate key crashing a task would destroy the previous good
    // output. '' routes like the query path (Spark/DuckDB ascii('') = 0
    // → Text.bucket 0); NULL is normalized to '' at the RDD boundary.
    val spark = TestSpark.spark
    val out = Files.createTempDirectory("graft_sink_edge_").toString
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row("", 2L),
      org.apache.spark.sql.Row(null, 3L),
      org.apache.spark.sql.Row("e", 5L)) // 'e' = 101, 101 % 4 = 1
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("word", org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("cnt", org.apache.spark.sql.types.LongType, nullable = false)))
    WordCount.writeBucketedText(spark.createDataFrame(rows, schema), out, 4)
    val bucket0 = Files.readAllLines(Paths.get(out, "part-00000")).asScala.toSeq
    val bucket1 = Files.readAllLines(Paths.get(out, "part-00001")).asScala.toSeq
    assert(bucket0.sorted === Seq(" 2", " 3").sorted) // '' and normalized NULL
    assert(bucket1 === Seq("e 5"))
  }

  test("bucket count below 1 is rejected before the destructive delete") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("word", "cnt")
    intercept[IllegalArgumentException] {
      WordCount.writeBucketedText(df, "/tmp/graft_sink_never", 0)
    }
    assert(!Files.exists(Paths.get("/tmp/graft_sink_never")))
    intercept[IllegalArgumentException] {
      WordCount.wordcountBucketedM(spark, TestSpark.Sf0001, -3)
    }
  }

  test("per-file sort is CODEPOINT order, not UTF-16 code-unit order") {
    // a supplementary-plane word (U+1F600, surrogates 0xD83D 0xDE00) and
    // a private-use-area word (U+E000): Java's natural String order puts
    // the emoji FIRST (code unit 0xD83D < 0xE000) while Python — the
    // reference — sorts by codepoint (0xE000 = 57344 < 0x1F600 = 128512).
    // Both words share bucket 0 (codepoint % 4 == 0), so the file order
    // is where the two orderings diverge.
    val spark = TestSpark.spark
    import spark.implicits._
    val emoji = new String(Character.toChars(0x1F600))
    val pua = "\uE000"
    assert(0x1F600 % 4 === 0 && 0xE000 % 4 === 0) // same bucket
    val out = Files.createTempDirectory("graft_sink_cp_").toString
    WordCount.writeBucketedText(
      Seq((emoji, 2L), (pua, 3L)).toDF("word", "cnt"), out, 4)
    val bucket0 = Paths.get(out, "part-00000")
    val words = Files.readAllLines(bucket0).asScala.map(_.split(" ")(0)).toSeq
    assert(words === Seq(pua, emoji),
      s"bucket file not in codepoint order: ${words.map(_.codePointAt(0))}")
  }
}
