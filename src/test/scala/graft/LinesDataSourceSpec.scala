package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WordCount

/** The custom DataSource V2 connector (graft-lines) against real
  * corpora: per-line provenance correctness on the tiny fixture and
  * word-count equivalence with the built-in text reader on the full
  * reference corpus.
  */
class LinesDataSourceSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  private val tmpDirs = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]

  private def tmpDir(prefix: String): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    tmpDirs += d
    d
  }

  override def afterAll(): Unit = tmpDirs.foreach { d =>
    org.apache.commons.io.FileUtils.deleteQuietly(d.toFile); ()
  }

  private def readLines(dir: String) =
    TestSpark.spark.read.format("graft.sources.LinesDataSource")
      .option("path", dir).option("pathGlobFilter", "*.txt").load()

  /** The full reference corpus lives OUTSIDE the repo — cancel (not
    * fail) on checkouts without it, like PtbTokenizerSpec does. */
  private val RefCorpus = "/root/reference/files/inputs"
  private def assumeRefCorpus(): Unit =
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(RefCorpus)),
      s"reference corpus $RefCorpus not present")

  test("provenance: line numbers and paths are exact on the tiny corpus") {
    val rows = readLines(TestSpark.corpusDir).collect()
    // a.txt has 2 lines, b.txt has 2, empty.txt 0; notes.pdf excluded
    assert(rows.length === 4)
    assert(!rows.exists(_.getString(0).endsWith(".pdf")))
    val a = rows.filter(_.getString(0).endsWith("a.txt")).sortBy(_.getLong(1))
    assert(a.map(_.getLong(1)).toSeq === Seq(1L, 2L))
    assert(a.head.getString(2).startsWith("The quick brown fox"))
    val empty = rows.filter(_.getString(0).endsWith("empty.txt"))
    assert(empty.isEmpty)
  }

  test("word count through the connector equals the built-in text reader") {
    assumeRefCorpus()
    val corpus = RefCorpus
    val viaConnector = WordCount.counts(readLines(corpus), "value")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaBuiltin = WordCount.wordcountText(TestSpark.spark, corpus)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaConnector === viaBuiltin)
    assert(viaConnector.size === 24113)
  }

  test("parallelism: one partition per file") {
    assumeRefCorpus()
    val n = readLines(RefCorpus).rdd.getNumPartitions
    assert(n === 8) // 8 Gutenberg books
  }

  test("write path: value column round-trips exactly, provenance regenerated") {
    val spark = TestSpark.spark
    import spark.implicits._
    val out = tmpDir("graft_lines_w_").toString
    val src = readLines(TestSpark.corpusDir)
    src.write.format("graft.sources.LinesDataSource")
      .option("path", out).mode("overwrite").save()
    val reread = readLines(out)
    // same multiset of line values
    assert(reread.select("value").as[String].collect().sorted.toSeq ===
      src.select("value").as[String].collect().sorted.toSeq)
    // provenance regenerated against the NEW files: per-file line_no
    // still starts at 1 and is dense
    val byFile = reread.collect().groupBy(_.getString(0))
    byFile.values.foreach { rows =>
      assert(rows.map(_.getLong(1)).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // overwrite truncates: writing a subset leaves no stale files behind
    src.limit(1).repartition(1).write.format("graft.sources.LinesDataSource")
      .option("path", out).mode("overwrite").save()
    assert(readLines(out).count() === 1L)
    // committed output contains no temp files
    assert(!new java.io.File(out).listFiles().exists(_.getName.endsWith(".tmp")))
  }

  test("write path rejects null value cells loudly") {
    val spark = TestSpark.spark
    import spark.implicits._
    val out = tmpDir("graft_lines_n_").toString
    val df = Seq(Some("ok"), None).toDF("value")
      .withColumn("path", lit("x")).withColumn("line_no", lit(1L))
    val e = intercept[Exception] {
      df.write.format("graft.sources.LinesDataSource")
        .option("path", out).mode("overwrite").save()
    }
    // the table schema declares value non-nullable, so Spark itself
    // asserts before the writer's own defensive check can fire
    val msgs = TestSpark.causeMessages(e)
    assert(msgs.exists(m =>
      m.contains("NOT_NULL_ASSERT_VIOLATION") || m.contains("null 'value'")),
      s"unexpected failure chain: $msgs")
  }

  test("write path rejects embedded line terminators loudly") {
    val spark = TestSpark.spark
    import spark.implicits._
    val out = tmpDir("graft_lines_t_").toString
    val e = intercept[Exception] {
      Seq("ok", "a\nb").toDF("value")
        .withColumn("path", lit("x")).withColumn("line_no", lit(1L))
        .write.format("graft.sources.LinesDataSource")
        .option("path", out).mode("overwrite").save()
    }
    val msgs2 = TestSpark.causeMessages(e)
    assert(msgs2.exists(_.contains("line terminators")),
      s"an embedded \\n must fail loudly, not split the row on reread: $msgs2")
  }

  test("reader passes malformed UTF-8 bytes through like the built-in text source") {
    val spark = TestSpark.spark
    // a Latin-1 'é' (0xE9) that is NOT valid UTF-8: a char-decoder path
    // would replace it with U+FFFD; the built-in text source carries the
    // raw byte. The connector is pinned byte-equal to the built-in.
    val dir = tmpDir("graft_lines_b_")
    java.nio.file.Files.write(dir.resolve("raw.txt"),
      Array[Byte]('c', 'a', 'f', 0xE9.toByte, '\n', 'o', 'k', '\n'))
    // compare BYTES, not Row.getString: UTF8String.toString decodes the
    // raw 0xE9 to U+FFFD on BOTH sides, so a string compare is satisfied
    // even when the connector mangles the byte — the exact vacuity this
    // test exists to prevent
    def bytes(df: org.apache.spark.sql.DataFrame): Seq[Seq[Byte]] =
      df.select(col("value").cast("binary")).collect()
        .map(_.getAs[Array[Byte]](0).toSeq)
        .sortBy(_.map("%02x".format(_)).mkString)
    val connector = bytes(readLines(dir.toString))
    val builtin = bytes(spark.read.text(dir.toString))
    // fixture premise: the built-in text source really carries the raw
    // invalid byte (0xE9), not a U+FFFD replacement
    assert(builtin.exists(_.contains(0xE9.toByte)),
      s"fixture premise broke — built-in source no longer byte-transparent: $builtin")
    assert(connector === builtin,
      s"connector mangled raw bytes: $connector vs builtin $builtin")
  }
}
