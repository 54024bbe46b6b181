package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import scala.util.Using

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import graft.sources.Formats

/** Physical contract of the training-epoch shuffle sink
  * ([[TextAnalysis.docShuffleShards]]): one file per shard, rows inside
  * each file sorted by sort_key, shard = first hex digit of the key, and
  * the union of the shard files is exactly the corpus — so a trainer
  * streaming the files sequentially in (shard, file order) replays the
  * md5 permutation with no runtime shuffle buffer.
  */
class ShuffleShardsSpec extends AnyFunSuite {

  test("shuffle sink writes one sorted file per shard covering the corpus") {
    val spark = TestSpark.spark
    val manifest = TextAnalysis.docShuffleShards(spark, TestSpark.Sf0001)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getString(2), r.getString(3)))).toMap

    val dest = Paths.get(Formats.tmp("doc_shuffle", TestSpark.Sf0001))
    val shardDirs = Using.resource(Files.list(dest))(_.iterator().asScala
      .filter(_.getFileName.toString.startsWith("shard=")).toSeq)
    assert(shardDirs.size === TextAnalysis.ShuffleShards)

    val hex = "0123456789abcdef"
    var total = 0L
    shardDirs.foreach { d =>
      val shard = d.getFileName.toString.stripPrefix("shard=").toInt
      val parts = Using.resource(Files.list(d))(_.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq)
      // repartition(shard) routes a whole shard to ONE task, so the
      // partitionBy write must leave exactly one file per shard dir
      assert(parts.size === 1, s"shard $shard split across ${parts.size} files")

      val rows = spark.read.parquet(parts.head.toString)
        .select("sort_key").collect().map(_.getString(0)).toSeq
      assert(rows === rows.sorted, s"shard $shard file not sorted by sort_key")
      rows.foreach(k => assert(hex.indexOf(k.charAt(0)) === shard,
        s"key $k routed to wrong shard $shard"))

      val (n, first, last) = manifest(shard)
      assert(rows.size.toLong === n)
      assert(rows.head === first && rows.last === last)
      total += n
    }
    // every document lands in exactly one shard
    val nDocs = spark.read
      .parquet(s"${TestSpark.Sf0001}/documents.parquet").count()
    assert(total === nDocs)
  }
}
