package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions.{col, collect_set, input_file_name, max}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Maintenance

/** The property that makes the bloom-indexed rewrite worth shipping:
  * every row group of every output file carries a bloom filter on
  * l_partkey whose answers are usable for row-group skipping —
  * NO false negatives (a key present in a file is admitted by at least
  * one of its row-group blooms; parquet-mr would otherwise silently
  * drop rows under predicate pushdown) and a bounded false-positive
  * rate (keys absent from the whole dataset are rejected by every
  * row-group bloom of a file almost always, which is exactly the
  * negative-lookup skip that footer min/max cannot provide on an
  * unclustered column). Content preservation is the driver's
  * maint_bloom_index oracle row; this spec pins the footer-level index
  * itself with the parquet-mr reader — the same metadata the scan's
  * row-group filter consults.
  */
class BloomFilterSkipSpec extends AnyFunSuite {

  test("every row group carries a usable l_partkey bloom filter") {
    val spark = TestSpark.spark
    val dest = Maintenance.bloomIndexedCopy(spark, TestSpark.Sf001)

    // truth: distinct partkeys per physical file, and the global max
    val perFile = spark.read.parquet(dest)
      .groupBy(input_file_name().as("f"))
      .agg(collect_set(col("l_partkey")).as("keys"), max("l_partkey").as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toSet, r.getLong(2)))
    assert(perFile.length === 4, "rewrite must produce the planned 4 files")
    val globalMax = perFile.map(_._3).max

    val conf = spark.sessionState.newHadoopConf()
    var rowGroups = 0
    perFile.foreach { case (fileUri, presentKeys, _) =>
      val path = new Path(new java.net.URI(fileUri))
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        assert(blocks.nonEmpty)
        val blooms = blocks.map { block =>
          val chunk = block.getColumns.asScala
            .find(_.getPath.toDotString == "l_partkey")
            .getOrElse(fail(s"no l_partkey chunk in $path"))
          val bf = reader.getBloomFilterDataReader(block).readBloomFilter(chunk)
          assert(bf != null, s"row group without an l_partkey bloom in $path")
          bf
        }
        rowGroups += blooms.size

        // no false negatives: every key actually in the file is admitted
        // by at least one of its row-group blooms
        presentKeys.foreach { k =>
          assert(blooms.exists(b => b.findHash(b.hash(k))),
            s"present key $k rejected by every bloom of $path")
        }

        // bounded false positives: keys beyond the key domain must be
        // rejected by EVERY row group of this file nearly always
        // (fpp 0.01/group; admit-anywhere probability ~= groups x 0.01)
        val absent = (globalMax + 1) to (globalMax + 200)
        val leaked = absent.count(k => blooms.exists(b => b.findHash(b.hash(k))))
        assert(leaked <= 20,
          s"$leaked/200 absent keys admitted in $path — bloom sized wrong")
      } finally reader.close()
    }
    // small row groups exist so skipping is per-group, not per-file
    assert(rowGroups > perFile.length,
      s"only $rowGroups row groups across ${perFile.length} files — " +
        "block size option did not take effect")

    val fs = new Path(dest).getFileSystem(conf)
    fs.delete(new Path(dest), true); ()
  }
}
