package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.Maintenance
import graft.sources.Formats

/** The two claims maint_recompress exists for. Content preservation is
  * the driver's oracle row; this spec pins (a) the footers actually
  * carry ZSTD (a silently-ignored writer option would pass every
  * content check while shipping snappy bytes), and (b) the size win is
  * real under a CONTROLLED comparison — same writer, same data, same
  * layout, codec the only variable. Comparing against the driver-
  * generated source file would confound writer encodings with codec;
  * writing both codecs ourselves isolates the one claim.
  */
class RecompressSpec extends AnyFunSuite {

  test("zstd rewrite: footers say ZSTD and bytes shrink vs snappy") {
    val spark = TestSpark.spark
    val dir = TestSpark.Sf001

    val zstdDir = Maintenance.recompressedCopy(spark, dir)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(zstdDir).getFileSystem(conf)

    // (a) every column chunk of every file is ZSTD
    fs.listStatus(new Path(zstdDir))
      .filter(_.getPath.getName.startsWith("part-")).foreach { st =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(st.getPath, conf))
        try r.getFooter.getBlocks.asScala.foreach { b =>
          b.getColumns.asScala.foreach { c =>
            assert(c.getCodec.name === "ZSTD",
              s"${c.getPath}: codec ${c.getCodec} in ${st.getPath}")
          }
        } finally r.close()
      }

    // (b) controlled codec-only comparison
    val snappyDir = Formats.tmp("maint_snappy_ctrl", dir)
    Tables.lineitem(spark, dir)
      .write.mode("overwrite").option("compression", "snappy").parquet(snappyDir)
    val zstdBytes = Maintenance.dataBytes(spark, zstdDir)
    val snappyBytes = Maintenance.dataBytes(spark, snappyDir)
    assert(zstdBytes > 0 && snappyBytes > 0)
    assert(zstdBytes < snappyBytes * 0.95,
      s"zstd $zstdBytes vs snappy $snappyBytes — no material size win")

    fs.delete(new Path(snappyDir), true); ()
  }
}
