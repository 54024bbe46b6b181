package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.util.SerializableConfiguration
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 connector: newline-delimited text with per-line
  * PROVENANCE — `(path, line_no, value)` — which the built-in text
  * reader cannot provide (input_file_name() gives the file but not the
  * line number). The reference engine's data model is lines-in-files
  * (SURVEY.md §1), so this is its natural connector twin with lineage.
  *
  * Usage: `spark.read.format("graft.sources.LinesDataSource")
  *   .option("path", dir).option("pathGlobFilter", "*.txt").load()`
  *
  * Scale notes: one input partition per FILE (line numbering is a
  * sequential property — a mid-file split cannot know its starting line
  * without a pre-scan, the classic trade-off for provenance sources);
  * parallelism comes from file count, like the reference's N map tasks
  * over N files. Readers stream line-by-line, never materializing a
  * file.
  */
class LinesDataSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LinesDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new LinesTable(properties.asScala.toMap)
}

object LinesDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("line_no", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))
}

class LinesTable(properties: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"graft_lines(${properties.getOrElse("path", "?")})"
  override def schema(): StructType = LinesDataSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LinesScanBuilder(
      options.getOrDefault("path", properties.getOrElse("path", "")),
      Option(options.get("pathGlobFilter")))
}

class LinesScanBuilder(path: String, glob: Option[String]) extends ScanBuilder {
  override def build(): Scan = new LinesScan(path, glob)
}

case class LinesFilePartition(file: String) extends InputPartition

class LinesScan(path: String, glob: Option[String]) extends Scan with Batch {
  override def readSchema(): StructType = LinesDataSource.Schema
  override def toBatch: Batch = this

  // the SESSION's Hadoop conf (fs credentials, custom fs impls), captured
  // at plan time on the driver and shipped serialized to the readers — a
  // bare `new Configuration()` silently drops session filesystem settings
  private val hadoopConf = new SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf.value)
    // a typo'd path must fail loudly, not read as an empty table
    // (globStatus quietly returns null/empty for missing parents)
    if (!fs.exists(p))
      throw new java.io.FileNotFoundException(s"graft-lines path does not exist: $path")
    val matcher = glob.map(g => new Path(path, g))
    val files = Option(matcher match {
      case Some(g) => fs.globStatus(g)
      case None => fs.listStatus(p)
    }).getOrElse(Array.empty).filter(_.isFile)
    files.map(f => LinesFilePartition(f.getPath.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LinesReaderFactory(hadoopConf)
}

class LinesReaderFactory(conf: SerializableConfiguration) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[LinesFilePartition].file
    new PartitionReader[InternalRow] {
      private val p = new Path(file)
      private val in = new BufferedReader(new InputStreamReader(
        p.getFileSystem(conf.value).open(p), StandardCharsets.UTF_8))
      private val pathUtf8 = UTF8String.fromString(file)
      private var lineNo = 0L
      private var line: String = _

      override def next(): Boolean = {
        line = in.readLine()
        if (line != null) { lineNo += 1; true } else false
      }

      override def get(): InternalRow =
        InternalRow(pathUtf8, lineNo, UTF8String.fromString(line))

      override def close(): Unit = in.close()
    }
  }
}
