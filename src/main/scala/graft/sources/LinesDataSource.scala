package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.util.SerializableConfiguration
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
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

class LinesTable(properties: Map[String, String]) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_lines(${properties.getOrElse("path", "?")})"
  override def schema(): StructType = LinesDataSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val path = options.getOrDefault("path", properties.getOrElse("path", ""))
    // loud and named, like the write side — a bare "" would surface
    // later as Hadoop's obscure "Can not create a Path from an empty
    // string" with no mention of the missing option
    require(path.nonEmpty, "graft-lines read needs a path option")
    new LinesScanBuilder(path, Option(options.get("pathGlobFilter")))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val path = Option(info.options.get("path"))
      .orElse(properties.get("path"))
      .getOrElse(throw new IllegalArgumentException("graft-lines write needs a path"))
    val schema = info.schema()
    require(
      schema.exists(f => f.name == "value" && f.dataType == StringType),
      s"graft-lines write needs a string column named 'value', got ${schema.simpleString}")
    new LinesWriteBuilder(path, schema, info.queryId())
  }
}

/** Write side of the connector: each task streams its rows' `value`
  * column to one `part-<query>-NNNNN.txt` file under the target dir —
  * the reference's lines-in-files data model as a sink. Provenance
  * columns (`path`, `line_no`) are accepted and DROPPED: they are
  * derived on read, so a read→write→read round-trip reproduces `value`
  * exactly and regenerates provenance against the new files.
  *
  * Commit protocol:
  *  - final names embed the QUERY id, so an append job can never rename
  *    over a previous job's committed files;
  *  - each task attempt writes `.part-<query>-NNNNN-<task>.tmp` and
  *    renames to the final name in `DataWriter.commit()` — which Spark's
  *    output commit coordinator invokes for exactly ONE winning attempt
  *    per partition (useCommitCoordinator defaults to true), so
  *    speculative or zombie duplicates never interleave bytes;
  *  - aborted attempts delete their temp; `BatchWrite.commit` sweeps any
  *    orphaned temps of THIS query (e.g. an executor that died before
  *    its abort ran) and `BatchWrite.abort` does the same on failure;
  *  - the read path ignores dot-prefixed/underscore-prefixed files, so
  *    even an unswept temp is never returned as data.
  * Null `value` cells and values carrying embedded line terminators are
  * rejected loudly (a terminator written verbatim would reread as extra
  * rows — silent multiset corruption).
  *
  * Overwrite maps to SupportsTruncate; the truncate itself happens once
  * on the driver before writer tasks launch (non-atomic across the
  * whole job, like the built-in file sinks without a staging commit
  * protocol).
  */
class LinesWriteBuilder(path: String, schema: StructType, queryId: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new LinesBatchWrite(path, schema, doTruncate, queryId)
  }
}

case class LinesCommit(file: String, rows: Long) extends WriterCommitMessage

class LinesBatchWrite(path: String, schema: StructType, truncate: Boolean,
    queryId: String)
    extends BatchWrite {
  private val conf = new SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())
  private val valueIdx = schema.fieldIndex("value")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf.value)
    if (truncate && fs.exists(p)) fs.delete(p, true)
    fs.mkdirs(p)
    new LinesWriterFactory(path, valueIdx, conf, queryId)
  }

  /** Delete temps of THIS query only — a concurrent writer's in-flight
    * temps must not be touched. */
  private def sweepOwnTemps(): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf.value)
    if (fs.exists(p)) {
      Option(fs.globStatus(new Path(path, s".part-$queryId-*.tmp")))
        .getOrElse(Array.empty)
        .foreach(s => fs.delete(s.getPath, false))
    }
  }

  // orphaned temps exist when an executor died before its own abort ran;
  // commit happens after every partition's winning attempt renamed away
  // its temp, so anything left with this query's prefix is garbage
  override def commit(messages: Array[WriterCommitMessage]): Unit = sweepOwnTemps()
  override def abort(messages: Array[WriterCommitMessage]): Unit = sweepOwnTemps()
}

class LinesWriterFactory(path: String, valueIdx: Int,
    conf: SerializableConfiguration, queryId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val fs = new Path(path).getFileSystem(conf.value)
      private val tmp = new Path(path, f".part-$queryId-$partitionId%05d-$taskId.tmp")
      private val dst = new Path(path, f"part-$queryId-$partitionId%05d.txt")
      private val out = fs.create(tmp, true)
      private var rows = 0L

      override def write(row: InternalRow): Unit = {
        val v = row.getUTF8String(valueIdx)
        if (v == null)
          throw new IllegalArgumentException(
            "graft-lines write does not support null 'value' cells")
        val bytes = v.getBytes
        var i = 0
        while (i < bytes.length) {
          // loud, like the null check: a value carrying a line
          // terminator would be written verbatim and reread as MULTIPLE
          // rows — silent multiset corruption on round-trip
          if (bytes(i) == '\n' || bytes(i) == '\r')
            throw new IllegalArgumentException(
              "graft-lines write does not support embedded line " +
                "terminators in 'value' (the reread would split the row)")
          i += 1
        }
        out.write(bytes)
        out.write('\n')
        rows += 1L
      }

      override def commit(): WriterCommitMessage = {
        out.close()
        // Only the coordinator-elected attempt reaches here. The name is
        // query-scoped, so an EXISTING dst can only be this query's own
        // partition output from an earlier elected attempt that died
        // after its rename — replace it ATOMICALLY (Rename.OVERWRITE):
        // a delete-then-rename pair has a window where a ZOMBIE earlier
        // attempt (stalled through its failure, resuming here after the
        // retry winner committed and the job swept temps) deletes the
        // winner's file and then fails its own rename — dst gone after
        // job success. With the atomic form the zombie's rename just
        // fails on its missing temp and dst is never unlinked.
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          fs.getUri, conf.value)
        try fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        catch { case e: java.io.IOException =>
          throw new java.io.IOException(
            s"graft-lines commit rename failed: $tmp -> $dst", e)
        }
        LinesCommit(dst.toString, rows)
      }

      override def abort(): Unit = {
        try out.close() catch { case _: Throwable => () }
        try fs.delete(tmp, false) catch { case _: Throwable => () }
      }

      override def close(): Unit = ()
    }
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
    // hidden-file convention (same as Spark's file sources): temp or
    // marker files (.part-*.tmp, _SUCCESS) are never data. Checked on
    // every path SEGMENT under the root, not just the leaf name (sweep
    // r18 — the same class Tables' footer reader closed in r17): Hadoop
    // globs match hidden directories too, so a multi-level glob crossing
    // a concurrent writer's `_temporary`/`.staging` tree would otherwise
    // return in-flight partial files as data.
    // The upward walk must stop AT the data root (a hidden-named root
    // the user explicitly pointed at is data, and segments ABOVE the
    // root are none of our business — a CI `_work` or `.cache` ancestor
    // must not classify every file as hidden). Termination is by PATH
    // equality with each ancestor qualified through the same fs as the
    // root (ADVICE r18): string comparison against one qualification
    // form breaks the moment listStatus/globStatus return a different
    // authority/relative form, and the old walk then silently climbed
    // past the root — the exact silent-empty-scan class the exists
    // check above guards against. Walking off the top without ever
    // meeting the root is that divergence made visible: fail loud.
    val rootQ = fs.makeQualified(p)
    def underHiddenSegment(leaf: Path): Boolean = {
      var cur = leaf
      while (cur != null) {
        if (fs.makeQualified(cur) == rootQ) return false
        val n = cur.getName
        if (n.startsWith(".") || n.startsWith("_")) return true
        cur = cur.getParent
      }
      throw new IllegalStateException(
        s"graft-lines: file $leaf walked to the filesystem root without " +
          s"passing the data root $rootQ — path qualification forms " +
          "diverged; refusing to apply the hidden-segment rule above the root")
    }
    val files = Option(matcher match {
      case Some(g) => fs.globStatus(g)
      case None => fs.listStatus(p)
    }).getOrElse(Array.empty)
      .filter(_.isFile)
      .filterNot(f => underHiddenSegment(f.getPath))
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
      // RAW bytes, not an InputStreamReader: a char decoder silently
      // replaces malformed UTF-8 with U+FFFD, while Spark's built-in
      // text source passes the original bytes through as UTF8String —
      // the connector is spec-pinned equivalent to it, and a
      // read→write→read cycle must never mangle bytes. Terminators
      // match BufferedReader.readLine / Hadoop's LineRecordReader:
      // \n, \r\n, and lone \r.
      private val in = new java.io.BufferedInputStream(
        p.getFileSystem(conf.value).open(p))
      private val buf = new java.io.ByteArrayOutputStream(256)
      private val pathUtf8 = UTF8String.fromString(file)
      private var lineNo = 0L
      private var line: Array[Byte] = _

      override def next(): Boolean = {
        var b = in.read()
        if (b == -1) return false
        buf.reset()
        var done = false
        while (!done) {
          if (b == -1 || b == '\n') done = true
          else if (b == '\r') {
            in.mark(1)
            if (in.read() != '\n') in.reset() // lone \r terminates too
            done = true
          } else {
            buf.write(b)
            b = in.read()
          }
        }
        line = buf.toByteArray
        lineNo += 1
        true
      }

      override def get(): InternalRow =
        InternalRow(pathUtf8, lineNo, UTF8String.fromBytes(line))

      override def close(): Unit = in.close()
    }
  }
}
