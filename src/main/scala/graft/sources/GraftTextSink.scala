package graft.sources

import java.io.{BufferedWriter, File, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The write half of the connector surface — a DataSource V2 batch
  * SINK implementing the V2 transactional commit protocol, the
  * contract a Kafka-producer-like or warehouse sink implements for
  * exactly-once batch writes:
  *
  *   executors: `DataWriter.write(row)*` → `commit(): WriterCommitMessage`
  *     (each task stages its output as an invisible `_tmp_*` file and
  *     reports the staged name back — nothing is visible yet)
  *   driver: `BatchWrite.commit(messages)` renames every staged file
  *     to its final `part-*.txt` name and drops a `_SUCCESS` marker —
  *     the all-or-nothing publish step; `BatchWrite.abort(messages)`
  *     deletes the staged files instead, so a failed job leaves NO
  *     partial output (spec-asserted by poisoning one task).
  *
  * Rows serialize as RFC-4180 CSV text in UTF-8 (`Double.toString` is
  * round-trip exact, so a CSV read recovers identical values — the
  * round-trip entry is DuckDB-oracle-checked). String fields containing
  * the delimiter, a quote, or a newline are quoted with inner quotes
  * doubled; read those back with `option("escape", "\"")` (+
  * `multiLine` for embedded newlines) — spec-asserted in Round6Spec.
  * `supportsExternalMetadata` lets the write path hand the query's
  * schema straight to the table.
  */
class GraftTextSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "graft-text is a write-only sink; read the written files back as CSV")

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "graft-text sink requires option(\"path\", ...)")
    new GraftTextTable(path, schema)
  }
}

class GraftTextTable(path: String, writeSchema: StructType)
  extends Table with SupportsWrite {
  override def name(): String = s"graft_text($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)

  // SupportsStreamingUpdateAsAppend: Update-mode rows are written as
  // appended changelog records (the Kafka-sink convention — a
  // compacted/upsert sink where the READER reduces by latest-per-key),
  // which is exactly this sink's read-back contract.
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder
      with org.apache.spark.sql.internal.connector.SupportsStreamingUpdateAsAppend {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new GraftTextBatchWrite(path, info.schema())
        override def toStreaming: streaming.StreamingWrite =
          new GraftTextStreamingWrite(path, info.schema())
      }
    }
}

case class GraftTextCommitMessage(stagedName: String, rows: Long)
  extends WriterCommitMessage

class GraftTextBatchWrite(path: String, schema: StructType) extends BatchWrite {
  new File(path).mkdirs()

  // job-unique part prefix: a second Append to the same path must add
  // files, not rename onto (and silently destroy) an earlier batch's
  // part-NNNNN names
  private val jobId = java.util.UUID.randomUUID.toString.replace("-", "").take(12)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftTextWriterFactory(path, schema)

  /** The publish step: staged files become visible atomically-enough
    * for a local filesystem (per-file rename is atomic; a reader keys
    * on the `_SUCCESS` marker written last). On a real object store
    * this is the same shape as a commit-coordinator / manifest write. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    messages.zipWithIndex.foreach { case (m, i) =>
      val msg = m.asInstanceOf[GraftTextCommitMessage]
      val ok = new File(path, msg.stagedName)
        .renameTo(new File(path, f"part-$jobId-$i%05d.txt"))
      require(ok, s"failed to publish ${msg.stagedName}")
    }
    new File(path, "_SUCCESS").createNewFile()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftTextCommitMessage(staged, _) => new File(path, staged).delete()
      case _ =>
    }
}

class GraftTextWriterFactory(path: String, schema: StructType)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftTextDataWriter(path, schema, s"_tmp_${partitionId}_$taskId")
}

/** The streaming face of the same commit protocol — what makes the
  * connector's write half exactly-once under micro-batch execution:
  *
  *   - every epoch is an independent transactional commit: executors
  *     stage `_tmp_e<epoch>_*` files, the driver's
  *     `commit(epochId, messages)` publishes them;
  *   - final names are a DETERMINISTIC function of (epochId, message
  *     index) — when a failed/restarted query REPLAYS an epoch (the
  *     replayable-source contract), the re-commit renames onto the
  *     same `part-e<epoch>-*` names, replacing rather than
  *     duplicating: commit is idempotent per epoch, so
  *     replayable source + idempotent sink = exactly-once end-to-end
  *     (idempotence is spec-asserted by double-committing an epoch);
  *   - `abort(epochId, ...)` deletes that epoch's staged files only —
  *     previously committed epochs stay visible.
  *
  * A `_commit_e<epoch>` marker (underscore-invisible to readers)
  * records each published epoch, the local-FS stand-in for a stream
  * sink's commit log.
  */
class GraftTextStreamingWrite(path: String, schema: StructType)
  extends streaming.StreamingWrite {
  new File(path).mkdirs()

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): streaming.StreamingDataWriterFactory =
    new GraftTextStreamingWriterFactory(path, schema)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    // a replayed epoch may run with FEWER writer partitions than the
    // failed attempt — renaming onto part-e<epoch>-0..N would then
    // leave the first attempt's higher-indexed part files (and any
    // orphaned _tmp stages) visible beside the replay's, duplicating
    // rows. Publish must be a true REPLACE of the epoch: clear every
    // prior part-e<epoch>-* / _tmp_e<epoch>_* before renaming.
    val dir = new File(path)
    Option(dir.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.getName.startsWith(s"part-e$epochId-") ||
          f.getName.startsWith(s"_tmp_e${epochId}_")) {
        val staged = messages.exists {
          case GraftTextCommitMessage(s0, _) => s0 == f.getName
          case _ => false
        }
        if (!staged) f.delete()
      }
    }
    messages.zipWithIndex.foreach { case (m, i) =>
      val msg = m.asInstanceOf[GraftTextCommitMessage]
      val ok = new File(path, msg.stagedName)
        .renameTo(new File(path, f"part-e$epochId-$i%05d.txt"))
      require(ok, s"failed to publish ${msg.stagedName} for epoch $epochId")
    }
    new File(path, s"_commit_e$epochId").createNewFile()
    ()
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftTextCommitMessage(staged, _) => new File(path, staged).delete()
      case _ =>
    }
}

class GraftTextStreamingWriterFactory(path: String, schema: StructType)
  extends streaming.StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new GraftTextDataWriter(path, schema, s"_tmp_e${epochId}_${partitionId}_$taskId")
}

class GraftTextDataWriter(
    path: String, schema: StructType, stagedName: String)
  extends DataWriter[InternalRow] {

  // staged invisible until the driver's commit renames it
  private val file = new File(path, stagedName)
  private var out: BufferedWriter = _
  private var rows = 0L

  // RFC-4180: fields containing the delimiter, a quote, or a newline
  // are quoted; inner quotes double
  private def csvEscape(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  private def field(row: InternalRow, i: Int): String = schema(i).dataType match {
    case LongType => row.getLong(i).toString
    case IntegerType => row.getInt(i).toString
    case DoubleType => row.getDouble(i).toString // round-trip exact
    case StringType => csvEscape(row.getUTF8String(i).toString)
    case BooleanType => row.getBoolean(i).toString
    case other => sys.error(s"graft-text sink: unsupported type $other")
  }

  override def write(row: InternalRow): Unit = {
    if (out == null) out = new BufferedWriter(
      new OutputStreamWriter(new FileOutputStream(file), StandardCharsets.UTF_8))
    out.write(schema.indices.map(field(row, _)).mkString(","))
    out.newLine()
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close() else file.createNewFile()
    GraftTextCommitMessage(stagedName, rows)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    file.delete()
  }

  override def close(): Unit = ()
}
