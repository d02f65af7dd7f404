package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE half of the DSv2 tour ([[RangeTableProvider]] is the read
  * half): a sink that exercises Spark's distributed commit protocol
  * end-to-end instead of hiding it behind a file format.
  *
  *  - each task's [[DataWriter]] folds its partition into constant
  *    state — a row count and an XOR of per-row Knuth hashes (XOR is
  *    commutative/associative, so the digest is independent of row
  *    order AND partitioning — the property that makes it mergeable at
  *    the driver without any ordering contract);
  *  - task `commit()` emits that state as a [[WriterCommitMessage]]
  *    (bytes-per-task is O(1) — the commit path carries digests, never
  *    data);
  *  - the driver's `commit(messages)` merges all task digests and
  *    ATOMICALLY publishes the audit record (tmp file + rename), so a
  *    reader either sees the full digest or nothing — task retries and
  *    speculative duplicates are resolved by Spark delivering exactly
  *    one commit message per task.
  *
  * The audit record is the sink's entire output: this is the "count +
  * checksum" manifest a 100 TB ingest writes next to its data so
  * downstream consumers can verify completeness without re-scanning. */
class AuditSinkProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType().add("id", org.apache.spark.sql.types.LongType)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AuditTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = true
}

class AuditTable(path: String) extends Table with SupportsWrite {
  override def name(): String = s"graft_audit($path)"
  override def schema(): StructType =
    new StructType().add("id", org.apache.spark.sql.types.LongType)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // overwrite == fresh audit record; the sink holds no prior state
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new AuditBatchWrite(path)
      }
    }
}

case class AuditMessage(rows: Long, xor: Long) extends WriterCommitMessage

class AuditBatchWrite(path: String) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new AuditWriterFactory

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    var rows = 0L
    var xor = 0L
    messages.foreach { case AuditMessage(r, x) => rows += r; xor ^= x }
    val tmp = java.nio.file.Paths.get(path + ".tmp")
    java.nio.file.Files.write(tmp,
      s"""{"n_rows": $rows, "xor_hash": $xor}""".getBytes("UTF-8"))
    // atomic publish: a reader sees the complete record or nothing
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(path),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class AuditWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var xor = 0L
      override def write(r: InternalRow): Unit = {
        rows += 1L
        xor ^= RangeSource.hash(r.getLong(0))
      }
      override def commit(): WriterCommitMessage = AuditMessage(rows, xor)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
