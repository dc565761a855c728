package graft.sources

import java.util.{List => JList, Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for the reference's tagged activity wire format —
  * the custom-source extension point exercised for real: `spark.read
  * .format("graft.sources.ActivityDataSource").load(dir)` yields the same
  * unified schema as [[ActivityParser.fromTagged]] (plus the tombstone/
  * error rows, which the caller filters), with COLUMN PRUNING pushed into
  * the reader via `SupportsPushDownRequiredColumns` — a projection of two
  * columns parses only those two fields' values into rows.
  *
  * The row-level parser mirrors the expression parser's semantics EXACTLY
  * (missing field → null like `element_at` past the end, bad int → null
  * like an ANSI-off cast, `[a, b]` tag lists, trailing-Z/fraction
  * timestamp quirks); `ActivityDataSourceSpec` asserts row-set equality
  * against [[ActivityParser.parseTagged]] on both generated and
  * handcrafted-quirk lines, and `ldbc_dsv2` runs the full
  * format→parse→resolve→window pipeline through this source against the
  * same closed-form oracle as `ldbc_e2e`.
  *
  * Scale: one `InputPartition` per file (the standard file-source
  * granularity; a production variant would further split by byte range);
  * parsing is per-line in the reader with zero driver involvement.
  */
class ActivityDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ActivityDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new ActivityTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object ActivityDataSource {
  /** The unified activity schema — field-for-field the output of
    * [[ActivityParser.parseTagged]] (SURVEY.md §1.3). */
  val schema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("event_id", IntegerType),
    StructField("person_id", IntegerType),
    StructField("post_id", IntegerType),
    StructField("parent_id", IntegerType),
    StructField("creation_ts", TimestampType),
    StructField("content", StringType),
    StructField("image_file", StringType),
    StructField("location_ip", StringType),
    StructField("browser", StringType),
    StructField("language", StringType),
    StructField("tags", ArrayType(IntegerType)),
    StructField("forum_id", IntegerType),
    StructField("place_id", IntegerType)))

  // ---- row-level mirrors of the ActivityParser expression semantics ----

  /** `element_at(split(line, "\\|", -1), i)` — null past the end. */
  private def fld(a: Array[String], i: Int): String =
    if (i >= 1 && i <= a.length) a(i - 1) else null

  /** ANSI-off `cast(string as int)`: trimmed, null on garbage/null.
    * DOCUMENTED DIVERGENCE (same class as the unparseable-timestamp note
    * below): under Spark 4's ANSI default, the expression parser's
    * `cast("int")` THROWS on a garbage numeric field; this reader degrades
    * to NULL — an ingestion source must not crash the job on one bad
    * record. Covered by `ActivityDataSourceSpec`'s int-quirk test. */
  private[graft] def toIntOrNull(s: String): Integer =
    if (s == null) null
    else s.trim.toIntOption.map(Integer.valueOf).orNull

  /** `intOrNull`: empty string → null, else cast. */
  private def emptyToNullInt(s: String): Integer =
    if (s == null || s == "") null else toIntOrNull(s)

  /** [[ActivityParser.parseTs]]: trim trailing Zs, first 19 chars as
    * `yyyy-MM-dd'T'HH:mm:ss` UTC, optional left-aligned 1-3 digit
    * millisecond fraction. Returns epoch MICROS or null. */
  private val fracRe = "\\.([0-9]{1,3})".r
  def parseTsMicros(s0: String): java.lang.Long = {
    if (s0 == null) return null
    val t = s0.replaceAll("Z+$", "")
    if (t.length < 19) return null
    val base =
      try java.time.LocalDateTime.parse(t.substring(0, 19),
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"))
      catch { case _: Exception => return null }
    val millis = fracRe.findFirstMatchIn(t)
      .map(m => (m.group(1) + "00").take(3).toLong).getOrElse(0L)
    java.lang.Long.valueOf(
      base.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + millis * 1000L)
  }

  /** [[ActivityParser.parseTags]]: `[5183, 1912]` → int array; blank →
    * empty array; per-element cast failures → null elements. */
  def parseTagsArr(s: String): GenericArrayData = {
    if (s == null) return new GenericArrayData(Array.empty[Any])
    val inner = s.replaceAll("[\\[\\]]", "").trim
    if (inner.isEmpty) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(
      inner.split(",\\s*", -1).map(e => toIntOrNull(e).asInstanceOf[Any]))
  }

  private def u(s: String): UTF8String = if (s == null) null else UTF8String.fromString(s)
  private val emptyTags = new GenericArrayData(Array.empty[Any])

  /** One tagged wire line → the full 14-value unified row (boxed/catalyst
    * values in [[schema]] order). Dispatch and per-variant field layout
    * mirror `ActivityParser.parseTagged`. */
  def parseLine(line: String): Array[Any] = {
    val tag = if (line.nonEmpty) line.substring(0, 1) else ""
    val a = line.split("\\|", -1)
    tag match {
      case "P" => Array[Any](
        u("post"), toIntOrNull(fld(a, 2)), toIntOrNull(fld(a, 3)),
        toIntOrNull(fld(a, 2)), null, parseTsMicros(fld(a, 4)),
        u(fld(a, 9)), u(fld(a, 5)), u(fld(a, 6)), u(fld(a, 7)), u(fld(a, 8)),
        parseTagsArr(fld(a, 10)), emptyToNullInt(fld(a, 11)), emptyToNullInt(fld(a, 12)))
      case "C" =>
        val directPost = fld(a, 8)
        val isReply = directPost != null && directPost == ""
        Array[Any](
          u(if (isReply) "reply" else "comment"),
          toIntOrNull(fld(a, 2)), toIntOrNull(fld(a, 3)),
          if (isReply) null else toIntOrNull(directPost),
          if (isReply) toIntOrNull(fld(a, 9)) else null,
          parseTsMicros(fld(a, 4)),
          u(fld(a, 7)), null, u(fld(a, 5)), u(fld(a, 6)), null,
          emptyTags, null, emptyToNullInt(fld(a, 10)))
      case "L" => Array[Any](
        u("like"), null, toIntOrNull(fld(a, 2)), toIntOrNull(fld(a, 3)), null,
        parseTsMicros(fld(a, 4)),
        null, null, null, null, null, emptyTags, null, null)
      case "T" => Array[Any](
        u("tombstone"), null, null, toIntOrNull(fld(a, 2)), null,
        parseTsMicros(fld(a, 3)),
        null, null, null, null, null, emptyTags, null, null)
      case _ => Array[Any](
        u("error"), null, null, null, null, null,
        u(line), null, null, null, null, emptyTags, null, null)
    }
  }

  // ---- the writer's inverse mapping ----

  /** Epoch micros → the wire timestamp [[parseTsMicros]] reads back to the
    * same value: seconds + optional 3-digit millis + trailing Z. */
  private def formatTsMicros(micros: Long): String = {
    val base = java.time.LocalDateTime
      .ofEpochSecond(Math.floorDiv(micros, 1000000L), 0, java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"))
    val ms = Math.floorMod(micros, 1000000L) / 1000L
    base + (if (ms > 0) f".$ms%03d" else "") + "Z"
  }

  /** One unified-schema row → its tagged wire line — the exact inverse of
    * [[parseLine]] on parsed corpus rows (null scalars serialize as empty
    * fields, which parse back to null; `error` rows re-emit their original
    * line verbatim, so even unparseable input round-trips). The one
    * documented degradation: a null STRING field in a position the parser
    * reads (e.g. a handcrafted post with null content) serializes as the
    * empty field and reads back as "" — absent-vs-empty is not
    * representable in the wire format itself. */
  def serializeLine(row: InternalRow): String = {
    def s(i: Int): String =
      if (row.isNullAt(i)) "" else row.getUTF8String(i).toString
    def n(i: Int): String =
      if (row.isNullAt(i)) "" else row.getInt(i).toString
    def ts(i: Int): String =
      if (row.isNullAt(i)) "" else formatTsMicros(row.getLong(i))
    def tags(i: Int): String =
      if (row.isNullAt(i)) ""
      else {
        val a = row.getArray(i)
        "[" + (0 until a.numElements()).map(j =>
          if (a.isNullAt(j)) "" else a.getInt(j).toString).mkString(", ") + "]"
      }
    s(0) match {
      case "post" =>
        s"P|${n(1)}|${n(2)}|${ts(5)}|${s(7)}|${s(8)}|${s(9)}|${s(10)}|${s(6)}|${tags(11)}|${n(12)}|${n(13)}"
      case "comment" =>
        s"C|${n(1)}|${n(2)}|${ts(5)}|${s(8)}|${s(9)}|${s(6)}|${n(3)}||${n(13)}"
      case "reply" =>
        s"C|${n(1)}|${n(2)}|${ts(5)}|${s(8)}|${s(9)}|${s(6)}||${n(4)}|${n(13)}"
      case "like" =>
        s"L|${n(2)}|${n(3)}|${ts(5)}"
      case "tombstone" =>
        s"T|${n(3)}|${ts(5)}"
      case _ => s(6) // error: the original raw line, verbatim
    }
  }
}

private[sources] class ActivityTable(path: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"activity($path)"
  override def schema(): StructType = ActivityDataSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Set.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
                     TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ActivityScanBuilder(Option(path).getOrElse(options.get("path")))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ActivityWriteBuilder(
      Option(path).getOrElse(info.options.get("path")))
}

/** The WRITE half of the extension point — the Kafka-producer stand-in
  * serializing the unified activity schema BACK to the tagged wire format
  * ([[ActivityDataSource.serializeLine]] is the exact inverse of
  * [[ActivityDataSource.parseLine]] on parsed corpus rows, asserted
  * round-trip in `ActivityDataSourceSpec`). Standard V2 two-phase commit:
  * tasks write `_tmp-` part files (invisible to the reader's `_`-prefix
  * filter), the driver commit renames them — and, for overwrite mode
  * (`SupportsTruncate`), first deletes the previous committed files — so a
  * failed job never leaves a half-visible mix. */
private[sources] class ActivityWriteBuilder(path: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new ActivityBatchWrite(path, doTruncate)
  }
}

private[sources] case class ActivityCommitMessage(tmpFile: String)
    extends WriterCommitMessage

private[sources] class ActivityBatchWrite(path: String, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    new ActivityWriterFactory(path)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = java.nio.file.Paths.get(path)
    val tmps = messages.map(_.asInstanceOf[ActivityCommitMessage].tmpFile).toSet
    if (truncate)
      scala.util.Using.resource(java.nio.file.Files.list(dir)) { st =>
        st.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .filterNot(p => tmps.contains(p.toString))
          .foreach(java.nio.file.Files.delete)
      }
    tmps.foreach { t =>
      val p = java.nio.file.Paths.get(t)
      java.nio.file.Files.move(p,
        p.resolveSibling(p.getFileName.toString.stripPrefix("_tmp-")),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case ActivityCommitMessage(t) =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(t))
    }
}

private[sources] class ActivityWriterFactory(path: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ActivityDataWriter(path, partitionId, taskId)
}

private[sources] class ActivityDataWriter(path: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val tmp = java.nio.file.Paths.get(path,
    f"_tmp-part-$partitionId%05d-$taskId")
  private val out = java.nio.file.Files.newBufferedWriter(tmp)
  override def write(row: InternalRow): Unit = {
    out.write(ActivityDataSource.serializeLine(row))
    out.write("\n")
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    ActivityCommitMessage(tmp.toString)
  }
  override def abort(): Unit = {
    out.close()
    java.nio.file.Files.deleteIfExists(tmp)
  }
  override def close(): Unit = ()
}

private[sources] class ActivityScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = ActivityDataSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new ActivityScan(path, required)
}

private[sources] class ActivityScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"ActivityScan(path=$path, columns=${required.fieldNames.mkString(",")})"
  override def planInputPartitions(): Array[InputPartition] = {
    val p = java.nio.file.Paths.get(path)
    val files =
      if (java.nio.file.Files.isDirectory(p))
        // Using: Files.list holds a directory fd until the stream closes —
        // an unclosed stream here leaks one fd per scan
        scala.util.Using.resource(java.nio.file.Files.list(p)) { st =>
          st.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .filterNot(_.getFileName.toString.startsWith("_"))
            .map(_.toString).toArray.sorted
        }
      else Array(path)
    files.map(f => ActivityFilePartition(f): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ActivityReaderFactory(required.fieldNames)
}

private[sources] case class ActivityFilePartition(file: String) extends InputPartition

private[sources] class ActivityReaderFactory(columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ActivityPartitionReader(
      partition.asInstanceOf[ActivityFilePartition].file, columns)
}

private[sources] class ActivityPartitionReader(file: String, columns: Array[String])
    extends PartitionReader[InternalRow] {
  private val indices = columns.map(ActivityDataSource.schema.fieldIndex)
  private val stream = java.nio.file.Files.lines(java.nio.file.Paths.get(file))
  private val it = stream.iterator()
  private var current: InternalRow = _
  override def next(): Boolean =
    if (it.hasNext) {
      val full = ActivityDataSource.parseLine(it.next())
      current = new GenericInternalRow(indices.map(full)) // pruned projection
      true
    } else false
  override def get(): InternalRow = current
  override def close(): Unit = stream.close()
}
