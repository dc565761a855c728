package graft.sources

import java.util.{List => JList, Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
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
}

private[sources] class ActivityTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"activity($path)"
  override def schema(): StructType = ActivityDataSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Set.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ActivityScanBuilder(Option(path).getOrElse(options.get("path")))
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
