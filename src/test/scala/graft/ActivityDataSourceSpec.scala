package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{ActivityDataSource, ActivityParser}

/** The DataSource V2 reader must be row-for-row equivalent to the
  * expression parser on the same tagged lines — including the quirky
  * edges (trailing Z/ZZ zones, 1-3 digit fractions, empty tag lists,
  * tombstones, malformed lines) — and must push column pruning into the
  * scan. */
class ActivityDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeLines(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_dsv2_")
    Files.write(dir.resolve("lines.txt"),
      scala.jdk.CollectionConverters.SeqHasAsJava(lines).asJava)
    dir.toString
  }

  private val quirkLines = Seq(
    "P|1|10|2019-03-01T12:00:00Z||10.0.0.1|Firefox|en|hello world|[5183, 1912]|7|5",
    "P|2|11|2019-03-01T12:00:00.5ZZ||10.0.0.1|Chrome|de|zwei|[]|7|",
    "C|3|12|2019-03-01T12:30:00.25|10.0.0.2|Safari|direct comment|1||9",
    "C|4|13|2019-03-01T12:45:00.125Z|10.0.0.3|Edge|a reply||3|9",
    "L|14|1|2019-03-01T13:00:00",
    "T|1|2019-03-02T00:00:00",
    "garbage line with no tag",
    "")

  test("row-for-row equivalent to the expression parser on quirky lines") {
    val dir = writeLines(quirkLines)
    val viaSource = spark.read.format("graft.sources.ActivityDataSource")
      .load(dir).collect().map(_.toSeq).toSet
    val viaExprs = quirkLines.toDF("value")
      .select(ActivityParser.parseTagged(col("value")).as("a"))
      .select(ActivityParser.unifiedColumns.map(c => col(s"a.$c")): _*)
      .collect().map(_.toSeq).toSet
    assert(viaSource == viaExprs)
  }

  test("equivalent on the full synthesized sf0.001 wire slice") {
    val sf = "/root/testdata/sf0.001"
    val lines = graft.queries.LdbcE2E.taggedWireLines(spark, sf)
      .collect().map(_.getString(0)).toSeq
    val dir = writeLines(lines)
    val viaSource = spark.read.format("graft.sources.ActivityDataSource")
      .load(dir).collect().map(_.toSeq).toSet
    val viaExprs = lines.toDF("value")
      .select(ActivityParser.parseTagged(col("value")).as("a"))
      .select(ActivityParser.unifiedColumns.map(c => col(s"a.$c")): _*)
      .collect().map(_.toSeq).toSet
    assert(viaSource == viaExprs && viaSource.size == lines.size)
  }

  test("column pruning reaches the scan") {
    val dir = writeLines(quirkLines)
    val pruned = spark.read.format("graft.sources.ActivityDataSource")
      .load(dir).select("type", "event_id")
    val scan = pruned.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scan.nonEmpty, "expected a BatchScanExec")
    assert(scan.head.output.map(_.name) == Seq("type", "event_id"),
      s"scan not pruned: ${scan.head.output.map(_.name)}")
    assert(pruned.filter(col("type") === "post").count() == 2)
  }

  test("timestamp quirk table matches the expression parser exactly") {
    val cases = Seq(
      "2019-03-01T12:00:00", "2019-03-01T12:00:00Z", "2019-03-01T12:00:00ZZ",
      "2019-03-01T12:00:00.5", "2019-03-01T12:00:00.55Z",
      "2019-03-01T12:00:00.555")
    val viaExprs = cases.toDF("v")
      .select(unix_micros(ActivityParser.parseTs(col("v"))).as("m"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    val viaScala = cases.map(c =>
      ActivityDataSource.parseTsMicros(c) match {
        case null => null
        case l    => l.longValue()
      })
    assert(viaExprs.toSeq == viaScala)
    // divergence by design on UNPARSEABLE dates: the ANSI expression path
    // throws (Spark 4 default), the reader degrades to NULL — an ingestion
    // source must not crash the job on one bad record
    assert(ActivityDataSource.parseTsMicros("not a timestamp") == null)
    assert(ActivityDataSource.parseTsMicros("") == null)
    intercept[Exception] {
      Seq("not a timestamp").toDF("v")
        .select(ActivityParser.parseTs(col("v"))).collect()
    }
  }

  test("int quirk fields match the expression parser, diverge only on garbage") {
    // parity on everything the wire format legally carries
    val clean = Seq("42", " 7 ", "-13", "0", "2147483647")
    val viaExprs = clean.toDF("v").select(col("v").cast("int").as("i"))
      .collect().map(_.getInt(0))
    val viaScala = clean.map(c => ActivityDataSource.toIntOrNull(c).intValue())
    assert(viaExprs.toSeq == viaScala)
    // divergence by design on UNPARSEABLE int fields (the timestamp note's
    // class): ANSI cast throws, the reader degrades to NULL
    assert(ActivityDataSource.toIntOrNull("garbage") == null)
    assert(ActivityDataSource.toIntOrNull("12.5") == null)
    assert(ActivityDataSource.toIntOrNull("9999999999") == null) // int overflow
    assert(ActivityDataSource.toIntOrNull(null) == null)
    intercept[Exception] {
      Seq("garbage").toDF("v").select(col("v").cast("int")).collect()
    }
  }

  test("write path round-trips the full sf0.001 wire slice") {
    // serializeLine is the exact inverse of parseLine on parsed corpus
    // rows: read → write (DSV2 batch write) → read must be row-identical,
    // including quirky timestamps, tag lists, and the error rows (which
    // re-emit their original line verbatim).
    val sf = "/root/testdata/sf0.001"
    val lines = graft.queries.LdbcE2E.taggedWireLines(spark, sf)
      .collect().map(_.getString(0)).toSeq
    val src = writeLines(lines)
    val df = spark.read.format("graft.sources.ActivityDataSource").load(src)
    val out = Files.createTempDirectory("graft_dsv2_w_").toString
    df.write.format("graft.sources.ActivityDataSource")
      .mode("overwrite").save(out)
    val back = spark.read.format("graft.sources.ActivityDataSource").load(out)
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
    assert(back.count() == lines.size)
    // append doubles every row; a second overwrite truncates back
    df.write.format("graft.sources.ActivityDataSource")
      .mode("append").save(out)
    assert(spark.read.format("graft.sources.ActivityDataSource")
      .load(out).count() == 2L * lines.size)
    df.write.format("graft.sources.ActivityDataSource")
      .mode("overwrite").save(out)
    assert(spark.read.format("graft.sources.ActivityDataSource")
      .load(out).count() == lines.size)
  }

  test("write path round-trips the handcrafted quirk lines") {
    val src = writeLines(quirkLines)
    val df = spark.read.format("graft.sources.ActivityDataSource").load(src)
    val out = Files.createTempDirectory("graft_dsv2_wq_").toString
    df.write.format("graft.sources.ActivityDataSource")
      .mode("overwrite").save(out)
    val back = spark.read.format("graft.sources.ActivityDataSource").load(out)
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }
}
