package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: every SparkEntry query timed at the given scale factor.
  *
  * Each query is timed THREE times and the per-query MEDIAN is reported —
  * single-shot timings are vulnerable to one-off GC/JIT artifacts (a prior
  * round charged one query 21.6 s for a 3.8 s computation). The shared
  * materialized intermediates (Similarity.s2Pairs) are cleared before every
  * timed run so each measurement is a cold, self-contained cost.
  */
object Bench {
  private def median3(a: Double, b: Double, c: Double): Double =
    Seq(a, b, c).sorted.apply(1)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional knobs for one-off experiments (driver runs use the defaults):
    // SPARK_GRAFT_ONLY=q1,q2 filters the query set; SPARK_GRAFT_EXACT_DECIMALS
    // toggles the similarity production-precision flag
    sys.env.get("SPARK_GRAFT_EXACT_DECIMALS")
      .foreach(v => spark.conf.set("spark.graft.exactDecimals", v))
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // untimed warmup: JVM/codegen/parquet-footer caches
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).count()
    Tables.events(spark, sfDir).count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val runs = (1 to 3).map { _ =>
        queries.Similarity.clearShared()
        queries.Dedup.clearShared()
        queries.Graph.clearShared()
        val t0 = System.nanoTime()
        // failures must be LOUD in the artifact itself, not just stderr: a
        // swallowed exception otherwise records a near-zero timing that
        // reads as "blazing fast" (how the sf1 symlink bug almost slipped)
        // — a failed run scores −1, so an all-failed query's median is −1
        // in the JSON while a one-off hiccup still yields a valid median
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      name -> median3(runs(0), runs(1), runs(2))
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // the driver captures a bounded log tail, which clipped round 3's JSON
    // line — persist the same line to a file so the round artifact always
    // parses regardless of log-buffer truncation
    val sfName = new java.io.File(sfDir).getName
    val out = java.nio.file.Paths.get(s"target/bench_$sfName.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, json + "\n")
    spark.stop()
  }
}
