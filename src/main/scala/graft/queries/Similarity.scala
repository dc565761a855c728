package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import QUtil._

/** Similarity search over the `embeddings` table (64-dim unit float vectors):
  * brute-force cosine top-k (the exact baseline), random-hyperplane LSH
  * near-dup pairs, and an IVF-style centroid-routed top-k (the scale path).
  *
  * Scale design:
  *  - s1 brute force is O(|Q|·N·D) — correct baseline, linear scans, query
  *    side broadcast so the corpus never shuffles. At 100 TB it is the
  *    fallback and the recall oracle for the approximate variants.
  *  - s2 hyperplane LSH: 16 sign-bits vs deterministic pseudo-random
  *    hyperplanes → 4×4-bit bands → candidate pairs via equi-join on
  *    (band, value) — the quadratic pair space is never materialized.
  *  - s3 IVF: coarse quantizer = per-label centroids (10 cells); queries
  *    route to their nearest centroid and search ONLY that cell — the
  *    1/cells fan-out reduction that makes ANN tractable at scale.
  *
  * Cross-engine determinism: every dot product accumulates exact
  * DECIMAL(38,30) addends (float×float products are exact in double;
  * double→decimal cast is the same nearest-rounding in both engines), so
  * sums are order-independent. Scores floor-round to 4 dp and rank ties
  * break on vec_id.
  */
object Similarity {

  private val D = 64 // embedding dimensionality (TESTDATA.md)

  /** (vec_id, label, i, v): exploded embedding elements as double. */
  private def elems(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"),
              posexplode(col("embedding")).as(Seq("i", "v")))
      .withColumn("v", col("v").cast("double"))

  private val elemsSqlCte: String =
    s"""e AS (
      |  SELECT vec_id, label, i, embedding[i + 1]::DOUBLE AS v
      |  FROM embeddings CROSS JOIN (SELECT unnest(range($D)) AS i)
      |)""".stripMargin

  private def dec(c: Column): Column = c.cast("decimal(38,30)")

  /** S1 brute-force cosine top-k: queries = vec_id ≡ 0 (mod 100), k = 5.
    * Query elements are broadcast; the corpus side is scanned once with
    * map-side partial aggregation of the per-pair dot products. */
  def s1_ann_topk(s: SparkSession, dir: String): DataFrame = {
    val e = elems(s, dir)
    val norms = e.groupBy(col("vec_id"))
      .agg(sum(dec(col("v") * col("v"))).cast("double").as("n2"))
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("i"), col("v").as("qv"))
    val dots = broadcast(q).join(e, Seq("i"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(dec(col("qv") * col("v"))).cast("double").as("dp"))
    val scored = dots
      .join(broadcast(norms.withColumnRenamed("vec_id", "q_id").withColumnRenamed("n2", "qn2")), "q_id")
      .join(norms, "vec_id")
      .withColumn("cosine", round4(col("dp") / sqrt(col("qn2") * col("n2"))))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("vec_id").as("n_id"), col("cosine"), col("rank"))
      .orderBy("q_id", "rank")
  }

  val s1Sql: String =
    s"""WITH $elemsSqlCte, norms AS (
      |  SELECT vec_id, sum((v * v)::DECIMAL(38,30))::DOUBLE AS n2 FROM e GROUP BY 1
      |), dots AS (
      |  SELECT q.vec_id AS q_id, d.vec_id AS vec_id,
      |         sum((q.v * d.v)::DECIMAL(38,30))::DOUBLE AS dp
      |  FROM e q JOIN e d ON q.i = d.i AND d.vec_id <> q.vec_id
      |  WHERE q.vec_id % 100 = 0
      |  GROUP BY 1, 2
      |), scored AS (
      |  SELECT q_id, dots.vec_id AS vec_id,
      |    floor(dp / sqrt(nq.n2 * nd.n2) * 10000.0 + 0.5) / 10000.0 AS cosine
      |  FROM dots
      |  JOIN norms nq ON nq.vec_id = q_id
      |  JOIN norms nd ON nd.vec_id = dots.vec_id
      |), ranked AS (
      |  SELECT q_id, vec_id AS n_id, cosine,
      |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
      |  FROM scored)
      |SELECT q_id, n_id, cosine, rank FROM ranked
      |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** Deterministic pseudo-random hyperplane component r_j[i]. */
  private def hyper(j: Int): (Long, Long) =
    (Dedup.lshA(j % 8) + 13L * (j / 8), Dedup.lshB(j % 8) + 7L * (j / 8))

  /** S2 random-hyperplane LSH near-dup: 16 sign bits, 4×4-bit bands,
    * candidates verified with exact cosine ≥ 0.4. */
  def s2_lsh_neardup(s: SparkSession, dir: String): DataFrame = {
    val e = elems(s, dir)
    // bit_j = sign of <v, r_j>, r_j[i] = ((a_j*(i+1)+b_j) mod 1009)/1009 - 0.5
    val bitSums = (0 until 16).map { j =>
      val (a, b) = hyper(j)
      val r = ((lit(a) * (col("i") + 1) + lit(b)) % 1009).cast("double") / 1009.0 - 0.5
      sum(dec(col("v") * r))
    }
    val fp = e.groupBy(col("vec_id"))
      .agg(
        (0 until 16).map(j => when(bitSums(j) >= 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("fp"))
    val bnd = fp.select(col("vec_id"),
      explode(array((0 until 4).map(k =>
        struct(lit(k).as("k"), (shiftright(col("fp"), 4 * k) % 16).as("bv"))): _*)).as("nb"))
      .select(col("vec_id"), col("nb.k"), col("nb.bv"))
    val cand = bnd.as("x").join(bnd.as("y"),
        col("x.k") === col("y.k") && col("x.bv") === col("y.bv") &&
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("va"), col("y.vec_id").as("vb"))
      .distinct()
    val a = elems(s, dir).select(col("vec_id").as("va"), col("i"), col("v").as("av"))
    val b = elems(s, dir).select(col("vec_id").as("vb"), col("i"), col("v").as("bv2"))
    cand.join(a, Seq("va")).join(b, Seq("vb", "i"))
      .groupBy(col("va"), col("vb"))
      .agg(sum(dec(col("av") * col("bv2"))).cast("double").as("dp"))
      .withColumn("cosine", round4(col("dp")))
      .filter(col("cosine") >= 0.4)
      .select(col("va"), col("vb"), col("cosine"))
      .orderBy("va", "vb")
  }

  val s2Sql: String = {
    val bitSums = (0 until 16).map { j =>
      val (a, b) = hyper(j)
      s"CASE WHEN sum((v * ((($a * (i + 1) + $b) % 1009)::DOUBLE / 1009.0 - 0.5))::DECIMAL(38,30)) >= 0 THEN ${1L << j} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH $elemsSqlCte, fp AS (
      |  SELECT vec_id, ($bitSums)::BIGINT AS fp FROM e GROUP BY vec_id
      |), bnd AS (
      |  SELECT vec_id, k, (fp >> (4 * k)) % 16 AS bv
      |  FROM fp CROSS JOIN (SELECT unnest(range(4)) AS k)
      |), cand AS (
      |  SELECT DISTINCT x.vec_id AS va, y.vec_id AS vb
      |  FROM bnd x JOIN bnd y ON x.k = y.k AND x.bv = y.bv AND x.vec_id < y.vec_id
      |), dots AS (
      |  SELECT c.va, c.vb, sum((a.v * b.v)::DECIMAL(38,30))::DOUBLE AS dp
      |  FROM cand c
      |  JOIN e a ON a.vec_id = c.va
      |  JOIN e b ON b.vec_id = c.vb AND b.i = a.i
      |  GROUP BY 1, 2)
      |SELECT va, vb, floor(dp * 10000.0 + 0.5) / 10000.0 AS cosine
      |FROM dots
      |WHERE floor(dp * 10000.0 + 0.5) / 10000.0 >= 0.4
      |ORDER BY va, vb""".stripMargin
  }

  /** S3 IVF-style routed top-k: coarse cells = per-label centroids; each
    * query routes to its nearest centroid (max dot) and searches only that
    * cell. k = 3. Demonstrates the partition-pruned ANN shape: the corpus
    * side is filtered to one cell before any pair work. */
  def s3_ivf_topk(s: SparkSession, dir: String): DataFrame = {
    val e = elems(s, dir)
    val cent = e.groupBy(col("label"), col("i"))
      .agg((sum(dec(col("v"))).cast("double") / count(lit(1))).as("cv"))
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("i"), col("v").as("qv"))
    val q2c = q.join(broadcast(cent), Seq("i"))
      .groupBy(col("q_id"), col("label"))
      .agg(sum(dec(col("qv") * col("cv"))).cast("double").as("cdp"))
    val routed = q2c
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cdp").desc, col("label"))))
      .filter(col("rn") === 1)
      .select(col("q_id"), col("label"))
    val dots = broadcast(q.join(routed, Seq("q_id"))).join(e, Seq("i", "label"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("label"), col("vec_id"))
      .agg(sum(dec(col("qv") * col("v"))).cast("double").as("dp"))
    dots
      .withColumn("cosine", round4(col("dp")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("label").as("cell"), col("vec_id").as("n_id"),
              col("cosine"), col("rank"))
      .orderBy("q_id", "rank")
  }

  val s3Sql: String =
    s"""WITH $elemsSqlCte, cent AS (
      |  SELECT label, i, sum(v::DECIMAL(38,30))::DOUBLE / count(*) AS cv
      |  FROM e GROUP BY 1, 2
      |), q AS (
      |  SELECT vec_id AS q_id, i, v AS qv FROM e WHERE vec_id % 100 = 0
      |), q2c AS (
      |  SELECT q_id, label, sum((qv * cv)::DECIMAL(38,30))::DOUBLE AS cdp
      |  FROM q JOIN cent USING (i) GROUP BY 1, 2
      |), routed AS (
      |  SELECT q_id, label FROM (
      |    SELECT q_id, label,
      |      row_number() OVER (PARTITION BY q_id ORDER BY cdp DESC, label) AS rn
      |    FROM q2c) WHERE rn = 1
      |), dots AS (
      |  SELECT q.q_id, r.label, d.vec_id,
      |         sum((q.qv * d.v)::DECIMAL(38,30))::DOUBLE AS dp
      |  FROM q JOIN routed r USING (q_id)
      |  JOIN e d ON d.i = q.i AND d.label = r.label AND d.vec_id <> q.q_id
      |  GROUP BY 1, 2, 3
      |), ranked AS (
      |  SELECT q_id, label AS cell, vec_id AS n_id,
      |    floor(dp * 10000.0 + 0.5) / 10000.0 AS cosine,
      |    row_number() OVER (PARTITION BY q_id
      |      ORDER BY floor(dp * 10000.0 + 0.5) / 10000.0 DESC, vec_id) AS rank
      |  FROM dots)
      |SELECT q_id, cell, n_id, cosine, rank FROM ranked
      |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_ann_topk"    -> (s1_ann_topk _),
    "s2_lsh_neardup" -> (s2_lsh_neardup _),
    "s3_ivf_topk"    -> (s3_ivf_topk _))

  val oracles: Map[String, String] = Map(
    "s1_ann_topk"    -> s1Sql,
    "s2_lsh_neardup" -> s2Sql,
    "s3_ivf_topk"    -> s3Sql)
}
