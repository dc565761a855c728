package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The end-to-end pretraining-corpus cleaning pipeline as ONE declarative
  * query — the composition a 100 TB training-data prep actually runs, in
  * the standard order:
  *
  *   1. fuzzy dedup (MinHash-LSH pairs → connected components → keep each
  *      cluster's min-id representative; unclustered docs keep themselves),
  *   2. language gate (t3's marker-profile argmax must say 'en'),
  *   3. quality gate (t2's blended heuristic ≥ 0.5).
  *
  * Mirrors how `LdbcE2E` chains the reference's parser→resolver→window
  * path: each stage is an already-oracled operator (d8, t3, t2), so the
  * composition is pure plan surface — three doc_id-keyed shuffle joins, no
  * new state, no driver loop beyond d8's inherent fixpoint counts. At
  * scale every join key is doc_id, so the stages co-partition and AQE can
  * collapse the exchanges; nothing here is broadcast except what the
  * component stages already bound.
  */
object Pipeline {

  def c1_clean_corpus(s: SparkSession, dir: String): DataFrame = {
    val clusters = Dedup.d8_dup_clusters(s, dir)
      .select(col("doc_id"), col("cluster_id"))
    // survivor of dedup: the cluster representative (min doc_id) — or the
    // doc was never in any near-dup pair and represents itself
    val keepers = Tables.documents(s, dir).select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .filter(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
      .select(col("doc_id"))
    val quality = TextAnalysis.t2_quality_score(s, dir)
      .select(col("doc_id"), col("quality"))
    val lang = TextAnalysis.t3_lang_id(s, dir)
      .select(col("doc_id"), col("predicted"))
    keepers
      .join(lang, Seq("doc_id"))
      .join(quality, Seq("doc_id"))
      .filter(col("predicted") === "en" && col("quality") >= 0.5)
      .select(col("doc_id"), col("predicted"), col("quality"))
      .orderBy("doc_id")
  }

  /** Oracle: the same three stages spliced in as nested CTEs — d8's
    * recursive-reachability components, t3's marker scoring, t2's blended
    * quality — each reused VERBATIM so the composition can't drift from
    * its parts. */
  val c1Sql: String =
    s"""WITH dup AS (
       |${Dedup.d8Sql}
       |), q AS (
       |${TextAnalysis.t2Sql}
       |), p AS (
       |${TextAnalysis.t3Sql}
       |)
       |SELECT d.doc_id, p.predicted, q.quality
       |FROM documents d
       |LEFT JOIN dup ON d.doc_id = dup.doc_id
       |JOIN p ON d.doc_id = p.doc_id
       |JOIN q ON d.doc_id = q.doc_id
       |WHERE (dup.doc_id IS NULL OR dup.cluster_id = dup.doc_id)
       |  AND p.predicted = 'en' AND q.quality >= 0.5
       |ORDER BY d.doc_id""".stripMargin

  /** C3: the DECONTAMINATED training corpus — c1's cleaned survivors minus
    * (a) the eval set itself (the bounded `doc_id % 100` contract: eval
    * documents never train) and (b) any training document sharing ≥ 2
    * n-grams with an eval document (t14's overlap table) — the GPT-3-style
    * "remove overlapping documents" pass every serious pretraining run
    * performs between cleaning and tokenization.
    *
    * Pure plan composition again: both stages are already-oracled
    * operators (c1, t14); the gate is one doc_id-keyed LEFT ANTI join, so
    * it co-partitions with c1's own doc_id joins and AQE collapses the
    * exchanges. The contamination table reuses t14's gram-keyed shuffle;
    * nothing new is broadcast. */
  def c3_decontaminated(s: SparkSession, dir: String): DataFrame = {
    val contaminated = TextAnalysis.t14_contamination(s, dir)
      .filter(col("n_shared") >= 2)
      .select(col("train_doc").as("doc_id"))
      .distinct()
    c1_clean_corpus(s, dir)
      .filter(col("doc_id") % 100 =!= 0) // eval docs never train
      .join(contaminated, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  /** Oracle: c1's and t14's SQL spliced verbatim, gated by NOT EXISTS. */
  val c3Sql: String =
    s"""WITH cln AS (
       |$c1Sql
       |), cont AS (
       |${TextAnalysis.t14Sql}
       |)
       |SELECT c.doc_id, c.predicted, c.quality
       |FROM cln c
       |WHERE c.doc_id % 100 <> 0
       |  AND NOT EXISTS (SELECT 1 FROM cont
       |                  WHERE cont.train_doc = c.doc_id AND cont.n_shared >= 2)
       |ORDER BY c.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c3_decontaminated" -> (c3_decontaminated _),
    "c1_clean_corpus" -> (c1_clean_corpus _))

  val oracles: Map[String, String] = Map(
    "c3_decontaminated" -> c3Sql,
    "c1_clean_corpus" -> c1Sql)
}
