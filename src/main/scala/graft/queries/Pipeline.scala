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

  /** C4: the DATASET CARD rollup — the per-slice summary table every
    * released corpus ships (docs, token mass, exact-duplicate share, mean
    * quality per language × source, with subtotals): `ROLLUP(lang,
    * source)` over the already-oracled component signals (t1 tokens, t2
    * quality, d1 exact-dup groups). This is the report a data-governance
    * review reads before a 100 TB corpus is approved for training.
    *
    * Scale shape: one doc_id-keyed join spine (co-partitioned, AQE
    * collapses the exchanges like c1/c3), then a single rollup aggregate
    * — Spark expands rollup grouping sets inside one shuffle, not one
    * pass per level. The duplicate flag reuses d1's one-hash-shuffle
    * semantics; quality means sum 4-dp grid BIGINTs (the t6 micro-grid
    * discipline) so subtotal means are order-independent and hash
    * cross-engine. Nothing is broadcast; the card is a few hundred rows
    * at any corpus size (bounded by the lang × source inventory). */
  def c4_corpus_card(s: SparkSession, dir: String): DataFrame = {
    val toksCount = TextAnalysis.t1_token_stats(s, dir)
      .select(col("doc_id"), col("n_tokens"))
    val quality = TextAnalysis.t2_quality_score(s, dir)
      .select(col("doc_id"),
              // 4-dp grid as BIGINT: exact, order-independent group sums
              floor(col("quality") * 10000.0 + 0.5).cast("long").as("qi"))
    val dup = Dedup.d1_exact_dedup(s, dir)
      .select(col("doc_id"), col("is_dup").cast("long").as("is_dup"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"))
      .join(toksCount, Seq("doc_id"))
      .join(quality, Seq("doc_id"))
      .join(dup, Seq("doc_id"))
      .rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tokens")).as("n_tokens"),
           sum(col("is_dup")).as("n_dup_docs"),
           QUtil.round4(sum(col("qi")).cast("double") / 10000.0
                        / count(lit(1))).as("mean_quality"))
      .orderBy("lang", "source")
  }

  /** Oracle: t1/t2/d1 SQL spliced verbatim, one GROUP BY ROLLUP. */
  val c4Sql: String =
    s"""WITH tok AS (
       |${TextAnalysis.t1Sql}
       |), q AS (
       |${TextAnalysis.t2Sql}
       |), dup AS (
       |${Dedup.d1Sql}
       |)
       |SELECT d.lang, d.source, count(*)::BIGINT AS n_docs,
       |  sum(tok.n_tokens)::BIGINT AS n_tokens,
       |  sum(CASE WHEN dup.is_dup THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs,
       |  floor(sum(floor(q.quality * 10000.0 + 0.5)::BIGINT)::DOUBLE / 10000.0
       |        / count(*) * 10000.0 + 0.5) / 10000.0 AS mean_quality
       |FROM documents d
       |JOIN tok ON d.doc_id = tok.doc_id
       |JOIN q ON d.doc_id = q.doc_id
       |JOIN dup ON d.doc_id = dup.doc_id
       |GROUP BY ROLLUP(d.lang, d.source)
       |ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c4_corpus_card" -> (c4_corpus_card _),
    "c3_decontaminated" -> (c3_decontaminated _),
    "c1_clean_corpus" -> (c1_clean_corpus _))

  val oracles: Map[String, String] = Map(
    "c4_corpus_card" -> c4Sql,
    "c3_decontaminated" -> c3Sql,
    "c1_clean_corpus" -> c1Sql)
}
