package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import QUtil._

/** Text-analysis operators for large-scale training-data pipelines, over the
  * `documents` table: token statistics, quality scoring, language ID, and
  * document fingerprinting. The reference computes the same family of
  * per-document text measures for its anomaly features (unique-words ratio and
  * content length, AnomalousUserDetector.java:203-207 / :123-132 — SURVEY.md
  * §2.7 F3-F4); here they are generalized to the corpus-curation measures a
  * 100 TB text pipeline needs.
  *
  * Scale notes: every query is embarrassingly parallel per document — a single
  * projection over the parquet scan with NO shuffle (except final orderBy,
  * which exists only for the oracle compare and would be dropped in
  * production). All token work uses codegen'd `split`/`array` functions, no
  * UDFs. Only `text` + key columns are read (column pruning).
  */
object TextAnalysis {

  private def toks = split(col("text"), " ")

  /** F3/token counting: whitespace token count, distinct count, unique-words
    * ratio, BPE-ish subword count (runs of letters / digits / single
    * non-space symbols — the standard pre-tokenizer regex shape), chars per
    * token. */
  def t1_token_stats(s: SparkSession, dir: String): DataFrame = {
    val n = size(toks)
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        n.cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        round4(size(array_distinct(toks)).cast("double") / n).as("uniq_ratio"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .cast("long").as("n_subwords"),
        round4(length(col("text")).cast("double") / n).as("chars_per_token"))
      .orderBy("doc_id")
  }

  val t1Sql: String =
    """SELECT doc_id,
      |  len(string_split(text, ' '))::BIGINT AS n_tokens,
      |  len(list_distinct(string_split(text, ' ')))::BIGINT AS n_distinct,
      |  floor(len(list_distinct(string_split(text, ' ')))::DOUBLE
      |        / len(string_split(text, ' ')) * 10000.0 + 0.5) / 10000.0 AS uniq_ratio,
      |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT AS n_subwords,
      |  floor(length(text)::DOUBLE / len(string_split(text, ' ')) * 10000.0 + 0.5)
      |    / 10000.0 AS chars_per_token
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Quality scoring: stopword ratio, mean token length, and a blended
    * 0-1 quality heuristic (the length/stopword/uniqueness blend every
    * web-scale corpus filter uses). Kept fully relational — the score is a
    * deterministic arithmetic expression, filterable at scan time. */
  def t2_quality_score(s: SparkSession, dir: String): DataFrame = {
    val n = size(toks).cast("double")
    val stopwords = array(lit("a"), lit("the"), lit("of"), lit("and"))
    val nStop = size(filter(toks, t => array_contains(stopwords, t))).cast("double")
    val meanLen = (length(col("text")) - (size(toks) - 1)).cast("double") / n
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        round4(nStop / n).as("stop_ratio"),
        round4(meanLen).as("mean_tok_len"),
        qualityExpr.as("quality"))
      .orderBy("doc_id")
  }

  /** t2's blended 0-1 quality as ONE per-row expression over `text` (the
    * 4-dp grid value t2 emits) — factored so the x39 ingest-time admission
    * gate computes the IDENTICAL op sequence on arriving rows. */
  private[graft] def qualityExpr: Column = {
    val n = size(toks).cast("double")
    val stopwords = array(lit("a"), lit("the"), lit("of"), lit("and"))
    val nStop = size(filter(toks, t => array_contains(stopwords, t))).cast("double")
    val uniq = size(array_distinct(toks)).cast("double") / n
    val lenScore = least(n / lit(60.0), lit(1.0))
    round4(least(greatest(
      lit(0.4) * lenScore + lit(0.4) * uniq + lit(0.2) * (lit(1.0) - nStop / n),
      lit(0.0)), lit(1.0)))
  }

  val t2Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    len(string_split(text, ' '))::DOUBLE AS n,
      |    len(list_filter(string_split(text, ' '),
      |        t -> t IN ('a', 'the', 'of', 'and')))::DOUBLE AS n_stop,
      |    len(list_distinct(string_split(text, ' ')))::DOUBLE AS n_uniq,
      |    (length(text) - (len(string_split(text, ' ')) - 1))::DOUBLE AS tok_chars
      |  FROM documents)
      |SELECT doc_id,
      |  floor(n_stop / n * 10000.0 + 0.5) / 10000.0 AS stop_ratio,
      |  floor(tok_chars / n * 10000.0 + 0.5) / 10000.0 AS mean_tok_len,
      |  floor(least(greatest(
      |      0.4 * least(n / 60.0, 1.0) + 0.4 * (n_uniq / n) + 0.2 * (1.0 - n_stop / n),
      |      0.0), 1.0) * 10000.0 + 0.5) / 10000.0 AS quality
      |FROM d ORDER BY doc_id""".stripMargin

  /** Language ID via stopword-profile scoring (the n-gram-heuristic family):
    * score each doc against per-language marker-token profiles, argmax wins,
    * below-threshold ⇒ 'unk'. Profiles are tiny literal arrays — at scale
    * they would be a broadcast table joined in; the per-doc work is identical
    * either way. */
  def t3_lang_id(s: SparkSession, dir: String): DataFrame = {
    val n = size(toks).cast("double")
    val enMarkers = array(lit("a"), lit("the"), lit("of"), lit("and"), lit("in"))
    val enScore = size(filter(toks, t => array_contains(enMarkers, t))).cast("double") / n
    Tables.documents(s, dir)
      .select(
        col("doc_id"), col("lang"),
        round4(enScore).as("en_score"),
        predictedExpr.as("predicted"))
      .withColumn("correct", (col("predicted") === col("lang")).cast("boolean"))
      .orderBy("doc_id")
  }

  /** t3's marker-profile language verdict as ONE per-row expression over
    * `text` — factored for x39 (same reason as [[qualityExpr]]). */
  private[graft] def predictedExpr: Column = {
    val n = size(toks).cast("double")
    val enMarkers = array(lit("a"), lit("the"), lit("of"), lit("and"), lit("in"))
    val deMarkers = array(lit("der"), lit("die"), lit("das"), lit("und"), lit("ist"))
    val enScore = size(filter(toks, t => array_contains(enMarkers, t))).cast("double") / n
    val deScore = size(filter(toks, t => array_contains(deMarkers, t))).cast("double") / n
    when(enScore < lit(0.01) && deScore < lit(0.01), lit("unk"))
      .when(deScore > enScore, lit("de"))
      .otherwise(lit("en"))
  }

  val t3Sql: String =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(string_split(text, ' '),
      |        t -> t IN ('a', 'the', 'of', 'and', 'in')))::DOUBLE
      |      / len(string_split(text, ' ')) AS en_score,
      |    len(list_filter(string_split(text, ' '),
      |        t -> t IN ('der', 'die', 'das', 'und', 'ist')))::DOUBLE
      |      / len(string_split(text, ' ')) AS de_score
      |  FROM documents)
      |SELECT doc_id, lang,
      |  floor(en_score * 10000.0 + 0.5) / 10000.0 AS en_score,
      |  CASE WHEN en_score < 0.01 AND de_score < 0.01 THEN 'unk'
      |       WHEN de_score > en_score THEN 'de' ELSE 'en' END AS predicted,
      |  (CASE WHEN en_score < 0.01 AND de_score < 0.01 THEN 'unk'
      |        WHEN de_score > en_score THEN 'de' ELSE 'en' END) = lang AS correct
      |FROM d ORDER BY doc_id""".stripMargin

  /** Document fingerprinting: a position-weighted token hash folded modulo
    * 2³¹−1 (the rolling-hash family, simplified so both engines compute it
    * in exact 64-bit integer arithmetic). Tokens are mapped to ids through a
    * corpus dictionary built with `QUtil.denseIds` — distributed bucketed
    * rank, no single-partition global sort. Each term is reduced mod P
    * BEFORE the sum, so terms stay < 2³¹ and the per-doc sum cannot wrap
    * 64 bits (Spark wraps silently; DuckDB promotes to HUGEINT — either way
    * a cross-engine divergence at scale without the reduction). */
  def t4_fingerprint(s: SparkSession, dir: String): DataFrame = {
    val P = lit(2147483647L)
    val docs = Tables.documents(s, dir)
    val tokPos = docs.select(col("doc_id"), posexplode(toks).as(Seq("pos", "tok")))
    // id join shuffles on tok — the vocabulary dictionary is unbounded with
    // the corpus, so it is never broadcast
    val dict = denseIds(tokPos.select(col("tok")).distinct(), "tok", "tok_id")
    tokPos.join(dict, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg((sum(((col("tok_id") % P + 1) * (col("pos") % P + 17)) % P) % P).as("fingerprint"),
           count(lit(1)).as("n_tokens"))
      .orderBy("doc_id")
  }

  val t4Sql: String =
    s"""WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
      |         unnest(range(len(string_split(text, ' ')))) AS pos
      |  FROM documents
      |), dsrc AS (
      |  SELECT DISTINCT tok FROM tok
      |), dict AS (
      |  ${denseIdsSqlCte("dsrc", "tok", "tok_id")}
      |)
      |SELECT doc_id,
      |  (sum(((tok_id % 2147483647 + 1) * (pos % 2147483647 + 17)) % 2147483647)
      |    % 2147483647)::BIGINT AS fingerprint,
      |  count(*)::BIGINT AS n_tokens
      |FROM tok JOIN dict USING (tok)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** F3 via the native codegen'd Catalyst expression
    * (`graft.functions.UniqueWordsRatio`) instead of the composed
    * split/array_distinct form — one tokenizer pass per row. */
  def t5_uwr_native(s: SparkSession, dir: String): DataFrame = {
    graft.functions.UniqueWordsRatio.register(s)
    // round4 via the DataFrame API: `lit(10000.0)` is a DOUBLE literal. (In
    // SQL text, `10000.0` parses as DECIMAL and the division comes out
    // decimal(28,7) — a schema mismatch against the oracle's DOUBLE.)
    Tables.documents(s, dir)
      .select(col("doc_id"),
        round4(expr("unique_words_ratio(text)")).as("uniq_ratio"))
      .orderBy("doc_id")
  }

  val t5Sql: String =
    """SELECT doc_id,
      |  floor(len(list_distinct(string_split(text, ' ')))::DOUBLE
      |        / len(string_split(text, ' ')) * 10000.0 + 0.5) / 10000.0 AS uniq_ratio
      |FROM documents ORDER BY doc_id""".stripMargin

  /** T6 quality-percentile curation: documents binned into EXACT global
    * quality deciles — the "keep the top X% by quality score" filter every
    * corpus-curation pipeline runs. The global rank is computed WITHOUT a
    * global sort: scores bucket into 101 fixed ranges (floor(q·100)), and
    * exact rank = prefix count of earlier buckets (a tiny broadcast table)
    * + row_number within the bucket (a PARTITIONED window, parallel across
    * buckets) — the same associative decomposition as the st5/st6 scalable
    * twins, applied to ranking. Output: per decile, the doc count and exact
    * decimal mean quality. */
  def t6_quality_deciles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = size(toks).cast("double")
    val stopwords = array(lit("a"), lit("the"), lit("of"), lit("and"))
    val nStop = size(filter(toks, t => array_contains(stopwords, t))).cast("double")
    val uniq = size(array_distinct(toks)).cast("double") / n
    val lenScore = least(n / lit(60.0), lit(1.0))
    val score = least(greatest(
      lit(0.4) * lenScore + lit(0.4) * uniq + lit(0.2) * (lit(1.0) - nStop / n),
      lit(0.0)), lit(1.0))
    val scored = Tables.documents(s, dir)
      .select(col("doc_id"), score.as("q"))
      // 6-dp integer micro-grid (the t10/st9 discipline): the decile MEAN
      // sums exact BIGINTs, so the byte-level hash agrees cross-engine —
      // decimal-vs-binary shortest-repr of the double sum cannot diverge.
      .withColumn("qi", floor(col("q") * 1000000.0 + 0.5).cast("long"))
      .withColumn("bkt", floor(col("q") * 100).cast("long"))
    val perBucket = scored.groupBy(col("bkt")).agg(count(lit(1)).as("bn"))
    val prior = Window.orderBy(col("bkt")).rowsBetween(Window.unboundedPreceding, -1)
    val pre = perBucket
      .withColumn("off", coalesce(sum(col("bn")).over(prior), lit(0L)))
      .select(col("bkt"), col("off"))
    val intra = Window.partitionBy(col("bkt")).orderBy(col("q"), col("doc_id"))
    val total = scored.agg(count(lit(1)).as("c"))
    scored.join(broadcast(pre), Seq("bkt"))
      .withColumn("rn", col("off") + row_number().over(intra))
      .crossJoin(broadcast(total))
      .withColumn("decile", expr("((rn - 1) * 10) div c"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
           round4(sum(col("qi")).cast("double") / lit(1000000.0)
                  / count(lit(1))).as("mean_quality"))
      .orderBy("decile")
  }

  val t6Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    len(string_split(text, ' '))::DOUBLE AS n,
      |    len(list_filter(string_split(text, ' '),
      |        t -> t IN ('a', 'the', 'of', 'and')))::DOUBLE AS n_stop,
      |    len(list_distinct(string_split(text, ' ')))::DOUBLE AS n_uniq
      |  FROM documents),
      |sc AS (
      |  SELECT doc_id,
      |    least(greatest(0.4 * least(n / 60.0, 1.0) + 0.4 * (n_uniq / n)
      |          + 0.2 * (1.0 - n_stop / n), 0.0), 1.0) AS q
      |  FROM d),
      |s AS (SELECT doc_id, q, floor(q * 1000000.0 + 0.5)::BIGINT AS qi,
      |             floor(q * 100)::BIGINT AS bkt FROM sc),
      |pb AS (SELECT bkt, count(*) AS bn FROM s GROUP BY 1),
      |pre AS (
      |  SELECT bkt, coalesce(sum(bn) OVER (ORDER BY bkt
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS off FROM pb),
      |r AS (
      |  SELECT s.doc_id, s.qi,
      |    pre.off + row_number() OVER (PARTITION BY s.bkt ORDER BY s.q, s.doc_id) AS rn
      |  FROM s JOIN pre USING (bkt)),
      |t AS (SELECT count(*) AS c FROM s)
      |SELECT (((rn - 1) * 10) // c)::BIGINT AS decile, count(*) AS n_docs,
      |  floor(sum(qi)::DOUBLE / 1000000.0 / count(*) * 10000.0 + 0.5) / 10000.0 AS mean_quality
      |FROM r, t GROUP BY 1 ORDER BY 1""".stripMargin

  /** T7 TF-IDF: the canonical distinctive-terms measure every corpus
    * pipeline computes (search relevance, keyword extraction, topic drift
    * monitoring). Emits each document's top-3 terms by tf·idf.
    *
    * Dataflow (the canonical shape, nothing collected or broadcast except
    * the one-row corpus count): tf = groupBy(doc, term) over the exploded
    * tokens (shuffle 1); df = groupBy(term) over the tf table — already
    * (doc,term)-distinct, so df is a plain count (shuffle 2); df joins back
    * onto tf by term (co-partitioned with shuffle 2's output); the top-3
    * filter is a per-doc PARTITIONED window. The vocabulary is never
    * broadcast (unbounded with the corpus — same rule as t4's dictionary).
    *
    * idf = ln(N/df) is rounded to 6 dp BEFORE multiplying by tf: ln differs
    * by ≤1 ulp between JVM Math.log and DuckDB's libm, and tf·(6-dp idf)·10⁴
    * stays well inside exact-double range, so the 4-dp score is bit-stable
    * cross-engine. */
  def t7_tfidf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val tf = docs.select(col("doc_id"), explode(toks).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n"))
    val idf = round6(log(col("n").cast("double") / col("df")))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", round4(col("tf") * idf))
      // bigint to match DuckDB's row_number() — the int32-vs-int64 width
      // drift the compare.py dtype gate now rejects
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
              col("score"), col("rk"))
      .orderBy("doc_id", "rk")
  }

  val t7Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      |), tf AS (
      |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2
      |), df AS (
      |  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1
      |), nd AS (SELECT count(*) AS n FROM documents),
      |sc AS (
      |  SELECT doc_id, term, tf, df,
      |    floor(tf * (floor(ln(n::DOUBLE / df) * 1000000.0 + 0.5) / 1000000.0)
      |          * 10000.0 + 0.5) / 10000.0 AS score
      |  FROM tf JOIN df USING (term), nd
      |), r AS (
      |  SELECT doc_id, term, tf, df, score,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
      |  FROM sc)
      |SELECT doc_id, term, tf, df, score, rk
      |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  /** T8 deterministic stratified sampling: the reproducible "keep X% of
    * each language" subset every training-data pipeline versions. The
    * sampling decision is a pure function of the ROW KEY — md5 of the
    * rendered doc_id, first 4 hex chars compared against a per-stratum
    * threshold — so the sample is identical across engines, runs, partition
    * layouts, and cluster sizes (unlike `df.sample`, which is seed- and
    * partitioning-dependent). A scan-level filter: no shuffle, no state;
    * at 100 TB this is a pushed predicate away from free. Rates: en 25%
    * (< '4000'), de 50% (< '8000'), other strata 12.5% (< '2000'). */
  def t8_doc_sample(s: SparkSession, dir: String): DataFrame = {
    val h = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 4)
    val thresh = when(col("lang") === "en", lit("4000"))
      .when(col("lang") === "de", lit("8000"))
      .otherwise(lit("2000"))
    Tables.documents(s, dir)
      .withColumn("h4", h)
      .filter(col("h4") < thresh)
      .select(col("doc_id"), col("lang"), col("h4"))
      .orderBy("doc_id")
  }

  val t8Sql: String =
    """SELECT doc_id, lang, substr(md5(doc_id::VARCHAR), 1, 4) AS h4
      |FROM documents
      |WHERE substr(md5(doc_id::VARCHAR), 1, 4) <
      |  CASE lang WHEN 'en' THEN '4000' WHEN 'de' THEN '8000' ELSE '2000' END
      |ORDER BY doc_id""".stripMargin

  /** T9 quantile SKETCH: per-language length quantiles via
    * `approx_percentile` (Greenwald-Khanna), the mergeable-sketch path for
    * "length percentile" corpus filters at 100 TB — one pass, bounded
    * memory, partial sketches merged map-side (vs t6's exact two-pass
    * ranking, which needs a second pass over the data). The sketch output
    * itself (used by `QueriesSmokeSpec`'s tight band property). */
  def t9_quantiles(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(col("lang"))
      .agg(percentile_approx(col("n_chars"), array(lit(0.5), lit(0.9), lit(0.99)),
             lit(1000)).as("q"),
           count(lit(1)).as("n_docs"))
      .select(col("lang"), col("q")(0).as("p50"), col("q")(1).as("p90"),
              col("q")(2).as("p99"), col("n_docs"))
      .orderBy("lang")

  /** T9 as a driver-checkable INVARIANT: a GK sketch has no replayable
    * DuckDB oracle, so the query emits the (lang, p) pairs where the
    * approximate quantile falls OUTSIDE the exact rank band
    * [rank(⌊p·n⌋ − err − 1), rank(⌊p·n⌋ + err)], err = max(1, n/1000)
    * (accuracy = 1000 ⇒ GK rank error ≤ n/1000), and the oracle expects
    * ZERO rows — the j4/s9_order_audit pattern. The exact band is computed
    * RELATIONALLY (per-lang row_number rank + a 3-row probs local
    * relation joined at the target ranks), never collected, so the audit
    * itself holds at 100 TB: one rank window per lang partition + two
    * rank-equi joins. */
  def t9_len_quantiles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir).select(col("lang"), col("n_chars"))
    val ranked = docs.withColumn("rn",
      row_number().over(Window.partitionBy(col("lang")).orderBy(col("n_chars")))
        .cast("long"))
    val probs = s.range(1).select(
      explode(array(lit(0.5), lit(0.9), lit(0.99))).as("p"))
    val bands = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .crossJoin(probs) // 3 rows — a bounded local relation
      .withColumn("err", greatest(lit(1L), col("n") / lit(1000L)))
      // 0-based spec indices → 1-based ranks (+1)
      .withColumn("lo_rn", greatest(lit(0L),
        (col("p") * col("n")).cast("long") - col("err") - 1) + 1)
      .withColumn("hi_rn", least(col("n") - 1,
        (col("p") * col("n")).cast("long") + col("err")) + 1)
    // distinct column names per side — bands/lo/hi all derive from `docs`,
    // so attribute-id join conditions would be self-join-ambiguous
    val lo = ranked.select(col("lang").as("lo_lang"), col("rn").as("lo_rank"),
      col("n_chars").as("lo_val"))
    val hi = ranked.select(col("lang").as("hi_lang"), col("rn").as("hi_rank"),
      col("n_chars").as("hi_val"))
    val banded = bands
      .join(lo, col("lang") === col("lo_lang") && col("lo_rn") === col("lo_rank"))
      .join(hi, col("lang") === col("hi_lang") && col("hi_rn") === col("hi_rank"))
      .select(col("lang"), col("p"), col("lo_val"), col("hi_val"))
    val approx = t9_quantiles(s, dir).select(col("lang"),
      expr("stack(3, 0.5D, p50, 0.9D, p90, 0.99D, p99) AS (p, approx_val)"))
    approx.join(banded, Seq("lang", "p"))
      .filter(col("approx_val") < col("lo_val") || col("approx_val") > col("hi_val"))
      .select(col("lang"), col("p"), col("approx_val"), col("lo_val"), col("hi_val"))
      .orderBy("lang", "p")
  }

  val t9Sql: String =
    """SELECT ''::VARCHAR AS lang, 0.0::DOUBLE AS p, 0::BIGINT AS approx_val,
      |       0::BIGINT AS lo_val, 0::BIGINT AS hi_val
      |WHERE false""".stripMargin

  /** T10 n-gram language-model scoring: each document's mean bigram
    * log-probability under the corpus's own bigram model — the LM-quality
    * filter (CCNet-style) that web-scale pipelines run to rank text by
    * fluency. P(w2|w1) = c(w1 w2) / c(w1 ·), both counts from the corpus.
    *
    * Dataflow: tokens exploded with positions, bigrams by a (doc, pos+1)
    * self-join, counts via two grouped aggregates, probabilities joined
    * back by (w1, w2) and (w1) — shuffle equi-joins on the n-gram keys,
    * the model is never broadcast or collected (unbounded vocabulary).
    *
    * Determinism: each bigram's log-prob is pinned to an INTEGER micro-nat
    * grid (`floor(ln(c2/c1)·10⁶ + 0.5)` as BIGINT) before aggregation, so
    * the per-doc sum is exact 64-bit integer arithmetic — immune to both
    * libm last-ulp differences and double summation order. */
  def t10_bigram_lm(s: SparkSession, dir: String): DataFrame = {
    // row-local bigrams + derived context model (t26's restructure: the
    // positional self-join planned two extra corpus scans and a (doc, pos)
    // shuffle; c1 = Σ_w2 c2 re-aggregates the reduced model instead of
    // re-counting the corpus)
    val bi = Tables.documents(s, dir)
      .select(col("doc_id"), toks.as("tk"), size(toks).as("n"))
      .filter(col("n") >= 2)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, n - 1), " +
                     "i -> struct(tk[i-1] AS w1, tk[i] AS w2))")).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val scored = bi.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .withColumn("lp_micro",
        floor(log(col("c2").cast("double") / col("c1")) * 1000000.0 + 0.5).cast("long"))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_micro")).as("sum_lp"))
      .select(col("doc_id"), col("n_bigrams"),
              round4(col("sum_lp").cast("double") / 1000000.0 / col("n_bigrams"))
                .as("avg_lp"))
      .orderBy("doc_id")
  }

  val t10Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
      |         unnest(range(len(string_split(text, ' ')))) AS pos
      |  FROM documents
      |), bi AS (
      |  SELECT a.doc_id, a.tok AS w1, b.tok AS w2
      |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      |), c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
      |c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
      |scored AS (
      |  SELECT bi.doc_id,
      |    floor(ln(c2.c2::DOUBLE / c1.c1) * 1000000.0 + 0.5)::BIGINT AS lp_micro
      |  FROM bi JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
      |)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  floor(sum(lp_micro)::DOUBLE / 1000000.0 / count(*) * 10000.0 + 0.5)
      |    / 10000.0 AS avg_lp
      |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin

  /** T11 novelty / boilerplate scoring: the fraction of a document's
    * word-3-gram shingles that occur in NO other document (corpus document
    * frequency 1). Low novelty flags boilerplate (shingles shared across
    * many pages); high novelty flags unique content worth keeping — the
    * df-based curation signal web-scale corpus filters apply alongside
    * near-dedup.
    *
    * Spark plan: reuses [[Dedup.shingles]] (one scan+explode, materialized),
    * one shuffle aggregation for the corpus df table, one shuffle equi-join
    * shingle→df (the df side is unbounded vocabulary — never broadcast, the
    * d3/d4 lesson), one final per-doc aggregation. Linear in corpus size. */
  def t11_novelty(s: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingles(s, dir)
    val df = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    sh.join(df, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"),
           sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty", round4(col("n_unique").cast("double") / col("n_sh")))
      .orderBy("doc_id")
  }

  val t11Sql: String =
    s"""WITH ${Dedup.shinglesSqlCte},
      |df AS (SELECT sh, count(*) AS df FROM sh GROUP BY 1)
      |SELECT doc_id, count(*)::BIGINT AS n_sh,
      |  sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_unique,
      |  floor(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*)
      |        * 10000.0 + 0.5) / 10000.0 AS novelty
      |FROM sh JOIN df USING (sh)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** T12: repetition signals — the Gopher-class repetition filters
    * (Rae et al. 2021, §A1.1): the fraction of a document claimed by its
    * single most frequent unigram and by its most frequent bigram. High
    * values mark boilerplate/spam (navigation menus, keyword stuffing,
    * degenerate generations); the flags use the published 0.2 / 0.18
    * thresholds. Plan: one posexplode + two (doc, gram)-keyed partial-agg
    * shuffles — no vocabulary table, nothing collected, linear at any
    * corpus size. */
  def t12_repetition(s: SparkSession, dir: String): DataFrame = {
    val tokPos = Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(toks).as(Seq("pos", "tok")))
    val uni = tokPos.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top1"), sum(col("c")).as("n"))
    val bi = tokPos.select(col("doc_id"), col("pos"), col("tok").as("w1"))
      .join(tokPos.select(col("doc_id"), (col("pos") - 1).as("pos"), col("tok").as("w2")),
            Seq("doc_id", "pos"))
    val big = bi.groupBy(col("doc_id"), col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top2"), sum(col("c")).as("n2"))
    val uniFrac = col("top1").cast("double") / col("n")
    val biFrac = coalesce(col("top2"), lit(0L)).cast("double") / greatest(col("n2"), lit(1L))
    uni.join(big, Seq("doc_id"), "left")
      .select(col("doc_id"),
              round4(uniFrac).as("top_unigram_frac"),
              round4(biFrac).as("top_bigram_frac"),
              (round4(uniFrac) > 0.2 || round4(biFrac) > 0.18)
                .cast("int").as("repetitive"))
      .orderBy("doc_id")
  }

  val t12Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
      |         unnest(range(len(string_split(text, ' ')))) AS pos
      |  FROM documents
      |), uni AS (
      |  SELECT doc_id, max(c) AS top1, sum(c)::BIGINT AS n FROM (
      |    SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2)
      |  GROUP BY 1
      |), bi AS (
      |  SELECT a.doc_id, a.tok AS w1, b.tok AS w2
      |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      |), big AS (
      |  SELECT doc_id, max(c) AS top2, sum(c)::BIGINT AS n2 FROM (
      |    SELECT doc_id, w1, w2, count(*) AS c FROM bi GROUP BY 1, 2, 3)
      |  GROUP BY 1
      |), fr AS (
      |  SELECT uni.doc_id,
      |    floor(top1::DOUBLE / n * 10000.0 + 0.5) / 10000.0 AS top_unigram_frac,
      |    floor(coalesce(top2, 0)::DOUBLE / greatest(n2, 1) * 10000.0 + 0.5)
      |      / 10000.0 AS top_bigram_frac
      |  FROM uni LEFT JOIN big ON uni.doc_id = big.doc_id
      |)
      |SELECT doc_id, top_unigram_frac, top_bigram_frac,
      |  CASE WHEN top_unigram_frac > 0.2 OR top_bigram_frac > 0.18
      |       THEN 1 ELSE 0 END AS repetitive
      |FROM fr ORDER BY doc_id""".stripMargin

  /** T13: per-stratum QUOTA sampling — exactly N docs per language, chosen
    * by deterministic hash rank (md5 of the key, the t8 discipline, so the
    * sample is reproducible across engines, partitionings, and runs). t8's
    * threshold sampling is Bernoulli per stratum (expected rate, variable
    * count); training-data curation often needs exact per-language budgets,
    * which is an order statistic per stratum.
    *
    * Scale: the naive spelling is a window over the whole stratum — a full
    * shuffle-sort of every language's documents for 25 survivors. Instead
    * the canonical two-phase top-N: rank within (stratum, INPUT PARTITION)
    * — bounded local sorts — keep each partition's top N, then rank the
    * ≤ N·partitions survivors per stratum. The final result is provably
    * partition-independent: any stratum-wide top-N doc is top-N within its
    * own partition. */
  def t13_quota_sample(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val N = 25
    val h = md5(col("doc_id").cast("string").cast("binary"))
    val local = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"))
      .withColumn("h", h)
      .withColumn("pid", spark_partition_id())
      .withColumn("lrk", row_number().over(
        Window.partitionBy(col("lang"), col("pid"))
          .orderBy(col("h"), col("doc_id"))))
      .filter(col("lrk") <= N)
    local
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang"))
          .orderBy(col("h"), col("doc_id"))).cast("long"))
      .filter(col("rk") <= N)
      .select(col("doc_id"), col("lang"), col("rk"))
      .orderBy("lang", "rk")
  }

  val t13Sql: String =
    """WITH h AS (
      |  SELECT doc_id, lang, md5(doc_id::VARCHAR) AS h FROM documents
      |), r AS (
      |  SELECT doc_id, lang,
      |         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
      |  FROM h
      |)
      |SELECT doc_id, lang, rk FROM r WHERE rk <= 25 ORDER BY lang, rk""".stripMargin

  /** T14 benchmark-contamination check: the n-gram overlap test every
    * serious LLM training run performs before quoting eval numbers — if a
    * training document shares an n-gram with an eval-set document, the
    * eval score is contaminated (the GPT-3/PaLM-style decontamination
    * pass). Eval set = the established bounded `doc_id % 100` contract
    * (the query-side set every audit in this repo uses); training side =
    * everything else. n = 3 here so the sf0.01 oracle hashes a
    * non-degenerate result (187 contaminated pairs); production uses
    * n = 13 — the single constant below.
    *
    * Scale shape: grams are array-native per doc (transform + slice, no
    * self-join); the only shuffle is the gram equi-join + the pair
    * aggregation. The eval side is bounded by the modulo contract but is
    * NOT broadcast — at 100 TB an eval suite can still be millions of
    * grams, and the shuffle join on the gram key is skew-safe (AQE); at
    * petabyte scale the gram string is replaced by xxhash64(gram) as the
    * join key (8-byte fixed-width shuffle rows) — that production form is
    * the `spark.graft.gramHashKey` knob (default false: string keys keep
    * the DuckDB oracle byte-replayable; true: hashed keys, identical
    * output absent a 2⁻⁶⁴-probability xxhash64 collision between distinct
    * grams — the standard large-scale trade, MEASURED at sf1 in
    * STRESS_sf1.md with a counter-finding: key width does drop (mean gram
    * 15.5 chars ≈ 2× the 8-byte hash before per-string row overhead) but
    * wall time does NOT at test scale (6.69 → 6.98 s — single-box NVMe
    * shuffle is not byte-bound, so the hash's own cost shows instead).
    * The knob pays off only where shuffle bytes are the constraint —
    * network-bound multi-rack clusters — which is exactly what the
    * measurement says, so the string default stands). */
  def t14_contamination(s: SparkSession, dir: String): DataFrame =
    t14Rel(s, dir).orderBy("train_doc", "eval_doc")

  /** t14's contamination relation — the full (train_doc, eval_doc,
    * n_shared) table. NOT staged (optimization r16): the only consumer of
    * the full relation is the declared t14 query itself (one use per run),
    * and r15's unconditional `localCheckpoint` here charged every funnel
    * query an eager materialization of the whole pair table when all any
    * funnel leg reads is the contaminated-id SET — c15_budget_delta paid
    * 7.1 → 9.0 s for a checkpoint it used once (r15 verdict item 4). The
    * funnel legs now stage [[t14ContaminatedIds]] instead. */
  private def t14Rel(s: SparkSession, dir: String): DataFrame = {
    val N = 3
    val gramsStr = docGramsStr(s, dir, N)
    val grams =
      if (s.conf.get("spark.graft.gramHashKey", "false").toBoolean)
        gramsStr.select(col("doc_id"), xxhash64(col("gram")).as("gram"))
      else gramsStr
    val ev = grams.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("eval_doc"), col("gram"))
    val tr = grams.filter(col("doc_id") % 100 =!= 0)
      .select(col("doc_id").as("train_doc"), col("gram"))
    tr.join(ev, Seq("gram"))
      .groupBy(col("train_doc"), col("eval_doc"))
      .agg(count_distinct(col("gram")).as("n_shared"))
  }

  /** The FROZEN-EVAL CONTAMINATED-ID SET (train docs sharing ≥ 2 grams
    * with any eval doc), staged per (session, sf-dir) — what every funnel
    * consumer (c3's decontamination inside the c13 chain,
    * c15SettledIndex's settled gate, c15_manifest_increment's delta gate)
    * actually reads of t14. Staging THIS instead of the full t14 relation
    * (r15's choice) keeps the shared-artifact discipline (one gram
    * self-join per session; the eval set does not grow with the crawl)
    * while the materialized artifact is doc-id-set-sized, not
    * pair-table-sized. `Bench.clearShared` drops it per timed run. */
  private val t14Cache =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.sql.SparkSession, String), () => DataFrame]()

  private[graft] def t14ContaminatedIds(s: SparkSession, dir: String): DataFrame =
    cachedPerSession(t14Cache, s, dir) {
      t14Rel(s, dir)
        .filter(col("n_shared") >= 2)
        .select(col("train_doc").as("doc_id")).distinct()
        .localCheckpoint()
    }

  /** One row per (doc, word n-gram), string keys — t14's gram derivation,
    * shared with the bloom-pruned decontamination pass (c9). */
  private[graft] def docGramsStr(s: SparkSession, dir: String, n: Int): DataFrame = {
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(w) - ${n - 1}), i -> concat_ws(' ', slice(w, i, $n)))"))
        .as("gram"))
  }

  val t14Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3
      |), g AS (
      |  SELECT doc_id, list_aggregate(w[i:i+2], 'string_agg', ' ') AS gram
      |  FROM t CROSS JOIN (SELECT unnest(range(1, 1 + (SELECT max(len(w)) FROM t))) AS i)
      |  WHERE i + 2 <= len(w)
      |)
      |SELECT tr.doc_id AS train_doc, ev.doc_id AS eval_doc,
      |       count(DISTINCT tr.gram) AS n_shared
      |FROM g tr JOIN g ev ON tr.gram = ev.gram
      |WHERE ev.doc_id % 100 = 0 AND tr.doc_id % 100 <> 0
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** T15 data-mixture weights — the temperature-scaled multinomial
    * language-sampling recipe every multilingual pretraining run computes
    * (the CC-100/mT5 rule: w_l ∝ p_l^α with α = 0.3, up-sampling
    * low-resource languages): per detected language (t3), document and
    * token mass (t1's whitespace tokens), corpus share p, the α-tempered
    * normalized mixture weight w, and the implied epochs-over-proportional
    * ratio w/p — the numbers a data loader turns into per-source sampling
    * rates.
    *
    * Scale shape: one doc_id-keyed join (language × token count), one
    * lang-keyed aggregate; the normalization windows run over the LANGUAGE
    * relation, bounded by the language inventory (≤ a few hundred rows at
    * any corpus size), so the single-partition window is contractually
    * tiny. pow() — the one libm call either engine makes here — is pinned
    * to the 6-dp grid (t7's ln discipline); the weight normalizer sums
    * grid-pinned values as decimals, keeping it order-independent. */
  def t15_mixture_weights(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lang = t3_lang_id(s, dir).select(col("doc_id"), col("predicted"))
    val tok = t1_token_stats(s, dir).select(col("doc_id"), col("n_tokens"))
    val agg = lang.join(tok, Seq("doc_id"))
      .groupBy(col("predicted"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .withColumnRenamed("predicted", "lang")
    // single-partition windows over the bounded language relation only
    val all = Window.partitionBy(lit(1))
    agg
      .withColumn("p_raw", col("n_tokens").cast("double")
        / sum(col("n_tokens")).over(all).cast("double"))
      .withColumn("q", round6(pow(col("p_raw"), lit(0.3))))
      .withColumn("sumq",
        sum(col("q").cast("decimal(30,20)")).over(all).cast("double"))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
              round6(col("p_raw")).as("p_share"),
              round6(col("q") / col("sumq")).as("w_mix"),
              round4(col("q") / col("sumq") / col("p_raw")).as("epochs"))
      .orderBy("lang")
  }

  val t15Sql: String =
    s"""WITH p AS (
      |$t3Sql
      |), agg AS (
      |  SELECT p.predicted AS lang, count(*)::BIGINT AS n_docs,
      |         sum(len(string_split(d.text, ' ')))::BIGINT AS n_tokens
      |  FROM p JOIN documents d USING (doc_id)
      |  GROUP BY 1
      |), pw AS (
      |  SELECT lang, n_docs, n_tokens,
      |    n_tokens::DOUBLE / (SELECT sum(n_tokens) FROM agg)::DOUBLE AS p_raw,
      |    floor(pow(n_tokens::DOUBLE / (SELECT sum(n_tokens) FROM agg)::DOUBLE, 0.3)
      |          * 1000000.0 + 0.5) / 1000000.0 AS q
      |  FROM agg
      |)
      |SELECT lang, n_docs, n_tokens,
      |  floor(p_raw * 1000000.0 + 0.5) / 1000000.0 AS p_share,
      |  floor(q / (SELECT sum(q::DECIMAL(30,20)) FROM pw)::DOUBLE
      |        * 1000000.0 + 0.5) / 1000000.0 AS w_mix,
      |  floor(q / (SELECT sum(q::DECIMAL(30,20)) FROM pw)::DOUBLE / p_raw
      |        * 10000.0 + 0.5) / 10000.0 AS epochs
      |FROM pw ORDER BY lang""".stripMargin

  /** T16 blocklist scrub — the C4/RefinedWeb bad-words pass: count
    * blocklisted tokens per document, decide keep/drop on the hit ratio,
    * and emit the token-level REDACTED text (each hit replaced by a mask
    * token) — the scrub applied to PII and profanity lists in production.
    * The blocklist here is three corpus terms so the pass is exercised
    * non-degenerately on the synthetic word-soup (production swaps in the
    * email/phone/profanity patterns; the plan shape is identical). The
    * redacted text is verified cross-engine by md5 so the oracle hashes a
    * bounded column instead of shipping the full scrubbed body.
    *
    * Scale shape: a pure per-document projection — scrub, count, and
    * digest all happen at scan time inside one codegen'd stage; NO
    * shuffle (the orderBy exists only for the oracle compare). Only
    * `text` + `doc_id` are read. The blocklist is a literal IN-list here;
    * at production list sizes it becomes a broadcast set or a compiled
    * automaton, still per-row and shuffle-free. */
  def t16_blocklist_scrub(s: SparkSession, dir: String): DataFrame = {
    val bl = "('slow', 'big', 'merge')"
    val n = size(toks).cast("double")
    val nHits = size(expr(s"filter(split(text, ' '), t -> t IN $bl)"))
    val scrubbed = expr(
      s"concat_ws(' ', transform(split(text, ' '), t -> IF(t IN $bl, '[X]', t)))")
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        nHits.cast("long").as("n_hits"),
        round4(nHits.cast("double") / n).as("hit_ratio"),
        (nHits.cast("double") / n <= 0.10).as("keep"),
        md5(scrubbed).as("scrub_md5"))
      .orderBy("doc_id")
  }

  val t16Sql: String =
    """SELECT doc_id,
      |  len(list_filter(string_split(text, ' '),
      |      t -> t IN ('slow', 'big', 'merge')))::BIGINT AS n_hits,
      |  floor(len(list_filter(string_split(text, ' '),
      |      t -> t IN ('slow', 'big', 'merge')))::DOUBLE
      |    / len(string_split(text, ' ')) * 10000.0 + 0.5) / 10000.0 AS hit_ratio,
      |  (len(list_filter(string_split(text, ' '),
      |      t -> t IN ('slow', 'big', 'merge')))::DOUBLE
      |    / len(string_split(text, ' ')) <= 0.10) AS keep,
      |  md5(list_aggregate(list_transform(string_split(text, ' '),
      |      t -> CASE WHEN t IN ('slow', 'big', 'merge') THEN '[X]' ELSE t END),
      |      'string_agg', ' ')) AS scrub_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  /** T17 corpus heavy hitters — exact frequent-token mining with a
    * bounded-state sketch doing the pruning: pass 1 folds the token
    * stream into a k-counter Misra-Gries sketch
    * ([[graft.functions.MisraGriesAgg]] — map-side partials, mergeable
    * across any partitioning, O(k·partitions) bytes on the wire); pass 2
    * joins the ≤ k candidates back (a broadcast bounded BY CONSTRUCTION
    * to k rows — the sketch capacity is the contract) and exact-counts
    * only them, filtering to true frequency > N/(k+1). The sketch
    * guarantee (never misses a heavy hitter) makes the composition
    * EXACT, so the oracle is the plain HAVING-threshold SQL — while the
    * full-vocabulary shuffle the naive plan needs (billions of distinct
    * tokens at 100 TB) is replaced by a k-candidate one. */
  def t17_heavy_hitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 40
    val tokens = Tables.documents(s, dir)
      .select(explode(toks).as("tok"))
    val sketch = tokens.as[String]
      .select(new graft.functions.MisraGriesAgg(k).toColumn.name("cands"))
    val cands = sketch.toDF("cands")
      .select(explode(col("cands")).as("tok"))
    val total = tokens.agg(count(lit(1)).as("n"))
    tokens
      .join(broadcast(cands), Seq("tok")) // ≤ k rows by sketch capacity
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * (k + 1) > col("n")) // exact integer threshold
      .select(col("tok"), col("cnt"))
      .orderBy(desc("cnt"), asc("tok"))
  }

  val t17Sql: String =
    """WITH tk AS (
      |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
      |), tot AS (SELECT count(*) AS n FROM tk)
      |SELECT tok, count(*)::BIGINT AS cnt
      |FROM tk, tot
      |GROUP BY tok, n
      |HAVING count(*) * 41 > n
      |ORDER BY cnt DESC, tok""".stripMargin

  /** Number of BPE merge rounds trained by [[t18_bpe_merges]] (the oracle
    * unrolls the same number of rounds symbolically). */
  val bpeRounds = 4

  /** Greedy left-to-right merge of adjacent pair (a, b) inside one token
    * array — a single in-order fold (`aggregate`), the exact semantics every
    * BPE trainer applies per word: scan left to right, replace the first
    * available `a b` adjacency with the merged symbol, and never let a
    * freshly merged symbol re-match as the LEFT of an overlapping pair
    * (automatic here: the merged symbol `a_b` ≠ `a` since `b` is nonempty).
    * `try_element_at` keeps the empty-accumulator probe ANSI-safe. */
  private[graft] def mergeGreedy(arr: Column, a: Column, b: Column): Column =
    aggregate(arr, array().cast("array<string>"),
      (acc, x) =>
        when(try_element_at(acc, lit(-1)) === a && x === b,
             concat(slice(acc, lit(1), size(acc) - 1),
                    array(concat(a, lit("_"), b))))
          .otherwise(concat(acc, array(x))))

  /** T18 distributed BPE tokenizer training — the [[bpeRounds]] first merge
    * rounds of byte-pair encoding learned over the whole corpus, the
    * canonical tokenizer-training job of an LLM data pipeline (Sennrich et
    * al. 2016; the word-level variant sentencepiece/HF trainers run before
    * byte fallback). Each round: (1) count every adjacent token pair
    * corpus-wide, (2) pick the most frequent pair (ties broken
    * lexicographically — determinism contract), (3) re-tokenize every
    * document by greedily merging that pair left to right.
    *
    * Spark plan, per round: the pair count is ONE map-side-combined shuffle
    * over (w1, w2); the winning rule is a `TakeOrderedAndProject` top-1
    * (never a global sort) broadcast as a single row; re-tokenization is a
    * SHUFFLE-FREE narrow projection — a per-document `aggregate` fold over
    * the token array ([[mergeGreedy]]), so document payloads never move
    * between executors across rounds. Each round's corpus is materialized
    * (`localCheckpoint`; `persist(MEMORY_AND_DISK)` on a cluster) because
    * two consumers branch from it (next round's pair count + the
    * tokens-after audit) and the merge-rule lineage is inherently
    * sequential. K rounds = K linear passes — the same shape a
    * thousand-executor BPE trainer runs at 100 TB, where the vocabulary
    * (pair-count) shuffle is bounded by distinct adjacent pairs, not corpus
    * bytes. Output: one row per round — the learned merge rule, its count
    * at merge time, and the corpus token total after applying it. */
  def t18_bpe_merges(s: SparkSession, dir: String): DataFrame =
    bpeTrain(s, dir)._2.reduce(_.union(_)).orderBy("step")

  /** The shared BPE training chain: [[bpeRounds]] rounds of pair-count →
    * top-1 rule → greedy re-tokenize. Returns (final re-tokenized corpus,
    * one 1-row step summary per round). t18 reports the steps; t20 applies
    * the final corpus. */
  private def bpeTrain(s: SparkSession, dir: String)
      : (DataFrame, Seq[DataFrame]) = {
    var docs = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("arr"))
      .localCheckpoint()
    val steps = (1 to bpeRounds).map { r =>
      val n1 = size(col("arr")) - 1
      val pairs = docs
        .select(explode(zip_with(
          slice(col("arr"), lit(1), greatest(n1, lit(0))),
          slice(col("arr"), lit(2), greatest(n1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      val best = pairs.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("w1"), asc("w2")).limit(1)
        .localCheckpoint() // 1 row; consumed by the re-tokenize AND the output
      // the merge pass: native O(n) expression by default; the composed
      // O(n²)-per-doc fold survives as the bit-identity cross-check
      // (BpeMergeSpec) and the `bpeNative=false` escape hatch
      val mergePass =
        if (s.conf.get("spark.graft.bpeNative", "true").toBoolean) {
          graft.functions.BpeMerge.register(s)
          call_function("bpe_merge", col("arr"), col("w1"), col("w2"))
        } else mergeGreedy(col("arr"), col("w1"), col("w2"))
      docs = docs.crossJoin(broadcast(best))
        .select(col("doc_id"), mergePass.as("arr"))
        .localCheckpoint()
      val after = docs.agg(sum(size(col("arr"))).cast("long").as("tokens_after"))
      best.crossJoin(broadcast(after))
        .select(lit(r.toLong).as("step"), col("w1"), col("w2"), col("cnt"),
                col("tokens_after"))
    }
    (docs, steps)
  }

  /** T20: the APPLY half of the tokenizer — encode the corpus with the
    * merge table [[t18_bpe_merges]] learned and report the per-language
    * compression ledger (docs, tokens before/after, compression ratio)
    * that decides whether a tokenizer is fit for a mixture. Training and
    * application are the same chain here (the corpus IS the training set);
    * in production the 4-rule table is the broadcast artifact and the
    * apply pass is the chain's shuffle-free fold over any OTHER corpus —
    * which is why the fold ([[mergeGreedy]]) and the rule selection are
    * separate stages. One extra shuffle total: the final (lang) rollup. */
  def t20_bpe_encode(s: SparkSession, dir: String): DataFrame = {
    val encoded = bpeTrain(s, dir)._1
    encoded
      .join(Tables.documents(s, dir)
              .select(col("doc_id"), col("lang"),
                      size(split(col("text"), " ")).cast("long").as("n_before")),
            Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_before")).as("tok_before"),
           sum(size(col("arr"))).cast("long").as("tok_after"))
      .withColumn("ratio",
        round4(col("tok_after").cast("double") / col("tok_before")))
      .orderBy("lang")
  }

  /** t20's oracle: the t18 chain's final corpus CTE rolled up per language. */
  val t20Sql: String = {
    val ctes = (1 to bpeRounds).map(bpeRoundSqlCtes).mkString(",\n")
    s"""WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
       |$ctes
       |SELECT d.lang, count(*)::BIGINT AS n_docs,
       |  sum(len(string_split(d.text, ' ')))::BIGINT AS tok_before,
       |  sum(len(t.arr))::BIGINT AS tok_after,
       |  floor(sum(len(t.arr))::DOUBLE / sum(len(string_split(d.text, ' ')))
       |        * 10000.0 + 0.5) / 10000.0 AS ratio
       |FROM t$bpeRounds t JOIN documents d USING (doc_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** T31: BPE ROUND-TRIP FIDELITY AUDIT — the check every tokenizer
    * deploy runs before shipping a vocab: decode ∘ encode must be the
    * identity on the corpus. The merge representation joins pairs with
    * '_' ([[mergeGreedy]]), so decode is replace('_', ' ') + re-join —
    * and the audit's one real failure mode is exactly the SEPARATOR
    * COLLISION every word-level BPE has (a source token that itself
    * contains '_' decodes to the wrong text), the reason sentencepiece
    * reserves '▁'. Reports per language: docs and round-trip violations —
    * zero means the vocab is safe to ship on this corpus; nonzero is the
    * measured collision count, not a crash. The w4-approx invariant-audit
    * class: both engines must agree on the violation COUNT bit-for-bit.
    *
    * Scale shape: t18's chain (its cost IS the audit's cost) plus one
    * shuffle-free per-doc decode projection and a lang-bounded rollup. */
  def t31_bpe_roundtrip(s: SparkSession, dir: String): DataFrame = {
    val encoded = bpeTrain(s, dir)._1
    encoded
      .join(Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("text")),
            Seq("doc_id"))
      .withColumn("decoded",
        concat_ws(" ", expr("transform(arr, t -> replace(t, '_', ' '))")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("decoded") =!= col("text"), 1L).otherwise(0L)).as("n_violations"))
      .orderBy("lang")
  }

  /** t31's oracle: the t18 chain's final corpus decoded and compared. */
  val t31Sql: String = {
    val ctes = (1 to bpeRounds).map(bpeRoundSqlCtes).mkString(",\n")
    s"""WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
       |$ctes
       |SELECT d.lang, count(*)::BIGINT AS n_docs,
       |  sum(CASE WHEN array_to_string(
       |        list_transform(t.arr, x -> replace(x, '_', ' ')), ' ') <> d.text
       |      THEN 1 ELSE 0 END)::BIGINT AS n_violations
       |FROM t$bpeRounds t JOIN documents d USING (doc_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** One BPE round's oracle CTE block (tok/pc/b/cand/cr/ms/nt/t$r) — shared
    * by the t18 and t20 oracles. [[bpeRounds]] rounds chain as MATERIALIZED
    * CTEs (the s4/c2 symbolic-unroll discipline — MATERIALIZED because each
    * round's corpus is referenced by three downstream CTEs, and DuckDB's
    * default inlining would re-evaluate the chain exponentially). The greedy
    * left-to-right merge is expressed relationally: candidate adjacencies →
    * maximal runs of consecutive candidates (overlap is only possible when
    * w1 = w2) → odd run offsets are the merge starts — provably the same
    * positions [[mergeGreedy]]'s in-order fold merges. */
  private def bpeRoundSqlCtes(r: Int): String =
    s"""tok$r AS MATERIALIZED (
         |  SELECT doc_id, unnest(arr) AS tok, generate_subscripts(arr, 1) AS pos
         |  FROM t${r - 1}
         |), pc$r AS (
         |  SELECT a.tok AS w1, b.tok AS w2, count(*) AS cnt
         |  FROM tok$r a JOIN tok$r b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  GROUP BY 1, 2
         |), b$r AS MATERIALIZED (
         |  SELECT w1, w2, cnt FROM pc$r ORDER BY cnt DESC, w1, w2 LIMIT 1
         |), cand$r AS (
         |  SELECT t.doc_id, t.pos,
         |    (t.tok = b.w1 AND
         |     lead(t.tok) OVER (PARTITION BY t.doc_id ORDER BY t.pos) = b.w2) AS cand
         |  FROM tok$r t CROSS JOIN b$r b
         |), cr$r AS (
         |  SELECT doc_id, pos,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS runid
         |  FROM cand$r WHERE cand
         |), ms$r AS MATERIALIZED (
         |  SELECT doc_id, pos FROM (
         |    SELECT doc_id, pos,
         |      row_number() OVER (PARTITION BY doc_id, runid ORDER BY pos) AS rn
         |    FROM cr$r) WHERE rn % 2 = 1
         |), nt$r AS MATERIALIZED (
         |  SELECT t.doc_id, t.pos,
         |    CASE WHEN m1.pos IS NOT NULL
         |         THEN (SELECT w1 || '_' || w2 FROM b$r) ELSE t.tok END AS tok
         |  FROM tok$r t
         |  LEFT JOIN ms$r m1 ON t.doc_id = m1.doc_id AND t.pos = m1.pos
         |  LEFT JOIN ms$r m2 ON t.doc_id = m2.doc_id AND t.pos = m2.pos + 1
         |  WHERE m2.pos IS NULL
         |), t$r AS (
         |  SELECT doc_id, list(tok ORDER BY pos) AS arr FROM nt$r GROUP BY doc_id
         |)""".stripMargin

  val t18Sql: String = {
    val ctes = (1 to bpeRounds).map(bpeRoundSqlCtes).mkString(",\n")
    val outs = (1 to bpeRounds).map(r =>
      s"""SELECT $r AS step, w1, w2, cnt,
         |    (SELECT count(*) FROM nt$r) AS tokens_after FROM b$r""".stripMargin)
      .mkString("\n  UNION ALL ")
    s"""WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
       |$ctes,
       |out AS (
       |  $outs
       |)
       |SELECT step::BIGINT AS step, w1, w2, cnt::BIGINT AS cnt,
       |  tokens_after::BIGINT AS tokens_after
       |FROM out ORDER BY step""".stripMargin
  }

  /** T19 context-window SEQUENCE PACKING — the GPT-style concat-and-chunk
    * step that turns a curated corpus into fixed-length training sequences:
    * documents are laid end to end in doc_id order and the token stream is
    * cut into chunks of L = 128 tokens. Emits the packing manifest every
    * trainer shard-reader needs: per chunk, its token fill (only the last
    * chunk is short — concat packing has zero padding waste by
    * construction), how many documents overlap it, and how many begin in it
    * (the boundaries where attention masks / EOD tokens go).
    *
    * The load-bearing primitive is the GLOBAL token offset of every
    * document — an exact prefix sum over the corpus order. The naive
    * spelling is `sum() OVER (ORDER BY doc_id)`: a single-partition global
    * sort-window, the same 100 TB bottleneck [[QUtil.denseIds]] kills for
    * ranks. Same cure here, applied to sums: (1) running sums WITHIN
    * doc_id-range buckets — partitioned windows, parallel across buckets;
    * (2) per-bucket totals prefix-summed in ONE window over only the bucket
    * relation (rows = docs / [[packBucketWidth]] — the declared scaling
    * knob; at petabyte doc counts it becomes a two-level cascade, same
    * algebra); (3) broadcast the bounded bucket-offset relation back. The
    * chunk explosion amplifies rows only to output size (a doc spans
    * ⌈n_tok/L⌉ chunks). One shuffle for the final per-chunk aggregation. */
  def t19_sequence_packing(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val L = 128L
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), size(toks).cast("long").as("n_tok"),
              expr(s"doc_id div $packBucketWidth").as("bkt"))
    val inBkt = Window.partitionBy(col("bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bktOff = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = d.groupBy(col("bkt")).agg(sum(col("n_tok")).as("bn"))
      .withColumn("boff", coalesce(sum(col("bn")).over(bktOff), lit(0L)))
      .select(col("bkt"), col("boff")) // docs/packBucketWidth rows — bounded
    val total = d.agg(sum(col("n_tok")).as("total"))
    d.withColumn("brun", coalesce(sum(col("n_tok")).over(inBkt), lit(0L)))
      .join(broadcast(offsets), Seq("bkt"))
      .withColumn("off", col("boff") + col("brun"))
      .select(col("off"), col("n_tok"),
              explode(sequence(expr(s"off div $L"),
                               expr(s"(off + n_tok - 1) div $L"))).as("chunk_id"))
      .groupBy(col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
           sum(when(expr(s"off div $L") === col("chunk_id"), 1L)
             .otherwise(0L)).as("n_starts"))
      .crossJoin(broadcast(total))
      .select(col("chunk_id"),
              least(lit(L), col("total") - col("chunk_id") * L).as("n_tokens"),
              col("n_docs"), col("n_starts"))
      .orderBy("chunk_id")
  }

  /** doc_id range per offset bucket in [[t19_sequence_packing]] — sized so
    * the bucket-offset relation stays broadcastable at the bench SFs (sf1:
    * 50k docs → ~196 buckets). */
  val packBucketWidth = 256L

  val t19Sql: String =
    """WITH d AS (
      |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tok
      |  FROM documents
      |), o AS (
      |  SELECT doc_id, n_tok,
      |    coalesce(sum(n_tok) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS off
      |  FROM d
      |), t AS (SELECT sum(n_tok)::BIGINT AS total FROM d),
      |ch AS (
      |  SELECT off, n_tok,
      |    unnest(range(off // 128, (off + n_tok - 1) // 128 + 1)) AS chunk_id
      |  FROM o
      |)
      |SELECT chunk_id::BIGINT AS chunk_id,
      |  least(128, t.total - chunk_id * 128)::BIGINT AS n_tokens,
      |  count(*)::BIGINT AS n_docs,
      |  sum(CASE WHEN off // 128 = chunk_id THEN 1 ELSE 0 END)::BIGINT AS n_starts
      |FROM ch, t GROUP BY chunk_id, t.total ORDER BY chunk_id""".stripMargin

  /** T21 pattern-class redaction — the PII-scrub SHAPE of a C4/CCNet-style
    * privacy pass (emails, phones, IDs → placeholder tokens), exercised
    * here with pattern classes the synthetic vocabulary actually contains:
    * an entity class (`customer|supplier|part` as whole words) and a
    * suffix class (`\w+er` words) redacted IN ORDER, so the second pattern
    * scans the already-entity-redacted text exactly as a chained scrub
    * pipeline would. Emits per-doc match counts per class and the digest
    * of the fully-redacted text — the audit row a redaction job publishes.
    *
    * Differs from t16 (token-set membership over a split) in machinery:
    * this is REGEX-SPAN matching — `regexp_extract_all` + global
    * `regexp_replace` — the form real PII patterns need (boundaries,
    * alternation, quantifiers), with Java-regex/RE2 portability pinned to
    * the common subset (`\b`, `\w`, alternation; no backrefs/lookaround —
    * DuckDB needs the explicit 'g' flag where Spark replaces globally).
    * Pure per-row projection: no shuffle, scan-pruned to (doc_id, text),
    * codegen'd end-to-end — at 100 TB this is the cheapest pass class. */
  def t21_regex_redact(s: SparkSession, dir: String): DataFrame = {
    val entPat = "\\b(customer|supplier|part)\\b"
    val sfxPat = "\\b\\w+er\\b"
    val red1 = regexp_replace(col("text"), entPat, "[ENT]")
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(entPat), lit(0)))
          .cast("long").as("n_ent"),
        size(regexp_extract_all(red1, lit(sfxPat), lit(0)))
          .cast("long").as("n_sfx"),
        md5(regexp_replace(red1, sfxPat, "[SFX]")).as("redact_md5"))
      .orderBy("doc_id")
  }

  val t21Sql: String =
    """SELECT doc_id,
      |  len(regexp_extract_all(text, '\b(customer|supplier|part)\b'))::BIGINT
      |    AS n_ent,
      |  len(regexp_extract_all(
      |    regexp_replace(text, '\b(customer|supplier|part)\b', '[ENT]', 'g'),
      |    '\b\w+er\b'))::BIGINT AS n_sfx,
      |  md5(regexp_replace(
      |    regexp_replace(text, '\b(customer|supplier|part)\b', '[ENT]', 'g'),
      |    '\b\w+er\b', '[SFX]', 'g')) AS redact_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  /** T22 in-engine quality-classifier TRAINING — the fastText-style learned
    * quality filter of a modern data pipeline (labels from a cheap
    * heuristic, a linear model trained to reproduce and generalize it),
    * run entirely as relational algebra: two batch-gradient-descent
    * iterations of logistic regression over 16 hashed token-frequency
    * features, the text-domain twin of s4's in-engine Lloyd loop. Labels
    * are the integer-exact unique-words rule (2·distinct ≥ total); the
    * feature hash is the [[QUtil.denseIds]] dictionary id mod 16 (the
    * engine-portable bucket assignment every sketch query shares). Emits
    * the trained weight per bucket (bias at bucket −1) and the training
    * accuracy — the artifact a filter-training job ships.
    *
    * Cross-engine exactness through training, by the established
    * discipline: grid-pinned features (6 dp), residual products summed in
    * DECIMAL(30,20) (shuffle-order-proof), cast-then-divide for the 1/N
    * step, and the ONE transcendental (the iteration-2 sigmoid — iteration
    * 1 starts at w=0 where p is exactly ½) pinned to the 6-dp grid before
    * re-entering arithmetic, the t10/t15 ln/pow treatment. The oracle
    * unrolls both iterations as MATERIALIZED CTEs.
    *
    * Scale shape: per iteration, ONE (doc,bucket)-keyed join+agg against a
    * ≤17-row weight relation (bounded by construction B=16, broadcast) and
    * one doc-keyed residual join — gradients are map-side-combined partial
    * sums; nothing ever collects to the driver and the corpus streams once
    * per iteration, exactly Lloyd's profile. */
  def t22_quality_classifier(s: SparkSession, dir: String): DataFrame = {
    val B = 16
    val DEC = "decimal(30,20)"
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .localCheckpoint() // consumed by dict, labels, and features
    val dict = QUtil.denseIds(toks.select("tok").distinct(), "tok", "tok_id")
    val labels = toks.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), count_distinct(col("tok")).as("nd"))
      .select(col("doc_id"), col("n"),
              when(col("nd") * 2 >= col("n"), 1.0).otherwise(0.0).as("y"))
      .localCheckpoint()
    val nRel = labels.agg(count(lit(1)).as("nn"))
    val feats = toks.join(dict, Seq("tok"))
      .select(col("doc_id"), (col("tok_id") % B).as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("cnt"))
      .join(labels.select("doc_id", "n"), Seq("doc_id"))
      .select(col("doc_id"), col("b"),
              round6(col("cnt").cast("double") / col("n")).as("x"))
      .localCheckpoint() // consumed by every gradient and margin pass
    // gradient of the log-loss at prediction relation p(doc_id, p):
    // per-bucket and bias components, decimal-folded, grid-pinned
    def grad(p: DataFrame): (DataFrame, DataFrame) = {
      val r = p.join(labels.select("doc_id", "y"), Seq("doc_id"))
        .select(col("doc_id"), (col("p") - col("y")).as("r"))
      val gb = feats.join(r, Seq("doc_id"))
        .groupBy(col("b")).agg(sum((col("x") * col("r")).cast(DEC)).as("sd"))
        .crossJoin(broadcast(nRel))
        .select(col("b"), round6(col("sd").cast("double") / col("nn")).as("g"))
      val g0 = r.agg(sum(col("r").cast(DEC)).as("sd"))
        .crossJoin(broadcast(nRel))
        .select(round6(col("sd").cast("double") / col("nn")).as("g0"))
      (gb, g0)
    }
    // iteration 1: w = 0 ⇒ p ≡ 0.5 exactly (no transcendental)
    val (g1, g01) = grad(labels.select(col("doc_id"), lit(0.5).as("p")))
    val w1 = g1.select(col("b"), (-col("g")).as("w")).localCheckpoint()
    val bias1 = g01.select((-col("g0")).as("bias"))
    // iteration 2: margins under w1, sigmoid pinned to the grid
    val p2 = feats.join(broadcast(w1), Seq("b"))
      .groupBy(col("doc_id")).agg(sum((col("x") * col("w")).cast(DEC)).as("sd"))
      .crossJoin(broadcast(bias1))
      .select(col("doc_id"),
              round6(col("sd").cast("double") + col("bias")).as("m"))
      .select(col("doc_id"),
              round6(lit(1.0) / (lit(1.0) + exp(-col("m")))).as("p"))
      .localCheckpoint() // consumed by the gradient and the accuracy audit
    val (g2, g02) = grad(p2)
    val acc = p2.join(labels.select("doc_id", "y"), Seq("doc_id"))
      .agg(sum(when((col("p") >= 0.5) === (col("y") === 1.0), 1L).otherwise(0L)).as("ok"))
      .crossJoin(broadcast(nRel))
      .select(round4(col("ok").cast("double") / col("nn")).as("train_acc"))
    val wOut = w1.join(g2, Seq("b"))
      .select(col("b").cast("long").as("bucket"), (col("w") - col("g")).as("w"))
      .unionAll(bias1.crossJoin(g02)
        .select(lit(-1L).as("bucket"), (col("bias") - col("g0")).as("w")))
    wOut.crossJoin(broadcast(acc)).orderBy("bucket")
  }

  val t22Sql: String = {
    // ::VARCHAR::DOUBLE on the decimal sums: DuckDB's direct DECIMAL→DOUBLE
    // double-rounds (int128→double, then ×10⁻²⁰), so a sum like
    // 3.471249999999999998… converts to 3.4712499999999995 instead of the
    // correctly-rounded 3.47125 — one grid point below Spark's
    // BigDecimal.doubleValue at an R6 half-way boundary (bucket 7 at
    // sf0.001 trips it). The VARCHAR hop is strtod, correctly rounded,
    // matching Spark exactly at every boundary.
    val R6 = (e: String) => s"floor(($e) * 1000000.0 + 0.5) / 1000000.0"
    s"""WITH tok AS MATERIALIZED (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      |), dtoks AS (SELECT DISTINCT tok FROM tok),
      |dict AS MATERIALIZED (
      |${QUtil.denseIdsSqlCte("dtoks", "tok", "tok_id")}
      |), labels AS MATERIALIZED (
      |  SELECT doc_id, count(*) AS n,
      |    CASE WHEN 2 * count(DISTINCT tok) >= count(*) THEN 1.0 ELSE 0.0 END AS y
      |  FROM tok GROUP BY 1
      |), nrel AS (SELECT count(*)::BIGINT AS nn FROM labels),
      |featc AS (
      |  SELECT t.doc_id, d.tok_id % 16 AS b, count(*) AS cnt
      |  FROM tok t JOIN dict d USING (tok) GROUP BY 1, 2
      |), feats AS MATERIALIZED (
      |  SELECT f.doc_id, f.b, ${R6("f.cnt::DOUBLE / l.n")} AS x
      |  FROM featc f JOIN labels l USING (doc_id)
      |), g1 AS (
      |  SELECT f.b, ${R6("sum((f.x * (0.5 - l.y))::DECIMAL(30,20))::VARCHAR::DOUBLE / (SELECT nn FROM nrel)")} AS g
      |  FROM feats f JOIN labels l USING (doc_id) GROUP BY 1
      |), w1 AS MATERIALIZED (SELECT b, -g AS w FROM g1),
      |b1 AS MATERIALIZED (
      |  SELECT -(${R6("sum((0.5 - y)::DECIMAL(30,20))::VARCHAR::DOUBLE / (SELECT nn FROM nrel)")}) AS bias
      |  FROM labels
      |), p2 AS MATERIALIZED (
      |  SELECT doc_id, ${R6("1.0 / (1.0 + exp(-m))")} AS p FROM (
      |    SELECT f.doc_id,
      |      ${R6("sum((f.x * w.w)::DECIMAL(30,20))::VARCHAR::DOUBLE + (SELECT bias FROM b1)")} AS m
      |    FROM feats f JOIN w1 w USING (b) GROUP BY 1)
      |), g2 AS MATERIALIZED (
      |  SELECT f.b, ${R6("sum((f.x * (p.p - l.y))::DECIMAL(30,20))::VARCHAR::DOUBLE / (SELECT nn FROM nrel)")} AS g
      |  FROM feats f JOIN p2 p USING (doc_id) JOIN labels l USING (doc_id)
      |  GROUP BY 1
      |), b2 AS MATERIALIZED (
      |  SELECT ${R6("sum((p.p - l.y)::DECIMAL(30,20))::VARCHAR::DOUBLE / (SELECT nn FROM nrel)")} AS g0
      |  FROM p2 p JOIN labels l USING (doc_id)
      |), acc AS MATERIALIZED (
      |  SELECT floor(sum(CASE WHEN (p.p >= 0.5) = (l.y = 1.0) THEN 1 ELSE 0 END)::DOUBLE
      |    / (SELECT nn FROM nrel) * 10000.0 + 0.5) / 10000.0 AS train_acc
      |  FROM p2 p JOIN labels l USING (doc_id)
      |)
      |SELECT w.b::BIGINT AS bucket, w.w - g2.g AS w,
      |       (SELECT train_acc FROM acc) AS train_acc
      |FROM w1 w JOIN g2 USING (b)
      |UNION ALL
      |SELECT -1, (SELECT bias FROM b1) - (SELECT g0 FROM b2),
      |       (SELECT train_acc FROM acc)
      |ORDER BY bucket""".stripMargin
  }

  /** T23: sliding-window document CHUNKING — the context-window shaper
    * every RAG indexer and long-document pretraining pipeline runs between
    * cleaning and packing: each document becomes overlapping token windows
    * of W = 64 tokens at stride S = 48 (16-token overlap, the standard
    * boundary-context trick). Emitted per chunk: its position (chunk_id =
    * start/S, token start/length) and an md5 fingerprint of the chunk text
    * — the manifest a chunk-level dedup or an embedding job consumes,
    * without materializing chunk text as output.
    *
    * Scale shape: a pure per-row projection — `sequence` + `explode` +
    * `slice` generate each document's chunk set inside the scan task; NO
    * shuffle anywhere (the orderBy is presentation-only), no state, and
    * chunk count is ⌈n_tok/S⌉ per document — output is ~(1 + W/S)× input
    * tokens by construction. Whole-stage codegen covers the entire plan.
    * Cross-engine: chunk boundaries are integer arithmetic; the fingerprint
    * is md5 of the space-joined token slice, byte-identical in DuckDB. */
  def t23_doc_chunking(s: SparkSession, dir: String): DataFrame = {
    val W = 64
    val S = 48
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), toks.as("tk"),
              size(toks).cast("long").as("n_tok"))
      .select(col("doc_id"), col("lang"), col("tk"), col("n_tok"),
        explode(sequence(lit(0L), greatest(col("n_tok") - 1, lit(0L)),
                         lit(S.toLong))).as("tok_start"))
      .filter(col("tok_start") < col("n_tok")) // n_tok = 0 ⇒ no chunks
      .withColumn("tok_len", least(lit(W.toLong), col("n_tok") - col("tok_start")))
      .select(col("doc_id"), col("lang"),
              (col("tok_start") / S).cast("long").as("chunk_id"),
              col("tok_start"), col("tok_len"),
              md5(concat_ws(" ",
                slice(col("tk"), (col("tok_start") + 1).cast("int"),
                      col("tok_len").cast("int")))).as("chunk_hash"))
      .orderBy("doc_id", "chunk_id")
  }

  val t23Sql: String =
    """WITH d AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS tk,
      |         len(string_split(text, ' '))::BIGINT AS n_tok
      |  FROM documents
      |), starts AS (
      |  SELECT doc_id, lang, tk, n_tok, unnest(range(0, greatest(n_tok, 1), 48)) AS tok_start
      |  FROM d
      |)
      |SELECT doc_id, lang, (tok_start // 48)::BIGINT AS chunk_id,
      |  tok_start::BIGINT AS tok_start,
      |  least(64, n_tok - tok_start)::BIGINT AS tok_len,
      |  md5(array_to_string(tk[tok_start + 1 : tok_start + least(64, n_tok - tok_start)], ' ')) AS chunk_hash
      |FROM starts WHERE tok_start < n_tok
      |ORDER BY doc_id, chunk_id""".stripMargin

  /** T24: chunk-level exact dedup — d1's canonical-min discipline applied
    * to t23's chunk manifest: chunks with identical content (same md5 of
    * the token window) dedupe ACROSS documents, each group keeping its
    * lexicographically-first (doc_id, chunk_id) as canonical — the
    * near-verbatim-span removal a RAG index runs between chunking and
    * embedding, at chunk granularity where d11's substring dedup works at
    * gram granularity. One shuffle on chunk_hash; audit-friendly full
    * output (every chunk row with its verdict), same as d1. */
  def t24_chunk_dedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byHash = Window.partitionBy(col("chunk_hash"))
    val ordered = byHash.orderBy(col("doc_id"), col("chunk_id"))
    t23_doc_chunking(s, dir)
      .select(col("doc_id"), col("chunk_id"), col("chunk_hash"))
      .withColumn("n_copies", count(lit(1)).over(byHash))
      .withColumn("canon_doc", first(col("doc_id")).over(ordered))
      .withColumn("canon_chunk", first(col("chunk_id")).over(ordered))
      .select(col("doc_id"), col("chunk_id"), col("chunk_hash"), col("n_copies"),
              col("canon_doc"), col("canon_chunk"),
              (col("doc_id") =!= col("canon_doc") ||
               col("chunk_id") =!= col("canon_chunk")).as("is_dup"))
      .orderBy("doc_id", "chunk_id")
  }

  val t24Sql: String =
    s"""WITH chunks AS (
      |$t23Sql
      |)
      |SELECT doc_id, chunk_id, chunk_hash,
      |  count(*) OVER h AS n_copies,
      |  first_value(doc_id) OVER o AS canon_doc,
      |  first_value(chunk_id) OVER o AS canon_chunk,
      |  (doc_id <> first_value(doc_id) OVER o
      |   OR chunk_id <> first_value(chunk_id) OVER o) AS is_dup
      |FROM chunks
      |WINDOW h AS (PARTITION BY chunk_hash),
      |       o AS (PARTITION BY chunk_hash ORDER BY doc_id, chunk_id)
      |ORDER BY doc_id, chunk_id""".stripMargin

  /** T25: per-SOURCE quota capping — the C4/crawl-curation pass that stops
    * any one domain from dominating the corpus: each source keeps at most
    * its 15 highest-quality documents (t2's composite score, ties to the
    * lower doc_id), everything else is dropped. Complements t13 (hash-fair
    * per-language quotas) with quality-ranked per-domain caps — together
    * they are the two standard anti-skew admission rules a crawl pipeline
    * runs.
    *
    * Scale shape: one shuffle on source; the rank-≤-N filter lowers to
    * `WindowGroupLimit` (bounded per-task top-N heaps before the shuffle,
    * final heaps after — asserted for this query class in
    * `QueriesSmokeSpec`), so no source's full document list is ever sorted
    * or held on one task beyond N rows. */
  def t25_source_quota(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val N = 15
    val q = t2_quality_score(s, dir).select(col("doc_id"), col("quality"))
    Tables.documents(s, dir).select(col("doc_id"), col("source"))
      .join(q, Seq("doc_id"))
      .withColumn("src_rank", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("quality").desc, col("doc_id"))).cast("long"))
      .filter(col("src_rank") <= N)
      .select(col("doc_id"), col("source"), col("quality"), col("src_rank"))
      .orderBy("doc_id")
  }

  val t25Sql: String =
    s"""WITH q AS (
      |$t2Sql
      |), ranked AS (
      |  SELECT d.doc_id, d.source, q.quality,
      |    row_number() OVER (PARTITION BY d.source
      |      ORDER BY q.quality DESC, d.doc_id) AS src_rank
      |  FROM documents d JOIN q USING (doc_id)
      |)
      |SELECT doc_id, source, quality, src_rank
      |FROM ranked WHERE src_rank <= 15
      |ORDER BY doc_id""".stripMargin

  /** T26: CCNet-style PERPLEXITY FILTER — the quality gate web-scale
    * pipelines (CCNet, RefinedWeb, FineWeb) run between cleaning and
    * mixing: a language model trained on a TRUSTED reference corpus scores
    * every document's fluency, and the corpus is bucketed by perplexity
    * (head / middle / tail) for mixture weighting downstream. Where t10
    * scores each document under the corpus's OWN bigram model (self-
    * perplexity, a repetition signal), t26 is the cross-domain form: the
    * model is trained ONLY on the trusted slice (sources src0/src1 — the
    * "Wikipedia" of this corpus), per language (CCNet trains one LM per
    * language), with add-one smoothing so unseen n-grams of the open web
    * get a finite, vocabulary-scaled penalty:
    * P(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + |V_lang|).
    *
    * Buckets use PINNED thresholds on mean negative log-likelihood —
    * production CCNet calibrates tercile cutoffs once on a reference run
    * and applies them as constants, which is what keeps the scoring pass a
    * pure per-row decision (no global sort/ntile at scale).
    *
    * Scale shape: model relations (c2, c1) are keyed by (lang, gram) and
    * joined by shuffle equi-joins — the vocabulary is UNBOUNDED, the model
    * is never broadcast or collected (the d3/d4 lesson); only the per-lang
    * vocab-size relation (bounded by the language inventory, t15's
    * contract) broadcasts. One per-doc aggregation shuffle. Documents in a
    * language absent from the reference slice have no model and drop out
    * (production routes them to a default tail bucket at ingest).
    *
    * Determinism: each bigram's log-prob is an INTEGER micro-nat
    * (t10's grid), so per-doc sums are exact 64-bit arithmetic. */
  def t26_perplexity_filter(s: SparkSession, dir: String): DataFrame = {
    val refSrc = Seq("src0", "src1")
    // bigrams built ROW-LOCALLY (x27's transform construction — the
    // positional self-join spelling cost two extra corpus scans and a
    // (doc, pos) shuffle join for the same multiset); the context model c1
    // DERIVES from the bigram model c2 (c1(l,w1) = Σ_w2 c2 — a re-agg of
    // the already-reduced relation, never a second corpus pass). The scan
    // audit that forced this: 7 planned scans in the original spelling, 3
    // here (bigram stream, model slice, vocabulary grain).
    val docs = Tables.documents(s, dir)
    val bi = docs
      .select(col("doc_id"), col("lang"), col("source"), toks.as("tk"),
              size(toks).as("n"))
      .filter(col("n") >= 2)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(expr("transform(sequence(1, n - 1), " +
                     "i -> struct(tk[i-1] AS w1, tk[i] AS w2))")).as("bg"))
      .select(col("doc_id"), col("lang"), col("source"),
              col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c2 = bi.filter(col("source").isin(refSrc: _*))
      .groupBy(col("lang"), col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(col("lang"), col("w1")).agg(sum(col("c2")).as("c1"))
    val vocab = docs.filter(col("source").isin(refSrc: _*))
      .select(col("lang"), explode(toks).as("tok"))
      .groupBy(col("lang")).agg(countDistinct(col("tok")).as("vsz"))
    bi.join(c2, Seq("lang", "w1", "w2"), "left")
      .join(c1, Seq("lang", "w1"), "left")
      .join(broadcast(vocab), Seq("lang"))
      .withColumn("lp_micro",
        floor(log((coalesce(col("c2"), lit(0L)) + 1).cast("double") /
                  (coalesce(col("c1"), lit(0L)) + col("vsz"))) * 1000000.0 + 0.5)
          .cast("long"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_micro")).as("sum_lp"))
      .withColumn("avg_nll",
        round4(-col("sum_lp").cast("double") / 1000000.0 / col("n_bigrams")))
      .withColumn("ppl_bucket",
        when(col("avg_nll") < 3.46, "head")
          .when(col("avg_nll") < 3.53, "middle")
          .otherwise("tail"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"), col("avg_nll"),
              col("ppl_bucket"))
      .orderBy("doc_id")
  }

  val t26Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, lang, source, unnest(string_split(text, ' ')) AS tok,
      |         unnest(range(len(string_split(text, ' ')))) AS pos
      |  FROM documents
      |), bi AS (
      |  SELECT a.doc_id, a.lang, a.source, a.tok AS w1, b.tok AS w2
      |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      |), c2 AS (
      |  SELECT lang, w1, w2, count(*) AS c2 FROM bi
      |  WHERE source IN ('src0', 'src1') GROUP BY 1, 2, 3
      |), c1 AS (
      |  SELECT lang, w1, count(*) AS c1 FROM bi
      |  WHERE source IN ('src0', 'src1') GROUP BY 1, 2
      |), v AS (
      |  SELECT lang, count(DISTINCT tok) AS vsz FROM tok
      |  WHERE source IN ('src0', 'src1') GROUP BY 1
      |), scored AS (
      |  SELECT bi.doc_id, bi.lang,
      |    floor(ln((coalesce(c2.c2, 0) + 1)::DOUBLE / (coalesce(c1.c1, 0) + v.vsz))
      |          * 1000000.0 + 0.5)::BIGINT AS lp_micro
      |  FROM bi
      |  LEFT JOIN c2 ON c2.lang = bi.lang AND c2.w1 = bi.w1 AND c2.w2 = bi.w2
      |  LEFT JOIN c1 ON c1.lang = bi.lang AND c1.w1 = bi.w1
      |  JOIN v ON v.lang = bi.lang
      |), agg AS (
      |  SELECT doc_id, lang, count(*) AS n_bigrams,
      |    floor(-sum(lp_micro)::DOUBLE / 1000000.0 / count(*) * 10000.0 + 0.5)
      |      / 10000.0 AS avg_nll
      |  FROM scored GROUP BY 1, 2
      |)
      |SELECT doc_id, lang, n_bigrams, avg_nll,
      |  CASE WHEN avg_nll < 3.46 THEN 'head'
      |       WHEN avg_nll < 3.53 THEN 'middle'
      |       ELSE 'tail' END AS ppl_bucket
      |FROM agg ORDER BY doc_id""".stripMargin

  /** T27: BM25 RETRIEVAL over a pruned inverted index — the search-serving
    * query a RAG / retrieval pipeline runs against the corpus: a query log
    * (every 50th document issues its first two distinct tokens as a
    * "more-like-this" query) scored with Okapi BM25 (k1 = 1.2, b = 0.75,
    * Lucene's always-positive `ln(1 + (N−df+0.5)/(df+0.5))` idf), top-10
    * answers per query.
    *
    * The scale decision is STATIC INDEX PRUNING (Carmel et al. 2001, the
    * WAND-family serving trade): each term's posting list is truncated to
    * its 64 highest-tf entries before scoring, so per-query candidate mass
    * is bounded by 64·|q| REGARDLESS of corpus size — document frequencies
    * stay exact (df is computed before pruning), only the scored shortlist
    * is truncated, and both engines prune identically so the oracle is
    * exact, not approximate. Without this, a common term's posting list is
    * O(corpus) and every query pays it.
    *
    * Dataflow: postings = t7's (term, doc) tf shuffle carrying the doc
    * length through the agg (no second dl join), shared via
    * [[bm25Postings]] (lazy by default, materialization knob — see its
    * scaladoc for the measured trade); the (N, Σdl) stats DERIVE from the
    * postings (per-doc max(dl) → one bounded agg) instead of a separate
    * text pass. Pruning and the per-query top-10 both lower to
    * `WindowGroupLimit` (bounded per-task heaps, t25's plan class); the
    * query-log⋈postings and df joins are term-keyed equi-joins — neither
    * side broadcast (vocabulary and query log are both unbounded); only
    * the 1-row stats relation broadcasts.
    *
    * Determinism: idf is pinned to the 6-dp grid before use; each (query,
    * doc, term) contribution becomes an integer micro-unit, so per-doc sums
    * are exact 64-bit arithmetic (t26's discipline). */
  /** The (term, doc_id, tf, dl) postings table shared by every consumer —
    * t27 itself, the x28 serving twin's offline index build, and s16's
    * lexical leg. Lazily re-planned per consumer by default (8 corpus
    * scans, 0 `ReusedExchange` in one t27 execution — but the optimizer
    * keeps full visibility: semi-join pushdown from s16, broadcast picks
    * from parquet stats), with `spark.graft.bm25Materialize=true`
    * switching to a per-(session, dir) `localCheckpoint` staging table
    * (s2Pairs' discipline, cleared by `Bench` per timed run) that cuts
    * the plan to 2 scans for scan-I/O-bound regimes — the measured trade
    * is in the knob comment below and STRESS_sf1.md. */
  def bm25Postings(s: SparkSession, dir: String,
                   materialize: Option[Boolean] = None): DataFrame = {
    def build = Tables.documents(s, dir)
      .select(col("doc_id"), size(toks).cast("long").as("dl"),
              explode(toks).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    // Deployment knob, default LAZY for batch — decided by measurement,
    // not the first intuition (STRESS_sf1.md round 6): materializing here
    // wins t27 alone marginally at sf1 (15.9 vs 16.6 s) but costs s16
    // 1.4× (61.7 vs 43.9 s) because the checkpoint boundary blinds
    // Catalyst — the fused form lets the optimizer push s16's
    // embedded-queries semi-join and pick broadcast joins from parquet
    // stats. `true` buys the 2-scan form for scan-I/O-bound regimes, and
    // is FORCED by the x28 serving twin (an endpoint holds its index
    // across triggers; re-planning the build per micro-batch is never the
    // serving shape). The real 100 TB answer is neither per-job form: a
    // production index PERSISTS its postings as a staging table
    // maintained incrementally (d13's band-signature discipline).
    val mat = materialize.getOrElse(
      s.conf.get("spark.graft.bm25Materialize", "false").toBoolean)
    if (!mat) build
    else cachedPerSession(postingsCache, s, dir)(build.localCheckpoint())
  }

  private val postingsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), () => DataFrame]()

  /** Drop the shared materialized postings (bench isolation). */
  def clearShared(): Unit = {
    postingsCache.clear()
    bm25BaseCache.clear()
    t14Cache.clear()
  }

  def t27_bm25(s: SparkSession, dir: String): DataFrame = {
    val tf = bm25Postings(s, dir)
    val dfRel = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = tf.groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    bm25TopK(Tables.documents(s, dir), bm25Prune(tf), dfRel, stats)
  }

  /** Per-term static pruning to the 64 highest-tf entries (ties to the
    * lower doc_id) — t27's serving trade, factored so the incremental
    * index (t30) reprunes per SIDE with the identical total order. */
  private def bm25Prune(tf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wp = Window.partitionBy(col("term")).orderBy(col("tf").desc, col("doc_id"))
    tf.withColumn("pr", row_number().over(wp)).filter(col("pr") <= 64)
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
  }

  /** The BM25 scoring pipeline over an arbitrary (pruned postings, df,
    * stats) index — shared verbatim by [[t27_bm25]] (one-shot build) and
    * [[t30_bm25_incremental]] (merged settled + delta index), so serving
    * semantics cannot drift between the index-maintenance strategies. */
  private def bm25TopK(docs: DataFrame, pruned: DataFrame, dfRel: DataFrame,
                       stats: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val K = 10
    val qs = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("query_id"),
              explode(array_distinct(slice(toks, 1, 2))).as("term"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf6 = round6(log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
    val contrib = idf6 * (col("tf") * 2.2) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / avgdl)))
    val wq = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id"))
    qs.join(pruned, Seq("term"))
      .filter(col("doc_id") =!= col("query_id"))
      .join(dfRel, Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("c_micro", floor(contrib * 1000000.0 + 0.5).cast("long"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_hit"), sum(col("c_micro")).as("sum_c"))
      .withColumn("score", round4(col("sum_c").cast("double") / 1000000.0))
      .withColumn("rk", row_number().over(wq).cast("long"))
      .filter(col("rk") <= K)
      .select(col("query_id"), col("doc_id"), col("n_hit"), col("score"), col("rk"))
      .orderBy("query_id", "rk")
  }

  val t27Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS dl,
      |         unnest(string_split(text, ' ')) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT term, doc_id, count(*)::BIGINT AS tf, max(dl) AS dl
      |  FROM tok GROUP BY 1, 2
      |), df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
      |st AS (
      |  SELECT count(*)::BIGINT AS n_docs,
      |         sum(len(string_split(text, ' ')))::BIGINT AS sum_dl
      |  FROM documents
      |), pruned AS (
      |  SELECT term, doc_id, tf, dl FROM (
      |    SELECT term, doc_id, tf, dl,
      |      row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS pr
      |    FROM tf) WHERE pr <= 64
      |), qs AS (
      |  SELECT doc_id AS query_id,
      |         unnest(list_distinct(string_split(text, ' ')[1:2])) AS term
      |  FROM documents WHERE doc_id % 50 = 0
      |), cand AS (
      |  SELECT q.query_id, p.doc_id,
      |    floor((floor(ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
      |                 * 1000000.0 + 0.5) / 1000000.0
      |           * (p.tf * 2.2))
      |          / (p.tf + 1.2 * (0.25 + 0.75 * (p.dl / (st.sum_dl::DOUBLE / st.n_docs))))
      |          * 1000000.0 + 0.5)::BIGINT AS c_micro
      |  FROM qs q JOIN pruned p USING (term) JOIN df USING (term), st
      |  WHERE p.doc_id <> q.query_id
      |), agg AS (
      |  SELECT query_id, doc_id, count(*)::BIGINT AS n_hit,
      |    floor(sum(c_micro)::DOUBLE / 1000000.0 * 10000.0 + 0.5) / 10000.0 AS score
      |  FROM cand GROUP BY 1, 2
      |), r AS (
      |  SELECT query_id, doc_id, n_hit, score,
      |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rk
      |  FROM agg)
      |SELECT query_id, doc_id, n_hit, score, rk
      |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  /** T30: INCREMENTAL POSTINGS MAINTENANCE — the real 100 TB shape t27's
    * scaladoc declares: a production search index never rebuilds its
    * postings per job; it PERSISTS them and folds each crawl increment in
    * (d12/d13's settled-vs-delta discipline, applied to the inverted
    * index). The settled corpus (doc_id % 10 ≠ 0) keeps three staging
    * relations warm — its per-term PRUNED postings, full document
    * frequencies, and the (N, Σdl) stats row. Each arriving delta
    * (doc_id % 10 = 0) folds in with work bounded by the DELTA:
    *
    *  - delta postings build + per-side prune: O(|delta| tokens);
    *  - merge-prune ONLY the terms the delta touches (left-semi split:
    *    settled lists for untouched terms pass through UNREBUILT — the
    *    "settled postings never rebuilt" contract as a plan property);
    *  - df/stats fold as outer-join sums of the two partial aggregates
    *    (exact: the doc sets are disjoint).
    *
    * Serving then runs [[bm25TopK]] against the merged index. The merge is
    * PROVABLY LOSSLESS, which is why this query shares t27's oracle: a
    * posting in the merged top-64 of a term ranks at least as high within
    * its own side (side rank ≤ merged rank under the same (tf desc,
    * doc_id) total order), so per-side pruning before the merge-prune
    * drops nothing the full rebuild would keep, and summed partial df/N/Σdl
    * over disjoint doc sets equal the full-corpus aggregates — the merged
    * index is bit-identical to t27's one-shot build, and the result rows
    * hash-match t27's. Warm-staging increment cost measured at sf1 in
    * STRESS_sf1.md (d13's 25%-of-cold discipline). */
  def t30_bm25_incremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val (basePruned, baseDf, baseStats) = bm25SettledIndex(s, dir)
    // per-increment work, all bounded by the delta
    val deltaTf = bm25TfOf(docs.filter(col("doc_id") % 10 === 0))
      .localCheckpoint() // consumed by prune, df, stats
    val deltaPruned = bm25Prune(deltaTf)
    val touched = deltaPruned.select(col("term")).distinct()
    val mergedPruned = bm25Prune(
        basePruned.join(touched, Seq("term"), "left_semi")
          .unionByName(deltaPruned))
      .unionByName(basePruned.join(touched, Seq("term"), "left_anti"))
    val dfRel = baseDf.withColumnRenamed("df", "df_b")
      .join(bm25DfOf(deltaTf).withColumnRenamed("df", "df_d"), Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df_b"), lit(0L)) + coalesce(col("df_d"), lit(0L))).as("df"))
    val stats = baseStats.select(col("n_docs").as("nb"), col("sum_dl").as("sb"))
      .crossJoin(bm25StatsOf(deltaTf).select(col("n_docs").as("nd"), col("sum_dl").as("sd")))
      .select((col("nb") + col("nd")).as("n_docs"), (col("sb") + col("sd")).as("sum_dl"))
    bm25TopK(docs, mergedPruned, dfRel, stats)
  }

  /** t30's index-build pieces, factored to object scope (r15): the c20
    * release composite reuses [[bm25TfOf]] for its postings-family rollup
    * and the settled-universe consistency pin reads [[bm25SettledIndex]]'s
    * stats row directly — one tokenization/aggregation body for the
    * standalone increment, the composite, and the spec. */
  private[graft] def bm25TfOf(d: DataFrame): DataFrame = d
    .select(col("doc_id"), size(toks).cast("long").as("dl"),
            explode(toks).as("term"))
    .groupBy(col("term"), col("doc_id"))
    .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
  private def bm25DfOf(tf: DataFrame): DataFrame =
    tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
  private def bm25StatsOf(tf: DataFrame): DataFrame =
    tf.groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))

  /** The settled BM25 index staging tables a production ingest keeps warm
    * between increments — (pruned postings, df, stats), staged per
    * session (cachedPerSession plays the persisted-table role; Bench
    * clears it per timed run — the warm form is the KEEP_SHARED study). */
  private[graft] def bm25SettledIndex(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) =
    cachedPerSession(bm25BaseCache, s, dir) {
      val baseTf = bm25TfOf(
          Tables.documents(s, dir).filter(col("doc_id") % 10 =!= 0))
        .localCheckpoint() // pruned postings + df + stats all fold off it
      (bm25Prune(baseTf).localCheckpoint(),
       bm25DfOf(baseTf).localCheckpoint(),
       bm25StatsOf(baseTf).localCheckpoint())
    }

  private val bm25BaseCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      () => (DataFrame, DataFrame, DataFrame)]()

  /** T28: DSIR IMPORTANCE WEIGHTS (Data Selection via Importance
    * Resampling, Xie et al. 2023) — the targeted-selection pass that picks
    * raw-web documents LOOKING LIKE a trusted target domain: every document
    * gets log w(x) = Σ_features c_x[f]·(ln p_target[f] − ln p_raw[f]),
    * where both distributions are bag-of-HASHED-n-gram models (unigrams +
    * bigrams hashed into 256 buckets), the target model is estimated from
    * the trusted slice (src0/src1, t26's contract) and the raw model from
    * the full corpus, each with add-one smoothing over the bucket space.
    * `keep = logw > 0` is the more-target-like-than-raw decision the
    * resampling step thresholds.
    *
    * The published trick IS the scale story: hashing collapses the
    * unbounded vocabulary into a FIXED 256-bucket feature space, so —
    * unlike t26/t10, whose (lang, gram) models are unbounded relations
    * that must never broadcast — the DSIR model is structurally bounded
    * and broadcasts legitimately; scoring is one broadcast-joined
    * projection plus a single per-doc aggregation shuffle, at any corpus
    * size. Bigrams are built row-locally (x27's transform construction,
    * no positional self-join). Bucket key = first 2 hex chars of
    * md5(gram) — engine-portable, no numeric conversion.
    *
    * Determinism: each model log-prob is pinned to an integer micro-nat;
    * the per-bucket log-ratio is an exact 64-bit difference and per-doc
    * sums are exact (t26's grid discipline). */
  def t28_dsir_weights(s: SparkSession, dir: String): DataFrame = {
    val refSrc = Seq("src0", "src1")
    val tk = split(col("text"), " ")
    val grams = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"), tk.as("tk"),
              size(tk).as("n"))
      .select(col("doc_id"), col("lang"), col("source"),
        explode(concat(col("tk"),
          when(col("n") >= 2,
            expr("transform(sequence(1, n - 1), i -> concat(tk[i-1], ' ', tk[i]))"))
            .otherwise(typedlit(Seq.empty[String])))).as("gram"))
      .withColumn("bucket", substring(md5(col("gram").cast("binary")), 1, 2))
    // ONE corpus pass: (doc, bucket) counts feed BOTH halves — the model
    // (conditional re-aggregation of this already-reduced relation, never a
    // second gram scan) and the scoring (weight each doc-bucket count by
    // the bucket's log-ratio). Totals fold off the 256-row model itself.
    // The plan audit that forced this: the filter-per-slice spelling
    // planned 10 corpus scans with zero exchange reuse.
    val docBuckets = grams
      .groupBy(col("doc_id"), col("lang"), col("source"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val model = docBuckets.groupBy(col("bucket"))
      .agg(sum(col("c")).as("rc"),
           sum(when(col("source").isin(refSrc: _*), col("c")).otherwise(0L)).as("tc"))
    val tots = model.agg(sum(col("rc")).as("rt"), sum(col("tc")).as("tt"))
    val lpMicro = floor(log((col("tc") + 1).cast("double") /
                            (col("tt") + 256)) * 1000000.0 + 0.5).cast("long")
    val lqMicro = floor(log((col("rc") + 1).cast("double") /
                            (col("rt") + 256)) * 1000000.0 + 0.5).cast("long")
    val scored = model.crossJoin(broadcast(tots))
      .select(col("bucket"), (lpMicro - lqMicro).as("lr_micro"))
    docBuckets.join(broadcast(scored), Seq("bucket")) // bounded: 256 buckets
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c")).as("n_grams"),
           sum(col("c") * col("lr_micro")).as("sum_lr"))
      .withColumn("logw", round4(col("sum_lr").cast("double") / 1000000.0))
      .select(col("doc_id"), col("lang"), col("n_grams"), col("logw"),
              (col("logw") > 0.0).as("keep"))
      .orderBy("doc_id")
  }

  val t28Sql: String =
    """WITH sp AS (
      |  SELECT doc_id, lang, source, string_split(text, ' ') AS sp FROM documents
      |), g AS (
      |  SELECT doc_id, lang, source, unnest(
      |    list_concat(sp, list_transform(range(2, len(sp) + 1),
      |                                   i -> sp[i-1] || ' ' || sp[i]))) AS gram
      |  FROM sp
      |), b AS (
      |  SELECT doc_id, lang, source, substr(md5(gram), 1, 2) AS bucket FROM g
      |), tgt AS (
      |  SELECT bucket, count(*)::BIGINT AS tc FROM b
      |  WHERE source IN ('src0', 'src1') GROUP BY 1
      |), raw AS (SELECT bucket, count(*)::BIGINT AS rc FROM b GROUP BY 1),
      |tt AS (SELECT count(*)::BIGINT AS tt FROM b WHERE source IN ('src0', 'src1')),
      |rt AS (SELECT count(*)::BIGINT AS rt FROM b),
      |model AS (
      |  SELECT raw.bucket,
      |    floor(ln((coalesce(tgt.tc, 0) + 1)::DOUBLE / (tt.tt + 256))
      |          * 1000000.0 + 0.5)::BIGINT
      |    - floor(ln((raw.rc + 1)::DOUBLE / (rt.rt + 256))
      |            * 1000000.0 + 0.5)::BIGINT AS lr_micro
      |  FROM raw LEFT JOIN tgt USING (bucket), tt, rt
      |), agg AS (
      |  SELECT b.doc_id, b.lang, count(*)::BIGINT AS n_grams,
      |    floor(sum(m.lr_micro)::DOUBLE / 1000000.0 * 10000.0 + 0.5) / 10000.0 AS logw
      |  FROM b JOIN model m USING (bucket)
      |  GROUP BY 1, 2
      |)
      |SELECT doc_id, lang, n_grams, logw, logw > 0.0 AS keep
      |FROM agg ORDER BY doc_id""".stripMargin

  /** T29: DISTRIBUTION-DRIFT AUDIT — the data-drift monitor a production
    * ingest runs on every increment: per language, the KL divergence of
    * the ARRIVING delta's hashed-ngram distribution against the SETTLED
    * corpus's (d12's `doc_id % 10` increment convention; t28's 256-bucket
    * hashed unigram+bigram feature space), with add-one smoothing over the
    * full canonical bucket space so unseen features are penalized, not
    * undefined. KL(delta ‖ settled) spikes when a crawl source changes
    * language mix, template, or spam profile — the alarm that gates d12's
    * incremental admission before a bad batch pollutes the corpus.
    *
    * Scale shape: two (lang, bucket) aggregations over the gram stream —
    * the model space is structurally bounded (256 buckets × the bounded
    * language inventory, t15's contract), so the per-bucket joins against
    * the generated canonical space broadcast legitimately (t28's story);
    * one bounded per-language aggregation finishes.
    *
    * Determinism: the micro-nat trick is applied to the SCALED divergence:
    * KL·(Δ+256) = Σ_b (dc_b + 1)·(ln q_b − ln p_b), so every addend is an
    * exact 64-bit product of a count and a pinned micro-nat log — the sum
    * is order-independent, and the one division happens after. */
  def t29_drift_audit(s: SparkSession, dir: String): DataFrame = {
    val tk = split(col("text"), " ")
    val grams = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), tk.as("tk"), size(tk).as("n"))
      .select(col("doc_id"), col("lang"),
        explode(concat(col("tk"),
          when(col("n") >= 2,
            expr("transform(sequence(1, n - 1), i -> concat(tk[i-1], ' ', tk[i]))"))
            .otherwise(typedlit(Seq.empty[String])))).as("gram"))
      .select(col("lang"), (col("doc_id") % 10 === 0).as("is_delta"),
              substring(md5(col("gram").cast("binary")), 1, 2).as("bucket"))
    // ONE corpus pass: per-(lang, bucket) settled and delta counts as
    // conditional sums of the same gram stream (t28's restructure — the
    // filter-per-slice spelling planned 10 corpus scans); totals and the
    // language inventory fold off the bounded (lang × 256) model relation
    val perLB = grams.groupBy(col("lang"), col("bucket"))
      .agg(sum(when(col("is_delta"), 1L).otherwise(0L)).as("dc"),
           sum(when(!col("is_delta"), 1L).otherwise(0L)).as("sc"))
    val tots = perLB.groupBy(col("lang"))
      .agg(sum(col("dc")).as("dt"), sum(col("sc")).as("st"))
      .filter(col("dt") >= 1 && col("st") >= 1) // both slices present (t29's inner-join contract)
    val space = tots.select(col("lang"))
      .crossJoin(broadcast(
        s.range(256).select(format_string("%02x", col("id")).as("bucket"))))
    val lqMicro = floor(log((coalesce(col("dc"), lit(0L)) + 1).cast("double") /
                            (col("dt") + 256)) * 1000000.0 + 0.5).cast("long")
    val lpMicro = floor(log((coalesce(col("sc"), lit(0L)) + 1).cast("double") /
                            (col("st") + 256)) * 1000000.0 + 0.5).cast("long")
    space
      .join(broadcast(perLB), Seq("lang", "bucket"), "left")
      .join(broadcast(tots), Seq("lang"))
      .withColumn("contrib",
        (coalesce(col("dc"), lit(0L)) + 1) * (lqMicro - lpMicro))
      .groupBy(col("lang"))
      .agg(max(col("dt")).as("delta_grams"), sum(col("contrib")).as("kl_scaled"))
      .withColumn("kl", round4(col("kl_scaled").cast("double") / 1000000.0 /
                               (col("delta_grams") + 256)))
      .select(col("lang"), col("delta_grams"), col("kl"),
              (col("kl") > 0.05).as("drifted"))
      .orderBy("lang")
  }

  val t29Sql: String =
    """WITH sp AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS sp FROM documents
      |), g AS (
      |  SELECT lang, doc_id % 10 = 0 AS is_delta,
      |    substr(md5(unnest(
      |      list_concat(sp, list_transform(range(2, len(sp) + 1),
      |                                     i -> sp[i-1] || ' ' || sp[i])))), 1, 2)
      |      AS bucket
      |  FROM sp
      |), sc AS (
      |  SELECT lang, bucket, count(*)::BIGINT AS sc FROM g
      |  WHERE NOT is_delta GROUP BY 1, 2
      |), dc AS (
      |  SELECT lang, bucket, count(*)::BIGINT AS dc FROM g
      |  WHERE is_delta GROUP BY 1, 2
      |), stot AS (SELECT lang, count(*)::BIGINT AS st FROM g WHERE NOT is_delta GROUP BY 1),
      |dtot AS (SELECT lang, count(*)::BIGINT AS dt FROM g WHERE is_delta GROUP BY 1),
      |space AS (
      |  SELECT DISTINCT g.lang, b.bucket
      |  FROM g, (SELECT printf('%02x', i) AS bucket FROM range(256) t(i)) b
      |), m AS (
      |  SELECT s.lang, s.bucket,
      |    (coalesce(dc.dc, 0) + 1)
      |    * (floor(ln((coalesce(dc.dc, 0) + 1)::DOUBLE / (dtot.dt + 256))
      |             * 1000000.0 + 0.5)::BIGINT
      |       - floor(ln((coalesce(sc.sc, 0) + 1)::DOUBLE / (stot.st + 256))
      |               * 1000000.0 + 0.5)::BIGINT) AS contrib,
      |    dtot.dt
      |  FROM space s
      |  LEFT JOIN sc ON sc.lang = s.lang AND sc.bucket = s.bucket
      |  LEFT JOIN dc ON dc.lang = s.lang AND dc.bucket = s.bucket
      |  JOIN stot ON stot.lang = s.lang
      |  JOIN dtot ON dtot.lang = s.lang
      |), agg AS (
      |  SELECT lang, max(dt) AS delta_grams,
      |    floor(sum(contrib)::DOUBLE / 1000000.0 / (max(dt) + 256)
      |          * 10000.0 + 0.5) / 10000.0 AS kl
      |  FROM m GROUP BY 1)
      |SELECT lang, delta_grams, kl, kl > 0.05 AS drifted
      |FROM agg ORDER BY lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t29_drift_audit" -> (t29_drift_audit _),
    "t28_dsir_weights" -> (t28_dsir_weights _),
    "t27_bm25" -> (t27_bm25 _),
    "t30_bm25_incremental" -> (t30_bm25_incremental _),
    "t26_perplexity_filter" -> (t26_perplexity_filter _),
    "t25_source_quota" -> (t25_source_quota _),
    "t24_chunk_dedup" -> (t24_chunk_dedup _),
    "t23_doc_chunking" -> (t23_doc_chunking _),
    "t20_bpe_encode" -> (t20_bpe_encode _),
    "t31_bpe_roundtrip" -> (t31_bpe_roundtrip _),
    "t19_sequence_packing" -> (t19_sequence_packing _),
    "t18_bpe_merges" -> (t18_bpe_merges _),
    "t17_heavy_hitters" -> (t17_heavy_hitters _),
    "t22_quality_classifier" -> (t22_quality_classifier _),
    "t21_regex_redact" -> (t21_regex_redact _),
    "t16_blocklist_scrub" -> (t16_blocklist_scrub _),
    "t15_mixture_weights" -> (t15_mixture_weights _),
    "t14_contamination" -> (t14_contamination _),
    "t13_quota_sample" -> (t13_quota_sample _),
    "t12_repetition"   -> (t12_repetition _),
    "t11_novelty"      -> (t11_novelty _),
    "t10_bigram_lm"    -> (t10_bigram_lm _),
    "t9_len_quantiles" -> (t9_len_quantiles _),
    "t7_tfidf"         -> (t7_tfidf _),
    "t8_doc_sample"    -> (t8_doc_sample _),
    "t6_quality_deciles" -> (t6_quality_deciles _),
    "t1_token_stats"   -> (t1_token_stats _),
    "t2_quality_score" -> (t2_quality_score _),
    "t3_lang_id"       -> (t3_lang_id _),
    "t4_fingerprint"   -> (t4_fingerprint _),
    "t5_uwr_native"    -> (t5_uwr_native _))

  val oracles: Map[String, String] = Map(
    "t29_drift_audit" -> t29Sql,
    "t28_dsir_weights" -> t28Sql,
    "t27_bm25" -> t27Sql,
    "t30_bm25_incremental" -> t27Sql, // merged index == one-shot rebuild (lossless merge)
    "t26_perplexity_filter" -> t26Sql,
    "t25_source_quota" -> t25Sql,
    "t24_chunk_dedup" -> t24Sql,
    "t23_doc_chunking" -> t23Sql,
    "t20_bpe_encode" -> t20Sql,
    "t31_bpe_roundtrip" -> t31Sql,
    "t19_sequence_packing" -> t19Sql,
    "t18_bpe_merges" -> t18Sql,
    "t17_heavy_hitters" -> t17Sql,
    "t22_quality_classifier" -> t22Sql,
    "t21_regex_redact" -> t21Sql,
    "t16_blocklist_scrub" -> t16Sql,
    "t15_mixture_weights" -> t15Sql,
    "t14_contamination" -> t14Sql,
    "t9_len_quantiles" -> t9Sql,
    "t13_quota_sample" -> t13Sql,
    "t12_repetition"   -> t12Sql,
    "t11_novelty"      -> t11Sql,
    "t10_bigram_lm"    -> t10Sql,
    "t7_tfidf"         -> t7Sql,
    "t8_doc_sample"    -> t8Sql,
    "t6_quality_deciles" -> t6Sql,
    "t1_token_stats"   -> t1Sql,
    "t2_quality_score" -> t2Sql,
    "t3_lang_id"       -> t3Sql,
    "t4_fingerprint"   -> t4Sql,
    "t5_uwr_native"    -> t5Sql)
}
