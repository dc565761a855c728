package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import QUtil._

/** Deduplication operators for training-data curation over `documents`:
  * exact, n-gram Jaccard, MinHash+LSH, and SimHash near-dup detection.
  *
  * Scale design (the 100 TB story, in order of appearance):
  *  - exact dedup = one hash shuffle on the normalized key; no driver state.
  *  - n-gram Jaccard = shingle explode (narrow) → self-join on shingle. The
  *    self-join is the quadratic step; it is ONLY run on the candidate set in
  *    the LSH variant below — d2 is the exact oracle at verifiable scale.
  *  - MinHash+LSH = shingle→minhash signature (one agg), band → bucket join
  *    (equi-join on band key, linear in bucket sizes), exact-Jaccard verify
  *    restricted to candidates. This is the canonical near-dup pipeline shape
  *    (shingle → minhash → band → bucket-join → verify).
  *  - SimHash = per-token signed bit votes → 16-bit fingerprint; candidate
  *    pairs via pigeonhole banding (dist ≤ 3 ⇒ one of 4 nibbles equal), so
  *    the pair join is an equi-join, never a cross join.
  *
  * Cross-engine determinism: hash permutations are explicit
  * (a·id + b) mod p over a dense shingle/token dictionary — exact 64-bit
  * integer arithmetic in both engines, with operands reduced mod p between
  * multiplications so no intermediate can wrap. The dictionary itself is the
  * DISTRIBUTED dense-id assignment of `QUtil.denseIds` (rank within hash
  * bucket + prefix-summed bucket offsets), and the fact→dictionary id join is
  * a plain shuffle equi-join on the shingle/token — neither the rank nor the
  * join ever holds the unbounded vocabulary on one node or broadcasts it, so
  * the pipeline survives a 100 TB vocabulary. At production scale the
  * dictionary can still be swapped for xxhash64(shingle) (no rank, no join at
  * all), which changes no plan shape downstream.
  */
object Dedup {

  private val P = 2147483647L // 2^31 - 1, Mersenne prime
  private[graft] val lshA = Seq(1299721L, 7919L, 104729L, 15485863L, 32452843L, 49979687L, 67867967L, 86028121L)
  private[graft] val lshB = Seq(104659L, 1299709L, 512927377L, 15487469L, 86028157L, 982451653L, 472882027L, 533000389L)

  /** SQL literal `(VALUES ...)` table of the hash params, j = 0..7. */
  private def paramsSql: String =
    lshA.zip(lshB).zipWithIndex
      .map { case ((a, b), j) => s"($j, $a, $b)" }
      .mkString("(VALUES ", ", ", ") AS p(j, a, b)")

  private def paramsDf(s: SparkSession): DataFrame = {
    import s.implicits._
    lshA.zip(lshB).zipWithIndex.map { case ((a, b), j) => (j.toLong, a, b) }
      .toDF("j", "a", "b")
  }

  /** D1 exact dedup: normalized-key grouping, canonical = min doc_id per
    * group. One shuffle on the key; `min over (partition by key)` keeps every
    * row (audit-friendly) rather than collapsing. */
  def d1_exact_dedup(s: SparkSession, dir: String): DataFrame = {
    val key = substring(col("text"), 1, 64)
    val w = Window.partitionBy(col("key"))
    Tables.documents(s, dir)
      .select(col("doc_id"), key.as("key"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .select(col("doc_id"), col("canonical_id"),
              (col("doc_id") =!= col("canonical_id")).as("is_dup"), col("group_size"))
      .orderBy("doc_id")
  }

  val d1Sql: String =
    """SELECT doc_id,
      |  min(doc_id) OVER w AS canonical_id,
      |  doc_id <> min(doc_id) OVER w AS is_dup,
      |  count(*) OVER w AS group_size
      |FROM documents
      |WINDOW w AS (PARTITION BY substring(text, 1, 64))
      |ORDER BY doc_id""".stripMargin

  /** Distinct word-3-gram shingles per doc, built with `lead` over token
    * position — the same formulation both engines execute identically.
    * MATERIALIZED (`localCheckpoint`): the shingle table is referenced up to
    * 5 times downstream (dict, ids, sizes, both join sides) and DataFrames
    * do not share subplans — without this the whole scan+explode+window
    * pipeline re-executes per reference (measured: 73 exchanges → 8 in d3).
    * At cluster scale this is `persist(MEMORY_AND_DISK)` or a staged write. */
  private[queries] def shingles(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("doc_id"),
              concat_ws(" ", col("tok"), lead(col("tok"), 1).over(w),
                        lead(col("tok"), 2).over(w)).as("sh"),
              lead(col("tok"), 2).over(w).isNotNull.as("has3"))
      .filter(col("has3"))
      .select(col("doc_id"), col("sh"))
      .distinct()
      .localCheckpoint()
  }

  private[queries] val shinglesSqlCte: String =
    """tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
      |         unnest(range(len(string_split(text, ' ')))) AS pos
      |  FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, sh FROM (
      |    SELECT doc_id,
      |      tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS sh,
      |      lead(tok, 2) OVER w IS NOT NULL AS has3
      |    FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
      |  WHERE has3
      |)""".stripMargin

  /** Jaccard for a pair table with `inter` + per-doc sizes joined in. */
  private def jaccard(inter: Column, na: Column, nb: Column): Column =
    round4(inter.cast("double") / (na + nb - inter))

  /** D2 n-gram Jaccard dedup (exact): pairs sharing ≥1 shingle, Jaccard on
    * distinct-shingle sets, threshold 0.5. The all-pairs self-join is the
    * exact baseline that d3's LSH approximates. */
  def d2_ngram_jaccard(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("doc_id").as("doc_a"), col("sh"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh"))
    a.join(b, Seq("sh")).filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
      .withColumn("jaccard", jaccard(col("inter"), col("na"), col("nb")))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  val d2Sql: String =
    s"""WITH $shinglesSqlCte, sizes AS (
      |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
      |), pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b, inter,
      |  floor(inter::DOUBLE / (sa.n_sh + sb.n_sh - inter) * 10000.0 + 0.5) / 10000.0 AS jaccard
      |FROM pairs
      |JOIN sizes sa ON sa.doc_id = doc_a
      |JOIN sizes sb ON sb.doc_id = doc_b
      |WHERE floor(inter::DOUBLE / (sa.n_sh + sb.n_sh - inter) * 10000.0 + 0.5) / 10000.0 >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  /** D3 MinHash + LSH: 8 hash permutations over a dense shingle dictionary,
    * signature banded 4×2, candidates = pairs sharing a band bucket, verified
    * with exact Jaccard (computed only for candidates). */
  def d3_minhash_lsh(s: SparkSession, dir: String): DataFrame =
    d3Pairs(s, dir).orderBy("doc_a", "doc_b")

  /** d3's verified pair table, MATERIALIZED once per (session, sf-dir) and
    * shared by `d3_minhash_lsh` and the `d8_dup_clusters` clustering step —
    * the same staging-table discipline as `Similarity.s2Pairs` (the
    * signature computation is the expensive step; consumers must not re-run
    * it). `Bench.clearShared` drops the cache before each timed run. */
  def d3Pairs(s: SparkSession, dir: String): DataFrame =
    QUtil.cachedPerSession(d3Cache, s, dir)(
      d3PairsUncached(s, dir).localCheckpoint())

  private val d3Cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), () => DataFrame]()
  private val bandsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), () => DataFrame]()

  /** Drop all shared materialized intermediates (bench isolation). */
  def clearShared(): Unit = { d3Cache.clear(); bandsCache.clear(); d8Cache.clear() }

  /** (doc_id, band, mh0, mh1) MinHash band signatures for every document —
    * the LSH index relation d3 self-joins and d13 keys its settled staging
    * table by. Cached per (session, sf-dir) like [[d3Pairs]]/`s2Pairs`:
    * this IS the staging table a production ingest keeps warm between
    * increments (d13's scaladoc), so consumers must not re-run the
    * signature computation within a session; `Bench.clearShared` drops it
    * before each timed run so benchmark numbers stay cold-cost. */
  private def bandSigs(s: SparkSession, dir: String): DataFrame =
    QUtil.cachedPerSession(bandsCache, s, dir)(bandSigsUncached(s, dir))

  private def bandSigsUncached(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    // bucketed distributed dense ids — no single-partition global sort
    // shuffle equi-join on sh: the dictionary is one row per distinct shingle
    // — unbounded with the corpus, so it must never be broadcast
    val dict = denseIds(sh.select(col("sh")).distinct(), "sh", "sh_id")
    val ids = sh.join(dict, Seq("sh")).select(col("doc_id"), col("sh_id"))
    // sh_id reduced mod P before the multiply: a < 2^27, so the product
    // stays < 2^58 — no silent 64-bit wrap at any dictionary size
    val mh = ids.join(broadcast(paramsDf(s)))
      .groupBy(col("doc_id"), col("j"))
      .agg(min((col("a") * (col("sh_id") % P) + col("b")) % P).as("mh"))
    mh.withColumn("band", (col("j") / 2).cast("long"))
      .groupBy(col("doc_id"), col("band"))
      .agg(max(when(col("j") % 2 === 0, col("mh"))).as("mh0"),
           max(when(col("j") % 2 === 1, col("mh"))).as("mh1"))
      .localCheckpoint() // self-joined/split below: never recompute minhash
  }

  private def d3PairsUncached(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    val bands = bandSigs(s, dir)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.mh0") === col("y.mh0") &&
        col("x.mh1") === col("y.mh1") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("doc_id").as("doc_a"), col("sh"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh"))
    val inter = cand.join(a, Seq("doc_a")).join(b, Seq("doc_b", "sh"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    cand.join(inter, Seq("doc_a", "doc_b"), "left").na.fill(0L, Seq("inter"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
      .withColumn("jaccard", jaccard(col("inter"), col("na"), col("nb")))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** d3's pair relation without the presentation ORDER BY — reused verbatim
    * as a CTE body by the d8 clustering oracle. */
  /** The shingle → dict → minhash → band CTE chain shared by the d3 and
    * d13 oracles (the SQL twin of [[bandSigs]]). */
  private val bandsSqlCtes: String =
    s"""$shinglesSqlCte, dsrc AS (
      |  SELECT DISTINCT sh FROM sh
      |), dict AS (
      |  ${denseIdsSqlCte("dsrc", "sh", "sh_id")}
      |), mh AS (
      |  SELECT s.doc_id, p.j, min((p.a * (d.sh_id % ${P}) + p.b) % ${P}) AS mh
      |  FROM sh s JOIN dict d USING (sh) CROSS JOIN $paramsSql
      |  GROUP BY 1, 2
      |), bands AS (
      |  SELECT doc_id, j // 2 AS band,
      |    max(CASE WHEN j % 2 = 0 THEN mh END) AS mh0,
      |    max(CASE WHEN j % 2 = 1 THEN mh END) AS mh1
      |  FROM mh GROUP BY 1, 2
      |)""".stripMargin

  private[queries] val d3SqlBody: String =
    s"""WITH $bandsSqlCtes, cand AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM bands x JOIN bands y
      |    ON x.band = y.band AND x.mh0 = y.mh0 AND x.mh1 = y.mh1
      |   AND x.doc_id < y.doc_id
      |), sizes AS (
      |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
      |), inter AS (
      |  SELECT c.doc_a, c.doc_b, count(*) AS inter
      |  FROM cand c
      |  JOIN sh a ON a.doc_id = c.doc_a
      |  JOIN sh b ON b.doc_id = c.doc_b AND a.sh = b.sh
      |  GROUP BY 1, 2)
      |SELECT c.doc_a, c.doc_b,
      |  floor(coalesce(i.inter, 0)::DOUBLE / (sa.n_sh + sb.n_sh - coalesce(i.inter, 0))
      |        * 10000.0 + 0.5) / 10000.0 AS jaccard
      |FROM cand c
      |LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
      |JOIN sizes sa ON sa.doc_id = c.doc_a
      |JOIN sizes sb ON sb.doc_id = c.doc_b""".stripMargin

  val d3Sql: String = d3SqlBody + "\nORDER BY 1, 2"

  /** Per-bit hash params: quadratic (a·id + b)·id + (a+b) mod P, middle bit
    * (bit 15) extracted — a linear hash's low bit is parity-structured and
    * produces perfectly correlated fingerprint bits. */
  private def simhashParams(j: Int): (Long, Long) =
    (lshA(j % 8) + 13L * (j / 8), lshB(j % 8) + 7L * (j / 8))

  /** D4 SimHash: 32-bit fingerprints from signed per-token bit votes
    * (token weight = in-doc count), near-dups = hamming distance ≤ 2 found
    * via pigeonhole byte banding (dist ≤ 3 ⇒ one of 4 bytes equal — never a
    * cross join). */
  def d4_simhash(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // referenced by dict build AND the id join
    // bucketed distributed dense ids — no single-partition global sort; the
    // id join shuffles on tok (the vocabulary is unbounded: never broadcast)
    val dict = denseIds(toks.select(col("tok")).distinct(), "tok", "tok_id")
    val withId = toks.join(dict, Seq("tok"))
    val bits = (0 until 32).map { j =>
      val (a, b) = simhashParams(j)
      // operands reduced mod P between the two multiplications so every
      // intermediate stays < 2^62: Spark wraps 64-bit silently while DuckDB
      // raises, so an overflow is a cross-engine divergence, not just a bias
      val t = col("tok_id") % P
      val bit = shiftright((((lit(a) * t + lit(b)) % P) * t + lit(a + b)) % P, 15) % 2
      sum(when(bit === 1, col("cnt")).otherwise(-col("cnt")))
    }
    val fp = withId.groupBy(col("doc_id"))
      .agg(
        (0 until 32).map(j => when(bits(j) >= 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("fp"))
    val bnd = fp.select(col("doc_id"), col("fp"),
      explode(array((0 until 4).map(k =>
        struct(lit(k).as("k"), (shiftright(col("fp"), 8 * k) % 256).as("bv"))): _*)).as("nb"))
      .select(col("doc_id"), col("fp"), col("nb.k"), col("nb.bv"))
      .localCheckpoint() // self-joined below: avoid recomputing fingerprints twice
    bnd.as("x").join(bnd.as("y"),
        col("x.k") === col("y.k") && col("x.bv") === col("y.bv") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
              col("x.fp").as("fpa"), col("y.fp").as("fpb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(fpa ^ fpb)").cast("long"))
      .filter(col("hamming") <= 2)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  val d4Sql: String = {
    val bitSums = (0 until 32).map { j =>
      val (a, b) = simhashParams(j)
      s"CASE WHEN sum(CASE WHEN (((($a * (tok_id % ${P}) + $b) % ${P}) * (tok_id % ${P}) + ${a + b}) % ${P}) >> 15 & 1 = 1 THEN cnt ELSE -cnt END) >= 0 THEN ${1L << j} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      |), tc AS (
      |  SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY 1, 2
      |), dsrc AS (
      |  SELECT DISTINCT tok FROM tc
      |), dict AS (
      |  ${denseIdsSqlCte("dsrc", "tok", "tok_id")}
      |), fp AS (
      |  SELECT doc_id, ($bitSums)::BIGINT AS fp
      |  FROM tc JOIN dict USING (tok) GROUP BY doc_id
      |), bnd AS (
      |  SELECT doc_id, fp, k, (fp >> (8 * k)) % 256 AS bv
      |  FROM fp CROSS JOIN (SELECT unnest(range(4)) AS k)
      |), cand AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b, x.fp AS fpa, y.fp AS fpb
      |  FROM bnd x JOIN bnd y ON x.k = y.k AND x.bv = y.bv AND x.doc_id < y.doc_id)
      |SELECT doc_a, doc_b, bit_count(xor(fpa, fpb))::BIGINT AS hamming
      |FROM cand WHERE bit_count(xor(fpa, fpb)) <= 2
      |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** D5 embedding-cosine near-dup: documents flagged as near-duplicates
    * when their embedding vectors (doc_id ↔ vec_id) exceed the cosine
    * threshold — candidates from the SHARED materialized hyperplane-LSH pair
    * table (`Similarity.s2Pairs`): the expensive fingerprint projection runs
    * once per session/sf-dir and feeds both s2 and d5, not once per consumer.
    * Joined back to document metadata — the semantic-dedup complement to the
    * lexical d2-d4 family. */
  def d5_embedding_neardup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(
      col("doc_id"), col("source"))
    val pairs = Similarity.s2Pairs(s, dir)
      .select(col("va").as("doc_a"), col("vb").as("doc_b"), col("cosine"))
    // documents is unbounded — no broadcast hint; the verified-pairs side is
    // the small side (AQE picks the build side at runtime).
    pairs
      .join(docs.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("source", "source_a"), "doc_a")
      .join(docs.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("source", "source_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("cosine"),
              col("source_a"), col("source_b"))
      .orderBy("doc_a", "doc_b")
  }

  def d5Sql: String = {
    val inner = Similarity.s2Sql.replace("ORDER BY va, vb", "")
    s"""WITH pairs AS ($inner)
      |SELECT va AS doc_a, vb AS doc_b, cosine,
      |       da.source AS source_a, db.source AS source_b
      |FROM pairs
      |JOIN documents da ON da.doc_id = va
      |JOIN documents db ON db.doc_id = vb
      |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** D6 content-defined chunking dedup: the blob-level dedup technique —
    * chunk boundaries where a w=4 rolling hash of the character window hits
    * `h % 64 == 0`, so boundaries survive insertions/deletions (unlike
    * fixed-size blocks), then chunk-content hashes deduplicated across the
    * corpus. Output: every chunk appearing more than once (hash, length,
    * distinct docs, occurrences).
    *
    * Relational formulation (the oracle-verifiable twin): one row per
    * character via `sequence`/`unnest`, the rolling hash from three `lag`s
    * over a per-doc window (one shuffle on doc_id), boundary prefix-sums as
    * chunk ids, `collect_list` reassembly, md5. Per-character rows are the
    * honest cost of CDC — the production path at 100 TB is the same logic
    * fused into a native expression or `mapPartitions` over raw bytes, which
    * changes no downstream plan. ASCII-only guard documented: `ascii()` is
    * only engine-portable on ASCII (the corpus is; non-ASCII docs are
    * filtered, not silently mis-hashed). */
  def d6_cdc_chunks(s: SparkSession, dir: String): DataFrame = {
    // boundary detection is the native one-pass `cdc_split` expression
    // (graft.functions.CdcSplit): the relational spelling explodes one row
    // per CHARACTER through two ordered windows — ~500× row amplification
    // that dominates at scale — while the fused walk emits chunk substrings
    // directly inside codegen. Same boundary rule as the oracle; hashing
    // and dedup grouping stay relational. (Measured at sf0.1: 4.9 s → 0.6 s.)
    graft.functions.CdcSplit.register(s)
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .filter(col("text").rlike("^[\\x01-\\x7f]*$"))
    val chunks = docs
      .select(col("doc_id"), explode(expr("cdc_split(text)")).as("chunk"))
      .select(col("doc_id"), md5(col("chunk").cast("binary")).as("chunk_hash"),
              length(col("chunk")).cast("long").as("chunk_len"))
    chunks.groupBy(col("chunk_hash"))
      .agg(min(col("chunk_len")).as("chunk_len"),
           countDistinct(col("doc_id")).as("n_docs"),
           count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
      .orderBy("chunk_hash")
  }

  val d6Sql: String =
    """WITH c AS (
      |  SELECT doc_id, u.i AS i,
      |         substr(text, u.i::INT, 1) AS ch,
      |         ascii(substr(text, u.i::INT, 1)) AS code
      |  FROM documents, unnest(range(1, length(text) + 1)) AS u(i)
      |  WHERE regexp_matches(text, '^[\x01-\x7f]*$')
      |), rolled AS (
      |  SELECT *, lag(code, 3) OVER w * 29791 + lag(code, 2) OVER w * 961
      |            + lag(code, 1) OVER w * 31 + code AS h
      |  FROM c WINDOW w AS (PARTITION BY doc_id ORDER BY i)
      |), brk AS (
      |  SELECT *, CASE WHEN i = 1 OR (i >= 4 AND h % 64 = 0) THEN 1 ELSE 0 END AS b
      |  FROM rolled
      |), cids AS (
      |  SELECT *, sum(b) OVER (PARTITION BY doc_id ORDER BY i
      |                         ROWS UNBOUNDED PRECEDING) AS chunk_id
      |  FROM brk
      |), chunks AS (
      |  SELECT doc_id, chunk_id,
      |         md5(string_agg(ch, '' ORDER BY i)) AS chunk_hash,
      |         count(*) AS chunk_len
      |  FROM cids GROUP BY 1, 2)
      |SELECT chunk_hash, min(chunk_len)::BIGINT AS chunk_len,
      |       count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
      |FROM chunks GROUP BY 1 HAVING count(*) >= 2
      |ORDER BY chunk_hash""".stripMargin

  /** D8 duplicate-cluster assembly: pairwise near-dup detection (d3) only
    * yields EDGES; to keep one representative per duplicate group a pipeline
    * needs the connected components of that pair graph. Components are
    * computed by min-label propagation: every node starts labeled with
    * itself, each round takes the min of its own and its neighbors' labels
    * (one shuffle join + one aggregation per round), until a fixpoint. Dup
    * clusters have tiny diameter (near-dup similarity is near-transitive),
    * so rounds ≈ 2-3; for adversarial long-chain graphs the round count is
    * the graph diameter and the log-round shortcut is pointer doubling over
    * the current labels — the `Graph.resolveRoots` machinery. The per-round
    * driver action is a single converged-count (inherent to iterative
    * fixpoint, lineage cut via `localCheckpoint` — same discipline as
    * resolveRoots). Consumes the MATERIALIZED d3 pair table; the signature
    * pipeline is not re-run. Output: every clustered doc with its component
    * id (= min doc_id in the component) and the component size. */
  def d8_dup_clusters(s: SparkSession, dir: String): DataFrame = {
    val labels = d8Labels(s, dir)
    val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("n_members"))
    labels.join(sizes, Seq("lbl"))
      .select(col("n").as("doc_id"), col("lbl").as("cluster_id"), col("n_members"))
      .orderBy("doc_id")
  }

  /** d8's converged component labels, staged per (session, sf-dir) like
    * [[d3Pairs]] (optimization r15): the min-label fixpoint loop is an
    * iterative chain of join+aggregate+checkpoint rounds, and the cleaning
    * funnel consumes the SAME cluster table through two independent legs —
    * c1's dedup survivors (via c3→c13) and c11's cluster-anchored split —
    * so every c13-and-above query ran the whole loop twice per timed run.
    * This is the cluster staging table a production pipeline keeps warm;
    * `Bench.clearShared` (via [[clearShared]]) drops it so timed runs stay
    * cold-cost — cold now means ONE loop, not one per consumer. */
  private val d8Cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), () => DataFrame]()

  private def d8Labels(s: SparkSession, dir: String): DataFrame =
    QUtil.cachedPerSession(d8Cache, s, dir)(
      minLabelComponents(d3Pairs(s, dir).filter(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"))))

  /** Min-label propagation over an undirected pair relation (doc_a, doc_b)
    * → (n, lbl = component min). Shared by d8 and the m7 media keep-best
    * composite; rounds = component diameter (d9's star contraction is the
    * log-round twin for adversarial diameters). */
  private[graft] def minLabelComponents(rawPairs: DataFrame): DataFrame = {
    val pairs = rawPairs.select(col("doc_a"), col("doc_b"))
    val edges = pairs.unionByName(
        pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .toDF("u", "v").localCheckpoint()
    var labels = edges.select(col("u").as("n")).distinct()
      .withColumn("lbl", col("n")).localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val nbrMin = edges.join(labels.withColumnRenamed("n", "v"), Seq("v"))
        .groupBy(col("u")).agg(min(col("lbl")).as("nbr_lbl"))
      val next = labels.join(nbrMin.withColumnRenamed("u", "n"), Seq("n"), "left")
        .select(col("n"), col("lbl"),
                least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("nlbl"))
        .localCheckpoint()
      changed = next.filter(col("nlbl") < col("lbl")).count()
      // narrow projection over the checkpoint — a second materialization per
      // round would only re-write the same blocks
      labels = next.select(col("n"), col("nlbl").as("lbl"))
    }
    labels
  }

  /** Oracle: the same components via a recursive reachability CTE over the
    * identical d3 pair relation (spliced in verbatim as `pairs`), component
    * id = min reachable node. */
  val d8Sql: String =
    s"""WITH RECURSIVE pairs AS (
      |$d3SqlBody
      |), ed AS (
      |  SELECT doc_a AS u, doc_b AS v FROM pairs WHERE jaccard >= 0.5
      |  UNION
      |  SELECT doc_b, doc_a FROM pairs WHERE jaccard >= 0.5
      |), reach(src, node) AS (
      |  SELECT u, u FROM ed
      |  UNION
      |  SELECT r.src, e.v FROM reach r JOIN ed e ON r.node = e.u
      |), comp AS (
      |  SELECT src AS doc_id, min(node) AS cluster_id FROM reach GROUP BY 1
      |)
      |SELECT doc_id, cluster_id,
      |       count(*) OVER (PARTITION BY cluster_id) AS n_members
      |FROM comp ORDER BY doc_id""".stripMargin

  /** D7 edit-distance verification — the exact-match stage of two-stage
    * fuzzy dedup: LSH proposes candidates (cheap, recall-oriented), exact
    * Levenshtein confirms them (precise, run ONLY on the candidate pairs,
    * never all-pairs — at 100 TB the O(len²) DP is affordable precisely
    * because the candidate set is LSH-bounded). Consumes the shared
    * [[d3Pairs]] staging table; emits every candidate with its edit
    * distance and a relative-threshold verdict (dist ≤ 30% of the longer
    * text). Both engines implement classical Levenshtein — identical
    * integers, no float anywhere. */
  def d7_edit_verify(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    d3Pairs(s, dir)
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
              levenshtein(col("ta"), col("tb")).cast("long").as("edit_dist"),
              greatest(length(col("ta")), length(col("tb"))).cast("long").as("max_len"))
      .withColumn("is_near",
        (col("edit_dist") * 10 <= col("max_len") * 3).cast("int"))
      .orderBy("doc_a", "doc_b")
  }

  val d7Sql: String =
    s"""WITH pairs AS (
      |$d3SqlBody
      |)
      |SELECT doc_a, doc_b,
      |  levenshtein(da.text, db.text)::BIGINT AS edit_dist,
      |  greatest(length(da.text), length(db.text))::BIGINT AS max_len,
      |  CASE WHEN levenshtein(da.text, db.text) * 10
      |            <= greatest(length(da.text), length(db.text)) * 3
      |       THEN 1 ELSE 0 END AS is_near
      |FROM pairs
      |JOIN documents da ON da.doc_id = doc_a
      |JOIN documents db ON db.doc_id = doc_b
      |ORDER BY doc_a, doc_b""".stripMargin

  /** D9: the SAME duplicate clusters as [[d8_dup_clusters]], by two-phase
    * STAR CONTRACTION (Kiveris et al., "Connected Components in MapReduce
    * and Beyond") instead of label propagation — the d8/d9 pair follows the
    * st5/st6 twin discipline: identical results, different scale envelope.
    * d8's min-label rounds equal the graph DIAMETER (fine for near-dup
    * clusters, whose diameter is 2-3; pathological for chain-shaped
    * graphs); alternating large-star (hang every larger neighbor off the
    * neighborhood min) and small-star (hang the smaller ones) contracts
    * any component to its min-rooted star in O(log n) alternations. Each
    * half-round is one neighborhood aggregation + one key join + a
    * distinct — all key-partitioned shuffles; the per-round driver action
    * is the fixpoint's inherent has-anything-changed check. `GraphSpec`
    * drives a 64-node chain through it in ≤ 8 alternations (diameter 63). */
  def d9_dup_clusters_star(s: SparkSession, dir: String): DataFrame = {
    val pairs = d3Pairs(s, dir).filter(col("jaccard") >= 0.5)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
    val (labels, _) = starComponents(pairs)
    val sizes = labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("n_members"))
    labels.join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("n_members"))
      .orderBy("doc_id")
  }

  /** Two-phase star contraction over an undirected edge list (u, v) —
    * returns (labels (doc_id, cluster_id = component min), alternations).
    * Package-visible so specs can drive adversarial graph shapes. */
  private[graft] def starComponents(pairs: DataFrame): (DataFrame, Int) = {
    def canon(e: DataFrame): DataFrame =
      e.select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
    def sym(e: DataFrame): DataFrame =
      e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    // per node: min of its neighborhood including itself
    def minsOf(symE: DataFrame): DataFrame = symE
      .groupBy(col("u")).agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    def largeStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      canon(s.filter(col("v") > col("u"))
        .join(minsOf(s), Seq("u"))
        .select(col("v").as("u"), col("m").as("v")))
    }
    def smallStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      val m = minsOf(s)
      canon(s.filter(col("v") < col("u"))
        .join(m, Seq("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(m.select(col("u"), col("m").as("v"))))
    }
    val MaxAlternations = 32
    var e = canon(pairs).localCheckpoint()
    var rounds = 0
    var changed = true
    while (changed && rounds < MaxAlternations) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      changed = next.count() != e.count() ||
        next.exceptAll(e).limit(1).count() > 0
      e = next
      rounds += 1
    }
    require(!changed,
      s"star contraction still changing after $MaxAlternations alternations")
    val labels = minsOf(sym(e))
      .select(col("u").as("doc_id"), col("m").as("cluster_id"))
    (labels, rounds)
  }

  /** D10 cross-doc BOILERPLATE detection — the C4/RefinedWeb span-removal
    * pass: spans (3-grams here) occurring across many distinct documents
    * are navigation chrome / license headers / templates, not content, and
    * every web-scale pipeline strips or down-weights them. Complements
    * t12 (WITHIN-doc repetition): this is the cross-doc signal. Output
    * per doc: distinct grams, how many are corpus boilerplate (gram in
    * ≥ 5 distinct docs), and the boilerplate ratio — the filter signal.
    *
    * Scale shape: per-doc distinct grams (one doc-keyed aggregate after an
    * array-native gram explode), the global gram→doc-count (one gram-keyed
    * aggregate — this is the C4 "count lines across the corpus" pass), a
    * gram-keyed join back (co-partitioned with the count shuffle), and a
    * final doc-keyed rollup. The catalog is never broadcast or collected —
    * at 100 TB the boilerplate catalog alone is billions of grams. */
  def d10_boilerplate(s: SparkSession, dir: String): DataFrame = {
    val N = 3
    val K = 5
    val t = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= N)
    val grams = t.select(col("doc_id"), explode(expr(
      s"transform(sequence(1, size(w) - ${N - 1}), i -> concat_ws(' ', slice(w, i, $N)))"))
      .as("gram"))
      .distinct() // per-doc distinct spans (C4 counts a line once per doc)
    val catalog = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= K)
      .select(col("gram"), lit(1L).as("boiler"))
    grams.join(catalog, Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
           count(col("boiler")).as("n_boiler"))
      .withColumn("boiler_ratio",
        round4(col("n_boiler").cast("double") / col("n_grams")))
      .orderBy("doc_id")
  }

  val d10Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3
      |), g AS (
      |  SELECT DISTINCT doc_id, list_aggregate(w[i:i+2], 'string_agg', ' ') AS gram
      |  FROM t CROSS JOIN (SELECT unnest(range(1, 1 + (SELECT max(len(w)) FROM t))) AS i)
      |  WHERE i + 2 <= len(w)
      |), cat AS (
      |  SELECT gram FROM g GROUP BY gram HAVING count(*) >= 5
      |)
      |SELECT g.doc_id, count(*) AS n_grams,
      |  count(cat.gram)::BIGINT AS n_boiler,
      |  floor(count(cat.gram)::DOUBLE / count(*) * 10000.0 + 0.5) / 10000.0 AS boiler_ratio
      |FROM g LEFT JOIN cat USING (gram)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** D11 duplicated-span coverage: the SUBSTRING-level dedup metric —
    * for each document, the fraction of token positions covered by an
    * 8-gram that occurs at least twice anywhere in the corpus (other
    * documents OR a repeat within the same one). This is the measurement
    * behind exact-substring train-set dedup ("Deduplicating Training Data
    * Makes Language Models Better", Lee et al. 2022): suffix-array
    * pipelines delete such spans; the per-doc coverage ratio is the triage
    * signal that says HOW duplicated a document is, where d1/d3 only say
    * whether the whole document has a near-twin. Complements d10 (which
    * counts distinct grams against a ≥5-doc boilerplate catalog): d11 is
    * positional — overlapping duplicated grams are unioned into covered
    * INTERVALS, so 9 duplicated tokens in a row count as 9, not 2×8.
    *
    * Scale shape: one gram-keyed count (the suffix-array stand-in — at
    * 100 TB the gram key would be an 8-byte hash, not the string, so only
    * fixed-width keys shuffle; the string form here keeps the DuckDB
    * oracle exact), a gram-keyed join back (co-partitioned with the
    * count), an 8-way position explode of only DUPLICATED occurrences,
    * and a doc-keyed distinct+count. Nothing is broadcast or collected;
    * the duplicated-occurrence set is a small fraction of the corpus by
    * construction (most grams are unique). */
  def d11_dupspan_coverage(s: SparkSession, dir: String): DataFrame = {
    val N = 8
    val t = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val occ = t.filter(size(col("w")) >= N)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(w) - ${N - 1}), " +
          s"i -> struct(i AS pos, concat_ws(' ', slice(w, i, $N)) AS gram))")).as("o"))
      .select(col("doc_id"), col("o.pos").as("pos"), col("o.gram").as("gram"))
    val dup = occ.groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select(col("gram"))
    val covered = occ.join(dup, Seq("gram")) // shuffle equi-join: dup is unbounded
      .select(col("doc_id"), explode(expr(s"sequence(pos, pos + ${N - 1})")).as("p"))
      .distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_cov"))
    t.select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .withColumn("n_cov", coalesce(col("n_cov"), lit(0L)))
      .withColumn("cov_ratio", round4(col("n_cov").cast("double") / col("n_tokens")))
      .orderBy("doc_id")
  }

  val d11Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |), occ AS (
      |  SELECT doc_id, i AS pos, list_aggregate(w[i:i+7], 'string_agg', ' ') AS gram
      |  FROM t CROSS JOIN (SELECT unnest(range(1, 1 + (SELECT max(len(w)) FROM t))) AS i)
      |  WHERE i + 7 <= len(w)
      |), dup AS (
      |  SELECT gram FROM occ GROUP BY gram HAVING count(*) >= 2
      |), cov AS (
      |  SELECT DISTINCT o.doc_id, o.pos + j AS p
      |  FROM occ o JOIN dup USING (gram)
      |  CROSS JOIN (SELECT unnest(range(0, 8)) AS j)
      |), cnt AS (
      |  SELECT doc_id, count(*) AS n_cov FROM cov GROUP BY 1
      |)
      |SELECT t.doc_id, len(t.w)::BIGINT AS n_tokens,
      |  coalesce(cnt.n_cov, 0)::BIGINT AS n_cov,
      |  floor(coalesce(cnt.n_cov, 0)::DOUBLE / len(t.w) * 10000.0 + 0.5) / 10000.0
      |    AS cov_ratio
      |FROM t LEFT JOIN cnt USING (doc_id) ORDER BY doc_id""".stripMargin

  /** D12 incremental (delta-vs-base) exact dedup — the daily-increment shape
    * every production corpus runs: yesterday's corpus (the BASE, here
    * `doc_id % 10 <> 0`) is already deduplicated; only the arriving DELTA
    * (`doc_id % 10 = 0`) must be checked, (a) against the base and (b)
    * within itself, without ever re-pairing base×base. Each delta doc is
    * classified `dup_of_base` (its content hash exists in the base, with
    * the canonical base doc), `dup_in_delta` (first seen inside this
    * delta), or `unique`, plus the canonical `dup_of` pointer — exactly
    * the drop-list an incremental ingest publishes. The content key is
    * d1's family-wide PREFIX digest `md5(text[1..64])` — a deliberate
    * convention where it gates admission: two docs sharing a 64-char
    * prefix but diverging later hash equal here, and full-text equality
    * is the near-dup machinery's job (d3's shingled Jaccard).
    *
    * Scale shape — the whole point of the query: the base side collapses
    * to its (hash, min doc_id) fingerprint aggregate BEFORE the join
    * (partial agg, map-side combined), so 99.9 TB of settled corpus ships
    * only fixed-width digests once, and the per-increment cost is
    * O(delta) + one co-partitioned hash join; nothing quadratic in base
    * size ever forms, and re-running yesterday's pairs never happens. The
    * delta-internal pass is one window over the same hash key — the same
    * Exchange the join already made. */
  def d12_incremental_dedup(s: SparkSession, dir: String): DataFrame =
    incrClassify(Tables.documents(s, dir) // d1's canonical content key, as a
      .select(col("doc_id"),              // fixed-width digest — only 16
        md5(substring(col("text"), 1, 64)).as("h"))) // bytes per doc ship
      .orderBy("doc_id")

  /** The d12 classification on an arbitrary (doc_id, h) relation — split
    * out so specs can drive all three status branches with engineered
    * hash collisions. Base = `doc_id % 10 <> 0`, delta = the rest. */
  private[graft] def incrClassify(docs: DataFrame): DataFrame = {
    val baseMin = docs.filter(col("doc_id") % 10 =!= 0)
      .groupBy(col("h")).agg(min(col("doc_id")).as("base_id"))
    docs.filter(col("doc_id") % 10 === 0)
      .withColumn("delta_first",
        min(col("doc_id")).over(Window.partitionBy(col("h"))))
      .join(baseMin, Seq("h"), "left")
      .select(col("doc_id"),
        when(col("base_id").isNotNull, lit("dup_of_base"))
          .when(col("doc_id") =!= col("delta_first"), lit("dup_in_delta"))
          .otherwise(lit("unique")).as("status"),
        coalesce(col("base_id"),
          when(col("doc_id") =!= col("delta_first"), col("delta_first")))
          .as("dup_of"))
  }

  val d12Sql: String =
    """WITH d AS (SELECT doc_id, md5(substring(text, 1, 64)) AS h FROM documents),
      |base AS (
      |  SELECT h, min(doc_id) AS base_id FROM d WHERE doc_id % 10 <> 0 GROUP BY h
      |), delta AS (
      |  SELECT doc_id, h, min(doc_id) OVER (PARTITION BY h) AS delta_first
      |  FROM d WHERE doc_id % 10 = 0
      |)
      |SELECT dl.doc_id,
      |  CASE WHEN b.base_id IS NOT NULL THEN 'dup_of_base'
      |       WHEN dl.doc_id <> dl.delta_first THEN 'dup_in_delta'
      |       ELSE 'unique' END AS status,
      |  coalesce(b.base_id,
      |    CASE WHEN dl.doc_id <> dl.delta_first THEN dl.delta_first END) AS dup_of
      |FROM delta dl LEFT JOIN base b USING (h)
      |ORDER BY dl.doc_id""".stripMargin

  /** D13: incremental NEAR-dup — d12's daily-increment discipline applied
    * to d3's MinHash LSH: the settled corpus (doc_id % 10 ≠ 0) keeps its
    * band-signature table as a staging relation; each arriving delta
    * document (doc_id % 10 = 0) computes its own signatures in O(1) and
    * finds near-duplicates via (a) a co-partitioned (band, mh0, mh1)
    * equi-join against the settled band table and (b) the same join
    * against earlier delta arrivals (lower doc_id). Exact Jaccard verify
    * (≥ 0.5, d2's threshold) only on the banded candidates; the chosen
    * partner is deterministic — settled matches win over delta matches,
    * then lowest id. This is the realistic crawl-ingest shape at 100 TB:
    * settled×settled pairs NEVER form (the corpus was deduplicated when
    * it settled), per-increment work is O(delta) signature rows plus
    * bucket-bounded candidate pairs, and the band table is exactly the
    * index a production ingest keeps warm between increments. */
  def d13_incremental_neardup(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    val bands = bandSigs(s, dir)
    val isDelta = col("doc_id") % 10 === 0
    val deltaB = bands.filter(isDelta)
    val partnerB = bands.select(col("doc_id").as("cand_id"), col("band"),
                                col("mh0"), col("mh1"))
    val candBase = deltaB.join(partnerB.filter(col("cand_id") % 10 =!= 0),
        Seq("band", "mh0", "mh1"))
      .select(col("doc_id"), col("cand_id")).distinct()
      .withColumn("is_base", lit(true))
    val candDelta = deltaB.join(partnerB.filter(col("cand_id") % 10 === 0),
        Seq("band", "mh0", "mh1"))
      .filter(col("cand_id") < col("doc_id"))
      .select(col("doc_id"), col("cand_id")).distinct()
      .withColumn("is_base", lit(false))
    val cand = candBase.unionByName(candDelta)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = cand
      .join(sh.select(col("doc_id"), col("sh")), Seq("doc_id"))
      .join(sh.select(col("doc_id").as("cand_id"), col("sh")), Seq("cand_id", "sh"))
      .groupBy(col("doc_id"), col("cand_id")).agg(count(lit(1)).as("inter"))
    val best = cand
      .join(inter, Seq("doc_id", "cand_id"), "left").na.fill(0L, Seq("inter"))
      .join(sizes, Seq("doc_id"))
      .join(sizes.select(col("doc_id").as("cand_id"), col("n_sh").as("nb")), Seq("cand_id"))
      .withColumn("jaccard", jaccard(col("inter"), col("n_sh"), col("nb")))
      .filter(col("jaccard") >= 0.5)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(when(col("is_base"), lit(0)).otherwise(lit(1)), col("cand_id"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("cand_id"), col("is_base"), col("jaccard"))
    Tables.documents(s, dir).select(col("doc_id")).filter(isDelta)
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("is_base") === true, lit("neardup_of_base"))
          .when(col("is_base") === false, lit("neardup_in_delta"))
          .otherwise(lit("unique")).as("status"),
        col("cand_id").as("dup_of"), col("jaccard"))
      .orderBy("doc_id")
  }

  val d13Sql: String =
    s"""WITH $bandsSqlCtes, candb AS (
      |  SELECT DISTINCT d.doc_id, b.doc_id AS cand_id, true AS is_base
      |  FROM bands d JOIN bands b
      |    ON d.band = b.band AND d.mh0 = b.mh0 AND d.mh1 = b.mh1
      |  WHERE d.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
      |), candd AS (
      |  SELECT DISTINCT d.doc_id, b.doc_id AS cand_id, false AS is_base
      |  FROM bands d JOIN bands b
      |    ON d.band = b.band AND d.mh0 = b.mh0 AND d.mh1 = b.mh1
      |  WHERE d.doc_id % 10 = 0 AND b.doc_id % 10 = 0 AND b.doc_id < d.doc_id
      |), cand AS (
      |  SELECT * FROM candb UNION ALL SELECT * FROM candd
      |), sizes AS (
      |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
      |), inter AS (
      |  SELECT c.doc_id, c.cand_id, count(*) AS inter
      |  FROM cand c
      |  JOIN sh a ON a.doc_id = c.doc_id
      |  JOIN sh b ON b.doc_id = c.cand_id AND a.sh = b.sh
      |  GROUP BY 1, 2
      |), ver AS (
      |  SELECT c.doc_id, c.cand_id, c.is_base,
      |    floor(coalesce(i.inter, 0)::DOUBLE
      |          / (sa.n_sh + sb.n_sh - coalesce(i.inter, 0)) * 10000.0 + 0.5)
      |      / 10000.0 AS jaccard
      |  FROM cand c
      |  LEFT JOIN inter i ON i.doc_id = c.doc_id AND i.cand_id = c.cand_id
      |  JOIN sizes sa ON sa.doc_id = c.doc_id
      |  JOIN sizes sb ON sb.doc_id = c.cand_id
      |), best AS (
      |  SELECT doc_id, cand_id, is_base, jaccard,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY CASE WHEN is_base THEN 0 ELSE 1 END, cand_id) AS rn
      |  FROM ver WHERE jaccard >= 0.5
      |)
      |SELECT dl.doc_id,
      |  CASE WHEN b.is_base THEN 'neardup_of_base'
      |       WHEN b.is_base = false THEN 'neardup_in_delta'
      |       ELSE 'unique' END AS status,
      |  b.cand_id AS dup_of, b.jaccard
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) dl
      |LEFT JOIN best b ON b.doc_id = dl.doc_id AND b.rn = 1
      |ORDER BY dl.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d13_incremental_neardup" -> (d13_incremental_neardup _),
    "d12_incremental_dedup" -> (d12_incremental_dedup _),
    "d11_dupspan_coverage" -> (d11_dupspan_coverage _),
    "d10_boilerplate" -> (d10_boilerplate _),
    "d9_dup_clusters_star" -> (d9_dup_clusters_star _),
    "d7_edit_verify"   -> (d7_edit_verify _),
    "d8_dup_clusters"  -> (d8_dup_clusters _),
    "d6_cdc_chunks"    -> (d6_cdc_chunks _),
    "d1_exact_dedup"   -> (d1_exact_dedup _),
    "d2_ngram_jaccard" -> (d2_ngram_jaccard _),
    "d3_minhash_lsh"   -> (d3_minhash_lsh _),
    "d4_simhash"       -> (d4_simhash _),
    "d5_embedding_neardup" -> (d5_embedding_neardup _))

  val oracles: Map[String, String] = Map(
    "d13_incremental_neardup" -> d13Sql,
    "d12_incremental_dedup" -> d12Sql,
    "d11_dupspan_coverage" -> d11Sql,
    "d10_boilerplate" -> d10Sql,
    "d9_dup_clusters_star" -> d8Sql, // identical-result twin shares d8's oracle
    "d7_edit_verify"   -> d7Sql,
    "d8_dup_clusters"  -> d8Sql,
    "d6_cdc_chunks"    -> d6Sql,
    "d1_exact_dedup"   -> d1Sql,
    "d2_ngram_jaccard" -> d2Sql,
    "d3_minhash_lsh"   -> d3Sql,
    "d4_simhash"       -> d4Sql,
    "d5_embedding_neardup" -> d5Sql)
}
