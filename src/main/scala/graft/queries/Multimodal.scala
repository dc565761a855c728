package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing for training-data pipelines: media rides along
  * as opaque `binary` columns with typed metadata; decode / feature-extract /
  * frame-sample run as per-partition batch transforms.
  *
  * The container ships no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub (`StubCodec`) — but every Spark-side
  * piece a real pipeline needs is genuine and tested: the binary column +
  * metadata schema, partition-parallel `mapPartitions` execution with a typed
  * Encoder (the Scala analog of `mapInPandas` batch processing), the
  * batch-shape contract (one iterator pass, O(partition) memory, no
  * driver collect), and metadata pushdown (m1 never touches bytes, so column
  * pruning keeps the binary column unread).
  *
  * Media bytes are derived deterministically from the driver's `documents`
  * table (`encode(text)` — no synthetic external data), so the DuckDB oracle
  * can verify even the decode-stub outputs arithmetically.
  */
object Multimodal {

  /** A media asset row: opaque payload + typed metadata. */
  case class Asset(doc_id: Long, media_type: String, payload: Array[Byte],
                   n_bytes: Long, source: String)
  /** Stub-decoded per-asset features (what a codec would yield). */
  case class Decoded(doc_id: Long, media_type: String, n_bytes: Long,
                     header_byte: Long, checksum: Long, n_frames: Long)

  /** The `documents` table lifted into a media-asset table: payload =
    * UTF-8 bytes of `text` (deterministic stand-in for image/audio bytes);
    * media_type assigned round-robin for coverage. */
  def assets(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      length(col("text")).cast("long").as("n_bytes"),
      col("source"))

  /** ======= STUB CODEC =======
    * Stands in for the real image/audio decode (no codecs in container).
    * Deterministic pure-arithmetic "decode" so outputs stay oracle-checkable:
    * header = first payload byte, checksum = position-weighted byte sum
    * mod 2^31-1, frames = one per 64-byte block (a frame-sampling stand-in).
    * A real deployment swaps ONLY this function for an actual codec call —
    * batch shape, schema, and partitioning are production-real. */
  object StubCodec {
    def decode(a: Asset): Decoded = {
      val bytes = a.payload
      var checksum = 0L
      var i = 0
      while (i < bytes.length) {
        checksum = (checksum + (bytes(i) & 0xffL) * (i + 1)) % 2147483647L
        i += 1
      }
      Decoded(a.doc_id, a.media_type, bytes.length.toLong,
        if (bytes.isEmpty) -1L else (bytes(0) & 0xffL),
        checksum, (bytes.length + 63) / 64)
    }
  }

  /** M1: metadata-only stats — proves the binary column is NOT read when
    * only metadata is touched (column pruning keeps the scan narrow). */
  def m1_media_meta(s: SparkSession, dir: String): DataFrame =
    assets(s, dir)
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_assets"),
           sum(col("n_bytes")).as("total_bytes"),
           max(col("n_bytes")).as("max_bytes"))
      .orderBy("media_type")

  val m1Sql: String =
    """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  count(*) AS n_assets,
      |  sum(length(text))::BIGINT AS total_bytes,
      |  max(length(text))::BIGINT AS max_bytes
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** M2: partition-parallel decode via typed `mapPartitions` — the
    * batch-processing shape of `mapInPandas`: one pass over each partition's
    * iterator, constant memory, codec amortized per batch. The stub's
    * arithmetic is reproduced by the oracle, so this path is hash-verified
    * end-to-end despite the stubbed codec. */
  def m2_decode_features(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir).as[Asset]
      .mapPartitions { it => it.map(StubCodec.decode) }
      .toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
              col("header_byte"), col("checksum"), col("n_frames"))
      .orderBy("doc_id")
  }

  val m2Sql: String =
    """WITH b AS (
      |  SELECT doc_id, i, ascii(substring(text, i, 1)) AS byte
      |  FROM documents CROSS JOIN (SELECT unnest(range(1, 1 + (SELECT max(length(text)) FROM documents))) AS i)
      |  WHERE i <= length(text)
      |)
      |SELECT d.doc_id,
      |  CASE d.doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  length(d.text)::BIGINT AS n_bytes,
      |  ascii(substring(d.text, 1, 1))::BIGINT AS header_byte,
      |  (SELECT sum(byte * i) % 2147483647 FROM b WHERE b.doc_id = d.doc_id)::BIGINT AS checksum,
      |  ((length(d.text) + 63) // 64)::BIGINT AS n_frames
      |FROM documents d ORDER BY d.doc_id""".stripMargin

  /** M3: frame-sampling plumbing — explode each asset into per-frame rows
    * (frame id + byte range), the fan-out a video pipeline feeds to a frame
    * decoder. Pure column algebra; the frame table is what `mapInPandas`
    * would consume downstream. */
  def m3_frame_sample(s: SparkSession, dir: String): DataFrame =
    assets(s, dir)
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        posexplode(sequence(lit(0L), ((col("n_bytes") - 1) / 64).cast("long"))).as(Seq("frame_id", "off")))
      .filter(col("media_type") === "video")
      .select(col("doc_id"), col("frame_id").cast("long").as("frame_id"),
              (col("off") * 64).as("byte_start"),
              least(col("off") * 64 + 64, col("n_bytes")).as("byte_end"))
      .filter(col("frame_id") % 4 === 0) // sample every 4th frame
      .orderBy("doc_id", "frame_id")

  val m3Sql: String =
    """SELECT doc_id, frame_id::BIGINT AS frame_id,
      |  (frame_id * 64)::BIGINT AS byte_start,
      |  least(frame_id * 64 + 64, length(text))::BIGINT AS byte_end
      |FROM documents
      |CROSS JOIN (SELECT unnest(range(0, 1000)) AS frame_id)
      |WHERE doc_id % 3 = 2
      |  AND frame_id <= (length(text) - 1) // 64
      |  AND frame_id % 4 = 0
      |ORDER BY doc_id, frame_id""".stripMargin

  /** M4 media content-hash dedup: exact duplicate assets found by hashing
    * the OPAQUE payload bytes — the first dedup pass every multimodal
    * pipeline runs (same image uploaded twice ⇒ same bytes ⇒ same digest),
    * no codec needed. One hash + one shuffle on the digest; the binary
    * column itself never shuffles (only its 128-bit digest does) — at
    * 100 TB of media that is the difference between shuffling terabytes
    * and shuffling gigabytes. Canonical = min doc_id per digest, groups
    * with ≥ 2 assets reported. (Oracle: payload is `encode(text)`, so
    * `md5(payload)` ≡ DuckDB's `md5(text)` over the UTF-8 bytes.) */
  def m4_media_dedup(s: SparkSession, dir: String): DataFrame =
    assets(s, dir)
      .select(md5(col("payload")).as("content_hash"), col("doc_id"), col("n_bytes"))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n_assets"),
           min(col("doc_id")).as("canonical_id"),
           min(col("n_bytes")).as("n_bytes"))
      .filter(col("n_assets") >= 2)
      .orderBy("content_hash")

  val m4Sql: String =
    """SELECT md5(text) AS content_hash, count(*) AS n_assets,
      |  min(doc_id) AS canonical_id, min(length(text))::BIGINT AS n_bytes
      |FROM documents
      |GROUP BY 1 HAVING count(*) >= 2
      |ORDER BY content_hash""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m4_media_dedup"     -> (m4_media_dedup _),
    "m1_media_meta"      -> (m1_media_meta _),
    "m2_decode_features" -> (m2_decode_features _),
    "m3_frame_sample"    -> (m3_frame_sample _))

  val oracles: Map[String, String] = Map(
    "m4_media_dedup"     -> m4Sql,
    "m1_media_meta"      -> m1Sql,
    "m2_decode_features" -> m2Sql,
    "m3_frame_sample"    -> m3Sql)
}
