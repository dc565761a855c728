package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parser for the reference's LDBC-SNB activity streams (FIXTURES.md §A).
  *
  * The reference wire format is pipe-delimited CSV with a 1-char type tag on
  * the Kafka topic (`Activity.java:62-73`) or three per-type CSV files
  * (`post|comment|likes_event_stream.csv`). Variants:
  *  - Post:    `id|personId|creationDate|imageFile|locationIP|browserUsed|language|content|tags|forumId|placeId`
  *  - Comment: `id|personId|creationDate|locationIP|browserUsed|content|reply_to_postId|reply_to_commentId|placeId`
  *    — non-empty field 7 ⇒ Comment (direct child of a post); empty ⇒ Reply
  *    (child of another comment; root post unknown until resolved)
  *    (`Activity.java:188-193`)
  *  - Like:    `Person.id|Post.id|creationDate`
  *  - Tombstone: end-of-stream marker (`T|postId|ts`) — parsed then filtered
  *    (`Activity.java:291-320`); bounded batch/AvailableNow replay ends
  *    naturally so it carries no semantics here.
  *
  * Everything is columnar `split`/`to_timestamp` expressions — fully
  * codegen'd, no UDFs; the parse runs at scan speed.
  *
  * Timestamps: `yyyy-MM-dd'T'HH:mm:ss` with optional fractional digits and
  * quirky trailing `Z`/`ZZ` zone suffixes (`Activity.java:44-50`,
  * `TestJava.java:12-35`), parsed in UTC. We normalize by trimming trailing
  * `Z`s and parsing the fraction separately — `to_timestamp` patterns cannot
  * express [.S][S][S][X][X] directly.
  *
  * All per-variant parsers operate on TAGGED lines (`P|…`, `C|…`, `L|…`):
  * field 1 is the tag, payload fields start at 2. Untagged CSV lines get a
  * dummy tag prepended by the `posts`/`comments`/`likes` entry points.
  */
object ActivityParser {

  /** The unified activity schema (SURVEY.md §1.3): one flat row per event
    * with a `type` discriminator — nullable where the variant lacks the
    * field. */
  val unifiedColumns: Seq[String] = Seq(
    "type", "event_id", "person_id", "post_id", "parent_id", "creation_ts",
    "content", "image_file", "location_ip", "browser", "language", "tags",
    "forum_id", "place_id")

  /** Parse the reference's quirky timestamp strings: trim trailing Zs, then
    * `yyyy-MM-dd'T'HH:mm:ss` + optional `.fraction` interpreted as
    * milliseconds (1-3 digits, left-aligned: `.5` = 500 ms). */
  def parseTs(c: Column): Column = {
    val trimmed = regexp_replace(c, "Z+$", "")
    val base = to_timestamp(substring(trimmed, 1, 19), "yyyy-MM-dd'T'HH:mm:ss")
    val frac = regexp_extract(trimmed, "\\.([0-9]{1,3})", 1)
    val millis = when(frac === "", lit(0L))
      .otherwise(rpad(frac, 3, "0").cast("long"))
    timestamp_micros(unix_timestamp(base) * 1000000L + millis * 1000L)
  }

  private def f(line: Column, i: Int): Column = element_at(split(line, "\\|", -1), i)
  private def intOrNull(c: Column): Column = when(c === "", lit(null)).otherwise(c).cast("int")

  /** `[5183, 1912]` → array<int>; empty/blank → empty array. */
  def parseTags(c: Column): Column = {
    val inner = trim(regexp_replace(c, "[\\[\\]]", ""))
    when(inner === "", array().cast("array<int>"))
      .otherwise(transform(split(inner, ",\\s*"), t => t.cast("int")))
  }

  private def emptyTags = array().cast("array<int>")
  private def nstr = lit(null).cast("string")
  private def nint = lit(null).cast("int")

  /** tagged post line → unified row. */
  def parsePostLine(line: Column): Column = struct(
    lit("post").as("type"),
    f(line, 2).cast("int").as("event_id"),
    f(line, 3).cast("int").as("person_id"),
    f(line, 2).cast("int").as("post_id"), // a post is its own root
    nint.as("parent_id"),
    parseTs(f(line, 4)).as("creation_ts"),
    f(line, 9).as("content"),
    f(line, 5).as("image_file"),
    f(line, 6).as("location_ip"),
    f(line, 7).as("browser"),
    f(line, 8).as("language"),
    parseTags(f(line, 10)).as("tags"),
    intOrNull(f(line, 11)).as("forum_id"),
    intOrNull(f(line, 12)).as("place_id"))

  /** tagged comment line → unified row; discriminates Comment vs Reply by
    * the emptiness of reply_to_postId. */
  def parseCommentLine(line: Column): Column = {
    val directPost = f(line, 8)
    val isReply = directPost === ""
    struct(
      when(isReply, lit("reply")).otherwise(lit("comment")).as("type"),
      f(line, 2).cast("int").as("event_id"),
      f(line, 3).cast("int").as("person_id"),
      when(isReply, lit(null)).otherwise(directPost).cast("int").as("post_id"),
      when(isReply, f(line, 9)).otherwise(lit(null)).cast("int").as("parent_id"),
      parseTs(f(line, 4)).as("creation_ts"),
      f(line, 7).as("content"),
      nstr.as("image_file"),
      f(line, 5).as("location_ip"),
      f(line, 6).as("browser"),
      nstr.as("language"),
      emptyTags.as("tags"),
      nint.as("forum_id"),
      intOrNull(f(line, 10)).as("place_id"))
  }

  /** tagged like line → unified row (no own id). */
  def parseLikeLine(line: Column): Column = struct(
    lit("like").as("type"),
    nint.as("event_id"),
    f(line, 2).cast("int").as("person_id"),
    f(line, 3).cast("int").as("post_id"),
    nint.as("parent_id"),
    parseTs(f(line, 4)).as("creation_ts"),
    nstr.as("content"), nstr.as("image_file"), nstr.as("location_ip"),
    nstr.as("browser"), nstr.as("language"), emptyTags.as("tags"),
    nint.as("forum_id"), nint.as("place_id"))

  /** tagged tombstone line (`T|postId|ts`) → unified row. */
  def parseTombstoneLine(line: Column): Column = struct(
    lit("tombstone").as("type"),
    nint.as("event_id"), nint.as("person_id"),
    f(line, 2).cast("int").as("post_id"),
    nint.as("parent_id"),
    parseTs(f(line, 3)).as("creation_ts"),
    nstr.as("content"), nstr.as("image_file"), nstr.as("location_ip"),
    nstr.as("browser"), nstr.as("language"), emptyTags.as("tags"),
    nint.as("forum_id"), nint.as("place_id"))

  /** A line with an unknown tag → error-channel row (the reference throws
    * `"Invalid activity"` in `Activity.fromString` and routes failures to
    * the error `OutputTag`, `PostIdResolver.java:42-52`); the raw line is
    * preserved in `content` for the audit sink. */
  def parseErrorLine(line: Column): Column = struct(
    lit("error").as("type"),
    nint.as("event_id"), nint.as("person_id"), nint.as("post_id"),
    nint.as("parent_id"),
    lit(null).cast("timestamp").as("creation_ts"),
    line.as("content"), nstr.as("image_file"), nstr.as("location_ip"),
    nstr.as("browser"), nstr.as("language"), emptyTags.as("tags"),
    nint.as("forum_id"), nint.as("place_id"))

  /** Kafka-topic wire line with 1-char type tag: dispatch on the tag
    * (`Activity.fromString`, `Activity.java:62-73`); unknown tags go to the
    * error channel rather than silently vanishing. */
  def parseTagged(line: Column): Column = {
    val tag = substring(line, 1, 1)
    when(tag === "P", parsePostLine(line))
      .when(tag === "C", parseCommentLine(line))
      .when(tag === "L", parseLikeLine(line))
      .when(tag === "T", parseTombstoneLine(line))
      .otherwise(parseErrorLine(line))
  }

  private def unnest(df: DataFrame, parsed: Column): DataFrame =
    df.select(parsed.as("a")).select(unifiedColumns.map(c => col(s"a.$c")): _*)

  /** Parse a DataFrame of raw untagged CSV lines (column `value`, header
    * already dropped) into the unified schema. */
  def posts(lines: DataFrame): DataFrame =
    unnest(lines, parsePostLine(concat(lit("P|"), col("value"))))
  def comments(lines: DataFrame): DataFrame =
    unnest(lines, parseCommentLine(concat(lit("C|"), col("value"))))
  def likes(lines: DataFrame): DataFrame =
    unnest(lines, parseLikeLine(concat(lit("L|"), col("value"))))

  /** J1 stream-union: the three per-type streams merged into one unified
    * activity stream (`Producer.java:23-43`). Schemas already identical so
    * this is a zero-shuffle unionByName. */
  def unified(posts: DataFrame, comments: DataFrame, likes: DataFrame): DataFrame =
    posts.unionByName(comments).unionByName(likes)

  /** Tagged Kafka-style lines (column `value`) → unified, tombstones AND
    * malformed lines dropped (L4: bounded replay ends naturally; use
    * [[fromTaggedWithErrors]] when the error channel matters). */
  def fromTagged(lines: DataFrame): DataFrame =
    unnest(lines, parseTagged(col("value")))
      .filter(col("type") =!= "tombstone" && col("type") =!= "error")

  /** S5 error side output: the split-predicate form of the reference's
    * error `OutputTag` — one pass computes the discriminator, the caller
    * writes the two filtered outputs. Returns (good, errors); `errors`
    * carries the raw offending line in `content`. */
  def fromTaggedWithErrors(lines: DataFrame): (DataFrame, DataFrame) = {
    val all = unnest(lines, parseTagged(col("value")))
    (all.filter(col("type") =!= "tombstone" && col("type") =!= "error"),
     all.filter(col("type") === "error"))
  }
}
