package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.sources.ActivityParser

/** Parser semantics from FIXTURES.md §A / Activity.java: variant dispatch,
  * comment-vs-reply discrimination, tag parsing, timestamp quirks. Fixture
  * lines are hand-written in the documented wire format. */
class ActivityParserSpec extends SparkSpec {
  import spark.implicits._

  private val postLine =
    "101|11|2012-02-02T10:00:00Z|photo1.jpg|10.0.0.1|Chrome|en|hello world|[1, 2]|501|901"
  private val commentLine = // direct comment on post 101
    "201|12|2012-02-02T10:05:00Z|10.0.0.2|Firefox|nice post|101||902"
  private val replyLine = // reply to comment 201, post unknown
    "202|13|2012-02-02T10:06:30.5Z|10.0.0.3|Safari|agreed||201|903"
  private val likeLine = "11|101|2012-02-02T10:07:00ZZ"

  test("post line parses every field") {
    val r = ActivityParser.posts(Seq(postLine).toDF("value")).head()
    assert(r.getAs[String]("type") == "post")
    assert(r.getAs[Int]("event_id") == 101)
    assert(r.getAs[Int]("person_id") == 11)
    assert(r.getAs[Int]("post_id") == 101) // a post is its own root
    assert(r.getAs[Any]("parent_id") == null)
    assert(r.getAs[java.sql.Timestamp]("creation_ts").toInstant.toString
      == "2012-02-02T10:00:00Z")
    assert(r.getAs[String]("content") == "hello world")
    assert(r.getAs[scala.collection.Seq[Int]]("tags").toSeq == Seq(1, 2))
    assert(r.getAs[Int]("forum_id") == 501)
    assert(r.getAs[Int]("place_id") == 901)
  }

  test("comment with reply_to_postId is a direct comment") {
    val r = ActivityParser.comments(Seq(commentLine).toDF("value")).head()
    assert(r.getAs[String]("type") == "comment")
    assert(r.getAs[Int]("post_id") == 101)
    assert(r.getAs[Any]("parent_id") == null)
    assert(r.getAs[String]("content") == "nice post")
  }

  test("comment with empty reply_to_postId is a reply keyed by parent") {
    val r = ActivityParser.comments(Seq(replyLine).toDF("value")).head()
    assert(r.getAs[String]("type") == "reply")
    assert(r.getAs[Any]("post_id") == null) // unresolved until resolution
    assert(r.getAs[Int]("parent_id") == 201)
    // fractional '.5' = 500 ms (left-aligned millis)
    assert(r.getAs[java.sql.Timestamp]("creation_ts").toInstant.toString
      == "2012-02-02T10:06:30.500Z")
  }

  test("like line parses; double trailing Z tolerated") {
    val r = ActivityParser.likes(Seq(likeLine).toDF("value")).head()
    assert(r.getAs[String]("type") == "like")
    assert(r.getAs[Int]("person_id") == 11)
    assert(r.getAs[Int]("post_id") == 101)
    assert(r.getAs[java.sql.Timestamp]("creation_ts").toInstant.toString
      == "2012-02-02T10:07:00Z")
  }

  test("tagged wire lines dispatch on type tag; tombstones filtered") {
    val lines = Seq(
      s"P|$postLine", s"C|$commentLine", s"C|$replyLine", s"L|$likeLine",
      "T|-1|2012-02-03T00:00:00Z").toDF("value")
    val parsed = ActivityParser.fromTagged(lines)
    assert(parsed.count() == 4)
    assert(parsed.select("type").as[String].collect().sorted
      === Array("comment", "like", "post", "reply"))
  }

  test("malformed lines route to the error channel, not silently dropped") {
    val lines = Seq(
      s"P|$postLine", "garbage with no tag", "X|unknown|tag",
      "T|-1|2012-02-03T00:00:00Z").toDF("value")
    val (good, errors) = ActivityParser.fromTaggedWithErrors(lines)
    assert(good.count() == 1)
    val errLines = errors.select("content").as[String].collect().sorted
    assert(errLines === Array("X|unknown|tag", "garbage with no tag"))
    // the lenient entry point still drops them
    assert(ActivityParser.fromTagged(lines).count() == 1)
  }

  test("unified union keeps one schema across variants") {
    val u = ActivityParser.unified(
      ActivityParser.posts(Seq(postLine).toDF("value")),
      ActivityParser.comments(Seq(commentLine, replyLine).toDF("value")),
      ActivityParser.likes(Seq(likeLine).toDF("value")))
    assert(u.count() == 4)
    assert(u.columns.toSeq == ActivityParser.unifiedColumns)
    // getKey() semantics (Activity.java:75-77): post_id for everything except
    // an unresolved reply, which keys by its own id
    val keys = u.select(coalesce(col("post_id"), col("event_id")).as("key"))
      .as[Int].collect().sorted
    assert(keys === Array(101, 101, 101, 202))
  }

  test("timestamp quirks: fraction digits and Z suffixes") {
    val cases = Seq(
      "2012-02-02T02:45:14Z" -> "2012-02-02T02:45:14Z",
      "2012-02-02T02:45:14.255Z" -> "2012-02-02T02:45:14.255Z",
      "2012-02-02T02:45:14.25ZZ" -> "2012-02-02T02:45:14.250Z",
      "2012-02-02T02:45:14.2" -> "2012-02-02T02:45:14.200Z")
    val out = cases.map(_._1).toDF("s")
      .select(ActivityParser.parseTs(col("s")).as("ts"))
      .as[java.sql.Timestamp].collect()
    out.zip(cases.map(_._2)).foreach { case (got, want) =>
      assert(got.toInstant.toString == want)
    }
  }

  test("tags parse: empty and multi-element lists") {
    val out = Seq("[5183, 1912, 778]", "[]", "").toDF("s")
      .select(ActivityParser.parseTags(col("s")).as("t"))
      .collect().map(_.getAs[scala.collection.Seq[Int]](0).toSeq)
    assert(out(0) == Seq(5183, 1912, 778))
    assert(out(1) == Seq.empty)
    assert(out(2) == Seq.empty)
  }
}
