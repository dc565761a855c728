package graft

import org.scalacheck.Gen
import graft.sources.ActivityParser

/** Round-trip property (SURVEY.md §5: scalacheck parser round-trip):
  * generated activity records → wire-format lines → parser → fields match.
  * Generators stay within the documented wire alphabet (pipe-delimited,
  * content free of '|'). */
class ParserRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private val idGen = Gen.chooseNum(0, 1000000)
  private val wordGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val contentGen = Gen.listOf(wordGen).map(_.mkString(" "))
  private val tsGen = for {
    d <- Gen.chooseNum(1, 28); h <- Gen.chooseNum(0, 23)
    m <- Gen.chooseNum(0, 59); sec <- Gen.chooseNum(0, 59)
  } yield f"2012-02-$d%02dT$h%02d:$m%02d:$sec%02dZ"

  case class P(id: Int, person: Int, ts: String, content: String, tags: List[Int])
  private val postGen = for {
    id <- idGen; person <- idGen; ts <- tsGen; content <- contentGen
    tags <- Gen.listOf(Gen.chooseNum(0, 9999))
  } yield P(id, person, ts, content, tags)

  test("post lines round-trip through the parser (property)") {
    val posts = Gen.listOfN(100, postGen).sample.get
    val lines = posts.map(p =>
      s"${p.id}|${p.person}|${p.ts}|img.jpg|1.2.3.4|B|en|${p.content}|" +
        s"${p.tags.mkString("[", ", ", "]")}|7|8")
    val parsed = ActivityParser.posts(lines.toDF("value"))
      .selectExpr("event_id", "person_id",
        "date_format(creation_ts, \"yyyy-MM-dd'T'HH:mm:ss'Z'\") AS ts",
        "content", "tags")
      .collect()
    parsed.zip(posts).foreach { case (row, p) =>
      assert(row.getInt(0) == p.id)
      assert(row.getInt(1) == p.person)
      assert(row.getString(2) == p.ts)
      assert(row.getString(3) == p.content)
      assert(row.getAs[scala.collection.Seq[Int]]("tags").toList == p.tags)
    }
  }

  test("comment/reply discrimination round-trips (property)") {
    val gen = for {
      id <- idGen; person <- idGen; ts <- tsGen
      parent <- idGen; isReply <- Gen.oneOf(true, false)
    } yield (id, person, ts, parent, isReply)
    val cases = Gen.listOfN(100, gen).sample.get
    val lines = cases.map { case (id, person, ts, parent, isReply) =>
      val (postF, commF) = if (isReply) ("", parent.toString) else (parent.toString, "")
      s"$id|$person|$ts|1.2.3.4|B|text|$postF|$commF|9"
    }
    val parsed = ActivityParser.comments(lines.toDF("value"))
      .selectExpr("type", "event_id", "post_id", "parent_id").collect()
    parsed.zip(cases).foreach { case (row, (id, _, _, parent, isReply)) =>
      assert(row.getInt(1) == id)
      if (isReply) {
        assert(row.getString(0) == "reply")
        assert(row.isNullAt(2) && row.getInt(3) == parent)
      } else {
        assert(row.getString(0) == "comment")
        assert(row.getInt(2) == parent && row.isNullAt(3))
      }
    }
  }
}
