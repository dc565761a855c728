package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property pin for c19's boundary-sweep fold on RANDOMIZED deltas
  * (r14 verdict #3): the existing pins cover the real tables (one delta
  * shape) and decileBounds on degenerate grids; this spec closes the
  * input-shape gap by running 50+ seeded-random increments through
  * [[graft.queries.Pipeline.c19Fold]] — the exact code path
  * c19_curriculum_delta ships — and comparing against a BRUTE-FORCE
  * recompute (plain sort-and-divide staging in local Scala, independent
  * of curriculumOver's two-level decomposition), plus the directed edge
  * shapes the verdict names: empty deltas, all-retire deltas, and deltas
  * that create/destroy decile boundaries (universe size crossing 10).
  * Scores draw from a 21-point grid so si-ties — the regime where
  * boundary ranks split tie groups — are dense in every case. */
class C19FoldPropertySpec extends SparkSpec {
  import spark.implicits._
  private val P = graft.queries.Pipeline

  /** One randomized increment: a settled universe, adds (fresh ids),
    * and a retire subset of the settled ids. */
  private case class Case(base: Seq[(Long, Long, Double)],
                          adds: Seq[(Long, Long, Double)],
                          retires: Set[Long])

  private val tokGen = Gen.chooseNum(1, 20).map(_.toLong)
  private val scoreGen = Gen.chooseNum(0, 20).map(_ / 20.0) // dense ties
  private def universeGen(ids: Seq[Long], n: Int): Gen[Seq[(Long, Long, Double)]] =
    for {
      picked <- Gen.pick(n, ids)
      toks <- Gen.listOfN(n, tokGen)
      scores <- Gen.listOfN(n, scoreGen)
    } yield picked.toSeq.sorted.lazyZip(toks).lazyZip(scores).map((a, b, c) => (a, b, c))

  private val caseGen: Gen[Case] = for {
    n0 <- Gen.chooseNum(0, 28)
    base <- universeGen(1L to 60L, n0)
    nAdd <- Gen.chooseNum(0, 12)
    adds <- universeGen(61L to 120L, nAdd)
    retireDice <- Gen.listOfN(n0, Gen.chooseNum(0, 3))
  } yield Case(base, adds,
    base.map(_._1).zip(retireDice).collect { case (id, 0) => id }.toSet)

  /** Brute-force stage map: global (si, doc_id) sort, rank, decile
    * divide — the one-window oracle spelling in plain Scala. */
  private def bruteStages(u: Seq[(Long, Long, Double)]): Map[Long, Long] = {
    val n = u.size
    if (n == 0) Map.empty
    else u.map { case (id, _, sc) => (id, math.floor(sc * 1e6 + 0.5).toLong) }
      .sortBy { case (id, si) => (si, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i.toLong * 10L) / n }.toMap
  }

  /** Run one case through the shipped fold and compare with the
    * brute-force full-recompute diff. */
  private def check(c: Case, label: String): Unit = {
    val u0 = c.base
    val u1 = c.base.filterNot(d => c.retires(d._1)) ++ c.adds
    // fold inputs, staged exactly as c19Settled/c19CurriculumDeltaFrom do
    val siOf = (sc: Double) => math.floor(sc * 1e6 + 0.5).toLong
    val cur0 = P.curriculumOver(u0.toDF("doc_id", "n_tokens", "score"))
      .withColumn("si", floor(col("score") * 1000000.0 + 0.5).cast("long"))
      .localCheckpoint()
    val hist0 = cur0.groupBy(col("si")).agg(count(lit(1)).as("c"))
    val b0 = P.decileBounds(hist0)
    val enters = c.adds.map(d => (d._1, d._2, d._3, siOf(d._3)))
      .toDF("doc_id", "n_tokens", "score", "si")
    val leaves = cur0.join(c.retires.toSeq.toDF("doc_id"), Seq("doc_id"))
      .select(col("doc_id"), col("stage").as("stage_prev"), col("n_tokens"),
              col("score"), col("si"))
    val got = P.c19Fold(cur0, hist0, b0, enters, leaves).collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    // brute-force expected ledger
    val s0 = bruteStages(u0)
    val s1 = bruteStages(u1)
    val expected =
      (s1.keySet -- s0.keySet).map(id => id -> ("enter", -1L, s1(id))) ++
      (s0.keySet -- s1.keySet).map(id => id -> ("leave", s0(id), -1L)) ++
      (s0.keySet & s1.keySet).collect {
        case id if s0(id) != s1(id) => id -> ("move", s0(id), s1(id))
      }
    assert(got === expected.toMap,
      s"$label: fold ledger diverges from brute-force recompute\n" +
      s"base=${u0}\nadds=${c.adds}\nretires=${c.retires}\n" +
      s"got=${got.toSeq.sortBy(_._1)}\nexp=${expected.toSeq.sortBy(_._1)}")
  }

  test("c19 fold = brute-force recompute on 50 seeded-random increments") {
    val params = Gen.Parameters.default
    var ran = 0
    var i = 0
    while (ran < 50 && i < 120) { // skip the rare empty sample draw
      caseGen.apply(params, Seed(i.toLong)).foreach { c =>
        check(c, s"seed=$i"); ran += 1
      }
      i += 1
    }
    assert(ran == 50, s"only $ran/50 samples generated after $i seeds")
  }

  test("c19 fold: directed edge shapes (empty delta, all-retire, n crossing 10)") {
    def mk(ids: Seq[Long], sc: Seq[Double]): Seq[(Long, Long, Double)] =
      ids.zip(sc).map { case (id, s) => (id, 1L + id % 7L, s) }
    val base12 = mk(1L to 12L, Seq(0.1, 0.1, 0.2, 0.2, 0.3, 0.3, 0.4,
                                   0.4, 0.5, 0.5, 0.6, 0.6))
    // empty delta: identical boundaries sweep nothing — ledger empty
    check(Case(base12, Nil, Set.empty), "empty-delta")
    // all-retire: every settled doc leaves; destroys all boundaries
    check(Case(base12, Nil, base12.map(_._1).toSet), "all-retire")
    // boundary creation: 9 docs (no clearable boundary) grows past 10
    val base9 = mk(1L to 9L, Seq(0.1, 0.2, 0.2, 0.3, 0.4, 0.4, 0.5, 0.6, 0.7))
    check(Case(base9, mk(61L to 66L, Seq(0.15, 0.35, 0.55, 0.2, 0.2, 0.9)),
               Set.empty), "n-crossing-up")
    // boundary destruction: 12 docs shrinks to 5
    check(Case(base12, Nil, (1L to 7L).toSet), "n-crossing-down")
    // simultaneous add+retire with heavy ties at every boundary
    check(Case(base12, mk(61L to 64L, Seq(0.2, 0.2, 0.2, 0.2)),
               Set(2L, 5L, 9L)), "tie-storm")
  }
}
