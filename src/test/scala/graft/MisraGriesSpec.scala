package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGriesAgg

/** Pins the Misra-Gries guarantee `t17_heavy_hitters` is built on: the
  * candidate set NEVER misses an item with true frequency > N/(k+1), for
  * arbitrary skewed streams and ARBITRARY partitionings (the merge path is
  * what a multi-executor aggregation exercises — Agarwal et al.'s
  * mergeable-summaries rule must hold across any split of the input). */
class MisraGriesSpec extends AnyFunSuite {

  // skewed vocabulary: few hot tokens over a long uniform tail
  private val streamGen: Gen[List[String]] = for {
    nHot  <- Gen.chooseNum(1, 4)
    hotW  <- Gen.chooseNum(5, 40) // each hot token repeated this often per block
    n     <- Gen.chooseNum(50, 400)
    toks  <- Gen.listOfN(n, Gen.frequency(
      (hotW, Gen.chooseNum(0, nHot - 1).map(i => s"hot$i")),
      (10, Gen.chooseNum(0, 500).map(i => s"cold$i"))))
  } yield toks

  private def sketchOf(agg: MisraGriesAgg, toks: Seq[String],
                       cuts: Seq[Int]): Map[String, Long] = {
    // split at the given points and reduce each chunk independently, then
    // merge in order — simulates per-partition partials + shuffle merge
    val parts = cuts.distinct.sorted.foldLeft(List(toks)) { (acc, c) =>
      val (before, after) = acc.last.splitAt(math.min(c, acc.last.size))
      acc.init ++ List(before, after)
    }
    parts.map(_.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge)
  }

  test("candidates always superset the true heavy hitters, any partitioning") {
    val seeds = org.scalacheck.rng.Seed(42L)
    var seed = seeds
    (1 to 200).foreach { _ =>
      val toks = streamGen.pureApply(Gen.Parameters.default, seed)
      val (r1, s1) = seed.next.long
      val (r2, s2) = s1.long
      seed = s2
      val k = 1 + (math.abs(r1) % 8).toInt
      val nCuts = (math.abs(r2) % 4).toInt
      val cuts = (1 to nCuts).map(i => (toks.size * i) / (nCuts + 1))
      val agg = new MisraGriesAgg(k)
      val cands = sketchOf(agg, toks, cuts).keySet
      val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = toks.size.toLong
      val mustKeep = exact.collect {
        case (w, c) if c * (k + 1) > n => w
      }.toSet
      assert(mustKeep.subsetOf(cands),
        s"missed heavy hitters ${mustKeep -- cands} (k=$k, n=$n, cuts=$cuts)")
      assert(cands.size <= k, s"sketch exceeded capacity: ${cands.size} > $k")
    }
  }

  test("single-chunk sketch is exact when vocabulary fits in k") {
    val toks = List("a", "b", "a", "c", "a", "b")
    val agg = new MisraGriesAgg(8)
    val m = toks.foldLeft(agg.zero)(agg.reduce)
    assert(m == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }
}
