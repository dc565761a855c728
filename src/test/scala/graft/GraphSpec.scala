package graft

import org.apache.spark.sql.functions._
import graft.queries.Graph

/** Pointer-doubling resolution (SURVEY.md §2.3 ST1 / §2.5 J5): must resolve
  * arbitrary-depth chains in logarithmic rounds, mirroring the reference's
  * memoized-shortcut resolution (PostIdResolver.java:216-224). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("resolves a deep chain (depth 100)") {
    // 0 <- 1 <- 2 <- ... <- 100
    val edges = (0L to 100L)
      .map(i => (i, if (i == 0) None else Some(i - 1)))
      .toDF("event_id", "parent_id")
    val roots = Graph.resolveRoots(edges)
    assert(roots.count() == 101)
    assert(roots.filter(col("root_id") =!= 0L).count() == 0)
  }

  test("resolves a forest of disjoint chains and stars") {
    // chain 10<-11<-12, star 20<-{21,22,23}, singleton 30
    val edges = Seq(
      (10L, None), (11L, Some(10L)), (12L, Some(11L)),
      (20L, None), (21L, Some(20L)), (22L, Some(20L)), (23L, Some(20L)),
      (30L, None)).toDF("event_id", "parent_id")
    val roots = Graph.resolveRoots(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(roots == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L, 30L -> 30L))
  }

  test("timestamp repair propagates down a deep chain (depth 6)") {
    // root at t=1000; every child also stamped 1000 ⇒ each level must be
    // pushed past its REPAIRED parent, compounding: the reference's
    // recursiveFix semantics, beyond the oracle's depth-2 closed form.
    val nodes = (0L to 6L)
      .map(i => (i, if (i == 0) None else Some(i - 1), 1000L))
      .toDF("event_id", "parent_id", "sec")
    val fixed = Graph.repairTimestamps(nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // expected: sequential fold of (parent>sec → 2*parent−sec; ==sec → +20)
    var parent = 1000L
    val expected = (1L to 6L).map { i =>
      val sec = 1000L
      parent = if (parent > sec) 2 * parent - sec
               else if (parent == sec) sec + 20 else sec
      i -> parent
    }.toMap
    assert(fixed == expected)
    assert(fixed(6L) == 1000L + 20 * 32) // doubling cascade reached the leaf
  }

  test("k-core H-index fixpoint recovers known core numbers") {
    // 5-clique (core 4) with a pendant path 5-6-7 (core 1), plus a
    // disjoint triangle (core 2) — mixed densities converging at
    // different rounds
    val und = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (2L, 3L), (2L, 4L), (2L, 5L),
      (3L, 4L), (3L, 5L), (4L, 5L),
      (5L, 6L), (6L, 7L),
      (10L, 11L), (11L, 12L), (10L, 12L))
    val ed = und.toDF("u", "v")
    val sym = ed.unionAll(ed.select(col("v").as("u"), col("u").as("v")))
    val cores = Graph.kcoreOf(sym)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cores == Map(1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 4L, 5L -> 4L,
      6L -> 1L, 7L -> 1L, 10L -> 2L, 11L -> 2L, 12L -> 2L))
  }

  test("star contraction finds chain components in logarithmic alternations") {
    // a 64-node chain (diameter 63) — label propagation would need 63
    // rounds; two-phase star contraction must stay logarithmic. Plus a
    // disjoint triangle to prove components don't merge.
    val chain = (0L until 63L).map(i => (i, i + 1))
    val tri = Seq((100L, 101L), (101L, 102L), (100L, 102L))
    val pairs = (chain ++ tri).toDF("u", "v")
    val (labels, rounds) = graft.queries.Dedup.starComponents(pairs)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 67)
    (0L to 63L).foreach(i => assert(got(i) == 0L, s"node $i"))
    Seq(100L, 101L, 102L).foreach(i => assert(got(i) == 100L, s"node $i"))
    assert(rounds <= 8, s"expected O(log n) alternations, took $rounds")
  }

  test("star contraction equals naive reachability on random graphs") {
    // randomized cross-check on arbitrary topologies (seeded — the suite
    // stays deterministic): components from starComponents must equal a
    // plain in-memory union-find on the same edges
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val n = 20 + trial * 10
      val edges = (1 to n * 2).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }.distinct
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct.map { v =>
        val root = find(v.toInt)
        val minOfComp = (0 until n)
          .filter(u => find(u) == root)
          .filter(u => edges.exists(e => e._1 == u || e._2 == u)).min.toLong
        v -> minOfComp
      }.toMap
      val got = graft.queries.Dedup.starComponents(edges.toDF("u", "v"))._1
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial (n=$n, ${edges.size} edges)")
    }
  }

  test("star contraction equals label propagation on the dup pair graph") {
    val dir = "/root/testdata/sf0.001"
    val a = graft.queries.Dedup.d8_dup_clusters(spark, dir)
      .collect().map(_.toSeq).toSet
    val b = graft.queries.Dedup.d9_dup_clusters_star(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("k-core H-index aggregation form equals in-memory peeling on random graphs") {
    // r16 rewrote hIndex from a row_number window (per-node sort of the
    // E-sized join output) to a partial-aggregable (u, nc) count + the
    // h = max over distinct w of min(w, cum(w)) identity — this pins the
    // identity against an exact in-memory peeling on arbitrary topologies
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      val n = 15 + trial * 10
      val und = (1 to n * 3)
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
      und.foreach { case (a, b) =>
        adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
        adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
      }
      val deg = scala.collection.mutable.Map(adj.toSeq.map { case (k, v) => k -> v.size }: _*)
      val core = scala.collection.mutable.Map.empty[Long, Long]
      val alive = scala.collection.mutable.Set(adj.keys.toSeq: _*)
      var k = 0
      while (alive.nonEmpty) {
        val peel = alive.filter(v => deg(v) <= k).toSeq
        if (peel.isEmpty) k += 1
        else peel.foreach { v =>
          core(v) = k.toLong; alive -= v
          adj(v).foreach(u => if (alive(u)) deg(u) = deg(u) - 1)
        }
      }
      val ed = und.toDF("u", "v")
      val sym = ed.unionAll(ed.select(col("v").as("u"), col("u").as("v")))
      val got = Graph.kcoreOf(sym)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == core.toMap, s"trial $trial (n=$n, ${und.size} edges)")
    }
  }

  test("fails loudly on an unresolvable (cyclic) relation") {
    val edges = Seq((1L, Some(2L)), (2L, Some(1L))).toDF("event_id", "parent_id")
    intercept[Exception] { Graph.resolveRoots(edges, maxIters = 4).count() }
  }
}
