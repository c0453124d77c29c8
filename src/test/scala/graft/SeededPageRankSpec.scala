package graft

import graft.ops.RelationalOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Rank-identity for the seeded ranking algorithms: the Spark iterative-join
  * form must reproduce, to FP tolerance, an independent array transcription
  * of the reference loop (RankingAlgorithm.pageRank:141-160 with
  * StandardPageRank:13-49 / ReversePageRank:14-42 plugged in). */
class SeededPageRankSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-seeded-pagerank")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Deterministic multiplicative-congruential edge list: ~3 out-edges per
    * node over n nodes, self-loops and duplicates included on purpose (the
    * operator must drop/dedup them). */
  private def edgeList(n: Int): Seq[(Long, Long)] =
    (0 until n).flatMap { s =>
      (1 to 3).map { j =>
        val d = (s * 2654435761L + j * 40503L) % n
        (s.toLong, math.abs(d))
      }
    } ++ Seq((0L, 0L), (1L, 2L), (1L, 2L))

  /** Array transcription of the reference loop. Nodes are 0..n-1. */
  private def simulate(n: Int, edges: Set[(Long, Long)], origins: Seq[Long],
                       iters: Int, reverse: Boolean): Array[Double] = {
    val out = Array.fill(n)(List.empty[Int]) // src → dsts
    val in  = Array.fill(n)(List.empty[Int]) // dst → srcs
    for ((s, d) <- edges if s != d) {
      out(s.toInt) ::= d.toInt
      in(d.toInt) ::= s.toInt
    }
    val resolvedK = origins.count(o => out(o.toInt).nonEmpty || in(o.toInt).nonEmpty)
    var rank = Array.fill(n)(1.0 / n)
    for (i <- 1 to iters) {
      val next = new Array[Double](n)
      if (reverse) {
        val norm = rank.map(math.abs).sum
        for (d <- 0 until n) {
          var v = 0.0
          for (j <- out(d)) v += rank(j) / in(j).size
          next(d) = 0.85 * v / norm
        }
      } else {
        for (d <- 0 until n) {
          var v = 0.0
          for (s <- in(d)) v += rank(s) / out(s).size
          next(d) = 0.85 * v
        }
      }
      if (i < iters && resolvedK > 0) {
        val tp = (if (reverse) 1.0 else 0.15) / resolvedK
        origins.foreach(o => next(o.toInt) += tp)
      }
      rank = next
    }
    rank
  }

  private def runBoth(n: Int, origins: Seq[Long], iters: Int, reverse: Boolean): Unit = {
    import spark.implicits._
    val raw = edgeList(n)
    val df = RelationalOps.seededPageRank(raw.toDF("src", "dst"), origins, iters, reverse)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sim = simulate(n, raw.filter(e => e._1 != e._2).toSet, origins, iters, reverse)
    // every node participates in some edge under this generator
    assert(df.size === n)
    for (id <- 0 until n)
      assert(math.abs(df(id.toLong) - sim(id)) < 1e-12,
        s"node $id: spark=${df(id.toLong)} sim=${sim(id)} reverse=$reverse")
  }

  test("standard seeded PageRank matches the reference loop (10 iters)") {
    runBoth(30, Seq(3L, 7L), 10, reverse = false)
  }

  test("reverse PageRank matches the reference loop (10 iters)") {
    runBoth(30, Seq(3L, 7L), 10, reverse = true)
  }

  test("no resolvable origins ⇒ no teleport (mass decays)") {
    import spark.implicits._
    val df = RelationalOps.seededPageRank(
      edgeList(20).toDF("src", "dst"), Seq(999L), 5, reverse = false)
    val total = df.collect().map(_.getDouble(1)).sum
    assert(total < 0.85, s"teleport-free mass must decay below 0.85^1, got $total")
  }

  test("standard teleport concentrates mass on the origin's successors") {
    import spark.implicits._
    // The reference loop skips the teleport on the FINAL iteration
    // (RankingAlgorithm.java:152-154), so the origin's own rank collapses to
    // its organic in-link mass; the teleport mass it held all run shows up
    // one hop downstream. Node 5's generator out-neighbors are {8, 11, 14}.
    val ranks = RelationalOps.seededPageRank(
      edgeList(30).toDF("src", "dst"), Seq(5L), 20, reverse = false)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val top3 = ranks.toSeq.sortBy(-_._2).take(3).map(_._1).toSet
    assert(top3 === Set(8L, 11L, 14L),
      s"origin successors must dominate, top3=$top3")
  }

  test("rankingSearchSet: peripheral append at rank 0 + top-max truncation") {
    import spark.implicits._
    val edges = edgeList(20).toDF("src", "dst")
    // ids 20..25 exist ONLY as peripherals (outside the 20-node graph);
    // 0..19 overlap the core and must be anti-joined away, not duplicated.
    val periph = (0L to 25L).toDF("id")
    val set = RelationalOps.rankingSearchSet(edges, Seq(3L), 5, max = 23, peripheral = periph)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(set.length === 23)
    assert(set.map(_._1).distinct.length === 23, "no duplicate ids in the set")
    // expected = core seeded ranks (rounded as the operator rounds) plus the
    // peripheral-only ids at exactly 0, ordered by (rank desc, id), top 23
    val core = RelationalOps.seededPageRank(edges, Seq(3L), 5)
      .collect().map(r => r.getLong(0) -> math.rint(r.getDouble(1) * 1e8) / 1e8).toMap
    val expected = (core.toSeq ++ (20L to 25L).map(_ -> 0.0))
      .sortBy { case (id, r) => (-r, id) }.take(23).toList
    assert(set === expected)
  }

  test("search-set top-max is a TakeOrderedAndProject, not a global sort") {
    import spark.implicits._
    val plan = RelationalOps.rankingSearchSet(
      edgeList(20).toDF("src", "dst"), Seq(3L), 2, max = 10,
      peripheral = (0L to 25L).toDF("id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not TakeOrdered:\n$plan")
  }

  test("eligibility gate applies AFTER the top-max cut (slots are consumed)") {
    import spark.implicits._
    val edges = edgeList(20).toDF("src", "dst")
    val periph = (0L to 25L).toDF("id")
    val evens = (0L to 25L).filter(_ % 2 == 0).toDF("id")
    val gated = RelationalOps.rankingSearchSet(edges, Seq(3L), 5, max = 10,
      peripheral = periph, eligible = Some(evens))
      .collect().map(_.getLong(0)).toSet
    val ungated = RelationalOps.rankingSearchSet(edges, Seq(3L), 5, max = 10,
      peripheral = periph)
      .collect().map(_.getLong(0)).toSet
    // the gated set is exactly the even members of the ungated top-10 —
    // NOT the top-10 of the even-only ranking (no backfill)
    assert(gated === ungated.filter(_ % 2 == 0))
    assert(gated.size < 10, "odd ids must consume slots without appearing")
  }

  test("explicit node universe ranks linkless domains (ADVICE r3)") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L, 99L).toDF("id") // 99 has no links at all
    // default (edge-derived): the isolated node is absent
    val noNodes = RelationalOps.seededPageRank(edges, Seq(0L), 4)
      .collect().map(_.getLong(0)).toSet
    assert(!noNodes.contains(99L))
    // explicit universe: the linkless node is present and counted in n —
    // the cycle nodes' rank is 0.85^4/4, not 0.85^4/3. (A linkless origin
    // still ends at 0.0: the reference skips the teleport adjustment after
    // the FINAL iteration, and nothing links to it — same here.)
    val withNodes = RelationalOps.seededPageRank(edges, Seq(99L), 4, nodes0 = nodes)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(withNodes.contains(99L))
    assert(math.abs(withNodes(0L) - math.pow(0.85, 4) / 4) < 1e-12,
      s"n must count the linkless node: $withNodes")
  }

  test("reverse PageRank rewards nodes that link TO the origin") {
    import spark.implicits._
    // star: leaves 1..28 link to hub 0; chain 29→40→41 never reaches the hub
    // (40/41 sit outside the leaf id range so they share no hub edge).
    val edges = (1L to 28L).map(s => (s, 0L)) ++ Seq((29L, 40L), (40L, 41L))
    val ranks = RelationalOps.seededPageRank(
      edges.toDF("src", "dst"), Seq(0L), 10, reverse = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // every leaf linking to the seeded hub outranks the off-hub chain
    assert(ranks(1L) > ranks(29L) && ranks(1L) > ranks(40L) && ranks(41L) === 0.0)
  }

  test("HITS: one hand-computed iteration, and mutual reinforcement at depth") {
    import spark.implicits._
    // 1→2, 3→2, 2→4: after the first auth step a={2:2/3, 4:1/3}; the hub
    // step then gives h={1:0.4, 3:0.4, 2:0.2, 4:0} (L1-normalized).
    val edges = Seq((1L, 2L), (3L, 2L), (2L, 4L)).toDF("src", "dst")
    val one = RelationalOps.hitsEdges(edges, 1).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(one(2L) === ((0.2, 0.666667)))
    assert(one(4L) === ((0.0, 0.333333)))
    assert(one(1L) === ((0.4, 0.0)) && one(3L) === ((0.4, 0.0)))

    // mutual reinforcement: two disjoint bipartite blocks, the bigger block's
    // hubs AND authorities dominate after a few iterations
    val big = for (s <- 10L to 14L; d <- 20L to 24L) yield (s, d)
    val small = Seq((30L, 40L), (31L, 40L))
    val deep = RelationalOps.hitsEdges((big ++ small).toDF("src", "dst"), 5)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(deep(10L)._1 > deep(30L)._1, s"big-block hub must dominate: $deep")
    assert(deep(20L)._2 > deep(40L)._2, s"big-block auth must dominate: $deep")
    // duplicate edges and self-loops must not perturb the result
    val noisy = RelationalOps.hitsEdges(
      (big ++ small ++ Seq((10L, 20L), (10L, 10L))).toDF("src", "dst"), 5)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(noisy === deep)
  }
}
