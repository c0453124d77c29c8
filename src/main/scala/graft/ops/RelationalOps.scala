package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational operators from the SURVEY §2 inventory that live naturally at
  * the DataFrame level: the iterative PageRank join (J6), bit-packed metadata
  * filters (F7), and the window-shaped aggregations (A2/A8).
  */
object RelationalOps {

  /** J6: PageRank over a derived edge list, fixed iteration count
    * (RankingAlgorithm.java:141-188 runs 100 fixed iterations; the operator
    * shape — iterative rank⋈edges with per-iteration renormalization — is
    * what matters, iteration count is a parameter).
    *
    * Edges are derived deterministically from `events`:
    * src = user_id mod `mod`, dst = |⌊value·7⌋| mod `mod`.
    *
    * Scale: edges/deg are computed once and reused across iterations; each
    * iteration is one shuffle on `id`. At 100 TB the edge list would be
    * bucketed by src so iterations co-partition for free.
    */
  def pageRank(events: DataFrame, mod: Int, iters: Int): DataFrame =
    pageRankEdges(events.select(
        (col("user_id") % mod).as("src"),
        (abs(floor(col("value") * 7).cast("long")) % mod).as("dst")), iters)
      .select(col("id"), round(col("r"), 8).as("rank")).orderBy("id")

  /** Partition sizing for ITERATIVE loops over a cached/checkpointed small
    * table: per-stage cost at high core counts is dominated by MAP task
    * launch, and an iterative op schedules dozens of stages — measured
    * 3.3 s → 1.0 s warm for 3-iteration seeded PR over a 51k-row edge list
    * at local[32] when 32 partitions coalesce to 1. ~500k rows per
    * partition keeps genuinely big graphs as wide as the data warrants
    * (10⁹ edges → 2000 partitions); `rows` must come from an already-run
    * action so this adds no extra job beyond a cheap cached count. Results
    * are unchanged up to float summation order, which every consumer
    * rounds away (round-8 oracles). */
  private[ops] def sizeForLoop(df: DataFrame, rows: Long): DataFrame = {
    val want = math.max(1L, (rows + 499999L) / 500000L).toInt
    if (want < df.rdd.getNumPartitions) df.coalesce(want) else df
  }

  /** PageRank over an arbitrary (src, dst) edge list (self-loops dropped,
    * edges deduped); returns (id, r) with raw double ranks. */
  def pageRankEdges(edges0: DataFrame, iters: Int): DataFrame = {
    val edgesW = edges0.where(col("src") =!= col("dst")).distinct().cache()
    val nodesW = edgesW.select(col("src").as("id"))
      .union(edgesW.select(col("dst").as("id"))).distinct().cache()
    val n = nodesW.count()
    val edges = sizeForLoop(edgesW, edgesW.count())
    val nodes = sizeForLoop(nodesW, n)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    var ranks = nodes.withColumn("r", expr(s"CAST(1.0 AS DOUBLE) / $n"))
    for (i <- 1 to iters) {
      val contribs = edges.join(deg, "src")
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("r / d").as("c"))
      ranks = nodes.join(contribs.groupBy("id").agg(sum("c").as("cs")), Seq("id"), "left")
        .select(col("id"), expr(
          s"CAST(0.15 AS DOUBLE) / $n + CAST(0.85 AS DOUBLE) * coalesce(cs, CAST(0 AS DOUBLE))").as("r"))
      // cut the otherwise-unbounded plan lineage — at the reference's 100
      // iterations (RankingAlgorithm.java:141-188) an unchecked chain of 100
      // joins overwhelms the optimizer and the task-serialization path
      if (i % 8 == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    // materialize the (one-row-per-node) result, then release the inputs —
    // repeated invocations in a long-lived session must not accumulate
    // storage until a global clearCache() (ADVICE r3)
    val out = ranks.localCheckpoint()
    edgesW.unpersist()
    nodesW.unpersist()
    out
  }

  /** J6b/J6c: the reference's two SEEDED ranking algorithms
    * (StandardPageRank.java:13-49, ReversePageRank.java:14-42, shared loop
    * RankingAlgorithm.pageRank:141-160). Differences from [[pageRankEdges]]'s
    * textbook uniform-teleport form, all transcribed exactly:
    *
    *   - rank₀ = 1/n everywhere; the loop runs `iters` times and the
    *     teleport adjustment is applied after every iteration EXCEPT the
    *     last (`if (i < iter_max-1) adjustRankVector`, :152-154).
    *   - standard (`reverse=false`): new(d) = 0.85·Σ_{s→d} rank(s)/outdeg(s),
    *     then origins += 0.15/k (StandardPageRank.adjustRankVector:46-48).
    *     Teleport mass goes ONLY to the origin set — non-origin dangling
    *     mass evaporates, exactly as in the reference.
    *   - reverse (`reverse=true`): rank flows AGAINST the edges —
    *     new(d) = 0.85·(Σ_{d→j} rank(j)/indeg(j)) / ‖rank‖₁, then origins
    *     += 1.0/k (ReversePageRank:17-40; note the 1.0, not 0.15, and the
    *     per-iteration L1 normalization). Used by the reference to find
    *     hubs that LINK TO a seed set ("academia"-style rankings).
    *   - k = |origins ∩ nodes| (RankingAlgorithm.java:75-85 only keeps
    *     resolvable origins); if none resolve there is no teleport at all.
    *   - parallel edges: our edge list is deduped (the reference reads
    *     distinct DB link rows); self-loops dropped (:55).
    *
    * Scale: identical shape to [[pageRankEdges]] — edges/degrees computed
    * once, one shuffle per iteration, lineage cut every 8 iterations. The
    * reverse variant's ‖rank‖₁ is a one-row aggregate broadcast back into
    * the plan (no per-iteration driver action).
    */
  def seededPageRank(edges0: DataFrame, origins: Seq[Any], iters: Int,
                     reverse: Boolean = false,
                     /** Node universe. Default (null) derives it from edge
                       * endpoints — a documented divergence: the reference
                       * ranks LINKLESS domains too (n counts them, a
                       * linkless origin still receives teleport mass,
                       * RankingAlgorithm.java:75-105). Pass the full domain
                       * table (one id column) for reference parity. */
                     nodes0: DataFrame = null): DataFrame = {
    val edgesW = edges0.where(col("src") =!= col("dst")).distinct().cache()
    val nodesW = (if (nodes0 != null)
      nodes0.select(col(nodes0.columns.head).as("id")).distinct()
    else edgesW.select(col("src").as("id"))
      .union(edgesW.select(col("dst").as("id"))).distinct()).cache()
    // one driver action for both scalars (n, resolvable-origin count k) —
    // it also populates the edges/nodes caches before the iteration loop
    val nk = nodesW.agg(
      count(lit(1)).as("n"),
      count(when(col("id").isin(origins: _*), lit(1))).as("k")).head()
    val n = nk.getLong(0)
    val k = nk.getLong(1)
    val edges = sizeForLoop(edgesW, edgesW.count())
    val nodes = sizeForLoop(nodesW, n)
    // degree of the rank-GIVING side: out-degree for standard, in-degree
    // for reverse (ReversePageRank divides by |Dest2Src[j]|, :28-29)
    val deg =
      if (reverse) edges.groupBy("dst").agg(count(lit(1)).as("d"))
      else edges.groupBy("src").agg(count(lit(1)).as("d"))
    val teleport = if (reverse) 1.0 else 0.15
    var ranks = nodes.withColumn("r", expr(s"CAST(1.0 AS DOUBLE) / $n"))
    for (i <- 1 to iters) {
      val contribs =
        if (reverse)
          edges.join(deg, "dst")
            .join(ranks.withColumnRenamed("id", "dst"), "dst")
            .select(col("src").as("id"), expr("r / d").as("c"))
        else
          edges.join(deg, "src")
            .join(ranks.withColumnRenamed("id", "src"), "src")
            .select(col("dst").as("id"), expr("r / d").as("c"))
      val summed = nodes.join(contribs.groupBy("id").agg(sum("c").as("cs")), Seq("id"), "left")
      val base =
        if (reverse) {
          val norm = ranks.agg(sum(abs(col("r"))).as("norm"))
          summed.crossJoin(broadcast(norm))
            .select(col("id"), expr(
              "CAST(0.85 AS DOUBLE) * coalesce(cs, CAST(0 AS DOUBLE)) / norm").as("r"))
        } else summed.select(col("id"), expr(
          "CAST(0.85 AS DOUBLE) * coalesce(cs, CAST(0 AS DOUBLE))").as("r"))
      ranks =
        if (i < iters && k > 0)
          base.select(col("id"), (col("r") + when(col("id").isin(origins: _*),
            lit(teleport / k)).otherwise(lit(0.0))).as("r"))
        else base
      // reverse mode reads `ranks` TWICE per iteration (the contrib join AND
      // the ‖rank‖₁ aggregate), so without a per-iteration cut each norm
      // re-derives the whole chain so far — the HITS lesson (see hitsEdges);
      // standard mode reads it once and a cut every 8 iterations suffices
      if ((reverse || i % 8 == 0) && i < iters) ranks = ranks.localCheckpoint()
    }
    // materialize the (one-row-per-node) result, then release the inputs —
    // repeated invocations in a long-lived session must not accumulate
    // storage until a global clearCache() (ADVICE r3)
    val out = ranks.localCheckpoint()
    edgesW.unpersist()
    nodesW.unpersist()
    out
  }

  /** J6 → index wiring: domain rank bytes from PageRank over a repo link
    * graph (src_repo, dst_repo). Ordinal percentile scaled to 0..254 (0 =
    * best; 255 stays the unknown-domain sentinel), the shape of the
    * reference's RankingAlgorithm → DomainRankings conversion
    * (RankingAlgorithm.java:141-188, DomainRankings.java:27-38). The global
    * ordinal window is a single-partition sort of ONE ROW PER DOMAIN —
    * fine to ~10^7 repos; beyond that switch to approx quantile buckets. */
  def domainRanksFromPageRank(repoLinks: DataFrame, iters: Int = 100,
                              originRepos: Seq[Any] = Nil,
                              reverse: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = repoLinks.select(col("src_repo").as("src"), col("dst_repo").as("dst"))
    val pr =
      if (originRepos.nonEmpty) seededPageRank(e, originRepos, iters, reverse)
      else pageRankEdges(e, iters)
    val w = Window.orderBy(col("r").desc, col("id"))
    pr.select(col("id").as("repo"),
      (percent_rank().over(w) * 254).cast("int").as("rank"))
  }

  /** [[seededPageRank]] over the same deterministic events-derived edge list
    * as [[pageRank]], rounded for oracle comparison. */
  def seededPageRankEvents(events: DataFrame, mod: Int, origins: Seq[Long],
                           iters: Int, reverse: Boolean): DataFrame =
    seededPageRank(events.select(
        (col("user_id") % mod).as("src"),
        (abs(floor(col("value") * 7).cast("long")) % mod).as("dst")),
        origins, iters, reverse)
      .select(col("id"), round(col("r"), 8).as("rank")).orderBy("id")

  /** S8 production composition: `pageRankWithPeripheralNodes` feeding a
    * `RankingSearchSet` (RankingAlgorithm.java:163-188,
    * IndexSearchSetsService.java:95-131, RankingSearchSet.java:23-35) — the
    * reference's RETRO / SMALLWEB / ACADEMIA query-time domain sets.
    *
    * The reference inserts "peripheral" domains (known but not in the core
    * ranking set) right before the FINAL iteration; addPeripheralNodes' link
    * filter (RankingAlgorithm.java:119-121, "This looks like a bug, but it
    * improves the results") drops every link touching a pre-existing node,
    * and RankVector.get returns 0 past the old vector's end (:228-231), so
    * that final iteration leaves core ranks untouched and every peripheral
    * node lands at rank exactly 0 — the whole mechanism REDUCES to appending
    * the peripheral ids at the bottom of the ranking. We implement exactly
    * that reduction: an anti-join append at rank 0, no extra iteration.
    *
    * The search set is the top-`max` ids by rank (RankVector.getRanking:
    * 250-268 sorts descending and truncates). The reference's quicksort
    * leaves equal ranks in arbitrary order; we break ties by id so the set
    * is deterministic. Feed the resulting ids into `QuerySpec.domains` to
    * get the reference's set-restricted query behavior.
    *
    * Scale: top-k is a TakeOrderedAndProject (per-partition heaps, no global
    * sort); the peripheral append is one anti-join on id.
    */
  /** `eligible`, when set, is the id set passing the reference's
    * `includeInRanking` (alias/special/social-media/`maxKnownUrls` tests,
    * RankingAlgorithm.java:194-205 — the SMALLWEB set runs with
    * `setMaxKnownUrls(750)`). Faithful quirk: getRanking's loop bound counts
    * EVERY node (:260-265 — `i < numResults` first, eligibility inside), so
    * ineligible nodes consume top-`max` slots and the final set comes back
    * SMALLER than `max`, not backfilled. The filter therefore applies AFTER
    * the truncation here, never before. */
  def rankingSearchSet(edges: DataFrame, origins: Seq[Any], iters: Int,
                       max: Int, peripheral: DataFrame,
                       reverse: Boolean = false,
                       eligible: Option[DataFrame] = None): DataFrame = {
    val core = seededPageRank(edges, origins, iters, reverse)
    val appended = core.unionByName(
      peripheral.select(col("id")).distinct()
        .join(core.select("id"), Seq("id"), "left_anti")
        .withColumn("r", lit(0.0)))
    val cut = appended.select(col("id"), round(col("r"), 8).as("rank"))
      .orderBy(col("rank").desc, col("id")).limit(max)
    // no broadcast hint: `cut` is ≤ max rows but a semi join can only build
    // on its right side, and `eligible` may be the whole domain table — let
    // AQE pick (it will broadcast when the predicate output is small)
    eligible.fold(cut)(e =>
      cut.join(e.select(col("id")).distinct(), Seq("id"), "left_semi"))
  }

  /** [[rankingSearchSet]] over the events-derived edge list; peripheral ids
    * are `user_id mod periphMod` (a strictly larger id universe than the
    * graph's `mod`, so some ids exist only as peripherals). */
  def rankingSearchSetEvents(events: DataFrame, mod: Int, origins: Seq[Long],
                             iters: Int, max: Int, periphMod: Int,
                             reverse: Boolean = false,
                             evenIdsOnly: Boolean = false): DataFrame =
    rankingSearchSet(
      events.select(
        (col("user_id") % mod).as("src"),
        (abs(floor(col("value") * 7).cast("long")) % mod).as("dst")),
      origins, iters, max,
      events.select((col("user_id") % periphMod).as("id")), reverse,
      // stand-in for includeInRanking's data-dependent predicate (e.g.
      // maxKnownUrls): a deterministic id-parity gate
      eligible = if (evenIdsOnly)
        Some(events.select((col("user_id") % periphMod).as("id"))
          .where(col("id") % 2 === 0))
      else None)

  /** Matching DuckDB oracle for [[rankingSearchSetEvents]]: the seeded-PR CTE
    * chain, a zero-rank peripheral append, then top-`max` by (rank desc, id).
    */
  def rankingSearchSetOracleSql(mod: Int, origins: Seq[Long], iters: Int,
                                max: Int, periphMod: Int,
                                reverse: Boolean = false,
                                evenIdsOnly: Boolean = false): String = {
    val inner = seededPrCtes(mod, origins, iters, reverse) +
      s""",
         |core AS (SELECT id, round(r, 8) AS rank FROM r$iters),
         |periph AS (SELECT DISTINCT user_id % $periphMod AS id FROM events
         |  WHERE user_id % $periphMod NOT IN (SELECT id FROM nodes))
         |SELECT id, rank FROM (
         |  SELECT id, rank FROM core
         |  UNION ALL SELECT id, CAST(0 AS DOUBLE) AS rank FROM periph)
         |ORDER BY rank DESC, id LIMIT $max""".stripMargin
    // eligibility applies OUTSIDE the LIMIT — ineligible nodes consume
    // slots. The eligible SET is the operator's semi-join side (even ids
    // drawn from the events-derived periphMod universe), not a bare parity
    // predicate: at tiny scale some residues mod periphMod never occur in
    // events, and the semi join rightly drops them where `id % 2 = 0` alone
    // would not.
    if (evenIdsOnly)
      s"""SELECT id, rank FROM (
         |$inner
         |) cut WHERE id IN (
         |  SELECT DISTINCT user_id % $periphMod FROM events
         |  WHERE user_id % $periphMod % 2 = 0)""".stripMargin
    else inner
  }

  /** Matching DuckDB oracle for [[seededPageRankEvents]] — chained CTEs, one
    * per iteration; teleport emitted only for non-final iterations, k
    * resolved against the node set exactly as the operator does. */
  def seededPageRankOracleSql(mod: Int, origins: Seq[Long], iters: Int,
                              reverse: Boolean): String =
    seededPrCtes(mod, origins, iters, reverse) +
      s"\nSELECT id, round(r, 8) AS rank FROM r$iters ORDER BY id"

  /** Shared CTE chain (`edges` … `r$iters`) for the seeded-PR oracles, over
    * the standard events-derived edge list. */
  private def seededPrCtes(mod: Int, origins: Seq[Long], iters: Int,
                           reverse: Boolean): String =
    seededPrCtesOverEdges(
      s"""SELECT DISTINCT user_id % $mod AS src, abs(CAST(floor(value * 7) AS BIGINT)) % $mod AS dst
         |  FROM events WHERE user_id % $mod <> abs(CAST(floor(value * 7) AS BIGINT)) % $mod""".stripMargin,
      origins, iters, reverse)

  /** Shared CTE chain (`edges` … `r$iters`) for the seeded-PR oracles over an
    * arbitrary (src, dst) edge query — `edgesSelect` may itself carry a
    * nested WITH; self-loop/dup hygiene is the caller's job (the operator
    * applies it internally either way). Public so compositions that rank a
    * DERIVED graph (e.g. the similarity graph) can reuse the chain. */
  def seededPrCtesOverEdges(edgesSelect: String, origins: Seq[Long],
                            iters: Int, reverse: Boolean,
                            /** Override the node universe (the reference
                              * ranks LINKLESS domains too — pass e.g. a
                              * generate_series select for parity with
                              * `seededPageRank(nodes0 = …)`). Default:
                              * edge-endpoint derived. */
                            nodesSelect: String = null): String = {
    val orig = origins.mkString(", ")
    val nodesSel =
      if (nodesSelect != null) nodesSelect
      else "SELECT DISTINCT src AS id FROM edges UNION SELECT DISTINCT dst FROM edges"
    val degCte =
      if (reverse) "deg AS (SELECT dst, count(*) AS d FROM edges GROUP BY dst)"
      else "deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src)"
    val base =
      s"""WITH edges AS MATERIALIZED ($edgesSelect),
         |nodes AS ($nodesSel),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |ok AS (SELECT count(*) AS k FROM nodes WHERE id IN ($orig)),
         |$degCte,
         |r0 AS (SELECT id, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS r FROM nodes)""".stripMargin
    val tp = if (reverse) "CAST(1.0 AS DOUBLE)" else "CAST(0.15 AS DOUBLE)"
    val steps = (1 to iters).map { i =>
      val teleport =
        if (i < iters)
          s""" + CASE WHEN n.id IN ($orig) AND (SELECT k FROM ok) > 0
             |        THEN $tp / (SELECT k FROM ok) ELSE CAST(0 AS DOUBLE) END""".stripMargin
        else ""
      if (reverse)
        s"""r$i AS (SELECT n.id, CAST(0.85 AS DOUBLE) * coalesce(sum(p.r / deg.d), CAST(0 AS DOUBLE)) / (SELECT sum(abs(r)) FROM r${i - 1})$teleport AS r
           |  FROM nodes n
           |  LEFT JOIN edges e ON e.src = n.id
           |  LEFT JOIN deg ON deg.dst = e.dst
           |  LEFT JOIN r${i - 1} p ON p.id = e.dst
           |  GROUP BY n.id)""".stripMargin
      else
        s"""r$i AS (SELECT n.id, CAST(0.85 AS DOUBLE) * coalesce(sum(p.r / deg.d), CAST(0 AS DOUBLE))$teleport AS r
           |  FROM nodes n
           |  LEFT JOIN edges e ON e.dst = n.id
           |  LEFT JOIN deg ON deg.src = e.src
           |  LEFT JOIN r${i - 1} p ON p.id = e.src
           |  GROUP BY n.id)""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }

  /** The [[pageRank]] oracle's CTE chain (edges/nodes/deg/r0..r`iters`)
    * without a final SELECT — shared by the j6 oracle and the w2 profile. */
  def pageRankCtes(mod: Int, iters: Int): String =
    "WITH " + pageRankStepsOverEdges(
      s"""SELECT DISTINCT user_id % $mod AS src, abs(CAST(floor(value * 7) AS BIGINT)) % $mod AS dst
         |  FROM events WHERE user_id % $mod <> abs(CAST(floor(value * 7) AS BIGINT)) % $mod""".stripMargin,
      iters)

  /** [[pageRankCtes]] generalized to an arbitrary (src, dst) edge select
    * and WITHOUT the leading `WITH`, so it can be appended to an existing
    * CTE chain (e.g. a corpus-derived link graph — w7). */
  def pageRankStepsOverEdges(edgesSelect: String, iters: Int): String = {
    val base =
      s"""edges AS MATERIALIZED ($edgesSelect),
         |nodes AS (SELECT DISTINCT src AS id FROM edges UNION SELECT DISTINCT dst FROM edges),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
         |r0 AS (SELECT id, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS r FROM nodes)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""r$i AS (SELECT n.id, CAST(0.15 AS DOUBLE) / (SELECT n FROM nn) + CAST(0.85 AS DOUBLE) * coalesce(sum(p.r / deg.d), CAST(0 AS DOUBLE)) AS r
         |  FROM nodes n
         |  LEFT JOIN edges e ON e.dst = n.id
         |  LEFT JOIN deg ON deg.src = e.src
         |  LEFT JOIN r${i - 1} p ON p.id = e.src
         |  GROUP BY n.id)""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }

  /** Matching DuckDB oracle for [[pageRank]] — chained CTEs, one per iteration. */
  def pageRankOracleSql(mod: Int, iters: Int): String =
    pageRankCtes(mod, iters) +
      s"\nSELECT id, round(r, 8) AS rank FROM r$iters ORDER BY id"

  /** J13: HITS hubs & authorities (Kleinberg 1999) over an arbitrary
    * (src, dst) edge list — the link-analysis sibling of the reference's
    * PageRank family (RankingAlgorithm.java:141-188): the reverse-PR variant
    * (j11) already ranks "hubs that link to a seed set"; HITS computes the
    * mutually-reinforcing hub/authority pair over the whole graph.
    *
    * Per iteration: auth(d) = Σ_{s→d} hub(s); hub(s) = Σ_{s→d} auth(d);
    * both vectors L1-normalized (the textbook form normalizes every
    * iteration — but every step is LINEAR in the vector, so normalization
    * scalars commute to the end: we renormalize only every 4th iteration,
    * at the lineage cut, and once at the end, which yields the IDENTICAL
    * final vectors while keeping the loop aggregate-free; the periodic
    * renorm exists only to bound magnitude growth at high iteration
    * counts). A welcome side effect at small `iters`: intermediates are
    * exact integers (sums of 1s), so engine-vs-oracle comparison is
    * bit-exact up to the single final division.
    *
    * Scale: same shape as [[pageRankEdges]] — edges computed once, two
    * shuffles per iteration (one per direction), lineage cut + renorm every
    * 4 iterations. A mid-loop norm aggregate without a cut would re-derive
    * the whole upstream chain once per half-step (first cut of this
    * operator measured 77 s vs ~2 s at 3 iterations on the 600k-event
    * bench graph).
    */
  def hitsEdges(edges0: DataFrame, iters: Int): DataFrame = {
    val edgesW = edges0.where(col("src") =!= col("dst")).distinct().cache()
    val nodesW = edgesW.select(col("src").as("id"))
      .union(edgesW.select(col("dst").as("id"))).distinct().cache()
    val edges = sizeForLoop(edgesW, edgesW.count())
    val nodes = sizeForLoop(nodesW, nodesW.count())
    def l1norm(df: DataFrame, c: String): DataFrame = {
      val m = df.localCheckpoint()
      m.crossJoin(broadcast(m.agg(sum(c).as("norm"))))
        .select(col("id"), (col(c) / col("norm")).as(c))
    }
    var hub = nodes.withColumn("h", lit(1.0))
    var auth = nodes.withColumn("a", lit(0.0))
    for (i <- 1 to iters) {
      // each half-step is localCheckpointed: both vectors are read twice
      // downstream (the opposite half-step now, the final norm later), the
      // frames are one row per node, and an uncut chain makes the two final
      // norm materializations re-derive every iteration (measured 6.5 s vs
      // 2.5 s warm at 3 iterations on the 600k-event bench graph)
      auth = nodes.join(
          edges.join(hub.withColumnRenamed("id", "src"), "src")
            .groupBy(col("dst").as("id")).agg(sum("h").as("s")), Seq("id"), "left")
        .select(col("id"), coalesce(col("s"), lit(0.0)).as("a"))
        .localCheckpoint()
      hub = nodes.join(
          edges.join(auth.withColumnRenamed("id", "dst"), "dst")
            .groupBy(col("src").as("id")).agg(sum("a").as("s")), Seq("id"), "left")
        .select(col("id"), coalesce(col("s"), lit(0.0)).as("h"))
        .localCheckpoint()
      if (i % 4 == 0 && i < iters) {
        auth = l1norm(auth, "a")
        hub = l1norm(hub, "h")
      }
    }
    val out = l1norm(hub, "h").join(l1norm(auth, "a"), "id")
      .select(col("id"), round(col("h"), 6).as("hub"), round(col("a"), 6).as("auth"))
      .orderBy("id").localCheckpoint()
    edgesW.unpersist(); nodesW.unpersist()
    out
  }

  /** [[hitsEdges]] over the same deterministic events-derived edge list as
    * [[pageRank]]. */
  def hitsEvents(events: DataFrame, mod: Int, iters: Int): DataFrame =
    hitsEdges(events.select(
      (col("user_id") % mod).as("src"),
      (abs(floor(col("value") * 7).cast("long")) % mod).as("dst")), iters)

  /** Matching DuckDB oracle for [[hitsEvents]] — chained CTEs, two per
    * iteration, renormalization mirrored only every 4th iteration and at
    * the end (exactly the engine's schedule, see [[hitsEdges]]). */
  def hitsOracleSql(mod: Int, iters: Int): String = {
    val base =
      s"""WITH edges AS (SELECT DISTINCT user_id % $mod AS src, abs(CAST(floor(value * 7) AS BIGINT)) % $mod AS dst
         |  FROM events WHERE user_id % $mod <> abs(CAST(floor(value * 7) AS BIGINT)) % $mod),
         |nodes AS (SELECT DISTINCT src AS id FROM edges UNION SELECT DISTINCT dst FROM edges),
         |h0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS h FROM nodes)""".stripMargin
    val steps = scala.collection.mutable.Buffer.empty[String]
    var h = "h0"
    var a = ""
    for (i <- 1 to iters) {
      steps += s"""a$i AS (SELECT n.id, coalesce(sum(p.h), CAST(0 AS DOUBLE)) AS a
         |  FROM nodes n LEFT JOIN edges e ON e.dst = n.id
         |  LEFT JOIN $h p ON p.id = e.src GROUP BY n.id)""".stripMargin
      a = s"a$i"
      steps += s"""h$i AS (SELECT n.id, coalesce(sum(p.a), CAST(0 AS DOUBLE)) AS h
         |  FROM nodes n LEFT JOIN edges e ON e.src = n.id
         |  LEFT JOIN $a p ON p.id = e.dst GROUP BY n.id)""".stripMargin
      h = s"h$i"
      if (i % 4 == 0 && i < iters) {
        steps += s"a${i}n AS (SELECT id, a / (SELECT sum(a) FROM $a) AS a FROM $a)"
        a = s"a${i}n"
        steps += s"h${i}n AS (SELECT id, h / (SELECT sum(h) FROM $h) AS h FROM $h)"
        h = s"h${i}n"
      }
    }
    (base +: steps.toSeq).mkString(",\n") +
      s"""\nSELECT h.id, round(h.h / (SELECT sum(h) FROM $h), 6) AS hub,
         |  round(a.a / (SELECT sum(a) FROM $a), 6) AS auth
         |FROM $h h JOIN $a a ON a.id = h.id ORDER BY h.id""".stripMargin
  }

  /** F7: bit-packed metadata filter — pack (quality, ybyte) into a long,
    * filter on decoded fields (ParamMatchingQueryFilter.java:18-97 analog). */
  def metaFilter(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        (shiftleft(col("n_chars") % 256, 8) + (col("doc_id") % 256)).as("meta"))
      .withColumn("quality", expr("shiftright(meta, 8) & 255"))
      .withColumn("ybyte", expr("meta & 255"))
      .where(col("quality").between(50, 200))
      .select("doc_id", "meta", "quality", "ybyte")
      .orderBy("doc_id")
}
