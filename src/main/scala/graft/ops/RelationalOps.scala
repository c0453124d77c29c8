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

  /** PageRank over an arbitrary (src, dst) edge list (self-loops dropped,
    * edges deduped); returns (id, r) with raw double ranks. */
  def pageRankEdges(edges0: DataFrame, iters: Int): DataFrame = {
    val edges = edges0.where(col("src") =!= col("dst")).distinct().cache()
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct().cache()
    val n = nodes.count()
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
    ranks
  }

  /** J6 → index wiring: domain rank bytes from PageRank over a repo link
    * graph (src_repo, dst_repo). Ordinal percentile scaled to 0..254 (0 =
    * best; 255 stays the unknown-domain sentinel), the shape of the
    * reference's RankingAlgorithm → DomainRankings conversion
    * (RankingAlgorithm.java:141-188, DomainRankings.java:27-38). The global
    * ordinal window is a single-partition sort of ONE ROW PER DOMAIN —
    * fine to ~10^7 repos; beyond that switch to approx quantile buckets. */
  def domainRanksFromPageRank(repoLinks: DataFrame, iters: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pr = pageRankEdges(repoLinks.select(
      col("src_repo").as("src"), col("dst_repo").as("dst")), iters)
    val w = Window.orderBy(col("r").desc, col("id"))
    pr.select(col("id").as("repo"),
      (percent_rank().over(w) * 254).cast("int").as("rank"))
  }

  /** Matching DuckDB oracle for [[pageRank]] — chained CTEs, one per iteration. */
  def pageRankOracleSql(mod: Int, iters: Int): String = {
    val base =
      s"""WITH edges AS (SELECT DISTINCT user_id % $mod AS src, abs(CAST(floor(value * 7) AS BIGINT)) % $mod AS dst
         |  FROM events WHERE user_id % $mod <> abs(CAST(floor(value * 7) AS BIGINT)) % $mod),
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
    (base +: steps).mkString(",\n") +
      s"\nSELECT id, round(r, 8) AS rank FROM r$iters ORDER BY id"
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
