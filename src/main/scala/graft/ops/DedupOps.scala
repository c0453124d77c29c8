package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for training-data curation over
  * `documents(doc_id, text, ...)` — exact, MinHash+LSH, SimHash, and n-gram
  * Jaccard. The reference carries only a 64-bit LSH fingerprint
  * (/root/reference/code/libraries/easy-lsh/src/main/java/nu/marginalia/lsh/EasyLSH.java:12-60,
  * shingle size 2); these generalize it to the full near-dup toolkit.
  *
  * All hashes are the portable md5-derived 30-bit h30 (TextOps.h30) so every
  * operator is DuckDB-oracle-checkable, and all products stay < 2^63.
  *
  * Scale notes: exact dedup is one hash-aggregate keyed by content hash
  * (uniform — no skew). MinHash signatures are a narrow map + per-doc
  * aggregate; LSH candidate pairs shuffle only on (band, value) buckets whose
  * size is bounded by actual near-dup cluster size, never by corpus size.
  * SimHash is an 16-way bit expansion aggregated per doc — constant factor,
  * no pairwise blowup.
  */
object DedupOps {

  /** Exact dedup: md5 content groups with a deterministic survivor
    * (min doc_id). `n_dups` > 1 marks a duplicate cluster. */
  def exactDups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_id"))
      .orderBy("h")

  /** MinHash permutation multipliers (a·h + b mod p, p = 2^31−1). 8 perms. */
  final val Perms: Seq[(Long, Long)] =
    Seq((7L, 11L), (13L, 101L), (31L, 257L), (101L, 1021L),
        (257L, 4093L), (1021L, 65537L), (4093L, 131101L), (65537L, 524287L))
  final val MinHashP = 2147483647L

  /** 3-token shingles with their 30-bit hash, one row per position. */
  def shingles(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("i")
    TextOps.tokensPos(docs)
      .withColumn("t2", lead("term", 1).over(w))
      .withColumn("t3", lead("term", 2).over(w))
      .where(col("t2").isNotNull && col("t3").isNotNull)
      .withColumn("sh", concat_ws(" ", col("term"), col("t2"), col("t3")))
      .select(col("doc_id"), TextOps.h30(col("sh")).as("h"))
  }

  /** MinHash signature: mh_j = min over shingles of (a_j·h + b_j) mod p. */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val aggs = Perms.zipWithIndex.map { case ((a, b), j) =>
      min((col("h") * a + b) % MinHashP).as(s"mh$j")
    }
    shingles(docs).groupBy("doc_id").agg(aggs.head, aggs.tail: _*).orderBy("doc_id")
  }

  /** LSH candidate pairs: 4 bands of 2 minhashes; docs sharing any band value
    * are candidates (shingle→minhash→band→bucket-join). */
  def lshCandidatePairs(docs: DataFrame): DataFrame = {
    val sig = minhashSignatures(docs)
    val bands = (0 until 4).map { bnd =>
      sig.select(col("doc_id"), lit(bnd).as("band"),
        (col(s"mh${2 * bnd}") * 31 + col(s"mh${2 * bnd + 1}")).as("v"))
    }.reduce(_ unionByName _)
    val a = bands.select(col("band"), col("v"), col("doc_id").as("a_id"))
    val b = bands.select(col("band"), col("v"), col("doc_id").as("b_id"))
    a.join(b, Seq("band", "v")).where(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct().orderBy("a_id", "b_id")
  }

  /** 16-bit SimHash from tf-weighted term-hash bits. */
  def simhash16(docs: DataFrame): DataFrame =
    TextOps.termTf(docs)
      .withColumn("h", TextOps.h30(col("term")))
      .crossJoin(broadcast(
        docs.sparkSession.range(0, 16).select(col("id").cast("int").as("b"))))
      .groupBy("doc_id", "b")
      .agg(sum(expr("tf * (2 * ((h >> b) & 1) - 1)")).as("s"))
      .groupBy("doc_id")
      .agg(sum(expr("CASE WHEN s > 0 THEN CAST(shiftleft(1, b) AS BIGINT) ELSE CAST(0 AS BIGINT) END")).as("simhash"))
      .orderBy("doc_id")

  /** Duplicate clusters from the LSH candidate pairs: connected components
    * by iterative min-label propagation (label = min doc_id reachable in
    * ≤ `iters` hops — enough for the shallow near-dup clusters LSH yields;
    * a full pipeline would loop to fixpoint with a convergence check).
    * Returns (doc_id, component) for every doc in at least one pair.
    * Scale: each iteration is one join keyed by doc_id over the PAIR set
    * (bounded by real near-dup volume, not corpus size). */
  def dedupComponents(docs: DataFrame, iters: Int = 3): DataFrame = {
    val pairs = lshCandidatePairs(docs)
    val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
    val nodes = edges.select(col("src").as("doc_id")).distinct()
    var labels = nodes.withColumn("component", col("doc_id"))
    for (_ <- 1 to iters) {
      val fromNeighbors = edges
        .join(labels.withColumnRenamed("doc_id", "dst"), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min("component").as("n_comp"))
      labels = labels.join(fromNeighbors, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("component"), coalesce(col("n_comp"), col("component"))).as("component"))
    }
    labels.orderBy("doc_id")
  }

  /** Matching DuckDB oracle for [[dedupComponents]] (chained CTEs per
    * iteration over the same band construction as d2b). */
  def dedupComponentsOracleSql(iters: Int): String = {
    val mins = Perms.zipWithIndex.map { case ((a, b), j) =>
      s"min(($a * h + $b) % $MinHashP) AS mh$j"
    }.mkString(", ")
    val base =
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |p AS (SELECT doc_id, i, toks[i] AS term FROM d CROSS JOIN generate_series(1, 8192) AS t(i)
         |      WHERE i <= len(toks)),
         |sh AS (SELECT p.doc_id AS doc_id,
         |  ('0x' || substring(md5(p.term || ' ' || p2.term || ' ' || p3.term), 1, 15))::BIGINT % 1073741824 AS h
         |  FROM p JOIN p p2 ON p2.doc_id = p.doc_id AND p2.i = p.i + 1
         |         JOIN p p3 ON p3.doc_id = p.doc_id AND p3.i = p.i + 2),
         |sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, 0 AS band, mh0 * 31 + mh1 AS v FROM sig UNION ALL
         |  SELECT doc_id, 1, mh2 * 31 + mh3 FROM sig UNION ALL
         |  SELECT doc_id, 2, mh4 * 31 + mh5 FROM sig UNION ALL
         |  SELECT doc_id, 3, mh6 * 31 + mh7 FROM sig),
         |prs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id),
         |edges AS (SELECT a_id AS src, b_id AS dst FROM prs UNION ALL SELECT b_id, a_id FROM prs),
         |l0 AS (SELECT DISTINCT src AS doc_id, src AS component FROM edges)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""l$i AS (SELECT l.doc_id,
         |  least(l.component, coalesce(min(n.component), l.component)) AS component
         |  FROM l${i - 1} l
         |  LEFT JOIN edges e ON e.src = l.doc_id
         |  LEFT JOIN l${i - 1} n ON n.doc_id = e.dst
         |  GROUP BY l.doc_id, l.component)""".stripMargin
    }
    (base +: steps).mkString(",\n") +
      s"\nSELECT doc_id, component FROM l$iters ORDER BY doc_id"
  }

  /** n-gram (token-set) Jaccard similarity for candidate pairs with
    * doc_id < `idBound` (bounded pair universe; at scale the candidate set
    * comes from lshCandidatePairs instead of an id cut). */
  def jaccardPairs(docs: DataFrame, idBound: Long, minJaccard: Double): DataFrame = {
    val toks = TextOps.tokens(docs).where(col("doc_id") < idBound)
      .select("doc_id", "term").distinct()
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = toks.select(col("doc_id").as("a_id"), col("term"))
      .join(toks.select(col("doc_id").as("b_id"), col("term")), "term")
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("a_id"), col("sz").as("a_sz")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("sz").as("b_sz")), "b_id")
      .withColumn("jaccard", round(expr("inter / cast(a_sz + b_sz - inter as double)"), 6))
      .where(col("jaccard") >= minJaccard)
      .select("a_id", "b_id", "jaccard")
      .orderBy("a_id", "b_id")
  }
}
