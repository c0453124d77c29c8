package graft

import graft.build.{IndexBuilder, IndexConf}
import graft.fixtures.Fixtures
import graft.query._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Physical-plan assertions: the scale story depends on predicates reaching
  * the parquet scans (PushedFilters), partition pruning on `bucket`, and
  * broadcast joins staying broadcast. These tests freeze those properties so
  * a refactor can't silently regress them (SURVEY §4). */
class PlanQualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-plan")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    // PushedFilters lists are truncated at 100 chars by default, which hides
    // the filters these assertions look for
    .config("spark.sql.maxMetadataStringLength", "4096")
    .getOrCreate()

  private lazy val indexDir: String = {
    val root = Files.createTempDirectory(java.nio.file.Paths.get("target"), "plan").toString
    IndexBuilder.buildFromJournal(spark, Fixtures.factorsJournal(spark), root, "snap-1",
      IndexConf(numBuckets = 8, docRangeShift = 4))
    QueryEngine.open(root).dir
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("postings scan prunes partitions by bucket and pushes term_hash") {
    val h = graft.core.Hashes.termHash("3")
    val bucket = (((h % 8) + 8) % 8).toInt
    val df = spark.read.parquet(s"$indexDir/postings")
      .where(col("bucket") === bucket && col("term_hash") === h)
      .select("term_hash", "doc_range", "n")
    val plan = planOf(df)
    // dynamic partition column filter must land in PartitionFilters, the
    // term_hash equality in PushedFilters — both at the scan, not post-scan
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"bucket not a partition filter:\n$plan")
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(term_hash".r.findFirstIn(plan).isDefined,
      s"term_hash not pushed:\n$plan")
  }

  test("domain-rank restriction pushes doc_range intervals into the scan") {
    // near:/site: rank-prefix pruning must arrive as RANGE predicates on the
    // raw doc_range column (pushable, prunes row groups by min/max stats) —
    // not as a shift expression evaluated post-scan
    val h = graft.core.Hashes.termHash("3")
    val bucket = (((h % 8) + 8) % 8).toInt
    val rankPrefix = 32 - 4
    val lo = 255L << rankPrefix // the fixture's constant rank
    val df = spark.read.parquet(s"$indexDir/postings")
      .where(col("bucket") === bucket && col("term_hash") === h &&
        col("doc_range") >= lo && col("doc_range") < lo + (1L << rankPrefix))
      .select("term_hash", "doc_range", "n")
    val plan = planOf(df)
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(doc_range".r.findFirstIn(plan).isDefined,
      s"doc_range lower bound not pushed:\n$plan")
    assert("PushedFilters: \\[[^\\]]*LessThan\\(doc_range".r.findFirstIn(plan).isDefined,
      s"doc_range upper bound not pushed:\n$plan")
  }

  test("persisted IVF probe scan prunes cell partitions") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"), "ivfplan").toString
    graft.ops.VectorOps.buildIvfIndex(emb, dir, k = 8, iters = 2)
    val q = emb.where(col("vec_id") === 0L)
      .select(col("embedding")).collect()(0)
      .getSeq[Float](0).map(_.toDouble).toArray
    val plan = planOf(graft.ops.VectorOps.ivfIndexTopK(spark, dir, q, 20, nProbe = 3))
    // the whole point of the persisted layout: a probe reads nProbe/k of the
    // corpus because `cell` is a partition column pruned at the scan
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"cell not a partition filter:\n$plan")
  }

  test("term_stats planner lookup reads only the stats columns") {
    val df = spark.read.parquet(s"$indexDir/term_stats")
      .where(col("bucket") === 1)
      .select("term_hash", "df_full")
    val plan = planOf(df)
    assert("ReadSchema: struct<term_hash:bigint,df_full:bigint".r.findFirstIn(plan).isDefined,
      s"column pruning failed:\n$plan")
  }

  test("documents dimension join broadcasts (no shuffle of the fact side)") {
    val docs = spark.read.parquet(s"$indexDir/documents").select("doc_id", "rank")
    val postings = spark.read.parquet(s"$indexDir/postings").select("term_hash", "doc_range")
    val joined = postings.join(broadcast(docs),
      postings("doc_range") === docs("doc_id") % 16)
    val plan = planOf(joined)
    assert(plan.contains("BroadcastHashJoin"), s"not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
  }

  test("whole-stage codegen covers the relational operator chain") {
    val df = spark.read.parquet(s"$indexDir/postings")
      .groupBy("bucket").agg(sum("n").as("postings"))
    df.collect() // finalize the adaptive plan — codegen spans appear post-AQE
    val plan = planOf(df)
    // the final adaptive plan renders whole-stage-codegen stages as `*(n)`
    assert(plan.contains("WholeStageCodegen") || "\\*\\(\\d+\\)".r.findFirstIn(plan).isDefined,
      s"no codegen span:\n$plan")
  }

  test("disjunction composition keeps the global sort above the join") {
    // bm25Scores (unsorted) feeds the full-outer score join; the ONLY global
    // Sort in the physical plan is the outermost top-k (VERDICT r2 task #6:
    // orderBy.limit(MaxValue) below a join was wasted work at scale). The
    // TakeOrderedAndProject operator IS that top-k — assert no other
    // standalone global Sort survives under the join.
    import graft.ops.TextOps
    val docs = spark.read.parquet(s"$indexDir/documents")
      .select(col("doc_id"), concat_ws(" ", col("repo"), col("path")).as("text"))
    val s1 = TextOps.bm25Scores(docs, Seq("doc1", "doc2")).withColumnRenamed("score", "s1")
    val s2 = TextOps.bm25Scores(docs, Seq("doc3", "doc4")).withColumnRenamed("score", "s2")
    val q = s1.join(s2, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), greatest(coalesce(col("s1"), lit(-1e9)),
        coalesce(col("s2"), lit(-1e9))).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(50)
    q.collect() // finalize adaptive plan
    val plan = planOf(q)
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not TakeOrdered:\n$plan")
    // SortMergeJoin's local partition sorts print as `Sort [.. ASC ..], false`
    // (global=false); a leftover global sort would print `, true` — forbid it
    assert(!", true, 0".r.findFirstIn(plan).exists(_ => plan.contains("Sort [score")),
      s"global Sort below the join:\n$plan")
    assert(!plan.contains("GlobalLimit"), s"limit should fold into TakeOrdered:\n$plan")
  }

  test("index build runs exactly one wide shuffle for the postings stage") {
    // count Exchange operators in the encode path: repartition(bucket,
    // doc_range) is the single expected exchange
    import spark.implicits._
    val journal = Fixtures.factorsJournal(spark)
    val exploded = journal
      .select($"url_id", $"rank", explode($"keywords").as("kw"))
      .select(xxhash64($"kw.term").as("term_hash"),
        lit(0L).as("doc_range"),
        $"url_id".cast("long").as("rank_doc_id"),
        $"kw.meta".as("term_meta"))
      .withColumn("bucket", pmod($"term_hash", lit(8L)).cast("int"))
      .repartition($"bucket", $"doc_range")
      .sortWithinPartitions($"bucket", $"term_hash", $"doc_range", $"rank_doc_id")
    val plan = planOf(exploded)
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 shuffle, saw $exchanges:\n$plan")
  }

  test("snapshot merge runs exactly one wide shuffle over encoded blocks") {
    import graft.build.{IndexBuilder, IndexConf, SnapshotMerge}
    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "planmerge").toString
    val j = Fixtures.factorsJournal(spark)
    val conf = IndexConf(numBuckets = 4, docRangeShift = 4)
    IndexBuilder.buildFromJournal(spark, j.where(col("url_id") % 2 === 0), root, "a", conf)
    IndexBuilder.buildFromJournal(spark, j.where(col("url_id") % 2 === 1), root, "b", conf)
    val bcNone = spark.sparkContext.broadcast((Set.empty[Long], Set.empty[Long]))
    val merged = SnapshotMerge.mergedPostings(spark,
      Seq(s"$root/snapshots/a/postings", s"$root/snapshots/b/postings"), bcNone,
      prioTier = false)
    val plan = planOf(merged.toDF())
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 shuffle in the merge, saw $exchanges:\n$plan")
    // and the union stays below the exchange: no per-input shuffle
    assert(plan.contains("Union"), s"expected a pre-shuffle Union:\n$plan")
  }

  test("window top-k gets Spark's group-limit pushdown below the exchange") {
    // the a8 shape: rank-filter over a window. Spark 4's InferWindowGroupLimit
    // must insert a PARTIAL WindowGroupLimit below the shuffle (map-side ≤k
    // rows per key per partition) and a FINAL one above — this is the builtin
    // scale lever the repo's window-top-k oracles lean on at 100 TB, asserted
    // here so a config/regression that disables it is caught.
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val w = Window.partitionBy("lang").orderBy(col("n_chars").desc, col("doc_id"))
    val q = docs.select(col("lang"), col("doc_id"), col("n_chars"),
        org.apache.spark.sql.functions.row_number().over(w).as("rn"))
      .where(col("rn") <= 3)
    val plan = planOf(q)
    assert(plan.contains("WindowGroupLimit") &&
      "WindowGroupLimit.*Partial".r.findFirstIn(plan).isDefined &&
      "WindowGroupLimit.*Final".r.findFirstIn(plan).isDefined,
      s"expected Partial+Final WindowGroupLimit:\n$plan")
  }
}
