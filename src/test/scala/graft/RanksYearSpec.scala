package graft

import graft.build.{IndexBuilder, IndexConf}
import graft.core.DocMeta
import graft.ops.RelationalOps
import graft.query.{QueryEngine, QueryParser, QuerySpec, SpecLimit, Subquery}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** J6→index rank wiring, corpus `year` column, advice-only promotion (Q2),
  * and ngram query variants (Q3). */
class RanksYearSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-ranksyear")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("domainRanksFromPageRank orders repos by link authority, 0 best") {
    import spark.implicits._
    // star graph: everyone links to hub
    val links = Seq(("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a"))
      .toDF("src_repo", "dst_repo")
    // enough iterations that the a↔hub 2-cycle's oscillation has converged
    val ranks = RelationalOps.domainRanksFromPageRank(links, 60).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(ranks("hub") === 0, s"hub must rank best: $ranks")
    assert(ranks.values.forall(v => v >= 0 && v <= 254))
    assert(ranks("hub") < ranks("b"))
  }

  test("explicit domain ranks and corpus year flow into doc_meta and query limits") {
    import spark.implicits._
    val corpus = Seq(
      ("good/repo", "a.txt", "c1", "en", "needle in the best repo", 2019),
      ("bad/repo", "b.txt", "c2", "en", "needle in the worst repo", 2005))
      .toDF("repo", "path", "commit", "lang", "content", "year")
    val ranks = Seq(("good/repo", 3), ("bad/repo", 200)).toDF("repo", "rank")
    val root = java.nio.file.Files.createTempDirectory("ranks-idx").toString
    IndexBuilder.buildFromCorpusFull(spark, corpus, root, "snap-1",
      IndexConf(numBuckets = 4, docRangeShift = 4), null, ranks)
    val idx = QueryEngine.open(root)

    val metaByRepo = spark.read.parquet(s"${idx.dir}/documents")
      .select("repo", "doc_meta", "rank").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(metaByRepo("good/repo")._2 === 3)
    assert(DocMeta.rank(metaByRepo("good/repo")._1) === 3)
    assert(DocMeta.year(metaByRepo("good/repo")._1) === 2019)
    assert(DocMeta.year(metaByRepo("bad/repo")._1) === 2005)

    // rank ordering: the better-ranked repo's doc sorts first
    val hits = QueryEngine.search(spark, idx, QueryParser.parse("needle"))
    assert(hits.size === 2)
    assert(hits.head.ranking === 3 && hits(1).ranking === 200)

    // year limit live on the corpus path
    val recent = QueryEngine.search(spark, idx,
      QueryParser.parse("needle year>2010"))
    assert(recent.size === 1 && recent.head.ranking === 3)

    // J8 decoration: results join back to (repo, path, lang)
    val dec = QueryEngine.decorate(spark, idx, hits).collect()
    assert(dec.length === 2)
    assert(dec(0).getAs[String]("repo") === "good/repo")
    assert(dec(0).getAs[String]("path") === "a.txt")
    assert(dec(1).getAs[String]("repo") === "bad/repo")
  }

  test("advice-only query promotes advice into the conjunction") {
    import spark.implicits._
    val corpus = Seq(
      ("r1", "a.scala", "c1", "scala", "some scala content"),
      ("r1", "b.py", "c2", "py", "some python content"))
      .toDF("repo", "path", "commit", "lang", "content")
    val root = java.nio.file.Files.createTempDirectory("advice-idx").toString
    IndexBuilder.buildFromCorpus(spark, corpus, root, "snap-1",
      IndexConf(numBuckets = 4, docRangeShift = 4))
    val idx = QueryEngine.open(root)
    val hits = QueryEngine.search(spark, idx, QueryParser.parse("lang:scala"))
    assert(hits.size === 1, s"advice-only lang:scala must match the scala doc: $hits")
    assert(QueryEngine.search(spark, idx,
      QuerySpec(Seq(Subquery(include = Nil, advice = Seq("lang:py"))))).size === 1)
  }

  test("ngram variants: multi-word query evaluates joined-span subqueries") {
    import spark.implicits._
    val corpus = Seq(
      ("r1", "a.txt", "c1", "en", "alpha beta adjacent here"),
      ("r1", "b.txt", "c2", "en", "alpha scattered then beta later"))
      .toDF("repo", "path", "commit", "lang", "content")
    val root = java.nio.file.Files.createTempDirectory("variant-idx").toString
    IndexBuilder.buildFromCorpus(spark, corpus, root, "snap-1",
      IndexConf(numBuckets = 4, docRangeShift = 4, ngrams = true))
    val idx = QueryEngine.open(root)
    // unquoted multi-word query: identity variant matches BOTH docs (union
    // semantics keep recall); the joined-span variant can only improve the
    // adjacent doc's score, so it must rank first
    val hits = QueryEngine.search(spark, idx, QueryParser.parse("alpha beta"))
    assert(hits.size === 2, s"identity variant keeps recall: $hits")
    assert(hits.head.score <= hits(1).score)
  }
}
