package graft

import graft.build.{IndexBuilder, IndexConf, KeywordRow, SiteWords}
import graft.core.{WordFlags, WordMeta}
import graft.query.{QueryEngine, QueryParser}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

final case class JDoc(doc_id: Long, domain_id: Int, keywords: Seq[KeywordRow])
final case class JLink(src_doc_id: Long, dst_doc_id: Long)

/** K3 n-gram span retrieval and K7 Site/SiteAdjacent passes. */
class SiteNgramSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sitengram")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("quoted phrase retrieves exact adjacency on an n-gram index") {
    import spark.implicits._
    val corpus = Seq(
      ("r1", "a.txt", "c1", "en", "alpha beta gamma words"),
      ("r1", "b.txt", "c2", "en", "beta alpha gamma words"),
      ("r1", "c.txt", "c3", "en", "alpha gamma beta words"),
      ("r1", "d.txt", "c4", "en", "alpha beta again here"))
      .toDF("repo", "path", "commit", "lang", "content")
    val root = java.nio.file.Files.createTempDirectory("ngram-idx").toString
    IndexBuilder.buildFromCorpus(spark, corpus, root, "snap-1",
      IndexConf(numBuckets = 4, docRangeShift = 4, ngrams = true))
    val idx = QueryEngine.open(root)
    assert(idx.manifest.ngrams)
    val hits = QueryEngine.search(spark, idx, QueryParser.parse("\"alpha beta\""))
    assert(hits.size === 2, s"only docs with adjacent 'alpha beta': $hits")
    // all three words present but never adjacent → no match
    val strict = QueryEngine.search(spark, idx, QueryParser.parse("\"beta gamma\""))
    assert(strict.size === 1)
  }

  test("3-word quoted phrase needs the full contiguous span, not pairwise bigrams") {
    import spark.implicits._
    val corpus = Seq(
      // has alpha_beta AND beta_gamma in ONE line (one position group) but
      // never the contiguous 'alpha beta gamma' — pairwise promotion
      // false-positives here
      ("r1", "a.txt", "c1", "en", "alpha beta then beta gamma words"),
      ("r1", "b.txt", "c2", "en", "alpha beta gamma words"))
      .toDF("repo", "path", "commit", "lang", "content")
    val root = java.nio.file.Files.createTempDirectory("ngram3-idx").toString
    IndexBuilder.buildFromCorpus(spark, corpus, root, "snap-1",
      IndexConf(numBuckets = 4, docRangeShift = 4, ngrams = true))
    val idx = QueryEngine.open(root)
    val hits = QueryEngine.search(spark, idx, QueryParser.parse("\"alpha beta gamma\""))
    assert(hits.size === 1, s"only the contiguous doc matches: $hits")
    assert(hits.head.url_id === 2, "doc b.txt is the contiguous one")
  }

  test("quoted phrase on a stemmed n-gram index joins stemmed parts") {
    import spark.implicits._
    val corpus = Seq(
      ("r1", "a.txt", "c1", "en", "running fast away"),
      ("r1", "b.txt", "c2", "en", "fast running away"))
      .toDF("repo", "path", "commit", "lang", "content")
    val root = java.nio.file.Files.createTempDirectory("ngram-stem-idx").toString
    IndexBuilder.buildFromCorpus(spark, corpus, root, "snap-1",
      IndexConf(numBuckets = 4, docRangeShift = 4, ngrams = true, stemming = true))
    val idx = QueryEngine.open(root)
    val hits = QueryEngine.search(spark, idx, QueryParser.parse("\"runs fast\""))
    assert(hits.size === 1, s"stemmed phrase run_fast must match doc a only: $hits")
  }

  private def kw(term: String, flags: Int): KeywordRow =
    KeywordRow(term, WordMeta.encode(1L, flags), 1)

  test("flagCommonSiteWords ORs Site onto a domain's common topic terms") {
    import spark.implicits._
    // domain 1: 30 docs, 10 carry Title-flagged "framework" (>25%), total
    // flagged = 40 ≥ 15; domain 2: only 3 docs (below MinRequiredDocuments)
    val docs =
      (0 until 30).map { i =>
        val kws = Seq(kw("common", 0)) ++
          (if (i < 10) Seq(kw("framework", WordFlags.Title)) else Nil) ++
          Seq(kw(s"uniq$i", WordFlags.Title))
        JDoc(i.toLong, 1, kws)
      } ++ (100 until 103).map(i => JDoc(i.toLong, 2, Seq(kw("framework", WordFlags.Title))))
    val out = SiteWords.flagCommonSiteWords(docs.toDF()).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("keywords"))
          .map(k => k.getString(0) -> k.getLong(1)).toMap).toMap
    // every domain-1 doc CONTAINING "framework" has Site OR'd on it
    (0 until 10).foreach { i =>
      assert((out(i.toLong)("framework") & WordFlags.Site) != 0, s"doc $i")
    }
    // unique per-doc terms and the unflagged "common" stay untouched
    assert((out(0L)("common") & WordFlags.Site) === 0L)
    assert((out(5L)("uniq5") & WordFlags.Site) === 0L)
    // small domain is never flagged
    assert((out(100L)("framework") & WordFlags.Site) === 0L)
  }

  test("flagAdjacentWords needs >3 linking docs and own-top membership") {
    import spark.implicits._
    // docs 1..5 link to doc 10; all carry top term "spark"; doc 10 has it too.
    // docs 1..2 also carry "rare" (only 2 linking docs → below threshold).
    val docs = (1 to 5).map(i =>
      JDoc(i.toLong, 1, Seq(kw("spark", WordFlags.TfIdfHigh),
        kw("rare", if (i <= 2) WordFlags.TfIdfHigh else 0)))) :+
      JDoc(10L, 1, Seq(kw("spark", WordFlags.TfIdfHigh), kw("rare", WordFlags.TfIdfHigh)))
    val links = (1 to 5).map(i => JLink(i.toLong, 10L))
    val out = SiteWords.flagAdjacentWords(docs.toDF(), links.toDF()).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("keywords"))
          .map(k => k.getString(0) -> k.getLong(1)).toMap).toMap
    assert((out(10L)("spark") & WordFlags.SiteAdjacent) != 0, "5 linking docs qualify")
    assert((out(10L)("rare") & WordFlags.SiteAdjacent) === 0L, "2 linking docs do not")
    assert((out(1L)("spark") & WordFlags.SiteAdjacent) === 0L, "linking docs unflagged")
  }
}
