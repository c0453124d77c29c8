package graft

import graft.build.{IndexBuilder, IndexConf}
import graft.fixtures.Fixtures
import graft.query._
import graft.tables.Snapshots
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end pipeline + rank-identity tests against the reference's own
  * integration expectations (IndexQueryServiceIntegrationTest.java:72-166)
  * and an independent single-threaded score oracle (FIXTURES.md §3). */
class IndexPipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def freshRoot(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "idx").toString

  private lazy val factorsIndex: QueryEngine.Index = {
    val root = freshRoot()
    IndexBuilder.buildFromJournal(spark, Fixtures.factorsJournal(spark), root, "snap-1",
      IndexConf(numBuckets = 8, docRangeShift = 4))
    QueryEngine.open(root)
  }

  // --- willItBlend (reference :72-101) --------------------------------------
  test("factors corpus: include {3,5,2} exclude {4} returns the reference ids in order") {
    val res = QueryEngine.search(spark, factorsIndex, QuerySpec(
      subqueries = Seq(Subquery(include = Seq("3", "5", "2"), exclude = Seq("4"))),
      limitByDomain = 10, limitTotal = 10))
    assert(res.map(_.url_id) == Seq(30, 90, 150, 210, 270, 330, 390, 450, 510))
  }

  // --- testDomainQuery (reference :104-128) ----------------------------------
  test("factors corpus: domain-restricted query returns [210, 270]") {
    val root = freshRoot()
    IndexBuilder.buildFromJournal(spark, Fixtures.factorsJournalByHundred(spark), root, "snap-1",
      IndexConf(numBuckets = 8, docRangeShift = 4))
    val idx = QueryEngine.open(root)
    val res = QueryEngine.search(spark, idx, QuerySpec(
      subqueries = Seq(Subquery(include = Seq("3", "5", "2"), exclude = Seq("4"))),
      domains = Seq(2), limitByDomain = 10, limitTotal = 10))
    assert(res.map(_.url_id) == Seq(210, 270))
  }

  // --- testYearQuery (reference :131-166) -------------------------------------
  test("factors corpus: include {4} with year==1998 returns 10 docs, all 1998") {
    val res = QueryEngine.search(spark, factorsIndex, QuerySpec(
      subqueries = Seq(Subquery(include = Seq("4"))),
      year = SpecLimit.equalTo(1998), limitByDomain = 10, limitTotal = 10))
    assert(res.size == 10)
    // year byte = id%5 must equal 1998-1996=2 → id ≡ 12 (mod 20)
    assert(res.forall(_.url_id % 20 == 12))
    // ranked by the oracle's scores (position mask of term "4" differs per doc)
    val expected = (1 until 512).filter(id => id % 4 == 0 && id % 5 == 2)
      .map(id => (id, Oracle.score(id, Seq(4)))).sortBy { case (id, s) => (s, id) }
      .take(10).map(_._1)
    assert(res.map(_.url_id) == expected)
  }

  // --- independent score oracle (FIXTURES.md §3: never the engine's code) ----
  /** Recomputes the reference score chain from first principles for the
    * factors fixture: BM25 (Bm25Factor.java), tcf (TermCoherenceFactor.java),
    * overall part + normalize (ResultValuator.java), defaults
    * sensibleDefaults() = full(1.2, 0.5), prio(1.5, 0), AVG 5000. */
  object Oracle {
    val N = 511
    def factors(id: Int): Array[Int] = (1 to id).filter(id % _ == 0).toArray
    def df(term: Int): Int = (1 until 512).count(id => id % term == 0)
    def posMask(id: Int, term: Int): Long = {
      val i = factors(id).indexOf(term) // positions value = factor index
      if (i < 0) 0L else i.toLong & 0xFF_FFFF_FFFF_FFFFL
    }
    def idf(dfv: Int): Double = math.log(1.0 + (N - dfv + 0.5) / (dfv + 0.5))
    def score(id: Int, terms: Seq[Int]): Double = {
      val length = 5000 // IndexResultValuator passes literal 5000
      val k = 1.2; val b = 0.5
      val bm25 = terms.map { t =>
        val c = java.lang.Long.bitCount(posMask(id, t)).toDouble
        idf(df(t)) * (c * (k + 1)) / (c + k * (1 - b + b * length / 5000.0))
      }.sum
      // prio BM25 (Bm25Factor.calculateBm25Prio): the flag mask is applied to
      // the ENCODED word metadata, and UrlDomain.asBit()=256 overflows the
      // 8-bit flags field onto position bit 0 — a reference quirk we replicate
      // faithfully. encoded = (positions << 8) | flags(Title=1).
      val prioMask = (1 << 5) | (1 << 6) | (1 << 7) | (1 << 8) | (1 << 1) // Site|SiteAdj|UrlPath|UrlDomain|Subjects
      val kp = 1.5
      val bm25p = terms.map { t =>
        val encoded = (posMask(id, t) << 8) | 1L
        val c = java.lang.Long.bitCount(encoded & prioMask).toDouble
        // prio df: every posting carries Title (a priority flag) → df_prio = df
        idf(df(t)) * (c * (kp + 1)) / (c + kp)
      }.sum
      val tcf = 2.0 * math.pow(
        java.lang.Long.bitCount(terms.map(posMask(id, _)).reduce(_ & _)) / 56.0, 0.25)
      val quality = math.min(15, id % 20) // QUALITY_MASK is 4 bits — encode clamps
      val overall = -5.0 /*asl<2*/ - 0.0 /*len 5000>2000*/ +
        -quality / 15.0 + (255.0 - 0) / 25.0 + math.log(1.0) + 0.0
      val raw = bm25 + bm25p + tcf + overall
      val v = math.max(0.0, raw)
      math.sqrt(251.0 / (1.0 + v / terms.size))
    }
  }

  test("engine BM25 scores are identical to the independent oracle on a score-diverse query") {
    // {7, 3}: the factor indices of 7 and 3 differ per doc → real score spread
    val res = QueryEngine.search(spark, factorsIndex, QuerySpec(
      subqueries = Seq(Subquery(include = Seq("7", "3"))),
      limitByDomain = 100, limitTotal = 24))
    val ids = (1 until 512).filter(id => id % 21 == 0)
    assert(res.nonEmpty && res.size == math.min(24, ids.size))

    val expected = ids.map(id => (id, Oracle.score(id, Seq(7, 3))))
      .sortBy { case (id, s) => (s, id) } // rank 255 tie for all; urlId tiebreak
      .take(24)
    val got = res.map(r => (r.url_id, r.score))
    expected.zip(got).foreach { case ((eid, es), (gid, gs)) =>
      assert(eid == gid, s"doc order mismatch: expected $eid got $gid")
      assert(math.abs(es - gs) < 1e-9, s"score mismatch for doc $eid: $es vs $gs")
    }
  }

  test("priority terms stratify results above better-scored non-priority docs") {
    // ?63: only multiples of 63 have the term; they must come first
    val res = QueryEngine.search(spark, factorsIndex, QuerySpec(
      subqueries = Seq(Subquery(include = Seq("7", "3"), priority = Seq("63"))),
      limitByDomain = 100, limitTotal = 24))
    val prioIds = res.takeWhile(_.has_priority_term).map(_.url_id)
    assert(prioIds.nonEmpty)
    assert(prioIds.forall(_ % 63 == 0))
    assert(res.dropWhile(_.has_priority_term).forall(!_.has_priority_term))
  }

  test("coherence constraint disqualifies docs with disjoint position masks") {
    // {3,5} coherence: masks are factor indices 2 and 3 → AND == 0b10 & 0b11 = 0b10 ≠ 0
    // for every multiple of 15 — all pass; {2,3} → 1 & 2 = 0 — all disqualified
    val pass = QueryEngine.search(spark, factorsIndex, QuerySpec(
      subqueries = Seq(Subquery(include = Seq("3", "5"), coherences = Seq(Seq("3", "5")))),
      limitTotal = 5))
    assert(pass.nonEmpty)
    val fail = QueryEngine.search(spark, factorsIndex, QuerySpec(
      subqueries = Seq(Subquery(include = Seq("2", "3"), coherences = Seq(Seq("2", "3")))),
      limitTotal = 5))
    assert(fail.isEmpty)
  }

  // --- block-max WAND pruning is exact ---------------------------------------
  test("WAND range pruning returns identical results to unpruned evaluation") {
    // tiny ranges (shift=2 → 4 docs per range) maximize skip opportunities
    val root = freshRoot()
    IndexBuilder.buildFromJournal(spark, Fixtures.factorsJournal(spark), root, "snap-1",
      IndexConf(numBuckets = 8, docRangeShift = 2))
    val idx = QueryEngine.open(root)
    val specs = Seq(
      QuerySpec(Seq(Subquery(include = Seq("7", "3"))), limitTotal = 10),
      QuerySpec(Seq(Subquery(include = Seq("2"))), limitTotal = 5, limitByDomain = 3),
      QuerySpec(Seq(Subquery(include = Seq("3", "5", "2"), exclude = Seq("4"))), limitTotal = 10),
      QuerySpec(Seq(Subquery(include = Seq("7", "3"), priority = Seq("63"))), limitTotal = 12),
      QuerySpec(Seq(
        Subquery(include = Seq("11")),
        Subquery(include = Seq("13"))), limitTotal = 8))
    specs.foreach { s =>
      // exactness across the pruning × evaluation-path grid: WAND on/off,
      // driver-local vs distributed kernel — all four must agree
      val results = for {
        pruning <- Seq(true, false)
        localMax <- Seq(Long.MaxValue, 0L)
      } yield QueryEngine.search(spark, idx,
        s.copy(pruning = pruning, localEvalMaxPostings = localMax))
      assert(results.distinct.size == 1, s"paths disagree for $s:\n${results.mkString("\n")}")
    }
  }

  // --- salted layout (head-term skew knob) ------------------------------------
  test("saltByRange layout answers queries identically to the default layout") {
    val rootA = freshRoot(); val rootB = freshRoot()
    IndexBuilder.buildFromJournal(spark, Fixtures.factorsJournal(spark), rootA, "snap-1",
      IndexConf(numBuckets = 8, docRangeShift = 4, saltByRange = false))
    IndexBuilder.buildFromJournal(spark, Fixtures.factorsJournal(spark), rootB, "snap-1",
      IndexConf(numBuckets = 8, docRangeShift = 4, saltByRange = true))
    val specs = Seq(
      QuerySpec(Seq(Subquery(include = Seq("2")))),          // head term (df 255)
      QuerySpec(Seq(Subquery(include = Seq("3", "5", "2"), exclude = Seq("4")))),
      QuerySpec(Seq(Subquery(include = Seq("7", "3"), priority = Seq("63")))))
    specs.foreach { s =>
      val a = QueryEngine.search(spark, QueryEngine.open(rootA), s)
      val b = QueryEngine.search(spark, QueryEngine.open(rootB), s)
      assert(a == b, s"layouts disagree for $s")
    }
  }

  // --- resumability (north rule) ---------------------------------------------
  test("killed build resumes from stage markers and commits an identical index") {
    val root = freshRoot()
    val journal = Fixtures.factorsJournal(spark)
    val conf = IndexConf(numBuckets = 8, docRangeShift = 4)
    IndexBuilder.buildFromJournal(spark, journal, root, "snap-1", conf)
    val before = QueryEngine.search(spark, QueryEngine.open(root), QuerySpec(
      subqueries = Seq(Subquery(include = Seq("3", "5", "2"), exclude = Seq("4")))))

    // simulate a crash after the postings stage: wipe later stage outputs+markers
    val dir = Snapshots.stagingDir(root, "snap-1")
    Seq("_DONE_term_stats", "_DONE_fwd").foreach(m => Files.deleteIfExists(dir.resolve(m)))
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) Files.list(p).forEach(rm)
      Files.deleteIfExists(p)
    }
    rm(dir.resolve("term_stats")); rm(dir.resolve("fwd"))

    IndexBuilder.buildFromJournal(spark, journal, root, "snap-1", conf) // resume
    val after = QueryEngine.search(spark, QueryEngine.open(root), QuerySpec(
      subqueries = Seq(Subquery(include = Seq("3", "5", "2"), exclude = Seq("4")))))
    assert(before == after)
    assert(before.map(_.url_id) == Seq(30, 90, 150, 210, 270, 330, 390, 450, 510))
  }

  // --- corpus path: sha256 invariant + engine smoke ---------------------------
  test("tiny corpus builds and per-row content_sha256 matches an independent recomputation") {
    import spark.implicits._
    val root = freshRoot()
    val corpus = Fixtures.tinyCorpus(spark)
    IndexBuilder.buildFromCorpus(spark, corpus.toDF(), root, "snap-1",
      IndexConf(numBuckets = 8, docRangeShift = 8))
    val idx = QueryEngine.open(root)

    // invariant: stored sha equals sha recomputed from the generator content
    val docs = spark.read.parquet(s"${idx.dir}/documents")
      .select($"repo", $"path", $"content_sha256").as[(String, String, String)].collect()
    assert(docs.length == 16 * 64)
    val regen = corpus.collect().map(d => (d.repo, d.path) ->
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(d.content.getBytes("UTF-8")).map(b => f"${b & 0xFF}%02x").mkString).toMap
    docs.foreach { case (repo, path, sha) =>
      assert(regen((repo, path)) == sha, s"sha mismatch for $repo/$path")
    }

    // query smoke: head term matches many docs; repo-local term few
    val head = QueryEngine.search(spark, idx, QuerySpec(
      subqueries = Seq(Subquery(include = Seq("tok000")))))
    assert(head.nonEmpty)
    val local = QueryEngine.search(spark, idx, QuerySpec(
      subqueries = Seq(Subquery(include = Seq("rl_3_0")))))
    assert(local.nonEmpty)
    assert(local.forall(_.domain_id == 3))
    // conjunction with exclusion
    val conj = QueryEngine.search(spark, idx, QuerySpec(
      subqueries = Seq(Subquery(include = Seq("alpha", "beta"), exclude = Seq("gamma")))))
    assert(conj.isEmpty) // alpha/beta/gamma always co-occur in the fixture
  }
}
