package graft

import graft.analysis.Tokenizer
import graft.build.{IndexBuilder, IndexConf}
import graft.core.{DocMeta, Hashes, WordFlags, WordMeta}
import graft.fixtures.Fixtures
import graft.query._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Reference query set over the §1 corpus (FIXTURES.md §3): 32 queries
  * covering every operator class from SURVEY §2.9, each checked for top-k
  * rank identity (docIDs AND scores) against an independent single-threaded
  * oracle that re-implements the reference formulas
  * (ResultValuator.java:40-147, Bm25Factor.java:15-79,
  * TermCoherenceFactor.java:9-31) from scratch — never the engine's
  * Scoring/QueryKernel code. */
class RankIdentitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-rank-identity")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  // ---- engine index over the tiny corpus ------------------------------------
  private lazy val index: QueryEngine.Index = {
    val root = Files.createTempDirectory(java.nio.file.Paths.get("target"), "rankid").toString
    IndexBuilder.buildFromCorpus(spark, Fixtures.tinyCorpus(spark).toDF(), root, "snap-1",
      IndexConf(numBuckets = 16, docRangeShift = 8))
    QueryEngine.open(root)
  }

  // ---- independent oracle ----------------------------------------------------
  /** Brute-force evaluation over the generator output. Shares only the
    * analysis front-end (Tokenizer) with the engine — retrieval, scoring and
    * selection are re-derived from the reference sources independently. */
  object BruteOracle {
    final case class Doc(urlId: Int, domainId: Int, ranking: Int, docMeta: Long,
                         kw: Map[String, Long])

    lazy val docs: Vector[Doc] = {
      val all = (0L until (16 * 64).toLong).map(j => Fixtures.genDoc(j, 16, 64))
      // replicate the builder's deterministic id assignment: repos sorted
      // ascending; within a repo docs sorted by (path, commit)
      val byRepo = all.groupBy(_.repo).toSeq.sortBy(_._1)
      var offset = 0L
      val out = Vector.newBuilder[Doc]
      byRepoZip(byRepo).foreach { case (repoId, docsOfRepo) =>
        docsOfRepo.sortBy(d => (d.path, d.commit)).zipWithIndex.foreach { case (d, i) =>
          val urlId = (offset + i + 1).toInt
          val rank = IndexBuilder.repoRank(d.repo)
          val a = Tokenizer.analyze(d.repo, d.path, d.lang, d.content, rank)
          out += Doc(urlId, repoId, rank, a.docMeta,
            a.keywords.map(k => k.term -> k.meta).toMap)
        }
        offset += docsOfRepo.size
      }
      out.result()
    }
    private def byRepoZip(byRepo: Seq[(String, Seq[graft.build.CorpusDoc])]) =
      byRepo.zipWithIndex.map { case ((_, ds), i) => (i, ds) }

    lazy val n: Long = docs.size.toLong
    lazy val dfFull: Map[String, Long] =
      docs.flatMap(_.kw.keys).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    lazy val dfPrio: Map[String, Long] = {
      val prioMask = (WordFlags.Title | WordFlags.Subjects | WordFlags.TfIdfHigh |
        WordFlags.NamesWords | WordFlags.Site | WordFlags.SiteAdjacent |
        WordFlags.UrlPath | WordFlags.UrlDomain).toLong
      docs.flatMap(d => d.kw.filter { case (_, m) => (m & prioMask) != 0L }.keys)
        .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    }

    // -- reference math, transcribed afresh ---------------------------------
    private def idf(df: Long): Double = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    private def posOf(meta: Long): Long = (meta >>> 8) & 0xFF_FFFF_FFFF_FFFFL
    private def bitsOf(v: Long): Int = java.lang.Long.bitCount(v)

    def score(d: Doc, variants: Seq[Subquery], hasPrio: Boolean): Option[Double] = {
      var best = 10.0
      var anyVariant = false
      var maxMinFlags = 0; var maxMinPos = 0; var anyAllSyn = false
      variants.foreach { v =>
        val cohOk = v.coherences.forall { set =>
          var m = 0xFF_FFFF_FFFF_FFFFL
          set.foreach(t => m &= posOf(d.kw.getOrElse(t, 0L)))
          m != 0L
        }
        if (cohOk) {
          anyVariant = true
          val metas = v.include.map(t => (t, d.kw.getOrElse(t, 0L)))
          var minFlags = 8; var minPos = 4; var allSyn = metas.nonEmpty
          metas.foreach { case (_, m) =>
            minFlags = math.min(minFlags, bitsOf(m &
              (WordFlags.Title | WordFlags.Subjects | WordFlags.UrlDomain | WordFlags.UrlPath).toLong))
            minPos = math.min(minPos, bitsOf(posOf(m)))
            allSyn &&= (m & WordFlags.Synthetic.toLong) == WordFlags.Synthetic.toLong
          }
          maxMinFlags = math.max(maxMinFlags, minFlags)
          maxMinPos = math.max(maxMinPos, minPos)
          anyAllSyn ||= allSyn
          val regular = metas.filterNot { case (t, m) =>
            t.contains(":") || (m & WordFlags.Synthetic.toLong) == WordFlags.Synthetic.toLong }
          if (regular.nonEmpty) {
            val len = 5000
            val bm = regular.map { case (t, m) =>
              val c = bitsOf(posOf(m)).toDouble
              idf(math.max(1L, dfFull.getOrElse(t, 1L))) *
                (c * 2.2) / (c + 1.2 * (1 - 0.5 + 0.5 * len / 5000.0))
            }.sum
            val prioBm25Mask = (WordFlags.Site | WordFlags.SiteAdjacent |
              WordFlags.UrlPath | WordFlags.UrlDomain | WordFlags.Subjects).toLong
            val bmp = regular.map { case (t, m) =>
              val c = bitsOf(m & prioBm25Mask).toDouble
              idf(math.max(1L, dfPrio.getOrElse(t, 1L))) * (c * 2.5) / (c + 1.5)
            }.sum
            var cohMask = 0xFF_FFFF_FFFF_FFFFL
            regular.foreach { case (_, m) => cohMask &= posOf(m) }
            val tcf = 2.0 * math.pow(bitsOf(cohMask) / 56.0, 0.25)
            val asl = DocMeta.asl(d.docMeta)
            val quality = DocMeta.quality(d.docMeta)
            val over = (if (asl >= 2) 0.0 else -5.0) + 0.0 /*len 5000 > 2000*/ +
              -quality / 15.0 + (255.0 - d.ranking) / 25.0 + math.log(1.0) +
              (if (hasPrio) 2.0 else 0.0)
            val raw = math.max(0.0, bm + bmp + tcf + over)
            best = math.min(best, math.sqrt(251.0 / (1.0 + raw / regular.size)))
          }
        }
      }
      if (!anyVariant) None
      else if (maxMinFlags == 0 && !anyAllSyn && maxMinPos == 0) None
      else Some(best)
    }

    def run(spec: QuerySpec): Seq[(Int, Double)] = {
      val live = spec.subqueries.filter(sq => sq.include.nonEmpty &&
        (sq.include ++ sq.advice).forall(t => dfFull.getOrElse(t, 0L) > 0L))
      if (live.isEmpty) return Nil
      val cands = docs.flatMap { d =>
        val matches = live.exists(sq =>
          (sq.include ++ sq.advice).forall(d.kw.contains) && !sq.exclude.exists(d.kw.contains))
        if (!matches) None
        else if (spec.domains.nonEmpty && !spec.domains.contains(d.domainId)) None
        else if (!spec.quality.test(DocMeta.quality(d.docMeta))) None
        else if (!spec.year.test(DocMeta.year(d.docMeta))) None
        else if (!spec.size.test(DocMeta.size(d.docMeta))) None
        else if (!spec.rank.test(DocMeta.rank(d.docMeta))) None
        else {
          val hasPrio = live.exists(_.priority.exists(p => d.kw.getOrElse(p, 0L) != 0L))
          score(d, live, hasPrio).map(s => (d, hasPrio, s))
        }
      }
      val ordered = cands.sortBy { case (d, hp, s) => (!hp, s, d.ranking, d.urlId) }
      val perDomain = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
      val sel = Seq.newBuilder[(Int, Double)]
      var kept = 0
      ordered.foreach { case (d, _, s) =>
        if (kept < spec.limitTotal && perDomain(d.domainId) < spec.limitByDomain) {
          perDomain(d.domainId) += 1; kept += 1; sel += ((d.urlId, s))
        }
      }
      sel.result()
    }
  }

  // ---- the reference query set ----------------------------------------------
  /** 32 queries: conjunctive 1/2/3-term over head/tail/mixed df, disjunction
    * (multi-subquery union), exclusion, priority, phrase/coherence, synthetic
    * (`lang:`/`ext:` advice), and metadata limits. String forms run through
    * QueryParser so the parser is under the same identity check. */
  val parsed: Seq[String] = Seq(
    "tok000", "tok007", "tok042", "tok099",
    "rl_3_0", "rl_7_4", "f64", "f127",
    "tok000 tok001", "tok003 tok017", "tok050 rl_5_2", "f32 tok002",
    "tok000 tok001 tok002", "tok010 tok020 tok030", "rl_2_1 tok005 tok006",
    "tok000 -tok001", "tok002 -rl_0_0", "f16 -tok099",
    "tok004 ?rl_4_0", "tok001 ?f256", "?rl_1_1 tok008",
    "\"alpha beta gamma\"", "\"alpha beta\" tok000", "\"header module\"",
    "lang:scala tok003", "ext:md tok001", "lang:py rl_6_3",
    "tok005 q<9", "tok006 rank>100", "tok009 rank<100", "tok011 q>2 rank>50")
  val structured: Seq[(String, QuerySpec)] = Seq(
    "disjunction_2sq" -> QuerySpec(
      subqueries = Seq(Subquery(include = Seq("tok031")), Subquery(include = Seq("tok032"))),
      limitByDomain = 10, limitTotal = 10))

  test("32 reference queries are rank-identical (ids and scores) engine vs oracle") {
    val specs: Seq[(String, QuerySpec)] =
      parsed.map(q => q -> QueryParser.parse(q, limitByDomain = 10, limitTotal = 10)) ++
        structured
    assert(specs.size == 32)
    var checked = 0
    specs.foreach { case (name, spec) =>
      val expected = BruteOracle.run(spec)
      val got = QueryEngine.search(spark, index, spec).map(r => (r.url_id, r.score))
      assert(got.map(_._1) == expected.map(_._1),
        s"[$name] doc ids differ:\n  engine=${got.map(_._1)}\n  oracle=${expected.map(_._1)}")
      got.zip(expected).foreach { case ((gid, gs), (eid, es)) =>
        assert(math.abs(gs - es) < 1e-9, s"[$name] score mismatch doc $gid/$eid: $gs vs $es")
      }
      checked += 1
    }
    assert(checked == 32)
    // the set must not be vacuous: most queries return something
    val nonEmpty = specs.count { case (_, s) => BruteOracle.run(s).nonEmpty }
    assert(nonEmpty >= 24, s"only $nonEmpty/32 queries returned results")
  }

  test("uncached handle (>4M-doc serving tier) is rank-identical to the cached handle") {
    // the SAME snapshot opened with every driver cache off — the code paths a
    // 10^12-doc index takes: per-query pruned stats job, directory job,
    // pruned forward fetches. Results must match the cached handle (and so
    // the oracle) exactly, including budgeted mode.
    val uncached = QueryEngine.openUncached(index.root, spark)
    assert(uncached.fwdRowCache.isEmpty && uncached.statsCache.isEmpty &&
      uncached.fwdDir.isEmpty && uncached.prioDirCache.isEmpty &&
      uncached.domainRankCache.isEmpty)
    val sample = Seq("tok000", "tok000 tok001", "f32 tok002", "tok002 -rl_0_0",
      "tok004 ?rl_4_0", "\"alpha beta\" tok000", "lang:scala tok003", "tok005 q<9")
    sample.foreach { q =>
      val spec = QueryParser.parse(q, limitByDomain = 10, limitTotal = 10)
      def key(rs: Seq[SearchResult]) =
        rs.map(r => (r.url_id, r.domain_id, r.ranking, r.has_priority_term, r.score))
      val cachedR = key(QueryEngine.search(spark, index, spec))
      val uncachedR = key(QueryEngine.search(spark, uncached, spec))
      assert(uncachedR === cachedR, s"uncached vs cached for '$q'")
      val cachedB = key(QueryEngine.search(spark, index, spec.copy(fetchBudget = 8192L)))
      val uncachedB = key(QueryEngine.search(spark, uncached, spec.copy(fetchBudget = 8192L)))
      assert(uncachedB === cachedB, s"uncached vs cached budgeted for '$q'")
    }
  }
}
