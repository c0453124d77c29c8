package graft.fixtures

import graft.build.{CorpusDoc, JournalRow, KeywordRow}
import graft.core.{DocId, DocMeta, Hashes, WordFlags, WordMeta}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Deterministic test corpora (FIXTURES.md). Everything is seeded; no
  * wall-clock, no unseeded randomness, no external data. */
object Fixtures {

  // ---------------------------------------------------------------------------
  // §2 Factors corpus — rank-identity anchor. Direct port of the reference
  // integration fixture (IndexQueryServiceIntegrationTest.java:168-185):
  // document id ∈ [1, 512) has keywords = decimal strings of the divisors of
  // id; combinedId = id | ((32 - id%32) << 32); word meta =
  // WordMetadata(positions=i, flags={Title}); doc meta =
  // DocumentMetadata(0, 0, 0, 0, id%5, id, id%20, 0).
  // ---------------------------------------------------------------------------

  def factorsOf(id: Int): Array[Int] = (1 to id).filter(id % _ == 0).toArray

  /** willItBlend variant: domainId = 32 - id%32 (doubles as rank via the
    * journal's rank column — the reference's DomainRankings returns 255 for
    * every unknown domain, so rank=255 everywhere). */
  def factorsJournal(spark: SparkSession, domainOf: Int => Int = id => 32 - (id % 32)): DataFrame = {
    import spark.implicits._
    (1 until 512).map { id =>
      val factors = factorsOf(id)
      val kws = factors.zipWithIndex.map { case (f, i) =>
        KeywordRow(f.toString, WordMeta.encode(i.toLong, WordFlags.Title), 1)
      }
      val domain = domainOf(id)
      JournalRow(
        doc_id = DocId.combine(domain, id),
        url_id = id, domain_id = domain,
        rank = DocMeta.UnknownRank, // unknown domains rank 255 (DomainRankings.java:38)
        doc_meta = DocMeta.encode(0, 0, 0, 0, id % 5, id, id % 20, 0),
        length = factors.length,
        repo = s"domain$domain", path = s"doc$id", commit = "", lang = "",
        content_sha256 = "", keywords = kws)
    }.toDF()
  }

  /** testDomainQuery variant: domainId = id/100, default doc meta. */
  def factorsJournalByHundred(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (1 until 512).map { id =>
      val factors = factorsOf(id)
      val kws = factors.zipWithIndex.map { case (f, i) =>
        KeywordRow(f.toString, WordMeta.encode(i.toLong, WordFlags.Title), 1)
      }
      val domain = id / 100
      JournalRow(
        doc_id = DocId.combine(domain, id),
        url_id = id, domain_id = domain,
        rank = DocMeta.UnknownRank,
        doc_meta = 0L,
        length = factors.length,
        repo = s"domain$domain", path = s"doc$id", commit = "", lang = "",
        content_sha256 = "", keywords = kws)
    }.toDF()
  }

  // ---------------------------------------------------------------------------
  // §1 Corpus table — (repo, path, commit, lang, content), seed 42.
  // ---------------------------------------------------------------------------

  final val Dirs = Array("main", "util", "core", "index", "query", "io", "net", "model")
  final val Langs = Array("scala", "java", "py", "md", "sbt")
  final val LangWeights = Array(4, 3, 2, 1, 1) // cumulative 11
  final val ZipfS = 1.2
  final val HeadVocab = 100

  private lazy val zipfCdf: Array[Double] = {
    val w = (1 to HeadVocab).map(r => 1.0 / math.pow(r, ZipfS)).toArray
    val total = w.sum
    w.scanLeft(0.0)(_ + _).tail.map(_ / total)
  }

  private def pickZipf(u: Double): Int = {
    val i = java.util.Arrays.binarySearch(zipfCdf, u)
    math.min(HeadVocab - 1, if (i >= 0) i else -i - 1)
  }

  /** Deterministic per-file PRNG seed: mix the global ordinal with seed 42. */
  private def mix(j: Long): Long = {
    var z = j + 0x9E3779B97F4A7C15L + 42L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def genDoc(j: Long, repos: Int, filesPerRepo: Int): CorpusDoc = {
    val repoIdx = (j / filesPerRepo).toInt
    val repo = "org%04d/repo%04d".format(repoIdx / 16, repoIdx)
    val rng = new scala.util.Random(mix(j))
    val lang = {
      val pick = rng.nextInt(11)
      val idx = LangWeights.scanLeft(0)(_ + _).tail.indexWhere(_ > pick)
      Langs(idx)
    }
    val dir = Dirs(rng.nextInt(Dirs.length))
    val path = "src/%s/F%05d.%s".format(dir, j % filesPerRepo, lang)
    val commit = Hashes.sha256Hex(repo + path + "gen").take(40)

    val sb = new StringBuilder
    // first line: header / Title analog with repo-local term
    sb.append(s"header rl_${repoIdx}_0 module\n")
    val nLines = 6 + rng.nextInt(18)
    var l = 0
    while (l < nLines) {
      val nTok = 3 + rng.nextInt(8)
      var t = 0
      while (t < nTok) {
        val u = rng.nextDouble()
        if (u < 0.85) sb.append("tok%03d".format(pickZipf(rng.nextDouble())))
        else sb.append(s"rl_${repoIdx}_${rng.nextInt(8)}")
        sb.append(' ')
        t += 1
      }
      sb.append('\n')
      l += 1
    }
    // factor markers: file j contains the decimal token of every divisor of j
    if (j > 0) {
      val factors = (1L to math.min(j, 64L)).filter(j % _ == 0) ++
        (if (j > 64) Seq(j) else Nil)
      sb.append(factors.map(f => s"f$f").mkString(" ")).append('\n')
    }
    // fixed fraction embeds the known phrase + an email-like artifact
    if (j % 7 == 0) sb.append("alpha beta gamma\n")
    if (j % 13 == 0) sb.append(s"contact dev${j % 50}@example.org\n")
    CorpusDoc(repo, path, commit, lang, sb.toString)
  }

  /** Distributed deterministic corpus (scales: tiny 16×64, small 64×256,
    * bench 256×4096 — FIXTURES.md §1). */
  def corpus(spark: SparkSession, repos: Int, filesPerRepo: Int): Dataset[CorpusDoc] = {
    import spark.implicits._
    val n = repos.toLong * filesPerRepo
    spark.range(0, n, 1, math.max(spark.sparkContext.defaultParallelism, 8))
      .map(j => genDoc(j, repos, filesPerRepo))
  }

  def tinyCorpus(spark: SparkSession): Dataset[CorpusDoc]  = corpus(spark, 16, 64)
  def smallCorpus(spark: SparkSession): Dataset[CorpusDoc] = corpus(spark, 64, 256)
  def benchCorpus(spark: SparkSession): Dataset[CorpusDoc] = corpus(spark, 256, 4096)
}
