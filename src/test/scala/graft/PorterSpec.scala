package graft

import graft.analysis.{Porter, Tokenizer}
import graft.build.{IndexBuilder, IndexConf}
import graft.query.{QueryEngine, QueryParser}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Porter stemmer vocabulary checks (derived by hand from the published
  * algorithm, M.F. Porter 1980 + the author's reference implementation) and
  * the stemmed end-to-end retrieval path (C2). */
class PorterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-porter")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("vocabulary") {
    val cases = Seq(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      "feed" -> "feed", "plastered" -> "plaster", "motoring" -> "motor",
      "sing" -> "sing", "sized" -> "size", "hopping" -> "hop",
      "tanned" -> "tan", "falling" -> "fall", "hissing" -> "hiss",
      "failing" -> "fail", "filing" -> "file",
      "happy" -> "happi", "sky" -> "sky",
      "relational" -> "relat", "digitizer" -> "digit",
      "operator" -> "oper", "feudalism" -> "feudal",
      "decisiveness" -> "decis", "hopefulness" -> "hope",
      "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
      "electrical" -> "electr", "hopeful" -> "hope", "goodness" -> "good",
      "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
      "adjustable" -> "adjust", "replacement" -> "replac",
      "adoption" -> "adopt", "communism" -> "commun", "activate" -> "activ",
      "effective" -> "effect", "generalization" -> "gener",
      "running" -> "run", "runs" -> "run")
    cases.foreach { case (in, want) =>
      assert(Porter.stem(in) === want, s"stem($in)")
    }
  }

  test("non-alpha and short tokens pass through unchanged") {
    Seq("sha256", "i18n", "a", "io", "index_journal", "utf-8").foreach { t =>
      assert(Porter.stem(t) === t)
    }
  }

  test("stemmed index retrieves across inflections; unstemmed does not") {
    import spark.implicits._
    val corpus = Seq(
      ("r1", "a.txt", "c1", "en", "the runner was running fast"),
      ("r1", "b.txt", "c2", "en", "she runs daily marathons"),
      ("r1", "c.txt", "c3", "en", "a single run before breakfast"),
      ("r1", "d.txt", "c4", "en", "nothing related here at all"))
      .toDF("repo", "path", "commit", "lang", "content")

    val rootS = java.nio.file.Files.createTempDirectory("porter-idx-s").toString
    IndexBuilder.buildFromCorpus(spark, corpus, rootS, "snap-1",
      IndexConf(numBuckets = 4, docRangeShift = 4, stemming = true))
    val idxS = QueryEngine.open(rootS)
    val hitsS = QueryEngine.search(spark, idxS, QueryParser.parse("running"))
    assert(hitsS.size === 3, s"stemmed index must match run/runs/running, got $hitsS")

    val rootU = java.nio.file.Files.createTempDirectory("porter-idx-u").toString
    IndexBuilder.buildFromCorpus(spark, corpus, rootU, "snap-1",
      IndexConf(numBuckets = 4, docRangeShift = 4))
    val idxU = QueryEngine.open(rootU)
    assert(QueryEngine.search(spark, idxU, QueryParser.parse("running")).size === 1)

    // synthetic terms are never stemmed: lang: filter works in both modes
    assert(QueryEngine.search(spark, idxS,
      QueryParser.parse("running lang:en")).size === 3)
  }
}
