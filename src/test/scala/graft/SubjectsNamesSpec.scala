package graft

import graft.analysis.Tokenizer
import graft.build.{CorpusDoc, IndexBuilder, IndexConf}
import graft.core.{WordFlags, WordMeta}
import graft.query._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** A9/K5 deterministic Subjects/NamesWords analogs (VERDICT r2 task #4):
  * capitalized-run names and sentence-lead subjects assign the flags the
  * prio-BM25 mask counts (Bm25Factor.java:37-57), so they must (a) land in
  * the journal and (b) change engine ranking order. */
class SubjectsNamesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-subjects-names")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def flagsOf(content: String, ngrams: Boolean = false): Map[String, Int] =
    Tokenizer.analyze("r", "p", "", content, ngrams = ngrams)
      .keywords.map(k => k.term -> WordMeta.flags(k.meta)).toMap

  test("NamesWords: capitalized singles at count >= 3; all-caps never") {
    val f = flagsOf("Alice builds things\nAlice ships code\nAlice writes docs\n" +
      "Bob builds things\nBob ships code\nAPI calls here\nAPI calls there\nAPI calls now\n")
    assert((f("alice") & WordFlags.NamesWords) != 0, "3× capitalized → flagged")
    assert((f("bob") & WordFlags.NamesWords) == 0, "2× capitalized → below minCount+1")
    assert((f("api") & WordFlags.NamesWords) == 0, "all-caps singles skipped (NameLikeKeywords:30-31)")
  }

  test("NamesWords: capitalized span terms at count >= 2 (ngram index)") {
    val f = flagsOf("John Smith arrives today\nJohn Smith leaves tomorrow\n", ngrams = true)
    assert((f("john_smith") & WordFlags.NamesWords) != 0, "2× capitalized pair → flagged span")
    assert((f("john") & WordFlags.NamesWords) == 0, "singles still below 3")
  }

  test("Subjects: sentence-lead token with >= 2 following tokens") {
    val f = flagsOf("header common\ntarget does things\nab\n")
    assert((f("target") & WordFlags.Subjects) != 0, "lead of a >= 3-token line")
    assert((f("does") & WordFlags.Subjects) == 0, "non-lead")
    assert((f("ab") & WordFlags.Subjects) == 0, "short line has no subject span")
  }

  test("Subjects flag changes engine order through prio BM25") {
    import spark.implicits._
    // identical token multisets; only docA has the query term in subject
    // position. Paths order docB first, so without the flag the tie-break
    // (equal scores → urlId) returns docB; with it, docA must win.
    // 48 filler docs push idf off the 2-doc floor (a 2-doc corpus normalizes
    // both candidates onto the 10.0 default-score cap)
    val corpus = (Seq(
      CorpusDoc("r1", "b.txt", "c1", "txt", "header common\ntarget does things\n"),
      CorpusDoc("r1", "a.txt", "c2", "txt", "header common\nthings target does\n")) ++
      (0 until 48).map(i => CorpusDoc("r1", f"pad$i%02d.txt", s"p$i", "txt",
        s"header common\npad$i words here\n"))).toDF()
    val root = Files.createTempDirectory(java.nio.file.Paths.get("target"), "subj").toString
    IndexBuilder.buildFromCorpus(spark, corpus, root, "snap-1", IndexConf(4, 4))
    val idx = QueryEngine.open(root, spark)
    val spec = QuerySpec(Seq(Subquery(include = Seq("target"))), limitTotal = 2)
    val flagged = QueryEngine.search(spark, idx, spec)
    assert(flagged.size === 2)
    assert(flagged.head.score < flagged(1).score, "Subjects doc scores strictly better")

    // control: same journal with Subjects masked out of every term meta —
    // scores tie and the comparator falls back to urlId order
    val journal = spark.read.parquet(s"$root/snapshots/snap-1/journal")
    val masked = journal.withColumn("keywords",
      transform(col("keywords"), k => struct(
        k.getField("term").as("term"),
        k.getField("meta").bitwiseAND(lit(~WordFlags.Subjects.toLong)).as("meta"),
        k.getField("tf").as("tf"))))
    val root2 = Files.createTempDirectory(java.nio.file.Paths.get("target"), "subj2").toString
    IndexBuilder.buildFromJournal(spark, masked, root2, "snap-1", IndexConf(4, 4))
    val control = QueryEngine.search(spark, QueryEngine.open(root2, spark), spec)
    assert(control.size === 2)
    assert(control.head.score === control(1).score, "without the flag the docs tie")
    assert(control.head.url_id < control(1).url_id, "tie broken by urlId")
    // the flag changed the winner: the Subjects doc is docA
    // (path b.txt → the LARGER urlId in repo r1)
    assert(flagged.head.url_id === 2)
    assert(control.head.url_id === 1)
  }

  test("qs= strategy: RF_TITLE keeps only docs where every term is title-flagged") {
    import spark.implicits._
    val corpus = Seq(
      CorpusDoc("r1", "a.txt", "c1", "txt", "target here\nmore words\n"),
      CorpusDoc("r1", "b.txt", "c2", "txt", "header junk\ntarget words here\n")).toDF()
    val root = Files.createTempDirectory(java.nio.file.Paths.get("target"), "qs").toString
    IndexBuilder.buildFromCorpus(spark, corpus, root, "snap-1", IndexConf(4, 4))
    val idx = QueryEngine.open(root, spark)
    val both = QueryEngine.search(spark, idx, QueryParser.parse("target"))
    assert(both.size === 2)
    val parsed = QueryParser.parse("target qs=rf_title")
    assert(parsed.strategy === QueryStrategy.RequireFieldTitle)
    assert(parsed.subqueries.head.include === Seq("target"), "qs= is not an include term")
    val titled = QueryEngine.search(spark, idx, parsed)
    assert(titled.map(_.url_id) === Seq(1), "only the title-flagged doc survives RF_TITLE")
    // unknown strategy degrades to AUTO (reference default branch)
    assert(QueryParser.parse("target qs=bogus").strategy === QueryStrategy.Auto)
  }
}
