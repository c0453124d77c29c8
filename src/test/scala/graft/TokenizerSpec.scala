package graft

import graft.analysis.{TfIdfDict, Tokenizer}
import graft.build.TermFreqDict
import graft.core.{WordFlags, WordMeta}
import graft.fixtures.Fixtures
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class TokenizerSpec extends AnyFunSuite {

  test("identifierParts splits camelCase, snake_case, acronym runs, digits") {
    def parts(s: String) = Tokenizer.identifierParts(s).toSeq
    assert(parts("IndexJournalWriter") == Seq("Index", "Journal", "Writer"))
    assert(parts("HTTPServer") == Seq("HTTP", "Server"))
    assert(parts("parse2Json") == Seq("parse2", "Json"))
    assert(parts("snake_case_name") == Seq("snake", "case", "name"))
    assert(parts("dotted.path/mixed-kebab") == Seq("dotted", "path", "mixed", "kebab"))
    assert(parts("single") == Seq())           // <=1 part → empty
    assert(parts("UPPERCASE") == Seq())
    assert(parts("a.b") == Seq("a", "b"))
  }

  test("word shape gate and junk filter") {
    assert(Tokenizer.isIndexableWord("foo"))
    assert(Tokenizer.isIndexableWord("foo.bar-baz"))
    assert(!Tokenizer.isIndexableWord("x" * 70))
    assert(Tokenizer.isJunk("1234567890123456789"))
    assert(!Tokenizer.isJunk("version123"))
  }

  test("TfIdfHigh flag follows the reference WordsTfIdfCounts formula") {
    // value = -75·(0.1 + 0.9·tf/maxTf)·ln(freq/docCount), flag iff tf>1 ∧ >100
    val dict = TfIdfDict(Map("common" -> 900L), 1000.0)
    val a = Tokenizer.analyze("r", "p", "md",
      "header x\nrare rare common common once\n", 5, 0, dict)
    val flagsOf = a.keywords.map(k => k.term -> WordMeta.flags(k.meta)).toMap
    assert((flagsOf("rare") & WordFlags.TfIdfHigh) != 0,
      s"rare term not flagged: ${flagsOf("rare")}")       // ln(1/1000)·-75 = 518
    assert((flagsOf("common") & WordFlags.TfIdfHigh) == 0) // ln(900/1000)·-75 ≈ 8
    assert((flagsOf("once") & WordFlags.TfIdfHigh) == 0)   // tf = 1 → never flagged
    // no dict → no flag
    val b = Tokenizer.analyze("r", "p", "md", "header x\nrare rare\n", 5, 0)
    assert((WordMeta.flags(b.keywords.find(_.term == "rare").get.meta) & WordFlags.TfIdfHigh) == 0)
  }

  test("QueryParser grammar: quotes, ops, limits, degenerate input") {
    import graft.query.{QueryParser, SpecLimit}
    val s = QueryParser.parse("\"alpha beta\" foo -bar ?baz lang:scala year>2000 q<5 rank=3 size>10")
    val sq = s.subqueries.head
    assert(sq.include == Seq("alpha", "beta", "foo"))
    assert(sq.exclude == Seq("bar"))
    assert(sq.priority == Seq("baz"))
    assert(sq.advice == Seq("lang:scala"))
    assert(sq.coherences == Seq(Seq("alpha", "beta")))
    assert(s.year == SpecLimit.greaterThan(2000))
    assert(s.quality == SpecLimit.lessThan(5))
    assert(s.rank == SpecLimit.equalTo(3))
    assert(s.size == SpecLimit.greaterThan(10))
    // degenerate inputs parse without blowing up
    assert(QueryParser.parse("").subqueries.head.include.isEmpty)
    assert(QueryParser.parse("\"unclosed").subqueries.head.include == Seq("unclosed"))
    assert(QueryParser.parse("-").subqueries.head.include == Seq("-"))
    assert(QueryParser.parse("FOO Foo foo").subqueries.head.include == Seq("foo"))
  }

  test("TermFreqDict job computes corpus df through the same front-end") {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    val corpus = Fixtures.corpus(spark, 4, 32).toDF()
    val dfTable = TermFreqDict.compute(spark, corpus)
    val dict = TermFreqDict.collectDict(spark, dfTable, 4 * 32, maxTerms = 10_000)
    // the Zipf head token appears in nearly every doc; a repo-local term in few
    assert(dict.df("tok000") > 100)
    assert(dict.df.getOrElse("rl_0_0", 0L) < dict.df("tok000"))
    assert(dict.docCount == 128.0)
  }
}
