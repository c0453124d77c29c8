package graft

import graft.build.{IndexBuilder, IndexConf, JournalRow, KeywordRow}
import graft.core.{DocId, DocMeta, WordFlags, WordMeta}
import graft.query._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Q3 deterministic variants: the reference's primary faithful query variant
  * OMITS glue words (QueryVariants.isOmittableWord:205-210 — "the spark"
  * searches for "spark"), keeping the identity variant as a fallback. */
class QueryVariantsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-qvariants")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def journal = {
    import spark.implicits._
    def row(id: Int, words: Seq[String]): JournalRow = JournalRow(
      doc_id = DocId.combine(1, id), url_id = id, domain_id = 1,
      rank = DocMeta.UnknownRank, doc_meta = 0L, length = words.length,
      repo = "r", path = s"d$id", commit = "", lang = "",
      content_sha256 = "",
      // one shared position bit: the quoted-phrase test needs the terms to
      // co-occur in a position group for its coherence backstop
      keywords = words.map(w =>
        KeywordRow(w, WordMeta.encode(2L, WordFlags.Title), 1)).toArray)
    Seq(
      row(1, Seq("the", "spark")),
      row(2, Seq("spark")),
      row(3, Seq("the")),
      row(4, Seq("query"))).toDF()
  }

  private lazy val index: QueryEngine.Index = {
    val root = Files.createTempDirectory(java.nio.file.Paths.get("target"), "qvar").toString
    IndexBuilder.buildFromJournal(spark, journal, root, "snap-1",
      IndexConf(numBuckets = 4, docRangeShift = 4))
    QueryEngine.open(root, spark)
  }

  private def run(terms: String*): Set[Int] =
    QueryEngine.search(spark, index, QuerySpec(
      subqueries = Seq(Subquery(include = terms)),
      limitByDomain = Int.MaxValue, limitTotal = Int.MaxValue))
      .map(_.url_id).toSet

  test("omittable glue word dropped in the faithful variant: 'the spark' finds all spark docs") {
    assert(run("the", "spark") === Set(1, 2))
  }

  test("identity variant retained: non-omittable conjunctions unchanged") {
    assert(run("spark") === Set(1, 2))
    assert(run("spark", "query") === Set.empty)
  }

  test("a lone omittable word is not dropped (reference keeps single words)") {
    assert(run("the") === Set(1, 3))
  }

  test("missing NON-omittable term still kills the subquery") {
    assert(run("the", "absentword") === Set.empty)
  }

  test("omittable dropping composes with quoted-phrase exemption") {
    // coherences present ⇒ no dropping (parity with the reference, which
    // pre-joins quoted spans before variant generation)
    val spec = QuerySpec(
      subqueries = Seq(Subquery(include = Seq("the", "spark"),
        coherences = Seq(Seq("the", "spark")))),
      limitByDomain = Int.MaxValue, limitTotal = Int.MaxValue)
    assert(QueryEngine.search(spark, index, spec).map(_.url_id).toSet === Set(1))
  }
}
