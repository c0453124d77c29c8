package graft

import graft.build.{IndexBuilder, IndexConf}
import graft.fixtures.Fixtures
import graft.query.{QueryEngine, QueryParser}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Robustness fuzz: the parser and the engine must never throw on arbitrary
  * query strings — the reference's public search box accepts anything. A
  * seeded generator mixes plain words, index vocabulary, quotes, minus/
  * question marks, key:value tokens, parens, `near:`/`site:`/`qs=`, dangling
  * operators, and junk unicode; every string must parse, and every parsed
  * spec must evaluate against a real snapshot without an exception. */
class QueryFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-fuzz")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val root: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzz").toString
    IndexBuilder.buildFromCorpus(spark, Fixtures.tinyCorpus(spark).toDF(), dir, "snap-1", IndexConf(8, 8))
    dir
  }

  private val frags = Array(
    "tok000", "tok001", "rl_0_1", "alpha", "beta", "nosuchword", "the",
    "\"alpha beta\"", "\"tok000", "-tok001", "-", "?tok002", "?",
    "lang:scala", "lang:", "ext:", "repo:org0000/repo0001", "near:org0000/repo0001",
    "near:", "site:org0000/repo0001", "site:", "qs=2", "qs=", "qs=x",
    "(advice)", "(", ")", "()", "year>=2000", "year<1990", "year>=",
    "tok000_tok001", "a_b_c", "élève", "中文", "%", "*", "\\", ":",
    "\"\"", "''", "  ", "-\"quoted phrase\"", "?\"q p\"", "tok000-tok001", "3.14")

  test("500 seeded random query strings: parse and search never throw") {
    val rnd = new scala.util.Random(42)
    val idx = QueryEngine.open(root, spark)
    for (i <- 1 to 500) {
      val n = 1 + rnd.nextInt(6)
      val q = Seq.fill(n)(frags(rnd.nextInt(frags.length))).mkString(" ")
      val spec =
        try QueryParser.parse(q)
        catch { case e: Exception => fail(s"parse threw on <$q>: $e") }
      try QueryEngine.search(spark, idx, spec)
      catch { case e: Exception => fail(s"search threw on <$q>: $e") }
    }
  }

  test("concurrent serving: 8 threads × mixed queries return exactly the " +
    "serial results (shared Index caches are thread-safe)") {
    val idx = QueryEngine.open(root, spark)
    val queries = Seq("tok000", "tok001 tok002", "tok000 -tok003", "\"alpha beta\"",
      "rl_0_1", "tok004 ?tok005", "lang:scala tok000", "tok006 tok007 tok008")
    val serial = queries.map(q => QueryParser.parse(q))
      .map(s => QueryEngine.search(spark, idx, s).map(r => (r.url_id, r.domain_id, r.score)))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    for (_ <- 1 to 3) { // three rounds to vary interleavings
      val par = Await.result(
        Future.sequence(queries.map(q => Future {
          QueryEngine.search(spark, idx, QueryParser.parse(q)).map(r => (r.url_id, r.domain_id, r.score))
        })), 120.seconds)
      assert(par === serial)
    }
  }

  test("pathological inputs: empty, whitespace, operator soup, very long") {
    val evil = Seq("", "   ", "\"", "-", "?", "(", ")", "((((", "))))",
      "near: site: qs= lang:", ":::::", "- - - -", "\"a b\" \"c d\" \"e f\"",
      ("tok000 " * 200).trim, "a" * 500)
    val idx = QueryEngine.open(root, spark)
    for (q <- evil) {
      val spec = QueryParser.parse(q)
      QueryEngine.search(spark, idx, spec) // must not throw; may be empty
    }
  }
}
