package graft

import graft.ops.CurationOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** p1: the composed curation chain — every stage must drop exactly its own
  * victim, and survivors pack into contiguous budget chunks. */
class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-curation")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def docsOf(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "n_chars")

  test("each stage drops its victim; survivors pack contiguously") {
    // quality math (stops: the/a/of/and/is; q = 0.5·stopRatio
    // + 0.3·min(1, n/100) + 0.2·[avgLen∈[3,8]]):
    //   docs 1, 6: 8 toks, 2 stops → q ≈ 0.349 — keep
    //   doc 2: byte-identical to doc 1 → exact-dedup drop (doc 1 is min id)
    //   doc 3: contains the benchmark 2-gram "purple elephant" → decontam drop
    //   doc 4: zero stopwords → language-gate drop
    //   doc 5: 1-char tokens → q ≈ 0.087 < 0.2 → quality-gate drop
    val corpus = docsOf(
      1L -> "the cat sat on the mat today okay",
      2L -> "the cat sat on the mat today okay",
      3L -> "we saw a purple elephant dancing around today",
      4L -> "alpha beta gamma delta epsilon zeta eta theta",
      5L -> "a y z w v u t s",
      6L -> "the dog ran far and fast once more")
    val bench = docsOf(100L -> "purple elephant")

    val out = CurationOps.curate(corpus, bench, n = 2, minQuality = 0.2, budget = 8L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

    // survivors 1 and 6 (8 tokens each) fill chunks 0 and 1 exactly
    assert(out === Seq(("en", 1L, 0L, 8L), ("en", 6L, 1L, 8L)))
  }

  test("a doc spanning a chunk boundary splits with the right token counts") {
    val corpus = docsOf(
      1L -> "the cats sat upon the mats",        // 6 toks, keep (avgLen 3.5)
      2L -> "the dog and cat ran far away fast") // 8 toks, keep
    val out = CurationOps.curate(corpus, docsOf(), n = 2, minQuality = 0.2, budget = 8L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // doc 1: [0,6) in chunk 0; doc 2: [6,14) → 2 toks in chunk 0, 6 in chunk 1
    assert(out === Seq((1L, 0L, 6L), (2L, 0L, 2L), (2L, 1L, 6L)))
  }

  test("empty benchmark and no duplicates: chain reduces to the gates") {
    val corpus = docsOf(
      1L -> "the cat sat on the mat today okay",
      4L -> "alpha beta gamma delta epsilon zeta eta theta")
    val out = CurationOps.curate(corpus, docsOf(), n = 2, minQuality = 0.2, budget = 8L)
    assert(out.select("doc_id").as[Long].collect().toSeq === Seq(1L))
  }
}
