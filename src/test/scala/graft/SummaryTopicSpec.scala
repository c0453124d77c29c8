package graft

import graft.ops.TextOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** T9 topic scorer (reference topic-detection testP transcription) and
  * T10 summary extraction (SummaryExtractor analog). */
class SummaryTopicSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-sumtopic")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  // ---- t9 ------------------------------------------------------------------

  test("topic score: geometric saturation closed form v*(2 - 2^(1-tf))") {
    // "a a b": a tf=2 -> 0.1*1.5 = 0.15; b tf=1 -> -0.05*1; sum 0.1; 3 tokens
    // below AVG_LENGTH so penalty = 1
    val out = TextOps.topicScore(docsOf("a a b"), Map("a" -> 0.1, "b" -> -0.05))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(0L) === 0.1)
  }

  test("topic score: no lexicon hit ⇒ 0; every doc is emitted") {
    val out = TextOps.topicScore(docsOf("x y z", "a"), Map("a" -> 0.2))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === Map(0L -> 0.0, 1L -> 0.2))
  }

  test("topic score: length penalty sqrt(AVG)/sqrt(max(AVG, n))") {
    // 4000 tokens, one hit: penalty = sqrt(1000/4000) = 0.5
    val text = ("a" +: Seq.fill(3999)("x")).mkString(" ")
    val out = TextOps.topicScore(docsOf(text), Map("a" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(0L) === 0.05)
  }

  test("topic score: stem=true folds inflections onto the stemmed lexicon") {
    // Porter: running -> run, runs -> run ⇒ tf=2 ⇒ 0.1*1.5
    val out = TextOps.topicScore(docsOf("running runs"), Map("run" -> 0.1), stem = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(0L) === 0.15)
  }

  // ---- t10 -----------------------------------------------------------------

  private val words = Seq("customer", "spark", "stream")

  test("summary: best window by count of DISTINCT important words present") {
    val text = "x x x x customer x x x spark stream x x"
    val r = TextOps.summarize(docsOf(text), words, window = 4).collect().head
    assert(r.getLong(1) === 2L)            // win 2
    assert(r.getLong(2) === 2L)            // two distinct words present
    assert(r.getString(3) === "spark stream x x")
  }

  test("summary: repeated hits of the SAME word count once; ties pick the earliest window") {
    // win0 has customer twice (1 distinct), win1 has spark once (1 distinct)
    val text = "customer customer x x spark x x x"
    val r = TextOps.summarize(docsOf(text), words, window = 4).collect().head
    assert(r.getLong(1) === 0L && r.getLong(2) === 1L)
  }

  test("summary: zero hits anywhere falls back to the opening window") {
    val r = TextOps.summarize(docsOf("x y z w v u"), words, window = 4).collect().head
    assert(r.getLong(1) === 0L && r.getLong(2) === 0L)
    assert(r.getString(3) === "x y z w")
  }

  test("summary: truncatedCharacters cleanup and 255-char abbreviation") {
    // ' !!! ' is a ≥3 run of non-alphanumerics spanning the token gap —
    // SummaryExtractor.java:17 replaces the run with one space
    val r = TextOps.summarize(docsOf("customer !!! b"), words, window = 4).collect().head
    assert(r.getString(3) === "customer b")
    val long = ("customer " + Seq.fill(300)("y").mkString(" "))
    val r2 = TextOps.summarize(docsOf(long), words, window = 512).collect().head
    assert(r2.getString(3).length === 255)
  }
}
