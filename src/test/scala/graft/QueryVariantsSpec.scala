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

  // ---- gated variants: dash-combine / num-split / morph last word ---------
  // (QueryVariants.java:194-268, EnglishDictionary.java:44-165 — corpus-df
  // gates replace the Bloom filter / wordlist / imported-tf-dict backends)

  private def journal2 = {
    import spark.implicits._
    def row(id: Int, words: Seq[String]): JournalRow = JournalRow(
      doc_id = DocId.combine(1, id), url_id = id, domain_id = 1,
      rank = DocMeta.UnknownRank, doc_meta = 0L, length = words.length,
      repo = "r", path = s"d$id", commit = "", lang = "",
      content_sha256 = "",
      keywords = words.map(w =>
        KeywordRow(w, WordMeta.encode(2L, WordFlags.Title), 1)).toArray)
    Seq(
      row(1, Seq("foobar", "baz")),
      row(2, Seq("word_123", "qux")),
      row(3, Seq("tokens")),
      row(4, Seq("token"))).toDF()
  }

  private lazy val index2: QueryEngine.Index = {
    val root = Files.createTempDirectory(java.nio.file.Paths.get("target"), "qvar2").toString
    IndexBuilder.buildFromJournal(spark, journal2, root, "snap-1",
      IndexConf(numBuckets = 4, docRangeShift = 4))
    QueryEngine.open(root, spark)
  }

  private def run2(gate: Long, terms: String*): Set[Int] =
    QueryEngine.search(spark, index2, QuerySpec(
      subqueries = Seq(Subquery(include = terms)),
      limitByDomain = Int.MaxValue, limitTotal = Int.MaxValue,
      morphDfGate = gate))
      .map(_.url_id).toSet

  test("dash-combine variant: 'foo-bar baz' retrieves the doc containing 'foobar'") {
    // identity subquery is dead (no doc holds the literal 'foo-bar'); only
    // the dash-combined variant (gated on df('foobar') > 0) can match
    assert(run2(100L, "foo-bar", "baz") === Set(1))
    // unknown combination ⇒ variant dies too
    assert(run2(100L, "foo-qux", "baz") === Set.empty)
  }

  test("num-split variant: 'word123 qux' retrieves the doc containing 'word_123'") {
    assert(run2(100L, "word123", "qux") === Set(2))
    assert(run2(100L, "nope123", "qux") === Set.empty)
  }

  test("morph last-word variant obeys the df gate") {
    // gate 0: variant 'tokens' (df 1 > 0) joins the identity 'token'
    assert(run2(0L, "token") === Set(3, 4))
    // reference default gate 100: df 1 fails the tf>100 analog ⇒ identity only
    assert(run2(100L, "token") === Set(4))
  }

  // ---- pure transcription checks ------------------------------------------

  test("numWordBoundary analog finds letter↔digit boundaries") {
    assert(Q3Variants.numBoundaries("word123") === Seq(3))
    assert(Q3Variants.numSplitCandidates("a1b") === Seq("a_1b", "a1_b"))
    assert(Q3Variants.numSplitCandidates("abc") === Nil)
    assert(Q3Variants.numSplitCandidates("lang:scala3") === Nil) // synthetics exempt
  }

  test("dash combination strips interior dashes") {
    assert(Q3Variants.dashCombined("foo-bar") === Some("foobar"))
    assert(Q3Variants.dashCombined("plain") === None)
  }

  test("ingForm doubles the right finals (EnglishDictionary.ingForm:150-164)") {
    assert(Q3Variants.ingForm("cut") === "cutting")
    assert(Q3Variants.ingForm("run") === "running")
    assert(Q3Variants.ingForm("swim") === "swimming")
    assert(Q3Variants.ingForm("stir") === "stirring")
    assert(Q3Variants.ingForm("play") === "playing")
  }

  test("findWordVariants suffix families (EnglishDictionary.findWordVariants:62-148)") {
    val dict = Set("cat", "word", "words", "sarcast", "hummed", "hum", "runs", "running")
    def isWord(w: String) = dict(w)
    assert(Q3Variants.findWordVariants("cats", isWord) === Seq("cat"))
    assert(Q3Variants.findWordVariants("sarcasm", isWord) === Seq("sarcast"))
    assert(Q3Variants.findWordVariants("humming", isWord) === Seq("hum", "hummed").filter(isWord))
    assert(Q3Variants.findWordVariants("run", isWord) === Seq("runs", "running"))
    assert(Q3Variants.findWordVariants("x", isWord) === Nil) // len < 2
  }

  test("variant value prefers rarer parts (evaluateQueries:156-175 ascending)") {
    val df = Map("rare" -> 1L, "common" -> 100000L).withDefaultValue(0L)
    val rare = Q3Variants.variantValue(Seq("rare"), df)
    val common = Q3Variants.variantValue(Seq("common"), df)
    assert(rare < common)
    // underscore words score by their parts
    val split = Q3Variants.variantValue(Seq("rare_common"), df)
    assert(split < common)
  }

  // ---- POS-driven re-segmentation (VERDICT r3 task #3) ----------------------
  // Expected sets are hand-derived from the reference machinery
  // (QueryVariants.getQueryVariants:71-152 + KeywordExtractor
  // .getKeywordsFromSentence:107-177 + getWordSpans:274-326) under the
  // deterministic tagger, on the query shapes the reference's own
  // QueryVariantsTest.java:31-69 exercises.

  private def segs(q: String): Set[Seq[String]] =
    PosSegments.segmentations(q.split(" ").toIndexedSeq, _ => 0L).toSet

  test("two content words: identity + joined span (reference 'mechanical keyboard')") {
    assert(segs("mechanical keyboard") ===
      Set(Seq("mechanical", "keyboard"), Seq("mechanical_keyboard")))
    assert(segs("plato apology") === Set(Seq("plato", "apology"), Seq("plato_apology")))
  }

  test("DT + joiner re-segmentation (reference 'The Man of Tomorrow')") {
    // 'of' is a joiner inside a proper-noun 3-span; 'the' only enters via
    // first-word elongation and is then dropped as omittable glue
    assert(segs("the man of tomorrow") === Set(
      Seq("man", "tomorrow"),          // glue skipped by the ceiling-jump tiling
      Seq("man_of_tomorrow"),          // joiner-in-middle 3-span
      Seq("the_man", "tomorrow"),      // elongated first word
      Seq("the_man_of_tomorrow")))     // elongated to the span end
  }

  test("trailing stopword blocks all tilings -> fallback (reference 'salt lake city')") {
    // 'city' is in the reference's own stopword list: no span can END the
    // sentence, goodSpans is empty, and the reference falls back to its old
    // permute code — we fall back to the original subquery the same way
    assert(segs("salt lake city") === Set.empty)
  }

  test("number joins names (reference 'Raspberry Pi 2')") {
    assert(segs("raspberry pi 2") === Set(
      Seq("raspberry", "pi", "2"), Seq("raspberry", "pi_2"),
      Seq("raspberry_pi", "2"), Seq("raspberry_pi_2")))
  }

  test("coerced pronouns and be-verbs (reference 'we are alone', 'The internet is dead')") {
    // 'are' is NNP after coercion (V-tag) but keeps its stopword bit: never a
    // span by itself, still a valid proper-noun-span interior
    assert(segs("we are alone") === Set(Seq("we", "alone"), Seq("we_are_alone")))
    assert(segs("the internet is dead") === Set(
      Seq("internet", "dead"), Seq("internet_is_dead"),
      Seq("the_internet", "dead"), Seq("the_internet_is_dead")))
  }

  test("single word passes through; value sort puts rarer variants first") {
    assert(segs("dos") === Set(Seq("dos")))
    // with real dfs the joined span (rare) sorts before the split pair
    val df = Map("mechanical" -> 1000L, "keyboard" -> 1000L,
      "mechanical_keyboard" -> 5L).withDefaultValue(0L)
    val ordered = PosSegments.segmentations(Seq("mechanical", "keyboard"), df)
    assert(ordered.head === Seq("mechanical_keyboard"))
  }

  // ---- engine wiring: posSegments replaces the variant machinery ------------

  private def journal3 = {
    import spark.implicits._
    def row(id: Int, words: Seq[String]): JournalRow = JournalRow(
      doc_id = DocId.combine(1, id), url_id = id, domain_id = 1,
      rank = DocMeta.UnknownRank, doc_meta = 0L, length = words.length,
      repo = "r", path = s"d$id", commit = "", lang = "",
      content_sha256 = "",
      keywords = words.map(w =>
        KeywordRow(w, WordMeta.encode(2L, WordFlags.Title), 1)).toArray)
    // doc 1 holds the full phrase incl. its 2-/3-gram spans (an ngram build);
    // doc 2 holds stream+window WITHOUT the determiner; doc 3 lacks window
    Seq(
      row(1, Seq("stream", "a", "window", "stream_a", "a_window", "stream_a_window")),
      row(2, Seq("stream", "window", "stream_window")),
      row(3, Seq("stream", "a", "stream_a"))).toDF()
  }

  private lazy val index3: QueryEngine.Index = {
    val root = Files.createTempDirectory(java.nio.file.Paths.get("target"), "qvar3").toString
    IndexBuilder.buildFromJournal(spark, journal3, root, "snap-1",
      IndexConf(numBuckets = 4, docRangeShift = 4, ngrams = true))
    QueryEngine.open(root, spark)
  }

  test("posSegments drops the non-omittable determiner via re-segmentation") {
    def run(pos: Boolean): Set[Int] =
      QueryEngine.search(spark, index3, QuerySpec(
        subqueries = Seq(Subquery(include = Seq("stream", "a", "window"))),
        limitByDomain = Int.MaxValue, limitTotal = Int.MaxValue,
        posSegments = pos)).map(_.url_id).toSet
    // default machinery: 'a' is NOT omittable — identity needs the literal
    // token, pair variants need adjacency; doc 2 can't match
    assert(run(pos = false) === Set(1))
    // POS tiling: DT is no joiner and no span — [stream, window] is the one
    // faithful segmentation, so doc 2 (no 'a' at all) now matches
    assert(run(pos = true) === Set(1, 2))
  }
}
