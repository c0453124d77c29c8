package graft

import graft.ops.SuggestOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Assistant ops: SymSpell spelling correction (delete-join completeness vs
  * brute force, true-DL semantics) and trie-order prefix suggestions. */
class SuggestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-suggest")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def dictOf(rows: (String, Long)*) = rows.toDF("term", "df")

  // ---- true Damerau-Levenshtein (SymSpell.java:397-438 semantics) ----------

  test("DL: unrestricted distance crosses transpositions (CA→ABC = 2, not OSA's 3)") {
    assert(SuggestOps.damerauLevenshtein("CA", "ABC") === 2)
    assert(SuggestOps.damerauLevenshtein("ABC", "CA") === 2)
  }

  test("DL: SymSpell's own discriminating examples (bank: bnak=1, kanb/xban/baxn=2)") {
    assert(SuggestOps.damerauLevenshtein("bank", "bnak") === 1)
    assert(SuggestOps.damerauLevenshtein("bank", "kanb") === 2)
    assert(SuggestOps.damerauLevenshtein("bank", "xban") === 2)
    assert(SuggestOps.damerauLevenshtein("bank", "baxn") === 2)
    assert(SuggestOps.damerauLevenshtein("kitten", "sitting") === 3)
    assert(SuggestOps.damerauLevenshtein("", "abc") === 3)
    assert(SuggestOps.damerauLevenshtein("same", "same") === 0)
  }

  // ---- delete generation ---------------------------------------------------

  test("query deletes: word + all ≤2-char deletions, none from 1-char strings") {
    assert(SuggestOps.queryDeletes("ab", 2) === Set("ab", "a", "b"))
    assert(SuggestOps.queryDeletes("a", 2) === Set("a"))
    val d = SuggestOps.queryDeletes("abcd", 2)
    assert(d.contains("abcd") && d.contains("abc") && d.contains("ab") && d.contains("cd"))
    assert(!d.contains("a")) // distance 3
  }

  test("deletesTable column expansion matches the driver-side generator") {
    for (w <- Seq("spark", "ab", "a", "query")) {
      val fromCol = SuggestOps.deletesTable(dictOf(w -> 1L))
        .select("del").as[String].collect().toSet
      assert(fromCol === SuggestOps.queryDeletes(w, 2), s"word=$w")
    }
  }

  // ---- spell correction ----------------------------------------------------

  private val dict = dictOf(
    "hash" -> 394L, "fast" -> 376L, "sort" -> 388L, "spark" -> 385L,
    "stream" -> 391L, "batch" -> 402L, "scan" -> 398L, "bank" -> 10L,
    "bnk" -> 3L, "abc" -> 7L, "ca" -> 5L)

  test("spellCorrect: min-distance set, frequency-descending (fash → hash, fast)") {
    val out = SuggestOps.spellCorrect(dict, "fash")
      .select("term", "dist").as[(String, Int)].collect().toSeq
    assert(out === Seq(("hash", 1), ("fast", 1)))
  }

  test("spellCorrect: exact dictionary hit evicts all distance>0 candidates") {
    val out = SuggestOps.spellCorrect(dict, "hash")
      .select("term", "dist").as[(String, Int)].collect().toSeq
    assert(out === Seq(("hash", 0)))
  }

  test("spellCorrect: no candidate within distance 2 ⇒ empty") {
    assert(SuggestOps.spellCorrect(dict, "zzzzzzz").count() === 0L)
  }

  test("delete join loses no candidates: parity with brute force, incl. " +
    "simultaneous-delete and cross-transposition distance-2 cases") {
    for (w <- Seq("fash", "sprak", "bnak", "ca", "ab", "strem", "scann", "batc", "xbank", "hashy")) {
      val viaJoin = SuggestOps.spellCorrect(dict, w)
        .select("term", "dist", "df").collect().map(_.toSeq).toSeq
      val brute = SuggestOps.spellCorrectBrute(dict, w)
        .select("term", "dist", "df").collect().map(_.toSeq).toSeq
      assert(viaJoin === brute, s"word=$w")
    }
  }

  // ---- prefix suggestions --------------------------------------------------

  test("suggestPrefix: trie semantics — scanCap takes the lexicographic-first " +
    "matches BEFORE the frequency re-rank (Suggestions.java:145-149)") {
    val d = dictOf("saa" -> 1L, "sab" -> 2L, "sac" -> 3L, "szz" -> 999L)
    // cap 3: trie walk sees saa,sab,sac; szz (highest df) is beyond the cap
    val out = SuggestOps.suggestPrefix(d, "s", 2, scanCap = 3, minPrefixLen = 1)
      .select("term").as[String].collect().toSeq
    assert(out === Seq("sac", "sab"))
  }

  test("suggestPrefix: rank by df DESC then length then term; filters apply") {
    val d = dictOf(
      "sort" -> 388L, "sorting" -> 388L, "sample" -> 500L,
      "s-bad!" -> 900L,                       // non-alnum: excluded
      ("s" + "x" * 40) -> 900L)               // ≥32 chars: excluded
    val out = SuggestOps.suggestPrefix(d, "s", 10, minPrefixLen = 1)
      .select("term").as[String].collect().toSeq
    assert(out === Seq("sample", "sort", "sorting"))
  }

  test("suggestPrefix: input below minPrefixLen yields nothing (reference MIN=3)") {
    val d = dictOf("sort" -> 1L)
    assert(SuggestOps.suggestPrefix(d, "so", 10).count() === 0L)
    assert(SuggestOps.suggestPrefix(d, "sor", 10).count() === 1L)
  }

  // ---- composed endpoint (Suggestions.getSuggestions) ----------------------

  private def sugsOf(d: org.apache.spark.sql.DataFrame, q: String, k: Int) =
    SuggestOps.suggestions(d, q, k)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq

  test("composed suggestions: last-word prefix and spellcheck streams both fire, " +
    "head preserved, duplicates kept (reference concatenation order)") {
    val d = dictOf("sort" -> 388L, "sorting" -> 100L, "hash" -> 394L, "window" -> 387L)
    // s1: 'window sor%' matches nothing; s2: sor% → sort, sorting;
    // s3: spell 'sor' → min-distance {sort}; 'window sort' appears TWICE
    assert(sugsOf(d, "window sor", 5) === Seq(
      (2, 1, "window sort"), (2, 2, "window sorting"), (3, 1, "window sort")))
  }

  test("composed suggestions: no-space input uses streams 1 and 3, no stream 2") {
    val d = dictOf("sort" -> 388L, "sorting" -> 100L)
    assert(sugsOf(d, "sor", 5) === Seq(
      (1, 1, "sort"), (1, 2, "sorting"), (3, 1, "sort")))
  }

  test("composed suggestions: final cap truncates across streams; short input empty") {
    val d = dictOf("sort" -> 388L, "sorting" -> 100L, "sorted" -> 50L)
    assert(sugsOf(d, "sor", 2) === Seq((1, 1, "sort"), (1, 2, "sorting")))
    assert(sugsOf(d, "so", 5) === Seq.empty) // below MIN_SUGGEST_LENGTH=3
    // last word below min length: streams 2 and 3 are silent
    assert(sugsOf(d, "sorting x", 5) === Seq.empty)
  }

  // ---- persisted snapshot artifacts (SuggestDict) --------------------------

  test("snapshot artifacts: suggest and spell serve from persisted tables, " +
    "match the inline ops, and push their predicates to the scan") {
    val root = java.nio.file.Files.createTempDirectory("graft-sugdict").toString
    val corpus = graft.fixtures.Fixtures.tinyCorpus(spark).toDF()
    graft.build.SuggestDict.write(spark, corpus, root, "snap-1")
    val snapDir = graft.tables.Snapshots.stagingDir(root, "snap-1").toString
    val dict = graft.build.TermFreqDict.compute(spark, corpus)
      .where(col("term").rlike("^[a-z0-9]+$") &&
        length(col("term")) < SuggestOps.MaxSuggestTermLength)

    val served = graft.build.SuggestDict.suggest(spark, snapDir, "tok", 5)
    assert(served.queryExecution.executedPlan.toString.contains("StartsWith"))
    assert(served.collect().map(_.toSeq).toSeq ===
      SuggestOps.suggestPrefix(dict, "tok", 5).collect().map(_.toSeq).toSeq)

    for (w <- Seq("tok00", "alpha", "gamm", "zzzzzz")) {
      val art = graft.build.SuggestDict.spellCorrect(spark, snapDir, w)
      if (w == "tok00") // the In(del, …) keys reach the parquet scan
        assert(art.queryExecution.executedPlan.toString.contains("PushedFilters: [In(del"))
      assert(art.collect().map(_.toSeq).toSeq ===
        SuggestOps.spellCorrect(dict, w).collect().map(_.toSeq).toSeq, s"word=$w")
    }

    // resumable: both stage markers exist, a second write is a no-op
    assert(graft.tables.Snapshots.isStageDone(root, "snap-1", graft.build.SuggestDict.StageDict))
    assert(graft.tables.Snapshots.isStageDone(root, "snap-1", graft.build.SuggestDict.StageDeletes))
    graft.build.SuggestDict.write(spark, corpus, root, "snap-1")
    assert(graft.build.SuggestDict.suggest(spark, snapDir, "tok", 5).count() === 5L)
  }

  test("suggestPrefix: startsWith predicate is pushable at a parquet scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sugg").toString
    dictOf("sort" -> 1L, "query" -> 2L).write.mode("overwrite").parquet(tmp)
    val plan = SuggestOps.suggestPrefix(spark.read.parquet(tmp), "sor", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("StartsWith"), plan)
  }
}
