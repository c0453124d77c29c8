package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Search-assistant operators: typeahead suggestions and SymSpell-style
  * spelling correction over the corpus term dictionary.
  *
  * Reference semantics (assistant-service):
  *  - Suggestions (`code/services-core/assistant-service/src/main/java/nu/marginalia/assistant/suggest/Suggestions.java:128-150`):
  *    walk the PatriciaTrie from the prefix in lexicographic key order, take
  *    the first 256 matches, re-rank by descending term frequency, then
  *    length, then natural order, and return the top `count`. Inputs shorter
  *    than MIN_SUGGEST_LENGTH=3 yield nothing; the wordlist keeps only
  *    alphanumeric entries shorter than 32 chars (Suggestions.java:27,52-54).
  *  - SpellChecker (`.../dict/SpellChecker.java:19-21` over
  *    `third-party/symspell/src/main/java/symspell/SymSpell.java:229-384`,
  *    editDistanceMax=2, verbose=1): all dictionary terms at the MINIMAL true
  *    (unrestricted) Damerau-Levenshtein distance ≤ 2 from the input, sorted
  *    by descending term frequency. SymSpell finds candidates through the
  *    symmetric-delete trick: every term shares a ≤2-char-deletion variant
  *    with every other term within distance 2, so candidate generation is a
  *    join on delete keys instead of a dictionary scan.
  *
  * Spark-first shape: the reference's in-RAM trie/hashmap become TABLES.
  *  - The trie walk is a pushable `StringStartsWith` range predicate over the
  *    term dictionary (parquet min/max pruning serves the same "jump to the
  *    prefix" purpose on a term-sorted dict) followed by two tiny top-k's.
  *  - The SymSpell delete index is a build-once `(del, term, df)` table
  *    (`deletesTable`); a query joins its own ≤ 1+L+L(L−1)/2 delete keys
  *    (broadcast) against it, so lookup cost tracks delete-bucket occupancy,
  *    never dictionary size — the same asymptotics as SymSpell's hashmap, in
  *    a form that a 10^9-term dictionary can serve from storage.
  *
  * Tie-breaks everywhere are totalized (… , term ASC) so results are
  * deterministic and DuckDB-oracle-checkable; frequency ties inside SymSpell's
  * own output keep Java insertion order, which no rebuild can (or should)
  * reproduce.
  */
object SuggestOps {

  /** Reference constants (Suggestions.java:30,54; SymSpell.java:36). */
  final val MinSuggestLength = 3
  final val MaxSuggestTermLength = 32
  final val TrieScanCap = 256
  final val MaxEdits = 2

  /** True (unrestricted) Damerau-Levenshtein distance — the exact algorithm
    * SymSpell verifies candidates with (SymSpell.java:397-438, the Wikipedia
    * H-matrix form) and the one DuckDB's `damerau_levenshtein` implements, so
    * the driver oracle can recompute every distance. Unlike the restricted
    * (OSA) variant, edits may cross a transposition: DL("CA","ABC")=2. */
  def damerauLevenshtein(a: String, b: String): Int = {
    if (a == b) return 0
    val inf = a.length + b.length + 1
    val h = Array.fill(a.length + 2, b.length + 2)(0)
    for (i <- 0 to a.length) { h(i + 1)(1) = i; h(i + 1)(0) = inf }
    for (j <- 0 to b.length) { h(1)(j + 1) = j; h(0)(j + 1) = inf }
    val da = scala.collection.mutable.HashMap.empty[Char, Int]
    (a + b).foreach(c => da.getOrElseUpdate(c, 0))
    for (i <- 1 to a.length) {
      var db = 0
      for (j <- 1 to b.length) {
        val i1 = da(b.charAt(j - 1))
        val j1 = db
        val d = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        h(i + 1)(j + 1) = math.min(
          math.min(h(i)(j) + d, h(i + 1)(j) + 1),
          math.min(h(i)(j + 1) + 1, h(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)))
      }
      da(a.charAt(i - 1)) = i
    }
    h(a.length + 1)(b.length + 1)
  }

  /** Driver-side delete variants of the query word: the word itself plus all
    * strings reachable by deleting up to `maxEdits` characters (SymSpell
    * `Edits`, SymSpell.java:210-227 — no deletes from 1-char strings). */
  def queryDeletes(word: String, maxEdits: Int = MaxEdits): Set[String] = {
    def dels(s: String): Set[String] =
      if (s.length <= 1) Set.empty
      else (0 until s.length).map(i => s.substring(0, i) + s.substring(i + 1)).toSet
    var frontier = Set(word)
    var all = Set(word)
    for (_ <- 1 to maxEdits) {
      frontier = frontier.flatMap(dels) -- all
      all ++= frontier
    }
    all
  }

  /** `s` with the `i`-th (1-based) character removed, as a codegen'd column
    * expression. */
  private def delOne(s: Column, i: Column): Column =
    concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))

  /** All delete variants (distance 0..2) of `term` as an array column — the
    * dictionary side of SymSpell's symmetric-delete index, built from
    * `transform`/`flatten` higher-order functions so the whole expansion
    * stays inside whole-stage codegen (no UDF). */
  private def deleteVariants(term: Column): Column = {
    val empty = array().cast("array<string>")
    val d1 = array_distinct(
      when(length(term) > 1, transform(sequence(lit(1), length(term)), i => delOne(term, i)))
        .otherwise(empty))
    val d2 = flatten(transform(d1, s =>
      when(length(s) > 1, transform(sequence(lit(1), length(s)), j => delOne(s, j)))
        .otherwise(empty)))
    array_distinct(concat(array(term), d1, d2))
  }

  /** The SymSpell delete index as a table: one `(del, term, df)` row per
    * delete variant (distance 0..2) of each dictionary term. A build-once
    * snapshot artifact in a real deployment — size is Σ 1+L+L(L−1)/2 over
    * term lengths L (≤ ~2.1k rows per 64-char term), the explicit space/time
    * trade SymSpell itself makes. Narrow projection + generator: no shuffle. */
  def deletesTable(dict: DataFrame, maxLen: Int = 64): DataFrame =
    dict.where(length(col("term")) <= maxLen)
      .select(explode(deleteVariants(col("term"))).as("del"), col("term"), col("df"))

  /** Verify a candidate set: true-DL distances, ≤ maxEdits cut, minimal
    * distance only, frequency-descending order. The tail every spell path
    * (inline, brute, snapshot-artifact serving) shares. */
  def spellVerify(cand: DataFrame, word: String, maxEdits: Int = MaxEdits): DataFrame =
    minDistanceSet(withDistance(cand, word, maxEdits))

  private def withDistance(cand: DataFrame, word: String, maxEdits: Int): DataFrame = {
    // True-DL verification runs on the candidate set only — after the delete
    // join (or the brute filter) it is bucket-occupancy-sized, not
    // dictionary-sized, so a scalar UDF is off the hot path by construction.
    val dl = udf((t: String) => damerauLevenshtein(t, word))
    cand.withColumn("dist", dl(col("term"))).where(col("dist") <= maxEdits)
  }

  /** Keep only candidates at the minimal distance (SymSpell verbose=1: lower
    * distances evict higher ones, SymSpell.java:324-326), ordered by
    * descending frequency (SymSpell.java:363-371) with a deterministic term
    * tie-break. */
  private def minDistanceSet(cand: DataFrame): DataFrame =
    cand.join(broadcast(cand.agg(min("dist").as("mind"))), col("dist") === col("mind"))
      .select("term", "dist", "df")
      .orderBy(desc("df"), col("term"))

  /** SymSpell spelling correction via the symmetric-delete join: the query
    * word's ≤ 1+L+L(L−1)/2 delete keys (broadcast) meet the dictionary's
    * delete index, survivors are verified with true Damerau-Levenshtein, and
    * the minimal-distance set comes back frequency-ranked. */
  def spellCorrect(dict: DataFrame, word: String, maxEdits: Int = MaxEdits): DataFrame = {
    val spark = dict.sparkSession
    import spark.implicits._
    val qDels = queryDeletes(word, maxEdits).toSeq.toDF("del")
    val cand = deletesTable(dict)
      .join(broadcast(qDels), "del")
      .select("term", "df").distinct()
    spellVerify(cand, word, maxEdits)
  }

  /** Brute-force twin of [[spellCorrect]] — verifies every dictionary term
    * directly. Used by the spec to prove the delete join loses no candidates
    * and by nothing else (it scans the whole dictionary per query). */
  def spellCorrectBrute(dict: DataFrame, word: String, maxEdits: Int = MaxEdits): DataFrame =
    spellVerify(dict.select("term", "df"), word, maxEdits)

  /** The COMPOSED suggestion endpoint (Suggestions.getSuggestions,
    * Suggestions.java:73-125): three streams concatenated in order and
    * capped at `count` —
    *   1. the whole input as a prefix (with a single-token dictionary a
    *      spaced input naturally matches nothing, as the reference's
    *      multi-word trie would for an unknown phrase),
    *   2. the last word as a prefix, re-prefixed with the untouched head
    *      (`suggestionsForLastWord`, :90-102),
    *   3. spelling corrections of the last word, same re-prefixing
    *      (`spellCheckStream`, :104-125).
    * Streams 1–2 carry their own `count` cap (the reference's
    * getSuggestionsForKeyword limit, :149); the spell stream is uncapped
    * until the final combined limit. Inputs shorter than MIN_SUGGEST_LENGTH
    * yield nothing (:74). Duplicates across streams are kept — the
    * reference does not dedupe. Output (sno, rn, suggestion) preserves the
    * stream/rank provenance the concatenation order is defined by. */
  def suggestions(dict: DataFrame, input: String, count: Int,
                  minPrefixLen: Int = MinSuggestLength): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val searchWord = input.toLowerCase.replaceAll("^ +", "")
    val prefixOrder = Seq(col("df").desc, length(col("term")).asc, col("term").asc)
    val spellOrder = Seq(col("df").desc, col("term").asc)
    def ranked(src: DataFrame, sno: Int, head: String, order: Seq[Column]): DataFrame =
      src.withColumn("rn", row_number().over(Window.orderBy(order: _*)))
        .select(lit(sno).as("sno"), col("rn"),
          concat(lit(head), col("term")).as("suggestion"))
    def empty: DataFrame = dict
      .select(lit(1).as("sno"), lit(1).as("rn"), col("term").as("suggestion"))
      .where(lit(false))
    if (searchWord.length < minPrefixLen) return empty
    val sp = searchWord.lastIndexOf(' ')
    val (head, last) =
      if (sp < 0) ("", searchWord)
      else (searchWord.substring(0, sp + 1), searchWord.substring(sp + 1))
    val s1 = ranked(suggestPrefix(dict, searchWord, count, minPrefixLen = minPrefixLen),
      1, "", prefixOrder)
    val s2 = if (sp < 0) empty
      else ranked(suggestPrefix(dict, last, count, minPrefixLen = minPrefixLen),
        2, head, prefixOrder)
    val s3 = if (last.length >= minPrefixLen) ranked(spellCorrect(dict, last), 3, head, spellOrder)
      else empty
    s1.unionByName(s2).unionByName(s3).orderBy("sno", "rn").limit(count)
  }

  /** Typeahead suggestions: prefix-restricted dictionary walk capped at
    * `scanCap` lexicographically-first matches (the reference's trie
    * iteration order), re-ranked by (frequency DESC, length, term). The
    * prefix restriction compiles to a pushable `StringStartsWith`, so on a
    * term-sorted dictionary parquet min/max pruning skips to the prefix the
    * way the trie's `select` does. */
  def suggestPrefix(dict: DataFrame, prefix0: String, count: Int,
                    scanCap: Int = TrieScanCap,
                    minPrefixLen: Int = MinSuggestLength): DataFrame = {
    // lowercase like the reference (Suggestions.java:78) — the dict stores
    // lowercase terms, so a mixed-case prefix would silently match nothing
    val prefix = prefix0.toLowerCase(java.util.Locale.ROOT)
    val base = dict.select("term", "df")
    if (prefix.length < minPrefixLen) base.where(lit(false))
    else base
      .where(col("term").startsWith(prefix) &&
        length(col("term")) < MaxSuggestTermLength &&
        col("term").rlike("^[a-z0-9]+$"))
      .orderBy("term").limit(scanCap)
      .orderBy(desc("df"), length(col("term")), col("term")).limit(count)
  }
}
