package graft.build

import graft.ops.SuggestOps
import graft.tables.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted suggest/spell artifacts for a snapshot — the serving form of
  * the assistant dictionary.
  *
  * The reference serves suggestions from an in-RAM PatriciaTrie loaded from a
  * deployment wordlist plus a binary term-frequency dict, and spelling from
  * SymSpell's in-RAM delete hashmap (`Suggestions.java:32-42`,
  * `SymSpell.java:70`). At 10^9+ dictionary terms neither fits one heap, so
  * both become build-once TABLES under the snapshot dir:
  *
  *  - `suggest_dict` — (term, df) from the real analysis front-end
  *    ([[TermFreqDict.compute]]), restricted to the reference's suggestible
  *    shape (alnum, < 32 chars), RANGE-PARTITIONED AND SORTED BY TERM so a
  *    prefix query's pushed `StringStartsWith` prunes to the few row groups
  *    whose [min,max] straddle the prefix — parquet stats play the trie's
  *    "jump to prefix" role.
  *  - `suggest_deletes` — the SymSpell symmetric-delete index
  *    ([[SuggestOps.deletesTable]]), range-partitioned and sorted by delete
  *    key so a lookup's pushed `In(del, ...)` (≤ 1+L+L(L−1)/2 keys) prunes
  *    the same way the hashmap's O(1) buckets did.
  *
  * Both writes are resumable through the same `_DONE` stage markers the index
  * stages use; artifacts are independent of the posting tiers (the stateless
  * hashed lexicon keeps no term strings — S6/SURVEY §2.1 — so suggestions
  * need this separate string-keyed table, exactly like the reference's
  * separate wordlist file). */
object SuggestDict {

  final val StageDict = "suggest_dict"
  final val StageDeletes = "suggest_deletes"

  /** Write both artifacts for `snapshotId` (no-ops for stages already done). */
  def write(spark: SparkSession, corpus: DataFrame, root: String, snapshotId: String,
            numParts: Int = 8): Unit = {
    val dir = Snapshots.stagingDir(root, snapshotId).toString
    if (!Snapshots.isStageDone(root, snapshotId, StageDict)) {
      TermFreqDict.compute(spark, corpus)
        .where(col("term").rlike("^[a-z0-9]+$") &&
          length(col("term")) < SuggestOps.MaxSuggestTermLength)
        .repartitionByRange(numParts, col("term")).sortWithinPartitions("term")
        .write.mode("overwrite").parquet(s"$dir/$StageDict")
      Snapshots.markStageDone(root, snapshotId, StageDict)
    }
    if (!Snapshots.isStageDone(root, snapshotId, StageDeletes)) {
      // from the UNFILTERED term dict: the inline SuggestOps.spellCorrect and
      // the reference SymSpell index the full dictionary (SymSpell.java:70) —
      // only suggest_dict applies the suggestible-shape filter (ADVICE r3:
      // the two spell paths must serve the same corrections)
      SuggestOps.deletesTable(TermFreqDict.compute(spark, corpus))
        .repartitionByRange(numParts, col("del")).sortWithinPartitions("del")
        .write.mode("overwrite").parquet(s"$dir/$StageDeletes")
      Snapshots.markStageDone(root, snapshotId, StageDeletes)
    }
  }

  /** Typeahead over the persisted dictionary (shape filters were applied at
    * write time; the prefix predicate pushes to the term-sorted scan). */
  def suggest(spark: SparkSession, snapDir: String, prefix: String, count: Int,
              minPrefixLen: Int = SuggestOps.MinSuggestLength): DataFrame =
    SuggestOps.suggestPrefix(spark.read.parquet(s"$snapDir/$StageDict"), prefix, count,
      minPrefixLen = minPrefixLen)

  /** Spelling correction served from the persisted delete index: the query
    * word's few delete keys push down as an `In` filter, survivors are
    * verified/ranked by [[SuggestOps.spellVerify]]. */
  def spellCorrect(spark: SparkSession, snapDir: String, word: String,
                   maxEdits: Int = SuggestOps.MaxEdits): DataFrame = {
    val keys = SuggestOps.queryDeletes(word, maxEdits).toSeq
    val cand = spark.read.parquet(s"$snapDir/$StageDeletes")
      .where(col("del").isin(keys: _*))
      .select("term", "df").distinct()
    SuggestOps.spellVerify(cand, word, maxEdits)
  }
}
