package graft.build

import graft.analysis.{TfIdfDict, Tokenizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-wide term document frequencies — the reference's term-frequency
  * dictionary (S7/A6: an offline tool counts term→#docs into a binary dict,
  * /root/reference/code/libraries/term-frequency-dict/src/main/java/nu/marginalia/term_frequency_dict/TermFrequencyDict.java:57-65,
  * /root/reference/code/tools/term-frequency-extractor/). The dict feeds
  * extraction-time TF-IDF (A5, WordsTfIdfCounts.java:113-137) whose
  * high-scorers get the `TfIdfHigh` word flag (K5).
  *
  * Like the reference's, this is a SEPARATE pass from the index build (the
  * dict is an input to extraction, usually computed from a sample or a prior
  * snapshot). `groupBy(term).count` over per-doc distinct terms — one
  * hash-aggregate shuffle, uniform keys.
  *
  * Terms absent from the dict default to frequency 1 at use time — exactly
  * the reference's clamp (`freq < 1 → 1`), so capping the stored dict to the
  * most frequent `maxTerms` terms only sharpens the flag for rare terms the
  * same way the reference's sampled dict does.
  */
object TermFreqDict {

  /** (term, df) over the corpus via the SAME analysis front-end the index
    * build uses (dict-less pass). */
  def compute(spark: SparkSession, corpus: DataFrame): DataFrame = {
    import spark.implicits._
    val terms = corpus.select($"repo", $"path", $"lang", $"content")
      .as[(String, String, String, String)]
      .flatMap { case (repo, path, lang, content) =>
        Tokenizer.analyze(repo, path, lang, content).keywords.map(_.term)
      }
    terms.groupBy($"value".as("term")).agg(count(lit(1)).as("df"))
      .select($"term", $"df")
  }

  /** Collect the top `maxTerms` terms by df into a driver map + doc count,
    * ready to broadcast into the tokenizer. */
  def collectDict(spark: SparkSession, dfTable: DataFrame, docCount: Long,
                  maxTerms: Int = 1_000_000): TfIdfDict = {
    import spark.implicits._
    val top = dfTable.orderBy(col("df").desc, col("term"))
      .limit(maxTerms)
      .as[(String, Long)]
      .collect()
      .toMap
    TfIdfDict(top, docCount.toDouble)
  }
}
