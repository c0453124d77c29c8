package graft.build

import graft.core.WordFlags
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** K7/J7: cross-document Site / SiteAdjacent flag passes over the journal —
  * the Spark form of the reference's per-domain post-processing
  * (SiteWords.java:24-88, CommonKeywordExtractor.java:19-69, TopKeywords.java).
  *
  * The reference keys "topic-ness" on the POS-derived Subjects/NamesWords
  * flags; without a POS model the tokenizer assigns deterministic analogs
  * (sentence-lead Subjects, capitalized-run NamesWords — Tokenizer A9/K5),
  * so the default mask is Title|TfIdfHigh|Subjects|NamesWords (the flag
  * masks stay parameters).
  * Prio-tier BM25 counts Site/SiteAdjacent (WordFlags.PrioBm25Mask), so these
  * passes directly raise the ranking of a repo's signature terms.
  *
  * Scale shape: only FLAGGED keywords are exploded (a small fraction of the
  * journal); the qualifying term set is tiny (≤ maxPerDomain stems per
  * domain) and joins back by domain_id / doc_id without ever shuffling the
  * journal's keyword arrays.
  */
object SiteWords {

  // reference constants, CommonKeywordExtractor.java:12-17
  final val MinRequiredDocuments = 25
  final val RequiredTotalCount = 15
  final val QualifyingProportion = 0.25
  final val MaxSiteKeywordsPerDomain = 5
  /** reference: words on > 3 linking pages (SiteWords.java:66) */
  final val MinLinkingDocs = 3

  private val DefaultTopicMask: Long =
    (WordFlags.Title | WordFlags.TfIdfHigh | WordFlags.Subjects | WordFlags.NamesWords).toLong

  /** Keywords of `journal` docs carrying any of `flagMask`. */
  private def flaggedTerms(journal: DataFrame, flagMask: Long): DataFrame =
    journal.select(col("doc_id"), col("domain_id"), explode(col("keywords")).as("kw"))
      .where(col("kw.meta").bitwiseAND(lit(flagMask)) =!= 0L)
      .select(col("doc_id"), col("domain_id"), col("kw.term").as("term"))

  /** Per-domain common topic terms (CommonKeywordExtractor.getCommonSiteWords):
    * domains with ≥ minDocs docs and ≥ minTotal flagged occurrences; a term
    * qualifies when it appears (flagged) in more than `proportion` of the
    * domain's docs; top `maxPerDomain` by count (term asc tiebreak). */
  def commonSiteTerms(journal: DataFrame,
                      flagMask: Long = DefaultTopicMask,
                      minDocs: Int = MinRequiredDocuments,
                      minTotal: Int = RequiredTotalCount,
                      proportion: Double = QualifyingProportion,
                      maxPerDomain: Int = MaxSiteKeywordsPerDomain): DataFrame = {
    val flagged = flaggedTerms(journal, flagMask)
    val domDocs = journal.groupBy("domain_id").agg(count(lit(1)).as("n_docs"))
    val totals = flagged.groupBy("domain_id").agg(count(lit(1)).as("total"))
    flagged.groupBy("domain_id", "term").agg(count(lit(1)).as("n"))
      .join(domDocs, "domain_id").join(totals, "domain_id")
      .where(col("n_docs") >= minDocs && col("total") >= minTotal &&
        col("n") > col("n_docs") * proportion)
      .withColumn("rk", row_number().over(
        Window.partitionBy("domain_id").orderBy(col("n").desc, col("term"))))
      .where(col("rk") <= maxPerDomain)
      .select("domain_id", "term")
  }

  /** OR `flag` into the metadata of `terms`-matching keywords, joined by
    * domain_id — a row-local array transform, no keyword shuffle. */
  private def applyByDomain(journal: DataFrame, terms: DataFrame, flag: Int): DataFrame =
    applyFlags(journal, terms.groupBy("domain_id").agg(collect_set("term").as("flag_terms")),
      Seq("domain_id"), flag)

  private def applyFlags(journal: DataFrame, flagTable: DataFrame,
                         key: Seq[String], flag: Int): DataFrame =
    journal.join(flagTable, key, "left")
      .withColumn("keywords",
        when(col("flag_terms").isNull, col("keywords")).otherwise(
          transform(col("keywords"), k => struct(
            k.getField("term").as("term"),
            when(array_contains(col("flag_terms"), k.getField("term")),
              k.getField("meta").bitwiseOR(lit(flag.toLong)))
              .otherwise(k.getField("meta")).as("meta"),
            k.getField("tf").as("tf")))))
      .drop("flag_terms")

  /** Site pass (SiteWords.flagCommonSiteWords): every doc of a domain gets
    * the Site flag OR'd onto its occurrences of the domain's common terms. */
  def flagCommonSiteWords(journal: DataFrame,
                          flagMask: Long = DefaultTopicMask): DataFrame =
    applyByDomain(journal, commonSiteTerms(journal, flagMask), WordFlags.Site)

  /** SiteAdjacent pass (SiteWords.flagAdjacentWords): given a link table
    * (src_doc_id, dst_doc_id), a doc's keyword gets SiteAdjacent when it is a
    * top keyword of more than `minLinks` docs linking to it AND a top keyword
    * of the doc itself. The link graph is caller-supplied — the reference
    * derives it from HTML hrefs; a code corpus would derive it from imports. */
  def flagAdjacentWords(journal: DataFrame, links: DataFrame,
                        topFlagMask: Long = DefaultTopicMask,
                        minLinks: Int = MinLinkingDocs): DataFrame = {
    val topKw = flaggedTerms(journal, topFlagMask).drop("domain_id")
    val incoming = links.select(col("src_doc_id"), col("dst_doc_id")).distinct()
      .join(topKw.withColumnRenamed("doc_id", "src_doc_id"), "src_doc_id")
      .groupBy(col("dst_doc_id").as("doc_id"), col("term"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") > minLinks)
      .select("doc_id", "term")
    val docTerms = incoming.join(topKw, Seq("doc_id", "term"), "left_semi")
    applyFlags(journal,
      docTerms.groupBy("doc_id").agg(collect_set("term").as("flag_terms")),
      Seq("doc_id"), WordFlags.SiteAdjacent)
  }
}
