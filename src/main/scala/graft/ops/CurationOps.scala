package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end curation chain of a pretraining-data pipeline, composed
  * from the audited single-purpose operators: exact dedup → benchmark
  * decontamination → language gate → quality gate → token-budget sequence
  * packing. One call takes a raw corpus and an eval set and returns the
  * packed training chunks.
  *
  * Stage order is fixed and canonical: dedup FIRST (the min-doc_id survivor
  * must be chosen on the raw corpus, or a filtered-out earlier copy would
  * change which row survives), then decontamination, then the per-doc gates,
  * then packing over the survivor set (prefix offsets are defined over
  * survivors, not the raw corpus).
  *
  * Scale shape is inherited from the parts, all plan-audited elsewhere:
  * dedup is one slim hash-agg on content md5 (uniform keys) plus one id-keyed
  * join back to the corpus; decontamination
  * broadcasts the DISTINCT-aggregated benchmark spans so the corpus never
  * shuffles for the join; the gates are one per-doc aggregate; packing is
  * the two-phase distributed prefix sum (no single-language window sort).
  * Nothing in the chain collects the corpus to the driver.
  */
object CurationOps {

  /** Gates are applied on the same 6-decimal-rounded ratios the standalone
    * quality op reports, so a pipeline decision is always explainable by the
    * published per-doc quality row. */
  def curate(docs: DataFrame, benchmark: DataFrame, n: Int = 4,
             minStopRatio: Double = 0.02, minQuality: Double = 0.5,
             budget: Long = 2048L): DataFrame = {
    // 1. exact dedup — keep the canonical (min doc_id) copy per content hash
    val keep = DedupOps.exactDups(docs).select(col("keep_id").as("doc_id"))
    val deduped = docs.join(keep, "doc_id")
    // 2. drop docs sharing any n-gram with the eval set
    val contaminated = DedupOps.decontaminate(deduped, benchmark, n).select("doc_id")
    // `cleaned` is the diamond point: the quality gates, the survivor join,
    // and the packer all read it, and without materialization Catalyst
    // re-runs the dedup + decontamination lineage once PER consumer (three
    // corpus passes, plan-verified). A real pipeline writes each stage to a
    // table; persist is the in-query analog, so the chain upstream of the
    // gates executes exactly once.
    val cleaned = deduped.join(contaminated, Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 3+4. language (stopword-ratio) and composite-quality gates
    val gated = TextOps.quality(cleaned)
      .where(col("stop_ratio") > minStopRatio && col("quality") >= minQuality)
      .select("doc_id")
    // 5. pack survivors into fixed token-budget chunks per language
    TextOps.packChunks(cleaned.join(gated, "doc_id"), budget)
  }

  /** P2: the model-based curation chain of the MassiveText/CCNet generation,
    * composing the round-4 operators — Bloom-filter dedup against the
    * already-ingested corpus slice (d12) → Gopher rule gates (t16) →
    * bigram-LM perplexity gate with the model trained on the ingested slice
    * (t17, CCNet's "train the LM on what you trust, keep what scores like
    * it"). One call takes the full corpus (ingested + fresh, split by
    * `seenFilter`) and returns the FRESH survivors with their LM scores.
    *
    * Scale shape: three independent single-pass summaries over the base
    * table (constant-size Bloom bitset; per-doc rule aggregate; bigram-model
    * join + per-doc mean), then id-keyed semi-joins of slim (doc_id) gate
    * sets — no stage carries text past its own aggregate, and nothing here
    * re-executes another stage's lineage (every stage reads the base scan
    * directly, unlike [[curate]]'s chained diamond). */
  def curateModelBased(docs: DataFrame, seenFilter: Column,
                       maxLogPpl: Double = 3.45,
                       mBits: Long = 1L << 18, k: Int = 3): DataFrame = {
    val fresh = DedupOps.bloomDedup(docs, seenFilter, mBits, k)
      .where(!col("maybe_dup")).select("doc_id")
    val gated = TextOps.gopherRules(docs).where(col("pass")).select("doc_id")
    TextOps.lmLogPpl(docs, seenFilter)
      .where(col("lm_logppl") <= maxLogPpl)
      .join(fresh, Seq("doc_id"), "left_semi")
      .join(gated, Seq("doc_id"), "left_semi")
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select("doc_id", "lang", "lm_logppl")
      .orderBy("doc_id")
  }
}
