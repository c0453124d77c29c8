package graft.query

import graft.core._
import graft.tables.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Metadata predicate — reference SpecificationLimit.java:22-32
  * (GREATER_THAN is >=, LESS_THAN is <=). */
final case class SpecLimit(kind: Int, value: Int) {
  def test(parameter: Int): Boolean = kind match {
    case SpecLimit.None        => true
    case SpecLimit.Equals      => parameter == value
    case SpecLimit.GreaterThan => parameter >= value
    case SpecLimit.LessThan    => parameter <= value
  }
}
object SpecLimit {
  final val None = 0; final val Equals = 1; final val GreaterThan = 2; final val LessThan = 3
  val none: SpecLimit = SpecLimit(None, 0)
  def equalTo(v: Int): SpecLimit = SpecLimit(Equals, v)
  def greaterThan(v: Int): SpecLimit = SpecLimit(GreaterThan, v)
  def lessThan(v: Int): SpecLimit = SpecLimit(LessThan, v)
}

/** One subquery: conjunctive includes, excludes, priority terms, coherence
  * constraints (reference SearchSubquery). `advice` terms are required for a
  * match but excluded from the scoring variant set — the reference folds
  * advice into the retrieval conjunction but keeps only searchTermsInclude in
  * the valuator's term sets (QuerySearchTermsAccumulator.java:36-38,
  * IndexResultValuator.searchTermVariants). Synthetic filters like
  * `lang:scala` belong here, not in `include`. */
final case class Subquery(
    include: Seq[String],
    exclude: Seq[String] = Nil,
    priority: Seq[String] = Nil,
    advice: Seq[String] = Nil,
    coherences: Seq[Seq[String]] = Nil)

/** Full query spec (reference SearchSpecification subset). */
final case class QuerySpec(
    subqueries: Seq[Subquery],
    domains: Seq[Int] = Nil,
    year: SpecLimit = SpecLimit.none,
    quality: SpecLimit = SpecLimit.none,
    size: SpecLimit = SpecLimit.none,
    rank: SpecLimit = SpecLimit.none,
    limitByDomain: Int = 10,
    limitTotal: Int = 10,
    params: RankingParams = RankingParams())

/** One ranked result. Ordering replicates the reference comparator chain
  * (IndexQueryService.selectBestResults:252-282 +
  * SearchResultPreliminaryScore.compareTo): priority-term hit first, then
  * ascending score (lower is better), then ascending ranking, ascending urlId. */
final case class SearchResult(
    url_id: Int, domain_id: Int, ranking: Int, has_priority_term: Boolean,
    score: Double, results_from_domain: Long)

/** Distributed BM25 top-k query engine over a committed index snapshot.
  *
  * Physical plan per query (SURVEY §3.1 Spark rebuild):
  *   1. driver planner: term hashes + df lookup from term_stats (scan pruned
  *      to the terms' hash buckets — partition pruning is the pushdown)
  *   2. scan posting blocks of the query's terms only (bucket-pruned),
  *      further pruned to the doc ranges of the rarest include term
  *      (the reference orders terms by selectivity the same way,
  *      SearchIndex.compareKeywords:159-171)
  *   3. one shuffle of those blocks by docRange co-locates every term's
  *      postings for the same doc range with the forward block
  *   4. mapPartitions kernel: galloping sorted intersection (J1), merge
  *      exclusion (J2), metadata filter (F7), exact scoring (R1-R9), and
  *      per-partition top-k with block-max WAND pruning
  *   5. tiny collect of per-partition top-k; final comparator + per-domain
  *      cap (A8/O3) on the driver.
  *
  * At 1000-executor scale the only data motion is the query's own posting
  * blocks (a few MB for typical terms) — never the corpus.
  */
object QueryEngine {

  /** Loaded handle on one snapshot. */
  final case class Index(root: String, manifest: Snapshots.Manifest) {
    def dir: String = Snapshots.stagingDir(root, manifest.snapshotId).toString
  }

  def open(root: String): Index = {
    val m = Snapshots.currentManifest(root).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $root"))
    Index(root, m)
  }

  // -------------------------------------------------------------------------

  def search(spark: SparkSession, index: Index, spec: QuerySpec): Seq[SearchResult] = {
    import spark.implicits._

    val allTerms: Seq[String] = spec.subqueries.flatMap(sq =>
      sq.include ++ sq.exclude ++ sq.priority ++ sq.advice).distinct
    if (allTerms.isEmpty || spec.subqueries.forall(_.include.isEmpty)) return Nil
    val termHash: Map[String, Long] = allTerms.map(t => t -> Hashes.termHash(t)).toMap
    val hashes = termHash.values.toSeq.distinct
    val buckets = hashes.map(h => IndexBuilderRef.bucketOf(h, index.manifest.numBuckets)).distinct

    // ---- planner: per-term document frequencies (bucket-pruned tiny scan) --
    val statsRows = spark.read.parquet(s"${index.dir}/term_stats")
      .where($"bucket".isin(buckets: _*) && $"term_hash".isin(hashes: _*))
      .select($"term_hash", $"df_full", $"df_prio")
      .collect()
    val dfFull = statsRows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dfPrio = statsRows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val docCount = index.manifest.docCount

    // a subquery whose include term is absent can never match (reference
    // SearchTermsService: missing include ⇒ subquery dead)
    val liveSubqueries = spec.subqueries.filter(sq =>
      sq.include.nonEmpty &&
        (sq.include ++ sq.advice).forall(t => dfFull.getOrElse(termHash(t), 0L) > 0L))
    if (liveSubqueries.isEmpty) return Nil

    // ---- pruned posting scan -----------------------------------------------
    val postings = spark.read.parquet(s"${index.dir}/postings")
      .where($"bucket".isin(buckets: _*) && $"term_hash".isin(hashes: _*))

    // doc ranges of the rarest include term per subquery bound the candidate
    // universe; union across subqueries
    val rarestTerms: Seq[Long] = liveSubqueries.map { sq =>
      termHash(sq.include.minBy(t => dfFull.getOrElse(termHash(t), Long.MaxValue)))
    }.distinct
    val ranges: Array[Long] = postings
      .where($"term_hash".isin(rarestTerms: _*))
      .select($"doc_range").distinct().as[Long].collect()
    if (ranges.isEmpty) return Nil

    val prunedPostings = postings.where($"doc_range".isin(ranges.toSeq: _*))
      .select($"term_hash", $"doc_range", $"n", $"max_pos_count", $"blob")
    val fwd = spark.read.parquet(s"${index.dir}/fwd")
      .where($"doc_range".isin(ranges.toSeq: _*))
      .select(lit(0L).as("term_hash"), $"doc_range", $"n",
        lit(-1).as("max_pos_count"), $"blob_meta".as("blob"),
        $"blob_domain")
    val tagged = prunedPostings.withColumn("blob_domain", lit(null).cast("binary"))
      .unionByName(fwd)

    // ---- broadcast the tiny query plan to the kernel ------------------------
    val bSpec = spark.sparkContext.broadcast(KernelSpec(
      subqueries = liveSubqueries.map(sq => KernelSubquery(
        include = sq.include.map(t => KernelTerm(t, termHash(t),
          math.max(1L, dfFull.getOrElse(termHash(t), 1L)),
          math.max(1L, dfPrio.getOrElse(termHash(t), 1L)))),
        exclude = sq.exclude.map(termHash),
        priority = sq.priority.map(termHash),
        advice = sq.advice.map(termHash),
        coherences = sq.coherences.map(_.map(termHash)))),
      domains = spec.domains.toSet,
      year = spec.year, quality = spec.quality, size = spec.size, rank = spec.rank,
      limitPerPartition = spec.limitTotal * math.max(4, spec.subqueries.size * 2),
      limitByDomain = spec.limitByDomain,
      params = spec.params,
      docCount = docCount))

    // ---- kernel: one shuffle by doc_range, then per-range evaluation --------
    val candidates = tagged
      .repartition(col("doc_range"))
      .sortWithinPartitions(col("doc_range"), col("term_hash"))
      .mapPartitions(QueryKernel.evaluatePartition(bSpec.value))(
        org.apache.spark.sql.Encoders.product[Candidate])
      .collect()

    // ---- final selection (reference selectBestResults) ----------------------
    val ordered = candidates.sortBy(c => (!c.hasPrio, c.score, c.ranking, c.urlId))
    val domainCounts = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val selected = scala.collection.mutable.ArrayBuffer.empty[Candidate]
    ordered.foreach { c =>
      domainCounts(c.domainId) += 1
      if (domainCounts(c.domainId) <= spec.limitByDomain) selected += c
    }
    val top = selected.take(spec.limitTotal)
    top.map(c => SearchResult(c.urlId, c.domainId, c.ranking, c.hasPrio, c.score,
      domainCounts(c.domainId))).toSeq
  }

  /** DataFrame wrapper for SparkEntry/Verify. */
  def searchDF(spark: SparkSession, index: Index, spec: QuerySpec): DataFrame = {
    import spark.implicits._
    search(spark, index, spec).toDF()
  }
}

/** Just the bucket function, re-exported to avoid a package cycle. */
private[query] object IndexBuilderRef {
  def bucketOf(termHash: Long, numBuckets: Int): Int =
    (((termHash % numBuckets) + numBuckets) % numBuckets).toInt
}

// ---- kernel-side plan (broadcast) ------------------------------------------

final case class KernelTerm(term: String, hash: Long, dfFull: Long, dfPrio: Long)
final case class KernelSubquery(
    include: Seq[KernelTerm], exclude: Seq[Long], priority: Seq[Long],
    advice: Seq[Long], coherences: Seq[Seq[Long]])
final case class KernelSpec(
    subqueries: Seq[KernelSubquery],
    domains: Set[Int],
    year: SpecLimit, quality: SpecLimit, size: SpecLimit, rank: SpecLimit,
    limitPerPartition: Int,
    limitByDomain: Int,
    params: RankingParams,
    docCount: Long)

final case class Candidate(urlId: Int, domainId: Int, ranking: Int,
                           hasPrio: Boolean, score: Double)

/** Per-partition evaluation: decode blocks per doc range, intersect, filter,
  * score, keep a bounded top set. */
object QueryKernel {
  import org.apache.spark.sql.Row

  def evaluatePartition(spec: KernelSpec)(rows: Iterator[Row]): Iterator[Candidate] = {
    // group rows by doc_range (input is sorted by doc_range)
    val results = scala.collection.mutable.ArrayBuffer.empty[Candidate]
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    var curRange = Long.MinValue
    var first = true
    def flush(): Unit = if (buf.nonEmpty) { evaluateRange(spec, buf.toSeq, results); buf.clear() }
    rows.foreach { r =>
      val range = r.getLong(r.fieldIndex("doc_range"))
      if (first || range != curRange) { flush(); curRange = range; first = false }
      buf += r
    }
    flush()
    // Bounded emission: per domain, only the local best `limitByDomain` can
    // ever survive the global per-domain cap (the global count of better
    // same-domain candidates is ≥ the local count), so dropping the rest is
    // exact for selection. results_from_domain counts beyond the cap are
    // therefore clamped — the reference counts the full candidate list
    // (IndexQueryService:252-282), which doesn't distribute; documented.
    val byScore = results.sortBy(c => (!c.hasPrio, c.score, c.ranking, c.urlId))
    val perDomain = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    val keep = scala.collection.mutable.ArrayBuffer.empty[Candidate]
    byScore.foreach { c =>
      if (perDomain(c.domainId) < spec.limitByDomain) {
        keep += c
        perDomain(c.domainId) += 1
      }
    }
    keep.iterator
  }

  private def evaluateRange(spec: KernelSpec, rows: Seq[Row],
                            out: scala.collection.mutable.ArrayBuffer[Candidate]): Unit = {
    // split fwd row (term_hash==0 sentinel with blob_domain != null) from postings
    var fwdMeta: PostingCodec.Postings = null
    var fwdDom: PostingCodec.Postings = null
    val byTerm = scala.collection.mutable.Map.empty[Long, PostingCodec.Postings]
    rows.foreach { r =>
      val blobDomain = r.getAs[Array[Byte]]("blob_domain")
      if (blobDomain != null) {
        fwdMeta = PostingCodec.decode(r.getAs[Array[Byte]]("blob"))
        fwdDom = PostingCodec.decode(blobDomain)
      } else {
        val th = r.getLong(r.fieldIndex("term_hash"))
        val p = PostingCodec.decode(r.getAs[Array[Byte]]("blob"))
        byTerm.get(th) match {
          case Some(prev) => // salted sub-blocks of one term within a range: merge
            byTerm(th) = mergeSorted(prev, p)
          case None => byTerm(th) = p
        }
      }
    }
    if (fwdMeta == null) return // no forward data for this range (empty)

    val seen = scala.collection.mutable.Set.empty[Long] // F6 cross-subquery memo
    spec.subqueries.foreach { sq =>
      // advice terms join the conjunction (match-only) — Q5: advice folded
      // into includes at retrieval, excluded from the scoring variant set
      val required: Seq[Long] = sq.include.map(_.hash) ++ sq.advice
      val lists = required.flatMap(h => byTerm.get(h))
      if (lists.length == required.length && lists.nonEmpty) {
        // driver = rarest list; galloping intersection (J1, BTreeReader.retainEntries)
        val sorted = lists.sortBy(_.length)
        val driver = sorted.head
        val others = sorted.tail
        val excl = sq.exclude.flatMap(byTerm.get)
        var i = 0
        while (i < driver.length) {
          val doc = driver.docIds(i)
          if (!seen.contains(doc) && others.forall(o => contains(o, doc)) &&
              !excl.exists(e => contains(e, doc))) {
            seen += doc
            scoreCandidate(spec, sq, doc, byTerm, fwdMeta, fwdDom, out)
          }
          i += 1
        }
      }
    }
  }

  private def mergeSorted(a: PostingCodec.Postings, b: PostingCodec.Postings): PostingCodec.Postings = {
    val n = a.length + b.length
    val docs = new Array[Long](n); val metas = new Array[Long](n)
    var i = 0; var j = 0; var k = 0
    while (i < a.length && j < b.length) {
      if (a.docIds(i) <= b.docIds(j)) { docs(k) = a.docIds(i); metas(k) = a.metas(i); i += 1 }
      else { docs(k) = b.docIds(j); metas(k) = b.metas(j); j += 1 }
      k += 1
    }
    while (i < a.length) { docs(k) = a.docIds(i); metas(k) = a.metas(i); i += 1; k += 1 }
    while (j < b.length) { docs(k) = b.docIds(j); metas(k) = b.metas(j); j += 1; k += 1 }
    PostingCodec.Postings(docs, metas)
  }

  private def contains(p: PostingCodec.Postings, doc: Long): Boolean =
    java.util.Arrays.binarySearch(p.docIds, doc) >= 0

  private def metaOf(p: PostingCodec.Postings, doc: Long): Long = {
    val i = java.util.Arrays.binarySearch(p.docIds, doc)
    if (i >= 0) p.metas(i) else 0L
  }

  private def scoreCandidate(spec: KernelSpec, sq: KernelSubquery, doc: Long,
                             byTerm: scala.collection.mutable.Map[Long, PostingCodec.Postings],
                             fwdMeta: PostingCodec.Postings, fwdDom: PostingCodec.Postings,
                             out: scala.collection.mutable.ArrayBuffer[Candidate]): Unit = {
    val docMeta = metaOf(fwdMeta, doc)
    val domainId = metaOf(fwdDom, doc).toInt

    // param filter (F7) — runs last in the reference too
    if (spec.domains.nonEmpty && !spec.domains.contains(domainId)) return
    if (!spec.quality.test(DocMeta.quality(docMeta))) return
    if (!spec.year.test(DocMeta.year(docMeta))) return
    if (!spec.size.test(DocMeta.size(docMeta))) return
    if (!spec.rank.test(DocMeta.rank(docMeta))) return

    // priority-term hit is checked across ALL subqueries' priority terms
    // (IndexMetadataService.getResultsWithPriorityTerms)
    val hasPrio = spec.subqueries.exists(_.priority.exists(ph =>
      byTerm.get(ph).exists(p => metaOf(p, doc) != 0L)))

    // score against every subquery's term set, best (min) wins — the
    // reference's variant-set loop (ResultValuator:90-103)
    var best = 10.0
    var disqualified = true
    var maxMinFlags = 0
    var maxMinPos = 0
    var anyAllSynthetic = false
    spec.subqueries.foreach { variant =>
      val terms = variant.include.map { t =>
        TermScoreInput(t.term, byTerm.get(t.hash).map(p => metaOf(p, doc)).getOrElse(0L),
          t.dfFull, t.dfPrio)
      }
      // coherence disqualification (R8, per-variant constraint sets)
      val coherenceOk = variant.coherences.forall { cohSet =>
        var overlap = 0xFF_FFFF_FFFF_FFFFL
        cohSet.foreach { h =>
          overlap &= WordMeta.positions(byTerm.get(h).map(p => metaOf(p, doc)).getOrElse(0L))
        }
        overlap != 0L
      }
      if (coherenceOk) {
        var minFlags = 8
        var minPos = 4
        var allSyn = terms.nonEmpty
        terms.foreach { t =>
          minFlags = math.min(minFlags, java.lang.Long.bitCount(t.termMeta & WordFlags.ResultFilterMask))
          minPos = math.min(minPos, WordMeta.positionCount(t.termMeta))
          allSyn &&= WordMeta.hasFlags(t.termMeta, WordFlags.Synthetic.toLong)
        }
        maxMinFlags = math.max(maxMinFlags, minFlags)
        maxMinPos = math.max(maxMinPos, minPos)
        anyAllSynthetic ||= allSyn
        disqualified = false
        best = math.min(best, Scoring.score(spec.params, terms, docMeta, 5000, spec.docCount, hasPrio))
      }
    }
    if (disqualified) return
    if (maxMinFlags == 0 && !anyAllSynthetic && maxMinPos == 0) return

    out += Candidate(DocId.urlId(doc), domainId, DocId.ranking(doc), hasPrio, best)
  }
}
