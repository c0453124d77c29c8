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

/** Full query spec (reference SearchSpecification subset).
  * `pruning` toggles block-max WAND range skipping (exact either way — the
  * toggle exists so tests can assert pruned == unpruned).
  * `localEvalMaxPostings`: when the pruned candidate universe holds fewer
  * postings than this, the blocks are collected and the kernel runs on the
  * driver — no shuffle stage, no executor round-trip (the reference evaluates
  * every query on one node; we keep the distributed kernel for the long
  * tail). 0 forces the distributed path. Results are identical either way. */
final case class QuerySpec(
    subqueries: Seq[Subquery],
    domains: Seq[Int] = Nil,
    year: SpecLimit = SpecLimit.none,
    quality: SpecLimit = SpecLimit.none,
    size: SpecLimit = SpecLimit.none,
    rank: SpecLimit = SpecLimit.none,
    limitByDomain: Int = 10,
    limitTotal: Int = 10,
    params: RankingParams = RankingParams(),
    pruning: Boolean = true,
    localEvalMaxPostings: Long = 262_144L)

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
  *   4. mapPartitions kernel: block-max WAND over doc ranges — ranges whose
  *      score upper bound (from per-block max position counts + the range's
  *      domain rank) cannot beat the partition's current capped top-k are
  *      skipped without decoding; surviving ranges run galloping sorted
  *      intersection (J1) with skip-pointer group decode, merge exclusion
  *      (J2), metadata filter (F7), and exact scoring (R1-R9)
  *   5. tiny collect of per-partition capped top sets; final comparator +
  *      per-domain cap (A8/O3) on the driver.
  *
  * At 1000-executor scale the only data motion is the query's own posting
  * blocks (a few MB for typical terms) — never the corpus. Ranges arrive
  * rank-sorted (doc_range ascending = best domain rank first), so the WAND
  * threshold tightens early, mirroring the reference's rank-encoded posting
  * order (ReverseIndexFullConverter.java:160-182).
  */
object QueryEngine {

  /** Loaded handle on one snapshot. The table DataFrames are created once per
    * handle: Spark caches the parquet FileIndex inside the plan, so repeated
    * queries skip file listing and footer reads — the reference's
    * memory-mapped always-open readers (SearchIndexReader), Spark-style. */
  final class Index(val root: String, val manifest: Snapshots.Manifest,
                    spark: SparkSession) {
    def dir: String = Snapshots.stagingDir(root, manifest.snapshotId).toString
    lazy val termStats: DataFrame = spark.read.parquet(s"$dir/term_stats")
    lazy val postings: DataFrame = spark.read.parquet(s"$dir/postings")
    lazy val fwd: DataFrame = spark.read.parquet(s"$dir/fwd")
    /** Forward blocks pinned on the driver in kernel row form, keyed by
      * doc_range — the Spark analog of the reference's always-in-RAM forward
      * index (ForwardIndexReader.java:53-71). With this cache the local-eval
      * fast path collects ONLY the query's posting blobs; bounded by
      * docCount ≤ 4M (≈ tens of MB of encoded blocks). None at larger
      * scale: the planner then fetches pruned forward blocks per query,
      * budgeted by [[fwdDir]]. */
    lazy val fwdRowCache: Option[Map[Long, org.apache.spark.sql.Row]] =
      if (manifest.docCount <= (1L << 22))
        Some(QueryEngine.fwdUnified(fwd).collect()
          .map(r => r.getLong(r.fieldIndex("doc_range")) -> r).toMap)
      else None
    /** (doc_range → doc count) directory, cached on the driver when the range
      * count is bounded (≤1M ranges ≈ 16 MB) — lets the planner budget the
      * forward-block volume of the local-eval fast path without a per-query
      * job. None at larger scale: the planner then runs a tiny pruned
      * directory job instead (a 10^12-doc snapshot has too many ranges to
      * pin driver-side, and its queries are not sub-100ms anyway). */
    lazy val fwdDir: Option[Map[Long, Int]] =
      if ((manifest.docCount >> manifest.docRangeShift) <= (1L << 20))
        Some(fwd.select("doc_range", "n").collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap)
      else None
  }

  /** Forward-block rows renamed into the kernel's unified posting-row schema
    * (term_hash 0 sentinel; blob_domain non-null marks the forward row). */
  private[query] def fwdUnified(df: DataFrame): DataFrame =
    df.select(lit(0L).as("term_hash"), col("doc_range"), col("n"),
      lit(-1).as("max_pos_count"),
      col("blob_meta").as("blob"), col("meta_skip_docs").as("skip_docs"),
      col("meta_skip_offs").as("skip_offs"),
      col("blob_domain"), col("dom_skip_docs"), col("dom_skip_offs"),
      col("min_rank"), col("max_asl"), col("min_quality"), col("max_topology"))

  def open(root: String): Index = open(root, SparkSession.active)

  def open(root: String, spark: SparkSession): Index = {
    val m = Snapshots.currentManifest(root).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $root"))
    new Index(root, m, spark)
  }

  // -------------------------------------------------------------------------

  def search(spark: SparkSession, index: Index, spec: QuerySpec): Seq[SearchResult] = {
    import spark.implicits._

    val allTerms: Seq[String] = spec.subqueries.flatMap(sq =>
      sq.include ++ sq.exclude ++ sq.priority ++ sq.advice).distinct
    if (allTerms.isEmpty || spec.subqueries.forall(_.include.isEmpty)) return Nil
    // query terms must hash to the index's stored form: when the snapshot was
    // built with Porter stemming (C2), stem everything except synthetic
    // `:`-terms — same rule the tokenizer applied at build time
    val termHash: Map[String, Long] = allTerms.map { t =>
      val stored =
        if (index.manifest.stemming && !t.contains(":")) graft.analysis.Porter.stem(t)
        else t
      t -> Hashes.termHash(stored)
    }.toMap
    val hashes = termHash.values.toSeq.distinct
    val buckets = hashes.map(h => IndexBuilderRef.bucketOf(h, index.manifest.numBuckets)).distinct

    // ---- planner: two CONCURRENT metadata jobs ------------------------------
    // (a) per-term prio document frequencies from term_stats;
    // (b) the (term, range, n) directory of the query's posting blocks —
    //     column-pruned, no blobs. Full-tier df = Σn per term (one posting
    //     per (term, doc)), so (b) also yields df_full; (a) is only needed
    //     for the prio-tier df used by the scorer.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext = scala.concurrent.ExecutionContext.global
    val postings = index.postings
      .where($"bucket".isin(buckets: _*) && $"term_hash".isin(hashes: _*))
    val statsF = Future {
      index.termStats
        .where($"bucket".isin(buckets: _*) && $"term_hash".isin(hashes: _*))
        .select($"term_hash", $"df_prio")
        .collect()
    }
    val dirF = Future {
      postings.select($"term_hash", $"doc_range", $"n").collect()
    }
    val blockDir = Await.result(dirF, Duration.Inf)
    val dfPrio = Await.result(statsF, Duration.Inf)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dfFull: Map[Long, Long] = blockDir.groupBy(_.getLong(0))
      .map { case (h, rows) => h -> rows.map(_.getInt(2).toLong).sum }
    val docCount = index.manifest.docCount

    // a subquery whose include term is absent can never match (reference
    // SearchTermsService: missing include ⇒ subquery dead)
    val liveSubqueries = spec.subqueries.filter(sq =>
      sq.include.nonEmpty &&
        (sq.include ++ sq.advice).forall(t => dfFull.getOrElse(termHash(t), 0L) > 0L))
    if (liveSubqueries.isEmpty) return Nil

    // doc ranges of the rarest include term per subquery bound the candidate
    // universe; union across subqueries — computed from the block directory,
    // no extra job
    val rarestTerms: Set[Long] = liveSubqueries.map { sq =>
      termHash(sq.include.minBy(t => dfFull.getOrElse(termHash(t), Long.MaxValue)))
    }.toSet
    val ranges: Array[Long] = blockDir.iterator
      .filter(r => rarestTerms.contains(r.getLong(0)))
      .map(_.getLong(1)).toArray.distinct
    if (ranges.isEmpty) return Nil
    val rangeSet = ranges.toSet
    val postingsInPlay: Long = blockDir.iterator
      .filter(r => rangeSet.contains(r.getLong(1)))
      .map(_.getInt(2).toLong).sum

    // range pruning: literal IN-list while small; a broadcast semi-join once
    // the list would bloat the expression tree (big-df rarest terms at scale)
    def pruneToRanges(df: DataFrame): DataFrame =
      if (ranges.length <= 8192) df.where($"doc_range".isin(ranges.toSeq: _*))
      else df.join(broadcast(ranges.toSeq.toDF("doc_range")), Seq("doc_range"), "left_semi")

    val prunedPostings = pruneToRanges(postings)
      .select($"term_hash", $"doc_range", $"n", $"max_pos_count",
        $"blob", $"skip_docs", $"skip_offs",
        lit(null).cast("binary").as("blob_domain"),
        lit(null).cast("array<bigint>").as("dom_skip_docs"),
        lit(null).cast("array<int>").as("dom_skip_offs"))

    val kSpec = KernelSpec(
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
      limitTotal = spec.limitTotal,
      limitByDomain = spec.limitByDomain,
      params = spec.params,
      docCount = docCount,
      docRangeShift = index.manifest.docRangeShift,
      pruning = spec.pruning)

    // the local fast path without the handle's forward cache also collects
    // the pruned ranges' FORWARD blobs — budget them (a rare term spread
    // over many ranges has few postings but lots of forward data; collecting
    // it unbudgeted risks driver OOM). With the cache, forward data never
    // moves per-query, so only postings count against the budget.
    val fwdInPlay: Long =
      if (index.fwdRowCache.isDefined) 0L
      else if (postingsInPlay > spec.localEvalMaxPostings) Long.MaxValue // moot
      else index.fwdDir match {
        case Some(m) => ranges.iterator.map(r => m.getOrElse(r, 0).toLong).sum
        case None =>
          val r = pruneToRanges(index.fwd.select($"doc_range", $"n"))
            .agg(sum($"n")).collect()(0)
          if (r.isNullAt(0)) 0L else r.getLong(0)
      }

    val candidates: Array[Candidate] =
      if (postingsInPlay + fwdInPlay <= spec.localEvalMaxPostings) {
        // ---- driver-local kernel: ONE posting-fetch job, no shuffle stage;
        // forward blocks come from the handle cache (or one pruned fetch).
        // Ranges ascend = best domain rank first, and a single Selection
        // tightens the WAND threshold globally.
        val fwdByRange: Map[Long, org.apache.spark.sql.Row] =
          index.fwdRowCache.getOrElse(
            fwdUnified(pruneToRanges(index.fwd)).collect()
              .map(r => r.getLong(r.fieldIndex("doc_range")) -> r).toMap)
        val postingRows = prunedPostings.collect()
        val byRange = postingRows.groupBy(_.getLong(1)) // schema: term_hash, doc_range, ...
        val rows = ranges.sorted.iterator.flatMap { rg =>
          byRange.getOrElse(rg, Array.empty).sortBy(_.getLong(0)) ++ fwdByRange.get(rg)
        }
        QueryKernel.evaluatePartition(kSpec)(rows).toArray
      } else {
        // ---- distributed kernel: one shuffle by doc_range ------------------
        val tagged = prunedPostings.unionByName(
          fwdUnified(pruneToRanges(index.fwd)), allowMissingColumns = true)
        val bSpec = spark.sparkContext.broadcast(kSpec)
        tagged
          .repartition(col("doc_range"))
          .sortWithinPartitions(col("doc_range"), col("term_hash"))
          .mapPartitions(QueryKernel.evaluatePartition(bSpec.value))(
            org.apache.spark.sql.Encoders.product[Candidate])
          .collect()
      }

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
    limitTotal: Int,
    limitByDomain: Int,
    params: RankingParams,
    docCount: Long,
    docRangeShift: Int,
    pruning: Boolean)

final case class Candidate(urlId: Int, domainId: Int, ranking: Int,
                           hasPrio: Boolean, score: Double)

/** Per-partition evaluation: block-max WAND over doc ranges; surviving ranges
  * are intersected with skip-pointer group decode, filtered, and scored. */
object QueryKernel {
  import org.apache.spark.sql.Row

  /** One encoded block inside a range, decoded lazily: membership / meta
    * lookups seek via the skip index and decode a single 128-posting group
    * (the reference's B-tree page reads, BTreeReader.java:52-71); the full
    * decode happens only when the block drives the intersection. */
  final class Block(val n: Int, val maxPosCount: Int, blob: Array[Byte],
                    skip: PostingCodec.SkipIndex) {
    private[this] var fullDecoded: PostingCodec.Postings = null
    private[this] var probes: Int = 0
    def full: PostingCodec.Postings = {
      if (fullDecoded == null) fullDecoded = PostingCodec.decode(blob)
      fullDecoded
    }
    // Adaptive: stay lazy (skip-seek one 128-posting group per probe) for a
    // handful of lookups, then decode fully — a range whose driver list is
    // dense would otherwise re-decode the same groups per candidate.
    private def promote(): Boolean = {
      probes += 1
      if (fullDecoded == null && probes > 16) { full; true }
      else fullDecoded != null
    }
    def contains(doc: Long): Boolean =
      if (promote()) java.util.Arrays.binarySearch(fullDecoded.docIds, doc) >= 0
      else PostingCodec.containsDoc(blob, skip, doc)
    def meta(doc: Long): Long =
      if (promote()) {
        val i = java.util.Arrays.binarySearch(fullDecoded.docIds, doc)
        if (i >= 0) fullDecoded.metas(i) else 0L
      } else PostingCodec.lookup(blob, skip, doc)
    /** Merge with another block of the same (term, range) — only reachable if
      * a future layout salts within a range; decodes both. */
    def merged(other: Block): Block = {
      val a = full; val b = other.full
      val n2 = a.length + b.length
      val docs = new Array[Long](n2); val metas = new Array[Long](n2)
      var i = 0; var j = 0; var k = 0
      while (i < a.length && j < b.length) {
        if (a.docIds(i) <= b.docIds(j)) { docs(k) = a.docIds(i); metas(k) = a.metas(i); i += 1 }
        else { docs(k) = b.docIds(j); metas(k) = b.metas(j); j += 1 }
        k += 1
      }
      while (i < a.length) { docs(k) = a.docIds(i); metas(k) = a.metas(i); i += 1; k += 1 }
      while (j < b.length) { docs(k) = b.docIds(j); metas(k) = b.metas(j); j += 1; k += 1 }
      val (blob2, skip2) = PostingCodec.encode(docs, metas)
      val m = new Block(n2, math.max(maxPosCount, other.maxPosCount), blob2, skip2)
      m
    }
  }

  /** Partition-local running selection: candidates ordered by the reference
    * comparator with the per-domain cap applied greedily (a partition-matroid
    * greedy — adding candidates can only improve the kept set, so the WAND
    * threshold derived from it is monotonically tightening and skip decisions
    * are final-safe). */
  final class Selection(limitTotal: Int, limitByDomain: Int) {
    val all = scala.collection.mutable.ArrayBuffer.empty[Candidate]
    private var dirty = false
    private var cachedThreshold = Double.PositiveInfinity
    private var compactFloor = 1024

    def add(c: Candidate): Unit = {
      all += c; dirty = true
      // bound the buffer (and the threshold re-sort cost): dropping beyond
      // the per-domain cap is exactly what emit() does anyway, so compaction
      // never changes the output or the threshold
      if (all.length > compactFloor * 2) {
        val kept = emit().toBuffer
        all.clear(); all ++= kept
        compactFloor = math.max(1024, all.length)
      }
    }

    /** Worst score a new NON-priority candidate must strictly beat to have any
      * chance of entering the final global top-k:
      *   +inf  — selection not yet full (never skip);
      *   s     — the limitTotal-th capped member's score (it is non-prio if
      *           any non-prio member is in the top; prio members outrank all
      *           non-prio candidates unconditionally);
      *   -inf  — top is entirely priority-hit (no non-prio can enter: skip
      *           every range without priority-term postings).
      */
    def nonPrioThreshold: Double = {
      if (limitTotal <= 0) return Double.NegativeInfinity // degenerate: nothing can enter
      if (!dirty) return cachedThreshold
      dirty = false
      val ordered = all.sortBy(c => (!c.hasPrio, c.score, c.ranking, c.urlId))
      val perDomain = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
      var kept = 0
      var last: Candidate = null
      val it = ordered.iterator
      while (it.hasNext && kept < limitTotal) {
        val c = it.next()
        if (perDomain(c.domainId) < limitByDomain) {
          perDomain(c.domainId) += 1; kept += 1; last = c
        }
      }
      cachedThreshold =
        if (kept < limitTotal) Double.PositiveInfinity
        else if (last.hasPrio) Double.NegativeInfinity
        else last.score
      cachedThreshold
    }

    /** Emission: per domain only the local best `limitByDomain` can survive
      * the global cap, so dropping the rest is exact for selection.
      * results_from_domain counts beyond the cap are therefore clamped — the
      * reference counts the full candidate list (IndexQueryService:252-282),
      * which doesn't distribute; documented. */
    def emit(): Iterator[Candidate] = {
      val byScore = all.sortBy(c => (!c.hasPrio, c.score, c.ranking, c.urlId))
      val perDomain = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
      val keep = scala.collection.mutable.ArrayBuffer.empty[Candidate]
      byScore.foreach { c =>
        if (perDomain(c.domainId) < limitByDomain) {
          keep += c
          perDomain(c.domainId) += 1
        }
      }
      keep.iterator
    }
  }

  def evaluatePartition(spec: KernelSpec)(rows: Iterator[Row]): Iterator[Candidate] = {
    val sel = new Selection(spec.limitTotal, spec.limitByDomain)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    var curRange = Long.MinValue
    var first = true
    def flush(): Unit = if (buf.nonEmpty) { evaluateRange(spec, buf.toSeq, curRange, sel); buf.clear() }
    rows.foreach { r =>
      val range = r.getLong(r.fieldIndex("doc_range"))
      if (first || range != curRange) { flush(); curRange = range; first = false }
      buf += r
    }
    flush()
    sel.emit()
  }

  private def blockOf(r: Row): Block = {
    val skips = PostingCodec.SkipIndex(
      r.getAs[scala.collection.Seq[Long]]("skip_docs").toArray,
      r.getAs[scala.collection.Seq[Int]]("skip_offs").toArray)
    new Block(r.getInt(r.fieldIndex("n")), r.getInt(r.fieldIndex("max_pos_count")),
      r.getAs[Array[Byte]]("blob"), skips)
  }

  /** Optimistic (never-under) bound on the best score any candidate in this
    * range can reach for one VARIANT term set, from per-block max position
    * counts and the range's domain rank (block-max WAND, the north rule's
    * pruning operator; plays the role of the reference's fetchSize/time-budget
    * early termination, IndexQueryExecutor.java:22-33, but deterministic).
    *
    * The valuator scores every candidate against every variant and takes the
    * min (ResultValuator:90-103), with synthetic/`:`-terms dropped from the
    * set, so the bound mirrors that exactly: terms absent from the range
    * contribute 0 (their metas decode to 0 ⇒ bm25 count 0, prio flag count 0,
    * coherence mask 0 ⇒ tcf 0), and setSize is the variant's regular-term
    * count. The caller takes the min across variants; a candidate's true
    * score also starts at 10.0 (ResultValuator default), hence the cap. */
  /** Per-range document-metadata extremes from the forward block — block-max
    * statistics for the document-level score part. */
  final case class RangeStats(minRank: Int, maxAsl: Int, minQuality: Int, maxTopology: Int)

  private def variantBound(spec: KernelSpec, sq: KernelSubquery,
                           byTerm: collection.Map[Long, Block], rs: RangeStats): Double = {
    val p = spec.params
    val regular = sq.include.filterNot(_.term.contains(":"))
    if (regular.isEmpty) return 10.0
    var raw = 0.0
    var allPresent = true
    var minMaxPos = 56
    regular.foreach { t =>
      byTerm.get(t.hash) match {
        case Some(b) =>
          val c = b.maxPosCount.toDouble
          minMaxPos = math.min(minMaxPos, b.maxPosCount)
          if (c > 0)
            // the kernel always scores with the literal length 5000
            // (IndexResultValuator.java:118), so the bound can too
            raw += p.bm25FullWeight * Scoring.invFreq(spec.docCount, t.dfFull) *
              Scoring.tfSat(p.fullParams.k, p.fullParams.b, c, 5000)
          // prio-tier part: ≤ bitCount(PrioBm25Mask)=5 flag bits can be set
          raw += p.bm25PrioWeight * Scoring.invFreq(spec.docCount, t.dfPrio) *
            Scoring.tfSat(p.prioParams.k, 0, 5.0, 0)
        case None => allPresent = false // meta 0 ⇒ zero contribution, tcf dead
      }
    }
    if (allPresent)
      // tcf = w·(bitCount(AND of masks)/56)^0.25 ≤ w·(min over terms of the
      // block-max position count / 56)^0.25
      raw += p.tcfWeight * math.pow(minMaxPos / 56.0, 0.25)
    // document part at the range's best-case metadata (overallPart maxima):
    raw += (255.0 - rs.minRank) * p.domainRankBonus
    raw += math.log(1.0 + rs.maxTopology)
    if (rs.maxAsl < p.shortSentenceThreshold) raw -= p.shortSentencePenalty
    raw -= rs.minQuality * p.qualityPenalty
    math.min(10.0, Scoring.normalize(raw, regular.size))  // lower = better
  }

  private def evaluateRange(spec: KernelSpec, rows: Seq[Row], range: Long,
                            sel: Selection): Unit = {
    // split fwd row (blob_domain != null) from posting blocks — WITHOUT
    // decoding anything yet
    var fwdMeta: Block = null
    var fwdDom: Block = null
    var rangeStats = RangeStats(0, 3, 0, 255) // optimistic fallback (never skips wrongly)
    val byTerm = scala.collection.mutable.Map.empty[Long, Block]
    rows.foreach { r =>
      val blobDomain = r.getAs[Array[Byte]]("blob_domain")
      if (blobDomain != null) {
        fwdMeta = blockOf(r)
        fwdDom = new Block(r.getInt(r.fieldIndex("n")), -1, blobDomain,
          PostingCodec.SkipIndex(
            r.getAs[scala.collection.Seq[Long]]("dom_skip_docs").toArray,
            r.getAs[scala.collection.Seq[Int]]("dom_skip_offs").toArray))
        rangeStats = RangeStats(
          r.getInt(r.fieldIndex("min_rank")),
          r.getInt(r.fieldIndex("max_asl")),
          r.getInt(r.fieldIndex("min_quality")),
          r.getInt(r.fieldIndex("max_topology")))
      } else {
        val th = r.getLong(r.fieldIndex("term_hash"))
        val b = blockOf(r)
        byTerm.get(th) match {
          case Some(prev) => byTerm(th) = prev.merged(b)
          case None       => byTerm(th) = b
        }
      }
    }
    if (fwdMeta == null) return // no forward data for this range (empty)

    val rangeHasPrio = spec.subqueries.exists(_.priority.exists(byTerm.contains))

    // ---- WAND gate: skip the whole range when no subquery's bound beats the
    // current capped selection (exact: bounds never under-estimate, the
    // selection threshold only tightens, and priority stratification is
    // respected — a range that could produce a priority hit is never skipped
    // on score alone unless the selection is already full of priority hits
    // with this range unable to mint one).
    if (spec.pruning) {
      val threshold =
        if (rangeHasPrio) Double.PositiveInfinity // prio candidates outrank; can't skip on score
        else sel.nonPrioThreshold
      if (threshold == Double.NegativeInfinity) return
      if (threshold != Double.PositiveInfinity) {
        // a candidate can exist only if some subquery fully matches, but its
        // final score is the min over ALL variants — bound accordingly
        val anyMatchable = spec.subqueries.exists(sq =>
          (sq.include.map(_.hash) ++ sq.advice).forall(byTerm.contains))
        if (!anyMatchable) return
        val bestBound = spec.subqueries.iterator
          .map(sq => variantBound(spec, sq, byTerm, rangeStats))
          .foldLeft(Double.PositiveInfinity)(math.min)
        if (bestBound > threshold) return
      }
    }

    val seen = scala.collection.mutable.Set.empty[Long] // F6 cross-subquery memo
    spec.subqueries.foreach { sq =>
      // advice terms join the conjunction (match-only) — Q5: advice folded
      // into includes at retrieval, excluded from the scoring variant set
      val required: Seq[Long] = sq.include.map(_.hash) ++ sq.advice
      val lists = required.flatMap(h => byTerm.get(h))
      if (lists.length == required.length && lists.nonEmpty) {
        // driver = rarest list, fully decoded; other lists answer membership
        // via skip-seek group decode (galloping intersection, J1 —
        // BTreeReader.retainEntries)
        val sorted = lists.sortBy(_.n)
        val driver = sorted.head.full
        val others = sorted.tail
        val excl = sq.exclude.flatMap(byTerm.get)
        var i = 0
        while (i < driver.length) {
          val doc = driver.docIds(i)
          if (!seen.contains(doc) && others.forall(_.contains(doc)) &&
              !excl.exists(_.contains(doc))) {
            seen += doc
            scoreCandidate(spec, sq, doc, byTerm, fwdMeta, fwdDom, sel)
          }
          i += 1
        }
      }
    }
  }

  private def scoreCandidate(spec: KernelSpec, sq: KernelSubquery, doc: Long,
                             byTerm: scala.collection.mutable.Map[Long, Block],
                             fwdMeta: Block, fwdDom: Block,
                             sel: Selection): Unit = {
    val docMeta = fwdMeta.meta(doc)
    val domainId = fwdDom.meta(doc).toInt

    // param filter (F7) — runs last in the reference too
    if (spec.domains.nonEmpty && !spec.domains.contains(domainId)) return
    if (!spec.quality.test(DocMeta.quality(docMeta))) return
    if (!spec.year.test(DocMeta.year(docMeta))) return
    if (!spec.size.test(DocMeta.size(docMeta))) return
    if (!spec.rank.test(DocMeta.rank(docMeta))) return

    // priority-term hit is checked across ALL subqueries' priority terms
    // (IndexMetadataService.getResultsWithPriorityTerms)
    val hasPrio = spec.subqueries.exists(_.priority.exists(ph =>
      byTerm.get(ph).exists(_.meta(doc) != 0L)))

    // score against every subquery's term set, best (min) wins — the
    // reference's variant-set loop (ResultValuator:90-103)
    var best = 10.0
    var disqualified = true
    var maxMinFlags = 0
    var maxMinPos = 0
    var anyAllSynthetic = false
    spec.subqueries.foreach { variant =>
      val terms = variant.include.map { t =>
        TermScoreInput(t.term, byTerm.get(t.hash).map(_.meta(doc)).getOrElse(0L),
          t.dfFull, t.dfPrio)
      }
      // coherence disqualification (R8, per-variant constraint sets)
      val coherenceOk = variant.coherences.forall { cohSet =>
        var overlap = 0xFF_FFFF_FFFF_FFFFL
        cohSet.foreach { h =>
          overlap &= WordMeta.positions(byTerm.get(h).map(_.meta(doc)).getOrElse(0L))
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

    sel.add(Candidate(DocId.urlId(doc), domainId, DocId.ranking(doc), hasPrio, best))
  }
}
