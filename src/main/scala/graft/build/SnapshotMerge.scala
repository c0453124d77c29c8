package graft.build

import graft.core.{DocMeta, PostingCodec}
import graft.tables.Snapshots
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental index maintenance: merge N disjoint snapshots (a base plus
  * one or more append-only deltas) into one snapshot WITHOUT rebuilding from
  * the corpus, optionally purging tombstoned documents in the same pass.
  *
  * The reference's only maintenance operation is a full reconvert + atomic
  * swap (/root/reference/code/services-core/index-service/.../IndexServicesFactory.java:189-209);
  * at 100 TB that makes a 0.1% daily delta cost a full corpus pass.
  * [[StreamingIngest]] already makes TOKENIZATION incremental (new files
  * analyzed once); this makes the POSTING build incremental too: the merged
  * snapshot is assembled from the input snapshots' encoded posting/forward
  * BLOCKS, so the work is proportional to block bytes (already ~posting-
  * compressed), not raw (term, doc) rows, and nothing is re-tokenized,
  * re-exploded, or globally re-sorted. The merge is N-WAY (LSM-style
  * compaction): k staged deltas fold into the base in ONE pass — the base's
  * blocks are read and rewritten once, not once per delta.
  *
  * Deletion (takedowns / contamination removal — a need the reference never
  * had, but a training-data pipeline does) follows the LSM model: deletes
  * are TOMBSTONES applied at compaction. `tombstones` docs are dropped from
  * documents/journal, filtered out of posting and forward blocks (only
  * blocks in an affected docRange are decoded; the rest pass through
  * byte-identical), forward block-max statistics are recomputed from the
  * surviving documents, and term_stats is re-derived from the merged
  * postings so df counts shrink exactly. The merged snapshot equals a full
  * rebuild over (union of corpora) MINUS the tombstoned docs — pinned in
  * SnapshotMergeSpec. Tombstoned ids are resolved through the inputs'
  * documents tables and collected to the driver (guarded by
  * [[MaxTombstones]]); bulk deletions beyond the guard should full-rebuild.
  *
  * Scale shape per table:
  *  - postings (and postings_prio): union of the block tables → one exchange
  *    ON ENCODED BLOCKS hashed by (bucket, docRange) →
  *    sortWithinPartitions(term, range) → single-pass run merge (≤N blocks
  *    share a (term, range) key — each input contributes at most one).
  *    Decode + merge-sort + re-encode happens only for keys present on >1
  *    input or in a tombstoned docRange; other blocks pass through
  *    byte-identical.
  *  - fwd: same pattern keyed by doc_range; block extremes (min_rank &c.)
  *    combine by min/max, or are recomputed from doc metas when a block is
  *    filtered.
  *  - term_stats: df counters add per term (deltas are append-only); with
  *    tombstones they are re-derived from the merged posting blocks.
  *  - journal/documents: parquet union append (anti-joined to tombstones).
  *
  * Because each input's block arrays are sorted by rank_doc_id and the
  * doc-id sets are disjoint (validated), the merged arrays are exactly what
  * a full rebuild over the combined journal would have sorted and encoded —
  * the merged snapshot is BYTE-equivalent where it matters and
  * query-identical (pinned in SnapshotMergeSpec). UPDATED documents are NOT
  * handled here: re-ingesting a (repo, path, commit) key falls back to
  * [[StreamingIngest.compact]]'s full rebuild, which remains correct (or
  * tombstone the old doc_id and merge the new one as a delta).
  *
  * The optional `domain_neighbors` table is intentionally not merged — its
  * per-repo top-N by link weight is not a union-compatible aggregate; re-run
  * [[IndexBuilder.writeDomainNeighbors]] on the merged snapshot.
  */
object SnapshotMerge {

  /** Driver-side bound on resolved tombstones per merge (16 bytes/id → ~64 MB
    * at the cap). Deletions at this scale should full-rebuild instead. */
  val MaxTombstones: Int = 4 * 1024 * 1024

  /** Binary convenience form: merge `baseId` + `deltaId` into `outId`. */
  def mergeSnapshots(spark: SparkSession, root: String, baseId: String,
                     deltaId: String, outId: String): Snapshots.Manifest =
    mergeSnapshots(spark, root, Seq(baseId, deltaId), outId)

  /** Rewrite one snapshot dropping `tombstones` (a df with a `doc_id`
    * column) — compaction-style deletion without a delta. */
  def purgeSnapshot(spark: SparkSession, root: String, id: String,
                    outId: String, tombstones: DataFrame): Snapshots.Manifest =
    mergeSnapshots(spark, root, Seq(id), outId, Some(tombstones))

  /** Merge the snapshots `ids` (all under `root`) into a new committed
    * snapshot `outId`, dropping any docs in `tombstones(doc_id)`. All inputs
    * must share the build configuration and have pairwise-disjoint doc_id
    * sets. */
  def mergeSnapshots(spark: SparkSession, root: String, ids: Seq[String],
                     outId: String,
                     tombstones: Option[DataFrame] = None): Snapshots.Manifest = {
    import spark.implicits._
    require(ids.size >= 2 || (ids.size == 1 && tombstones.nonEmpty),
      s"need at least two snapshots to merge (or one plus tombstones), got $ids")
    val manifests = ids.map { id =>
      Snapshots.stagedManifest(root, id)
        .getOrElse(throw new IllegalStateException(s"no manifest for $id"))
    }
    val head = manifests.head
    manifests.tail.foreach { m =>
      require(m.numBuckets == head.numBuckets &&
        m.docRangeShift == head.docRangeShift &&
        m.stemming == head.stemming && m.ngrams == head.ngrams,
        s"snapshots built with different configurations cannot merge: $head vs $m")
    }
    val nb = head.numBuckets
    val dirs = ids.map(id => Snapshots.stagingDir(root, id).toString)
    val outDir = Snapshots.stagingDir(root, outId).toString

    val docsAll = dirs.map(d => spark.read.parquet(s"$d/documents")).reduce(_ unionByName _)
    if (ids.size > 1) {
      val dup = docsAll.groupBy($"doc_id").agg(count(lit(1)).as("c")).where($"c" > 1L)
        .select($"doc_id").take(1)
      require(dup.isEmpty,
        s"doc_id ${dup.headOption.map(_.getLong(0)).getOrElse(-1L)} exists in more than one snapshot — " +
          "merge is append-only; re-ingested documents need a compact (full rebuild)")
    }

    // resolve tombstoned doc_ids to posting-order ids (rank<<32|url) and the
    // docRanges they live in; small by contract (MaxTombstones guard)
    val delIds: Array[Long] = tombstones match {
      case None => Array.empty[Long]
      case Some(t) =>
        val resolved = docsAll.join(t.select($"doc_id"), "doc_id")
          .select(shiftleft($"rank".cast("long"), 32)
            .bitwiseOR($"url_id".cast("long")).as("rid"))
          .limit(MaxTombstones + 1).as[Long].collect()
        require(resolved.length <= MaxTombstones,
          s"more than $MaxTombstones tombstoned docs — use a full rebuild for bulk deletion")
        resolved
    }
    val delSet = delIds.toSet
    val delRanges = delIds.map(_ >>> head.docRangeShift).toSet
    val bcDel = spark.sparkContext.broadcast((delSet, delRanges))
    def dropTombstoned(df: DataFrame): DataFrame = tombstones match {
      case None => df
      case Some(t) => df.join(t.select($"doc_id"), Seq("doc_id"), "left_anti")
    }

    // journal is only persisted by the corpus-level build ([[IndexBuilder
    // .build]]); journal-DataFrame builds have documents but no journal table
    def unionTable(name: String, stage: String): Boolean =
      if (Snapshots.isStageDone(root, outId, stage)) true
      else if (!ids.forall(Snapshots.isStageDone(root, _, stage))) false
      else {
        dropTombstoned(dirs.map(d => spark.read.parquet(s"$d/$name")).reduce(_ unionByName _))
          .write.mode("overwrite").parquet(s"$outDir/$name")
        Snapshots.markStageDone(root, outId, stage)
        true
      }
    val withJournal = unionTable("journal", IndexBuilder.StageJournal)
    unionTable("documents", IndexBuilder.StageDocs)

    if (!Snapshots.isStageDone(root, outId, IndexBuilder.StagePostings)) {
      mergedPostings(spark, dirs.map(d => s"$d/postings"), bcDel, prioTier = false)
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$outDir/postings")
      Snapshots.markStageDone(root, outId, IndexBuilder.StagePostings)
    }
    val withPrio = manifests.forall(_.stagesDone.contains(IndexBuilder.StagePrio))
    if (withPrio && !Snapshots.isStageDone(root, outId, IndexBuilder.StagePrio)) {
      mergedPostings(spark, dirs.map(d => s"$d/postings_prio"), bcDel, prioTier = true)
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$outDir/postings_prio")
      Snapshots.markStageDone(root, outId, IndexBuilder.StagePrio)
    }

    if (!Snapshots.isStageDone(root, outId, IndexBuilder.StageStats)) {
      val stats =
        if (delSet.isEmpty)
          // append-only: df counters add per term
          dirs.map(d => spark.read.parquet(s"$d/term_stats")).reduce(_ unionByName _)
            .groupBy($"term_hash")
            .agg(sum($"df_full").as("df_full"), sum($"df_prio").as("df_prio"))
        else
          // with deletions: re-derive df from the merged posting blocks —
          // each full-tier block counts its distinct docs (n) and its
          // priority-flagged postings (n_prio), so Σ per term equals the
          // build-side derivation exactly (IndexBuilder stats stage)
          spark.read.parquet(s"$outDir/postings")
            .groupBy($"term_hash")
            .agg(sum($"n").as("df_full"), sum($"n_prio").as("df_prio"))
      stats
        .withColumn("bucket", pmod($"term_hash", lit(nb.toLong)).cast("int"))
        .select($"bucket", $"term_hash", $"df_full", $"df_prio")
        .repartition(nb, $"bucket")
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$outDir/term_stats")
      Snapshots.markStageDone(root, outId, IndexBuilder.StageStats)
    }

    if (!Snapshots.isStageDone(root, outId, IndexBuilder.StageFwd)) {
      mergedFwd(spark, dirs.map(d => s"$d/fwd"), bcDel)
        .write.mode("overwrite").parquet(s"$outDir/fwd")
      Snapshots.markStageDone(root, outId, IndexBuilder.StageFwd)
    }

    val docCount = manifests.map(_.docCount).sum - delIds.length
    val manifest = Snapshots.Manifest(
      outId, docCount, nb, head.docRangeShift,
      (if (withJournal) Seq(IndexBuilder.StageJournal) else Nil) ++
        Seq(IndexBuilder.StageDocs, IndexBuilder.StagePostings) ++
        (if (withPrio) Seq(IndexBuilder.StagePrio) else Nil) ++
        Seq(IndexBuilder.StageStats, IndexBuilder.StageFwd),
      stemming = head.stemming, ngrams = head.ngrams,
      lineage = Seq.empty)
    Snapshots.writeManifest(root, manifest)
    Snapshots.commit(root, outId)
    manifest
  }

  /** Union N posting-block tables and merge the ≤N blocks sharing each
    * (bucket, term, range) key, dropping tombstoned docs. Keys on one input
    * outside any tombstoned range pass through without decode. Every input
    * was encoded from a rank_doc_id-sorted disjoint run, so folding
    * two-pointer merges reproduces the exact array a full rebuild sorts —
    * the re-encoded blob is byte-identical to the rebuilt one. */
  private[graft] def mergedPostings(spark: SparkSession, paths: Seq[String],
      bcDel: org.apache.spark.broadcast.Broadcast[(Set[Long], Set[Long])],
      prioTier: Boolean): Dataset[PostingBlock] = {
    import spark.implicits._
    val cols = Seq("bucket", "term_hash", "doc_range", "n", "n_prio",
      "max_pos_count", "blob", "skip_docs", "skip_offs").map(col)
    paths.map(p => spark.read.parquet(p).select(cols: _*)).reduce(_ unionByName _)
      .as[PostingBlock]
      // distribute by (bucket, RANGE), not bucket alone: the run merge only
      // needs a key's blocks co-located, and range-level distribution keeps
      // merge parallelism ∝ shuffle partitions instead of capping it at
      // numBuckets (the build's head-term salt, IndexConf.saltByRange,
      // exists for the same reason)
      .repartition($"bucket", $"doc_range")
      .sortWithinPartitions($"bucket", $"term_hash", $"doc_range")
      .mapPartitions { it =>
        val (delSet, delRanges) = bcDel.value
        val buf = it.buffered
        def sameKey(a: PostingBlock, b: PostingBlock): Boolean =
          a.bucket == b.bucket && a.term_hash == b.term_hash && a.doc_range == b.doc_range
        // merge one key's run; None when every surviving doc was tombstoned
        def mergeRun(): Option[PostingBlock] = {
          val a = buf.next()
          val affected = delRanges.contains(a.doc_range)
          if (!affected && (!buf.hasNext || !sameKey(buf.head, a))) Some(a)
          else {
            val pa = PostingCodec.decode(a.blob)
            var docs = pa.docIds; var metas = pa.metas
            var maxPos = a.max_pos_count
            var nPrio = a.n_prio
            while (buf.hasNext && sameKey(buf.head, a)) {
              val b = buf.next()
              val pb = PostingCodec.decode(b.blob)
              val m = mergeSorted(docs, metas, pb.docIds, pb.metas)
              docs = m._1; metas = m._2
              maxPos = math.max(maxPos, b.max_pos_count)
              nPrio += b.n_prio // doc sets are disjoint: prio counts add
            }
            if (affected) {
              val keep = docs.indices.filterNot(i => delSet.contains(docs(i)))
              docs = keep.map(i => docs(i)).toArray; metas = keep.map(i => metas(i)).toArray
              // recompute the block-max WAND bound and the prio count over
              // survivors — the build derives both from the same metas, so
              // the merged block stays byte/stat-identical to a rebuild.
              // A prio-tier block zeroes its metas, but there every posting
              // is priority by construction: survivors count directly.
              maxPos = 0
              nPrio = if (prioTier) docs.length else 0
              metas.foreach { m =>
                val pc = graft.core.WordMeta.positionCount(m)
                if (pc > maxPos) maxPos = pc
                if (!prioTier && (m & graft.core.WordFlags.PriorityMask) != 0L) nPrio += 1
              }
            }
            if (docs.isEmpty) None
            else {
              val (blob, skip) = PostingCodec.encode(docs, metas)
              Some(PostingBlock(a.bucket, a.term_hash, a.doc_range, docs.length,
                nPrio, maxPos, blob, skip.docIds, skip.offsets))
            }
          }
        }
        new Iterator[PostingBlock] {
          private var pending: Option[PostingBlock] = None
          private def advance(): Unit = {
            pending = None
            while (pending.isEmpty && buf.hasNext) pending = mergeRun()
          }
          advance()
          def hasNext: Boolean = pending.nonEmpty
          def next(): PostingBlock = { val r = pending.get; advance(); r }
        }
      }
  }

  /** Same run merge for forward blocks, keyed by doc_range; the doc-meta and
    * domain blobs merge in lockstep. Block-max document statistics combine
    * by min/max, or are recomputed from surviving doc metas when the range
    * is tombstone-affected (keeping them EXACT, not just conservative, so
    * the merged snapshot stays byte-equivalent to a rebuild). */
  private[graft] def mergedFwd(spark: SparkSession, paths: Seq[String],
      bcDel: org.apache.spark.broadcast.Broadcast[(Set[Long], Set[Long])]): Dataset[FwdBlock] = {
    import spark.implicits._
    paths.map(spark.read.parquet(_)).reduce(_ unionByName _)
      .as[FwdBlock]
      .repartition($"doc_range")
      .sortWithinPartitions($"doc_range")
      .mapPartitions { it =>
        val (delSet, delRanges) = bcDel.value
        val buf = it.buffered
        def mergeRun(): Option[FwdBlock] = {
          val a = buf.next()
          val affected = delRanges.contains(a.doc_range)
          if (!affected && (!buf.hasNext || buf.head.doc_range != a.doc_range)) Some(a)
          else {
            val ma = PostingCodec.decode(a.blob_meta)
            val da = PostingCodec.decode(a.blob_domain)
            var docs = ma.docIds; var metas = ma.metas; var doms = da.metas
            var minRank = a.min_rank; var maxAsl = a.max_asl
            var minQ = a.min_quality; var maxTopo = a.max_topology
            while (buf.hasNext && buf.head.doc_range == a.doc_range) {
              val b = buf.next()
              val mb = PostingCodec.decode(b.blob_meta)
              val db = PostingCodec.decode(b.blob_domain)
              val mm = mergeSorted(docs, metas, mb.docIds, mb.metas)
              val dm = mergeSorted(docs, doms, db.docIds, db.metas)
              docs = mm._1; metas = mm._2; doms = dm._2
              minRank = math.min(minRank, b.min_rank)
              maxAsl = math.max(maxAsl, b.max_asl)
              minQ = math.min(minQ, b.min_quality)
              maxTopo = math.max(maxTopo, b.max_topology)
            }
            if (affected) {
              val keep = docs.indices.filterNot(i => delSet.contains(docs(i)))
              docs = keep.map(i => docs(i)).toArray
              metas = keep.map(i => metas(i)).toArray
              doms = keep.map(i => doms(i)).toArray
              // recompute extremes over survivors (same init values as the
              // build's fwd stage)
              minRank = 255; maxAsl = 0; minQ = 15; maxTopo = 0
              metas.foreach { m =>
                minRank = math.min(minRank, DocMeta.rank(m))
                maxAsl = math.max(maxAsl, DocMeta.asl(m))
                minQ = math.min(minQ, DocMeta.quality(m))
                maxTopo = math.max(maxTopo, DocMeta.topology(m))
              }
            }
            if (docs.isEmpty) None
            else {
              val (bm, sm) = PostingCodec.encode(docs, metas)
              val (bd, sd) = PostingCodec.encode(docs, doms)
              Some(FwdBlock(a.doc_range, docs.length, minRank, maxAsl, minQ, maxTopo,
                bm, sm.docIds, sm.offsets, bd, sd.docIds, sd.offsets))
            }
          }
        }
        new Iterator[FwdBlock] {
          private var pending: Option[FwdBlock] = None
          private def advance(): Unit = {
            pending = None
            while (pending.isEmpty && buf.hasNext) pending = mergeRun()
          }
          advance()
          def hasNext: Boolean = pending.nonEmpty
          def next(): FwdBlock = { val r = pending.get; advance(); r }
        }
      }
  }

  /** Two-pointer merge of two docId-sorted (id, payload) runs with disjoint
    * ids. */
  private def mergeSorted(d1: Array[Long], m1: Array[Long],
                          d2: Array[Long], m2: Array[Long]): (Array[Long], Array[Long]) = {
    val n = d1.length + d2.length
    val docs = new Array[Long](n)
    val metas = new Array[Long](n)
    var i = 0; var j = 0; var k = 0
    while (i < d1.length && j < d2.length) {
      if (d1(i) <= d2(j)) { docs(k) = d1(i); metas(k) = m1(i); i += 1 }
      else { docs(k) = d2(j); metas(k) = m2(j); j += 1 }
      k += 1
    }
    while (i < d1.length) { docs(k) = d1(i); metas(k) = m1(i); i += 1; k += 1 }
    while (j < d2.length) { docs(k) = d2(j); metas(k) = m2(j); j += 1; k += 1 }
    (docs, metas)
  }
}
