package graft.build

import graft.core.PostingCodec
import graft.tables.Snapshots
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental index maintenance: merge an append-only delta snapshot into a
  * base snapshot WITHOUT rebuilding from the corpus.
  *
  * The reference's only maintenance operation is a full reconvert + atomic
  * swap (/root/reference/code/services-core/index-service/.../IndexServicesFactory.java:189-209);
  * at 100 TB that makes a 0.1% daily delta cost a full corpus pass.
  * [[StreamingIngest]] already makes TOKENIZATION incremental (new files
  * analyzed once); this makes the POSTING build incremental too: the merged
  * snapshot is assembled from the two snapshots' encoded posting/forward
  * BLOCKS, so the work is proportional to block bytes (already ~posting-
  * compressed), not raw (term, doc) rows, and nothing is re-tokenized,
  * re-exploded, or globally re-sorted.
  *
  * Scale shape per table:
  *  - postings (and postings_prio): union of two bucket-partitioned block
  *    tables → one exchange ON ENCODED BLOCKS hashed by (bucket, docRange) →
  *    sortWithinPartitions(term, range) → single-pass adjacent-pair merge
  *    (≤2 blocks share a (term, range) key — each build emits exactly one).
  *    Decode + merge-sort + re-encode happens only for keys present on BOTH
  *    sides; single-side blocks pass through byte-identical.
  *  - fwd: same pattern keyed by doc_range; block extremes (min_rank &c.)
  *    combine by min/max.
  *  - term_stats: df counters add per term (delta is append-only).
  *  - journal/documents: parquet union append.
  *
  * Because each side's block arrays are sorted by rank_doc_id and the doc-id
  * sets are disjoint (validated), the merged arrays are exactly what a full
  * rebuild over the combined journal would have sorted and encoded — so the
  * merged snapshot is BYTE-equivalent where it matters and query-identical
  * (pinned in SnapshotMergeSpec). Updated/deleted documents are NOT handled
  * here: re-ingesting a (repo, path, commit) key falls back to
  * [[StreamingIngest.compact]]'s full rebuild, which remains correct.
  *
  * The optional `domain_neighbors` table is intentionally not merged — its
  * per-repo top-N by link weight is not a union-compatible aggregate; re-run
  * [[IndexBuilder.writeDomainNeighbors]] on the merged snapshot.
  */
object SnapshotMerge {

  /** Merge `baseId` + `deltaId` (both under `root`) into a new committed
    * snapshot `outId`. Both inputs must share the build configuration and
    * have disjoint doc_id sets. */
  def mergeSnapshots(spark: SparkSession, root: String, baseId: String,
                     deltaId: String, outId: String): Snapshots.Manifest = {
    import spark.implicits._
    val base = Snapshots.stagedManifest(root, baseId)
      .getOrElse(throw new IllegalStateException(s"no manifest for $baseId"))
    val delta = Snapshots.stagedManifest(root, deltaId)
      .getOrElse(throw new IllegalStateException(s"no manifest for $deltaId"))
    require(base.numBuckets == delta.numBuckets &&
      base.docRangeShift == delta.docRangeShift &&
      base.stemming == delta.stemming && base.ngrams == delta.ngrams,
      s"snapshots built with different configurations cannot merge: $base vs $delta")
    val nb = base.numBuckets
    val baseDir = Snapshots.stagingDir(root, baseId).toString
    val deltaDir = Snapshots.stagingDir(root, deltaId).toString
    val outDir = Snapshots.stagingDir(root, outId).toString

    val overlap = spark.read.parquet(s"$baseDir/documents").select($"doc_id")
      .join(spark.read.parquet(s"$deltaDir/documents").select($"doc_id"), "doc_id")
      .take(1)
    require(overlap.isEmpty,
      s"doc_id ${overlap.headOption.map(_.getLong(0)).getOrElse(-1L)} exists in both snapshots — " +
        "merge is append-only; re-ingested documents need a compact (full rebuild)")

    // journal is only persisted by the corpus-level build ([[IndexBuilder
    // .build]]); journal-DataFrame builds have documents but no journal table
    def unionTable(name: String, stage: String): Boolean =
      if (Snapshots.isStageDone(root, outId, stage)) true
      else if (!(Snapshots.isStageDone(root, baseId, stage) &&
                 Snapshots.isStageDone(root, deltaId, stage))) false
      else {
        spark.read.parquet(s"$baseDir/$name")
          .unionByName(spark.read.parquet(s"$deltaDir/$name"))
          .write.mode("overwrite").parquet(s"$outDir/$name")
        Snapshots.markStageDone(root, outId, stage)
        true
      }
    val withJournal = unionTable("journal", IndexBuilder.StageJournal)
    unionTable("documents", IndexBuilder.StageDocs)

    if (!Snapshots.isStageDone(root, outId, IndexBuilder.StagePostings)) {
      mergedPostings(spark, s"$baseDir/postings", s"$deltaDir/postings")
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$outDir/postings")
      Snapshots.markStageDone(root, outId, IndexBuilder.StagePostings)
    }
    val withPrio = base.stagesDone.contains(IndexBuilder.StagePrio) &&
      delta.stagesDone.contains(IndexBuilder.StagePrio)
    if (withPrio && !Snapshots.isStageDone(root, outId, IndexBuilder.StagePrio)) {
      mergedPostings(spark, s"$baseDir/postings_prio", s"$deltaDir/postings_prio")
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$outDir/postings_prio")
      Snapshots.markStageDone(root, outId, IndexBuilder.StagePrio)
    }

    if (!Snapshots.isStageDone(root, outId, IndexBuilder.StageStats)) {
      spark.read.parquet(s"$baseDir/term_stats")
        .unionByName(spark.read.parquet(s"$deltaDir/term_stats"))
        .groupBy($"term_hash")
        .agg(sum($"df_full").as("df_full"), sum($"df_prio").as("df_prio"))
        .withColumn("bucket", pmod($"term_hash", lit(nb.toLong)).cast("int"))
        .select($"bucket", $"term_hash", $"df_full", $"df_prio")
        .repartition(nb, $"bucket")
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$outDir/term_stats")
      Snapshots.markStageDone(root, outId, IndexBuilder.StageStats)
    }

    if (!Snapshots.isStageDone(root, outId, IndexBuilder.StageFwd)) {
      mergedFwd(spark, s"$baseDir/fwd", s"$deltaDir/fwd")
        .write.mode("overwrite").parquet(s"$outDir/fwd")
      Snapshots.markStageDone(root, outId, IndexBuilder.StageFwd)
    }

    val manifest = Snapshots.Manifest(
      outId, base.docCount + delta.docCount, nb, base.docRangeShift,
      (if (withJournal) Seq(IndexBuilder.StageJournal) else Nil) ++
        Seq(IndexBuilder.StageDocs, IndexBuilder.StagePostings) ++
        (if (withPrio) Seq(IndexBuilder.StagePrio) else Nil) ++
        Seq(IndexBuilder.StageStats, IndexBuilder.StageFwd),
      stemming = base.stemming, ngrams = base.ngrams,
      lineage = Seq.empty)
    Snapshots.writeManifest(root, manifest)
    Snapshots.commit(root, outId)
    manifest
  }

  /** Union two posting-block tables and merge the ≤2 blocks sharing each
    * (bucket, term, range) key. Keys on one side only pass through without
    * decode. Both inputs were encoded from rank_doc_id-sorted disjoint runs,
    * so a two-pointer merge reproduces the exact array a full rebuild sorts —
    * the re-encoded blob is byte-identical to the rebuilt one. */
  private def mergedPostings(spark: SparkSession, basePath: String,
                             deltaPath: String): Dataset[PostingBlock] = {
    import spark.implicits._
    val cols = Seq("bucket", "term_hash", "doc_range", "n", "max_pos_count",
      "blob", "skip_docs", "skip_offs").map(col)
    spark.read.parquet(basePath).select(cols: _*)
      .unionByName(spark.read.parquet(deltaPath).select(cols: _*))
      .as[PostingBlock]
      // distribute by (bucket, RANGE), not bucket alone: the pair-merge only
      // needs a key's ≤2 blocks co-located, and range-level distribution
      // keeps merge parallelism ∝ shuffle partitions instead of capping it
      // at numBuckets (the build's head-term salt, IndexConf.saltByRange,
      // exists for the same reason)
      .repartition($"bucket", $"doc_range")
      .sortWithinPartitions($"bucket", $"term_hash", $"doc_range")
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[PostingBlock] {
          def hasNext: Boolean = buf.hasNext
          def next(): PostingBlock = {
            val a = buf.next()
            if (buf.hasNext && buf.head.bucket == a.bucket &&
                buf.head.term_hash == a.term_hash && buf.head.doc_range == a.doc_range) {
              val b = buf.next()
              val pa = PostingCodec.decode(a.blob)
              val pb = PostingCodec.decode(b.blob)
              val (docs, metas) = mergeSorted(pa.docIds, pa.metas, pb.docIds, pb.metas)
              val (blob, skip) = PostingCodec.encode(docs, metas)
              PostingBlock(a.bucket, a.term_hash, a.doc_range, docs.length,
                math.max(a.max_pos_count, b.max_pos_count), blob, skip.docIds, skip.offsets)
            } else a
          }
        }
      }
  }

  /** Same adjacent-pair merge for forward blocks, keyed by doc_range; the
    * doc-meta and domain blobs merge in lockstep and the block-max document
    * statistics combine by min/max. */
  private def mergedFwd(spark: SparkSession, basePath: String,
                        deltaPath: String): Dataset[FwdBlock] = {
    import spark.implicits._
    spark.read.parquet(basePath).unionByName(spark.read.parquet(deltaPath))
      .as[FwdBlock]
      .repartition($"doc_range")
      .sortWithinPartitions($"doc_range")
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[FwdBlock] {
          def hasNext: Boolean = buf.hasNext
          def next(): FwdBlock = {
            val a = buf.next()
            if (buf.hasNext && buf.head.doc_range == a.doc_range) {
              val b = buf.next()
              val ma = PostingCodec.decode(a.blob_meta); val mb = PostingCodec.decode(b.blob_meta)
              val da = PostingCodec.decode(a.blob_domain); val db = PostingCodec.decode(b.blob_domain)
              val (docs, metas) = mergeSorted(ma.docIds, ma.metas, mb.docIds, mb.metas)
              val (_, doms) = mergeSorted(da.docIds, da.metas, db.docIds, db.metas)
              val (bm, sm) = PostingCodec.encode(docs, metas)
              val (bd, sd) = PostingCodec.encode(docs, doms)
              FwdBlock(a.doc_range, docs.length,
                math.min(a.min_rank, b.min_rank), math.max(a.max_asl, b.max_asl),
                math.min(a.min_quality, b.min_quality), math.max(a.max_topology, b.max_topology),
                bm, sm.docIds, sm.offsets, bd, sd.docIds, sd.offsets)
            } else a
          }
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
