package graft.build

import graft.core.PostingCodec
import graft.tables.Snapshots
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental index maintenance: merge N disjoint snapshots (a base plus
  * one or more append-only deltas) into one snapshot WITHOUT rebuilding from
  * the corpus.
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
  * Scale shape per table:
  *  - postings (and postings_prio): union of the block tables → one exchange
  *    ON ENCODED BLOCKS hashed by (bucket, docRange) →
  *    sortWithinPartitions(term, range) → single-pass run merge (≤N blocks
  *    share a (term, range) key — each input contributes at most one).
  *    Decode + merge-sort + re-encode happens only for keys present on >1
  *    input; single-input blocks pass through byte-identical.
  *  - fwd: same pattern keyed by doc_range; block extremes (min_rank &c.)
  *    combine by min/max.
  *  - term_stats: df counters add per term (deltas are append-only).
  *  - journal/documents: parquet union append.
  *
  * Because each input's block arrays are sorted by rank_doc_id and the
  * doc-id sets are disjoint (validated), the merged arrays are exactly what
  * a full rebuild over the combined journal would have sorted and encoded —
  * the merged snapshot is BYTE-equivalent where it matters and
  * query-identical (pinned in SnapshotMergeSpec). Updated/deleted documents
  * are NOT handled here: re-ingesting a (repo, path, commit) key falls back
  * to [[StreamingIngest.compact]]'s full rebuild, which remains correct.
  *
  * The optional `domain_neighbors` table is intentionally not merged — its
  * per-repo top-N by link weight is not a union-compatible aggregate; re-run
  * [[IndexBuilder.writeDomainNeighbors]] on the merged snapshot.
  */
object SnapshotMerge {

  /** Binary convenience form: merge `baseId` + `deltaId` into `outId`. */
  def mergeSnapshots(spark: SparkSession, root: String, baseId: String,
                     deltaId: String, outId: String): Snapshots.Manifest =
    mergeSnapshots(spark, root, Seq(baseId, deltaId), outId)

  /** Merge the snapshots `ids` (all under `root`) into a new committed
    * snapshot `outId`. All inputs must share the build configuration and
    * have pairwise-disjoint doc_id sets. */
  def mergeSnapshots(spark: SparkSession, root: String, ids: Seq[String],
                     outId: String): Snapshots.Manifest = {
    import spark.implicits._
    require(ids.size >= 2, s"need at least two snapshots to merge, got $ids")
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

    val dup = dirs.map(d => spark.read.parquet(s"$d/documents").select($"doc_id"))
      .reduce(_ unionByName _)
      .groupBy($"doc_id").agg(count(lit(1)).as("c")).where($"c" > 1L)
      .select($"doc_id").take(1)
    require(dup.isEmpty,
      s"doc_id ${dup.headOption.map(_.getLong(0)).getOrElse(-1L)} exists in more than one snapshot — " +
        "merge is append-only; re-ingested documents need a compact (full rebuild)")

    // journal is only persisted by the corpus-level build ([[IndexBuilder
    // .build]]); journal-DataFrame builds have documents but no journal table
    def unionTable(name: String, stage: String): Boolean =
      if (Snapshots.isStageDone(root, outId, stage)) true
      else if (!ids.forall(Snapshots.isStageDone(root, _, stage))) false
      else {
        dirs.map(d => spark.read.parquet(s"$d/$name")).reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$outDir/$name")
        Snapshots.markStageDone(root, outId, stage)
        true
      }
    val withJournal = unionTable("journal", IndexBuilder.StageJournal)
    unionTable("documents", IndexBuilder.StageDocs)

    if (!Snapshots.isStageDone(root, outId, IndexBuilder.StagePostings)) {
      mergedPostings(spark, dirs.map(d => s"$d/postings"))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$outDir/postings")
      Snapshots.markStageDone(root, outId, IndexBuilder.StagePostings)
    }
    val withPrio = manifests.forall(_.stagesDone.contains(IndexBuilder.StagePrio))
    if (withPrio && !Snapshots.isStageDone(root, outId, IndexBuilder.StagePrio)) {
      mergedPostings(spark, dirs.map(d => s"$d/postings_prio"))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$outDir/postings_prio")
      Snapshots.markStageDone(root, outId, IndexBuilder.StagePrio)
    }

    if (!Snapshots.isStageDone(root, outId, IndexBuilder.StageStats)) {
      dirs.map(d => spark.read.parquet(s"$d/term_stats")).reduce(_ unionByName _)
        .groupBy($"term_hash")
        .agg(sum($"df_full").as("df_full"), sum($"df_prio").as("df_prio"))
        .withColumn("bucket", pmod($"term_hash", lit(nb.toLong)).cast("int"))
        .select($"bucket", $"term_hash", $"df_full", $"df_prio")
        .repartition(nb, $"bucket")
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$outDir/term_stats")
      Snapshots.markStageDone(root, outId, IndexBuilder.StageStats)
    }

    if (!Snapshots.isStageDone(root, outId, IndexBuilder.StageFwd)) {
      mergedFwd(spark, dirs.map(d => s"$d/fwd"))
        .write.mode("overwrite").parquet(s"$outDir/fwd")
      Snapshots.markStageDone(root, outId, IndexBuilder.StageFwd)
    }

    val manifest = Snapshots.Manifest(
      outId, manifests.map(_.docCount).sum, nb, head.docRangeShift,
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
    * (bucket, term, range) key. Keys on one input only pass through without
    * decode. Every input was encoded from a rank_doc_id-sorted disjoint run,
    * so folding two-pointer merges reproduces the exact array a full rebuild
    * sorts — the re-encoded blob is byte-identical to the rebuilt one. */
  private def mergedPostings(spark: SparkSession,
                             paths: Seq[String]): Dataset[PostingBlock] = {
    import spark.implicits._
    val cols = Seq("bucket", "term_hash", "doc_range", "n", "max_pos_count",
      "blob", "skip_docs", "skip_offs").map(col)
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
        val buf = it.buffered
        def sameKey(a: PostingBlock, b: PostingBlock): Boolean =
          a.bucket == b.bucket && a.term_hash == b.term_hash && a.doc_range == b.doc_range
        new Iterator[PostingBlock] {
          def hasNext: Boolean = buf.hasNext
          def next(): PostingBlock = {
            val a = buf.next()
            if (!buf.hasNext || !sameKey(buf.head, a)) a
            else {
              val pa = PostingCodec.decode(a.blob)
              var docs = pa.docIds; var metas = pa.metas
              var maxPos = a.max_pos_count
              while (buf.hasNext && sameKey(buf.head, a)) {
                val b = buf.next()
                val pb = PostingCodec.decode(b.blob)
                val m = mergeSorted(docs, metas, pb.docIds, pb.metas)
                docs = m._1; metas = m._2
                maxPos = math.max(maxPos, b.max_pos_count)
              }
              val (blob, skip) = PostingCodec.encode(docs, metas)
              PostingBlock(a.bucket, a.term_hash, a.doc_range, docs.length,
                maxPos, blob, skip.docIds, skip.offsets)
            }
          }
        }
      }
  }

  /** Same run merge for forward blocks, keyed by doc_range; the doc-meta and
    * domain blobs merge in lockstep and the block-max document statistics
    * combine by min/max. */
  private def mergedFwd(spark: SparkSession, paths: Seq[String]): Dataset[FwdBlock] = {
    import spark.implicits._
    paths.map(spark.read.parquet(_)).reduce(_ unionByName _)
      .as[FwdBlock]
      .repartition($"doc_range")
      .sortWithinPartitions($"doc_range")
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[FwdBlock] {
          def hasNext: Boolean = buf.hasNext
          def next(): FwdBlock = {
            val a = buf.next()
            if (!buf.hasNext || buf.head.doc_range != a.doc_range) a
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
              val (bm, sm) = PostingCodec.encode(docs, metas)
              val (bd, sd) = PostingCodec.encode(docs, doms)
              FwdBlock(a.doc_range, docs.length, minRank, maxAsl, minQ, maxTopo,
                bm, sm.docIds, sm.offsets, bd, sd.docIds, sd.offsets)
            }
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
