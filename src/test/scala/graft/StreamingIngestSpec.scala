package graft

import graft.build.IndexConf
import graft.fixtures.Fixtures
import graft.query._
import graft.streaming.StreamingIngest
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Incremental ingest: two waves of corpus files; the second drain must
  * tokenize only the new files (checkpointed offsets), and each compact
  * publishes an atomically-swapped snapshot covering everything ingested. */
class StreamingIngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streaming")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("two-wave ingest + compact: incremental tokenize, snapshot isolation") {
    import spark.implicits._
    val base = Files.createTempDirectory(java.nio.file.Paths.get("target"), "stream").toString
    val corpusDir = s"$base/corpus"
    val root = s"$base/index"

    // wave 1: 512 docs
    val wave1 = (0L until 512L).map(j => Fixtures.genDoc(j, 16, 64))
    wave1.toDF().coalesce(2).write.mode("append").parquet(corpusDir)
    StreamingIngest.ingestAvailable(spark, corpusDir, root)
    val afterWave1 = spark.read.parquet(s"$root/journal_stream/data").count()
    assert(afterWave1 == 512, s"wave1 journal rows=$afterWave1")

    StreamingIngest.compact(spark, root, "snap-1", IndexConf(numBuckets = 8, docRangeShift = 8))
    val idx1 = QueryEngine.open(root)
    val r1 = QueryEngine.search(spark, idx1, QuerySpec(Seq(Subquery(include = Seq("tok000")))))
    assert(r1.nonEmpty)

    // wave 2: 512 more docs — drain must only process the new files
    val wave2 = (512L until 1024L).map(j => Fixtures.genDoc(j, 16, 64))
    wave2.toDF().coalesce(2).write.mode("append").parquet(corpusDir)
    StreamingIngest.ingestAvailable(spark, corpusDir, root)
    val afterWave2 = spark.read.parquet(s"$root/journal_stream/data").count()
    assert(afterWave2 == 1024, s"wave2 journal rows=$afterWave2 (re-tokenized wave1?)")

    // old snapshot still readable until the new one commits
    assert(QueryEngine.open(root).manifest.snapshotId == "snap-1")
    StreamingIngest.compact(spark, root, "snap-2", IndexConf(numBuckets = 8, docRangeShift = 8))
    val idx2 = QueryEngine.open(root)
    assert(idx2.manifest.snapshotId == "snap-2")
    assert(idx2.manifest.docCount == 1024)

    // a doc only present in wave 2 is now searchable: rl terms of repo 8+
    // (wave 1 covered global ordinals 0..511 = repos 0..7)
    val r2 = QueryEngine.search(spark, idx2, QuerySpec(Seq(Subquery(include = Seq("rl_12_0")))))
    assert(r2.nonEmpty, "wave-2 repo-local term not searchable after compact")

    // duplicate re-delivery does not double postings
    wave2.take(10).toDF().coalesce(1).write.mode("append").parquet(corpusDir)
    StreamingIngest.ingestAvailable(spark, corpusDir, root)
    StreamingIngest.compact(spark, root, "snap-3", IndexConf(numBuckets = 8, docRangeShift = 8))
    assert(QueryEngine.open(root).manifest.docCount == 1024, "dedup by (repo,path,commit) failed")

    // snapshot GC: keep 1 → snap-1 goes, the current snap-3 stays queryable
    val removed = graft.tables.Snapshots.expireSnapshots(root, keep = 2)
    assert(removed == Seq("snap-1"), s"removed=$removed")
    assert(QueryEngine.open(root).manifest.snapshotId == "snap-3")
    assert(QueryEngine.search(spark, QueryEngine.open(root),
      QuerySpec(Seq(Subquery(include = Seq("tok000"))))).nonEmpty)
  }

  test("compactIncremental: delta build + block merge equals the full compact") {
    import spark.implicits._
    val base = Files.createTempDirectory(java.nio.file.Paths.get("target"), "stream").toString
    val corpusDir = s"$base/corpus"
    val root = s"$base/index"
    val conf = IndexConf(numBuckets = 8, docRangeShift = 8)

    // no committed base yet → incremental degrades to a full compact
    (0L until 512L).map(j => Fixtures.genDoc(j, 16, 64)).toDF()
      .coalesce(2).write.mode("append").parquet(corpusDir)
    StreamingIngest.ingestAvailable(spark, corpusDir, root)
    val m1 = StreamingIngest.compactIncremental(spark, root, "snap-1", conf)
    assert(m1.docCount == 512 && QueryEngine.open(root).manifest.snapshotId == "snap-1")

    // wave 2 → the incremental path must build ONLY the 512 new docs
    (512L until 1024L).map(j => Fixtures.genDoc(j, 16, 64)).toDF()
      .coalesce(2).write.mode("append").parquet(corpusDir)
    StreamingIngest.ingestAvailable(spark, corpusDir, root)
    val m2 = StreamingIngest.compactIncremental(spark, root, "snap-2", conf)
    assert(m2.snapshotId == "snap-2" && m2.docCount == 1024)
    val deltaDocs = spark.read.parquet(s"$root/snapshots/snap-2-delta/documents").count()
    assert(deltaDocs == 512, s"delta built $deltaDocs docs, not just the new 512")

    // merged snapshot answers across both waves identically to a full compact
    val idx = QueryEngine.open(root)
    val full = StreamingIngest.compact(spark, root, "snap-2-full", conf)
    assert(full.docCount == 1024)
    val idxFull = QueryEngine.open(root)
    assert(idxFull.manifest.snapshotId == "snap-2-full")
    Seq(Seq("tok000"), Seq("rl_12_0"), Seq("tok001", "tok002")).foreach { terms =>
      val q = QuerySpec(Seq(Subquery(include = terms)))
      val a = QueryEngine.search(spark, idx, q).map(r => (r.url_id, r.score))
      val b = QueryEngine.search(spark, idxFull, q).map(r => (r.url_id, r.score))
      assert(a == b && a.nonEmpty, s"incremental vs full diverged on $terms")
    }

    // nothing new → returns the committed base unchanged, no new snapshot
    graft.tables.Snapshots.commit(root, "snap-2")
    val m3 = StreamingIngest.compactIncremental(spark, root, "snap-3", conf)
    assert(m3.snapshotId == "snap-2")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "snapshots", "snap-3")))

    // config change → falls back to a full rebuild under the new config
    val m4 = StreamingIngest.compactIncremental(spark, root, "snap-4",
      IndexConf(numBuckets = 16, docRangeShift = 8))
    assert(m4.snapshotId == "snap-4" && m4.numBuckets == 16 && m4.docCount == 1024)
  }

  test("stageDelta + searchParts serve a live view matching the eventual compact") {
    import spark.implicits._
    val base = Files.createTempDirectory(java.nio.file.Paths.get("target"), "stream").toString
    val corpusDir = s"$base/corpus"
    val root = s"$base/index"
    val conf = IndexConf(numBuckets = 8, docRangeShift = 8)
    (0L until 512L).map(j => Fixtures.genDoc(j, 16, 64)).toDF()
      .coalesce(2).write.mode("append").parquet(corpusDir)
    StreamingIngest.ingestAvailable(spark, corpusDir, root)
    StreamingIngest.compact(spark, root, "snap-1", conf)

    // wave 2 staged as a delta — the reader pointer must not move
    (512L until 1024L).map(j => Fixtures.genDoc(j, 16, 64)).toDF()
      .coalesce(2).write.mode("append").parquet(corpusDir)
    StreamingIngest.ingestAvailable(spark, corpusDir, root)
    val d = StreamingIngest.stageDelta(spark, root, "delta-1", conf)
    assert(d.exists(_.docCount == 512), s"stageDelta returned $d")
    assert(QueryEngine.open(root).manifest.snapshotId == "snap-1",
      "staging a delta moved the reader pointer")

    // live view sees both waves; single-snapshot readers see only wave 1
    val q = QuerySpec(Seq(Subquery(include = Seq("tok000"))),
      limitByDomain = 3, limitTotal = 30)
    val parts = Seq(QueryEngine.openSnapshot(root, "snap-1", spark),
      QueryEngine.openSnapshot(root, "delta-1", spark))
    val live = QueryEngine.searchParts(spark, parts, q)
    val qWave2 = QuerySpec(Seq(Subquery(include = Seq("rl_12_0"))))
    assert(QueryEngine.searchParts(spark, parts, qWave2).nonEmpty,
      "live view blind to the staged delta")
    assert(QueryEngine.search(spark, QueryEngine.open(root), qWave2).isEmpty,
      "base alone should not see wave 2")

    // after folding the delta in, the compacted snapshot returns the same list
    graft.build.SnapshotMerge.mergeSnapshots(spark, root, "snap-1", "delta-1", "snap-2")
    val compacted = QueryEngine.search(spark, QueryEngine.open(root), q)
    assert(QueryEngine.open(root).manifest.snapshotId == "snap-2")
    assert(live == compacted && live.nonEmpty, s"live $live\nvs compacted $compacted")
  }
}
