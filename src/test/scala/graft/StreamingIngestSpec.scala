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
}
