package graft

import graft.streaming.{Session, SessionEvent, StreamingOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming machinery checks: watermarked windowed aggregation and
  * flatMapGroupsWithState sessionization must match their batch twins. */
class StreamingOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streamops")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  test("streaming windowed counts equal the batch twin after the drain") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val events = Seq(
      (1L, ts(0), "click"), (2L, ts(5), "click"), (3L, ts(62), "view"),
      (4L, ts(61), "click"), (5L, ts(10), "view"))
    val batch = events.toDF("user_id", "ts", "event_type")
    val expect = StreamingOps.windowedCounts(batch)
      .orderBy("w_start", "event_type").collect().map(_.toSeq).toSeq

    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val stream = StreamingOps.windowedCounts(
      mem.toDF().toDF("user_id", "ts", "event_type"))
    val q = stream.writeStream.format("memory").queryName("wc")
      .outputMode("complete").start()
    mem.addData(events.take(2): _*)
    q.processAllAvailable()
    mem.addData(events.drop(2): _*)
    q.processAllAvailable()
    val got = spark.table("wc").orderBy("w_start", "event_type")
      .collect().map(_.toSeq).toSeq
    q.stop()
    assert(got === expect)
  }

  test("flatMapGroupsWithState sessionization: in-batch splits + timeout emit") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val sessions = StreamingOps.sessionizeStream(mem.toDS(), gapSec = 600L,
      watermark = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()

    // user 1: two events 5 min apart (one session), then a 20-min gap event
    // → the first session closes IN BATCH on the gap split
    mem.addData(SessionEvent(1L, ts(0)), SessionEvent(1L, ts(5)), SessionEvent(1L, ts(25)))
    q.processAllAvailable()
    val afterBatch = spark.table("sess").as[Session].collect()
    assert(afterBatch.length === 1)
    assert(afterBatch(0).n_events === 2 && afterBatch(0).duration_sec === 300L)

    // advancing the watermark far past user 1's open-session deadline (via
    // another user's much-later event) fires the event-time timeout
    mem.addData(SessionEvent(2L, ts(120)))
    q.processAllAvailable()
    mem.addData(SessionEvent(2L, ts(121))) // one more microbatch so timeouts run
    q.processAllAvailable()
    val afterTimeout = spark.table("sess").as[Session].collect()
    q.stop()
    val user1 = afterTimeout.filter(_.user_id == 1L)
    assert(user1.length === 2, s"open session must emit on timeout: ${afterTimeout.toSeq}")
    assert(user1.exists(s => s.n_events == 1 && s.duration_sec == 0L))
  }

  test("batch sessionization matches a hand-computed example") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(0)), (1L, ts(5)), (1L, ts(25)), // gap 20min > 10min → 2 sessions
      (2L, ts(0)))
      .toDF("user_id", "ts")
    val got = StreamingOps.sessionizeBatch(events, 600L).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 2L, 300L), (1L, 1L, 0L), (2L, 1L, 0L)))
  }

  test("streaming dedup: arrival-order keepers, single-drain equals batch twin") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import graft.streaming.DocKey

    // two triggers: hash A keeps 5 (first trigger's min), the LATER lower-id
    // duplicate 3 is not-first; B and C keep their own ids
    val mem = MemoryStream[DocKey]
    val q = StreamingOps.dedupStream(mem.toDS())
      .writeStream.format("memory").queryName("dv").outputMode("append").start()
    mem.addData(DocKey(7L, "A"), DocKey(5L, "A"), DocKey(11L, "B"))
    q.processAllAvailable()
    mem.addData(DocKey(3L, "A"), DocKey(20L, "C"))
    q.processAllAvailable()
    val got = spark.table("dv").as[graft.streaming.DedupVerdict].collect()
      .map(v => (v.doc_id, v.content_hash, v.is_first)).sortBy(_._1)
    q.stop()
    assert(got.toSeq === Seq((3L, "A", false), (5L, "A", true), (7L, "A", false),
      (11L, "B", true), (20L, "C", true)))

    // single-trigger drain over the same rows = the batch twin's min-id rule
    val mem2 = MemoryStream[DocKey]
    val q2 = StreamingOps.dedupStream(mem2.toDS())
      .writeStream.format("memory").queryName("dv1").outputMode("append").start()
    mem2.addData(DocKey(7L, "A"), DocKey(5L, "A"), DocKey(11L, "B"),
      DocKey(3L, "A"), DocKey(20L, "C"))
    q2.processAllAvailable()
    val one = spark.table("dv1").as[graft.streaming.DedupVerdict].collect()
      .map(v => (v.doc_id, v.is_first)).sortBy(_._1)
    q2.stop()
    val twin = StreamingOps.dedupVerdictBatch(
      Seq((7L, "a"), (5L, "a"), (11L, "b"), (3L, "a"), (20L, "c")).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).sortBy(_._1)
    assert(one.toSeq === twin.toSeq)
  }
}
