package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One raw event for sessionization (events-table shape, slimmed). */
final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)

/** Open-session accumulator held in stream state (epoch millis). */
final case class SessionAgg(start: Long, last: Long, n: Int)

/** One closed session. */
final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                         n_events: Int, duration_sec: Long)

/** One incoming document key for streaming dedup (hash precomputed upstream,
  * e.g. `md5(text)` riding the ingest projection). */
final case class DocKey(doc_id: Long, content_hash: String)

/** Streaming dedup verdict: `is_first` = this doc is the hash's keeper. */
final case class DedupVerdict(doc_id: Long, content_hash: String, is_first: Boolean)

/** Streaming analytics over the `events` stream (SURVEY §2.11 beyond
  * ingestion): watermarked tumbling-window aggregation and gap-based
  * sessionization with custom state (`flatMapGroupsWithState`). Each has a
  * batch twin with identical semantics so the DuckDB oracle checks the
  * LOGIC and the streaming spec checks the incremental machinery
  * (state, watermark, event-time timeout).
  *
  * Scale notes: windowed counts are a keyed streaming aggregation — state is
  * one row per (window, event_type), pruned by the watermark; sessionization
  * shuffles by user_id and holds ONE open-session struct per active user,
  * emitted and dropped on event-time timeout. Both survive a 1000-executor
  * deployment because state is per-key and bounded, never per-event.
  */
object StreamingOps {

  /** Tumbling-window event counts per type. On a streaming input the
    * watermark bounds state (late rows beyond it are dropped — exactly the
    * documented Structured Streaming contract); on a batch input the same
    * expression tree runs as a plain aggregation, so the oracle applies. */
  def windowedCounts(events: DataFrame, windowDur: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))
  }

  /** Batch gap-sessionization: a new session starts when the per-user gap
    * exceeds `gapSec`. Window functions keyed by user — one shuffle. */
  def sessionizeBatch(events: DataFrame, gapSec: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
    // sub-second precision: gaps and durations in double epoch seconds
    // (unix_timestamp floors to seconds BEFORE subtracting, which shifts
    // session boundaries on microsecond timestamps; DuckDB's epoch() keeps
    // the fraction — both sides must subtract first, floor last)
    events.select(col("user_id"), col("ts"), col("ts").cast("timestamp").cast("double").as("tsd"))
      .withColumn("prevd", lag("tsd", 1).over(w))
      .withColumn("new_s",
        when(col("prevd").isNull || col("tsd") - col("prevd") > gapSec.toDouble, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("ts").as("session_start"), max("tsd").as("end_d"), min("tsd").as("start_d"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("n_events"),
        floor(col("end_d") - col("start_d")).cast("long").as("duration_sec"))
      .orderBy("user_id", "session_start")
  }

  /** DuckDB oracle mirroring [[sessionizeBatch]]. */
  def sessionizeBatchOracleSql(gapSec: Long): String =
    s"""WITH e AS (SELECT user_id, ts,
       |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
       |       OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > $gapSec
       |       THEN 1 ELSE 0 END AS new_s
       |  FROM events),
       |s AS (SELECT user_id, ts,
       |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM e)
       |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
       |CAST(floor(epoch(max(ts)) - epoch(min(ts))) AS BIGINT) AS duration_sec
       |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  /** Streaming exact-dedup verdict: one row per incoming document, flagged
    * `is_first` iff its content hash was never seen before (LLM-pipeline
    * dedup-on-ingest — the streaming face of `DedupOps.exactDups`).
    *
    * Semantics are ARRIVAL-ORDER, the standard streaming-dedup contract
    * (Spark's own `dropDuplicates` on a stream behaves the same way): the
    * keeper of a hash is the lowest doc_id in the first trigger that carries
    * it; later triggers' duplicates — even with lower ids — are not-first.
    * On a single-trigger drain (Trigger.AvailableNow over a stored table)
    * this coincides with [[dedupVerdictBatch]]'s min-doc_id rule exactly.
    *
    * Scale: state is one {hash → keeper id} row per DISTINCT document — the
    * same footprint Spark's dropDuplicates keeps, RocksDB-backed on a real
    * cluster; shuffle is keyed by content hash so duplicates co-locate. For
    * bounded state on endless streams, feed a watermarked input and age out
    * with dropDuplicatesWithinWatermark upstream; this operator keeps
    * NoTimeout because corpus dedup wants exact all-time verdicts. */
  def dedupStream(docs: Dataset[DocKey]): Dataset[DedupVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.content_hash)
      .flatMapGroupsWithState[Long, DedupVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (hash: String, rows: Iterator[DocKey], state: GroupState[Long]) =>
          val ids = rows.map(_.doc_id).toArray.sorted
          val out = state.getOption match {
            case Some(_) => ids.iterator.map(DedupVerdict(_, hash, is_first = false))
            case None =>
              state.update(ids.head)
              Iterator(DedupVerdict(ids.head, hash, is_first = true)) ++
                ids.iterator.drop(1).map(DedupVerdict(_, hash, is_first = false))
          }
          out
      }
  }

  /** Batch twin of [[dedupStream]] over (doc_id, text): keeper = min doc_id
    * per content hash — one window over the hash shuffle, no join. */
  def dedupVerdictBatch(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").cast("long").as("doc_id"), md5(col("text")).as("content_hash"))
      .withColumn("is_first",
        col("doc_id") === min("doc_id").over(Window.partitionBy("content_hash")))
      .orderBy("doc_id")

  /** DuckDB oracle mirroring [[dedupVerdictBatch]]. */
  def dedupVerdictOracleSql: String =
    """SELECT doc_id, md5(text) AS content_hash,
      |doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_first
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Streaming gap-sessionization: custom per-user state via
    * `flatMapGroupsWithState` (Append + event-time timeout). Sessions closed
    * by an in-batch gap emit immediately; the open session is held in state
    * and emitted when the watermark passes its gap deadline. */
  def sessionizeStream(events: Dataset[SessionEvent], gapSec: Long,
                       watermark: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAgg, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[SessionEvent], state: GroupState[SessionAgg]) =>
          def close(s: SessionAgg): Session =
            Session(user, new java.sql.Timestamp(s.start), s.n, (s.last - s.start) / 1000L)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(close(s))
          } else {
            val times = evs.map(_.ts.getTime).toArray.sorted
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            var cur = state.getOption.orNull
            times.foreach { t =>
              if (cur == null) cur = SessionAgg(t, t, 1)
              else if (t - cur.last > gapSec * 1000L) {
                out += close(cur)
                cur = SessionAgg(t, t, 1)
              } else cur = SessionAgg(cur.start, math.max(cur.last, t), cur.n + 1)
            }
            if (cur != null) {
              state.update(cur)
              state.setTimeoutTimestamp(cur.last + gapSec * 1000L)
            }
            out.iterator
          }
      }
  }
}
