package graft.streaming

import graft.sched.Scheduler
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming variants of the crawl's stateful behaviors (SURVEY.md
  * §2.9): the batch engine is the primary path (the reference is a
  * batch poller), but the same semantics compose as a Structured
  * Streaming pipeline for a continuously-discovered frontier.
  *
  *  - ST5 late/duplicate data: watermarked stream dedup on the
  *    canonical announcement key (`dropDuplicatesWithinWatermark`,
  *    bounded state — exactly the first-wins seen semantics within
  *    the watermark horizon; the snapshot seen-table anti-join
  *    remains the source of truth across restarts).
  *  - ST1 politeness: per-(host,salt) token bucket carried as
  *    explicit group state in `flatMapGroupsWithState` — the
  *    streaming twin of the batch virtual-tick assignment.
  *  - ST6 per-day tumbling partition: 1-day event-time windows with
  *    watermark-bounded state.
  */
object StreamingCrawl {

  /** ST5: first-wins dedup over a (possibly late) announcement
    * stream. Input must carry `announce_ts` (event time) and
    * `seen_key`. State is bounded by the watermark delay.
    */
  def dedupWithinWatermark(anns: DataFrame, delay: String = "1 day"): DataFrame =
    anns.withWatermark("announce_ts", delay)
      .dropDuplicatesWithinWatermark("seen_key")

  /** ST6: per-day tumbling counts of announcements (the streaming
    * analog of the seed's one-day seDate partition).
    */
  def dailyCounts(anns: DataFrame, delay: String = "1 day"): DataFrame =
    anns.withWatermark("announce_ts", delay)
      .groupBy(window(col("announce_ts"), "1 day"))
      .agg(count(lit(1)).as("n_announcements"))
      .select(col("window.start").as("day"), col("n_announcements"))

  final case class StreamTask(url: String, host: String, priority: Long)

  /** Token-bucket state per (host, salt): the virtual tick the next
    * fetch may run at.
    */
  final case class BucketState(nextTick: Long, usedInTick: Int)

  final case class ScheduledFetch(url: String, host: String, salt: Int,
                                  tick_index: Long, scheduled_ms: Long)

  /** ST1 streaming politeness: per micro-batch, each (host, salt)
    * group drains its queue in priority order, continuing from the
    * bucket state left by previous batches. State never grows — it is
    * exactly (nextTick, usedInTick).
    */
  def politenessStream(tasks: Dataset[StreamTask], saltCount: Int, tokensPerTick: Int,
                       tickMs: Long): Dataset[ScheduledFetch] = {
    val spark = tasks.sparkSession
    import spark.implicits._
    tasks
      .groupByKey(t => (t.host, Scheduler.saltOf(t.url, saltCount)))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: (String, Int), rows: Iterator[StreamTask], state: GroupState[BucketState]) => {
          val (host, salt) = key
          var st = state.getOption.getOrElse(BucketState(0L, 0))
          // The sort buffer holds ONE micro-batch's slice of one
          // (host, salt) queue — bounded by the trigger interval, not
          // by the frontier (the batch path's unbounded-group pitfall
          // does not apply; its spillable sort lives in
          // Scheduler.assignVirtualTicksCols). Group STATE stays O(1).
          val out = rows.toArray.sortBy(t => (t.priority, t.url)).map { t =>
            if (st.usedInTick >= tokensPerTick) st = BucketState(st.nextTick + 1, 0)
            val assigned = ScheduledFetch(t.url, host, salt, st.nextTick, st.nextTick * tickMs)
            st = st.copy(usedInTick = st.usedInTick + 1)
            assigned
          }
          state.update(st)
          out.iterator
        })
  }
}
