package graft.sched

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Politeness scheduling (SURVEY.md §2.9 ST1/ST2/ST3).
  *
  * The reference sleeps 0.3 s between page requests per stream
  * (cninfo_report_crawler.py:331) and bounds fan-out with thread
  * pools (10 validate / 5 fetch). Here the same budget is a per-host
  * token bucket under a VIRTUAL clock: each URL is assigned a
  * scheduled tick; nothing wall-sleeps, so tests are deterministic
  * and the bench measures scheduling work, not sleeps.
  *
  * Skew (ST2): the reference workload is single-host
  * (static.cninfo.com.cn), i.e. one hot key. The bucket key is
  * salted — (host, xxhash64(url) % S) — so the hot host spreads over
  * S sub-queues that share a divided token budget, and the groupByKey
  * shuffle has S× the parallelism. Per-host ordering is preserved
  * within a scheduled batch by the priority sort inside each group
  * (the reference's own guarantee is no stronger: thread completion
  * was already unordered, SURVEY.md §3.1).
  */
object Scheduler {

  /** One URL awaiting politeness assignment. priority: smaller =
    * sooner; the crawl's key is (announce date, stock code, page
    * depth) encoded into `priority` + `tiebreak`.
    */
  case class SchedIn(url: String, host: String, priority: Long, tiebreak: String)

  /** The assignment: tickIndex = which politeness tick (virtual time
    * = tickIndex × tickMs) the URL may fetch at; rank = 1-based
    * position within its (host, salt) queue.
    */
  case class SchedOut(url: String, host: String, priority: Long, tiebreak: String,
                      salt: Int, rank: Int, tick_index: Long, scheduled_ms: Long)

  /** Token-bucket assignment under a virtual clock: within each
    * (host, salt) queue ordered by (priority, tiebreak, url), the
    * r-th URL (1-based) runs at tick ⌊(r−1)/tokensPerTick⌋.
    *
    * Implemented as groupByKey/flatMapGroups (typed, order
    * controlled); semantically equal to the closed-form window
    * rank — the SQL oracle checks that equality.
    */
  def assignVirtualTicks(in: Dataset[SchedIn], saltCount: Int, tokensPerTick: Int,
                         tickMs: Long): Dataset[SchedOut] = {
    val spark = in.sparkSession
    import spark.implicits._
    require(saltCount > 0 && tokensPerTick > 0)
    in.groupByKey(r => (r.host, saltOf(r.url, saltCount)))
      .flatMapGroups { (key: (String, Int), rows: Iterator[SchedIn]) =>
        val (host, salt) = key
        // Per-round group sizes are bounded by the frontier batch
        // size, so the in-memory sort is safe by construction.
        val sorted = rows.toArray.sortBy(r => (r.priority, r.tiebreak, r.url))
        sorted.iterator.zipWithIndex.map { case (r, i) =>
          val tick = i.toLong / tokensPerTick
          SchedOut(r.url, host, r.priority, r.tiebreak, salt, i + 1, tick, tick * tickMs)
        }
      }
  }

  /** Stable salt — same function driver- and executor-side. */
  def saltOf(url: String, saltCount: Int): Int =
    if (saltCount <= 1) 0
    else math.floorMod(scala.util.hashing.MurmurHash3.stringHash(url), saltCount)

  /** ST3: robots.txt gate. `rules` is a small (host, path_prefix,
    * allow) table — collected once, broadcast, and matched per row
    * with longest-prefix-wins; no match ⇒ allowed. Returns the input
    * plus `robots_denied`.
    *
    * Deliberately a NARROW op (broadcast + per-row match), not a
    * prefix-join: a rules table is robots.txt-sized (thousands of
    * rows across hosts), while tasks are the 10^10-scale side — a
    * join would shuffle the big side for nothing; this touches it
    * in place.
    */
  def robotsGate(tasks: DataFrame, rules: DataFrame): DataFrame = {
    val byHost: Map[String, Seq[(String, Boolean)]] = rules
      .select(col("host"), col("path_prefix"), col("allow"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
      .groupBy(_._1)
      .view.mapValues(_.map(t => (t._2, t._3)).sortBy(-_._1.length).toSeq)
      .toMap
    val bc = tasks.sparkSession.sparkContext.broadcast(byHost)
    val denied = udf { (host: String, url: String) =>
      // null-tolerant: a null url cannot match any deny prefix
      if (url == null) false
      else bc.value.get(host) match {
        case None => false
        case Some(prefixes) =>
          val rest = { val i = url.indexOf("://"); if (i < 0) url else url.substring(i + 3) }
          val slash = rest.indexOf('/')
          val path = if (slash >= 0) rest.substring(slash) else "/"
          prefixes.collectFirst { case (p, allow) if path.startsWith(p) => !allow }
            .getOrElse(false)
      }
    }
    tasks.withColumn("robots_denied", denied(col("host"), col("url")))
  }
}
