package graft.sched

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
  * salted — (host, saltOf(url) % S) — so the hot host spreads over
  * S sub-queues that share a divided token budget, and the scheduling
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
    * position within its (host, salt) queue. rank is a Long: a single
    * (host, salt) queue can exceed 2^31 rows at the 10^10-URL design
    * point, and an Int overflow would wrap rank negative — making
    * tick_index negative, so every overflowed row would silently pass
    * the `tick_index < ticksPerRound` budget check.
    */
  case class SchedOut(url: String, host: String, priority: Long, tiebreak: String,
                      salt: Int, rank: Long, tick_index: Long, scheduled_ms: Long)

  /** Token-bucket assignment under a virtual clock: within each
    * (host, salt) queue ordered by (priority, tiebreak, url), the
    * r-th URL (1-based) runs at tick ⌊(r−1)/tokensPerTick⌋.
    *
    * Typed wrapper over [[assignVirtualTicksCols]].
    */
  def assignVirtualTicks(in: Dataset[SchedIn], saltCount: Int, tokensPerTick: Int,
                         tickMs: Long): Dataset[SchedOut] = {
    val spark = in.sparkSession
    import spark.implicits._
    assignVirtualTicksCols(in.toDF(), saltCount, tokensPerTick, tickMs)
      .select("url", "host", "priority", "tiebreak", "salt", "rank",
        "tick_index", "scheduled_ms")
      .as[SchedOut]
  }

  /** Column-generic token-bucket assignment: the input needs
    * (url, host, priority, tiebreak) columns; EVERY other column is
    * carried through untouched (so a caller can schedule its full task
    * rows — no lossy projection, no re-join on a non-unique url
    * afterwards). Appends (salt, rank, tick_index, scheduled_ms).
    *
    * Spill-safe by construction: one hash exchange on (host, salt),
    * then `sortWithinPartitions` (Spark's external, spilling sorter —
    * a queue larger than executor memory sorts through disk), then a
    * STREAMING rank in mapPartitions whose only state is the current
    * (host, salt) key and a counter. Nothing buffers a whole group —
    * the previous flatMapGroups formulation held each (host, salt)
    * queue in one in-memory array, which with the reference's
    * single-host workload and saltCount=1 meant the ENTIRE frontier
    * in one task's heap.
    */
  def assignVirtualTicksCols(df: DataFrame, saltCount: Int, tokensPerTick: Int,
                             tickMs: Long): DataFrame = {
    require(saltCount > 0 && tokensPerTick > 0)
    // EXACTLY-uniform partition placement. A plain
    // repartition(host, salt) throws the saltCount (host, salt) queues
    // into numPartitions bins by murmur3 — a binomial balls-in-bins
    // process whose fullest bin runs ~2-2.5x the mean (measured: the
    // fetch/extract stage's max task 2.5x its mean, parallel
    // efficiency 40% on one wave). Instead each queue picks its target
    // partition directly — pmod(xxhash64(host) + salt, n), uniform
    // because the salt is uniform — and routes there through a TOKEN
    // column chosen so Spark's HashPartitioning (pmod(murmur3(token),
    // n)) lands exactly on that partition. Same single shuffle, no
    // extra pass, fullest-bin ratio ~1.01 (sums of consecutive salts).
    val numParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val tokens = partitionTokens(numParts)
    val sorted = df
      .withColumn("salt", saltCol(col("url"), saltCount))
      .withColumn("__ptok", element_at(
        lit(tokens),
        (pmod(xxhash64(col("host")) + col("salt"), lit(numParts.toLong)) + 1).cast("int")))
      .repartition(numParts, col("__ptok"))
      .drop("__ptok")
      .sortWithinPartitions(col("host"), col("salt"), col("priority"),
        col("tiebreak"), col("url"))
    val outSchema = StructType(sorted.schema.fields ++ Seq(
      StructField("rank", LongType, nullable = false),
      StructField("tick_index", LongType, nullable = false),
      StructField("scheduled_ms", LongType, nullable = false)))
    val hostIdx = sorted.schema.fieldIndex("host")
    val saltIdx = sorted.schema.fieldIndex("salt")
    sorted.mapPartitions { it =>
      var curHost: String = null
      var curSalt = Int.MinValue
      var rank = 0L
      it.map { r =>
        val host = r.getString(hostIdx)
        val salt = r.getInt(saltIdx)
        if (host != curHost || salt != curSalt) {
          curHost = host; curSalt = salt; rank = 0L
        }
        rank += 1
        val tick = (rank - 1) / tokensPerTick
        Row.fromSeq(r.toSeq :+ rank :+ tick :+ (tick * tickMs))
      }
    }(Encoders.row(outSchema))
  }

  /** For each partition p in [0, n): an Int token whose Spark
    * HashPartitioning id — pmod(murmur3_x86_32(token, seed=42), n),
    * exactly what `repartition(n, col)` computes for an int column —
    * equals p. Found by linear search (coupon-collector, ~n·ln n
    * probes); cached per n.
    */
  private val tokenCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Int]]()
  def partitionTokens(n: Int): Array[Int] =
    tokenCache.computeIfAbsent(n, { n =>
      val tokens = new Array[Int](n)
      val found = new Array[Boolean](n)
      var remaining = n
      var t = 0
      while (remaining > 0) {
        val p = math.floorMod(
          org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(t, 42), n)
        if (!found(p)) { found(p) = true; tokens(p) = t; remaining -= 1 }
        t += 1
      }
      tokens
    })

  /** Stable salt — same function driver-, executor- and oracle-side.
    * A base-131 polynomial over the first FOUR hex chars of md5(url),
    * so a DuckDB oracle can restate it exactly with ascii/substr.
    * Uniformity matters: the salt drives the partitioning of the
    * politeness/fetch leg, and a skewed salt stalls the widest
    * cluster on its most-loaded core (measured: a 2-char *31 variant
    * had max/mean ≈ 2.0 over 64 salts and cost ~0.2 of N→4N scaling
    * efficiency; 4 chars × 131 measures ≈ 1.05).
    */
  def saltOf(url: String, saltCount: Int): Int =
    if (saltCount <= 1) 0
    else {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(url.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      def hex(i: Int): Int = {
        val b = d(i / 2)
        val nib = if (i % 2 == 0) (b >> 4) & 0xf else b & 0xf
        java.lang.Character.forDigit(nib, 16).toInt
      }
      val v = ((hex(0) * 131 + hex(1)) * 131 + hex(2)) * 131 + hex(3)
      math.floorMod(v, saltCount)
    }

  /** Column twin of [[saltOf]] — pure built-ins, codegen'd.
    * 131^3=2248091, 131^2=17161 (flat polynomial, one md5 call).
    */
  def saltCol(url: Column, saltCount: Int): Column =
    if (saltCount <= 1) lit(0)
    else {
      val h = md5(url)
      pmod(
        ascii(substring(h, 1, 1)) * 2248091 + ascii(substring(h, 2, 1)) * 17161 +
          ascii(substring(h, 3, 1)) * 131 + ascii(substring(h, 4, 1)),
        lit(saltCount))
    }

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
