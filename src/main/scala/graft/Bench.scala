package graft

import graft.bench.ReplayBench
import org.apache.spark.sql.SparkSession

/** Benchmark entry (driver-run per round → BENCH_r{N}.json).
  *
  * Emits ONE JSON line on stdout AND writes it to BENCH/latest.json
  * (stdout gets wrapped in sbt's [info] prefix; the file is the
  * machine-readable artifact):
  *  - metric/value/unit: the north-star URLs scheduled+fetched/sec on
  *    the seed-list replay pipeline at the 4N level
  *  - scaling: the same replay at local[N] vs local[4N] (default
  *    2 vs 8; see the in-code note on SMT) on identical input with
  *    FIXED partitioning; efficiency = (thr_4N / thr_N) / 4,
  *    SYMMETRIC min-of-2 runs per level (hi bracketing lo), per-level
  *    stage times included; an efficiency outside the plausibility
  *    band (0.25, 1.02] is a measurement pathology — it triggers a
  *    loud re-measure and, if persistent, "anomalous":true in the
  *    emission
  *  - queries: per-operator wall seconds over SPARK_GRAFT_SF_DIR
  *
  * Env knobs: SPARK_GRAFT_SF_DIR (query corpus), SPARK_GRAFT_CPUS
  * (query-phase parallelism), SPARK_GRAFT_BENCH_URLS (replay size,
  * default 2,000,000), SPARK_GRAFT_BENCH_LO/HI (parallelism pair),
  * SPARK_GRAFT_PARTS (fixed partition count), SPARK_GRAFT_BENCH_OUT
  * (JSON artifact path, default BENCH/latest.json).
  */
object Bench {

  /** Locale-pinned decimal formatting: every protocol line and JSON
    * field goes through here. The f-interpolator uses the JVM default
    * locale — on a comma-decimal locale it would emit `wall=0,123`,
    * which breaks both the child-protocol toDouble parse and the JSON
    * artifact.
    */
  private[graft] def f3(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
  private[graft] def f1(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.1f", Double.box(d))

  private[graft] def session(cpus: Int, parts: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.default.parallelism", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nUrls = sys.env.getOrElse("SPARK_GRAFT_BENCH_URLS", "2000000").toLong

    // ---- phase 1 (fresh JVM): replay scaling, local[8] vs local[32] ------------
    // Identical input, fresh session per level. One full-size warm-up
    // run first (JIT/heap warm-up is JVM-global and would otherwise
    // flatter whichever level runs second), then min-of-2 per level.
    // N vs 4N: local[2] vs local[8] — all physical cores. (This box
    // is 16 physical cores + SMT: a pure-CPU probe scales 2→8 procs
    // at 0.98 efficiency but 8→32 at only 0.78 because the upper
    // level runs on hyperthreads — that would measure the CPU's SMT,
    // not the engine. See BENCH/BASELINE.md.)
    //
    // Partitioning is FIXED across levels (the cluster analogy: the
    // job, its plan, and its task set are identical; only executor
    // slots change between N and 4N — exactly what changing cluster
    // size does). min-of-2 per level; one discarded full-size run
    // first because JIT warm-up is JVM-global.
    val loLevel = sys.env.getOrElse("SPARK_GRAFT_BENCH_LO", "2").toInt
    val hiLevel = sys.env.getOrElse("SPARK_GRAFT_BENCH_HI", "8").toInt
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", (2 * hiLevel).toString).toInt
    // Each level runs in its OWN child JVM with ParallelGCThreads
    // scaled to its core count (floor 2). Sharing one JVM pins GC
    // parallelism to one value for both levels, which hands the
    // narrow level a large GC-thread subsidy (8 GC threads serving 2
    // worker threads) that no real cluster executor gets — executors
    // size GC to their own cores. A child JVM also isolates heap/JIT
    // state per level; each child still discards one full-size
    // warm-up run before its measured reps.
    def runLevel(level: Int, reps: Int): Seq[ReplayBench.PipelineStats] =
      BenchLevel.spawn(level, parts, nUrls, reps)
    def eff(lo: ReplayBench.PipelineStats, hi: ReplayBench.PipelineStats): Double =
      (hi.throughput / lo.throughput) / (hiLevel.toDouble / loLevel)
    // SYMMETRIC min-of-2 per level; the hi pair brackets the lo pair
    // so BOX drift hits both levels, not just one. (Each child does
    // its own discarded warm-up run — see BenchLevel.)
    var hiRuns = runLevel(hiLevel, 1)
    var loRuns = runLevel(loLevel, 2)
    hiRuns ++= runLevel(hiLevel, 1)
    var lo = loRuns.minBy(_.wallSec)
    var hi = hiRuns.minBy(_.wallSec)
    var efficiency = eff(lo, hi)
    // An efficiency outside the PLAUSIBILITY band (0.25, 1.02] is a
    // measurement pathology, not a scaling result: > 1.02 is
    // physically impossible, and ≤ 0.25 means 4× the slots delivered
    // under 1× the throughput — essentially serial execution, which
    // this job's plan shape (uniform queue placement, partition-
    // parallel stages, regression-gated) rules out; the one observed
    // instance was a tenant-load wave swallowing a level (local[8]
    // at 273 s vs 9.0 s quiet, round 4). Fail loudly either way:
    // dump per-level stage times, re-measure once, and flag the
    // emission `anomalous` if it persists — re-measured, never
    // silently discarded.
    def dumpStages(tag: String, runs: Seq[ReplayBench.PipelineStats]): Unit =
      runs.foreach { r =>
        System.err.println(f"[bench] $tag wall=${r.wallSec}%.2fs thr=${r.throughput}%.0f " +
          r.stageSec.map { case (k, v) => f"$k=$v%.2fs" }.mkString(" "))
      }
    def implausible(e: Double): Boolean = e > 1.02 || e <= 0.25
    if (implausible(efficiency)) {
      System.err.println(f"[bench] ANOMALOUS efficiency=$efficiency%.3f " +
        f"(lo ${lo.wallSec}%.2fs, hi ${hi.wallSec}%.2fs) — re-measuring both levels")
      dumpStages(s"local$loLevel", loRuns); dumpStages(s"local$hiLevel", hiRuns)
      hiRuns ++= runLevel(hiLevel, 1)
      loRuns ++= runLevel(loLevel, 2)
      hiRuns ++= runLevel(hiLevel, 1)
      lo = loRuns.minBy(_.wallSec)
      hi = hiRuns.minBy(_.wallSec)
      efficiency = eff(lo, hi)
    }
    val anomalous = implausible(efficiency)
    if (anomalous) {
      System.err.println(f"[bench] efficiency STILL anomalous after re-measure: " +
        f"$efficiency%.3f — emitting with \"anomalous\":true; do not trust this number")
      dumpStages(s"local$loLevel", loRuns); dumpStages(s"local$hiLevel", hiRuns)
    }

    // ---- phase 2 (run second: keeps the scaling JVM fresh): queries on the sf corpus ------------
    // Same warm-up discipline as the scaling phase: one full DISCARDED
    // sweep first (session/codegen/JIT/parquet-footer warm-up is
    // JVM-global — without it the first queries in map order absorb it
    // and per-query attribution shifts whenever the map's iteration
    // order changes), then min-of-2 measured sweeps per query.
    val results: Map[String, Double] =
      if (sys.env.contains("SPARK_GRAFT_BENCH_SKIP_QUERIES")) Map.empty
      else {
        val s1 = session(cpus, cpus)
        def sweep(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
          val t0 = System.nanoTime()
          try { fn(s1, sfDir).count() } catch { case _: Throwable => -1L }
          name -> (System.nanoTime() - t0) / 1e9
        }
        sweep() // discarded warm-up sweep
        val m1 = sweep()
        val m2 = sweep()
        s1.stop()
        m1.map { case (k, v) => k -> math.min(v, m2(k)) }
      }

    def statsJson(p: ReplayBench.PipelineStats): String = {
      val stages = p.stageSec.map { case (k, v) => "\"" + k + "\":" + f3(v) }
        .mkString("{", ",", "}")
      s"""{"urls":${p.urlsSeen},"scheduled":${p.scheduled},"fetched":${p.fetched},""" +
        s""""spans":${p.spans},"sec":${f3(p.wallSec)},""" +
        s""""urls_per_sec":${f1(p.throughput)},"stages":$stages}"""
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val totalQ = results.values.sum
    val json =
      s"""{"metric":"urls_scheduled_fetched_per_sec","value":${f1(hi.throughput)},""" +
        s""""unit":"urls/sec","queries":$qs,"queries_total_sec":${f3(totalQ)},""" +
        s""""sf":"$sfDir","anomalous":$anomalous,""" +
        s""""scaling":{"local$loLevel":${statsJson(lo)},"local$hiLevel":${statsJson(hi)},""" +
        s""""n_lo":$loLevel,"n_hi":$hiLevel,"efficiency":${f3(efficiency)}}}"""
    // stdout for humans/drivers that scrape the log...
    println(json)
    // ...and a clean file artifact (sbt prefixes stdout with [info],
    // which broke the round-1 driver parse — the file is unwrapped).
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH/latest.json"))
    Option(outPath.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(outPath, json + "\n")
  }
}

/** One scaling level in its OWN JVM (see Bench: GC threads must scale
  * with the level's cores, as real executors' do). Child protocol: one
  * discarded full-size warm-up pass, then `reps` measured passes, each
  * printed as a single machine-parseable stdout line.
  */
object BenchLevel {

  def main(args: Array[String]): Unit = {
    val Array(level, parts, n, reps) = args.map(_.toLong)
    val s = Bench.session(level.toInt, parts.toInt)
    ReplayBench.run(s, n) // discard: JIT/heap warm-up inside this JVM
    cpuCanary(); cpuCanaryPar(level.toInt) // JIT the canary loops too
    (1 to reps.toInt).foreach { _ =>
      val canary = cpuCanary()
      val canaryPar = cpuCanaryPar(level.toInt)
      val p0 = ReplayBench.run(s, n)
      // the canaries ride the emission as pseudo-stages, so every
      // reading carries its own box-state evidence
      val p = p0.copy(stageSec = p0.stageSec +
        ("cpu_canary" -> canary) + ("cpu_canary_par" -> canaryPar))
      // Locale-pinned (Bench.f3): the parent parses these with toDouble
      val stages = p.stageSec.map { case (k, v) => s"stage:$k=${Bench.f3(v)}" }.mkString(" ")
      println(s"[benchlevel] urls=${p.urlsSeen} scheduled=${p.scheduled} " +
        s"fetched=${p.fetched} spans=${p.spans} wall=${Bench.f3(p.wallSec)} $stages")
    }
    s.stop()
  }

  /** Fixed single-thread CPU probe (~0.2 s nominal): 2^27 xorshift64
    * steps. A loaded box inflates this the same way it inflates the
    * measurement, so each emitted reading carries contention evidence
    * — an external reader can discount readings whose canary is far
    * off the quiet-box nominal instead of trusting a bare efficiency
    * number.
    */
  def cpuCanary(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < (1 << 27)) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    if (x == 42L) println("") // defeat dead-code elimination
    (System.nanoTime() - t0) / 1e9
  }

  /** PARALLEL canary: `threads` concurrent xorshift loops (2^26 steps
    * each, ~0.1 s nominal wall). The single-thread canary misses
    * BURSTY MULTI-CORE tenant load — measured: walls inflated 40%
    * while cpu_canary read within 3% of nominal — because one brief
    * thread rarely collides with another tenant's cores. Running as
    * many probe threads as this level's workers contends for exactly
    * the cores the measurement uses, so external multicore load shows
    * up as a wall ≫ the single-thread canary.
    */
  def cpuCanaryPar(threads: Int): Double = {
    val t0 = System.nanoTime()
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val ts = (1 to math.max(1, threads)).map { t =>
      val th = new Thread(() => {
        var x = 0x9e3779b97f4a7c15L + t
        var i = 0
        while (i < (1 << 26)) {
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17
          i += 1
        }
        sink.addAndGet(x) // defeat dead-code elimination
      })
      th.start(); th
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** Spawn a level child: same classpath and JVM flags as this JVM,
    * but ParallelGCThreads = max(2, cores) and ConcGCThreads scaled to
    * match. Environment passes through (SPARK_GRAFT_* knobs work).
    */
  def spawn(level: Int, parts: Int, n: Long, reps: Int): Seq[ReplayBench.PipelineStats] = {
    import scala.jdk.CollectionConverters._
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val inherited = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filterNot(a => a.startsWith("-XX:ParallelGCThreads") ||
        a.startsWith("-XX:ConcGCThreads"))
    val gc = math.max(2, level)
    val cmd = Seq(javaBin) ++ inherited ++ Seq(
      s"-XX:ParallelGCThreads=$gc",
      s"-XX:ConcGCThreads=${math.max(1, gc / 4)}",
      "-cp", sys.props("java.class.path"),
      "graft.BenchLevel", level.toString, parts.toString, n.toString, reps.toString)
    val pb = new ProcessBuilder(cmd.asJava)
      .redirectError(ProcessBuilder.Redirect.INHERIT)
    val proc = pb.start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream).getLines().toList
    val rc = proc.waitFor()
    require(rc == 0, s"BenchLevel child (level=$level) exited $rc")
    val stats = out.filter(_.startsWith("[benchlevel]")).map { line =>
      val kv = line.split("\\s+").drop(1)
        .map(_.split("=", 2)).collect { case Array(k, v) => k -> v }.toMap
      ReplayBench.PipelineStats(
        kv("urls").toLong, kv("scheduled").toLong, kv("fetched").toLong,
        kv("spans").toLong, kv("wall").toDouble,
        kv.collect { case (k, v) if k.startsWith("stage:") =>
          k.stripPrefix("stage:") -> v.toDouble })
    }
    require(stats.size == reps, s"BenchLevel child (level=$level) produced " +
      s"${stats.size} of $reps readings:\n${out.mkString("\n")}")
    stats
  }
}
