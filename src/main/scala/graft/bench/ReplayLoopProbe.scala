package graft.bench

import org.apache.spark.sql.SparkSession

/** Diagnostic main: run the snapshot-committed crawl round loop with
  * per-round wall times, so round-overhead regressions are visible
  * directly instead of inferred from query totals.
  * Env: SPARK_GRAFT_CPUS (default 32).
  */
object ReplayLoopProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_CODEGEN", "true"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_AQE", "true"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_PROBE_NET=md5 probes the oracled crawl_replay query
    // config (Md5Net + its budget); default probes the fixture net.
    val md5 = sys.env.get("SPARK_GRAFT_PROBE_NET").contains("md5")
    val net: graft.crawl.CrawlNet =
      if (md5) graft.crawl.Md5Net else graft.crawl.FixtureNet
    val cfg = graft.crawl.CrawlJob.Config(
      saltCount = 4, tokensPerTick = if (md5) 4 else 16, ticksPerRound = 8, bloomP = 8,
      roundShufflePartitions = 8, roundWholeStageCodegen = false,
      roundAdaptive = false)
    val seeds = graft.crawl.CrawlJob.expandSeeds(19830, 19831)
    val root = java.nio.file.Files.createTempDirectory("replay-loop-probe").toString
    val log = new graft.snapshot.SnapshotLog(root)
    log.init()
    var snap = log.latest().getOrElse {
      log.commit(Map.empty,
        Map(graft.crawl.CrawlJob.ListingTable -> {
          import s.implicits._
          graft.crawl.CrawlJob.seedListing(seeds).toDS().toDF()
        },
        graft.crawl.CrawlJob.DocsFrontierTable -> {
          import s.implicits._
          s.emptyDataset[graft.model.DocTask].toDF()
        }),
        Map("round" -> "-1", "done" -> "false"))
    }
    val t00 = System.nanoTime()
    var round = 0
    var carry = graft.crawl.CrawlJob.Carry()
    while (snap.props("done") != "true" && round < cfg.maxRounds) {
      val t0 = System.nanoTime()
      val r = graft.crawl.CrawlJob.runRound(s, cfg, log, snap, round, net, carry)
      carry = r.nextCarry
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[loopprobe] round=$round sec=$sec%.2f urls=${r.totals.urlsSeen} " +
        f"fetched=${r.totals.fetched} deferred=${r.totals.deferred} " +
        f"pending=${r.listingPending}")
      snap = log.read(r.snapshotId)
      round += 1
    }
    println(f"[loopprobe] TOTAL rounds=$round sec=${(System.nanoTime() - t00) / 1e9}%.2f")
    s.stop()
  }
}
