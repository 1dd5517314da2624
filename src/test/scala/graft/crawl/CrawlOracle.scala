package graft.crawl

import graft.canon.Canon
import graft.gen.Fixtures
import graft.model._
import graft.sched.Scheduler

/** Driver-side, collections-only reimplementation of the crawl round
  * semantics (SURVEY.md §5.1) — the golden oracle the distributed
  * [[CrawlJob]] must match on frontier order, per-round fetch batches,
  * the final seen set, and the lineage totals.
  *
  * Mirrors the reference's contract, not Spark's implementation:
  * first-wins dedup by arrival ordinal (cninfo_report_crawler.py:
  * 294-306), politeness rank within (host, salt) queues ordered by the
  * north-star priority, O4 page-growth guards.
  */
object CrawlOracle {

  final case class RoundTrace(round: Int, fetchedUrls: Set[String],
                              totals: CrawlJob.Totals)

  final case class Result(rounds: Seq[RoundTrace], seen: Set[String],
                          fetchedDocs: Map[String, Doc],
                          results: Seq[(Long, String, String, String, Int, String)])
  // results: (arrivalSeq, secCodeRaw, company, title, epochDay, url)

  def run(seeds: Seq[Seed], cfg: CrawlJob.Config): Result = {
    var listing = CrawlJob.seedListing(seeds)
    var deferred = Seq.empty[DocTask]
    var seen = Set.empty[String]
    val rounds = Seq.newBuilder[RoundTrace]
    val docs = Map.newBuilder[String, Doc]
    val results = Seq.newBuilder[(Long, String, String, String, Int, String)]
    var round = 0

    while ((listing.nonEmpty || deferred.nonEmpty) && round < cfg.maxRounds) {
      // 1. listing expansion (growth decided after dedup — step 4b)
      val annsWithTask: Seq[(Announcement, Seed, Int)] = listing.flatMap { t =>
        Fixtures.announcementsFor(t).map(a =>
          (a, Seed(t.exchangeRank, t.exchange, t.epochDay, t.category), t.page))
      }

      // 2. filters F1/F2
      val yearsRe = cfg.targetYears.mkString("|").r
      def passes(title: String): Boolean =
        (yearsRe.findFirstIn(title).isDefined || !title.exists(_.isDigit)) &&
          !title.contains("摘要") && !title.contains("英文版")
      val urlsSeen = annsWithTask.size
      val kept = annsWithTask.filter { case (a, _, _) => passes(a.title) }
      val filteredCnt = urlsSeen - kept.size

      // 3. within-batch first-wins by arrival ordinal
      val batchFirst = kept
        .groupBy { case (a, _, _) => Fixtures.seenKey(a) }
        .map { case (_, group) => group.minBy(_._1.arrivalSeq) }
        .toSeq

      // 4. cross-round seen filter
      val newUnique = batchFirst.filterNot { case (a, _, _) => seen(Fixtures.seenKey(a)) }
      seen ++= newUnique.map { case (a, _, _) => Fixtures.seenKey(a) }
      val dupDropped = urlsSeen - filteredCnt - newUnique.size

      // 4b. listing growth with the per-stream new-unique feedback
      val keptCounts: Map[(Int, Int, String), Int] = newUnique
        .groupBy { case (_, s, _) => (s.exchangeRank, s.epochDay, s.category) }
        .view.mapValues(_.size).toMap
      val nextListing = listing.flatMap { t =>
        CrawlJob.nextListingTask(t,
          Fixtures.rowsOnPage(t.exchangeRank, t.epochDay, t.category, t.page),
          keptCounts.getOrElse((t.exchangeRank, t.epochDay, t.category), 0).toLong,
          Fixtures.totalPages(t.exchangeRank, t.epochDay, t.category), cfg)
      }

      // 5. doc frontier ∪ deferred (result payload rides the task),
      // robots gate
      val newTasks = newUnique.map { case (a, s, page) =>
        DocTask(Fixtures.docUrl(a.adjunctUrl), Fixtures.Host, s.epochDay, a.secCode,
          page, Fixtures.seenKey(a), a.arrivalSeq, a.secName, a.title,
          a.timeMs, a.timeStr)
      }
      val allTasks = newTasks ++ deferred
      val (allowed, deniedTasks) = allTasks.partition(t => Fixtures.robotsAllowed(t.url))

      // 6. politeness: rank within (host, salt) by (priority, tiebreak, url)
      val scheduled = allowed
        .groupBy(t => (t.host, Scheduler.saltOf(t.url, cfg.saltCount)))
        .toSeq
        .flatMap { case (_, group) =>
          group.sortBy(t => (t.announceEpochDay.toLong, tiebreak(t), t.url))
            .zipWithIndex
            .map { case (t, i) => (t, i.toLong / cfg.tokensPerTick) }
        }
      val (fetchNow, deferNow) = scheduled.partition(_._2 < cfg.ticksPerRound)
      deferred = deferNow.map(_._1)

      // 7. validate (S2/S3/F4: status + content-type + magic sniff),
      // then fetch payloads for the survivors only. A stage-1 RESULTS
      // row is appended exactly when validation succeeds — the
      // reference's total_valid semantics (cninfo_report_crawler.py:
      // 479-493: all_valid_reports gains a row only for
      // validate_pdf_access survivors).
      val (validNow, invalidNow) = fetchNow.partition { case (t, _) =>
        Validate.isValidScala(Fixtures.fetchStatus(t.url),
          Fixtures.fetchContentType(t.url), Fixtures.fetchMagic(t.url))
      }
      validNow.foreach { case (t, _) =>
        docs += t.url -> Fixtures.docFor(t.url)
        // Canon.announceDate twin: epoch-millis date, else timeStr date
        val day =
          if (t.timeMs >= 0) (t.timeMs / 86400000L).toInt
          else java.time.LocalDate.parse(t.timeStr.split(" ")(0)).toEpochDay.toInt
        results += ((t.arrivalSeq, t.secCode, t.company, t.title, day, t.url))
      }

      rounds += RoundTrace(round, validNow.map(_._1.url).toSet,
        CrawlJob.Totals(urlsSeen, filteredCnt, dupDropped, newUnique.size,
          deniedTasks.size, validNow.size, invalidNow.size, deferred.size))
      listing = nextListing
      round += 1
    }
    Result(rounds.result(), seen, docs.result(), results.result())
  }

  /** Must match CrawlJob's tiebreak expression exactly:
    * concat_ws("|", secCode, lpad(pageDepth, 6, '0'), seenKey).
    */
  def tiebreak(t: DocTask): String = {
    val depth = t.pageDepth.toString
    val padded = if (depth.length >= 6) depth else ("0" * (6 - depth.length)) + depth
    s"${t.secCode}|$padded|${t.seenKey}"
  }

  /** Reference postprocess oracle (A2 keep-first + A3 latest-per-code)
    * over the accumulated results — pure Scala twin of
    * Report.postprocessStage1.
    */
  def finalReport(res: Seq[(Long, String, String, String, Int, String)])
      : Seq[(String, String, String, Int, String)] = {
    val coded = res.map { case (seq, codeRaw, company, title, day, url) =>
      val code = Canon.classifyExchangeScala(Canon.padCodeScala(codeRaw))
      (seq, code, company, title, day, url)
    }
    val a2 = coded.groupBy { case (_, code, company, title, _, _) => (code, company, title) }
      .map { case (_, g) => g.minBy(_._1) }.toSeq
    val a3 = a2.groupBy(_._2)
      .map { case (_, g) => g.minBy { case (seq, _, _, _, day, _) => (-day.toLong, seq) } }
      .toSeq
    a3.map { case (_, code, company, title, day, url) => (code, company, title, day, url) }
  }
}
