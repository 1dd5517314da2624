package graft.gen

import graft.model._

/** Deterministic synthetic crawl corpus (SURVEY.md §7.2).
  *
  * Every value is a pure function of its key fields via splitmix64 —
  * no wall clock, no RNG state — so the same functions serve as
  *  (a) the executor-side "network" (listing scan S1, fetch S4),
  *  (b) the driver-side test oracle (golden replay, span equality),
  *  (c) the bench corpus generator at larger knobs.
  *
  * Shapes mirror the reference API (cninfo_report_crawler.py:195-331):
  * pages of up to `PageSize` announcement rows per (exchange, date,
  * category) stream, a totalPages header, occasional empty pages (to
  * exercise the O4 empty-run stop), duplicate announcements re-served
  * across categories/pages (to exercise the A1 first-wins seen set),
  * and titles hitting every F1/F2 filter branch.
  */
object Fixtures {

  val PageSize = 30
  val Exchanges: Seq[(Int, String)] =
    Seq(0 -> "sse", 1 -> "szse", 2 -> "bj", 3 -> "neeq", 4 -> "star")
  val Categories: Seq[String] = Seq("annual", "semiannual")
  val Host = "static.cninfo.example"
  val UrlBase = s"https://$Host/final/"

  // -- deterministic hashing -----------------------------------------

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Allocation-lean mixing: numbers are hashed directly (no
    * toString) — this runs a few dozen times per URL on the executor
    * hot path, where Formatter/toString churn shows up as GC time.
    */
  def hashKey(parts: Any*): Long = {
    var h = 0x51_7cc1b727220a95L
    parts.foreach { p =>
      p match {
        case s: String =>
          var i = 0
          while (i < s.length) { h = splitmix64(h ^ s.charAt(i).toLong); i += 1 }
        case i: Int => h = splitmix64(h ^ i.toLong)
        case l: Long => h = splitmix64(h ^ l)
        case other =>
          val s = other.toString
          var i = 0
          while (i < s.length) { h = splitmix64(h ^ s.charAt(i).toLong); i += 1 }
      }
      h = splitmix64(h ^ 0x1f)
    }
    h
  }

  /** Comma-grouped decimal rendering without java.util.Formatter. */
  def groupedInt(v: Long): String = {
    val s = v.toString
    if (s.length <= 3) s
    else {
      val sb = new java.lang.StringBuilder(s.length + s.length / 3)
      val head = s.length % 3
      var i = 0
      if (head > 0) { sb.append(s, 0, head); i = head }
      while (i < s.length) {
        if (sb.length > 0) sb.append(',')
        sb.append(s, i, i + 3); i += 3
      }
      sb.toString
    }
  }

  def pad(v: Long, width: Int): String = {
    val s = v.toString
    if (s.length >= width) s
    else ("0" * (width - s.length)) + s
  }

  def hex4(v: Long): String = {
    val s = java.lang.Long.toHexString(v)
    if (s.length >= 4) s else ("0" * (4 - s.length)) + s
  }

  /** Non-negative bounded draw. */
  def draw(bound: Int, parts: Any*): Int =
    math.floorMod(hashKey(parts: _*), bound.toLong).toInt

  // -- listing pages (synthetic S1) ----------------------------------

  /** Pages this (exchange, date, category) stream claims to have
    * (the API's `totalpages` header): 0..3.
    */
  def totalPages(exchangeRank: Int, epochDay: Int, category: String): Int =
    draw(4, "tp", exchangeRank, epochDay, category)

  /** Whether a given page is served empty (mid-stream empty pages
    * exercise the empty-run stop): ~1 in 5 pages.
    */
  def pageIsEmpty(exchangeRank: Int, epochDay: Int, category: String, page: Int): Boolean =
    draw(5, "pe", exchangeRank, epochDay, category, page) == 0

  /** Rows on a non-empty page: the last page is partial, earlier
    * pages are full (PageSize) — mirrors real pagination. Pages PAST
    * the claimed totalpages occasionally still serve rows (~1 in 3,
    * up to +3): the API lies about totals, which is exactly why the
    * reference overshoots (O4, cninfo_report_crawler.py:249-257) —
    * a crawler trusting totalpages as a hard stop drops these rows.
    */
  def rowsOnPage(exchangeRank: Int, epochDay: Int, category: String, page: Int): Int = {
    val tp = totalPages(exchangeRank, epochDay, category)
    if (page > tp) {
      if (page <= tp + 3 && draw(3, "os", exchangeRank, epochDay, category, page) == 0)
        1 + draw(8, "osr", exchangeRank, epochDay, category, page)
      else 0
    }
    else if (pageIsEmpty(exchangeRank, epochDay, category, page)) 0
    else if (page < tp) PageSize
    else 1 + draw(PageSize - 1, "rp", exchangeRank, epochDay, category, page)
  }

  /** Identity pool: announcements are drawn from a bounded per-
    * (exchange, date) pool so the same announcement is re-served by
    * different categories/pages — first occurrence must win.
    */
  private def poolSize(exchangeRank: Int, epochDay: Int): Int =
    40 + draw(40, "pool", exchangeRank, epochDay)

  /** Dense arrival ordinal: (exchangeRank, date, category, page, row)
    * — the semantic row order of the reference's nested loops
    * (SURVEY.md §3.1). Encoded into a sortable Long.
    */
  def arrivalSeq(exchangeRank: Int, epochDay: Int, categoryIdx: Int, page: Int, row: Int): Long =
    ((((exchangeRank.toLong * 100000 + epochDay) * 8 + categoryIdx) * 1000 + page) * 100 + row)

  /** The announcements served on one listing page, in page order. */
  def announcementsFor(t: ListingTask): Seq[Announcement] = {
    val n = rowsOnPage(t.exchangeRank, t.epochDay, t.category, t.page)
    val catIdx = math.max(0, Categories.indexOf(t.category))
    (0 until n).map { row =>
      val poolId = draw(poolSize(t.exchangeRank, t.epochDay),
        "id", t.exchangeRank, t.epochDay, t.category, t.page, row)
      announcement(t.exchangeRank, t.epochDay, poolId,
        arrivalSeq(t.exchangeRank, t.epochDay, catIdx, t.page, row))
    }
  }

  /** The canonical announcement for a pool slot — all fields derive
    * from (exchangeRank, epochDay, poolId) only, so re-serves are
    * byte-identical (same seen key).
    */
  def announcement(exchangeRank: Int, epochDay: Int, poolId: Int, seq: Long): Announcement = {
    val h = hashKey("ann", exchangeRank, epochDay, poolId)
    val codeNum = math.floorMod(h, 999999L).toInt + 1
    val prefix = Seq("60", "68", "00", "30", "83", "43", "99")(draw(7, "px", exchangeRank, epochDay, poolId))
    val secCode = prefix + pad(codeNum % 10000, 4)
    val titleKind = draw(8, "tt", exchangeRank, epochDay, poolId)
    val title = titleKind match {
      case 0 => s"${2023 + poolId % 2}年年度报告"
      case 1 => s"${2023 + poolId % 2}年年度报告摘要"          // F2 drop
      case 2 => s"${2023 + poolId % 2}年年度报告（英文版）"     // F2 drop
      case 3 => "2019年年度报告"                               // F1 drop (wrong year)
      case 4 => "公司章程"                                     // F1 keep (no digit)
      case _ => s"${2023 + poolId % 2}年第${poolId % 3 + 1}季度报告"
    }
    val tsMs = (epochDay.toLong * 86400000L) + math.floorMod(h, 86400000L)
    // the int-or-string announcementTime union (~half each)
    val (timeMs, timeStr) =
      if (draw(2, "tu", exchangeRank, epochDay, poolId) == 0) (tsMs, null: String)
      else {
        val d = java.time.LocalDate.ofEpochDay(epochDay.toLong)
        (-1L, s"$d ${pad(math.floorMod(h, 24), 2)}:00:00")
      }
    val adjunct = privatize(
      s"$epochDay/$exchangeRank-${pad(poolId.toLong, 4)}-" +
        s"${hex4(math.floorMod(h, 0xffff))}.pdf",
      exchangeRank, epochDay, poolId)
    Announcement(secCode, s"公司$codeNum", title, timeMs, timeStr, adjunct, seq)
  }

  /** Canonical doc URL for an announcement (E-str1 analog). */
  def docUrl(adjunctUrl: String): String = UrlBase + adjunctUrl

  /** Seen-set identity: the reference's 4-tuple
    * (secCode, title, time, adjunctUrl) — cninfo_report_crawler.py:294-306.
    */
  def seenKey(a: Announcement): String =
    // mirrors Spark concat_ws("\\u0001", ...): null fields are
    // skipped entirely (no separator emitted for them)
    Seq(a.secCode, a.title, a.timeMs.toString, a.timeStr, a.adjunctUrl)
      .filter(_ != null).mkString("\u0001")

  // -- documents (synthetic S4 fetch) --------------------------------

  private val CatNames = Seq("存货", "无形资产", "开发支出")

  /** The interleaved text+media document behind a URL: spans in
    * document order, mixing category-header text spans, target-keyword
    * rows (amounts in the reference's messy formats), media spans,
    * TABLE-BOUNDARY break spans (the reference's parent-category scan
    * is confined to the current table, report_info_collection.py:
    * 124-139 — a break must reset the inherited category), and noise.
    * Keyword rows are deliberately generated even right after a break
    * (currentCat is NOT reset) so the extractor's boundary reset is
    * load-bearing, not vacuous. Deterministic in the URL alone.
    */
  def docFor(url: String): Doc = {
    val nSpans = 4 + draw(10, "ns", url)
    var currentCat = -1
    val spans = (0 until nSpans).map { i =>
      val kind = draw(10, "sk", url, i)
      if (kind < 2) { // category header
        currentCat = draw(3, "ch", url, i)
        Span("text", s"第${i}节 ${CatNames(currentCat)}明细", null, i)
      } else if (kind < 5 && currentCat >= 0) { // keyword row with amount
        val style = draw(5, "as", url, i)
        val base = 100 + draw(999900, "av", url, i)
        val amt = style match {
          case 0 => groupedInt(base / 100) + "." + pad(base % 100, 2) // grouped 2dp
          case 1 => (base / 100).toString                             // plain int
          case 2 => "N/A"                                             // sentinel
          case 3 => groupedInt(base / 100)                            // grouped int
          // plain ≥4-digit decimal — the E-str6 divergence fixture:
          // the reference's unanchored first pattern would extract the
          // "234.56" SUBSTRING of "1234.56"; this engine extracts the
          // full number (documented reference bug, SURVEY.md §2.8)
          case _ => (base / 100 + 10000).toString + "." + pad(base % 100, 2)
        }
        Span("text", s"其中：数据资源 | $amt | 元", null, i)
      } else if (kind < 7) { // media span
        Span("media", null, s"media://img/${java.lang.Long.toHexString(hashKey("mr", url, i))}", i)
      } else if (kind == 7) { // table/page boundary
        Span("break", null, null, i)
      } else { // noise text
        Span("text", s"补充说明第${draw(100, "nz", url, i)}条", null, i)
      }
    }
    Doc(url, spans)
  }

  // -- fetch probe results (S2/S3/F4 validation inputs) ---------------

  /** HTTP status of the synthetic HEAD probe: ~1/20 URLs 404. */
  def fetchStatus(url: String): Int =
    if (draw(20, "st", url) == 0) 404 else 200

  /** Declared Content-Type: mostly PDF; ~1/12 text/html (bad), ~1/12
    * octet-stream (exercises the S3 byte-sniff fallback).
    */
  def fetchContentType(url: String): String = draw(12, "ct", url) match {
    case 0 => "text/html"
    case 1 => "application/octet-stream"
    case _ => "application/pdf"
  }

  /** First payload bytes (the sniffable magic): ~1/3 of URLs whose
    * content type is wrong really are junk; the rest are PDFs behind
    * a mislabeled header.
    */
  def fetchMagic(url: String): String =
    if (draw(3, "mg", url) == 0) "<htm" else "%PDF"

  // -- robots rules (ST3) ---------------------------------------------

  /** (host, path_prefix, allow): a deny-list carving out a slice of
    * the doc space — deterministic share of URLs get robots_denied.
    */
  val robotsRules: Seq[(String, String, Boolean)] = Seq(
    (Host, "/final/", true),
    (Host, "/final/private", false))

  /** Applies the same longest-prefix-wins rule as Scheduler.robotsGate
    * — the driver-side oracle twin.
    */
  def robotsAllowed(url: String): Boolean = {
    val rest = url.substring(url.indexOf("://") + 3)
    val slash = rest.indexOf('/')
    val (host, path) = if (slash >= 0) (rest.substring(0, slash), rest.substring(slash)) else (rest, "/")
    val matches = robotsRules.filter { case (h, p, _) => h == host && path.startsWith(p) }
    if (matches.isEmpty) true else matches.maxBy(_._2.length)._3
  }

  /** A URL is in the robots-denied slice iff its adjunct path starts
    * with "private" — we steer ~1/16 of announcements there.
    */
  def privatize(adjunct: String, exchangeRank: Int, epochDay: Int, poolId: Int): String =
    if (draw(16, "priv", exchangeRank, epochDay, poolId) == 0) s"private/$adjunct" else adjunct
}
