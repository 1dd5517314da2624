package graft.crawl

import graft.gen.Fixtures
import graft.model.{Announcement, Doc, ListingTask}

/** The crawl's "network edge" as an injectable pure-function surface:
  * listing pages (S1), HEAD-probe metadata (S2/S3), payload fetch
  * (S4), robots rules (ST3). [[CrawlJob]] is generic over this — the
  * same round loop serves
  *  - [[FixtureNet]] (default): the splitmix64 synthetic corpus, used
  *    by the golden-replay/resume ScalaTests and the bench;
  *  - [[Md5Net]]: an md5-derived corpus whose every draw is
  *    restatable in ANSI SQL, which is what makes the END-TO-END
  *    multi-round replay DuckDB-oracle-checkable (the crawl_replay
  *    correctness row) — a closed form exists for exactly which pages
  *    each stream crawls, so listing expansion → filters → global
  *    first-wins → robots → validation → postprocess is one SQL chain.
  *
  * Implementations must be deterministic pure functions of their
  * arguments (the same functions serve as executor-side "network" and
  * driver-side oracle) and serializable (they ride task closures).
  */
trait CrawlNet extends Serializable {
  def urlBase: String
  def host: String
  def totalPages(exchangeRank: Int, epochDay: Int, category: String): Int
  def rowsOnPage(exchangeRank: Int, epochDay: Int, category: String, page: Int): Int
  def announcementsFor(t: ListingTask): Seq[Announcement]
  def fetchStatus(url: String): Int
  def fetchContentType(url: String): String
  def fetchMagic(url: String): String
  def docFor(url: String): Doc
  def robotsRules: Seq[(String, String, Boolean)]
}

/** The default splitmix64 synthetic corpus (graft.gen.Fixtures). */
object FixtureNet extends CrawlNet {
  def urlBase: String = Fixtures.UrlBase
  def host: String = Fixtures.Host
  def totalPages(exchangeRank: Int, epochDay: Int, category: String): Int =
    Fixtures.totalPages(exchangeRank, epochDay, category)
  def rowsOnPage(exchangeRank: Int, epochDay: Int, category: String, page: Int): Int =
    Fixtures.rowsOnPage(exchangeRank, epochDay, category, page)
  def announcementsFor(t: ListingTask): Seq[Announcement] = Fixtures.announcementsFor(t)
  def fetchStatus(url: String): Int = Fixtures.fetchStatus(url)
  def fetchContentType(url: String): String = Fixtures.fetchContentType(url)
  def fetchMagic(url: String): String = Fixtures.fetchMagic(url)
  def docFor(url: String): Doc = Fixtures.docFor(url)
  def robotsRules: Seq[(String, String, Boolean)] = Fixtures.robotsRules
}

/** The SQL-restatable corpus: every draw is `ascii(substr(md5(key),
  * i, 1))` arithmetic — bit-identical in Spark, Scala and DuckDB.
  *
  * Closed-form page structure (what makes the multi-round loop one
  * SQL statement):
  *  - totalPages ∈ 1..3 (never 0 — the totalpages=0 special case is
  *    Fixture-net territory);
  *  - pages 1..tp serve 3..10 rows, except ~1/5 are served EMPTY
  *    (raw = 0 → the reference's immediate stream stop, O4);
  *  - overshoot pages tp+1..tp+3 serve 1..5 rows with prob 1/3, else
  *    raw 0 (the API lies about totals);
  *  - ⇒ the pages a stream actually yields rows from are exactly
  *    p ∈ 1..min(firstEmpty−1, tp+3) — no empty-RUN arithmetic,
  *    because row 0 of every served page is a page-unique, F1-kept
  *    announcement (newKept ≥ 1 ⇒ emptyRun stays 0; the empty-run
  *    stop itself is exercised by the Fixture-net golden tests);
  *  - rows 1.. draw from a 40-slot per-(exchange, day) identity pool
  *    shared ACROSS categories/pages — real cross-stream duplicates
  *    for the first-wins seen set;
  *  - announcement identity fields derive from the pool key only, so
  *    re-serves are byte-identical (same seen key), and ~1/16 of
  *    identities live under the robots-denied 'private/' slice;
  *  - fetch probe draws (status / content-type / magic) mirror
  *    [[Fixtures]]' shapes, keyed on md5 of the url.
  *
  * The global first-wins winner of a duplicated key is the minimum
  * (page, arrival_seq): all live streams are in page-lockstep (round
  * r crawls page r+1), so discovery round ≡ page number.
  */
object Md5Net extends CrawlNet {
  def urlBase: String = Fixtures.UrlBase
  def host: String = Fixtures.Host

  def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder(32)
    d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)).foreach { b =>
      sb.append(Character.forDigit((b >> 4) & 0xf, 16))
      sb.append(Character.forDigit(b & 0xf, 16))
    }
    sb.toString
  }

  /** ascii of the i-th (1-based, like SQL substr) hex char. */
  private def a(m: String, i: Int): Int = m.charAt(i - 1).toInt

  def totalPages(ex: Int, day: Int, cat: String): Int =
    a(md5hex(s"tp:$ex:$day:$cat"), 1) % 3 + 1

  def rowsOnPage(ex: Int, day: Int, cat: String, page: Int): Int = {
    val tp = totalPages(ex, day, cat)
    if (page > tp + 3) 0
    else {
      val m = md5hex(s"rp:$ex:$day:$cat:$page")
      if (page <= tp) { if (a(m, 2) % 5 == 0) 0 else a(m, 1) % 8 + 3 }
      else { if (a(m, 3) % 3 == 0) a(m, 1) % 5 + 1 else 0 }
    }
  }

  private val Prefixes = Seq("60", "68", "00", "30", "83", "43", "99")

  /** Announcement for identity key `k` ("u:…" page-unique or "p:…"
    * pool slot); `forceKept` pins the page-unique row's title to a
    * filter-surviving one (the emptyRun-stays-0 invariant).
    */
  private def announcement(k: String, day: Int, seq: Long, forceKept: Boolean): Announcement = {
    val m = md5hex("ann:" + k)
    val num = (a(m, 3) * 131 + a(m, 4)) % 10000
    val secCode = Prefixes(a(m, 5) % 7) + Fixtures.pad(num.toLong, 4)
    val title =
      if (forceKept) "2024年年度报告"
      else a(m, 1) % 8 match {
        case 0 => "2024年年度报告"
        case 1 => "2023年年度报告摘要"          // F2 drop
        case 2 => "2024年年度报告（英文版）"     // F2 drop
        case 3 => "2019年年度报告"               // F1 drop (wrong year)
        case 4 => "公司章程"                     // F1 keep (no digit)
        case _ => s"2023年第${a(m, 2) % 3 + 1}季度报告"
      }
    val hour = a(m, 7) % 24
    val (timeMs, timeStr) =
      if (a(m, 6) % 2 == 0) (day.toLong * 86400000L + hour.toLong * 3600000L, null: String)
      else (-1L, s"${java.time.LocalDate.ofEpochDay(day.toLong)} ${Fixtures.pad(hour.toLong, 2)}:00:00")
    val adjunct = (if (a(m, 9) % 16 == 0) "private/" else "") + s"r/$m.pdf"
    Announcement(secCode, s"公司$num", title, timeMs, timeStr, adjunct, seq)
  }

  def announcementsFor(t: ListingTask): Seq[Announcement] = {
    val n = rowsOnPage(t.exchangeRank, t.epochDay, t.category, t.page)
    val catIdx = math.max(0, Fixtures.Categories.indexOf(t.category))
    (0 until n).map { row =>
      val seq = Fixtures.arrivalSeq(t.exchangeRank, t.epochDay, catIdx, t.page, row)
      if (row == 0)
        announcement(s"u:${t.exchangeRank}:${t.epochDay}:${t.category}:${t.page}",
          t.epochDay, seq, forceKept = true)
      else {
        val mp = md5hex(s"pd:${t.exchangeRank}:${t.epochDay}:${t.category}:${t.page}:$row")
        val poolId = (a(mp, 1) * 131 + a(mp, 2)) % 40
        announcement(s"p:${t.exchangeRank}:${t.epochDay}:$poolId",
          t.epochDay, seq, forceKept = false)
      }
    }
  }

  def fetchStatus(url: String): Int =
    if (a(md5hex("st:" + url), 1) % 20 == 0) 404 else 200

  def fetchContentType(url: String): String = a(md5hex("ct:" + url), 1) % 12 match {
    case 0 => "text/html"
    case 1 => "application/octet-stream"
    case _ => "application/pdf"
  }

  def fetchMagic(url: String): String =
    if (a(md5hex("mg:" + url), 1) % 3 == 0) "<htm" else "%PDF"

  // the docs-table payload is not part of the stage-1 report oracle;
  // the fixture generator is already pure in the url
  def docFor(url: String): Doc = Fixtures.docFor(url)

  def robotsRules: Seq[(String, String, Boolean)] = Fixtures.robotsRules
}
