package graft

import graft.canon.Canon
import graft.extract.Extract
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests: column expressions vs their pure-Scala twins
  * (SURVEY.md §5.3 — E-str/E-date functions), generated inputs via
  * scalacheck Gen, asserted exhaustively over the sample.
  */
class CanonExtractSpec extends SparkSpec {

  private def evalStr(c: org.apache.spark.sql.Column, input: Seq[String]): Seq[String] = {
    val s = spark; import s.implicits._
    input.toDF("v").select(c).collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
  }

  test("F1 titleFilter: empty targetYears degrades to the digit-free branch (ADVICE r5)") {
    // the reference with empty target_years keeps only digit-free
    // titles; the old reduce threw on Nil at plan-build time
    val s = spark; import s.implicits._
    val titles = Seq("2023年报", "年度报告", "Q3 2022", "报告", null)
    def keep(years: Seq[Int]): Seq[String] =
      titles.toDF("title").where(graft.report.Report.titleFilter(years)(col("title")))
        .collect().map(_.getString(0)).toSeq
    assert(keep(Nil) == Seq("年度报告", "报告"))
    assert(keep(Seq(2023)) == Seq("2023年报", "年度报告", "报告"))
  }

  test("URL canonicalizer: column expression == Scala twin (E-str1)") {
    val urls = Seq(
      "HTTPS://Static.Cninfo.COM.cn:443/final/x.pdf#frag",
      "http://a.example:80/p?q=1",
      "https://b.example/no-port/path",
      "https://c.example",
      "http://D.EXAMPLE:8080/x")
    val s = spark; import s.implicits._
    val got = urls.toDF("v").select(Canon.canonicalizeFull(col("v"))).collect().map(_.getString(0))
    assert(got.toSeq == urls.map(Canon.canonicalizeFullScala))
    assert(Canon.canonicalizeFullScala("HTTPS://X.Y:443/a#b") == "https://x.y/a")
    assert(Canon.hostOfScala("https://A.B:8080/x") == "a.b")
  }

  test("padCode/classifyExchange: column == Scala twin on generated codes") {
    val gen = Gen.oneOf(
      Gen.numStr.map(_.take(8)).suchThat(_.nonEmpty),
      Gen.alphaNumStr.map(_.take(8)).suchThat(_.nonEmpty),
      Gen.oneOf("600941", "300750", "830001", "92099", "43", "0", "X12345"))
    val samples = Gen.listOfN(80, gen).sample.get
    val got = evalStr(Canon.classifyExchange(Canon.padCode(col("v"))), samples)
    val want = samples.map(c => Canon.classifyExchangeScala(Canon.padCodeScala(c)))
    assert(got == want)
  }

  test("first-number ladder: column == Scala twin on messy numerics (E-str6)") {
    val gen = Gen.oneOf(
      Gen.const("其中：数据资源 1,234,567.89 元"),
      Gen.const("约 1,234.5"), Gen.const("12,345"), Gen.const("3.14159 与 2"),
      Gen.const("42"), Gen.const("无数据"), Gen.const(""),
      Gen.const("a1,000b2,000.00c"), Gen.const("999 1,000.00"),
      Gen.chooseNum(0, 99999999).map(n => f"$n%,d"),
      Gen.chooseNum(0, 999999).map(n => s"前缀${n}后缀"))
    val samples = Gen.listOfN(120, gen).sample.get
    val got = evalStr(Extract.extractFirstNumber(col("v")), samples)
    val want = samples.map(sv => Extract.extractFirstNumberScala(sv).orNull)
    assert(got == want)
  }

  test("normalizeText: column == Scala twin (E-str4)") {
    val samples = Seq("a b\tc\nd", "其中: 数据资源", "  x　y ", "no-ws", "a:b:c")
    assert(evalStr(Extract.normalizeText(col("v")), samples) ==
      samples.map(Extract.normalizeTextScala))
  }

  test("announceDate handles the int-or-string union (E-date1/2)") {
    val s = spark; import s.implicits._
    val df = Seq(
      (java.lang.Long.valueOf(1717200000123L), null: String),
      (null: java.lang.Long, "2024-06-01 09:30:00"),
      (null: java.lang.Long, null: String)).toDF("ms", "str")
    val got = df.select(Canon.announceDate(col("ms"), col("str"))).collect()
      .map(r => Option(r.getDate(0)).map(_.toString).orNull)
    assert(got.toSeq == Seq("2024-06-01", "2024-06-01", null))
  }

  test("parseAmount: sentinels and junk yield null, not ANSI errors (E-str8)") {
    val s = spark; import s.implicits._
    val got = Seq("1,234.56", "N/A", "", "abc", " 7 ", "1,2,3").toDF("v")
      .select(Extract.parseAmount(col("v")).cast("string")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq == Seq("1234.56", null, null, null, "7.00", "123.00"))
  }

  test("extractLongRows: span order + parent category resolution (E-arr1/2)") {
    val s = spark; import s.implicits._
    import graft.model.{Doc, Span}
    val doc = Doc("d1", Seq(
      Span("text", "第1节 存货明细", null, 0),
      Span("media", null, "media://img/a", 1),       // empty: skipped upward
      Span("text", "其中：数据资源 | 1,234.56 | 元", null, 2),
      Span("text", "第2节 开发支出说明", null, 3),
      Span("text", "其中：数据资源 | N/A | 元", null, 4),
      Span("text", "其中：数据资源 | 99 | 元", null, 5)))
    val noCat = Doc("d2", Seq(Span("text", "其中：数据资源 | 5 | 元", null, 0)))
    val got = Extract.extractLongRows(Seq(doc, noCat).toDS().toDF())
      .orderBy("doc_id", "offset")
      .select("doc_id", "item", "amount_str", "offset").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3)))
    // reference acceptance rules (report_info_collection.py:122-190):
    //  off 2: parent 存货 across the media span, positive → emit
    //  off 4: N/A — no positive number → NO row ("continue")
    //  off 5: nearest prior non-empty is the keyword row at off 4,
    //         which names no category → ABORT ("break")
    //  d2: no prior span at all → abort
    assert(got.toSeq == Seq(("d1", "存货", "1,234.56", 2)))
  }

  test("extractLongRows: reference abort + positivity rules (E-arr2)") {
    val s = spark; import s.implicits._
    import graft.model.{Doc, Span}
    val docs = Seq(
      // header → NOISE → keyword: the nearest prior non-empty span
      // names no category → abort (markers must not carry across)
      Doc("a1", Seq(
        Span("text", "第1节 无形资产明细", null, 0),
        Span("text", "补充说明若干", null, 1),
        Span("text", "其中：数据资源 | 42 | 元", null, 2))),
      // header → empty-text + media → keyword: empties are skipped
      Doc("a2", Seq(
        Span("text", "第1节 无形资产明细", null, 0),
        Span("text", "  \n ", null, 1),
        Span("media", null, "media://x", 2),
        Span("text", "其中：数据资源 | 42 | 元", null, 3))),
      // zero amount in the first cell, positive in a later cell: the
      // reference scans cells rightward PAST non-positive numbers
      Doc("a3", Seq(
        Span("text", "存货", null, 0),
        Span("text", "其中：数据资源 | 0.00 | 77 | 元", null, 1))),
      // only a zero → no emission
      Doc("a4", Seq(
        Span("text", "存货", null, 0),
        Span("text", "其中：数据资源 | 0 |", null, 1))),
      // a keyword row that itself names a category parents the NEXT row
      Doc("a5", Seq(
        Span("text", "开发支出其中：数据资源 | 5 | 元", null, 0),
        Span("text", "其中：数据资源 | 6 | 元", null, 1))))
    val got = Extract.extractLongRows(docs.toDS().toDF())
      .orderBy("doc_id", "offset")
      .select("doc_id", "item", "amount_str", "offset").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3)))
    assert(got.toSeq == Seq(
      ("a2", "无形资产", "42", 3),
      ("a3", "存货", "77", 1),
      ("a5", "开发支出", "6", 1)))
  }

  test("extractLongRows: a break span is a table boundary — parent resets (E-arr2)") {
    val s = spark; import s.implicits._
    import graft.model.{Doc, Span}
    val docs = Seq(
      // header | BREAK | keyword → abort: the reference's upward scan
      // stops at the current table's row 0
      // (report_info_collection.py:124-139) — a category header can
      // never be inherited across a table break
      Doc("b1", Seq(
        Span("text", "第1节 存货明细", null, 0),
        Span("break", null, null, 1),
        Span("text", "其中：数据资源 | 42 | 元", null, 2))),
      // header | BREAK | header2 | keyword → header2's category wins
      Doc("b2", Seq(
        Span("text", "第1节 存货明细", null, 0),
        Span("break", null, null, 1),
        Span("text", "第2节 开发支出明细", null, 2),
        Span("text", "其中：数据资源 | 7 | 元", null, 3))),
      // break among SKIPPED spans still resets (unlike media/empty)
      Doc("b3", Seq(
        Span("text", "无形资产", null, 0),
        Span("media", null, "media://x", 1),
        Span("break", null, null, 2),
        Span("media", null, "media://y", 3),
        Span("text", "其中：数据资源 | 9 | 元", null, 4))))
    val got = Extract.extractLongRows(docs.toDS().toDF())
      .orderBy("doc_id", "offset")
      .select("doc_id", "item", "amount_str", "offset").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3)))
    assert(got.toSeq == Seq(("b2", "开发支出", "7", 3)))
  }

  test("E-str6 divergence pinned: plain ≥4-digit decimals are NOT truncated") {
    // The reference's first ladder pattern ((?:\d{1,3},)*\d{1,3}\.\d{2})
    // is unanchored with * on the comma groups, so re.search on
    // "1234.56" matches the SUBSTRING "234.56" (verified against
    // report_info_collection.py:100-107). This engine returns the full
    // number — a documented deliberate fix (SURVEY.md §2.8 E-str6).
    assert(Extract.extractFirstNumberScala("1234.56").contains("1234.56"))
    assert(Extract.extractFirstNumberScala("共 98765.43 元").contains("98765.43"))
    // the grouped branch still wins when a real comma group exists
    assert(Extract.extractFirstNumberScala("1,234.56").contains("1,234.56"))
    // column twin agrees
    val got = evalStr(Extract.extractFirstNumber(col("v")),
      Seq("1234.56", "共 98765.43 元", "1,234.56"))
    assert(got == Seq("1234.56", "98765.43", "1,234.56"))
  }
}
