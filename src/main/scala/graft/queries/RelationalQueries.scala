package graft.queries

import graft.Tables
import graft.canon.Canon
import graft.extract.Extract
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY.md §2.2-§2.8) exercised over
  * the driver's TPC-H-ish corpus, each with an ANSI-SQL oracle the
  * driver replays in DuckDB.
  *
  * Numeric-compare policy (applies to every query here): monetary
  * sums accumulate in DECIMAL (exact, order-independent) and cast to
  * DOUBLE once at the end; ratios are floor()ed integer-milli values;
  * anything else is int64/string/date. This keeps result hashes
  * bit-stable across engines and across Spark partitionings.
  */
object RelationalQueries {
  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Small-input-spread opt-out (Tables.load scaladoc): for queries
    * whose whole body is one cheap pass — a single partial-agg
    * groupBy or a WindowGroupLimit window — the spread's exchange is
    * pure added latency at small scale (measured +0.1-0.3 s each,
    * round 8); identical at the design point where the spread is
    * inert.
    */
  private def tn(s: SparkSession, dir: String, n: String) =
    Tables.load(s, dir, n, spread = false)

  /** Exact money sum: decimal accumulation, one final double cast. */
  private def moneySum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,2)")).cast("double")

  val entries: Map[String, QFn] = Map(
    // A7-style full-table aggregation with map-side partial agg.
    "q1_pricing_summary" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1.0) - col("l_discount")).cast("decimal(18,2)")).cast("double").as("sum_disc"),
          count(lit(1)).as("cnt"))
    }),

    // J-chain: fact ⋈ three broadcast dims (customer/nation/region are
    // tiny relative to orders at any scale — classic star join).
    "q2_region_revenue" -> ((s, d) => {
      t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(moneySum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
    }),

    // O2: top-k per group, deterministic tie-break.
    "q3_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      tn(s, d, "orders")
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select(col("o_orderpriority"), col("o_orderkey"), col("rank").cast("long").as("rank"))
    }),

    // J1-shape anti join (the seen-filter's exact confirm step).
    "q4_anti_join" -> ((s, d) => {
      val big = t(s, d, "orders").where(col("o_totalprice") > 400000)
      t(s, d, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // Semi join (EXISTS).
    "q5_semi_join" -> ((s, d) => {
      val big = t(s, d, "orders").where(col("o_totalprice") > 300000)
      t(s, d, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey")
    }),

    // A2: keep-first dedup via explicit arrival ordinal (pandas
    // keep='first' has no partition-stable Spark analog but a window).
    "q6_dedup_keepfirst" -> ((s, d) => {
      // l_linenumber repeats within an order in this corpus; the full
      // tie-break keeps the window deterministic (keep-first needs a
      // total order — SURVEY.md §2.5).
      val w = Window.partitionBy("l_orderkey")
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      tn(s, d, "lineitem")
        .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("first_line"),
          col("l_partkey").as("first_part"))
    }),

    // A3: latest-per-key top-1 (desc nulls last + arrival tie-break).
    "q7_latest_per_key" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc_nulls_last, col("o_orderkey").asc)
      tn(s, d, "orders")
        .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("latest_order"),
          to_date(col("o_orderdate")).as("latest_date"))
    }),

    // A5: static-value-list pivot; values are exact int64 sums.
    "q8_pivot_events" -> ((s, d) => {
      t(s, d, "events")
        .withColumn("user_bucket", col("user_id") % 20)
        .withColumn("k", get_json_object(col("props"), "$.k").try_cast("long"))
        .groupBy("user_bucket")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(sum(col("k")))
    }),

    // A4: first-positive-else-first group reduce.
    "q9_first_positive" -> ((s, d) => {
      val w = Window.partitionBy("l_orderkey")
        .orderBy((col("l_discount") > 0).desc, col("l_linenumber").asc,
          col("l_partkey").asc, col("l_suppkey").asc)
      tn(s, d, "lineitem")
        .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("picked_line"),
          col("l_discount").as("picked_discount"))
    }),

    // E-str6: first-number regex ladder over a derived messy string.
    "q10_number_ladder" -> ((s, d) => {
      val m = col("o_orderkey") % 4
      val raw = when(m === 0,
          concat(lit("合计 "), (col("o_orderkey") % 900 + 100).cast("string"), lit(","),
            lpad((col("o_custkey") % 1000).cast("string"), 3, "0"), lit(".25 元")))
        .when(m === 1, concat(lit("金额"), (col("o_custkey") % 5000).cast("string"), lit(".5元")))
        .when(m === 2, concat(lit("共 "), (col("o_orderkey") % 77).cast("string"), lit(" 件")))
        .otherwise(lit("无数据"))
      t(s, d, "orders")
        .select(col("o_orderkey"), raw.as("raw"))
        .withColumn("extracted", Extract.extractFirstNumber(col("raw")))
        .withColumn("amount", Extract.parseAmount(coalesce(col("extracted"), lit("0")))
          .cast("double"))
    }),

    // §2.7: union + distinct.
    "q11_union_distinct" -> ((s, d) => {
      val o = tn(s, d, "orders")
      o.where(col("o_totalprice") > 350000).select("o_orderkey")
        .union(o.where(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F")
          .select("o_orderkey"))
        .distinct()
    }),

    // E-date4: −3-month fiscal shift with day clamping (add_months).
    "q12_date_shift" -> ((s, d) => {
      tn(s, d, "orders")
        .withColumn("shifted", add_months(col("o_orderdate"), -3))
        .groupBy(year(col("shifted")).cast("long").as("fiscal_year"),
          month(col("shifted")).cast("long").as("fiscal_month"))
        .agg(count(lit(1)).as("n"))
    }),

    // E-str2/3: zero-pad + exchange-suffix classification.
    "q13_code_classify" -> ((s, d) => {
      val c6 = ((col("c_custkey") * 37) % 1000000).cast("string")
      val raw = when(col("c_custkey") % 5 === 0, concat(lit("X"), c6)).otherwise(c6)
      t(s, d, "customer")
        .select(col("c_custkey"), raw.as("code_raw"))
        .withColumn("code_padded", Canon.padCode(col("code_raw")))
        .withColumn("code_classified", Canon.classifyExchange(col("code_padded")))
    }),

    // F8: sentinel-null cleanup + positive-amount predicate (F5).
    "q14_sentinel_clean" -> ((s, d) => {
      val k = get_json_object(col("props"), "$.k").try_cast("long")
      val m = k % 7
      val dirty = when(m === 0, lit("N/A")).when(m === 1, lit("-"))
        .when(m === 2, lit("空值")).when(m === 3, lit("nan"))
        .when(m === 4, lit("None")).when(m === 5, lit(""))
        .otherwise(concat(k.cast("string"), lit(",000.50")))
      t(s, d, "events")
        .select(col("event_id"), dirty.as("dirty"))
        .withColumn("cleaned", Extract.cleanSentinel(col("dirty")))
        .withColumn("amount", Extract.parseAmount(col("cleaned")).cast("double"))
        .withColumn("is_positive", Extract.parseAmount(col("cleaned")) > 0)
    }),

    // E-json1: JSON field decode + aggregation.
    "q15_json_extract" -> ((s, d) => {
      t(s, d, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").try_cast("long"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"),
          max(col("k")).as("max_k"))
    }))

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc,
        | count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q2_region_revenue" ->
      """SELECT r_name,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "q3_topk_per_group" ->
      """SELECT o_orderpriority, o_orderkey, CAST(rnk AS BIGINT) AS "rank" FROM (
        | SELECT o_orderpriority, o_orderkey,
        |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        | FROM orders) WHERE rnk <= 3""".stripMargin,

    "q4_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin,

    "q5_semi_join" ->
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin,

    "q6_dedup_keepfirst" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS first_line, l_partkey AS first_part FROM (
        | SELECT l_orderkey, l_linenumber, l_partkey,
        |  row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
        | FROM lineitem) WHERE rn = 1""".stripMargin,

    "q7_latest_per_key" ->
      """SELECT o_custkey, o_orderkey AS latest_order, CAST(o_orderdate AS DATE) AS latest_date FROM (
        | SELECT o_custkey, o_orderkey, o_orderdate,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC NULLS LAST, o_orderkey) AS rn
        | FROM orders) WHERE rn = 1""".stripMargin,

    "q8_pivot_events" ->
      """SELECT user_id % 20 AS user_bucket,
        | CAST(sum(CASE WHEN event_type = 'click' THEN k END) AS BIGINT) AS "click",
        | CAST(sum(CASE WHEN event_type = 'error' THEN k END) AS BIGINT) AS "error",
        | CAST(sum(CASE WHEN event_type = 'purchase' THEN k END) AS BIGINT) AS "purchase",
        | CAST(sum(CASE WHEN event_type = 'signup' THEN k END) AS BIGINT) AS "signup",
        | CAST(sum(CASE WHEN event_type = 'view' THEN k END) AS BIGINT) AS "view"
        |FROM (SELECT user_id, event_type, CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k FROM events)
        |GROUP BY user_id % 20""".stripMargin,

    "q9_first_positive" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS picked_line, l_discount AS picked_discount FROM (
        | SELECT l_orderkey, l_linenumber, l_discount,
        |  row_number() OVER (PARTITION BY l_orderkey
        |    ORDER BY CAST(l_discount > 0 AS INT) DESC, l_linenumber, l_partkey, l_suppkey) AS rn
        | FROM lineitem) WHERE rn = 1""".stripMargin,

    "q10_number_ladder" ->
      """WITH raws AS (
        | SELECT o_orderkey,
        |  CASE o_orderkey % 4
        |   WHEN 0 THEN concat('合计 ', CAST(o_orderkey % 900 + 100 AS VARCHAR), ',', lpad(CAST(o_custkey % 1000 AS VARCHAR), 3, '0'), '.25 元')
        |   WHEN 1 THEN concat('金额', CAST(o_custkey % 5000 AS VARCHAR), '.5元')
        |   WHEN 2 THEN concat('共 ', CAST(o_orderkey % 77 AS VARCHAR), ' 件')
        |   ELSE '无数据' END AS raw
        | FROM orders),
        |ex AS (
        | SELECT o_orderkey, raw,
        |  coalesce(
        |   nullif(regexp_extract(raw, '\d{1,3}(,\d{3})+\.\d{2}', 0), ''),
        |   nullif(regexp_extract(raw, '\d{1,3}(,\d{3})+\.\d+', 0), ''),
        |   nullif(regexp_extract(raw, '\d{1,3}(,\d{3})+', 0), ''),
        |   nullif(regexp_extract(raw, '\d+\.\d+', 0), ''),
        |   nullif(regexp_extract(raw, '\d+', 0), '')) AS extracted
        | FROM raws)
        |SELECT o_orderkey, raw, extracted,
        | CAST(TRY_CAST(regexp_replace(coalesce(extracted, '0'), '[,\s]', '', 'g') AS DECIMAL(20,2)) AS DOUBLE) AS amount
        |FROM ex""".stripMargin,

    "q11_union_distinct" ->
      """SELECT DISTINCT o_orderkey FROM (
        | SELECT o_orderkey FROM orders WHERE o_totalprice > 350000
        | UNION ALL
        | SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F')""".stripMargin,

    "q12_date_shift" ->
      """SELECT CAST(date_part('year', s) AS BIGINT) AS fiscal_year,
        | CAST(date_part('month', s) AS BIGINT) AS fiscal_month, count(*) AS n
        |FROM (SELECT CAST(o_orderdate - INTERVAL 3 MONTH AS DATE) AS s FROM orders)
        |GROUP BY 1, 2""".stripMargin,

    "q13_code_classify" ->
      """WITH raws AS (
        | SELECT c_custkey,
        |  CASE WHEN c_custkey % 5 = 0 THEN concat('X', CAST((c_custkey * 37) % 1000000 AS VARCHAR))
        |       ELSE CAST((c_custkey * 37) % 1000000 AS VARCHAR) END AS code_raw
        | FROM customer),
        |padded AS (
        | SELECT c_custkey, code_raw,
        |  CASE WHEN regexp_matches(code_raw, '^\d+$') AND length(code_raw) < 6 THEN lpad(code_raw, 6, '0') ELSE code_raw END AS code_padded
        | FROM raws)
        |SELECT c_custkey, code_raw, code_padded,
        | CASE WHEN substr(code_padded,1,2) IN ('60','68') THEN concat(code_padded, '.SH')
        |      WHEN substr(code_padded,1,2) IN ('00','30') THEN concat(code_padded, '.SZ')
        |      WHEN substr(code_padded,1,2) IN ('83','87','92','43') THEN concat(code_padded, '.BJ')
        |      ELSE code_padded END AS code_classified
        |FROM padded""".stripMargin,

    "q14_sentinel_clean" ->
      """WITH base AS (
        | SELECT event_id, CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k FROM events),
        |dirtied AS (
        | SELECT event_id,
        |  CASE k % 7 WHEN 0 THEN 'N/A' WHEN 1 THEN '-' WHEN 2 THEN '空值'
        |   WHEN 3 THEN 'nan' WHEN 4 THEN 'None' WHEN 5 THEN ''
        |   ELSE concat(CAST(k AS VARCHAR), ',000.50') END AS dirty
        | FROM base),
        |cleaned AS (
        | SELECT event_id, dirty,
        |  CASE WHEN dirty IN ('', 'N/A', '空值', '-', 'nan', 'None') THEN '0' ELSE dirty END AS cleaned
        | FROM dirtied)
        |SELECT event_id, dirty, cleaned,
        | CAST(TRY_CAST(regexp_replace(cleaned, '[,\s]', '', 'g') AS DECIMAL(20,2)) AS DOUBLE) AS amount,
        | TRY_CAST(regexp_replace(cleaned, '[,\s]', '', 'g') AS DECIMAL(20,2)) > 0 AS is_positive
        |FROM cleaned""".stripMargin,

    "q15_json_extract" ->
      """SELECT event_type, CAST(sum(k) AS BIGINT) AS sum_k, count(*) AS n, max(k) AS max_k
        |FROM (SELECT event_type, CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k FROM events)
        |GROUP BY event_type""".stripMargin)
}
