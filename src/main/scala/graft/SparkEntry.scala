package graft

import graft.queries.{CrawlQueries, PipelineQueries, RelationalQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 has a `queries` entry; the
  * SQL-expressible ones also carry a DuckDB oracle in `oracleSql`
  * (the driver's correctness gate). Crawl-loop behaviors that are not
  * one SQL statement (frontier scheduling, bloom seen-filter,
  * snapshot resume) are covered rows-only here and exactly in
  * ScalaTest (src/test/scala/graft).
  */
object SparkEntry {

  /** Flagship: the reference's stage-1 crawl postprocess (filters →
    * canonicalization → keep-first dedups → latest-per-code) on
    * sf0.001. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    CrawlQueries.entries("crawl_postprocess")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.entries ++ PipelineQueries.entries ++ CrawlQueries.entries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ PipelineQueries.oracles ++ CrawlQueries.oracles
}
