package graft.bench
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Diagnostic: stage-wise attribution of crawl_postprocess at sf0.1. */
object PostprocParts {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[postproc] $tag rep$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    val years = graft.queries.CrawlQueries.TargetYears
    def ann = graft.queries.CrawlQueries.deriveAnnouncements(s, d)
    time("derive")(ann)
    val f1 = graft.report.Report.titleFilter(years)
    def filtered = ann.where(f1(col("title")))
      .where(!col("title").contains("摘要") && !col("title").contains("英文版"))
      .withColumn("sec_code", graft.canon.Canon.classifyExchange(
        graft.canon.Canon.padCode(col("sec_code_raw"))))
    time("derive+filter")(filtered)
    def a2 = graft.seen.SeenFilter.firstWinsAgg(
      filtered, Seq("sec_code", "company", "title"), "arrival_seq")
    time("derive+filter+a2agg")(a2)
    time("full")(graft.report.Report.postprocessStage1(ann, years))
    s.stop()
  }
}
