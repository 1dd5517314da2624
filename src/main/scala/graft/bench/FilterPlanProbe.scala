package graft.bench
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object FilterPlanProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val ann = graft.queries.CrawlQueries.deriveAnnouncements(s, d)
    val f1 = graft.report.Report.titleFilter(Seq(2023, 2024))
    val filtered = ann.where(f1(col("title")))
      .where(!col("title").contains("摘要") && !col("title").contains("英文版"))
    val p = filtered.queryExecution.executedPlan.toString
    println("== md5 occurrences: " + "md5".r.findAllIn(p).size)
    println("== CASE WHEN occurrences: " + "CASE WHEN".r.findAllIn(p).size)
    println(p.split("\n").take(40).mkString("\n"))
    s.stop()
  }
}
