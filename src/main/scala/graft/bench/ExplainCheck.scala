package graft.bench
import org.apache.spark.sql.SparkSession
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    def show(name: String): Unit = {
      val plan = graft.SparkEntry.queries(name)(s, d).queryExecution.executedPlan.toString
      val pushed = "PushedFilters: \\[[^\\]]*[A-Za-z][^\\]]*\\]".r.findAllIn(plan).toSeq
      val scans = "ReadSchema: [^\\n]*".r.findAllIn(plan).toSeq
      val bhj = plan.split("\n").count(_.contains("BroadcastHashJoin"))
      val smj = plan.split("\n").count(_.contains("SortMergeJoin"))
      val shj = plan.split("\n").count(_.contains("ShuffledHashJoin"))
      val exch = plan.split("\n").count(_.contains("Exchange"))
      val wsc = plan.split("\n").count(_.contains("WholeStageCodegen"))
      println(s"PLAN $name: bhj=$bhj smj=$smj shj=$shj exchanges=$exch codegenSpans=$wsc pushed=${pushed.size}")
      scans.take(3).foreach(x => println(s"   $name $x"))
    }
    Seq("q2_region_revenue", "q4_anti_join", "q1_pricing_summary", "crawl_wide_report",
      "dedup_ngram_jaccard", "dedup_simhash_pairs", "dedup_minhash_lsh", "ann_ivf_topk",
      "extract_long_rows", "crawl_dense_rescale",
      "text_quality", "crawl_validate", "crawl_politeness_salted", "priority_topk",
      "mm_frame_sample", "dedup_embed_cosine").foreach(show)
    // detailed: does q1 push filter + prune columns?
    val q1 = graft.Tables.load(s, d, "lineitem").where(org.apache.spark.sql.functions.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    println(q1.queryExecution.executedPlan.toString.split("\n").filter(l => l.contains("PushedFilters") || l.contains("ReadSchema")).mkString("\n"))
    s.stop()
  }
}
