package graft.bench

import graft.ops.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B/C probe for the pipeline_curate quality gate (VERDICT r6 #3):
  * the inline gate evaluates `tokens(text)` (a regexp_extract_all)
  * once per CONJUNCT. Candidate cures:
  *   A inline  — current shape, two tokens(text) occurrences.
  *   B barrier — materialize `__toks` in a Project below the Filter;
  *               works only if the optimizer does NOT push the filter
  *               through the project by re-inlining the alias into
  *               both conjuncts (the probe prints the occurrence count
  *               of regexp_extract_all in the optimized plan, so the
  *               answer is in the artifact, not guessed).
  *   C one-pass — a single `aggregate(tokens(text), (n, hit), merge,
  *               finish)` expression: tokens appears ONCE; the finish
  *               lambda emits the whole gate boolean. Per-token
  *               stopword check is an array_contains scan that
  *               short-circuits after the first hit.
  * All three must agree on the survivor count (asserted).
  * Usage: runMain graft.bench.GateABProbe [sfDir] [reps]
  */
object GateABProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_GATE_REPEAT=k inflates the text k× so the regexp
    // dominates the scan — isolates the per-row regexp COUNT question
    // from parquet IO (the pessimization-demo trick from r6's sink
    // re-base).
    val rep = sys.env.getOrElse("SPARK_GRAFT_GATE_REPEAT", "1").toInt
    val dd0 = s.read.parquet(s"$sfDir/documents.parquet")
    val dd = if (rep == 1) dd0
             else dd0.withColumn("text", repeat(col("text"), rep))
    val allStops = TextOps.stopwords.values.flatten.toSeq.distinct.sorted
    val minTokens = 20

    def variantA(df: DataFrame): DataFrame =
      df.where(TextOps.qualityGate(col("text"), minTokens)).select("doc_id", "text")

    def variantB(df: DataFrame): DataFrame =
      df.select(col("doc_id"), col("text"), TextOps.tokens(col("text")).as("__toks"))
        .where(size(col("__toks")) >= minTokens &&
          arrays_overlap(col("__toks"), typedlit(allStops)))
        .select("doc_id", "text")

    def onePassGate(text: Column): Column =
      aggregate(TextOps.tokens(text),
        struct(lit(0).as("n"), lit(false).as("hit")),
        (acc, t) => struct(
          (acc.getField("n") + lit(1)).as("n"),
          (acc.getField("hit") || array_contains(typedlit(allStops), t)).as("hit")),
        acc => acc.getField("n") >= lit(minTokens) && acc.getField("hit"))

    def variantC(df: DataFrame): DataFrame =
      df.where(onePassGate(col("text"))).select("doc_id", "text")

    val variants: Seq[(String, DataFrame => DataFrame)] =
      Seq("A_inline" -> variantA, "B_barrier" -> variantB, "C_onepass" -> variantC)

    // how many regexp evaluations does each optimized plan carry?
    variants.foreach { case (name, v) =>
      val plan = v(dd).queryExecution.executedPlan.toString
      val n = "regexp_extract_all".r.findAllIn(plan).size
      println(s"[gateab] $name regexp_extract_all occurrences in executed plan: $n")
    }
    val counts = variants.map { case (name, v) => name -> v(dd).count() }
    println(s"[gateab] survivor counts: $counts")
    require(counts.map(_._2).distinct.size == 1, s"variants disagree: $counts")

    variants.foreach { case (name, v) => // warm-up
      v(dd).write.format("noop").mode("overwrite").save()
    }
    (1 to reps).foreach { i =>
      variants.foreach { case (name, v) =>
        val t0 = System.nanoTime()
        v(dd).write.format("noop").mode("overwrite").save()
        println(f"[gateab] $name rep$i sec=${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    s.stop()
  }
}
