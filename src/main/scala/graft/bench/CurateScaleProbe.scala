package graft.bench

import graft.gen.Fixtures
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** 10× scale proof point for the CURATION family (VERDICT r6 #3): the
  * 20M replay proves the crawl path at 10×, but the dedup/text
  * operators had never run above sf0.1. This probe generates a
  * documents corpus with the driver corpus's shape (same schema,
  * ~300-char texts over a small vocabulary, sparse exact- and
  * near-dup structure) at two sizes from the SAME deterministic
  * generator — 5k rows (the sf0.1 point) and 10× that — runs the
  * expensive documents-only queries at both, and reports walls, pair
  * counts, and shuffle bytes so ~linear growth (banding/blocking
  * working) is checkable against quadratic blow-up in one artifact.
  *
  * The corpus is synthesized here, not copied: TESTDATA.md's parquet
  * is read-only driver property and has no sf1. Dup structure is
  * index-local (a dup references fresh(i−k) for small k), so expected
  * pair counts grow LINEARLY in n by construction — which is exactly
  * what makes a super-linear measured growth a finding about the
  * OPERATOR, not the data.
  *
  * Usage: runMain graft.bench.CurateScaleProbe [counts-csv] [out.json]
  * (defaults 5000,50000 and BENCH/r7_sf1.json; set
  * SPARK_GRAFT_SCALE_QUERIES to override the query list).
  */
object CurateScaleProbe {

  /** Pure per-index token stream, the generator's "fresh" text. */
  private val vocab: Array[String] = Array(
    "spark", "batch", "stream", "table", "column", "row", "key", "value",
    "join", "group", "agg", "sort", "scan", "filter", "window", "merge",
    "hash", "part", "query", "data", "fast", "slow", "small", "big",
    "order", "line", "a", "the", "and", "of", "to", "in", "for", "with",
    "dedup", "token", "shard", "bucket", "frame", "plan")

  /** Per-position token: 50% from the stopword-ish base vocab (keeps
    * the quality gate's stopword-ratio realistic), 50% from a 4000-word
    * long tail. The tail is load-bearing for the SCALE reading: with
    * the base-40 vocab alone, 64-bit simhash fingerprints saturate as
    * n grows and ACCIDENTAL hamming-≤3 pairs grow ~quadratically
    * (first probe run: simhash pair count 83→3265 on 10× data, a
    * corpus artifact that would mask a real blocking regression).
    * With the tail, planted index-local dups dominate every pair
    * family, so expected pair counts grow linearly by construction.
    *
    * Tail words are LETTER-ONLY: `TextOps.tokens` segments on [a-z]+
    * runs, so a digit-bearing word like "w123" collapses to "w" for
    * every tail draw — in that regime every fingerprint converged on
    * the shared high-count "w" token and simhash pairs hit ~n²/2 at
    * the LO leg (12.4M pairs on 5k docs, run-2 artifact).
    */
  private def freshTokens(i: Long): Seq[String] = {
    val len = 40 + Fixtures.draw(21, "len", i)
    (0 until len).map { p =>
      if (Fixtures.draw(2, "mix", i, p) == 0)
        vocab(Fixtures.draw(vocab.length, "tok", i, p))
      else {
        val t = Fixtures.draw(4000, "tail", i, p)
        s"w${('a' + t % 20).toChar}${('a' + t / 20 % 20).toChar}${('a' + t / 400 % 20).toChar}"
      }
    }
  }

  /** doc i's text: mostly fresh; ~0.5% an exact copy of a nearby
    * fresh text; ~1.5% a near-dup (2 tokens overwritten). References
    * are index-local, so dup pairs grow linearly with n.
    */
  private[bench] def textFor(i: Long): String = {
    if (i >= 211 && i % 211 == 5) freshTokens(i - 5).mkString(" ")
    else if (i >= 67 && i % 67 == 3) {
      val base = freshTokens(i - 3).toArray
      base(Fixtures.draw(base.length, "mut1", i)) =
        vocab(Fixtures.draw(vocab.length, "mutv1", i))
      base(Fixtures.draw(base.length, "mut2", i)) =
        vocab(Fixtures.draw(vocab.length, "mutv2", i))
      base.mkString(" ")
    } else freshTokens(i).mkString(" ")
  }

  private def generate(s: SparkSession, n: Long, dir: String): Unit = {
    import s.implicits._
    val langs = Array("en", "zh", "de", "es", "fr")
    s.range(n).mapPartitions(_.map { i =>
      val text = textFor(i)
      (i, text, langs(Fixtures.draw(langs.length, "lang", i)),
        s"src${Fixtures.draw(20, "src", i)}", text.length.toLong)
    }).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  def main(args: Array[String]): Unit = {
    val counts = (if (args.length > 0) args(0) else "5000,50000")
      .split(",").map(_.trim.toLong).toSeq
    val outPath = if (args.length > 1) args(1) else "BENCH/r7_sf1.json"
    val queries: Seq[String] = sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(",").toSeq).getOrElse(Seq(
        "pipeline_curate", "dedup_ngram_jaccard", "dedup_minhash_lsh",
        "dedup_clusters", "dedup_simhash", "dedup_simhash_pairs",
        "text_winnow_fingerprint", "text_contamination"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    // per-window shuffle-byte aggregation (the r5 lesson: .explain
    // looked clean while the shuffle-BYTE dump exposed the dedup
    // exchange shipping unread columns — bytes, not plans, catch that
    // class). Listener delivery is async: each window closes with a
    // short settle sleep, fine at probe precision.
    // accumulate RAW bytes and convert once at window close — a
    // per-stage /MB truncation silently zeroes small-sf legs (many
    // sub-MB stages), destroying exactly the lo-vs-hi ratio the probe
    // exists to report.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0)
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        shuffleBytes.addAndGet(
          m.shuffleWriteMetrics.bytesWritten + m.shuffleReadMetrics.totalBytesRead)
        ()
      }
    })
    def windowed[T](body: => T): (T, Double) = {
      Thread.sleep(300); shuffleBytes.set(0)
      val r = body
      Thread.sleep(300)
      (r, shuffleBytes.get().toDouble / (1 << 20))
    }

    final case class Reading(n: Long, query: String, sec: Double, rows: Long, shMb: Double)
    val readings = Seq.newBuilder[Reading]
    // min-of-2: the first canary on a cold JVM pays one-time JIT (a
    // 27 s reading in the first probe run) and brackets nothing.
    val canaryPre =
      math.min(graft.BenchLevel.sparkCanary(s), graft.BenchLevel.sparkCanary(s))
    counts.foreach { n =>
      val dir = s"/tmp/curate_scale_$n"
      generate(s, n, dir)
      queries.foreach { q =>
        val fn = graft.SparkEntry.queries(q)
        val rows = fn(s, dir).count() // warm-up + the pair/row count
        val secs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(s, dir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        val ((), mb) = windowed {
          fn(s, dir).write.format("noop").mode("overwrite").save()
        }
        val sec = secs.min
        readings += Reading(n, q, sec, rows, mb)
        println(f"[curatescale] n=$n $q sec=$sec%.2f rows=$rows shuffleMB=$mb%.1f")
      }
    }
    val canaryPost = graft.BenchLevel.sparkCanary(s)
    val rs = readings.result()
    val loN = counts.min; val hiN = counts.max
    def f2(d: Double) = java.lang.String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
    val perQuery = queries.map { q =>
      val lo = rs.find(r => r.n == loN && r.query == q).get
      val hi = rs.find(r => r.n == hiN && r.query == q).get
      val scale = hiN.toDouble / loN
      s""""$q":{"sec_lo":${f2(lo.sec)},"sec_hi":${f2(hi.sec)},""" +
        s""""wall_ratio":${f2(hi.sec / lo.sec)},""" +
        s""""rows_lo":${lo.rows},"rows_hi":${hi.rows},""" +
        s""""rows_ratio":${f2(hi.rows.toDouble / math.max(1, lo.rows))},""" +
        s""""shuffle_mb_lo":${f2(lo.shMb)},"shuffle_mb_hi":${f2(hi.shMb)},""" +
        s""""shuffle_ratio":${f2(hi.shMb / math.max(0.01, lo.shMb))},""" +
        s""""linear_would_be":${f2(scale)}}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"probe":"curate_scale","n_lo":$loN,"n_hi":$hiN,""" +
        s""""spark_canary":[${f2(canaryPre)},${f2(canaryPost)}],""" +
        s""""queries":$perQuery}"""
    println(json)
    val p = java.nio.file.Paths.get(outPath)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(p, json + "\n")
    s.stop()
  }
}
