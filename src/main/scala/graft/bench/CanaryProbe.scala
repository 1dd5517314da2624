package graft.bench

/** Diagnostic main: print the CPU / memory / pointer-chase / spark
  * canary walls on THIS box (warmed min-of-reps) — the source of the
  * quiet-box nominals the bench's contention gate compares against
  * (Bench: SPARK_GRAFT_CANARY_* env knobs). Run when migrating boxes;
  * on a loaded box the readings are inflated — record the quiet
  * minimum. args(0) (optional, default 3) = readings per probe; use
  * ~10 when re-basing a nominal so the JIT/allocator floor is real (the
  * spark canary keeps descending for several readings on a fresh
  * session).
  */
object CanaryProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    // JIT warm-up (memCanaryPar's first call also pays its one-time
    // buffer page faults; ptrChaseNs's first call builds the 256 MB
    // permutation)
    graft.BenchLevel.cpuCanary(); graft.BenchLevel.cpuCanaryPar(8)
    graft.BenchLevel.memCanaryPar(8); graft.BenchLevel.ptrChaseNs()
    val s1 = (1 to reps).map(_ => graft.BenchLevel.cpuCanary())
    val p8 = (1 to reps).map(_ => graft.BenchLevel.cpuCanaryPar(8))
    val p2 = (1 to reps).map(_ => graft.BenchLevel.cpuCanaryPar(2))
    val m8 = (1 to reps).map(_ => graft.BenchLevel.memCanaryPar(8))
    val m2 = (1 to reps).map(_ => graft.BenchLevel.memCanaryPar(2))
    val pc = (1 to reps).map(_ => graft.BenchLevel.ptrChaseNs())
    println(f"[canary] single=${s1.min}%.3f par8=${p8.min}%.3f par2=${p2.min}%.3f " +
      f"mem8=${m8.min}%.3f mem2=${m2.min}%.3f " +
      f"(all=${(s1 ++ p8 ++ p2 ++ m8 ++ m2).map(v => f"$v%.3f").mkString(",")})")
    println(f"[canary] mem8 aggregate ${8 * 0.25 / m8.min}%.1f GB/s, " +
      f"mem2 ${2 * 0.25 / m2.min}%.1f GB/s")
    println(f"[canary] ptr_chase=${pc.min}%.0f ns/access " +
      f"(all=${pc.map(v => f"$v%.0f").mkString(",")}; quiet class ~150-250, " +
      "r5's trashed-LLC neighbor state read ~330)")
    // spark-shaped canary at both gate levels (the gate's primary
    // probe; source of SPARK_GRAFT_CANARY_SPARK_NOMINALS) and at the
    // query-phase level (source of the query_spark_canary nominal)
    Seq(2, 8, 32).foreach { lvl =>
      val s = graft.Bench.session(lvl, if (lvl == 32) 32 else 16)
      graft.BenchLevel.sparkCanary(s) // codegen warm-up
      val r = (1 to reps).map(_ => graft.BenchLevel.sparkCanary(s))
      println(f"[canary] spark$lvl=${r.min}%.3f " +
        f"(all=${r.map(v => f"$v%.3f").mkString(",")})")
      s.stop()
    }
  }
}
