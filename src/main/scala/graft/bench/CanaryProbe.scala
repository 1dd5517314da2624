package graft.bench

/** Diagnostic main: print the CPU canary walls on THIS box (warmed
  * min-of-3) — the source of the quiet-box nominals the bench's
  * contention gate compares against (Bench: SPARK_GRAFT_CANARY_PAR_
  * NOMINAL). Run when migrating boxes; on a loaded box the readings
  * are inflated — record the quiet minimum.
  */
object CanaryProbe {
  def main(args: Array[String]): Unit = {
    // JIT warm-up (memCanaryPar's first call also pays its one-time
    // buffer page faults)
    graft.BenchLevel.cpuCanary(); graft.BenchLevel.cpuCanaryPar(8)
    graft.BenchLevel.memCanaryPar(8)
    val s1 = (1 to 3).map(_ => graft.BenchLevel.cpuCanary())
    val p8 = (1 to 3).map(_ => graft.BenchLevel.cpuCanaryPar(8))
    val p2 = (1 to 3).map(_ => graft.BenchLevel.cpuCanaryPar(2))
    val m8 = (1 to 3).map(_ => graft.BenchLevel.memCanaryPar(8))
    val m2 = (1 to 3).map(_ => graft.BenchLevel.memCanaryPar(2))
    println(f"[canary] single=${s1.min}%.3f par8=${p8.min}%.3f par2=${p2.min}%.3f " +
      f"mem8=${m8.min}%.3f mem2=${m2.min}%.3f " +
      f"(all=${(s1 ++ p8 ++ p2 ++ m8 ++ m2).map(v => f"$v%.3f").mkString(",")})")
    // aggregate streaming rate for the human: 8 threads x 256 MB
    println(f"[canary] mem8 aggregate ${8 * 0.25 / m8.min}%.1f GB/s, " +
      f"mem2 ${2 * 0.25 / m2.min}%.1f GB/s")
    // spark-shaped canary at both gate levels (the gate's primary
    // probe; source of SPARK_GRAFT_CANARY_SPARK_NOMINALS) and at the
    // query-phase level (source of the query_spark_canary nominal)
    Seq(2, 8, 32).foreach { lvl =>
      val s = graft.Bench.session(lvl, if (lvl == 32) 32 else 16)
      graft.BenchLevel.sparkCanary(s) // codegen warm-up
      val r = (1 to 3).map(_ => graft.BenchLevel.sparkCanary(s))
      println(f"[canary] spark$lvl=${r.min}%.3f " +
        f"(all=${r.map(v => f"$v%.3f").mkString(",")})")
      s.stop()
    }
  }
}
