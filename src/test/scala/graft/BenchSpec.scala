package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bench protocol units (the scaling phase itself is exercised by the
  * per-round driver run — here the testable seams).
  */
class BenchSpec extends SparkSpec {

  test("runQueries: a throwing query lands in `failed`, never in the timings (VERDICT r4 #6)") {
    val good: (SparkSession, String) => DataFrame =
      (s, _) => s.range(5).toDF("n")
    val planTimeBoom: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("deliberately broken")
    val runTimeBoom: (SparkSession, String) => DataFrame = (s, _) => {
      import s.implicits._
      s.range(3).map(i => { if (i >= 0) throw new RuntimeException("executor boom"); i }).toDF("n")
    }
    val (times, failed) = Bench.runQueries(spark, "unused",
      Map("ok" -> good, "boom_plan" -> planTimeBoom, "boom_run" -> runTimeBoom))
    assert(failed == Seq("boom_plan", "boom_run"), failed.toString)
    assert(times.keySet == Set("ok"), times.toString)
    assert(times("ok") > 0.0)
  }

  test("canaryBound: floor-relative, capped at 2x nominal") {
    // quiet box at the calibrated nominal: bound IS the nominal
    assert(Bench.canaryBound(1.44, 1.0) == 1.44)
    // host-incarnation drift (r7: floor 1.52 on a provably-quiet box):
    // the measured floor takes over, so retries can converge
    assert(Bench.canaryBound(1.44, 1.52) == 1.52)
    // a floor taken on a loud box can't blind the gate: capped at 2x
    assert(Bench.canaryBound(1.44, 9.0) == 2.88)
  }
}
