package graft

import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling evidence (BASELINE.json: ≥0.8 throughput
  * scaling efficiency between N and 4N executors). Sandbox form: the SAME
  * materialized transcript table driven at local[N] and local[4N] in one
  * JVM (sessions created/stopped sequentially); prints one JSON line with
  * both throughputs and the efficiency.
  */
object ScalingBench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Best-of-reps wall time for the headline job at a parallelism level. */
  private def measure(cpus: Int, turnsPath: String, reps: Int): Double = {
    val spark = session(cpus)
    try {
      Bench.headline(spark, turnsPath) // warmup at this level
      (1 to reps).map { _ =>
        Bench.timeIt(Bench.headline(spark, turnsPath))._2
      }.min
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // 400 × sf0.1 events = 40M turns: measured floor for amortizing
    // job-fixed overhead — at 10M turns the 4N run is ~1s and efficiency
    // readings swing 0.6-1.0 with host steal (BENCH.md)
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "400").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "8").toInt
    // best-of-5: the 4N measurement is only a few seconds long, so host
    // CPU steal on the shared box can depress a single rep by 30%+
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val n4 = n * 4

    // materialize once with a session that then goes away; partition count
    // sized for the LARGER level so both read the same splittable layout
    val turnsPath = s"target/bench_turns_${sfDir.replaceAll("[^0-9.]", "")}_$mult"
    val prep = session(n4)
    val nTurns =
      try Bench.materializeTurns(prep, sfDir, mult, turnsPath, n4 * 4)
      finally prep.stop()

    val tN = measure(n, turnsPath, reps)
    val tN4 = measure(n4, turnsPath, reps)
    val thN = nTurns / tN
    val thN4 = nTurns / tN4
    val eff = (thN4 / thN) / 4.0
    println(
      f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","n_cpus":$n,"n4_cpus":$n4,"turns":$nTurns,"sec_n":$tN%.3f,"sec_n4":$tN4%.3f,"tput_n":$thN%.0f,"tput_n4":$thN4%.0f,"sf":"$sfDir","mult":$mult}""")
  }
}
