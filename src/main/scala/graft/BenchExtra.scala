package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Diagnostic side-bench (guide §1): times any subset of SparkEntry
  * queries with the SAME action as the frozen graft.Bench (`.count()` on
  * the query DataFrame) while a listener attributes the wall time —
  * jobs launched, tasks run, summed task time — and a second warm
  * repetition isolates plan/codegen overhead from execution. Prints one
  * JSON line per query. Never read by the driver; evidence for
  * OPTIMIZATION_r06.md only.
  *
  * Usage: sbt "runMain graft.BenchExtra q1_agg t25_bigram_lm" (no args =
  * every query, sorted, the Bench order).
  */
object BenchExtra {

  final class Probe extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(e: SparkListenerJobStart): Unit =
      { jobs.incrementAndGet(): Unit }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      { stages.incrementAndGet(): Unit }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      taskTimeMs.addAndGet(e.taskInfo.duration): Unit
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wanted =
      if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted
      else args.toSeq
    wanted.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val rep = (1 to 2).map { i =>
        val p = new Probe
        spark.sparkContext.addSparkListener(p)
        spark.sparkContext.setJobDescription(s"$name rep$i")
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener bus is async: give it a beat to drain before reading
        Thread.sleep(150)
        spark.sparkContext.removeSparkListener(p)
        (wall, p.jobs.get(), p.tasks.get(), p.taskTimeMs.get() / 1e3)
      }
      val (w1, j1, t1, tt1) = rep(0)
      val (w2, j2, t2, tt2) = rep(1)
      println(f"""{"q":"$name","wall":$w1%.2f,"jobs":$j1,"tasks":$t1,"taskSec":$tt1%.1f,"wall_warm":$w2%.2f,"jobs_warm":$j2,"tasks_warm":$t2,"taskSec_warm":$tt2%.1f}""")
    }
    spark.stop()
  }
}
