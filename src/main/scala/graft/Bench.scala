package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Pipeline
import graft.sources.Transcripts

/** Per-round benchmark: headline = end-to-end parse→enrich→route→aggregate
  * throughput (turns/sec) on a deterministically scaled-up transcript
  * table (BASELINE.json metric), plus per-query timings for every
  * SparkEntry query at the given sf. Prints exactly ONE JSON line.
  */
object Bench {

  /** Deterministic scale-up: multiplier × events-derived turns, new
    * conv/turn ids per replica (pure column arithmetic, seed-free). The
    * result is materialized as splittable parquet so the measured job is
    * scan→pipeline only, like reading a real Iceberg transcript table.
    */
  def materializeTurns(spark: SparkSession, sfDir: String, mult: Int,
                       path: String, partitions: Int): Long = {
    // deterministic content ⇒ reuse an existing materialization: repeated
    // bench runs otherwise fight their own writeback IO for minutes.
    // Reuse is gated on a CONTENT fingerprint (derivation SQL + mult +
    // sfDir), not just row count — count is events×mult regardless of what
    // the derivation emits, so a logic change would silently bench stale
    // data (ADVICE r1).
    val expected = Transcripts.events(spark, sfDir).count() * mult
    // "rep-v1" names THIS function's replication scheme (crossJoin ×mult,
    // conv_id#rep suffix) — bump it when the expansion logic changes.
    // SHA-256, not String.hashCode: a 32-bit hash collision would
    // silently bench stale data (r3 verdict nit)
    val fingerprint = java.security.MessageDigest.getInstance("SHA-256")
      .digest((Transcripts.derivationCte + "|rep-v1|" + mult +
        "|" + sfDir + "|" + partitions).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val fpFile = java.nio.file.Paths.get(path, "_fingerprint")
    // missing fingerprint/table = "not materialized yet" (rebuild); any
    // OTHER failure propagates — swallowing a permissions/corruption error
    // here would mask it behind a silent slow rebuild every run
    val fpMatches =
      java.nio.file.Files.exists(fpFile) &&
        java.nio.file.Files.readString(fpFile).trim == fingerprint
    if (fpMatches) {
      val existing =
        try spark.read.parquet(path).count()
        catch {
          // UNABLE_TO_INFER_SCHEMA = dir exists (the fingerprint proved
          // that) but the data files are gone — rebuild, don't abort
          case e: org.apache.spark.sql.AnalysisException
              if e.getCondition == "PATH_NOT_FOUND" ||
                e.getCondition == "UNABLE_TO_INFER_SCHEMA" => -1L
        }
      if (existing == expected) return existing
    }
    val base = Transcripts.transcripts(spark, sfDir)
    val big = base
      .crossJoin(spark.range(mult).select(col("id").as("rep")))
      .withColumn("conv_id", concat_ws("#", col("conv_id"), col("rep")))
      .drop("rep")
    big.repartition(partitions).write.mode("overwrite").parquet(path)
    java.nio.file.Files.writeString(fpFile, fingerprint)
    spark.read.parquet(path).count()
  }

  /** The measured headline job. */
  def headline(spark: SparkSession, turnsPath: String): Array[(String, Long)] = {
    val turns = spark.read.parquet(turnsPath)
    Pipeline.sinkCounts(Pipeline.route(Pipeline.enrich(
        Pipeline.filterValid(Pipeline.parse(turns)),
        Transcripts.toolDim(spark))))
      .collect().map(r => r.getString(0) -> r.getLong(1))
  }

  def timeIt[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** (total, steal) jiffies from /proc/stat's aggregate cpu line — the
    * co-tenant probe the r3 verdict asked for: the shared box showed a
    * 20% round-over-round headline swing on byte-identical code, and
    * without a contention reading alongside each run such a swing is not
    * attributable at a glance. On bare metal steal stays 0 and the
    * loadavg reading (below) carries the co-tenancy signal instead.
    */
  def procCpu(): (Double, Double) = {
    val line = scala.io.Source.fromFile("/proc/stat").getLines().next()
    val f = line.trim.split("\\s+").drop(1).map(_.toDouble)
    (f.sum, if (f.length > 7) f(7) else 0.0)
  }

  def loadAvg1(): Double =
    scala.io.Source.fromFile("/proc/loadavg").getLines().next()
      .split("\\s+")(0).toDouble

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "100").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- headline: turns/sec on the materialized big table
    val turnsPath = s"target/bench_turns_${sfDir.replaceAll("[^0-9.]", "")}_$mult"
    val nTurns = materializeTurns(spark, sfDir, mult, turnsPath, cpus.toInt * 4)
    headline(spark, turnsPath) // warmup (codegen + footer + page cache)
    // 5 reps with ALL readings reported (r3 verdict item 5): the shared
    // box swings single measurements up to 7×, so the JSON carries the
    // full sample (min = the committed best-of methodology, median +
    // spread = the noise estimate) plus a co-tenancy probe (CPU steal %
    // over the measurement window, 1-min loadavg before/after) so any
    // round-over-round swing is attributable from the artifact alone.
    val headlineReps = sys.env.getOrElse("SPARK_GRAFT_HEADLINE_REPS", "5").toInt
    val loadStart = loadAvg1()
    val (cpu0, steal0) = procCpu()
    val reps = (1 to headlineReps)
      .map(_ => timeIt(headline(spark, turnsPath))._2).sorted
    val (cpu1, steal1) = procCpu()
    val loadEnd = loadAvg1()
    val stealPct =
      if (cpu1 > cpu0) 100.0 * (steal1 - steal0) / (cpu1 - cpu0) else 0.0
    val tHead = reps.min
    val tMedian = reps(reps.length / 2)
    val throughput = nTurns / tHead

    // ---- per-query timings; failures are REPORTED, never swallowed as a
    // fast "-1 rows" timing (a broken query must not bench as fast)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage)
            .getOrElse("").replaceAll("[\"\\\\\\n\\r\\t]", " ").take(120)}")
        }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => "\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = tHead + results.map(_._2).sum
    val repsJson = reps.map(r => f"$r%.3f").mkString("[", ",", "]")
    println(
      f"""{"metric":"parse_route_aggregate_throughput","value":$throughput,"unit":"turns_per_sec","headline_turns":$nTurns,"headline_sec":$tHead,"headline_median_sec":$tMedian%.3f,"headline_reps":$repsJson,"headline_spread":${reps.max / reps.min}%.2f,"steal_pct":$stealPct%.2f,"load_start":$loadStart%.2f,"load_end":$loadEnd%.2f,"total_sec":$total,"queries":$qs,"errors":$errs,"sf":"$sfDir","cpus":$cpus}""")
    spark.stop()
  }
}
