package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Two-cluster-size scaling evidence for the EMBEDDINGS/ANN tier — the
  * same N-vs-4N form as ScalingBench (turn pipeline) and DocsScalingBench
  * (text/dedup tier): run the SAME serving-path jobs at local[N] and
  * local[4N] over the SAME materialized table, report throughput at both
  * plus efficiency. Jobs are the training-free LINEAR serving paths (e1
  * brute heap-merge, e3 sign-anchor IVF probe) — the Lloyd's-trained
  * tiers (e6/e9/e13) share these exact probe/score shapes but add
  * driver-side training collects that are subsample-sized constants at
  * 100 TB (see SCALE.md), so benching them would measure training
  * serialization, not the scaled path. The banded candidate tier (d8/e2)
  * is deliberately EXCLUDED: on this synthetic UNIFORM corpus every band
  * bucket collides at a constant rate, so candidate pairs grow as n² —
  * LSH's documented worst case (no cluster structure to separate), not a
  * property of the operator; measured: d8 at 32× vectors runs ~1000× the
  * base corpus time. The banded shape's N-vs-4N evidence comes from the
  * TEXT ladder (DocsScalingBench d7), where the replicated corpus carries
  * real shingle-bucket structure and candidate volume is linear.
  *
  * Replication scheme: every replica applies its own ORTHOGONAL transform
  * — a component rotation by `rep % dim` composed with a deterministic
  * per-(rep, i) sign flip. Within a replica all pairwise dot products are
  * exactly preserved (orthogonal), so the near-dup/cluster structure the
  * jobs traverse is the original's; across replicas the transforms
  * differ, so an original vector's copies land in LSH band buckets only
  * at chance level — candidate volume grows LINEARLY with mult instead
  * of the mult² per-bucket blow-up naive copying would create (the
  * DocsScalingBench token-suffix argument, vector edition). vec_ids
  * remap REP-MAJOR to `vec_id + rep·|src|`, so `vec_id < nQueries`
  * still selects nQueries DISTINCT original vectors (replica 0) — a
  * rep-minor `vec_id·mult + rep` remap would make the query set
  * nQueries transforms of the single original vector 0. Query count is
  * fixed while the corpus grows — the serving regime.
  */
object AnnScalingBench {

  def materializeVecs(spark: SparkSession, sfDir: String, mult: Int,
                      path: String, partitions: Int): Long = {
    val src = sources.Transcripts.table(spark, sfDir, "embeddings")
    val srcCount = src.count()
    val expected = srcCount * mult
    // the fingerprint includes a CONTENT signature of the source table —
    // a (count, sfDir)-only key silently reuses a stale bench table if
    // the source corpus is regenerated with the same row count
    // coalesce: sum() is NULL on an empty source — surface that as a
    // clear require instead of an opaque NPE on getLong (ADVICE r4)
    val contentSig = src
      .agg(coalesce(sum(hash(col("vec_id"), col("embedding"), col("label"))),
        lit(0L)))
      .collect()(0).getLong(0)
    require(expected > 0, s"materializeVecs: empty source table in $sfDir")
    val fingerprint = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"vecs-rep-v2|$mult|$sfDir|$partitions|$contentSig"
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val fpFile = java.nio.file.Paths.get(path, "_fingerprint")
    val fpMatches =
      java.nio.file.Files.exists(fpFile) &&
        java.nio.file.Files.readString(fpFile).trim == fingerprint
    if (fpMatches) {
      val existing =
        try spark.read.parquet(path).count()
        catch {
          case e: org.apache.spark.sql.AnalysisException
              if e.getCondition == "PATH_NOT_FOUND" ||
                e.getCondition == "UNABLE_TO_INFER_SCHEMA" => -1L
        }
      if (existing == expected) return existing
    }
    val dim = size(col("embedding"))
    val big = src
      .crossJoin(spark.range(mult).select(col("id").as("rep")))
      .withColumn("embedding",
        transform(sequence(lit(0), dim - 1), i =>
          (element_at(col("embedding"),
            pmod(i + col("rep"), dim).cast("int") + 1) *
            when(pmod(hash(col("rep"), i), lit(2)) === 0, -1.0f)
              .otherwise(1.0f)).cast("float")))
      .withColumn("vec_id", col("vec_id") + col("rep") * srcCount)
      .drop("rep")
      .select("vec_id", "embedding", "label")
    big.repartition(partitions).write.mode("overwrite").parquet(path)
    java.nio.file.Files.writeString(fpFile, fingerprint)
    spark.read.parquet(path).count()
  }

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      // over-partition + AQE byte-sized coalesce — the DocsScalingBench
      // straggler argument; the band-bucket and probed-cell task sizes
      // are exactly as skewed here
      .config("spark.sql.shuffle.partitions",
        (cpus * sys.env.getOrElse("SPARK_GRAFT_PARTS_MULT", "4").toInt).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  val jobOrder: Seq[String] =
    Seq("e1_brute_agg", "e3_ivf", "e15_ivfpq_model", "e26_sq8_model",
      "e28_ivfpq_codes")

  /** Aggregates over the ops' OUTPUT columns pin every stage into the
    * executed plan (the DocsScalingBench count()-pruning lesson); fresh
    * DataFrames per rep so shuffle outputs are never reused across reps.
    */
  def jobs(vecs: DataFrame,
           model: Option[operators.Similarity.AnnModel],
           codes: Option[DataFrame] = None): Seq[(String, () => Any)] = Seq(
    // one corpus pass, heap-merge top-k: the broadcast-queries × corpus
    // scoring shape every exact tier shares — scales with corpus volume
    "e1_brute_agg" -> (() => operators.Similarity.knnBruteAgg(vecs)
      .agg(sum(col("dot")), count(lit(1))).collect()),
    // sign-anchor IVF (training-free): in-row cell assignment, broadcast
    // probes, exact dots inside probed cells (~19% scan fraction)
    "e3_ivf" -> (() => operators.Similarity.knnIvf(vecs)
      .agg(sum(col("dot")), count(lit(1))).collect())
  ) ++ model.map { mdl =>
    // the TRAINED serving path (r4 verdict item 1): IVF-PQ served from a
    // persisted model trained ONCE during prep on a fixed-size subsample
    // — the timed job runs ZERO Lloyd's (in-row assignment + codes
    // against literal centroids/codebooks, ADC in probed cells, exact
    // re-rank). This is the lane the per-query-training e6/e9/e13 family
    // could never expose: serving-only, like a 10⁹-vector deployment.
    "e15_ivfpq_model" -> (() =>
      operators.Similarity.knnIvfPqModel(vecs, mdl)
        .agg(sum(col("dot")), count(lit(1))).collect())
  } ++ model.map { mdl =>
    // the 8-bit rung served from the SAME artifact (v2 bounds): e1's
    // broadcast-queries full-scan shape with the corpus side carrying
    // clamped reconstructions — zero aggregates at serve time
    "e26_sq8_model" -> (() =>
      operators.Similarity.knnSq8Model(vecs, mdl)
        .agg(sum(col("dot")), count(lit(1))).collect())
  } ++ (for (mdl <- model; cds <- codes) yield
    // the INGEST-ENCODED serving lane (the production IVF-PQ read path):
    // codes materialize once in prep (untimed, like the corpus and the
    // model), the timed job is ONE pass over 4-byte codes + cell ints
    // (ADC inside probed cells, heap-merge) + a late-materialized exact
    // re-rank that quantizes only candidate rows — vs e15's three heavy
    // corpus passes (per-query re-encode, ADC over it, quantize-all
    // re-rank). This is the lane that isolates serving bandwidth from
    // re-encode compute.
    "e28_ivfpq_codes" -> (() =>
      operators.Similarity.knnIvfPqCodes(cds, vecs, mdl)
        .agg(sum(col("dot")), count(lit(1))).collect()))

  private def measure(cpus: Int, path: String, reps: Int, only: Set[String],
                      model: Option[operators.Similarity.AnnModel],
                      codesPath: Option[String])
      : Map[String, Double] = {
    val spark = session(cpus)
    try {
      val vecs = spark.read.parquet(path)
      val codes = codesPath.map(spark.read.parquet)
      jobs(vecs, model, codes).filter(j => only.contains(j._1)).map { case (name, job) =>
        System.err.println(s"[ann-bench] local[$cpus] $name warmup...")
        val (_, w) = Bench.timeIt(job()) // warmup (codegen + page cache)
        System.err.println(f"[ann-bench] local[$cpus] $name warmup $w%.1fs")
        name -> (1 to reps).map(_ => Bench.timeIt(job())._2).min
      }.toMap
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // 512 × sf0.1 vectors = 2.56M: same serial-overhead floor argument
    // as DocsScalingBench — below ~10 s per job at 4N the reading is
    // scheduling noise, not scaling
    val mult = sys.env.getOrElse("SPARK_GRAFT_VECS_MULT", "512").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "8").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val only = sys.env.get("SPARK_GRAFT_JOBS")
      .map(_.split(",").map(_.trim).toSet).getOrElse(jobOrder.toSet)
    val unknown = only -- jobOrder.toSet
    require(unknown.isEmpty,
      s"SPARK_GRAFT_JOBS names unknown jobs: ${unknown.mkString(",")} " +
        s"(valid: ${jobOrder.mkString(",")})")
    val n4 = n * 4

    // partition count in the directory name — same stale-regeneration
    // guard as DocsScalingBench (ADVICE r4)
    val path =
      s"target/bench_vecs_${sfDir.replaceAll("[^0-9.]", "")}_${mult}_p${n4 * 4}"
    val prep = session(n4)
    val (nVecs, model, codesPath) =
      try {
        val count = materializeVecs(prep, sfDir, mult, path, n4 * 4)
        // train the e15 serving model ONCE (prep, untimed) on a capped
        // subsample of the materialized corpus — sampleEvery scales so
        // training stays ~50k vectors at ANY mult, the fixed-cost-train
        // posture of SCALE.md. annModelFor persists + round-trips the
        // artifact, so N and 4N serve from the SAME persisted model.
        val modelJobs = Set("e15_ivfpq_model", "e26_sq8_model",
          "e28_ivfpq_codes")
        val mdl = if (only.exists(modelJobs)) {
          val se = math.max(4, (count / 50000L).toInt)
          Some(operators.Similarity.annModelFor(prep.read.parquet(path),
            "target/ann_model", sampleEvery = se))
        } else None
        // materialize the ingest-encoded codes table ONCE (prep,
        // untimed — at 10⁹ vectors this runs at add() time, not per
        // query); fingerprint-keyed like the model, so N and 4N read
        // the SAME persisted codes.
        val cp = for (m <- mdl if only.contains("e28_ivfpq_codes")) yield
          operators.Similarity.codesPathFor(prep.read.parquet(path), m,
            "target/ann_model_codes")
        (count, mdl, cp)
      } finally prep.stop()

    val tN = measure(n, path, reps, only, model, codesPath)
    val tN4 = measure(n4, path, reps, only, model, codesPath)
    val perJob = jobOrder.filter(only.contains).map { name =>
      val thN = nVecs / tN(name)
      val thN4 = nVecs / tN4(name)
      val eff = (thN4 / thN) / 4.0
      name -> (tN(name), tN4(name), thN, thN4, eff)
    }
    val effMin = perJob.map(_._2._5).min
    val jobsJson = perJob.map { case (name, (sN, sN4, thN, thN4, eff)) =>
      f""""$name":{"sec_n":$sN%.3f,"sec_n4":$sN4%.3f,"tput_n":$thN%.0f,"tput_n4":$thN4%.0f,"eff":$eff%.3f}"""
    }.mkString("{", ",", "}")
    println(
      f"""{"metric":"ann_scaling_efficiency","value":$effMin%.3f,"unit":"ratio","n_cpus":$n,"n4_cpus":$n4,"vecs":$nVecs,"jobs":$jobsJson,"sf":"$sfDir","mult":$mult}""")
  }
}
