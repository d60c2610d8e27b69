package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Differential check: Sq8Recon kernel vs the HOF transform-CASE forms it
  * replaced (sq8ReconSql / sq8ReconClampedSql), over the real corpus'
  * quantized embeddings with BOTH the true full-corpus bounds and
  * deliberately narrowed bounds (so the clamped path actually clamps and
  * the unclamped path sees out-of-range values), plus adversarial rows
  * (null elements, short vectors, long vectors past the literal arrays,
  * values far outside the bounds). Prints MISMATCHES=<n> per variant;
  * 0 = bit-identical.
  */
object Sq8KernelCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = graft.sources.Transcripts.table(spark, sfDir, "embeddings")
    val real = emb.select(col("vec_id"),
      graft.functions.quantize_vec(col("embedding")).as("qe"))
    val adv = Seq(
      (900001L, Seq[Option[Long]](None, Some(0L), Some(5000L), Some(-5000L))),
      (900002L, Seq[Option[Long]](Some(1L), Some(2L))),
      // no longer-than-64 row: element_at past a literal array errors
      // under ANSI (the HOF reference side), and no real vector exceeds
      // the bounds arrays — the kernel's null is a benign extension
      (900004L, Seq[Option[Long]](Some(Long.MaxValue / 300L),
        Some(Long.MinValue / 300L), Some(123456789L), Some(-987654321L))))
      .toDF("vec_id", "qe")
    val docs = real.unionByName(adv)
    val (mn, mx) = Similarity.sq8Bounds(emb, 64)
    // narrowed bounds: shrink each range toward its midpoint so corpus
    // values land outside — exercises the clamp and the negative-quotient
    // div on both engines
    val mnN = mn.indices.map(i => mn(i) + (mx(i) - mn(i)) / 4).toArray
    val mxN = mn.indices.map(i => mx(i) - (mx(i) - mn(i)) / 4).toArray
    def rg(a: Array[Long], b: Array[Long]): Array[Long] =
      a.indices.map(i => b(i) - a(i)).toArray
    var fail = 0L
    for ((label, lo, hi, clamped) <- Seq(
        ("full_unclamped", mn, mx, false),
        ("full_clamped", mn, mx, true),
        ("narrow_clamped", mnN, mxN, true))) {
      val hof = expr(
        if (clamped) Similarity.sq8ReconClampedSql("qe", lo, hi)
        else Similarity.sq8ReconSql("qe", lo, hi))
      val joined = docs.select(col("vec_id"), hof.as("a"),
        graft.functions.sq8_recon(col("qe"), lo, rg(lo, hi), clamped).as("b"))
      val bad = joined.filter(not(col("a") <=> col("b"))).count()
      val n = joined.count()
      println(s"$label MISMATCHES=$bad rows=$n")
      fail += bad
    }
    spark.stop()
    if (fail > 0) sys.exit(1)
  }
}
