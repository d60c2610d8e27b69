package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Differential check: QuantizeVec kernel vs the HOF
  * transform(round(cast·10⁴)) form it replaced, over the real embeddings
  * corpus plus adversarial rows (exact ±midpoints like ±0.03125 whose
  * ×10⁴ product is exactly n+0.5, zeros, ±1, subnormals). Prints
  * MISMATCHES=<n>; 0 = bit-identical.
  */
object QuantizeKernelCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val real = graft.sources.Transcripts.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val adv = Seq(
      (800001L, Array(0.03125f, -0.03125f, 0.65625f, -0.65625f)),
      (800002L, Array(0f, -0f, 1f, -1f)),
      (800003L, Array(1.4e-45f, -1.4e-45f, 0.12345f, -0.99999f)),
      (800004L, Array(0.00005f, -0.00005f, 0.00015f, -0.00015f)))
      .toDF("vec_id", "embedding")
    val docs = real.unionByName(adv)
    val hof = transform(col("embedding"),
      x => round(x.cast("double") * 10000).cast("long"))
    val joined = docs.select(col("vec_id"), hof.as("a"),
      graft.functions.quantize_vec(col("embedding")).as("b"))
    val bad = joined.filter(not(col("a") <=> col("b"))).count()
    val n = joined.count()
    println(s"MISMATCHES=$bad rows=$n")
    spark.stop()
  }
}
