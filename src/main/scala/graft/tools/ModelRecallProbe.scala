package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Similarity

/** Dev probe: recall of the model-served IVF-PQ path across training
  * settings (sampleEvery / iters / nProbe / refine) in one session —
  * picks e15/e16's shipped configuration. Not part of the library.
  */
object ModelRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Transcripts.table(spark, sfDir, "embeddings")
      .cache()
    emb.count()
    for {
      kCb <- Seq(16, 32)
      refine <- Seq(3, 6, 10)
    } {
      val model = Similarity.trainAnnModel(emb, sampleEvery = 4, kCb = kCb)
      val r = Similarity.ivfPqModelRecall(emb, model, refine = refine)
        .collect()(0)
      println(s"RESULT kCb=$kCb refine=$refine " +
        s"hits=${r.getLong(0)}/${r.getLong(1)}")
    }
    spark.stop()
  }
}
