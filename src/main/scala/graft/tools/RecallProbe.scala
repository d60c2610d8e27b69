package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: k-means IVF recall sweep (not part of the driver contract). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      for (nProbe <- Seq(2, 3, 4); iters <- Seq(2, 4)) {
        val r = graft.operators.Similarity
          .ivfKmeansRecall(emb, nProbe = nProbe, iters = iters)
          .collect()(0)
        println(s"[probe] $sf nProbe=$nProbe iters=$iters recall=" +
          s"${r.getLong(0)}/${r.getLong(1)}")
      }
    }
    spark.stop()
  }
}
