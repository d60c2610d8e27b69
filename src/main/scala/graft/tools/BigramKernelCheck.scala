package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot differential check: BigramHashPairs kernel vs the HOF
  * poly_hash31(concat_ws)/substring_index form it replaced, over the
  * real corpus at $SPARK_GRAFT_SF_DIR plus adversarial synthetic rows
  * (empty tokens, multi-space, >64-byte tokens, single token, empty
  * text). Prints MISMATCHES=<n>; 0 = bit-identical.
  */
object BigramKernelCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val real = graft.sources.Transcripts.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val adv = Seq(
      (900001L, "a  b   c"), (900002L, " leading"), (900003L, "trailing "),
      (900004L, ""), (900005L, "single"),
      (900006L, ("x" * 100) + " " + ("y" * 100) + " z"),
      (900007L, "a b"), (900008L, "  "), (900009L, "aa " + ("b" * 63) + " cc"))
      .toDF("doc_id", "text")
    val docs = real.unionByName(adv)
    val tokens = split(col("text"), " ")
    val hof = when(size(tokens) >= 2,
      transform(sequence(lit(1), size(tokens) - 1),
        i => concat_ws(" ", element_at(tokens, i), element_at(tokens, i + 1))))
      .otherwise(array().cast("array<string>"))
    val a = docs.select(col("doc_id"), posexplode(hof).as(Seq("i", "bg")))
      .select(col("doc_id"), col("i"),
        graft.functions.poly_hash31(col("bg")).as("f2"),
        graft.functions.poly_hash31(substring_index(col("bg"), " ", 1)).as("f1"))
    val b = docs.select(col("doc_id"),
        posexplode(graft.functions.bigram_hash_pairs(tokens)).as(Seq("i", "p")))
      .select(col("doc_id"), col("i"),
        col("p.f2").as("g2"), col("p.f1").as("g1"))
    val joined = a.join(b, Seq("doc_id", "i"), "full_outer")
    val bad = joined.filter(
      col("f2").isNull || col("g2").isNull ||
      col("f2") =!= col("g2") || col("f1") =!= col("g1")).count()
    val na = a.count(); val nb = b.count()
    println(s"MISMATCHES=$bad rowsA=$na rowsB=$nb")
    spark.stop()
  }
}
