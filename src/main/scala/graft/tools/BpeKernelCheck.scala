package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Differential check: BpeTokenCount kernel vs the aggregate-HOF merge
  * replay it replaced, over the real corpus with the REAL trained merge
  * list plus adversarial rows. Prints MISMATCHES=<n>; 0 = bit-identical.
  */
object BpeKernelCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val real = graft.sources.Transcripts.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val adv = Seq((700001L, ""), (700002L, "!!! ???"), (700003L, "aaaa aaaa aa a"),
      (700004L, "abc123xyz " + ("ab" * 40)), (700005L, "the the the then there"))
      .toDF("doc_id", "text")
    val docs = real.unionByName(adv)
    val merges = graft.operators.TextOps.bpeTrainMerges(docs)
    val pat = "[a-z0-9]+"
    val wrap = (w: org.apache.spark.sql.Column) =>
      regexp_replace(w, "(.)", "|$1|")
    val applied = (w: org.apache.spark.sql.Column) =>
      merges.foldLeft(wrap(w)) { case (r, (a, b)) =>
        call_function("replace", r, lit(s"|$a||$b|"), lit(s"|${a + b}|")) }
    val symCount = (r: org.apache.spark.sql.Column) =>
      ((length(r) - length(translate(r, "|", ""))) / 2).cast("long")
    val words = regexp_extract_all(col("text"), lit(pat), lit(0))
    val hof = aggregate(words, lit(0L), (acc, w) => acc + symCount(applied(w)))
    val joined = docs.select(col("doc_id"), hof.as("a"),
      graft.functions.bpe_token_count(words, merges).as("b"))
    val bad = joined.filter(not(col("a") <=> col("b"))).count()
    println(s"MISMATCHES=$bad rows=${joined.count()}")
    spark.stop()
  }
}
