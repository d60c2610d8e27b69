package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: time the near-dup ladder's stages separately at a given
  * replication factor to locate nonlinear growth. Not part of the driver
  * contract.
  */
object DocsProbe {
  def main(args: Array[String]): Unit = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_DOCS_MULT", "128").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = s"target/bench_docs_0.1_$mult"
    graft.DocsScalingBench.materializeDocs(spark, "/root/testdata/sf0.1",
      mult, path, 128)
    val docs = spark.read.parquet(path)

    def t(name: String)(f: => Any): Unit = {
      val (_, s) = graft.Bench.timeIt(f)
      println(f"[probe] $name%-28s $s%8.2f s")
    }

    if (sys.env.get("SPARK_GRAFT_PROBE").contains("t11")) {
      // t11 stage decomposition: time each boundary-to-boundary leg the
      // composed pipeline runs, at this parallelism level
      import graft.operators.TextOps
      // same fixed-size eval as the bench's t11 job (production regime)
      val eval = Some(docs.filter(col("doc_id") % mult === 0 &&
        (col("doc_id") / mult) % 29 === 3))
      var red: org.apache.spark.sql.DataFrame = null
      var decon: org.apache.spark.sql.DataFrame = null
      var sp: org.apache.spark.sql.DataFrame = null
      t("gate_redact_ckpt") {
        red = TextOps.redactDocs(TextOps.gateDocs(docs)).localCheckpoint()
      }
      t("decontaminate_ckpt") {
        decon = red.join(TextOps.contaminatedIds(red, eval).localCheckpoint(),
          Seq("doc_id"), "left_anti")
      }
      t("ladder_dedup") {
        sp = TextOps.splitDocs(TextOps.mixDocs(TextOps.dropNearDups(decon),
          lit(100))).localCheckpoint()
      }
      t("pack") {
        TextOps.packSequences(sp, 512, 4, Seq("split", "source"))
          .agg(sum(col("n_tokens")), sum(col("bin")), count(lit(1))).collect()
      }
      t("t11_whole") {
        TextOps.corpusPipeline(docs, evalDocs = eval,
            materialize = _.localCheckpoint())
          .agg(sum(col("n_tokens")), sum(col("bin")), count(lit(1))).collect()
      }
      spark.stop(); return
    }

    t("scan_count")(docs.count())
    t("signatures")(graft.operators.TextOps.minhashSignatures(docs)
      .agg(sum(element_at(col("sig"), 1))).collect())
    t("cand_voted_count")(graft.operators.TextOps
      .minhashCandidatesVoted(docs, 32, 8, 2).count())
    val ladder = graft.operators.TextOps.nearDupLadder(docs)
      .agg(count(lit(1)), sum(col("inter")))
    t("ladder_full")(ladder.collect())
    val plan = ladder.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.finalPhysicalPlan.toString
      case p => p.toString
    }
    println("[probe] join nodes in final ladder plan:")
    plan.linesIterator.filter(l => l.contains("Join") || l.contains("Sort"))
      .foreach(l => println("[probe]   " + l.trim.take(150)))
    spark.stop()
  }
}
