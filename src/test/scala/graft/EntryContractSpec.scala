package graft

/** Driver-contract guard: every query runs at sf0.001, returns rows (or is
  * a known legitimately-empty case), is deterministic across two runs, and
  * every oracle key exists in queries. Catches alias drift before the
  * driver's DuckDB gate does.
  */
class EntryContractSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  // q5 anti-join may legitimately be tiny at minimal sf; everything else
  // must produce rows
  private val mayBeEmpty = Set("q5_anti_join", "p11_ddl_alter")

  test("oracleSql keys EQUAL queries keys — no query ships without a full oracle") {
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without queries: $orphaned")
    // as of round 2 every query is DuckDB-expressible (arithmetic hash
    // families) — a new rows-only query is a coverage regression
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"queries without oracles: $unoracled")
  }

  test("every query runs at sf0.001, non-empty unless whitelisted, deterministic") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val r1 = fn(spark, sf)
      val rows1 = r1.collect()
      if (!mayBeEmpty(name))
        assert(rows1.nonEmpty, s"$name returned 0 rows at sf0.001")
      val rows2 = fn(spark, sf).collect()
      assert(rows1.map(_.toString).sorted.toSeq ==
        rows2.map(_.toString).sorted.toSeq, s"$name is nondeterministic")
    }
  }

  test("typed Dataset face agrees with the DataFrame pipeline") {
    val ds = graft.sources.Transcripts.typedTurns(spark, sf)
    val users = ds.filter(_.role == "user").count()
    val dfUsers = graft.sources.Transcripts.transcripts(spark, sf)
      .filter(org.apache.spark.sql.functions.col("role") === "user").count()
    assert(users == dfUsers && users > 0)
  }

  test("JSON source round-trip (reference S1 file-source analog)") {
    // the reference tails a JSON file of oplog entries (main.go:229-303);
    // the Spark analog is a schema'd JSON scan of turns
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    val turns = graft.sources.Transcripts.transcripts(spark, sf)
    turns.write.mode("overwrite").json(dir)
    val back = spark.read
      .schema(graft.streaming.TranscriptStream.turnSchema).json(dir)
    assert(back.count() == turns.count())
    val got = Pipeline_sinkCounts(back)
    val want = Pipeline_sinkCounts(turns)
    assert(got == want)
  }

  private def Pipeline_sinkCounts(df: org.apache.spark.sql.DataFrame) = {
    import graft.operators.Pipeline
    Pipeline.sinkCounts(Pipeline.route(Pipeline.enrich(
        Pipeline.filterValid(Pipeline.parse(df)),
        graft.sources.Transcripts.toolDim(spark))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }
}
