package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Pipeline
import graft.sources.Transcripts

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a same-named DuckDB oracle in `oracleSql`
  * unless the op is not SQL-expressible (then the driver records a weaker
  * rows-only check). Column names/aliases match pairwise — the driver's
  * compare sorts columns by name before hashing.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Transcripts.table(s, dir, name)

  /** Monotonic suffix for q22's temp view (see the query's comment). */
  private val q22ViewSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** t16's fixed probe query — terms of varying corpus frequency. */
  private val Bm25Terms = Seq("vector", "hash", "spark", "dup")

  /** Where e15/e16's persisted ANN model artifacts live (fingerprint-keyed
    * subdirs, so corpora/settings coexist; see Similarity.annModelFor).
    */
  private val AnnModelDir =
    sys.env.getOrElse("SPARK_GRAFT_MODEL_DIR", "target/ann_model")

  private val BpeModelDir =
    sys.env.getOrElse("SPARK_GRAFT_BPE_MODEL_DIR", "target/bpe_model")

  private val DedupIndexDir =
    sys.env.getOrElse("SPARK_GRAFT_DEDUP_INDEX_DIR", "target/dedup_index")

  /** Parsed+filtered transcript turns — the pipeline front half. text is
    * dropped so query outputs keep the oracle-matched column set.
    */
  private def valid(s: SparkSession, dir: String): DataFrame =
    Pipeline.filterValid(Pipeline.parse(Transcripts.transcripts(s, dir)))
      .drop("text")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full parse→enrich→route→aggregate pipeline.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Pipeline.sinkCounts(Pipeline.route(
      Pipeline.enrich(valid(spark, dir), Transcripts.toolDim(spark))))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------- core pipeline (SURVEY §2)
    "p1_parse" -> ((s, dir) => valid(s, dir)),
    "p2_filter_counts" -> ((s, dir) =>
      valid(s, dir).groupBy(col("op")).agg(count(lit(1)).as("n"))),
    "p3_enrich" -> ((s, dir) =>
      Pipeline.enrich(valid(s, dir), Transcripts.toolDim(s))
        .groupBy(col("tool_kind"))
        .agg(count(lit(1)).as("n"), countDistinct(col("tool")).as("n_tools"))),
    "p4_route_counts" -> ((s, dir) =>
      Pipeline.sinkCounts(Pipeline.route(
        Pipeline.enrich(valid(s, dir), Transcripts.toolDim(s))))),
    "p5_render_insert" -> ((s, dir) => Pipeline.renderInsertDynamic(valid(s, dir))),
    "p6_render_update" -> ((s, dir) => Pipeline.renderUpdateDynamic(valid(s, dir))),
    "p7_render_delete" -> ((s, dir) => Pipeline.renderDeleteDynamic(valid(s, dir))),
    "p8_flatten_children" -> ((s, dir) => Pipeline.flattenChildren(valid(s, dir))),
    "p16_child_inserts" -> ((s, dir) =>
      Pipeline.renderChildInsertsDynamic(valid(s, dir))),
    "p9_ddl_schemas" -> ((s, dir) =>
      Pipeline.ddlCreateSchemas(Pipeline.parse(Transcripts.transcripts(s, dir)))),
    "p10_ddl_tables" -> ((s, dir) => Pipeline.ddlCreateTablesDynamic(valid(s, dir))),
    "p11_ddl_alter" -> ((s, dir) => Pipeline.ddlAlterTablesDynamic(valid(s, dir))),
    "p12_transitions" -> ((s, dir) =>
      Pipeline.turnTransitions(Transcripts.transcripts(s, dir))),
    "p13_dead_letter" -> ((s, dir) =>
      Pipeline.rejects(Pipeline.parse(Transcripts.transcripts(s, dir)))
        .groupBy(col("op")).agg(count(lit(1)).as("n"))),
    "p14_sessionize" -> ((s, dir) =>
      Pipeline.sessionize(Transcripts.transcripts(s, dir))),
    // the p-tier composed flagship (t11's role on the pipeline side):
    // parse -> filter -> broadcast enrich -> route -> sessionize ->
    // per-sink rollup, ONE query with a chained-CTE oracle. Session
    // boundaries are computed over the routed relation (post-filter,
    // post-enrich) so the rollup counts sessions each sink touches.
    "p17_pipeline_rollup" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val routed = Pipeline.route(
        Pipeline.enrich(valid(s, dir), Transcripts.toolDim(s)))
      val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
      val gap = unix_timestamp(col("ts")) -
        unix_timestamp(lag(col("ts"), 1).over(w))
      routed
        .withColumn("boundary", when(gap.isNull || gap > 1800, 1)
          .otherwise(0))
        .withColumn("session_id", sum(col("boundary"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("sink"))
        .agg(count(lit(1)).as("n_turns"),
          countDistinct(col("conv_id")).as("n_convs"),
          countDistinct(col("tool")).as("n_tools"),
          countDistinct(col("conv_id"), col("session_id"))
            .as("n_sessions"))
    }),
    "p15_resume_filter" -> ((s, dir) =>
      valid(s, dir)
        .filter(col("ts") > lit("2024-01-16 00:00:00").cast("timestamp"))
        .groupBy(col("op"))
        .agg(count(lit(1)).as("n"), max(col("ts")).as("max_ts"),
          min(col("ts")).as("min_ts"))),
    // --------------------------------------- relational coverage (SURVEY §2.7)
    "q1_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val dec = (c: String) => col(c).cast("decimal(18,2)")
      li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(BigDecimal(1)) - dec("l_discount")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
    }),
    "q2_join_broadcast" -> ((s, dir) => {
      // two broadcast hash joins: dims are tiny at ANY scale — zero
      // shuffle of the fact side
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_bal"))
    }),
    "q3_join_shuffle" -> ((s, dir) => {
      // fact-fact shuffle hash join on orderkey; AQE picks the strategy
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      o.join(li, o("o_orderkey") === li("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          sum((col("l_extendedprice").cast("decimal(18,2)")
            * (lit(BigDecimal(1)) - col("l_discount").cast("decimal(18,2)"))))
            .cast("double").as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
    }),
    "q4_semi_join" -> ((s, dir) => {
      // EXISTS as left_semi: no payload columns of the right side move
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 100000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    }),
    "q5_anti_join" -> ((s, dir) => {
      // NOT EXISTS as left_anti (delete-analog materialization, SURVEY T5)
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),
    "q6_window_rank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rnk"))
    }),
    "q7_setops" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.filter(year(col("o_orderdate")) === 1994)
        .select(col("o_custkey")).distinct()
      val b = o.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey")).distinct()
      a.except(b).withColumn("tag", lit("only_1994"))
        .unionByName(a.intersect(b).withColumn("tag", lit("both")))
        .unionByName(b.except(a).withColumn("tag", lit("only_f")))
    }),
    "q8_rollup" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_bal"))
    }),
    "q9_topk" -> ((s, dir) =>
      // global top-k = per-partition top-k then merge (TakeOrderedAndProject)
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),
    "q10_distinct_agg" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"),
          max(col("o_totalprice")).as("max_price"))),
    "q11_datetime" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          max(hour(col("ts"))).as("max_hour"),
          min(month(col("ts"))).as("min_month"))),
    "q12_strings" -> ((s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        length(col("c_name")).as("len"),
        reverse(col("c_name")).as("rname"),
        translate(col("c_name"), "aeiou", "AEIOU").as("tname"),
        levenshtein(col("c_name"), reverse(col("c_name"))).as("lev"))),
    "q13_outer_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val a = o.filter(year(col("o_orderdate")) === 1994)
        .select(col("o_custkey").as("k")).distinct()
        .withColumn("in_1994", lit(1))
      val b = c.filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("k")).distinct()
        .withColumn("in_neg", lit(1))
      a.join(b, Seq("k"), "full_outer")
        .select(col("k"), coalesce(col("in_1994"), lit(0)).as("in_1994"),
          coalesce(col("in_neg"), lit(0)).as("in_neg"))
    }),
    "q19_session_window" -> ((s, dir) =>
      // built-in gap-based session windows (vs Pipeline.sessionize's
      // manual lag+cumsum form, p14). Boundary semantics differ at exactly
      // gap: session_window is end-EXCLUSIVE (an event arriving exactly
      // 30 min later starts a NEW session) while p14's lag-gap form keeps
      // `gap > 1800` in-session — the oracle mirrors each form's own rule
      Transcripts.transcripts(s, dir)
        .groupBy(col("conv_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_turns"))
        .select(col("conv_id"),
          col("session_window.start").as("win_start"),
          col("session_window.end").as("win_end"), col("n_turns"))),
    "q14_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))),
    "q15_range_join" -> ((s, dir) => {
      // range join: same-user event pairs within 60s, in the TIME-BUCKET
      // form — a plain equi-join on user_id compares every same-user pair
      // (quadratic in a hot user's event count); bucketing ts to the range
      // width and probing (bucket, bucket+1) bounds comparisons to
      // per-(user, 2-minute) groups. Each qualifying pair matches exactly
      // one probed bucket, so no dedup is needed; the residual predicate
      // keeps the semantics identical to the naive form.
      val e = t(s, dir, "events")
      val bkt = floor(unix_timestamp(col("ts")) / 60)
      val a = e.select(col("event_id").as("id1"), col("user_id"),
        col("ts").as("ts1"), explode(array(bkt, bkt + 1)).as("bk"))
      val b = e.select(col("event_id").as("id2"), col("user_id").as("u2"),
        col("ts").as("ts2"), bkt.as("bk2"))
      a.join(b, col("user_id") === col("u2") && col("bk") === col("bk2") &&
          col("id1") < col("id2") && col("ts2") >= col("ts1") &&
          col("ts2") <= col("ts1") + expr("INTERVAL 60 SECONDS"))
        .select(col("user_id"), col("id1"), col("id2"))
    }),
    "q16_asof" -> ((s, dir) => {
      // as-of: each event joined to the user's most recent prior-or-same
      // 'signup' — expressed as a window (no join needed when the as-of
      // source is the same stream)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      t(s, dir, "events")
        .withColumn("last_signup_id",
          last(when(col("event_type") === "signup", col("event_id")), true).over(w))
        .select(col("event_id"), col("user_id"), col("last_signup_id"))
    }),
    "q20_asof_join" -> ((s, dir) => {
      // TWO-TABLE as-of join (facts as-of a dimension-history table) in the
      // union-merge form: tag both sides, one shuffle on the key, window
      // last(ignoreNulls) carries the most recent history row forward. No
      // range join, no cartesian — the scalable as-of shape (q16 is the
      // same-stream window form). History deduped per (user, ts) by max
      // event_id so ties are deterministic, matching DuckDB ASOF JOIN.
      import org.apache.spark.sql.expressions.Window
      val e = t(s, dir, "events")
      val hist = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts")).agg(max(col("event_id")).as("h_id"))
      val facts = e.select(col("user_id"), col("ts"), col("event_id"),
        lit(1).as("tag"), lit(null).cast("long").as("h_id"))
      val h = hist.select(col("user_id"), col("ts"),
        lit(null).cast("long").as("event_id"), lit(0).as("tag"), col("h_id"))
      // history sorts BEFORE facts at equal ts (tag 0 < 1) — an as-of match
      // at exactly ts is visible, mirroring ASOF's h.ts <= e.ts
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("tag"))
        .rowsBetween(Window.unboundedPreceding, 0)
      facts.unionByName(h)
        .withColumn("last_signup_id", last(col("h_id"), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("event_id"), col("user_id"), col("last_signup_id"))
    }),
    // fill scoped to the pivot VALUE columns — an unscoped fill would
    // also rewrite a NULL user_id group key to 0, diverging from the
    // oracle's NULL group
    "q17_pivot" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "view", "purchase", "signup", "error"))),
    "q18_percentile" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          percentile_approx(col("value"), lit(0.5), lit(1000000)).as("p50_approx"),
          expr("percentile(value, 0.5)").as("p50_exact"),
          min(col("value")).as("vmin"), max(col("value")).as("vmax"))),
    // correlated scalar subquery — Catalyst decorrelates the per-user
    // min(ts) into an aggregate + join (RewriteCorrelatedScalarSubquery);
    // min, not avg: double-avg accumulation order differs cross-engine
    "q22_correlated" -> ((s, dir) => {
      // unique view name per invocation: a fixed name mutates shared
      // session state and collides if queries ever run concurrently in
      // one session (r3 verdict nit)
      val vn = s"ev_q22_${q22ViewSeq.incrementAndGet()}"
      t(s, dir, "events").createOrReplaceTempView(vn)
      s.sql(s"""
        SELECT e.user_id, count(*) AS n_later
        FROM $vn e
        WHERE e.ts > (SELECT min(i.ts) FROM $vn i
                      WHERE i.user_id = e.user_id)
        GROUP BY e.user_id""")
    }),
    // explicit GROUPING SETS beyond rollup/cube (q8/q14), with grouping()
    // flags so a NULL group key and a subtotal row stay distinguishable
    // cross-engine; one shuffle, Expand feeds the same two-phase hash agg
    "q23_grouping_sets" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_type"), (col("user_id") % 7).as("bucket"),
          col("value"))
      ev.groupingSets(
          Seq(Seq(col("event_type"), col("bucket")),
            Seq(col("event_type")), Seq.empty),
          col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"),
          grouping(col("event_type")).cast("int").as("g_et"),
          grouping(col("bucket")).cast("int").as("g_b"))
    }),
    // RANGE-frame analytic window: per-user sliding 1-hour event-time sum
    // — the value-based frame (vs q6's row-based rank). The frame key is
    // epoch MICROseconds, so the boundary is exact at the data's full
    // timestamp precision and matches DuckDB's INTERVAL arithmetic
    // digit-for-digit (an epoch-seconds cast would truncate sub-second
    // timestamps into the wrong frame); RANGE includes ts-ties in both
    // engines, so the running sum is deterministic under tie reordering.
    "q24_range_frame" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts").cast("timestamp")))
        .rangeBetween(-3600L * 1000000L, 0L)
      t(s, dir, "events").select(col("event_id"), col("user_id"),
        sum(col("value").cast("decimal(18,2)")).over(w).cast("double")
          .as("hour_sum"),
        count(lit(1)).over(w).cast("long").as("hour_n"))
    }),
    // forward-fill gap-fill: synthetic sensor dropout nulls every 7th
    // reading, then last-non-null carries forward per user in
    // (ts, event_id) order — the IGNORE NULLS analytic over a bounded
    // per-user frame (per-key streams, no global sort; q24's decimal
    // cast keeps the carried value cross-engine exact)
    "q25_gap_fill" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("v", when(col("event_id") % 7 === 0, lit(null))
          .otherwise(col("value").cast("decimal(18,2)")))
        .select(col("event_id"), col("user_id"), col("ts"),
          last(col("v"), ignoreNulls = true).over(w).cast("double")
            .as("filled"))
    }),
    // unpivot (melt) — the q17 matrix back to long form; the oracle is
    // the direct GROUP BY, so pivot→unpivot round-trips exactly (the
    // n > 0 filter drops the fill-zeros pivot fabricated)
    "q21_unpivot" -> ((s, dir) => {
      val kinds = Seq("click", "view", "purchase", "signup", "error")
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", kinds)
        .agg(count(lit(1))).na.fill(0L, kinds)
        .unpivot(Array(col("user_id")), kinds.map(col).toArray,
          "event_type", "n")
        .filter(col("n") > 0)
    }),
    // ------------------------------ training-data ops (documents/embeddings)
    "d1_dedup_exact" -> ((s, dir) =>
      operators.TextOps.exactDedup(t(s, dir, "documents"))),
    "d2_dedup_minhash" -> ((s, dir) =>
      operators.TextOps.minhashCandidates(t(s, dir, "documents"))),
    "d3_dedup_simhash" -> ((s, dir) =>
      operators.TextOps.simhashPairs(t(s, dir, "documents"))),
    "d4_ngram_jaccard" -> ((s, dir) =>
      operators.TextOps.ngramJaccardPairs(t(s, dir, "documents"))),
    "d6_dedup_embedding" -> ((s, dir) =>
      operators.Similarity.embeddingNearDupPairs(t(s, dir, "embeddings"))),
    "d7_neardup_ladder" -> ((s, dir) =>
      operators.TextOps.nearDupLadder(t(s, dir, "documents"))),
    // character-level verify rung: same banded candidates, bounded
    // Levenshtein instead of shingle Jaccard — catches typo/OCR-noise
    // boilerplate whose every overlapping 3-gram differs
    "d16_editdist_pairs" -> ((s, dir) =>
      operators.TextOps.editDistancePairs(t(s, dir, "documents"))),
    // governance attribution: verified near-dup pair counts per
    // unordered source pair — the exact-count sibling of d10's KMV
    // containment estimates
    "d17_source_dup_matrix" -> ((s, dir) =>
      operators.TextOps.sourceDupMatrix(t(s, dir, "documents"))),
    // typo-family clusters: the d11 components engine over d16's
    // character-level verified relation
    "d18_editdist_clusters" -> ((s, dir) =>
      operators.TextOps.editDistClusters(t(s, dir, "documents"))),
    // the THIRD blocking strategy (after LSH and SimHash bands):
    // sorted-neighborhood — global rank with no global sort (t20's
    // machinery), rank-adjacency window, bounded-Levenshtein verify
    "d19_sorted_neighbors" -> ((s, dir) =>
      operators.TextOps.sortedNeighborPairs(t(s, dir, "documents"))),
    // sub-document boilerplate dedup: content-defined chunk boundaries
    // (rolling-hash ≡ 0 mod divisor), cross-doc duplicated chunks —
    // insertion-robust where fixed-size blocks are not
    "d20_cdc_chunks" -> ((s, dir) =>
      operators.TextOps.cdcDupChunks(t(s, dir, "documents"))),
    // the gate a curation pass derives from d20: per-doc character mass
    // in cross-doc duplicated chunks, keep iff boilerplate < 1/2
    "d21_cdc_boilerplate" -> ((s, dir) =>
      operators.TextOps.cdcBoilerplateGate(t(s, dir, "documents"))),
    // transitive dup clusters: iterative hash-to-min connected components
    // over the ladder's verified pairs — DuckDB checks the fixpoint with
    // an independent recursive-CTE transitive closure
    "d11_dup_clusters" -> ((s, dir) =>
      operators.TextOps.dupClusters(t(s, dir, "documents"))),
    // same clustering through the O(log n)-round star-contraction engine
    // (diameter-proof: a chain-shaped dup graph converges where min-label
    // propagation would hit its iteration guard); label contract is
    // identical — component minimum — so the same recursive-CTE oracle
    // checks both engines
    "d13_dup_clusters_star" -> ((s, dir) =>
      operators.TextOps.dupClusters(t(s, dir, "documents"),
        components = operators.TextOps.starContractComponents(_, _))),
    // integer-exact BM25 top-k keyword retrieval (fixed query, the
    // curation-stack search primitive); TakeOrderedAndProject top-k
    "t16_bm25" -> ((s, dir) =>
      operators.TextOps.bm25TopK(t(s, dir, "documents"), Bm25Terms)),
    // incremental (crawl-cadence) dedup: the doc_id%5==0 slice is the
    // "new batch", the rest the existing corpus whose banded index it is
    // verdicted against — per-batch cost O(batch + candidates), corpus
    // never re-paired with itself
    "d12_incremental_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      operators.TextOps.incrementalDedup(
        d.filter(col("doc_id") % 5 =!= 0), d.filter(col("doc_id") % 5 === 0))
    }),
    // d12 probing the PERSISTED band-index artifact (index once per
    // crawl, probe every batch — the dedup STORE posture): first call
    // builds + persists (doc_id, band, bucket), later calls (and runs)
    // probe the parquet relation; verify point-reads corpus text for
    // candidates only. Oracle = d12's verbatim (identical semantics)
    "d22_incremental_indexed" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val corpus = d.filter(col("doc_id") % 5 =!= 0)
      operators.TextOps.incrementalDedupIndexed(corpus,
        operators.TextOps.dedupIndexFor(corpus, DedupIndexDir),
        d.filter(col("doc_id") % 5 === 0))
    }),
    "d5_fingerprint" -> ((s, dir) =>
      // the cross-engine fingerprint tier (poly_hash31 / simhash_poly);
      // rolling_hash + simhash64 stay as the 61/64-bit production exprs
      t(s, dir, "documents").select(col("doc_id"),
        graft.functions.poly_hash31(col("text")).as("rhash"),
        graft.functions.simhash_poly(split(col("text"), " ")).as("simhash"))),
    "t1_lang_id" -> ((s, dir) =>
      operators.TextOps.langId(t(s, dir, "documents"))),
    "t2_quality_counts" -> ((s, dir) =>
      operators.TextOps.qualityCounts(t(s, dir, "documents"))),
    "t3_token_count" -> ((s, dir) =>
      operators.TextOps.tokenCounts(t(s, dir, "documents"))),
    "t4_split" -> ((s, dir) =>
      operators.TextOps.deterministicSplit(t(s, dir, "documents"))),
    "t5_chunks" -> ((s, dir) =>
      operators.TextOps.chunkTokens(t(s, dir, "documents"))),
    "t7_source_filter" -> ((s, dir) =>
      operators.TextOps.sourceFilter(t(s, dir, "documents"))),
    "t8_rep_signal" -> ((s, dir) =>
      operators.TextOps.repetitionSignal(t(s, dir, "documents"))),
    // mixing config for the driver query: even-numbered sources kept in
    // full, odd-numbered downsampled to 25% (mirrored in the oracle SQL)
    "t9_data_mix" -> ((s, dir) =>
      operators.TextOps.weightedSample(t(s, dir, "documents"),
        when(regexp_extract(col("source"), "([0-9]+)", 1).cast("int") % 2
          === 0, lit(100)).otherwise(lit(25)))),
    "t10_seq_pack" -> ((s, dir) =>
      operators.TextOps.packSequences(t(s, dir, "documents"))),
    // eval-set leakage guard: 3-gram overlap vs a deterministic eval
    // carve-out (oracle stand-in for the benchmark-sized production
    // suite); broadcast eval shingle set, n_sh in-row, corpus never
    // the shuffled side
    "t12_decontaminate" -> ((s, dir) =>
      operators.TextOps.decontaminate(t(s, dir, "documents"))),
    // production decon: N suites, one corpus pass, per-suite
    // attribution in a dense (doc x suite) grid
    "t33_multisuite_decon" -> ((s, dir) =>
      operators.TextOps.multiSuiteDecon(t(s, dir, "documents"))),
    // C4 cleaning pass (Raffel et al. 2020 §2.2) over the deterministic
    // line-structured rendering (synthesizeLines — the m-tier generator
    // pattern: flat synthetic docs have no lines/punctuation, so the
    // generator is what gives the line gate test power)
    "t34_c4_rules" -> ((s, dir) =>
      operators.TextOps.c4Rules(
        operators.TextOps.synthesizeLines(t(s, dir, "documents")))),
    // FUZZY decontamination: MinHash-banded train-vs-eval collisions,
    // exact-Jaccard ≥ 1/2 verified on candidates only — length-robust
    // (fraction verdict, not t12's absolute hit count) and attributing
    // (contaminated_by names the leaking eval doc)
    "d14_fuzzy_decon" -> ((s, dir) =>
      operators.TextOps.fuzzyDecon(t(s, dir, "documents"))),
    // repeated-n-gram coverage (Lee et al. exact-substring dedup at the
    // n-gram granularity): per-doc share of corpus-duplicated shingles;
    // shingles cross exchanges as longs, one df count + one per-doc agg
    "t23_ngram_coverage" -> ((s, dir) =>
      operators.TextOps.ngramCoverage(t(s, dir, "documents"))),
    // longest duplicated-shingle RUN (span-level t23): positional
    // shingles flagged by corpus df, gaps-and-islands over consecutive
    // flagged positions — the n-gram stand-in for suffix-array
    // longest-duplicated-substring
    "d15_dup_run" -> ((s, dir) =>
      operators.TextOps.dupRunLength(t(s, dir, "documents"))),
    // cluster-aware split: t4's hash rule keyed on d11's dup-cluster
    // label, so near-dup families never straddle train/val/test
    "t24_cluster_split" -> ((s, dir) =>
      operators.TextOps.clusterSplit(t(s, dir, "documents"))),
    // bigram LM quality (CCNet/KenLM posture): quantized conditional
    // nll under the corpus bigram model — bigrams shuffle as longs
    "t25_bigram_lm" -> ((s, dir) =>
      operators.TextOps.bigramLmQuality(t(s, dir, "documents"))),
    // CCNet terciles under the BIGRAM LM (perplexity, not unigram
    // rarity): head = LOW-nll tercile — flipped comparisons vs t21
    "t31_perplexity_buckets" -> ((s, dir) =>
      operators.TextOps.perplexityBuckets(t(s, dir, "documents"))),
    // min-count-pruned bigram LM: the model tables keep only the heavy
    // head (count >= 3) and BROADCAST — the doc-bigram explode is never
    // shuffled (vs t25's two shuffle joins); pruned entries score as
    // unseen. The production form at corpus scale, where the unpruned
    // bigram table is the largest text-tier exchange.
    "t29_bigram_pruned" -> ((s, dir) =>
      operators.TextOps.bigramLmQuality(t(s, dir, "documents"),
        minCount = 3L)),
    // trained BPE (Sennrich 2016): 12 merges learned on the distinct-word
    // count table (one vocab-sized aggregate + 1-row collect per round),
    // then applied in-row per doc — the real-tokenizer upgrade of t3's
    // regex approximation; the oracle unrolls the same merge rounds
    "t26_bpe_tokens" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      operators.TextOps.bpeTokenCounts(d,
        operators.TextOps.bpeTrainMerges(d))
    }),
    // tokenizer-fertility gate: trained-BPE tokens per 1000 chars, kept
    // within ±25% of the corpus mean — the tokenizer-fit junk screen
    // (base64/wrong-script text explodes, degenerate repetition
    // collapses); corpus-relative so no tokenizer-specific constant
    "t36_bpe_fertility" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      operators.TextOps.bpeFertilityGate(d,
        operators.TextOps.bpeTrainMerges(d))
    }),
    // the same gate served from the PERSISTED tokenizer artifact with
    // ZERO training jobs (train-once/serve-many, the e15 posture for
    // the tokenizer tier): first call trains + persists merges + the
    // corpus-mean fertility, every later call (and RUN) loads ~KBs.
    // Oracle is t36's verbatim — the artifact reconstructs the same
    // deterministic merges, so model-served stays hash-exact
    "t37_fertility_model" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val m = operators.TextOps.bpeModelFor(d, BpeModelDir)
      operators.TextOps.bpeFertilityScoreInRow(d, m.merges, m.meanFertX1k)
    }),
    // KMV distinct-count sketch: the ESTIMATE is integer-exact
    // cross-engine, so even the approximation is hash-checked
    "d9_kmv_distinct" -> ((s, dir) =>
      operators.TextOps.kmvDistinct(t(s, dir, "documents"))),
    // deterministic ~k-per-source sample: MinK thresholds broadcast
    // back as a per-row filter — no per-source sort/window anywhere.
    // k=10 < the 25 docs/source at sf0.01, so the threshold filter
    // actually downselects at every driver scale
    "t13_sample_source" -> ((s, dir) =>
      operators.TextOps.samplePerSource(t(s, dir, "documents"), k = 10)),
    // per-source TOKEN-budget sample (mixture weights in tokens, not
    // docs): bucketed hash histogram + driver cumsum classifies buckets,
    // only the ONE boundary bucket per source enters the exact window —
    // budget 600 ≈ half a source's token mass at sf0.01, so both the
    // fully-kept and the boundary path carry rows at driver scale
    "t18_token_budget" -> ((s, dir) =>
      operators.TextOps.tokenBudgetSample(t(s, dir, "documents"))),
    // t18's budget measured in TRAINED-tokenizer tokens (the t26
    // artifact consumed downstream): budget 3000 ≈ the same kept
    // fraction as t18's 600 whitespace tokens, since 12-merge BPE
    // splits each word into ~4-5 surviving symbols
    "t30_bpe_budget" -> ((s, dir) =>
      operators.TextOps.bpeBudgetSample(t(s, dir, "documents"))),
    // t30 served from the PERSISTED tokenizer artifact (zero training
    // jobs — the second consumer of the t37 model, proving the artifact
    // is a shared asset, not a per-query convenience); t30's oracle
    // verbatim since the artifact reconstructs the same merges
    "t38_budget_model" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val m = operators.TextOps.bpeModelFor(d, BpeModelDir)
      operators.TextOps.tokenBudgetSample(d, budget = 3000L,
        tokenCount = operators.TextOps.bpeTokenCountCol(m.merges))
    }),
    // Gopher rule filter over a synthetically-structured corpus (t6
    // pattern): deterministic bullet/ellipsis/symbol augmentations keyed
    // on doc_id make every rule non-vacuous (the %97 docs are bullet-
    // heavy enough to FAIL r_bullet)
    "t19_gopher_rules" -> ((s, dir) =>
      operators.TextOps.gopherRules(t(s, dir, "documents").withColumn("text",
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            lit("\n- bullet item\n- second bullet")).otherwise(lit("")),
          when(col("doc_id") % 97 === 0,
            lit("\n- filler bullet" * 9)).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit("\nto be continued...")).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            lit(" ## 123 456 789 #")).otherwise(lit("")))))),
    // Gopher REPETITION suite (Table A1's other half): duplicate-line/
    // paragraph fractions + top-2/3/4-gram char shares, pure per-row —
    // augmentations keyed on doc_id (%13 dup lines, %17 dup paragraphs,
    // %19 a spam-gram run) make every rule non-vacuous
    "t27_gopher_repetition" -> ((s, dir) =>
      operators.TextOps.gopherRepetition(t(s, dir, "documents")
        .withColumn("text", concat(col("text"),
          when(col("doc_id") % 13 === 0,
            lit("\nrepeat line one" * 3)).otherwise(lit("")),
          when(col("doc_id") % 17 === 0,
            lit("\n\npara block alpha" * 2)).otherwise(lit("")),
          when(col("doc_id") % 19 === 0,
            lit(" spam" * 6)).otherwise(lit("")))))),
    // deterministic global training-order shuffle: global rank with no
    // global sort (range-bucket histogram + driver cumsum offsets +
    // bounded per-bucket windows)
    "t20_global_shuffle" -> ((s, dir) =>
      operators.TextOps.globalShuffle(t(s, dir, "documents"))),
    // CCNet head/middle/tail terciles of the t14 quality score, per
    // language — histogram-derived discrete thresholds, no ntile window
    "t21_quality_buckets" -> ((s, dir) =>
      operators.TextOps.qualityBuckets(t(s, dir, "documents"))),
    // mixture resampling at explicit epoch weights: src0 2.5 epochs,
    // src1 1.7, src2 0.5 (downsample), src3 excluded, others 1.0
    "t22_upsample" -> ((s, dir) =>
      operators.TextOps.upsample(t(s, dir, "documents"),
        Map("src0" -> 2500L, "src1" -> 1700L, "src2" -> 500L,
          "src3" -> 0L))),
    // unigram LM quality: top-V vocab (TakeOrdered) broadcast, per-doc
    // integer-quantized logprob — even the score is hash-checked
    "t14_unigram_quality" -> ((s, dir) =>
      operators.TextOps.unigramQuality(t(s, dir, "documents"))),
    // DSIR importance weights: hashed-bigram target-vs-raw likelihood
    // ratio, integer-quantized (t14's length(bin(·)) log₂) so the
    // per-doc weight sum is hash-exact cross-engine; target slice =
    // source 'src0' standing in for the high-quality reference corpus
    "t17_dsir_weights" -> ((s, dir) =>
      operators.TextOps.dsirWeights(t(s, dir, "documents"))),
    // supervised NB quality classifier (fastText posture, t17's
    // supervised sibling): src0/src1 stand in for the trusted slice;
    // integer log₂ log-odds keep even the verdict hash-exact
    "t28_nb_quality" -> ((s, dir) =>
      operators.TextOps.nbQuality(t(s, dir, "documents"))),
    // C4-style segment-level dedup: corpus-wide keep-first on 10-token
    // segments (min-struct aggregate, no window), docs reassembled
    "t15_segment_dedup" -> ((s, dir) =>
      operators.TextOps.segmentDedup(t(s, dir, "documents"))),
    // source-overlap matrix from KMV sketches: one distributed MinK
    // pass, pair math on KB-sized driver sketches — integer-exact
    "d10_source_overlap" -> ((s, dir) =>
      operators.TextOps.sourceOverlap(t(s, dir, "documents"))),
    // the END-TO-END composed pipeline (gate → synthetic-PII augment →
    // redact → ladder dedup → mix → split → pack), every stage the same
    // operator the standalone queries check — the oracle chains the same
    // CTEs, so stage-BOUNDARY effects are verified cross-engine
    "t11_corpus_pipeline" -> ((s, dir) =>
      operators.TextOps.corpusPipeline(t(s, dir, "documents"),
        mixPct = when(regexp_extract(col("source"), "([0-9]+)", 1)
          .cast("int") % 2 === 0, lit(100)).otherwise(lit(25)),
        augment = df => df.withColumn("text",
          concat(col("text"), lit(" contact doc"),
            col("doc_id").cast("string"),
            lit("@corp.example.com call +1 (555) 123-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"))),
        // stage-boundary materialization: the redacted and decontaminated
        // relations are each consumed twice downstream — an eager local
        // checkpoint computes each exactly once (2× on the composed
        // pipeline at sf0.1; a cluster run would use a parquet/Iceberg
        // boundary instead). Same rows, same hash — oracle unchanged.
        materialize = _.localCheckpoint())),
    // the funnel view of the SAME chain: one row of per-stage survivor
    // counts (input → gate → decon → dedup → mix → 8/1/1 split) — the
    // retention dashboard a curation run reports; localizes a stage
    // divergence even when t11's terminal packing happens to agree
    "t35_curation_funnel" -> ((s, dir) =>
      operators.TextOps.curationFunnel(t(s, dir, "documents"),
        mixPct = when(regexp_extract(col("source"), "([0-9]+)", 1)
          .cast("int") % 2 === 0, lit(100)).otherwise(lit(25)),
        augment = df => df.withColumn("text",
          concat(col("text"), lit(" contact doc"),
            col("doc_id").cast("string"),
            lit("@corp.example.com call +1 (555) 123-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"))),
        materialize = _.localCheckpoint())),
    // corpus carries no PII: append a deterministic contact line per row
    // (mirrored in TextOracles.redactSql) so the redaction regexes are
    // exercised for real in both engines
    "t6_redact" -> ((s, dir) =>
      operators.TextOps.redactPii(t(s, dir, "documents").withColumn("text",
        concat(col("text"), lit(" contact doc"),
          col("doc_id").cast("string"),
          lit("@corp.example.com call +1 (555) 123-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))))),
    // heap-merge top-k (TopKAggregator): ≤k rows per (query, partition)
    // through the exchange — the window form would shuffle every scored
    // row into |queries| partitions (10¹⁰ rows through 10 reducers at
    // 10⁹×10); spec-asserted row-identical to the window form and plan-
    // audited Window-free (ExplainAudit e1)
    "e1_knn_brute" -> ((s, dir) =>
      operators.Similarity.knnBruteAgg(t(s, dir, "embeddings"))),
    "e2_knn_lsh" -> ((s, dir) =>
      operators.Similarity.knnLsh(t(s, dir, "embeddings"))),
    "e3_knn_ivf" -> ((s, dir) =>
      operators.Similarity.knnIvf(t(s, dir, "embeddings"))),
    "e4_lsh_recall" -> ((s, dir) =>
      operators.Similarity.lshRecall(t(s, dir, "embeddings"))),
    "e5_ivf_recall" -> ((s, dir) =>
      operators.Similarity.ivfRecall(t(s, dir, "embeddings"))),
    // learned (k-means) coarse quantizer: recall 0.84-1.00 at nProbe 3-4
    // on the uniform corpus vs the sign anchors' 0.44-0.60 (e7 measures)
    "e6_knn_ivfk" -> ((s, dir) =>
      operators.Similarity.knnIvfKmeans(t(s, dir, "embeddings"))),
    "e7_ivfk_recall" -> ((s, dir) =>
      operators.Similarity.ivfKmeansRecall(t(s, dir, "embeddings"))),
    // SemDeDup (Abbas et al. 2023): k-means cells bound the pair space,
    // within-cell quantized-cosine prune, keep-min-id verdicts
    "e8_semdedup" -> ((s, dir) =>
      operators.Similarity.semanticDedup(t(s, dir, "embeddings"))),
    // PQ-ADC (Jégou et al. 2011): 4×3-bit codes, per-query lookup
    // tables, heap-merge top-k; e10 measures the compression/recall dial
    "e9_knn_pq" -> ((s, dir) =>
      operators.Similarity.knnPq(t(s, dir, "embeddings"))),
    "e10_pq_recall" -> ((s, dir) =>
      operators.Similarity.pqRecall(t(s, dir, "embeddings"))),
    // PQ + exact re-rank (the canonical IVF-PQ refine stage): top k·3 by
    // ADC, exact dot on candidates only; e12 shows the recall buy-back
    "e11_knn_pq_refine" -> ((s, dir) =>
      operators.Similarity.knnPqRefine(t(s, dir, "embeddings"))),
    "e12_pq_refine_recall" -> ((s, dir) =>
      operators.Similarity.pqRefineRecall(t(s, dir, "embeddings"))),
    // composed IVF-PQ (FAISS IVFADC): learned cells restrict the scan,
    // ADC scores candidates through in-row codes, exact re-rank to k
    "e13_knn_ivfpq" -> ((s, dir) =>
      operators.Similarity.knnIvfPq(t(s, dir, "embeddings"))),
    "e14_ivfpq_recall" -> ((s, dir) =>
      operators.Similarity.ivfPqRecall(t(s, dir, "embeddings"))),
    // train-ONCE / serve-many IVF-PQ: the model (subsample-trained
    // centroids + codebooks) persists as a parquet artifact keyed by
    // corpus fingerprint; serving runs ZERO Lloyd's jobs. e15 and e16
    // share the artifact — the first call in a Verify run trains it,
    // every later call (and every later RUN) loads it.
    "e15_knn_ivfpq_model" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.knnIvfPqModel(emb,
        operators.Similarity.annModelFor(emb, AnnModelDir))
    }),
    // the nProbe operating curve: recall@k per probe width in one table
    // — the scan-fraction-vs-recall tuning artifact (FAISS nprobe sweep)
    "e33_nprobe_sweep" -> ((s, dir) =>
      operators.Similarity.nprobeSweep(t(s, dir, "embeddings"))),
    // index cartography from the SAME persisted model: per-cell corpus
    // population incl. dead cells — the imbalance/index-health table an
    // ANN deployment monitors for retrain-on-drift decisions
    "e32_ivf_cell_stats" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.ivfCellStats(emb,
        operators.Similarity.annModelFor(emb, AnnModelDir))
    }),
    "e16_ivfpq_model_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.ivfPqModelRecall(emb,
        operators.Similarity.annModelFor(emb, AnnModelDir))
    }),
    // SQ8 served from the SAME persisted artifact (v2 carries the
    // slice-trained bounds): zero aggregates at serve time — the
    // train-once story now covers every quantization rung
    "e26_knn_sq8_model" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.knnSq8Model(emb,
        operators.Similarity.annModelFor(emb, AnnModelDir))
    }),
    "e27_sq8_model_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.sq8ModelRecall(emb,
        operators.Similarity.annModelFor(emb, AnnModelDir))
    }),
    // IVF-PQ served from the PERSISTED CODES table (the read side of
    // encodeIvfPq's ingest write): codes materialize once per (corpus,
    // model) next to the model artifact and every query batch serves
    // from them — no per-query re-encode of the corpus, re-rank
    // quantizes candidate rows only. Row-identical to e15 (the oracle
    // is the same unrolled chain), so the gate proves the persisted
    // codes round-trip bit-exactly.
    "e28_knn_ivfpq_codes" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val model = operators.Similarity.annModelFor(emb, AnnModelDir)
      operators.Similarity.knnIvfPqCodes(
        operators.Similarity.codesFor(emb, model, AnnModelDir + "_codes"),
        emb, model)
    }),
    // MMR diversity re-rank (Carbonell & Goldstein 1998): the serving
    // stack's LAST stage — greedy relevance-minus-redundancy selection
    // over heap-merged top-m candidates, per-query greedy inside a typed
    // MmrAggregator (zero driver iteration). e30 evidences the point:
    // worst within-set redundancy, MMR k-set vs plain top-k.
    "e29_mmr_rerank" -> ((s, dir) =>
      operators.Similarity.mmrRerank(t(s, dir, "embeddings"))),
    "e30_mmr_diversity" -> ((s, dir) =>
      operators.Similarity.mmrDiversity(t(s, dir, "embeddings"))),
    // the COMPOSED production serving stack: persisted-model IVF-PQ
    // candidates (e15, zero training) -> exact re-rank -> MMR diversity
    // (e29) in one query — every stage individually audited, here
    // proven to compose end-to-end and stay oracle-exact
    "e34_mmr_ivfpq_model" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.mmrOverIvfPqModel(emb,
        operators.Similarity.annModelFor(emb, AnnModelDir))
    }),
    // hybrid lexical+dense retrieval: BM25 top-20 (t16's scorer) fused
    // with the dense top-20 of the id-0 embedding query (e1's scorer)
    // by reciprocal-rank fusion — rank-only, calibration-free, the
    // Elasticsearch/Vespa hybrid default. Integer-exact Σ 1e6 div (60+r).
    "e31_hybrid_rrf" -> ((s, dir) =>
      operators.Similarity.hybridRrf(
        t(s, dir, "documents"), t(s, dir, "embeddings"), Bm25Terms)),
    // SQ8 scalar quantization (FAISS QT_8bit): the compression rung
    // between exact float (e1) and PQ (e9) — 1 byte/dim, bounds trained
    // in ONE aggregate (no Lloyd's), encode/decode a pure in-row
    // projection. e18 measures the recall the 8-bit rung keeps.
    "e17_knn_sq8" -> ((s, dir) =>
      operators.Similarity.knnSq8(t(s, dir, "embeddings"))),
    "e18_sq8_recall" -> ((s, dir) =>
      operators.Similarity.sq8Recall(t(s, dir, "embeddings"))),
    // IVF-SQ8 (FAISS IndexIVFScalarQuantizer): cell restriction
    // compounding with the 8-bit rung — e20 vs e7 isolates what the
    // bytes cost on top of the cells at the same scan fraction
    "e19_knn_ivfsq8" -> ((s, dir) =>
      operators.Similarity.knnIvfSq8(t(s, dir, "embeddings"))),
    "e20_ivfsq8_recall" -> ((s, dir) =>
      operators.Similarity.ivfSq8Recall(t(s, dir, "embeddings"))),
    // filtered (attribute-constrained) search — the vector-DB metadata-
    // filter capability: predicate selectivity compounds with the IVF
    // scan fraction; e23's truth set is the FILTERED exact top-k
    "e21_knn_filtered" -> ((s, dir) =>
      operators.Similarity.knnBruteFiltered(t(s, dir, "embeddings"))),
    "e22_knn_ivf_filtered" -> ((s, dir) =>
      operators.Similarity.knnIvfFiltered(t(s, dir, "embeddings"))),
    "e23_filtered_recall" -> ((s, dir) =>
      operators.Similarity.filteredRecall(t(s, dir, "embeddings"))),
    // distributed k-NN GRAPH construction (NN-descent posture): the
    // offline primitive graph-ANN indexes are built from at 10^9
    // vectors — ids-only edges, linear candidate volume per round
    "e24_knn_graph" -> ((s, dir) =>
      operators.Similarity.knnGraph(t(s, dir, "embeddings"))),
    "e25_knn_graph_recall" -> ((s, dir) =>
      operators.Similarity.knnGraphRecall(t(s, dir, "embeddings"))),
    "d8_embedding_ladder" -> ((s, dir) =>
      operators.Similarity.embeddingNearDupLadder(t(s, dir, "embeddings"))),
    // m-tier: REAL container bytes (PNG/WAV/animated GIF built and
    // parsed by the pure-JVM MediaCodecs — CRCs, zlib, LZW and all;
    // JDK-codec cross-validated in MediaCodecsSpec). The generator is
    // deterministic in the doc row, so the oracle replays the
    // size/dimension arithmetic while the engine round-trips the bytes.
    "m1_media_meta" -> ((s, dir) =>
      operators.Multimodal.decodeMeta(s,
        operators.Multimodal.synthesizeMedia(s, t(s, dir, "documents")).toDF())
        .toDF()),
    "m2_media_resize" -> ((s, dir) =>
      operators.Multimodal.resizeDims(
        operators.Multimodal.decodeMeta(s,
          operators.Multimodal.synthesizeMedia(s, t(s, dir, "documents"))
            .toDF()).toDF())),
    "m3_media_features" -> ((s, dir) =>
      operators.Multimodal.extractFeatures(s,
        operators.Multimodal.synthesizeMedia(s, t(s, dir, "documents")).toDF())
        .toDF()),
    // perceptual fingerprints over DECODED pixels: 8x8 average-hash +
    // 64-segment stream hash, exact-integer comparisons — the engine
    // round-trips real PNG bytes, the oracle replays the generator's
    // pixel arithmetic bit-for-bit
    "m5_perceptual_hash" -> ((s, dir) =>
      operators.Multimodal.perceptualHash(s,
        operators.Multimodal.synthesizeMedia(s, t(s, dir, "documents")).toDF())
        .toDF()),
    // windowed audio energy segmentation (VAD first pass) over REAL
    // decoded WAV PCM; oracle replays the generator's byte arithmetic
    "m6_audio_energy" -> ((s, dir) =>
      operators.Multimodal.audioEnergyWindows(s,
        operators.Multimodal.synthesizeMedia(s, t(s, dir, "documents")).toDF())
        .toDF()),
    // frame sampling: every ceil(n/4)th frame of each video row — the
    // explode fan-out a frame-level extractor consumes; n_frames comes
    // from the actual GIF image-descriptor walk
    "m4_frame_sample" -> ((s, dir) =>
      operators.Multimodal.sampleFrames(
        operators.Multimodal.decodeMeta(s,
          operators.Multimodal.synthesizeMedia(s, t(s, dir, "documents"))
            .toDF()).toDF())),
    // scene-cut detection: per-frame luma sums from REAL LZW-decoded GIF
    // frames, in-row lag, cross-multiplied mean-delta threshold — the
    // shot-boundary screen that makes m4's keyframes land on content
    // changes; oracle replays the generator's (d+f)%256 pixel arithmetic
    "m7_scene_cuts" -> ((s, dir) =>
      operators.Multimodal.sceneCuts(s,
        operators.Multimodal.synthesizeMedia(s, t(s, dir, "documents")).toDF())
        .toDF()),
  )

  /** DuckDB equivalents over the same parquet tables (events-derived
    * transcript CTE shared verbatim — Oracles.withAll).
    */
  def oracleSql: Map[String, String] = Map(
    "p1_parse" -> (Oracles.withAll +
      "SELECT conv_id, turn_idx, role, tool, ts, op, db, tbl, payload FROM valid"),
    "p2_filter_counts" -> (Oracles.withAll +
      "SELECT op, count(*) AS n FROM valid GROUP BY op"),
    "p3_enrich" -> (Oracles.withAll +
      """SELECT tool_kind, count(*) AS n, count(DISTINCT tool) AS n_tools
         FROM valid JOIN tool_dim USING (tool) GROUP BY tool_kind"""),
    "p4_route_counts" -> (Oracles.withAll +
      """SELECT (CASE op WHEN 'INS' THEN 'ins' WHEN 'UPD' THEN 'upd' ELSE 'del' END)
                || '_' || tool_kind AS sink, count(*) AS n
         FROM valid JOIN tool_dim USING (tool) GROUP BY 1"""),
    "p5_render_insert" -> (Oracles.withAll + """
      , ins AS (
        SELECT conv_id, turn_idx, db, tbl,
          regexp_extract(payload, '"_id":"([^"]+)"', 1) AS _id,
          NULLIF(regexp_extract(payload, '"extra":"([^"]+)"', 1), '') AS extra,
          regexp_extract(payload, '"k":([0-9]+)', 1) AS k
        FROM valid WHERE op = 'INS')
      SELECT conv_id, turn_idx,
        'INSERT INTO ' || db || '.' || tbl || ' ('
        || CASE WHEN extra IS NULL THEN '_id, k' ELSE '_id, extra, k' END
        || ') VALUES (''' || _id || ''''
        || CASE WHEN extra IS NULL THEN '' ELSE ', ''' || extra || '''' END
        || ', ' || k || ');' AS stmt
      FROM ins"""),
    "p6_render_update" -> (Oracles.withAll + """
      SELECT conv_id, turn_idx,
        'UPDATE ' || db || '.' || tbl
        || ' SET k = ' || regexp_extract(payload, '"k":([0-9]+)', 1)
        || ', obsolete = NULL WHERE _id = '''
        || regexp_extract(payload, '"_id":"([^"]+)"', 1) || ''';' AS stmt
      FROM valid WHERE op = 'UPD'"""),
    "p7_render_delete" -> (Oracles.withAll + """
      SELECT conv_id, turn_idx,
        'DELETE FROM ' || db || '.' || tbl || ' WHERE _id = '''
        || regexp_extract(payload, '"_id":"([^"]+)"', 1) || ''';' AS stmt
      FROM valid WHERE op = 'DEL'"""),
    "p8_flatten_children" -> (Oracles.withAll + """
      , ins AS (
        SELECT conv_id, turn_idx, db, tbl,
          regexp_extract(payload, '"_id":"([^"]+)"', 1) AS parent_id,
          CAST(regexp_extract(payload, '"k":([0-9]+)', 1) AS INT) AS k
        FROM valid WHERE op = 'INS'),
      exploded AS (
        SELECT conv_id, turn_idx, db, tbl, parent_id,
               0 AS pos, 'tag' || CAST(k % 5 AS STRING) AS value FROM ins
        UNION ALL
        SELECT conv_id, turn_idx, db, tbl, parent_id,
               1 AS pos, 'tag' || CAST(k % 7 AS STRING) AS value FROM ins)
      SELECT conv_id, turn_idx, db, tbl || '_tags' AS child_tbl,
        sha256(parent_id || '|' || tbl || '_tags|' || CAST(pos AS STRING)) AS _id,
        parent_id, pos, value
      FROM exploded"""),
    "p9_ddl_schemas" -> (Oracles.withAll + """
      SELECT db, 'CREATE SCHEMA IF NOT EXISTS ' || db || ';' AS stmt
      FROM (SELECT DISTINCT db FROM valid)"""),
    "p16_child_inserts" -> (Oracles.withAll + """
      , ins AS (
        SELECT conv_id, turn_idx, db, tbl,
          regexp_extract(payload, '"_id":"([^"]+)"', 1) AS parent_id,
          CAST(regexp_extract(payload, '"k":([0-9]+)', 1) AS INT) AS k
        FROM valid WHERE op = 'INS'),
      exploded AS (
        SELECT conv_id, turn_idx, db, tbl, parent_id,
               0 AS pos, 'tag' || CAST(k % 5 AS STRING) AS value FROM ins
        UNION ALL
        SELECT conv_id, turn_idx, db, tbl, parent_id,
               1 AS pos, 'tag' || CAST(k % 7 AS STRING) AS value FROM ins)
      SELECT conv_id, turn_idx,
        'INSERT INTO ' || db || '.' || tbl || '_tags (_id, ' || tbl
        || '__id, value) VALUES ('''
        || sha256(parent_id || '|' || tbl || '_tags|' || CAST(pos AS STRING))
        || ''', ''' || parent_id || ''', ''' || value || ''');' AS stmt
      FROM exploded"""),
    "p10_ddl_tables" -> (Oracles.withAll + """
      , ins AS (
        SELECT db, tbl,
          NULLIF(regexp_extract(payload, '"extra":"([^"]+)"', 1), '') AS extra,
          row_number() OVER (PARTITION BY db, tbl
                             ORDER BY ts, conv_id, turn_idx) AS rn
        FROM valid WHERE op = 'INS')
      SELECT db, tbl,
        'CREATE TABLE IF NOT EXISTS ' || db || '.' || tbl || ' (_id VARCHAR(255) PRIMARY KEY'
        || CASE WHEN extra IS NULL THEN '' ELSE ', extra VARCHAR(255)' END
        || ', k INTEGER);' AS stmt
      FROM ins WHERE rn = 1"""),
    "p11_ddl_alter" -> (Oracles.withAll + """
      , ins AS (
        SELECT db, tbl,
          (NULLIF(regexp_extract(payload, '"extra":"([^"]+)"', 1), '')
             IS NOT NULL) AS has_extra,
          row_number() OVER (PARTITION BY db, tbl
                             ORDER BY ts, conv_id, turn_idx) AS rn
        FROM valid WHERE op = 'INS')
      SELECT db, tbl,
        'ALTER TABLE ' || db || '.' || tbl || ' ADD extra VARCHAR(255);' AS stmt
      FROM (SELECT db, tbl,
              max(CASE WHEN rn = 1 THEN has_extra END) AS first_has,
              max(has_extra) AS any_has
            FROM ins GROUP BY db, tbl)
      WHERE any_has AND NOT first_has"""),
    "p12_transitions" -> (Transcripts.oracleWith + """
      SELECT prev_role, role, count(*) AS n
      FROM (SELECT role, lag(role) OVER (PARTITION BY conv_id
                                         ORDER BY turn_idx) AS prev_role
            FROM transcripts)
      WHERE prev_role IS NOT NULL
      GROUP BY prev_role, role"""),
    "p14_sessionize" -> (Transcripts.oracleWith + """
      , g AS (
        SELECT conv_id, turn_idx,
          epoch_us(ts) // 1000000
            - lag(epoch_us(ts) // 1000000)
              OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap
        FROM transcripts),
      s AS (
        SELECT conv_id, turn_idx,
          sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
            OVER (PARTITION BY conv_id ORDER BY turn_idx
                  ROWS UNBOUNDED PRECEDING) AS session_id
        FROM g)
      SELECT conv_id, CAST(session_id AS BIGINT) AS session_id,
             count(*) AS n_turns, max(turn_idx) AS last_turn
      FROM s GROUP BY conv_id, session_id"""),
    "p17_pipeline_rollup" -> (Oracles.withAll + """
      , rt AS (
        SELECT v.conv_id, v.turn_idx, v.ts, v.tool,
          (CASE op WHEN 'INS' THEN 'ins' WHEN 'UPD' THEN 'upd' ELSE 'del' END)
            || '_' || tool_kind AS sink
        FROM valid v JOIN tool_dim USING (tool)),
      g AS (
        SELECT *, epoch_us(ts) // 1000000
          - lag(epoch_us(ts) // 1000000)
            OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap
        FROM rt),
      s AS (
        SELECT *, sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
          OVER (PARTITION BY conv_id ORDER BY turn_idx
                ROWS UNBOUNDED PRECEDING) AS session_id
        FROM g)
      SELECT sink, count(*) AS n_turns,
        count(DISTINCT conv_id) AS n_convs,
        count(DISTINCT tool) AS n_tools,
        count(DISTINCT (conv_id, session_id)) AS n_sessions
      FROM s GROUP BY sink"""),
    "p15_resume_filter" -> (Oracles.withAll + """
      SELECT op, count(*) AS n, max(ts) AS max_ts, min(ts) AS min_ts
      FROM valid WHERE ts > TIMESTAMP '2024-01-16 00:00:00'
      GROUP BY op"""),
    "p13_dead_letter" -> (Oracles.withAll +
      """SELECT op, count(*) AS n FROM parsed
         WHERE NOT (op IN ('INS','UPD','DEL')
                    AND db NOT IN ('admin','config','local'))
         GROUP BY op"""),
    "q1_agg" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        count(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q2_join_broadcast" -> """
      SELECT r_name, n_name, count(*) AS n_cust,
        CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name""",
    "q3_join_shuffle" -> """
      SELECT o_orderpriority,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        count(DISTINCT o_orderkey) AS n_orders
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority""",
    "q4_semi_join" -> """
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)""",
    "q5_anti_join" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')""",
    "q6_window_rank" -> """
      SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INT) AS rnk
      FROM (SELECT o_custkey, o_orderkey, o_totalprice,
              row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS rnk
            FROM orders)
      WHERE rnk <= 3""",
    "q7_setops" -> """
      WITH a AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE year(o_orderdate) = 1994),
           b AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderstatus = 'F')
      SELECT o_custkey, 'only_1994' AS tag FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
      UNION ALL
      SELECT o_custkey, 'both' AS tag FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
      UNION ALL
      SELECT o_custkey, 'only_f' AS tag FROM (SELECT * FROM b EXCEPT SELECT * FROM a)""",
    "q8_rollup" -> """
      SELECT r_name, n_name, count(*) AS n_cust,
        CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)""",
    "q9_topk" -> """
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q10_distinct_agg" -> """
      SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust,
        count(*) AS n_orders, max(o_totalprice) AS max_price
      FROM orders GROUP BY o_orderstatus""",
    "q11_datetime" -> """
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n,
        count(DISTINCT user_id) AS n_users,
        CAST(max(hour(ts)) AS INT) AS max_hour,
        CAST(min(month(ts)) AS INT) AS min_month
      FROM events GROUP BY 1""",
    "q12_strings" -> """
      SELECT c_custkey, upper(c_name) AS uname,
        CAST(length(c_name) AS INT) AS len, reverse(c_name) AS rname,
        translate(c_name, 'aeiou', 'AEIOU') AS tname,
        CAST(levenshtein(c_name, reverse(c_name)) AS INT) AS lev
      FROM customer""",
    "q13_outer_join" -> """
      WITH a AS (SELECT DISTINCT o_custkey AS k, 1 AS in_1994 FROM orders
                 WHERE year(o_orderdate) = 1994),
           b AS (SELECT DISTINCT c_custkey AS k, 1 AS in_neg FROM customer
                 WHERE c_acctbal < 0)
      SELECT COALESCE(a.k, b.k) AS k, COALESCE(in_1994, 0) AS in_1994,
             COALESCE(in_neg, 0) AS in_neg
      FROM a FULL OUTER JOIN b ON a.k = b.k""",
    "d6_dedup_embedding" -> """
      SELECT * FROM (
        SELECT a.vec_id AS id1, b.vec_id AS id2,
          CAST(list_sum(list_transform(range(1, 65),
            i -> CAST(round(CAST(a.embedding[i] AS DOUBLE) * 10000) AS BIGINT)
                 * CAST(round(CAST(b.embedding[i] AS DOUBLE) * 10000) AS BIGINT)))
            AS BIGINT) AS qdot
        FROM embeddings a, embeddings b
        WHERE a.label = b.label AND a.vec_id < b.vec_id)
      WHERE qdot >= 40000000""",
    "q19_session_window" -> (Transcripts.oracleWith + """
      , g AS (
        SELECT conv_id, ts,
          CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                 OVER (PARTITION BY conv_id ORDER BY ts, turn_idx)
               >= 1800000000 OR lag(epoch_us(ts))
                 OVER (PARTITION BY conv_id ORDER BY ts, turn_idx) IS NULL
               THEN 1 ELSE 0 END AS boundary
        FROM transcripts),
      s AS (
        SELECT conv_id, ts,
          sum(boundary) OVER (PARTITION BY conv_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM g)
      SELECT conv_id, min(ts) AS win_start,
        max(ts) + INTERVAL 30 MINUTE AS win_end, count(*) AS n_turns
      FROM s GROUP BY conv_id, sid"""),
    "q14_cube" -> """
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    "q15_range_join" -> """
      SELECT a.user_id, a.event_id AS id1, b.event_id AS id2
      FROM events a JOIN events b
        ON a.user_id = b.user_id AND a.event_id < b.event_id
           AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 60 SECOND""",
    "q16_asof" -> """
      SELECT event_id, user_id,
        last_value(CASE WHEN event_type = 'signup' THEN event_id END
                   IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS last_signup_id
      FROM events""",
    "q20_asof_join" -> """
      WITH hist AS (
        SELECT user_id, ts, max(event_id) AS h_id FROM events
        WHERE event_type = 'signup' GROUP BY user_id, ts)
      SELECT e.event_id, e.user_id, h.h_id AS last_signup_id
      FROM events e ASOF LEFT JOIN hist h
        ON e.user_id = h.user_id AND h.ts <= e.ts""",
    "q17_pivot" -> """
      SELECT user_id,
        count(*) FILTER (event_type = 'click') AS click,
        count(*) FILTER (event_type = 'view') AS view,
        count(*) FILTER (event_type = 'purchase') AS purchase,
        count(*) FILTER (event_type = 'signup') AS signup,
        count(*) FILTER (event_type = 'error') AS error
      FROM events GROUP BY user_id""",
    "q21_unpivot" -> """
      SELECT user_id, event_type, count(*) AS n
      FROM events
      WHERE event_type IN ('click', 'view', 'purchase', 'signup', 'error')
      GROUP BY user_id, event_type""",
    "q22_correlated" -> """
      SELECT e.user_id, count(*) AS n_later
      FROM events e
      WHERE e.ts > (SELECT min(i.ts) FROM events i
                    WHERE i.user_id = e.user_id)
      GROUP BY e.user_id""",
    "q24_range_frame" -> """
      SELECT event_id, user_id,
        CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS hour_sum,
        CAST(count(*) OVER w AS BIGINT) AS hour_n
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""",
    "q23_grouping_sets" -> """
      SELECT event_type, bucket, count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        CAST(grouping(event_type) AS INT) AS g_et,
        CAST(grouping(bucket) AS INT) AS g_b
      FROM (SELECT event_type, user_id % 7 AS bucket, value FROM events) ev
      GROUP BY GROUPING SETS ((event_type, bucket), (event_type), ())""",
    "q18_percentile" -> """
      SELECT event_type,
        quantile_disc(value, 0.5) AS p50_approx,
        quantile_cont(value, 0.5) AS p50_exact,
        min(value) AS vmin, max(value) AS vmax
      FROM events GROUP BY event_type""",
    "t4_split" -> TextOracles.splitSql,
    "t5_chunks" -> TextOracles.chunksSql(),
    "t6_redact" -> TextOracles.redactSql,
    "t11_corpus_pipeline" -> TextOracles.corpusPipelineSql(),
    "t35_curation_funnel" -> TextOracles.curationFunnelSql(),
    "t9_data_mix" -> TextOracles.mixSql,
    "t10_seq_pack" -> TextOracles.seqPackSql(),
    "t12_decontaminate" -> TextOracles.decontaminateSql(),
    "t33_multisuite_decon" -> TextOracles.multiSuiteDeconSql(),
    "t34_c4_rules" -> TextOracles.c4RulesSql,
    "d14_fuzzy_decon" -> TextOracles.fuzzyDeconSql(),
    "t23_ngram_coverage" -> TextOracles.ngramCoverageSql(),
    "d15_dup_run" -> TextOracles.dupRunSql(),
    "t24_cluster_split" -> TextOracles.clusterSplitSql(),
    "t25_bigram_lm" -> TextOracles.bigramLmSql(),
    "t31_perplexity_buckets" -> TextOracles.perplexityBucketsSql(),
    "t29_bigram_pruned" -> TextOracles.bigramLmSql(minCount = 3L),
    "t26_bpe_tokens" -> TextOracles.bpeSql(),
    "t36_bpe_fertility" -> TextOracles.bpeFertilitySql(),
    // the artifact reconstructs the same deterministic merges + mean,
    // so the model-served gate shares t36's oracle verbatim
    "t37_fertility_model" -> TextOracles.bpeFertilitySql(),
    "q25_gap_fill" -> """
      SELECT event_id, user_id, ts,
        CAST(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
          ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS DOUBLE) AS filled
      FROM (SELECT event_id, user_id, ts,
              CASE WHEN event_id % 7 = 0 THEN NULL
                   ELSE CAST(value AS DECIMAL(18,2)) END AS v
            FROM events) e""",
    "d9_kmv_distinct" -> TextOracles.kmvSql(),
    "t13_sample_source" -> TextOracles.samplePerSourceSql(k = 10),
    // the oracle states the per-source cumulative-window semantics
    // directly; the operator reaches the same row set bucket-wise
    "t18_token_budget" -> TextOracles.tokenBudgetSql(),
    "t30_bpe_budget" -> TextOracles.bpeBudgetSql(),
    "t38_budget_model" -> TextOracles.bpeBudgetSql(),
    "t19_gopher_rules" -> TextOracles.gopherRulesSql,
    "t27_gopher_repetition" -> TextOracles.gopherRepetitionSql,
    "t20_global_shuffle" -> TextOracles.globalShuffleSql,
    "t21_quality_buckets" -> TextOracles.qualityBucketsSql(),
    "t22_upsample" -> TextOracles.upsampleSql(Seq("src0" -> 2500L,
      "src1" -> 1700L, "src2" -> 500L, "src3" -> 0L)),
    "t14_unigram_quality" -> TextOracles.unigramQualitySql(),
    "t17_dsir_weights" -> TextOracles.dsirWeightsSql(),
    "t28_nb_quality" -> TextOracles.nbQualitySql(),
    "t15_segment_dedup" -> TextOracles.segmentDedupSql(),
    "d10_source_overlap" -> TextOracles.sourceOverlapSql(),
    "t7_source_filter" -> TextOracles.sourceGateSql(),
    "t8_rep_signal" -> TextOracles.repSignalSql,
    "d2_dedup_minhash" -> TextOracles.minhashCandidatesSql(),
    "d3_dedup_simhash" -> TextOracles.simhashPairsSql(),
    "d5_fingerprint" -> TextOracles.fingerprintSql,
    "d7_neardup_ladder" -> TextOracles.nearDupLadderSql(),
    "d16_editdist_pairs" -> TextOracles.editDistancePairsSql(),
    "d17_source_dup_matrix" -> TextOracles.sourceDupMatrixSql(),
    "d18_editdist_clusters" -> TextOracles.editDistClustersSql(),
    "d19_sorted_neighbors" -> TextOracles.sortedNeighborSql(),
    "d20_cdc_chunks" -> TextOracles.cdcDupChunksSql(),
    "d21_cdc_boilerplate" -> TextOracles.cdcBoilerplateGateSql(),
    "d11_dup_clusters" -> TextOracles.dupClustersSql(),
    // identical label contract (cluster_id = component min over the same
    // verified pairs), so the same independent transitive-closure oracle
    // cross-checks the star-contraction engine
    "d13_dup_clusters_star" -> TextOracles.dupClustersSql(),
    "t16_bm25" -> TextOracles.bm25Sql(Bm25Terms),
    "d12_incremental_dedup" -> TextOracles.incrementalDedupSql(),
    // identical semantics through the persisted index — same oracle
    "d22_incremental_indexed" -> TextOracles.incrementalDedupSql(),
    "e2_knn_lsh" -> SimOracles.knnLshSql(),
    "e3_knn_ivf" -> SimOracles.knnIvfSql(),
    "e4_lsh_recall" -> SimOracles.lshRecallSql(),
    "e5_ivf_recall" -> SimOracles.ivfRecallSql(),
    "e6_knn_ivfk" -> SimOracles.knnIvfKmeansSql(),
    "e7_ivfk_recall" -> SimOracles.ivfKmeansRecallSql(),
    "e8_semdedup" -> SimOracles.semanticDedupSql(),
    "e9_knn_pq" -> SimOracles.knnPqSql(),
    "e10_pq_recall" -> SimOracles.pqRecallSql(),
    "e11_knn_pq_refine" -> SimOracles.knnPqRefineSql(),
    "e12_pq_refine_recall" -> SimOracles.pqRefineRecallSql(),
    "e13_knn_ivfpq" -> SimOracles.knnIvfPqSql(),
    "e14_ivfpq_recall" -> SimOracles.ivfPqRecallSql(),
    // the oracle reconstructs the persisted model digit-for-digit from
    // the same deterministic subsample + exact-int64 Lloyd's, so the
    // model-served path stays hash-exact without the oracle reading the
    // artifact file
    "e15_knn_ivfpq_model" -> SimOracles.knnIvfPqModelSql(),
    "e16_ivfpq_model_recall" -> SimOracles.ivfPqModelRecallSql(),
    "e32_ivf_cell_stats" -> SimOracles.ivfCellStatsSql(),
    "e33_nprobe_sweep" -> SimOracles.nprobeSweepSql(),
    "e26_knn_sq8_model" -> SimOracles.knnSq8ModelSql(),
    "e27_sq8_model_recall" -> SimOracles.sq8ModelRecallSql(),
    // e28 serves from persisted codes but is row-identical to e15 by
    // construction — the SAME unrolled training+serving chain oracles it
    "e28_knn_ivfpq_codes" -> SimOracles.knnIvfPqModelSql(),
    "e29_mmr_rerank" -> SimOracles.mmrSql(),
    "e30_mmr_diversity" -> SimOracles.mmrDiversitySql(),
    "e34_mmr_ivfpq_model" -> SimOracles.mmrOverIvfPqModelSql(),
    "e31_hybrid_rrf" -> SimOracles.hybridRrfSql(Bm25Terms),
    "e17_knn_sq8" -> SimOracles.knnSq8Sql(),
    "e18_sq8_recall" -> SimOracles.sq8RecallSql(),
    "e19_knn_ivfsq8" -> SimOracles.knnIvfSq8Sql(),
    "e20_ivfsq8_recall" -> SimOracles.ivfSq8RecallSql(),
    "e21_knn_filtered" -> SimOracles.knnBruteFilteredSql(),
    "e22_knn_ivf_filtered" -> SimOracles.knnIvfFilteredSql(),
    "e23_filtered_recall" -> SimOracles.filteredRecallSql(),
    "e24_knn_graph" -> SimOracles.knnGraphSql(),
    "e25_knn_graph_recall" -> SimOracles.knnGraphRecallSql(),
    "d8_embedding_ladder" -> SimOracles.embeddingLadderSql(),
    "d1_dedup_exact" -> """
      SELECT doc_id, sha256(text) AS fingerprint,
        row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) > 1
          AS is_duplicate
      FROM documents""",
    "d4_ngram_jaccard" -> """
      WITH sh AS (
        SELECT DISTINCT doc_id, lang, CAST(n_chars // 300 AS INT) AS lb,
               unnest(list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                 i -> string_split(text, ' ')[i] || ' '
                      || string_split(text, ' ')[i+1] || ' '
                      || string_split(text, ' ')[i+2])) AS shingle
        FROM documents),
      sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS inter
        FROM sh a JOIN sh b
          ON a.shingle = b.shingle AND a.lang = b.lang AND a.lb = b.lb
             AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
      SELECT doc1, doc2, inter, s1.n_sh AS n1, s2.n_sh AS n2
      FROM inter
      JOIN sizes s1 ON s1.doc_id = doc1
      JOIN sizes s2 ON s2.doc_id = doc2
      WHERE inter * 10 >= (s1.n_sh + s2.n_sh - inter) * 7""",
    "t1_lang_id" -> """
      WITH c AS (
        SELECT doc_id, lang,
          len(list_filter(string_split(text,' '), x -> x IN ('the','and','of'))) AS c_en,
          len(list_filter(string_split(text,' '), x -> x IN ('der','die','das','und'))) AS c_de,
          len(list_filter(string_split(text,' '), x -> x IN ('le','la','les','et'))) AS c_fr,
          len(list_filter(string_split(text,' '), x -> x IN ('el','los','las','y'))) AS c_es,
          len(list_filter(string_split(text,' '), x -> x IN ('de','shi','le'))) AS c_zh
        FROM documents)
      SELECT doc_id, lang,
        CASE WHEN m = 0 THEN 'und'
             WHEN c_en = m THEN 'en' WHEN c_de = m THEN 'de'
             WHEN c_fr = m THEN 'fr' WHEN c_es = m THEN 'es'
             ELSE 'zh' END AS guess,
        CAST(m AS INT) AS marker_hits
      FROM (SELECT *, greatest(c_en, c_de, c_fr, c_es, c_zh) AS m FROM c)""",
    "t2_quality_counts" -> """
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        CAST(len(list_filter(string_split(text, ' '),
          x -> x IN ('the','a','of','and','to','in'))) AS INT) AS n_stop,
        CAST(length(text) AS INT) AS n_chars,
        CAST(length(regexp_replace(text, '[a-z ]', '', 'g')) AS INT) AS n_nonalpha
      FROM documents""",
    "t3_token_count" -> """
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
        CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INT) AS word_tokens,
        CAST(len(regexp_extract_all(text,
          '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+'))
          AS INT) AS bpe_tokens,
        CAST(length(text) AS INT) AS n_chars
      FROM documents""",
    "e1_knn_brute" -> """
      WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                 WHERE vec_id < 10),
      d AS (
        SELECT qid, e.vec_id AS nid,
          CAST(list_sum(list_transform(range(1, 65),
            i -> CAST(round(CAST(qe[i] AS DOUBLE) * 10000) AS BIGINT)
                 * CAST(round(CAST(e.embedding[i] AS DOUBLE) * 10000) AS BIGINT)))
            AS BIGINT) AS dot
        FROM q, embeddings e WHERE e.vec_id != qid)
      SELECT qid, nid, dot, CAST(rnk AS INT) AS rnk
      FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                         ORDER BY dot DESC, nid) AS rnk
            FROM d)
      WHERE rnk <= 5""",
    // m2/m3 oracle parity rests on the documented ASCII-corpus assumption
    // (same as PolyHash31's, TESTDATA.md): Spark operates on the UTF-8
    // BYTES of the media column (n = byte length, byteSum over byte
    // values) while DuckDB's length()/ascii() are CHARACTER semantics —
    // identical only while every document is single-byte ASCII, which
    // holds at all three scale factors (verified: length == strlen).
    // the m-tier oracles replay synthesizeMedia's deterministic
    // dimension/size arithmetic (PNG: stored-block zlib closed form;
    // WAV: 44 + data + RIFF pad; GIF: 782 + 42 bytes per 4×4 frame —
    // each closed form is spec-asserted against the actual encoder in
    // MediaCodecsSpec) while Spark round-trips the REAL bytes
    "m1_media_meta" -> """
      WITH m AS (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n,
          CAST(length(text) % 64 + 1 AS INT) AS w,
          CAST(length(text) % 30 + 1 AS INT) AS f
        FROM documents),
      d AS (
        SELECT doc_id, n, w, f,
          CAST(greatest((n + w - 1) // w, 1) AS INT) AS h
        FROM m),
      z AS (
        SELECT doc_id, n, w, f, h,
          h * (w + 1) AS L
        FROM d)
      SELECT doc_id,
        CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             ELSE 'video' END AS media_type,
        CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
             ELSE 'gif' END AS format,
        CAST(CASE CAST(doc_id % 3 AS INT)
          WHEN 0 THEN 63 + 5 * greatest((L + 65534) // 65535, 1) + L
          WHEN 1 THEN 44 + n + n % 2
          ELSE 782 + 42 * f END AS BIGINT) AS n_bytes,
        CAST(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN w WHEN 1 THEN 0
          ELSE 4 END AS INT) AS width,
        CAST(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN h WHEN 1 THEN 0
          ELSE 4 END AS INT) AS height,
        CAST(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 0
          ELSE f END AS INT) AS n_frames,
        CAST(CASE WHEN doc_id % 3 = 1 THEN 8000 ELSE 0 END AS INT)
          AS sample_rate,
        CAST(CASE WHEN doc_id % 3 = 1 THEN n ELSE 0 END AS BIGINT)
          AS n_samples,
        CAST(CASE WHEN doc_id % 3 = 1 THEN n // 8 ELSE 0 END AS BIGINT)
          AS duration_ms
      FROM z""",
    "m2_media_resize" -> """
      WITH b AS (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n,
          CAST(length(text) % 64 + 1 AS INT) AS w
        FROM documents WHERE doc_id % 3 = 0),
      m AS (
        SELECT doc_id, w AS width,
          CAST(greatest((n + w - 1) // w, 1) AS INT) AS height
        FROM b)
      SELECT doc_id, width, height,
        CAST(greatest(width * 224 // greatest(width, height), 1) AS INT) AS out_w,
        CAST(greatest(height * 224 // greatest(width, height), 1) AS INT) AS out_h
      FROM m""",
    "m3_media_features" -> """
      WITH s AS (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n,
          CAST(length(text) % 64 + 1 AS BIGINT) AS w,
          CAST(length(text) % 30 + 1 AS BIGINT) AS f,
          CAST(COALESCE(list_sum(list_transform(range(1, length(text) + 1),
            j -> CAST(ascii(substr(text, CAST(j AS INT), 1)) AS BIGINT))), 0)
            AS BIGINT) AS tsum
        FROM documents),
      p AS (
        SELECT doc_id,
          CAST(CASE CAST(doc_id % 3 AS INT)
            WHEN 0 THEN w * greatest((n + w - 1) // w, 1)
            WHEN 1 THEN n
            ELSE 16 * f END AS BIGINT) AS np,
          CAST(CASE WHEN doc_id % 3 = 2
            THEN COALESCE(list_sum(list_transform(range(0, f),
              i -> 16 * ((doc_id + i) % 256))), 0)
            ELSE tsum END AS BIGINT) AS bsum
        FROM s)
      SELECT doc_id, CAST(k AS INT) AS feat_idx,
        (np * (k + 1) + bsum * (k * k + 1)) % 100000 AS value
      FROM p CROSS JOIN (SELECT unnest(range(0, 8)) AS k) ks""",
    "m5_perceptual_hash" -> """
      WITH imgs AS (
        SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n0,
          CAST(length(text) % 64 + 1 AS BIGINT) AS w
        FROM documents WHERE doc_id % 3 = 0),
      gs AS (
        SELECT doc_id, text, n0, w,
          greatest((n0 + w - 1) // w, 1) AS h,
          w * greatest((n0 + w - 1) // w, 1) AS np,
          CAST(COALESCE(list_sum(list_transform(range(1, CAST(n0 AS INT) + 1),
            j -> CAST(ascii(substr(text, CAST(j AS INT), 1)) AS BIGINT))), 0)
            AS BIGINT) AS gsum
        FROM imgs),
      blocks AS (
        SELECT doc_id, np, gsum, bi.b AS bi, bj.b AS bj,
          CAST(COALESCE(list_sum(flatten(
            list_transform(range(bi.b * h // 8, (bi.b + 1) * h // 8), r ->
              list_transform(range(bj.b * w // 8, (bj.b + 1) * w // 8), c ->
                CASE WHEN r * w + c < n0
                  THEN CAST(ascii(substr(text, CAST(r * w + c + 1 AS INT), 1))
                    AS BIGINT)
                  ELSE 0 END)))), 0) AS BIGINT) AS bs,
          ((bi.b + 1) * h // 8 - bi.b * h // 8)
            * ((bj.b + 1) * w // 8 - bj.b * w // 8) AS bc
        FROM gs CROSS JOIN (SELECT unnest(range(0, 8)) AS b) bi
                CROSS JOIN (SELECT unnest(range(0, 8)) AS b) bj),
      ah AS (
        SELECT doc_id,
          CAST(sum(CASE WHEN bs * np > gsum * bc
            THEN CASE WHEN bi * 8 + bj = 63 THEN -9223372036854775808
              ELSE 1::BIGINT << CAST(bi * 8 + bj AS INT) END
            ELSE 0 END) AS BIGINT) AS ahash
        FROM blocks GROUP BY doc_id),
      segs AS (
        SELECT doc_id, np, gsum, s.s AS s,
          CAST(COALESCE(list_sum(
            list_transform(range(s.s * np // 64, (s.s + 1) * np // 64), k ->
              CASE WHEN k < n0
                THEN CAST(ascii(substr(text, CAST(k + 1 AS INT), 1)) AS BIGINT)
                ELSE 0 END)), 0) AS BIGINT) AS ss,
          ((s.s + 1) * np // 64 - s.s * np // 64) AS sc
        FROM gs CROSS JOIN (SELECT unnest(range(0, 64)) AS s) s),
      sh AS (
        SELECT doc_id,
          CAST(sum(CASE WHEN ss * np > gsum * sc
            THEN CASE WHEN s = 63 THEN -9223372036854775808
              ELSE 1::BIGINT << CAST(s AS INT) END
            ELSE 0 END) AS BIGINT) AS shash
        FROM segs GROUP BY doc_id)
      SELECT g.doc_id, CAST(g.w AS INT) AS width, CAST(g.h AS INT) AS height,
        ahash, shash
      FROM gs g JOIN ah USING (doc_id) JOIN sh USING (doc_id)""",
    "m6_audio_energy" -> """
      WITH a AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1),
      s AS (
        SELECT doc_id, list_transform(range(1, length(text) + 1),
          i -> CAST(ord(text[i]) AS BIGINT) - 128) AS v
        FROM a),
      w AS (
        SELECT doc_id, unnest(range(0, (len(v) + 49) // 50)) AS win_idx, v
        FROM s),
      e AS (
        SELECT doc_id, win_idx,
          list_slice(v, win_idx * 50 + 1, (win_idx + 1) * 50) AS wv
        FROM w)
      SELECT doc_id, win_idx,
        CAST(len(wv) AS BIGINT) AS win_len,
        CAST(list_sum(list_transform(wv, x -> x * x)) AS BIGINT) AS energy,
        (CAST(list_sum(list_transform(wv, x -> x * x)) AS BIGINT)
          >= 2000 * len(wv)) AS active
      FROM e""",
    "m4_frame_sample" -> """
      WITH v AS (
        SELECT doc_id, CAST(length(text) % 30 + 1 AS INT) AS n_frames
        FROM documents WHERE doc_id % 3 = 2)
      SELECT doc_id, n_frames,
        CAST(unnest(range(0, n_frames, greatest(n_frames // 4, 1))) AS INT)
          AS frame_idx
      FROM v""",
    // m7 replays the video generator's pixel arithmetic: frame f of doc
    // d is 16 bytes of (d+f)%256 ⇒ luma_sum = 16·((d+f)%256); the only
    // deltas ≥ 1024 (thr 64/pixel × 16 pixels) are the 255→0 wraps
    "m7_scene_cuts" -> """
      WITH v AS (
        SELECT doc_id, CAST(length(text) % 30 + 1 AS INT) AS n_frames
        FROM documents WHERE doc_id % 3 = 2),
      fr AS (
        SELECT doc_id, CAST(unnest(range(0, n_frames)) AS BIGINT)
          AS frame_idx
        FROM v),
      lum AS (
        SELECT doc_id, frame_idx,
          CAST(16 * ((doc_id + frame_idx) % 256) AS BIGINT) AS luma_sum,
          CAST(CASE WHEN frame_idx = 0 THEN 0
            ELSE abs(16 * ((doc_id + frame_idx) % 256)
                   - 16 * ((doc_id + frame_idx - 1) % 256)) END AS BIGINT)
            AS delta
        FROM fr)
      SELECT doc_id, frame_idx, luma_sum, delta,
        (frame_idx > 0 AND delta >= 64 * 16) AS is_cut
      FROM lum""",
  )
}
