package graft

import graft.functions.TextHashes.{B31, MaxPolyLen, P31}

/** DuckDB-dialect oracle SQL for the text-dedup queries (d2/d3/d5/d7),
  * generated from the SAME constants as the Spark operators
  * (graft.functions.TextHashes, graft.operators.TextOps): the polynomial
  * hash, MinHash family, band Horner combine, SimHash votes and Jaccard
  * threshold are mirrored digit-for-digit. The corpus is ASCII, so
  * DuckDB's per-character ascii(substr(s,j,1)) equals the Spark
  * expression's per-byte loop.
  */
object TextOracles {

  private val pows: Seq[Long] =
    Iterator.iterate(1L)(h => h * B31 % P31).take(MaxPolyLen).toSeq
  private val powList: String = pows.mkString("[", ", ", "]")

  /** PolyHash31 of a string expression (first 64 chars), as Σ c_j·B^(L-j)
    * mod P — identical to the Spark expression's per-step Horner mod.
    */
  private def ph(x: String): String =
    s"(COALESCE(CAST(list_sum(list_transform(" +
      s"range(1, least(length($x), $MaxPolyLen) + 1), " +
      s"j -> CAST(ascii(substr($x, j, 1)) AS BIGINT) * " +
      s"($powList)[least(length($x), $MaxPolyLen) - j + 1])) " +
      s"AS BIGINT), 0) % $P31)"

  /** Distinct word 3-gram shingles per doc (mirror of TextOps.shingleRows
    * without the lang/length blocking columns). `rel` is the docs
    * relation — `documents` for the standalone queries, the redacted CTE
    * for the composed pipeline (t11). `prefix` disambiguates CTE names
    * when one query builds shingles over two relations (t11 builds them
    * over `red` for decontamination and again over the decon survivors
    * for the dedup ladder).
    */
  private def shingleCtes(rel: String = "documents",
                          prefix: String = ""): String = s"""
${prefix}toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM $rel),
${prefix}sh AS (
  SELECT DISTINCT doc_id,
    unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
  FROM ${prefix}toks)"""

  /** MinHash signature mins + banded buckets + candidate pairs with a band
    * vote — mirror of TextOps.minhashSignatures/minhashCandidatesVoted.
    */
  private def minhashCtes(k: Int, bands: Int): String = {
    val r = k / bands
    val mins = (0 until k).map(i =>
      s"min((ph * ${2L * i + 1} + ${i.toLong * i + 1}) % $P31) AS h$i")
      .mkString(",\n    ")
    def bucket(b: Int): String =
      (0 until r).foldLeft(b.toString)((acc, j) =>
        s"(($acc) * 1000003 + h${b * r + j}) % $P31")
    val banded = (0 until bands).map(b =>
      s"  SELECT doc_id, $b AS band, ${bucket(b)} AS bucket FROM sig")
      .mkString("\n  UNION ALL\n")
    s""",
phs AS (SELECT doc_id, ${ph("shingle")} AS ph FROM sh),
sig AS (
  SELECT doc_id,
    $mins
  FROM phs GROUP BY doc_id),
banded AS (
$banded),
voted AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS band_hits
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)"""
  }

  /** d2: banded MinHash-LSH candidate pairs (≥1 shared band). */
  def minhashCandidatesSql(k: Int = 32, bands: Int = 8): String =
    s"WITH ${shingleCtes()} ${minhashCtes(k, bands)}\n" +
      "SELECT doc1, doc2 FROM voted WHERE band_hits >= 1"

  /** d7: the near-dup ladder — ≥2-band-vote candidates, then exact 3-gram
    * Jaccard ≥ 0.7 verify on candidates only (integer cross-multiplied).
    */
  def nearDupLadderSql(k: Int = 32, bands: Int = 8,
                       minBandHits: Int = 2): String =
    s"""WITH ${shingleCtes()} ${minhashCtes(k, bands)},
cand AS (SELECT doc1, doc2 FROM voted WHERE band_hits >= $minBandHits),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT doc1, doc2, count(*) AS inter
  FROM cand
  JOIN sh s1 ON s1.doc_id = doc1
  JOIN sh s2 ON s2.doc_id = doc2 AND s2.shingle = s1.shingle
  GROUP BY doc1, doc2)
SELECT doc1, doc2, inter, s1.n_sh AS n1, s2.n_sh AS n2
FROM inter
JOIN sizes s1 ON s1.doc_id = doc1
JOIN sizes s2 ON s2.doc_id = doc2
WHERE inter * 10 >= (s1.n_sh + s2.n_sh - inter) * 7"""

  /** d19: sorted-neighborhood pairs — a plain global rank window over
    * the same order-preserving prefix key (the oracle may sort
    * globally; the Spark op must not), rank-adjacency pairing, bounded
    * Levenshtein verify.
    */
  def sortedNeighborSql(window: Int = 4, maxDist: Int = 24): String = {
    val key8 = (0 until 8).map(i =>
      s"(CASE WHEN length(text) > $i THEN CAST(ascii(substr(text, ${i + 1}, 1)) AS BIGINT) ELSE 0 END * (1::BIGINT << ${8 * (7 - i)}))")
      .mkString(" + ")
    s"""WITH keyed AS (
  SELECT doc_id, text, $key8 AS key8 FROM documents),
ranked AS (
  SELECT doc_id, text,
    row_number() OVER (ORDER BY key8, doc_id) - 1 AS pos
  FROM keyed),
pairs AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, a.text AS t1, b.text AS t2
  FROM ranked a JOIN ranked b
    ON b.pos > a.pos AND b.pos <= a.pos + $window)
SELECT doc1, doc2, CAST(levenshtein(t1, t2) AS INT) AS lev
FROM pairs WHERE levenshtein(t1, t2) <= $maxDist"""
  }

  /** d18: typo-family clusters — recursive-CTE transitive closure over
    * the d16 edit-distance-verified pairs (same label contract as d11's
    * oracle, different verify rung).
    */
  def editDistClustersSql(k: Int = 32, bands: Int = 8,
                          minBandHits: Int = 2, maxDist: Int = 24): String =
    s"""WITH RECURSIVE ${shingleCtes()} ${minhashCtes(k, bands)},
cand AS (SELECT doc1, doc2 FROM voted WHERE band_hits >= $minBandHits),
verified AS (
  SELECT doc1, doc2 FROM cand
  JOIN documents a ON a.doc_id = doc1
  JOIN documents b ON b.doc_id = doc2
  WHERE levenshtein(a.text, b.text) <= $maxDist),
edges AS (
  SELECT doc1 AS src, doc2 AS dst FROM verified
  UNION
  SELECT doc2 AS src, doc1 AS dst FROM verified),
reach AS (
  SELECT src AS id, dst AS r FROM edges
  UNION
  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
labels AS (
  SELECT id, least(id, min(r)) AS cluster_id FROM reach GROUP BY id)
SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN labels l ON l.id = d.doc_id"""

  /** d17: cross-source dup attribution — the d7 ladder chain, pairs
    * joined to their sources, counted per unordered source pair.
    */
  def sourceDupMatrixSql(k: Int = 32, bands: Int = 8,
                         minBandHits: Int = 2): String =
    s"""WITH ${shingleCtes()} ${minhashCtes(k, bands)},
cand AS (SELECT doc1, doc2 FROM voted WHERE band_hits >= $minBandHits),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT doc1, doc2, count(*) AS inter
  FROM cand
  JOIN sh s1 ON s1.doc_id = doc1
  JOIN sh s2 ON s2.doc_id = doc2 AND s2.shingle = s1.shingle
  GROUP BY doc1, doc2),
verified AS (
  SELECT doc1, doc2
  FROM inter
  JOIN sizes z1 ON z1.doc_id = doc1
  JOIN sizes z2 ON z2.doc_id = doc2
  WHERE inter * 10 >= (z1.n_sh + z2.n_sh - inter) * 7)
SELECT least(a.source, b.source) AS source_a,
  greatest(a.source, b.source) AS source_b,
  count(*) AS dup_pairs
FROM verified
JOIN documents a ON a.doc_id = doc1
JOIN documents b ON b.doc_id = doc2
GROUP BY 1, 2"""

  /** d16: edit-distance-verified near-dup pairs — same banded candidate
    * CTEs as d7, verified by DuckDB's `levenshtein` (unit-cost
    * Wagner-Fischer, agrees integer-exactly with Spark's; the Spark side
    * merely short-circuits past `maxDist`, which the `<=` filter makes
    * observationally identical).
    */
  def editDistancePairsSql(k: Int = 32, bands: Int = 8,
                           minBandHits: Int = 2, maxDist: Int = 24): String =
    s"""WITH ${shingleCtes()} ${minhashCtes(k, bands)},
cand AS (SELECT doc1, doc2 FROM voted WHERE band_hits >= $minBandHits)
SELECT doc1, doc2, CAST(levenshtein(a.text, b.text) AS INT) AS lev
FROM cand
JOIN documents a ON a.doc_id = doc1
JOIN documents b ON b.doc_id = doc2
WHERE levenshtein(a.text, b.text) <= $maxDist"""

  /** d12: incremental dedup — mirror of TextOps.incrementalDedup over a
    * deterministic doc_id-modulus corpus/batch split: batch docs pair
    * with ANY colliding corpus doc (no id order) and with LOWER-id batch
    * docs, ≥`minBandHits` band votes, exact-Jaccard verified, dup_of =
    * min verified partner. Reuses the shared shingle/minhash CTEs (the
    * `voted` CTE they define goes unused here — DuckDB only evaluates
    * referenced CTEs).
    */
  def incrementalDedupSql(k: Int = 32, bands: Int = 8,
                          minBandHits: Int = 2, batchMod: Int = 5): String =
    s"""WITH ${shingleCtes()} ${minhashCtes(k, bands)},
ivote AS (
  SELECT n.doc_id AS new_id, o.doc_id AS other_id, count(*) AS band_hits
  FROM banded n JOIN banded o
    ON n.band = o.band AND n.bucket = o.bucket
   AND n.doc_id % $batchMod = 0
   AND (o.doc_id % $batchMod <> 0 OR o.doc_id < n.doc_id)
  GROUP BY n.doc_id, o.doc_id),
icand AS (SELECT new_id, other_id FROM ivote WHERE band_hits >= $minBandHits),
isizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
iinter AS (
  SELECT new_id, other_id, count(*) AS inter
  FROM icand
  JOIN sh s1 ON s1.doc_id = new_id
  JOIN sh s2 ON s2.doc_id = other_id AND s2.shingle = s1.shingle
  GROUP BY new_id, other_id),
idups AS (
  SELECT i.new_id, min(i.other_id) AS dup_of
  FROM iinter i
  JOIN isizes s1 ON s1.doc_id = i.new_id
  JOIN isizes s2 ON s2.doc_id = i.other_id
  WHERE i.inter * 10 >= (s1.n_sh + s2.n_sh - i.inter) * 7
  GROUP BY i.new_id)
SELECT d.doc_id, dup_of IS NOT NULL AS is_dup, dup_of
FROM documents d LEFT JOIN idups ON idups.new_id = d.doc_id
WHERE d.doc_id % $batchMod = 0"""

  /** t16: integer-exact BM25 top-k — mirror of TextOps.bm25TopK (same
    * rational parameters k1 = 6/5, b = 3/4, same scaled integer kernel,
    * same t14-style log₂ idf quantization; `//` mirrors Spark's `div`).
    * The corpus scalars (N, Σdl) are subqueries where the Spark side
    * collects them once at build — same values, same arithmetic.
    */
  def bm25Sql(queryTerms: Seq[String], k: Int = 10): String = {
    val termList = queryTerms.map(t => s"'$t'").mkString("[", ", ", "]")
    s"""WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
dls AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
  FROM documents),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tot
  FROM documents),
qt AS (SELECT unnest($termList) AS tok),
tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM toks JOIN qt USING (tok) GROUP BY doc_id, tok),
dfs AS (
  SELECT tok,
    CAST(length(bin((((SELECT n FROM stats) - count(*)) * 1024)
      // (count(*) + 1) + 1)) AS BIGINT) AS idfq
  FROM tf GROUP BY tok),
a AS (SELECT tot // n AS a1 FROM stats)
SELECT tf.doc_id,
  CAST(sum((idfq * (44 * a1 * tf) * 1000)
    // (20 * a1 * tf + 6 * a1 + 18 * dl)) AS BIGINT) AS score_x1000,
  count(*) AS n_terms
FROM tf JOIN dfs USING (tok) JOIN dls USING (doc_id) CROSS JOIN a
GROUP BY tf.doc_id
ORDER BY score_x1000 DESC, doc_id
LIMIT $k"""
  }

  /** d11: transitive duplicate clusters — the ladder's verified pairs
    * (same CTE chain as [[nearDupLadderSql]]) closed transitively by a
    * RECURSIVE CTE; cluster_id = min doc_id reachable, singletons label
    * themselves. The independent-algorithm check on the Spark side's
    * iterative hash-to-min propagation: DuckDB materializes the full
    * reachability set, Spark converges labels — identical fixpoint.
    */
  /** The d11 transitive-closure CTE chain through `labels` (id,
    * cluster_id) — shared by dupClustersSql and clusterSplitSql (t24).
    * Caller must open with WITH RECURSIVE.
    */
  private def clusterCtes(k: Int, bands: Int, minBandHits: Int): String =
    s"""${shingleCtes()} ${minhashCtes(k, bands)},
cand AS (SELECT doc1, doc2 FROM voted WHERE band_hits >= $minBandHits),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT doc1, doc2, count(*) AS inter
  FROM cand
  JOIN sh s1 ON s1.doc_id = doc1
  JOIN sh s2 ON s2.doc_id = doc2 AND s2.shingle = s1.shingle
  GROUP BY doc1, doc2),
verified AS (
  SELECT doc1, doc2 FROM inter
  JOIN sizes s1 ON s1.doc_id = doc1
  JOIN sizes s2 ON s2.doc_id = doc2
  WHERE inter * 10 >= (s1.n_sh + s2.n_sh - inter) * 7),
edges AS (
  SELECT doc1 AS src, doc2 AS dst FROM verified
  UNION
  SELECT doc2 AS src, doc1 AS dst FROM verified),
reach AS (
  SELECT src AS id, dst AS r FROM edges
  UNION
  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
labels AS (
  SELECT id, least(id, min(r)) AS cluster_id FROM reach GROUP BY id)"""

  def dupClustersSql(k: Int = 32, bands: Int = 8,
                     minBandHits: Int = 2): String =
    s"""WITH RECURSIVE ${clusterCtes(k, bands, minBandHits)}
SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN labels l ON l.id = d.doc_id"""

  /** t24: cluster-aware split — t4's hash rule keyed on the d11 cluster
    * label, so near-dup families never straddle train/val/test.
    */
  def clusterSplitSql(k: Int = 32, bands: Int = 8,
                      minBandHits: Int = 2): String =
    s"""WITH RECURSIVE ${clusterCtes(k, bands, minBandHits)},
clab AS (
  SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN labels l ON l.id = d.doc_id),
cbk AS (
  SELECT doc_id, cluster_id,
    CAST(${ph("'split|' || CAST(cluster_id AS STRING)")} % 10 AS INT)
      AS bucket
  FROM clab)
SELECT doc_id, cluster_id, bucket,
  CASE WHEN bucket < 8 THEN 'train' WHEN bucket < 9 THEN 'val'
       ELSE 'test' END AS split
FROM cbk"""

  /** The 62-bit SimHash fingerprint of `documents.text` (token-level
    * PolyHash31 + affine-image bit votes) — mirror of SimHashPoly.
    */
  private val simhashFpCtes: String = s""",
hs AS (SELECT doc_id, list_transform(t, s -> ${ph("s")}) AS hs FROM toks),
fp AS (
  SELECT doc_id,
    CAST(list_sum(list_transform(range(0, 31), b ->
      CASE WHEN list_sum(list_transform(hs, h ->
             CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
      THEN (CAST(1 AS BIGINT) << b) ELSE 0 END))
    + list_sum(list_transform(range(0, 31), b ->
      CASE WHEN list_sum(list_transform(hs, h ->
             CASE WHEN (((h * 1000003 + 12345) % $P31) >> b) & 1 = 1
                  THEN 1 ELSE -1 END)) > 0
      THEN (CAST(1 AS BIGINT) << (b + 31)) ELSE 0 END))
    AS BIGINT) AS fp
  FROM hs)"""

  /** d3: SimHash near-dup pairs via 4×15-bit bands + exact Hamming. */
  def simhashPairsSql(maxHamming: Int = 8): String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
$simhashFpCtes,
banded AS (
  SELECT doc_id, fp, band, (fp >> (band * 15)) & 32767 AS key
  FROM fp CROSS JOIN (SELECT unnest(range(0, 4)) AS band) bs)
SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2,
  CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
FROM banded a JOIN banded b
  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= $maxHamming"""

  /** t4: deterministic hash-based train/val/test split (8/1/1). */
  def splitSql: String =
    s"""WITH b AS (
  SELECT doc_id,
    CAST(${ph("'split|' || CAST(doc_id AS STRING)")} % 10 AS INT) AS bucket
  FROM documents)
SELECT doc_id, bucket,
  CASE WHEN bucket < 8 THEN 'train' WHEN bucket < 9 THEN 'val'
       ELSE 'test' END AS split
FROM b"""

  /** t5: overlapping context-window chunks (chunkSize tokens, stride). */
  def chunksSql(chunkSize: Int = 64, stride: Int = 48): String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
c AS (
  SELECT doc_id, len(t) AS n, t,
    unnest(range(0, (len(t) - 1) // $stride + 1)) AS chunk_idx
  FROM toks)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
  array_to_string(list_slice(t, chunk_idx * $stride + 1,
    chunk_idx * $stride + $chunkSize), ' ') AS chunk,
  CAST(least($chunkSize, n - chunk_idx * $stride) AS INT) AS n_tokens
FROM c"""

  /** t9: deterministic weighted mix — ticket = polyhash31("mix|"+doc_id)
    * mod 100 vs the per-source keep rate (even-numbered sources 100%,
    * odd 25% — the driver query's example mixing config). TRY_CAST, not
    * CAST: a digit-free source must fall to the ELSE rate exactly like
    * Spark's `''.cast(int)` → NULL → otherwise(25), not hard-error.
    */
  def mixSql: String =
    s"""SELECT doc_id, source FROM documents
WHERE ${ph("'mix|' || CAST(doc_id AS STRING)")} % 100 <
  CASE WHEN TRY_CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 2 = 0
       THEN 100 ELSE 25 END"""

  /** t7: source-level corpus gate (integer-exact aggregate threshold). */
  def sourceGateSql(minAvgChars: Long = 300L): String =
    s"""WITH s AS (
  SELECT source, count(*) AS n_docs,
    sum(CAST(length(text) AS BIGINT)) AS sum_chars
  FROM documents GROUP BY source)
SELECT d.doc_id, d.source
FROM documents d JOIN s USING (source)
WHERE s.sum_chars >= s.n_docs * $minAvgChars"""

  /** t8: within-doc repetition signal — total vs distinct word 3-grams
    * (same window construction as the shingle CTEs; the distinct-gram
    * lambda is computed ONCE in a CTE so the gram definition lives in one
    * place).
    */
  def repSignalSql: String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT doc_id,
    CAST(greatest(len(t) - 2, 0) AS INT) AS n_grams,
    CAST(len(list_distinct(list_transform(
      range(1, greatest(len(t) - 2, 0) + 1),
      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS INT) AS n_distinct
  FROM toks)
SELECT doc_id, n_grams, n_distinct, n_grams - n_distinct AS n_dup FROM g"""

  /** t10: greedy sequence packing — running token total per
    * (source, shard), bin = exact integer floor division by the budget.
    * Shard mirrors TextOps.packSequences: polyhash31("pack|"+doc_id)
    * mod nShards.
    */
  def seqPackSql(budget: Int = 512, nShards: Int = 4): String =
    s"""WITH c AS (
  SELECT doc_id, source,
    CAST(${ph("'pack|' || CAST(doc_id AS STRING)")} % $nShards AS INT)
      AS shard,
    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
    sum(len(string_split(text, ' '))) OVER (
      PARTITION BY source,
        ${ph("'pack|' || CAST(doc_id AS STRING)")} % $nShards
      ORDER BY doc_id
      ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents)
SELECT doc_id, source, shard, n_tokens,
  CAST((cum - n_tokens) // $budget AS INT) AS bin
FROM c"""

  /** t6: PII redaction — same RE2-safe patterns as TextOps.redactPii,
    * same URL→email→phone order, counts on the same intermediate string
    * each replace consumes. The synthetic corpus carries no PII, so the
    * query appends a deterministic per-row contact line (mirrored in the
    * Spark entry) — every row then exercises real email+phone matches
    * cross-engine instead of a vacuous no-op comparison.
    */
  def redactSql: String = {
    // standard-SQL single-quoted literals pass backslashes through
    // untouched, so the Scala pattern strings embed verbatim
    val url = graft.operators.TextOps.UrlPat
    val email = graft.operators.TextOps.EmailPat
    val phone = graft.operators.TextOps.PhonePat
    s"""WITH piidocs AS (
  SELECT doc_id,
    text || ' contact doc' || CAST(doc_id AS STRING) ||
      '@corp.example.com call +1 (555) 123-' ||
      lpad(CAST(doc_id % 10000 AS STRING), 4, '0') AS text
  FROM documents),
s1 AS (
  SELECT doc_id, text,
    regexp_replace(text, '$url', '<URL>', 'g') AS c1 FROM piidocs),
s2 AS (SELECT *, regexp_replace(c1, '$email', '<EMAIL>', 'g') AS c2 FROM s1)
SELECT doc_id,
  regexp_replace(c2, '$phone', '<PHONE>', 'g') AS clean_text,
  CAST(len(regexp_extract_all(text, '$url')) AS INT) AS n_url,
  CAST(len(regexp_extract_all(c1, '$email')) AS INT) AS n_email,
  CAST(len(regexp_extract_all(c2, '$phone')) AS INT) AS n_phone
FROM s2"""
  }

  /** t11: the composed end-to-end corpus pipeline — source gate →
    * synthetic-PII augment → redact → near-dup dedup (ladder) → weighted
    * mix → split → per-(split, source, shard) packing. Every stage is the
    * same CTE logic as its standalone oracle (t7/t6/d7/t9/t4/t10),
    * chained over the PREVIOUS stage's output so stage-boundary effects
    * (dedup over redacted text, packing over post-mix survivors) are
    * checked cross-engine.
    */
  def corpusPipelineSql(minAvgChars: Long = 300L, k: Int = 32,
                        bands: Int = 8, minBandHits: Int = 2,
                        budget: Int = 512, nShards: Int = 4): String = {
    val shardExpr = s"${ph("'pack|' || CAST(doc_id AS STRING)")} % $nShards"
    s"""WITH ${pipelineChainCtes(minAvgChars, k, bands, minBandHits)},
packed AS (
  SELECT doc_id, source, split,
    CAST($shardExpr AS INT) AS shard,
    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
    sum(len(string_split(text, ' '))) OVER (
      PARTITION BY split, source, $shardExpr
      ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM spl)
SELECT doc_id, source, split, shard, n_tokens,
  CAST((cum - n_tokens) // $budget AS INT) AS bin
FROM packed"""
  }

  /** The t11 pipeline CTE chain (gate → augment → redact → decon →
    * ladder dedup → mix → split), ending at `spl` — shared by
    * [[corpusPipelineSql]] (which packs it) and [[curationFunnelSql]]
    * (which counts every stage boundary). Caller opens with WITH.
    */
  private def pipelineChainCtes(minAvgChars: Long, k: Int, bands: Int,
                                minBandHits: Int): String = {
    val url = graft.operators.TextOps.UrlPat
    val email = graft.operators.TextOps.EmailPat
    val phone = graft.operators.TextOps.PhonePat
    s"""gatesrc AS (
  SELECT source FROM documents GROUP BY source
  HAVING sum(CAST(length(text) AS BIGINT)) >= count(*) * $minAvgChars),
gated AS (
  SELECT d.doc_id, d.source, d.text
  FROM documents d JOIN gatesrc USING (source)),
aug AS (
  SELECT doc_id, source,
    text || ' contact doc' || CAST(doc_id AS STRING) ||
      '@corp.example.com call +1 (555) 123-' ||
      lpad(CAST(doc_id % 10000 AS STRING), 4, '0') AS text
  FROM gated),
red AS (
  SELECT doc_id, source,
    regexp_replace(regexp_replace(regexp_replace(text,
      '$url', '<URL>', 'g'), '$email', '<EMAIL>', 'g'),
      '$phone', '<PHONE>', 'g') AS text
  FROM aug),
${shingleCtes("red", "d")},
dphs AS (SELECT doc_id, ${ph("shingle")} AS ph FROM dsh),
dev AS (SELECT DISTINCT ph FROM dphs WHERE doc_id % 29 = 3),
dhits AS (
  SELECT c.doc_id, count(*) AS n_sh, count(e.ph) AS n_hits
  FROM dphs c LEFT JOIN dev e USING (ph)
  WHERE c.doc_id % 29 <> 3
  GROUP BY c.doc_id),
decsurv AS (
  -- fraction rule (mirror of dropContaminated): drop when eval overlap
  -- reaches HALF the doc's shingles; shingle-less docs (absent from
  -- dhits -> NULL comparison) survive via the COALESCE TRUE
  SELECT r.doc_id, r.source, r.text
  FROM red r LEFT JOIN dhits h USING (doc_id)
  WHERE r.doc_id % 29 <> 3 AND COALESCE(2 * h.n_hits < h.n_sh, TRUE)),
${shingleCtes("decsurv")} ${minhashCtes(k, bands)},
cand AS (SELECT doc1, doc2 FROM voted WHERE band_hits >= $minBandHits),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT doc1, doc2, count(*) AS inter
  FROM cand
  JOIN sh s1 ON s1.doc_id = doc1
  JOIN sh s2 ON s2.doc_id = doc2 AND s2.shingle = s1.shingle
  GROUP BY doc1, doc2),
dropped AS (
  SELECT DISTINCT doc2 AS doc_id FROM inter
  JOIN sizes s1 ON s1.doc_id = doc1
  JOIN sizes s2 ON s2.doc_id = doc2
  WHERE inter * 10 >= (s1.n_sh + s2.n_sh - inter) * 7),
surv AS (
  SELECT * FROM decsurv r
  WHERE NOT EXISTS (SELECT 1 FROM dropped x WHERE x.doc_id = r.doc_id)),
mixed AS (
  SELECT * FROM surv
  WHERE ${ph("'mix|' || CAST(doc_id AS STRING)")} % 100 <
    CASE WHEN TRY_CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 2 = 0
         THEN 100 ELSE 25 END),
spl AS (
  SELECT *, CASE WHEN b < 8 THEN 'train' WHEN b < 9 THEN 'val'
                 ELSE 'test' END AS split
  FROM (SELECT *, ${ph("'split|' || CAST(doc_id AS STRING)")} % 10 AS b
        FROM mixed))"""
  }

  /** t35: the curation funnel — one row of per-stage survivor counts
    * over the SAME chain as t11 (input → source gate → decontaminate →
    * near-dup dedup → weighted mix → split thirds), the retention
    * dashboard every production curation pipeline reports. Counts are
    * scalar subqueries over the shared CTE chain, so a stage-boundary
    * divergence shows up as a count mismatch even when t11's final
    * packing happens to agree.
    */
  def curationFunnelSql(minAvgChars: Long = 300L, k: Int = 32,
                        bands: Int = 8, minBandHits: Int = 2): String =
    s"""WITH ${pipelineChainCtes(minAvgChars, k, bands, minBandHits)}
SELECT CAST(1 AS INT) AS stage, 'input' AS stage_name,
  (SELECT count(*) FROM documents) AS n_docs
UNION ALL SELECT 2, 'gated', (SELECT count(*) FROM gated)
UNION ALL SELECT 3, 'decontaminated', (SELECT count(*) FROM decsurv)
UNION ALL SELECT 4, 'deduped', (SELECT count(*) FROM surv)
UNION ALL SELECT 5, 'mixed', (SELECT count(*) FROM mixed)
UNION ALL SELECT 6, 'train',
  (SELECT count(*) FROM spl WHERE split = 'train')
UNION ALL SELECT 7, 'val', (SELECT count(*) FROM spl WHERE split = 'val')
UNION ALL SELECT 8, 'test', (SELECT count(*) FROM spl WHERE split = 'test')"""

  /** t12: benchmark decontamination — eval set = doc_id ≡ 3 mod 29, a
    * training doc is contaminated when ≥ minHits of its distinct 3-gram
    * shingles appear anywhere in the eval set. Mirror of
    * TextOps.decontaminate (same shingle CTE, same polyhash join key,
    * same left-join-from-docs so shingle-less docs report 0/0/clean).
    */
  def decontaminateSql(minHits: Int = 3): String =
    s"""WITH ${shingleCtes()},
phs AS (SELECT doc_id, ${ph("shingle")} AS ph FROM sh),
ev AS (SELECT DISTINCT ph, 1 AS hit FROM phs WHERE doc_id % 29 = 3),
st AS (
  SELECT c.doc_id, count(*) AS n_sh, count(ev.hit) AS n_hits
  FROM phs c LEFT JOIN ev USING (ph)
  WHERE c.doc_id % 29 <> 3
  GROUP BY c.doc_id)
SELECT d.doc_id,
  COALESCE(st.n_sh, 0) AS n_sh,
  COALESCE(st.n_hits, 0) AS n_hits,
  COALESCE(st.n_hits, 0) >= $minHits AS contaminated
FROM documents d LEFT JOIN st USING (doc_id)
WHERE d.doc_id % 29 <> 3"""

  /** t33: multi-suite decontamination — t12's chain with a suite tag on
    * the eval shingles and a dense (train doc × suite) output grid.
    */
  def multiSuiteDeconSql(nSuites: Int = 3, minHits: Int = 3): String =
    s"""WITH ${shingleCtes()},
phs AS (SELECT doc_id, ${ph("shingle")} AS ph FROM sh),
ev AS (
  SELECT DISTINCT CAST(doc_id % 29 - 3 AS INT) AS suite, ph
  FROM phs WHERE doc_id % 29 >= 3 AND doc_id % 29 < ${3 + nSuites}),
tr AS (
  SELECT doc_id, ph FROM phs
  WHERE NOT (doc_id % 29 >= 3 AND doc_id % 29 < ${3 + nSuites})),
hits AS (
  SELECT tr.doc_id, ev.suite, count(*) AS n_hits
  FROM tr JOIN ev USING (ph) GROUP BY tr.doc_id, ev.suite),
nsh AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
grid AS (
  SELECT d.doc_id, CAST(s.s AS INT) AS suite, COALESCE(nsh.n_sh, 0) AS n_sh
  FROM documents d
  CROSS JOIN (SELECT unnest(range(0, $nSuites)) AS s) s
  LEFT JOIN nsh USING (doc_id)
  WHERE NOT (d.doc_id % 29 >= 3 AND d.doc_id % 29 < ${3 + nSuites}))
SELECT g.doc_id, g.suite, g.n_sh,
  COALESCE(h.n_hits, 0) AS n_hits,
  COALESCE(h.n_hits, 0) >= $minHits AS contaminated
FROM grid g LEFT JOIN hits h ON h.doc_id = g.doc_id AND h.suite = g.suite"""

  /** t23: repeated-n-gram coverage — mirror of TextOps.ngramCoverage:
    * distinct 3-gram shingles hashed to longs, shingle document
    * frequency, per-doc duplicated share, integer-crossed flag. CASTs
    * keep DuckDB's HUGEINT sums at BIGINT so the schema hash-matches.
    */
  def ngramCoverageSql(minDf: Int = 2, dropPct: Int = 50): String =
    s"""WITH ${shingleCtes()},
phs AS (SELECT doc_id, ${ph("shingle")} AS ph FROM sh),
dfreq AS (SELECT ph, count(*) AS ndocs FROM phs GROUP BY ph),
per AS (
  SELECT p.doc_id, count(*) AS n_sh,
    CAST(sum(CASE WHEN d.ndocs >= $minDf THEN 1 ELSE 0 END) AS BIGINT)
      AS dup_sh
  FROM phs p JOIN dfreq d USING (ph)
  GROUP BY p.doc_id)
SELECT doc_id, n_sh, dup_sh,
  dup_sh * 100 >= n_sh * $dropPct AS flagged
FROM per"""

  /** d15: longest duplicated-shingle run — positional shingles (DuckDB
    * zips the two unnest calls, so pos aligns with its shingle; 1-based
    * vs Spark's 0-based posexplode is absorbed by the islands DIFFERENCE),
    * dup-flagged by the same distinct-per-doc document frequency as t23,
    * runs via pos − row_number gaps-and-islands.
    */
  def dupRunSql(minDf: Int = 2): String =
    s"""WITH ${shingleCtes()},
psh AS (
  SELECT doc_id,
    unnest(range(1, greatest(len(t) - 1, 1))) AS pos,
    unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
  FROM toks),
rdfreq AS (
  SELECT ph, count(*) AS ndocs
  FROM (SELECT doc_id, ${ph("shingle")} AS ph FROM sh)
  GROUP BY ph),
rflag AS (
  SELECT p.doc_id, p.pos, d.ndocs >= $minDf AS dup
  FROM (SELECT doc_id, pos, ${ph("shingle")} AS ph FROM psh) p
  JOIN rdfreq d USING (ph)),
rruns AS (
  SELECT doc_id, grp, count(*) AS run FROM (
    SELECT doc_id,
      pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
    FROM rflag WHERE dup)
  GROUP BY doc_id, grp),
rmax AS (SELECT doc_id, max(run) AS max_dup_run FROM rruns GROUP BY doc_id),
rbase AS (SELECT doc_id, count(*) AS n_pos FROM rflag GROUP BY doc_id)
SELECT b.doc_id, b.n_pos,
  CAST(COALESCE(m.max_dup_run, 0) AS BIGINT) AS max_dup_run
FROM rbase b LEFT JOIN rmax m USING (doc_id)"""

  /** d14: fuzzy decontamination — mirror of TextOps.fuzzyDecon: banded
    * MinHash collisions between train (doc_id % 29 <> 3) and the eval
    * carve-out, ≥`minBandHits` band votes, exact-Jaccard ≥ 1/2 verify on
    * candidates only, contaminated_by = min verified eval partner.
    * Reuses the shared shingle/minhash CTEs (their `voted` CTE goes
    * unused — DuckDB only evaluates referenced CTEs).
    */
  def fuzzyDeconSql(k: Int = 32, bands: Int = 8,
                    minBandHits: Int = 2): String =
    s"""WITH ${shingleCtes()} ${minhashCtes(k, bands)},
fvote AS (
  SELECT t.doc_id AS train_id, e.doc_id AS eval_id, count(*) AS band_hits
  FROM banded t JOIN banded e
    ON t.band = e.band AND t.bucket = e.bucket
   AND t.doc_id % 29 <> 3 AND e.doc_id % 29 = 3
  GROUP BY t.doc_id, e.doc_id),
fcand AS (SELECT train_id, eval_id FROM fvote WHERE band_hits >= $minBandHits),
fsizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
finter AS (
  SELECT train_id, eval_id, count(*) AS inter
  FROM fcand
  JOIN sh s1 ON s1.doc_id = train_id
  JOIN sh s2 ON s2.doc_id = eval_id AND s2.shingle = s1.shingle
  GROUP BY train_id, eval_id),
fdup AS (
  SELECT f.train_id, min(f.eval_id) AS contaminated_by
  FROM finter f
  JOIN fsizes s1 ON s1.doc_id = f.train_id
  JOIN fsizes s2 ON s2.doc_id = f.eval_id
  WHERE f.inter * 10 >= (s1.n_sh + s2.n_sh - f.inter) * 5
  GROUP BY f.train_id)
SELECT d.doc_id, contaminated_by IS NOT NULL AS is_contaminated,
  contaminated_by
FROM documents d LEFT JOIN fdup ON fdup.train_id = d.doc_id
WHERE d.doc_id % 29 <> 3"""

  /** d9: per-source KMV distinct-token sketch — mirror of
    * TextOps.kmvDistinct (including the Knuth multiplicative finalizer
    * that de-clusters polynomial hashes of similar tokens). The k
    * smallest distinct token hashes per source via row_number; the
    * estimate's integer division (`//`) equals the JVM's `/` on positive
    * longs, so the estimate itself hash-matches.
    */
  def kmvSql(k: Int = 64): String = {
    val num = (k - 1).toLong * P31
    val mul = graft.functions.VectorOps.HashMul
    s"""WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
h AS (SELECT DISTINCT source,
  (${ph("'kmv|' || tok")} * $mul) % $P31 AS h FROM toks),
r AS (
  SELECT source, h,
    row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
    count(*) OVER (PARTITION BY source) AS nd
  FROM h)
SELECT source,
  CAST(least(max(nd), $k) AS INT) AS n_mins,
  CASE WHEN max(nd) >= $k THEN max(CASE WHEN rn = $k THEN h END)
       ELSE CAST(-1 AS BIGINT) END AS kth_min,
  CASE WHEN max(nd) >= $k THEN $num // max(CASE WHEN rn = $k THEN h END)
       ELSE max(nd) END AS est_distinct
FROM r GROUP BY source"""
  }

  /** d10: source-overlap matrix — mirror of TextOps.sourceOverlap. Per
    * source the k smallest distinct finalized shingle hashes (the KMV
    * sketch) via row_number; per pair the k smallest of the sketch union
    * with membership flags, counted with pure integer math. DuckDB
    * permits lateral alias reuse in the final SELECT.
    */
  def sourceOverlapSql(k: Int = 64): String = {
    val mul = graft.functions.VectorOps.HashMul
    s"""WITH ${shingleCtes()},
srcsh AS (
  SELECT d.source, (${ph("'ovl|' || s.shingle")} * $mul) % $P31 AS h
  FROM sh s JOIN documents d USING (doc_id)),
phs AS (SELECT DISTINCT source, h FROM srcsh),
r AS (
  SELECT source, h,
    row_number() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM phs),
sk AS (SELECT source, h FROM r WHERE rn <= $k),
pairs AS (
  SELECT a.source AS s1, b.source AS s2
  FROM (SELECT DISTINCT source FROM sk) a
  JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source),
u AS (
  SELECT p.s1, p.s2, sk.h,
    bool_or(sk.source = p.s1) AS in_a,
    bool_or(sk.source = p.s2) AS in_b
  FROM pairs p JOIN sk ON sk.source = p.s1 OR sk.source = p.s2
  GROUP BY p.s1, p.s2, sk.h),
ru AS (
  SELECT s1, s2, in_a, in_b,
    row_number() OVER (PARTITION BY s1, s2 ORDER BY h) AS rn,
    count(*) OVER (PARTITION BY s1, s2) AS nu
  FROM u)
SELECT s1 AS src1, s2 AS src2,
  CAST(least(max(nu), $k) AS INT) AS k_used,
  CAST(count(*) FILTER (WHERE rn <= $k AND in_a AND in_b) AS INT)
    AS n_common,
  (1000 * n_common) // k_used AS jaccard_x1000
FROM ru GROUP BY s1, s2"""
  }

  /** t13: deterministic ~k-per-source sample — mirror of
    * TextOps.samplePerSource. Threshold = the source's k-th smallest
    * DISTINCT finalized doc_id hash (MaxValue when the source has fewer
    * than k docs); the sample is every doc at or below it.
    */
  def samplePerSourceSql(k: Int = 25): String = {
    val mul = graft.functions.VectorOps.HashMul
    s"""WITH h AS (
  SELECT source, doc_id,
    (${ph("'smp|' || CAST(doc_id AS VARCHAR)")} * $mul) % $P31 AS h
  FROM documents),
d AS (SELECT DISTINCT source, h AS dh FROM h),
r AS (
  SELECT source, dh,
    row_number() OVER (PARTITION BY source ORDER BY dh) AS rn,
    count(*) OVER (PARTITION BY source) AS nd
  FROM d),
th AS (
  SELECT source,
    CASE WHEN max(nd) >= $k THEN max(CASE WHEN rn = $k THEN dh END)
         ELSE 9223372036854775807 END AS th
  FROM r GROUP BY source)
SELECT h.doc_id, h.source, h.h
FROM h JOIN th USING (source)
WHERE h.h <= th.th"""
  }

  /** t18: per-source token-budget sample — mirror of
    * TextOps.tokenBudgetSample. The oracle states the SEMANTICS directly
    * (one cumulative window per source over (hash, doc_id) order, admit
    * while the strictly-preceding token total is under budget); the
    * Spark operator reaches the identical row set through the bucketed
    * histogram + boundary-bucket-only window.
    */
  def tokenBudgetSql(budget: Long = 600L): String = {
    val mul = graft.functions.VectorOps.HashMul
    s"""WITH h AS (
  SELECT doc_id, source,
    (${ph("'tbs|' || CAST(doc_id AS VARCHAR)")} * $mul) % $P31 AS h,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents),
s AS (
  SELECT doc_id, source, n_tok,
    COALESCE(sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
  FROM h)
SELECT doc_id, source, n_tok FROM s WHERE cb < $budget"""
  }

  /** t19: Gopher-style rule filter — mirror of TextOps.gopherRules over
    * the driver query's synthetically-structured corpus (bullet /
    * ellipsis / symbol augmentations keyed on doc_id so every rule is
    * non-vacuous; the %97 docs are bullet-HEAVY to fail r_bullet). All
    * ratio rules cross-multiplied to integers.
    */
  def gopherRulesSql: String =
    s"""WITH aug AS (
  SELECT doc_id,
    text ||
    CASE WHEN doc_id % 7 = 0 THEN chr(10) || '- bullet item' || chr(10) || '- second bullet' ELSE '' END ||
    CASE WHEN doc_id % 97 = 0 THEN repeat(chr(10) || '- filler bullet', 9) ELSE '' END ||
    CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'to be continued...' ELSE '' END ||
    CASE WHEN doc_id % 5 = 0 THEN ' ## 123 456 789 #' ELSE '' END AS text
  FROM documents),
f AS (
  SELECT doc_id,
    string_split(text, ' ') AS w,
    string_split(text, chr(10)) AS l,
    length(text) - length(replace(text, '#', '')) AS n_hash,
    (length(text) - length(replace(text, '...', ''))) // 3 AS n_dots
  FROM aug),
m AS (
  SELECT doc_id,
    CAST(len(w) AS BIGINT) AS n_words,
    CAST(len(l) AS BIGINT) AS n_lines,
    CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS t_wlen,
    CAST(n_hash + n_dots AS BIGINT) AS n_sym,
    CAST(len(list_filter(l, x -> regexp_matches(x, '^- '))) AS BIGINT) AS n_bullet,
    CAST(len(list_filter(l, x -> regexp_matches(x, '\\.\\.\\.$$'))) AS BIGINT) AS n_ell,
    CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
    CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
      s -> list_contains(w, s))) AS BIGINT) AS n_stop_kinds
  FROM f)
SELECT doc_id, n_words, n_lines,
  (n_words BETWEEN 50 AND 100000) AS r_wordcount,
  (3 * n_words <= t_wlen AND t_wlen <= 10 * n_words) AS r_meanlen,
  (10 * n_sym < n_words) AS r_symbol,
  (10 * n_bullet < 9 * n_lines) AS r_bullet,
  (10 * n_ell < 3 * n_lines) AS r_ellipsis,
  (5 * n_alpha >= 4 * n_words) AS r_alpha,
  (n_stop_kinds >= 2) AS r_stop,
  ((n_words BETWEEN 50 AND 100000)
    AND (3 * n_words <= t_wlen AND t_wlen <= 10 * n_words)
    AND (10 * n_sym < n_words)
    AND (10 * n_bullet < 9 * n_lines)
    AND (10 * n_ell < 3 * n_lines)
    AND (5 * n_alpha >= 4 * n_words)
    AND (n_stop_kinds >= 2)) AS pass
FROM m"""

  /** t27: Gopher repetition suite — mirror of TextOps.gopherRepetition
    * over the driver query's repetition-augmented corpus (duplicate
    * lines / paragraphs / n-gram runs keyed on doc_id so every rule is
    * non-vacuous). Duplicate rows are occurrences beyond the first of a
    * distinct value; duplicate chars charge those repeats' lengths; the
    * top-n-gram char share is max-count × gram length with the count
    * tie broken toward the longest tied gram — definitions shared
    * symbol-for-symbol with the Spark op. All shares cross-multiplied
    * to integer comparisons at the paper's thresholds.
    */
  def gopherRepetitionSql: String = {
    // top-n-gram char cover RELATIONALLY (unnest → per-(doc, gram)
    // count → argmax by (count DESC, length DESC) via row_number) — the
    // idiomatic DuckDB form and O(L log L), mirroring the Spark op's
    // sorted-scan; the O(L²) per-distinct list_filter form is minutes
    // per long document in either engine
    def topCte(n: Int) = {
      val upper = if (n == 2) "len(t)" else s"len(t) - ${n - 2}"
      s"""gr$n AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest($upper, 1)),
    i -> array_to_string(t[i:i+${n - 1}], ' '))) AS g
  FROM f),
top$n AS (
  SELECT doc_id, CAST(c * length(g) AS BIGINT) AS top${n}_chars
  FROM (
    SELECT doc_id, g, count(*) AS c,
      row_number() OVER (PARTITION BY doc_id
        ORDER BY count(*) DESC, length(g) DESC) AS rn
    FROM gr$n GROUP BY doc_id, g)
  WHERE rn = 1)"""
    }
    // dup chars = Σ len(all) − Σ len(distinct) — O(L), identical to
    // Σ_distinct (cnt−1)·len
    def dupChars(a: String) =
      s"""CAST(COALESCE(list_sum(list_transform($a, x -> length(x))), 0)
      - COALESCE(list_sum(list_transform(list_distinct($a), x -> length(x))), 0)
      AS BIGINT)"""
    s"""WITH aug AS (
  SELECT doc_id,
    text ||
    CASE WHEN doc_id % 13 = 0 THEN repeat(chr(10) || 'repeat line one', 3) ELSE '' END ||
    CASE WHEN doc_id % 17 = 0 THEN repeat(chr(10) || chr(10) || 'para block alpha', 2) ELSE '' END ||
    CASE WHEN doc_id % 19 = 0 THEN repeat(' spam', 6) ELSE '' END AS text
  FROM documents),
f AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
    string_split(text, chr(10)) AS lns,
    string_split(text, chr(10) || chr(10)) AS prs,
    string_split(text, ' ') AS t
  FROM aug),
${topCte(2)},
${topCte(3)},
${topCte(4)},
d AS (
  SELECT f.doc_id, n_chars,
    CAST(len(lns) AS BIGINT) AS n_lines,
    CAST(len(lns) - len(list_distinct(lns)) AS BIGINT) AS dup_lines,
    ${dupChars("lns")} AS dup_line_chars,
    CAST(len(prs) AS BIGINT) AS n_paras,
    CAST(len(prs) - len(list_distinct(prs)) AS BIGINT) AS dup_paras,
    ${dupChars("prs")} AS dup_para_chars,
    COALESCE(top2.top2_chars, 0) AS top2_chars,
    COALESCE(top3.top3_chars, 0) AS top3_chars,
    COALESCE(top4.top4_chars, 0) AS top4_chars
  FROM f
  LEFT JOIN top2 ON top2.doc_id = f.doc_id
  LEFT JOIN top3 ON top3.doc_id = f.doc_id
  LEFT JOIN top4 ON top4.doc_id = f.doc_id)
SELECT doc_id, n_chars, n_lines, dup_lines, dup_line_chars,
  n_paras, dup_paras, dup_para_chars, top2_chars, top3_chars, top4_chars,
  (10 * dup_lines <= 3 * n_lines) AS r_dup_line,
  (10 * dup_paras <= 3 * n_paras) AS r_dup_para,
  (5 * dup_line_chars <= n_chars) AS r_dup_line_chars,
  (5 * dup_para_chars <= n_chars) AS r_dup_para_chars,
  (5 * top2_chars <= n_chars) AS r_top2,
  (50 * top3_chars <= 9 * n_chars) AS r_top3,
  (25 * top4_chars <= 4 * n_chars) AS r_top4,
  ((10 * dup_lines <= 3 * n_lines) AND (10 * dup_paras <= 3 * n_paras)
    AND (5 * dup_line_chars <= n_chars) AND (5 * dup_para_chars <= n_chars)
    AND (5 * top2_chars <= n_chars) AND (50 * top3_chars <= 9 * n_chars)
    AND (25 * top4_chars <= 4 * n_chars)) AS pass
FROM d"""
  }

  /** t20: deterministic global training-order shuffle — the oracle
    * states the semantics directly (row_number over the global
    * (hash, doc_id) order); the Spark operator reaches the identical
    * permutation through range-bucketed offsets + bounded per-bucket
    * windows (no global sort).
    */
  def globalShuffleSql: String = {
    val mul = graft.functions.VectorOps.HashMul
    s"""WITH h AS (
  SELECT doc_id,
    (${ph("'gs|' || CAST(doc_id AS VARCHAR)")} * $mul) % $P31 AS h
  FROM documents)
SELECT doc_id, h AS shuffle_key,
  CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
FROM h"""
  }

  /** t15: segment-level dedup — mirror of TextOps.segmentDedup. The
    * oracle uses the row_number window (the oracle tier); the Spark
    * operator's min-struct aggregate is keep-first-identical. string_agg
    * ORDER BY seg_idx = concat_ws over the array_sort'ed struct list;
    * empty survivors COALESCE to '' to match concat_ws's non-null "".
    */
  def segmentDedupSql(segTokens: Int = 10): String = {
    val w = segTokens
    s"""WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
e AS (
  SELECT doc_id, toks,
    unnest(range((len(toks) + ${w - 1}) // $w)) AS seg_idx
  FROM t),
segs AS (
  SELECT doc_id, CAST(seg_idx AS INT) AS seg_idx,
    array_to_string(toks[seg_idx*$w+1 : seg_idx*$w+$w], ' ') AS seg
  FROM e),
ranked AS (
  SELECT doc_id, seg_idx, seg,
    row_number() OVER (PARTITION BY sha256(seg)
                       ORDER BY doc_id, seg_idx) AS rn
  FROM segs)
SELECT doc_id, count(*) AS n_segs,
  count(*) FILTER (WHERE rn = 1) AS n_kept,
  COALESCE(string_agg(seg, ' ' ORDER BY seg_idx) FILTER (WHERE rn = 1),
           '') AS clean_text
FROM ranked GROUP BY doc_id"""
  }

  /** t14: unigram LM quality — mirror of TextOps.unigramQuality. The
    * per-token logprob is length(bin(cnt)) (integer ⌊log₂⌋+1, identical
    * in both engines); DuckDB's integer sum widens to HUGEINT so it is
    * CAST back to BIGINT; `div`/`//` agree on positive operands.
    */
  def unigramQualitySql(vocabSize: Int = 256): String =
    s"""WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
vocab AS (
  SELECT tok, cnt FROM freq
  ORDER BY cnt DESC, ${ph("tok")} ASC, tok ASC LIMIT $vocabSize),
scored AS (
  SELECT t.doc_id, count(*) AS n_tok, count(v.cnt) AS n_invocab,
    CAST(COALESCE(sum(length(bin(v.cnt))), 0) AS BIGINT) AS logprob_sum
  FROM toks t LEFT JOIN vocab v USING (tok)
  GROUP BY t.doc_id)
SELECT doc_id, n_tok, n_invocab, logprob_sum,
  (100 * logprob_sum) // n_tok AS score_x100
FROM scored"""

  /** t25/t29: bigram LM quality — mirror of TextOps.bigramLmQuality:
    * hashed bigram/prefix counts with multiplicity, quantized conditional
    * nll q(c(w1·)) − q(c(w1 w2)) summed per doc. Each term clamps at 0
    * (a hash collision could invert c1/c2 and a negative sum would expose
    * `div` vs `//` rounding — ADVICE r4); `minCount` > 1 prunes the model
    * tables and scores pruned entries as unseen (count 1), matching the
    * Spark op's broadcast-pruned form.
    */
  /** The bigram-LM CTE chain ending in `bscored` (doc_id, n_bg,
    * nll_sum) — shared by t25/t29's score dump and t31's tercile
    * consumer.
    */
  private def bigramCtes(minCount: Long): String = {
    val (joins, c2e, c1e) =
      if (minCount == 1L)
        ("JOIN bc2 USING (f2) JOIN bc1 USING (f1)", "c2", "c1")
      else
        (s"""LEFT JOIN (SELECT * FROM bc2 WHERE c2 >= $minCount) p2 USING (f2)
  LEFT JOIN (SELECT * FROM bc1 WHERE c1 >= $minCount) p1 USING (f1)""",
          "COALESCE(c2, 1)", "COALESCE(c1, 1)")
    s"""big AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(len(t), 1)),
    i -> t[i] || ' ' || t[i+1])) AS bg
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
bf AS (
  SELECT doc_id, ${ph("bg")} AS f2,
    ${ph("split_part(bg, ' ', 1)")} AS f1
  FROM big),
bc2 AS (SELECT f2, count(*) AS c2 FROM bf GROUP BY f2),
bc1 AS (SELECT f1, count(*) AS c1 FROM bf GROUP BY f1),
bscored AS (
  SELECT doc_id, count(*) AS n_bg,
    CAST(sum(greatest(0, length(bin($c1e)) - length(bin($c2e))))
      AS BIGINT) AS nll_sum
  FROM bf $joins
  GROUP BY doc_id)"""
  }

  def bigramLmSql(minCount: Long = 1L): String =
    s"""WITH ${bigramCtes(minCount)}
SELECT doc_id, n_bg, nll_sum, (100 * nll_sum) // n_bg AS nll_x100
FROM bscored"""

  /** t31: CCNet terciles under the bigram LM — per-language thresholds
    * from a rank window over the nll (ASC: lower nll = more fluent =
    * head; the comparisons are flipped vs t21's score ordering).
    */
  def perplexityBucketsSql(minCount: Long = 1L): String =
    s"""WITH ${bigramCtes(minCount)},
lmscored AS (
  SELECT d.doc_id, d.lang, (100 * b.nll_sum) // b.n_bg AS nll_x100
  FROM documents d JOIN bscored b ON b.doc_id = d.doc_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY lang
      ORDER BY nll_x100 ASC, doc_id) AS rn,
    count(*) OVER (PARTITION BY lang) AS n
  FROM lmscored),
th AS (
  SELECT lang,
    max(CASE WHEN rn = (n + 2) // 3 THEN nll_x100 END) AS t_head,
    max(CASE WHEN rn = (2 * n + 2) // 3 THEN nll_x100 END) AS t_mid
  FROM ranked GROUP BY lang)
SELECT doc_id, s.lang, nll_x100,
  CASE WHEN nll_x100 <= t_head THEN 'head'
       WHEN nll_x100 <= t_mid THEN 'middle'
       ELSE 'tail' END AS bucket
FROM lmscored s JOIN th ON s.lang = th.lang"""

  /** t26: trained-BPE token counts — the unrolled mirror of
    * TextOps.bpeTrainMerges + bpeTokenCounts. Round t: pair counts over
    * the round-(t-1) representations of the distinct-word table (pairs
    * tab-joined through one unnest, then split back), the top pair by
    * (count DESC, a, b), and one replace() applying it. The pipe-wrapped
    * symbol encoding makes replace() a correct greedy BPE merge — see
    * the Spark op's bpeWrap scaladoc for the double-delimiter argument.
    * Final: per-doc symbol counts joined back through the word explode
    * (LEFT JOIN so wordless docs score 0, like the in-row aggregate).
    */
  /** The trained-BPE CTE chain (bw word explode, wc vocab counts, r0
    * char representations, then per-merge-round pair-count/argmax/replace
    * CTEs up to r`nMerges`) — shared by t26's count dump and t30's
    * budget consumer.
    */
  // Every round CTE is MATERIALIZED: DuckDB inlines CTEs by default and
  // each round references its predecessor TWICE (pair counts + replace),
  // so inlining re-evaluates r_{t-1} per reference — 2^nMerges copies of
  // the round-0 work (measured: the 12-merge chain fell from ~5.5 min to
  // seconds once pinned). Spark's side has no analog problem (each round
  // is a driver-collected 1-row aggregate over a cached count table).
  private def bpeCtes(nMerges: Int): String = {
    val sb = new StringBuilder(s"""bw AS MATERIALIZED (
  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS w
  FROM documents),
wc AS (SELECT w, count(*) AS cnt FROM bw GROUP BY w),
r0 AS MATERIALIZED (
  SELECT w, cnt, regexp_replace(w, '(.)', '|\\1|', 'g') AS repr FROM wc)""")
    for (t <- 1 to nMerges) {
      val prev = s"r${t - 1}"
      sb.append(s""",
p$t AS (
  SELECT split_part(pr, chr(9), 1) AS a, split_part(pr, chr(9), 2) AS b,
    CAST(sum(cnt) AS BIGINT) AS c
  FROM (
    SELECT cnt, unnest(list_transform(range(1, len(syms)),
      i -> syms[i] || chr(9) || syms[i+1])) AS pr
    FROM (SELECT cnt, string_split(trim(repr, '|'), '||') AS syms
          FROM $prev))
  GROUP BY a, b),
m$t AS (SELECT a, b FROM p$t ORDER BY c DESC, a, b LIMIT 1),
r$t AS MATERIALIZED (
  SELECT w, cnt,
    replace(repr, '|' || a || '||' || b || '|', '|' || a || b || '|') AS repr
  FROM $prev CROSS JOIN m$t)""")
    }
    sb.toString
  }

  def bpeSql(nMerges: Int = 12): String =
    s"""WITH ${bpeCtes(nMerges)}
SELECT d.doc_id, COALESCE(t.n_words, 0) AS n_words,
  COALESCE(t.bpe_tokens, 0) AS bpe_tokens
FROM documents d LEFT JOIN (
  SELECT doc_id, count(*) AS n_words,
    CAST(sum((length(repr) - length(replace(repr, '|', ''))) // 2)
      AS BIGINT) AS bpe_tokens
  FROM bw JOIN r$nMerges USING (w) GROUP BY doc_id) t USING (doc_id)"""

  /** t36: tokenizer-fertility gate — t26's per-doc BPE token replay per
    * 1000 chars, kept iff within ±25% of the corpus mean fertility
    * (mirrors TextOps.bpeFertilityGate's cross-multiplied integers).
    */
  def bpeFertilitySql(nMerges: Int = 12): String =
    // sc is MATERIALIZED: DuckDB inlines CTEs by default, and sc sits on
    // the whole nMerges-round merge chain — referenced twice (mean +
    // scoring) it would re-run the chain per reference; mn joins in ONCE
    // (a 1-row cross join) instead of per-row scalar subqueries
    s"""WITH ${bpeCtes(nMerges)},
sc AS MATERIALIZED (
  SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
    COALESCE(t.bpe_tokens, 0) AS bpe_tokens
  FROM documents d LEFT JOIN (
    SELECT doc_id,
      CAST(sum((length(repr) - length(replace(repr, '|', ''))) // 2)
        AS BIGINT) AS bpe_tokens
    FROM bw JOIN r$nMerges USING (w) GROUP BY doc_id) t USING (doc_id)),
mn AS (
  SELECT CAST(sum(bpe_tokens) * 1000 // sum(n_chars) AS BIGINT) AS m
  FROM sc)
SELECT doc_id, n_chars, bpe_tokens, fert_x1k,
  (abs(fert_x1k - m) * 4 <= m) AS keep
FROM (
  SELECT doc_id, n_chars, bpe_tokens,
    CAST(bpe_tokens * 1000 // greatest(n_chars, 1) AS BIGINT) AS fert_x1k, m
  FROM sc CROSS JOIN mn)"""

  /** t30: per-source token-budget sampling under the trained tokenizer —
    * t18's hash/window chain with the count column swapped for the
    * replayed-merge BPE token count (mirror of TextOps.bpeBudgetSample).
    */
  def bpeBudgetSql(nMerges: Int = 12, budget: Long = 3000L): String = {
    val mul = graft.functions.VectorOps.HashMul
    s"""WITH ${bpeCtes(nMerges)},
bt AS (
  SELECT d.doc_id, d.source, COALESCE(t.bpe_tokens, 0) AS n_tok
  FROM documents d LEFT JOIN (
    SELECT doc_id,
      CAST(sum((length(repr) - length(replace(repr, '|', ''))) // 2)
        AS BIGINT) AS bpe_tokens
    FROM bw JOIN r$nMerges USING (w) GROUP BY doc_id) t USING (doc_id)),
h AS (
  SELECT doc_id, source, n_tok,
    (${ph("'tbs|' || CAST(doc_id AS VARCHAR)")} * $mul) % $P31 AS h
  FROM bt),
s AS (
  SELECT doc_id, source, n_tok,
    COALESCE(sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
  FROM h)
SELECT doc_id, source, n_tok FROM s WHERE cb < $budget"""
  }

  /** t21: CCNet head/middle/tail quality buckets — the t14 chain with
    * lang carried through, then DISCRETE per-language tercile thresholds
    * (score of the ⌈n/3⌉-th / ⌈2n/3⌉-th doc in DESC score order; the
    * oracle states them with a rank window, the Spark operator derives
    * the same values from a score histogram + driver cumsum).
    */
  def qualityBucketsSql(vocabSize: Int = 256): String =
    s"""WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents),
freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
vocab AS (
  SELECT tok, cnt FROM freq
  ORDER BY cnt DESC, ${ph("tok")} ASC, tok ASC LIMIT $vocabSize),
scored AS (
  SELECT t.doc_id, t.lang,
    (100 * CAST(COALESCE(sum(length(bin(v.cnt))), 0) AS BIGINT))
      // count(*) AS score_x100
  FROM toks t LEFT JOIN vocab v USING (tok)
  GROUP BY t.doc_id, t.lang),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY lang
      ORDER BY score_x100 DESC, doc_id) AS rn,
    count(*) OVER (PARTITION BY lang) AS n
  FROM scored),
th AS (
  SELECT lang,
    max(CASE WHEN rn = (n + 2) // 3 THEN score_x100 END) AS t_head,
    max(CASE WHEN rn = (2 * n + 2) // 3 THEN score_x100 END) AS t_mid
  FROM ranked GROUP BY lang)
SELECT doc_id, s.lang, score_x100,
  CASE WHEN score_x100 >= t_head THEN 'head'
       WHEN score_x100 >= t_mid THEN 'middle'
       ELSE 'tail' END AS bucket
FROM scored s JOIN th ON s.lang = th.lang"""

  /** t22: deterministic mixture resampling — mirror of TextOps.upsample
    * (⌊w⌋ copies + one hash-gated fractional copy; w = 0 drops the
    * source, unlisted sources take the default weight).
    */
  def upsampleSql(weightsX1000: Seq[(String, Long)],
                  defaultX1000: Long = 1000L): String = {
    val mul = graft.functions.VectorOps.HashMul
    val vals = weightsX1000
      .map { case (s, w) => s"('$s', CAST($w AS BIGINT))" }.mkString(", ")
    s"""WITH w(source, wx) AS (VALUES $vals),
c AS (
  SELECT doc_id, d.source,
    COALESCE(w.wx, $defaultX1000) // 1000 +
    CASE WHEN (${ph("'up|' || CAST(doc_id AS VARCHAR)")} * $mul) % $P31
          % 1000 < COALESCE(w.wx, $defaultX1000) % 1000
         THEN 1 ELSE 0 END AS copies
  FROM documents d LEFT JOIN w ON d.source = w.source)
SELECT doc_id, source, CAST(unnest(range(copies)) AS BIGINT) AS copy
FROM c"""
  }

  /** t17: DSIR importance weights — hashed-bigram features with
    * multiplicity (NO distinct, unlike the shingle CTEs), raw vs
    * target-slice bucket counts, per-occurrence weight
    * length(bin(tc+1)) − length(bin(rc+1)) summed per doc. DuckDB's
    * sum(BIGINT) widens to HUGEINT, so the sum is CAST back (the t14
    * discipline); subtraction order and +1 smoothing mirror
    * TextOps.dsirWeights digit-for-digit.
    */
  def dsirWeightsSql(targetSource: String = "src0",
                     buckets: Int = 256): String =
    s"""WITH big AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(len(t), 1)),
    i -> t[i] || ' ' || t[i+1])) AS bg
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
feat AS (SELECT doc_id, ${ph("bg")} % $buckets AS f FROM big),
raw AS (SELECT f, count(*) AS rc FROM feat GROUP BY f),
tgt AS (
  SELECT feat.f, count(*) AS tc FROM feat
  JOIN documents d USING (doc_id)
  WHERE d.source = '$targetSource' GROUP BY feat.f),
wt AS (
  SELECT r.f,
    length(bin(COALESCE(t.tc, 0) + 1)) - length(bin(r.rc + 1)) AS w
  FROM raw r LEFT JOIN tgt t ON t.f = r.f),
scored AS (
  SELECT doc_id, count(*) AS n_big, CAST(sum(w) AS BIGINT) AS logw
  FROM feat JOIN wt USING (f) GROUP BY doc_id)
SELECT d.doc_id, COALESCE(s.n_big, 0) AS n_big, COALESCE(s.logw, 0) AS logw
FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id"""

  /** t28: Naive-Bayes quality classifier — mirror of TextOps.nbQuality:
    * hashed-bigram features with multiplicity, ONE conditional per-class
    * count per feature (FILTER, matching Spark's count(when(…))),
    * integer log₂ log-odds q(pc+1) − q(nc+1) summed per doc, verdict
    * logodds > 0. Sum widens to HUGEINT in DuckDB → CAST back (t14
    * discipline); docs with no bigrams score (0, 0, false) through the
    * LEFT JOIN like the Spark op's coalesce.
    */
  def nbQualitySql(positiveSources: Seq[String] = Seq("src0", "src1"),
                   buckets: Int = 256): String = {
    val inList = positiveSources.map(s => s"'$s'").mkString(", ")
    s"""WITH big AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(len(t), 1)),
    i -> t[i] || ' ' || t[i+1])) AS bg
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
feat AS (SELECT doc_id, ${ph("bg")} % $buckets AS f FROM big),
cls AS (
  SELECT feat.f,
    count(*) FILTER (WHERE d.source IN ($inList)) AS pc,
    count(*) FILTER (WHERE d.source NOT IN ($inList)) AS nc
  FROM feat JOIN documents d USING (doc_id) GROUP BY feat.f),
wt AS (SELECT f, length(bin(pc + 1)) - length(bin(nc + 1)) AS w FROM cls),
scored AS (
  SELECT doc_id, count(*) AS n_feat, CAST(sum(w) AS BIGINT) AS logodds
  FROM feat JOIN wt USING (f) GROUP BY doc_id)
SELECT d.doc_id, COALESCE(s.n_feat, 0) AS n_feat,
  COALESCE(s.logodds, 0) AS logodds,
  COALESCE(s.logodds, 0) > 0 AS is_high
FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id"""
  }

  /** t34: C4 cleaning pass — mirror of TextOps.c4Rules over
    * TextOps.synthesizeLines' deterministic line rendering (k-word lines,
    * k = doc_id % 7 + 3; terminal-punct cycle by (doc_id + line) % 4;
    * '{x}' / 'javascript' / 'lorem ipsum' contaminants on the documented
    * doc_id keys). Line retention = terminal punct AND ≥5 words AND no
    * 'javascript' word; page gates = ≥3 sentence marks in retained text,
    * no '{', no 'lorem ipsum'. All counts exact integers — replayed
    * symbol-for-symbol from the generator arithmetic.
    */
  def c4RulesSql: String =
    """WITH b AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         CAST(doc_id % 7 + 3 AS BIGINT) AS k
  FROM documents),
p AS (
  SELECT doc_id, ws, k, (len(ws) + k - 1) // k AS nl FROM b),
s AS (
  SELECT doc_id,
    list_transform(range(1, nl + 1), i ->
      array_to_string(list_slice(ws, (i - 1) * k + 1, i * k), ' ')
      || CASE WHEN (doc_id + i) % 13 = 0 THEN ' {x}' ELSE '' END
      || CASE WHEN (doc_id + i) % 11 = 0 THEN ' javascript' ELSE '' END
      || CASE WHEN doc_id % 17 = 0 AND i = 1 THEN ' lorem ipsum' ELSE '' END
      || CASE CAST((doc_id + i) % 4 AS INT) WHEN 0 THEN '.' WHEN 1 THEN '?'
              WHEN 2 THEN '!' ELSE '' END) AS lines
  FROM p),
f AS (
  SELECT doc_id, lines,
    list_filter(lines, l -> regexp_matches(l, '[.!?"]$')
      AND len(string_split(l, ' ')) >= 5
      AND NOT regexp_matches(l, '\bjavascript\b')) AS kept,
    array_to_string(lines, chr(10)) AS text
  FROM s),
m AS (
  SELECT doc_id,
    CAST(len(lines) AS BIGINT) AS n_lines,
    CAST(len(kept) AS BIGINT) AS n_kept,
    COALESCE(array_to_string(kept, chr(10)), '') AS kept_text,
    contains(text, '{') AS has_brace,
    contains(text, 'lorem ipsum') AS has_lorem
  FROM f)
SELECT doc_id, n_lines, n_kept,
  CAST(length(kept_text)
    - length(regexp_replace(kept_text, '[.!?]', '', 'g')) AS BIGINT)
    AS n_sentences,
  CAST(length(kept_text) AS BIGINT) AS kept_chars,
  (length(kept_text)
    - length(regexp_replace(kept_text, '[.!?]', '', 'g')) >= 3) AS r_sent,
  NOT has_brace AS r_brace,
  NOT has_lorem AS r_lorem,
  (length(kept_text)
    - length(regexp_replace(kept_text, '[.!?]', '', 'g')) >= 3
    AND NOT has_brace AND NOT has_lorem) AS pass
FROM m"""

  /** d20: content-defined chunking dedup — the same boundary rule as
    * TextOps.cdcDupChunks (rolling window-char PolyHash31 ≡ 0 mod divisor
    * at 1-based end positions window..L-1; the document tail always
    * closes the last chunk), chunks identified by sha256, cross-doc
    * duplicated chunks with doc/occurrence counts.
    */
  def cdcDupChunksSql(window: Int = 8, divisor: Long = 64L): String =
    s"""WITH ${cdcChunkCtes(window, divisor)}
SELECT chunk_hash,
  CAST(min(clen) AS BIGINT) AS chunk_len,
  count(DISTINCT doc_id) AS n_docs,
  count(*) AS n_occ
FROM chrows
GROUP BY 1
HAVING count(DISTINCT doc_id) >= 2"""

  /** The CDC chunk relation CTEs shared by d20/d21 — mirror of
    * TextOps.cdcChunkRows.
    */
  private def cdcChunkCtes(window: Int, divisor: Long): String =
    s"""bounds AS (
  SELECT doc_id, text,
    list_append(
      list_filter(range($window, length(text)),
        i -> ${ph(s"substr(text, i - ${window - 1}, $window)")} % $divisor = 0),
      length(text)) AS ends
  FROM documents),
chunks AS (
  SELECT doc_id,
    unnest(list_transform(range(1, len(ends) + 1),
      j -> substr(text,
        CAST(CASE WHEN j = 1 THEN 1 ELSE ends[j - 1] + 1 END AS INT),
        CAST(ends[j] - (CASE WHEN j = 1 THEN 1 ELSE ends[j - 1] + 1 END) + 1
          AS INT)))) AS chunk
  FROM bounds),
chrows AS (
  SELECT doc_id, sha256(chunk) AS chunk_hash,
    CAST(length(chunk) AS BIGINT) AS clen
  FROM chunks)"""

  /** d21: boilerplate-fraction gate — per doc, character mass in chunks
    * shared with ≥ 2 distinct docs, keep iff dup_chars·den < n_chars·num.
    */
  def cdcBoilerplateGateSql(window: Int = 8, divisor: Long = 64L,
                            num: Int = 1, den: Int = 2): String =
    s"""WITH ${cdcChunkCtes(window, divisor)},
dup AS (
  SELECT chunk_hash FROM chrows
  GROUP BY chunk_hash HAVING count(DISTINCT doc_id) >= 2),
per AS (
  SELECT doc_id, CAST(sum(clen) AS BIGINT) AS dc
  FROM chrows JOIN dup USING (chunk_hash)
  GROUP BY doc_id)
SELECT d.doc_id,
  CAST(length(d.text) AS BIGINT) AS n_chars,
  COALESCE(dc, 0) AS dup_chars,
  (COALESCE(dc, 0) * $den < length(d.text) * $num) AS keep
FROM documents d LEFT JOIN per USING (doc_id)"""

  /** d5: per-doc content fingerprints (order-sensitive polynomial + 62-bit
    * SimHash).
    */
  def fingerprintSql: String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
$simhashFpCtes
SELECT d.doc_id, ${ph("d.text")} AS rhash, fp.fp AS simhash
FROM documents d JOIN fp ON fp.doc_id = d.doc_id"""
}
