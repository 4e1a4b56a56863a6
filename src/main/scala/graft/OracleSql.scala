package graft

import graft.functions.PortableMinHash
import graft.operators.Similarity

/** DuckDB SQL generators for oracle entries whose Spark queries use
  * hash-seeded or floating-point-sensitive operators.
  *
  * Strategy: rather than weakening those checks to rows-only, the SQL
  * replays the ENTIRE algorithm bit-for-bit in DuckDB:
  *
  *   - `graft.plans.RollingHash` is replayed as a HUGEINT fold over the
  *     hex dump of the string's UTF-8 bytes, reduced mod 2^64 each step
  *     — exactly Java's wrapping long arithmetic;
  *   - every double-precision dot product is expanded to an explicit
  *     per-dimension left-associated sum of CAST(float)·CAST(float)
  *     products — the same IEEE operations in the same order as
  *     `FloatVecDot`'s codegen loop — with seeded plane constants
  *     embedded as shortest-round-trip double literals, so even sign
  *     decisions at LSH bucket boundaries agree across engines;
  *   - seeded constants (hyperplanes, MinHash affine parameters, the
  *     IVF pick order) come from the same Scala objects the operators
  *     use, so query and oracle cannot drift apart.
  *
  * The result: the approximate operators (MinHash-LSH, SimHash, LSH and
  * IVF ANN) carry full row/schema/hash oracles that verify the
  * implementation; recall-vs-exact is asserted separately in specs
  * against the exact tiers.
  */
object OracleSql {

  // ------------------------------------------------------------ n-grams

  /** Shared CTE chain: word trigram sets per doc (`tri(doc_id, g)`) and
    * per-doc set sizes (`sz(doc_id, n)`).
    */
  val wordTriCtes: String =
    "wrd AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws FROM documents), " +
      "tri AS (SELECT DISTINCT doc_id, g FROM (SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] " +
      "FOR i IN generate_series(1, len(ws) - 2)]) AS g FROM wrd) u), " +
      "sz AS (SELECT doc_id, count(*) AS n FROM tri GROUP BY doc_id)"

  /** tri/sz plus all-pairs overlaps and integer-thresholded pairs
    * (`pairs(id_a, id_b, inter, union_size)`).
    */
  def ngramPairCtes(threshNum: Int, threshDen: Int): String =
    s"$wordTriCtes, " +
      "ov AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter FROM tri a JOIN tri b " +
      "ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
      "pairs AS (SELECT ov.id_a, ov.id_b, ov.inter, sa.n + sb.n - ov.inter AS union_size " +
      "FROM ov JOIN sz sa ON sa.doc_id = ov.id_a JOIN sz sb ON sb.doc_id = ov.id_b " +
      s"WHERE ov.inter * $threshDen >= (sa.n + sb.n - ov.inter) * $threshNum)"

  /** Capped variant of the pair scan: grams held by more than
    * `maxGramDf` docs (or exactly one) are excluded from pair
    * generation AND overlap counts, while `union_size` still counts
    * every gram — `Dedup.ngramJaccardPairs(maxGramDf = …)` semantics.
    */
  def dedupNgramCapped(threshNum: Int, threshDen: Int, maxGramDf: Int): String =
    s"WITH $wordTriCtes, " +
      s"elig AS (SELECT g FROM tri GROUP BY g HAVING count(*) BETWEEN 2 AND $maxGramDf), " +
      "ov AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter " +
      "FROM tri a JOIN elig e ON a.g = e.g JOIN tri b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
      "SELECT ov.id_a, ov.id_b, ov.inter, sa.n + sb.n - ov.inter AS union_size " +
      "FROM ov JOIN sz sa ON sa.doc_id = ov.id_a JOIN sz sb ON sb.doc_id = ov.id_b " +
      s"WHERE ov.inter * $threshDen >= (sa.n + sb.n - ov.inter) * $threshNum"

  // ------------------------------------------------- rolling-hash replay

  /** Unsigned 64-bit replay of `graft.plans.RollingHash` (HUGEINT in
    * [0, 2^64)): polynomial fold over the byte list parsed out of
    * `hex(encode(<string>))`, mod 2^64 each step. `hx` names a column
    * holding that hex dump.
    */
  private def rollFold(hx: String): String =
    s"(CASE WHEN length($hx) = 0 THEN 0::HUGEINT ELSE list_reduce(" +
      s"[((position(substr($hx, 2*i-1, 1) IN '0123456789ABCDEF') - 1) * 16 + " +
      s"position(substr($hx, 2*i, 1) IN '0123456789ABCDEF') - 1)::HUGEINT " +
      s"FOR i IN generate_series(1, length($hx) // 2)], " +
      s"(a, x) -> (a * 1315423911 + x) % 18446744073709551616) END)"

  /** Top 40 bits of md5(strExpr) as a BIGINT — the big-endian hex-digit
    * fold of the first 10 hex chars, mirroring the Spark side's
    * `conv(substring(md5(x), 1, 10), 16, 10)`. The avalanched uniform
    * behind the derandomized-noise operators (DP release, bootstrap).
    */
  private def md5U40(strExpr: String): String = {
    val h = s"md5($strExpr)"
    (1 to 10).map(i =>
      s"(CAST(position(substr($h, $i, 1) IN '0123456789abcdef') AS BIGINT) - 1) * ${1L << (4 * (10 - i))}")
      .mkString("(", " + ", ")")
  }

  /** Two's-complement reinterpretation of an unsigned 64-bit HUGEINT as
    * the signed BIGINT Spark's LongType holds.
    */
  private def toSigned(e: String): String =
    s"(CAST(CASE WHEN $e >= 9223372036854775808 THEN $e - 18446744073709551616 ELSE $e END AS BIGINT))"

  /** Oracle for `text_rolling_fp`: rolling hash of the
    * whitespace-collapsed lowercased text, as a signed 64-bit value.
    */
  def textRollingFp: String =
    "WITH nrm AS (SELECT doc_id, hex(encode(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))) AS hx FROM documents), " +
      s"h AS (SELECT doc_id, ${rollFold("hx")} AS hu FROM nrm) " +
      s"SELECT doc_id, ${toSigned("hu")} AS rolling_fp FROM h"

  /** Oracle for `dedup_simhash` (portable signatures): per-token rolling
    * hash, ±1 votes per bit, sign-of-sum signature. Bit i of the
    * unsigned HUGEINT token hash equals bit i of Spark's signed long —
    * `(h >> i) & 1` masks away the representation difference.
    */
  def dedupSimhash: String = {
    val bitSums = (0 until 64)
      .map(i => s"sum(CASE WHEN (hu >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
      .mkString(", ")
    val sig = (0 until 64).map { i =>
      if (i < 63) s"(CASE WHEN b$i > 0 THEN ${1L << i}::BIGINT ELSE 0 END)"
      else s"(CASE WHEN b63 > 0 THEN (-9223372036854775807 - 1)::BIGINT ELSE 0 END)"
    }.mkString(" + ")
    "WITH tk AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok FROM documents), " +
      "thx AS (SELECT doc_id, hex(encode(tok)) AS hx FROM tk), " +
      s"th AS (SELECT doc_id, ${rollFold("hx")} AS hu FROM thx), " +
      s"bits AS (SELECT doc_id, $bitSums FROM th GROUP BY doc_id) " +
      s"SELECT doc_id, $sig AS simhash FROM bits"
  }

  /** Oracle for `dedup_minhash_lsh` (portable family): affine min-hashes
    * over the low 40 bits of the per-gram rolling hash, banded,
    * candidates from band-bucket equality, exact integer-Jaccard verify.
    * Affine constants come from [[graft.functions.PortableMinHash]] —
    * the same objects the Spark operator reads.
    */
  def dedupMinhashLsh(numHashes: Int, numBands: Int, threshNum: Int, threshDen: Int): String = {
    require(numHashes % numBands == 0)
    val r = numHashes / numBands
    val affineVals = (0 until numHashes)
      .map(i => s"($i, ${PortableMinHash.a(i)}, ${PortableMinHash.b(i)})")
      .mkString(", ")
    val bandVals = (0 until r)
      .map(j => s"min(CASE WHEN i % $r = $j THEN mh END) AS v$j")
      .mkString(", ")
    val joinCond = (0 until r).map(j => s"a.v$j = b.v$j").mkString(" AND ")
    s"WITH $wordTriCtes, " +
      "ghx AS (SELECT doc_id, hex(encode(g)) AS hx FROM tri), " +
      s"gh AS (SELECT doc_id, CAST(${rollFold("hx")} % ${PortableMinHash.Mod} AS BIGINT) AS h40 FROM ghx), " +
      s"mh AS (SELECT doc_id, t.i AS i, min((h40 * t.a + t.b) % ${PortableMinHash.Mod}) AS mh " +
      s"FROM gh CROSS JOIN (VALUES $affineVals) t(i, a, b) GROUP BY doc_id, t.i), " +
      s"bands AS (SELECT doc_id, i // $r AS band, $bandVals FROM mh GROUP BY doc_id, i // $r), " +
      s"cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM bands a JOIN bands b " +
      s"ON a.band = b.band AND $joinCond AND a.doc_id < b.doc_id), " +
      "ov AS (SELECT c.id_a, c.id_b, count(*) AS inter FROM cand c " +
      "JOIN tri ta ON ta.doc_id = c.id_a JOIN tri tb ON tb.doc_id = c.id_b AND tb.g = ta.g " +
      "GROUP BY c.id_a, c.id_b) " +
      "SELECT ov.id_a, ov.id_b, ov.inter, sa.n + sb.n - ov.inter AS union_size FROM ov " +
      "JOIN sz sa ON sa.doc_id = ov.id_a JOIN sz sb ON sb.doc_id = ov.id_b " +
      s"WHERE ov.inter * $threshDen >= (sa.n + sb.n - ov.inter) * $threshNum"
  }

  /** Oracle for `shard_rendezvous`: replay of
    * `Layout.rendezvousShard` at `nA` and `nB` = nA+1 shards — the
    * per-key argmax over the portable (salt, shard, key) hash, ties by
    * shard index; the audit counts relocations (all must land on the
    * NEW shard) per old shard.
    */
  def shardRendezvous(nA: Int, nB: Int, salt: String): String = {
    def asg(n: Int, name: String): String =
      s"$name AS (SELECT k, s FROM (SELECT k.k AS k, s.range AS s, " +
        s"row_number() OVER (PARTITION BY k.k ORDER BY " +
        s"md5('hrw:$salt:' || CAST(s.range AS VARCHAR) || ':' || CAST(k.k AS VARCHAR)) DESC, s.range) AS rn " +
        s"FROM k, range($n) s) t WHERE rn = 1)"
    s"WITH k AS (SELECT o_orderkey AS k FROM orders), " +
      asg(nA, "aa") + ", " + asg(nB, "bb") + " " +
      "SELECT CAST(aa.s AS INT) AS s8, CAST(count(*) AS BIGINT) AS n_keys, " +
      s"CAST(sum(CASE WHEN bb.s = ${nB - 1} THEN 1 ELSE 0 END) AS BIGINT) AS n_moved, " +
      s"CAST(sum(CASE WHEN bb.s <> aa.s AND bb.s <> ${nB - 1} THEN 1 ELSE 0 END) AS BIGINT) AS n_misplaced, " +
      s"CAST(sum(CASE WHEN bb.s = ${nB - 1} THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS moved_ppm " +
      "FROM aa JOIN bb ON aa.k = bb.k GROUP BY 1"
  }

  /** Oracle for `dedup_blocking_recall`: the exact-Jaccard truth pairs
    * ([[ngramPairCtes]]) against each band configuration's UNVERIFIED
    * candidate set (band-signature equality — the portable buckets ARE
    * the raw signature values, so candidate sets match exactly), one
    * row per configuration.
    */
  def dedupBlockingRecall(numHashes: Int, bandCounts: Seq[Int],
      threshNum: Int, threshDen: Int): String = {
    require(bandCounts.forall(b => b >= 1 && numHashes % b == 0))
    val affineVals = (0 until numHashes)
      .map(i => s"($i, ${PortableMinHash.a(i)}, ${PortableMinHash.b(i)})")
      .mkString(", ")
    val cfg = bandCounts.map { nb =>
      val r = numHashes / nb
      val bandVals = (0 until r)
        .map(j => s"min(CASE WHEN i % $r = $j THEN mh END) AS v$j")
        .mkString(", ")
      val joinCond = (0 until r).map(j => s"a.v$j = b.v$j").mkString(" AND ")
      s"bands$nb AS (SELECT doc_id, i // $r AS band, $bandVals FROM mh GROUP BY doc_id, i // $r), " +
        s"cand$nb AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM bands$nb a JOIN bands$nb b " +
        s"ON a.band = b.band AND $joinCond AND a.doc_id < b.doc_id)"
    }.mkString(", ")
    val rows = bandCounts.map { nb =>
      s"SELECT $nb AS num_bands, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_true, " +
        s"(SELECT CAST(count(*) AS BIGINT) FROM cand$nb) AS n_candidates, " +
        s"(SELECT CAST(count(*) AS BIGINT) FROM pairs p JOIN cand$nb c " +
        "ON p.id_a = c.id_a AND p.id_b = c.id_b) AS n_caught"
    }.mkString(" UNION ALL ")
    s"WITH ${ngramPairCtes(threshNum, threshDen)}, " +
      "ghx AS (SELECT doc_id, hex(encode(g)) AS hx FROM tri), " +
      s"gh AS (SELECT doc_id, CAST(${rollFold("hx")} % ${PortableMinHash.Mod} AS BIGINT) AS h40 FROM ghx), " +
      s"mh AS (SELECT doc_id, t.i AS i, min((h40 * t.a + t.b) % ${PortableMinHash.Mod}) AS mh " +
      s"FROM gh CROSS JOIN (VALUES $affineVals) t(i, a, b) GROUP BY doc_id, t.i), " +
      s"$cfg " +
      s"SELECT num_bands, n_true, n_candidates, n_caught, n_caught * 1000000 // n_true AS recall_ppm FROM ($rows)"
  }

  /** Oracle for `stream_ingest_replay`: the greedy sequential admission
    * of [[graft.streaming.Streams.foldIngestBatch]] unrolled over
    * `nBatches` doc_id-modulo batches. One full-corpus LSH run
    * ([[dedupMinhashLsh]], the portable family) yields the verified
    * pair set; each batch CTE then admits a doc unless it pairs with a
    * smaller-id SAME-BATCH peer (keep-first within the batch,
    * regardless of that peer's own fate — the raw pair-drop rule) or
    * with an already-ADMITTED doc from any earlier batch (either pair
    * side — rejected docs never enter the index, so they never block a
    * later arrival).
    */
  def streamIngestAdmission(
      numHashes: Int, numBands: Int, threshNum: Int, threshDen: Int,
      nBatches: Int): String = {
    require(nBatches >= 1)
    val batchCtes = (0 until nBatches).map { k =>
      val peerDrop =
        s"NOT EXISTS (SELECT 1 FROM pr JOIN bk p ON pr.id_a = p.doc_id " +
          s"AND p.b = $k WHERE pr.id_b = d.doc_id)"
      val admittedDrop =
        if (k == 0) ""
        else " AND NOT EXISTS (SELECT 1 FROM pr WHERE " +
          s"(pr.id_b = d.doc_id AND pr.id_a IN (SELECT doc_id FROM adm${k - 1})) OR " +
          s"(pr.id_a = d.doc_id AND pr.id_b IN (SELECT doc_id FROM adm${k - 1})))"
      val sk = s"s$k AS (SELECT d.doc_id FROM bk d WHERE d.b = $k AND " +
        peerDrop + admittedDrop + ")"
      val admk =
        if (k == 0) s"adm0 AS (SELECT doc_id FROM s0)"
        else s"adm$k AS (SELECT doc_id FROM adm${k - 1} UNION ALL SELECT doc_id FROM s$k)"
      s"$sk, $admk"
    }.mkString(", ")
    s"WITH pr AS (SELECT id_a, id_b FROM " +
      s"(${dedupMinhashLsh(numHashes, numBands, threshNum, threshDen)})), " +
      s"bk AS (SELECT doc_id, doc_id % $nBatches AS b FROM documents), " +
      s"$batchCtes " +
      s"SELECT CAST(doc_id AS BIGINT) AS doc_id FROM adm${nBatches - 1}"
  }

  // -------------------------------------------------- vector replication

  /** Left-associated per-dimension double dot of two vector columns —
    * the exact operation order of FloatVecDot's codegen loop.
    */
  private def pairDot(va: String, vb: String, dim: Int): String =
    (1 to dim)
      .map(j => s"CAST($va[$j] AS DOUBLE) * CAST($vb[$j] AS DOUBLE)")
      .mkString("(", " + ", ")")

  private def selfDot(vec: String, dim: Int): String = pairDot(vec, vec, dim)

  /** Dot of a vector column against an embedded constant vector. The
    * constants are the float-cast plane values re-widened to double and
    * printed via Java's shortest-round-trip `Double.toString`, so
    * DuckDB's literal parser reconstructs bit-identical doubles.
    */
  private def dotLit(vec: String, xs: Array[Double]): String =
    xs.zipWithIndex
      .map { case (x, j) => s"CAST($vec[${j + 1}] AS DOUBLE) * $x" }
      .mkString("(", " + ", ")")

  /** Sign-random-projection bucket id — replays `Similarity.lshBucket`
    * (planes float-cast exactly as the Spark side does).
    */
  private def bucketExpr(vec: String, planes: Array[Array[Double]]): String =
    planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${dotLit(vec, p.map(_.toFloat.toDouble))} >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private def probeList(numPlanes: Int): String =
    ("bucket" +: (0 until numPlanes).map(i => s"xor(bucket, ${1L << i})"))
      .mkString("[", ", ", "]")

  /** Oracle for `ann_lsh_topk`: full replay of `Similarity.lshTopK`
    * (queries vec_id < 10, candidates >= 10, multi-probe 1-bit flips).
    */
  def annLshTopK(k: Int, numPlanes: Int = 8, dim: Int = 64, seed: Long = 42L): String = {
    val planes = Similarity.hyperplanes(numPlanes, dim, seed)
    s"WITH nb AS (SELECT vec_id, embedding, sqrt(${selfDot("embedding", dim)}) AS nrm, " +
      s"${bucketExpr("embedding", planes)} AS bucket FROM embeddings), " +
      s"q AS (SELECT vec_id AS query_id, unnest(${probeList(numPlanes)}) AS bucket FROM nb WHERE vec_id < 10), " +
      "c AS (SELECT vec_id AS neighbor_id, bucket FROM nb WHERE vec_id >= 10), " +
      "prs AS (SELECT DISTINCT query_id, neighbor_id FROM q JOIN c USING (bucket)), " +
      s"scored AS (SELECT p.query_id, p.neighbor_id, ${pairDot("a.embedding", "b.embedding", dim)} / (a.nrm * b.nrm) AS cosine " +
      "FROM prs p JOIN nb a ON a.vec_id = p.query_id JOIN nb b ON b.vec_id = p.neighbor_id) " +
      "SELECT query_id, neighbor_id, rnk FROM (SELECT query_id, neighbor_id, " +
      "CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rnk " +
      s"FROM scored) t WHERE rnk <= $k"
  }

  /** Oracle for `dedup_embed_lsh`: full replay of
    * `Dedup.embeddingNearDupLsh` — bucket candidates (Hamming ≤ 1 via
    * 1-bit probes), exact double-cosine verification at `threshold`.
    */
  def dedupEmbedLsh(threshold: Double, numPlanes: Int = 8, dim: Int = 64, seed: Long = 42L): String = {
    val planes = Similarity.hyperplanes(numPlanes, dim, seed)
    s"WITH nb AS (SELECT vec_id, embedding, sqrt(${selfDot("embedding", dim)}) AS nrm, " +
      s"${bucketExpr("embedding", planes)} AS bucket FROM embeddings), " +
      s"pa AS (SELECT vec_id, unnest(${probeList(numPlanes)}) AS bucket FROM nb), " +
      "cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b FROM pa a " +
      "JOIN nb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id) " +
      "SELECT c.id_a, c.id_b FROM cand c JOIN nb a ON a.vec_id = c.id_a JOIN nb b ON b.vec_id = c.id_b " +
      s"WHERE ${pairDot("a.embedding", "b.embedding", dim)} >= $threshold * a.nrm * b.nrm"
  }

  /** Shared IVF prologue: `cnd`/`qry` split, the portable
    * (avalanched-md5-ordered) centroid pick, and `cent0` — the seeded,
    * unit-normalized coarse centroids. Lowercase-hex md5 strings
    * compare identically (binary) in both engines.
    */
  private def ivfPrologue(numCentroids: Int, dim: Int, seed: Long,
      candWhere: String = "vec_id >= 10"): String =
    s"base AS (SELECT vec_id, label, embedding, sqrt(${selfDot("embedding", dim)}) AS nrm FROM embeddings), " +
      s"cnd AS (SELECT * FROM base WHERE $candWhere), " +
      "qry AS (SELECT * FROM base WHERE vec_id < 10), " +
      s"ck AS (SELECT vec_id, embedding, nrm, md5('ivf$seed:' || CAST(vec_id AS VARCHAR)) AS h FROM cnd), " +
      s"cpick AS (SELECT embedding, nrm, CAST(row_number() OVER (ORDER BY h, vec_id) AS BIGINT) AS cidx " +
      s"FROM ck ORDER BY h, vec_id LIMIT $numCentroids), " +
      "cent0 AS (SELECT cidx, CASE WHEN nrm = 0 THEN embedding ELSE " +
      s"[CAST(CAST(embedding[j] AS DOUBLE) / nrm AS FLOAT) FOR j IN generate_series(1, $dim)] END AS cvec FROM cpick)"

  /** Shared IVF tail reading centroids from CTE `centName`: cell
    * assignment (argmax cosine, first-max tie-break), query probes,
    * candidate scoring, final per-query ranking.
    */
  private def ivfTail(centName: String, k: Int, nProbe: Int, dim: Int,
      memberWhere: String = "TRUE"): String =
    s"cd AS (SELECT c.vec_id, c.embedding, c.nrm, ct.cidx, ${pairDot("c.embedding", "ct.cvec", dim)} / c.nrm AS dot " +
      s"FROM cnd c CROSS JOIN $centName ct), " +
      "cellasg AS (SELECT vec_id AS neighbor_id, embedding AS c_vec, nrm AS c_norm, cidx AS cell FROM " +
      s"(SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cidx) AS rn FROM cd) t WHERE rn = 1 AND ($memberWhere)), " +
      s"qd AS (SELECT q.vec_id, q.embedding, q.nrm, ct.cidx, ${pairDot("q.embedding", "ct.cvec", dim)} / q.nrm AS dot " +
      s"FROM qry q CROSS JOIN $centName ct), " +
      "probe AS (SELECT vec_id AS query_id, embedding AS q_vec, nrm AS q_norm, cidx AS cell FROM " +
      s"(SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cidx) AS rn FROM qd) t WHERE rn <= $nProbe), " +
      s"scored AS (SELECT p.query_id, ca.neighbor_id, ${pairDot("p.q_vec", "ca.c_vec", dim)} / (p.q_norm * ca.c_norm) AS cosine " +
      "FROM probe p JOIN cellasg ca USING (cell)) " +
      "SELECT query_id, neighbor_id, rnk FROM (SELECT query_id, neighbor_id, " +
      "CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rnk " +
      s"FROM scored) t WHERE rnk <= $k"

  /** Oracle for `ann_ivf_topk`: full replay of `Similarity.ivfTopK`
    * with the portable (rolling-hash-ordered) centroid pick —
    * normalization float-rounding, cell argmax tie-breaks, probe
    * ordering and final ranking all bit-identical.
    */
  def annIvfTopK(k: Int, numCentroids: Int, nProbe: Int, dim: Int = 64, seed: Long = 42L,
      candWhere: String = "vec_id >= 10"): String =
    s"WITH ${ivfPrologue(numCentroids, dim, seed, candWhere)}, " +
      "cent AS (SELECT * FROM cent0), " +
      ivfTail("cent", k, nProbe, dim)

  /** Oracle for `ann_ivf_pruned_io`: the PROBED-CELL KEY SET of an
    * indexed probe — replays the frozen-centroid pick and each query's
    * nProbe nearest cells (the same `rn <= nProbe` probe ranking as
    * [[annIvfTopK]]'s tail) and counts the distinct probed cells. The
    * file-level footprint itself (which parquet files the pruned read
    * opened) is physical evidence only the engine can observe — it is
    * checked by a loud require in `Similarity.ivfProbeIoReport`, which
    * only ever reports `io_pruned = TRUE` rows; what DuckDB verifies is
    * the pruning key set that footprint is bounded by.
    */
  def annIvfProbedCells(numCentroids: Int, nProbe: Int, dim: Int = 64,
      seed: Long = 42L): String =
    s"WITH ${ivfPrologue(numCentroids, dim, seed)}, " +
      s"qd AS (SELECT q.vec_id, ct.cidx, ${pairDot("q.embedding", "ct.cvec", dim)} / q.nrm AS dot " +
      "FROM qry q CROSS JOIN cent0 ct), " +
      "probe AS (SELECT cidx AS cell FROM " +
      s"(SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cidx) AS rn FROM qd) t WHERE rn <= $nProbe) " +
      s"SELECT CAST($numCentroids AS BIGINT) AS n_cells_total, " +
      "CAST(count(DISTINCT cell) AS BIGINT) AS n_cells_probed, TRUE AS io_pruned FROM probe"

  /** Oracle for `emb_top_eigvec`: replay of
    * `Similarity.topEigenvector` — the exact-integer Gram cells
    * (both triangles), the pinned all-ones start, and `iters`
    * matrix-vector products with ORDERED double accumulation
    * (list_reduce over j-sorted lists ≡ the Scala ascending-index
    * fold, since 0.0 + x == x exactly), normalizing by the ordered
    * 2-norm each step.
    */
  def embTopEigvec(iters: Int, dim: Int): String = {
    val denom = "281474976710656.0" // 2^48 = (2^24)^2, the fp scale
    // every per-iteration CTE is MATERIALIZED: each level is referenced
    // by two successors, so default inlining re-expands the whole chain
    // exponentially (3^iters copies of the Gram join)
    def step(k: Int): String =
      s"y$k AS MATERIALIZED (SELECT c.i, list_reduce(list(c.v * p.w ORDER BY c.j), (a, b) -> a + b) AS y " +
        s"FROM cells c JOIN it${k - 1} p ON p.i = c.j GROUP BY c.i), " +
        s"n$k AS MATERIALIZED (SELECT sqrt(list_reduce(list(y * y ORDER BY i), (a, b) -> a + b)) AS nn FROM y$k), " +
        s"it$k AS MATERIALIZED (SELECT i, y / (SELECT nn FROM n$k) AS w FROM y$k)"
    // cells is referenced once per iteration — MATERIALIZED stops the
    // engine from recomputing the data-sized Gram join `iters` times
    "WITH x AS MATERIALIZED (SELECT vec_id, CAST(unnest(generate_series(1, len(embedding))) - 1 AS INT) AS i, " +
      "CAST(round(CAST(unnest(embedding) AS DOUBLE) * 16777216.0) AS BIGINT) AS q FROM embeddings), " +
      s"cells AS MATERIALIZED (SELECT a.i, b.i AS j, CAST(sum(a.q * b.q) AS DOUBLE) / $denom AS v " +
      "FROM x a JOIN x b ON a.vec_id = b.vec_id GROUP BY 1, 2), " +
      s"it0 AS (SELECT CAST(t.i AS INT) AS i, 1.0 AS w FROM generate_series(0, ${dim - 1}) t(i)), " +
      (1 to iters).map(step).mkString(", ") + " " +
      s"SELECT i, w, (SELECT nn FROM n$iters) AS lambda_est FROM it$iters"
  }

  /** Oracle for `sketch_cm_join_size`: replay of
    * `Sketches.cmJoinSizeEstimate` — both sides' Count-Min registers
    * from the same seeded rolling hash (power-of-two width, so the
    * unsigned-fold modulus equals Spark's signed pmod), the per-row
    * register dot, the min-over-rows estimate, and the group-count
    * exact join size.
    */
  def cmJoinSize(aExpr: String, aFrom: String, bExpr: String, bFrom: String,
      depth: Int, width: Int): String = {
    require(width >= 2 && (width & (width - 1)) == 0)
    def regs(expr: String, from: String): String =
      s"SELECT r, (${rollFold(s"hex(encode('cm' || CAST(r AS VARCHAR) || ':' || CAST($expr AS VARCHAR)))")}) % $width AS bucket, " +
        s"CAST(count(*) AS BIGINT) AS cnt FROM $from CROSS JOIN generate_series(0, ${depth - 1}) t(r) GROUP BY 1, 2"
    s"WITH ra AS (${regs(aExpr, aFrom)}), rb AS (${regs(bExpr, bFrom)}), " +
      "dots0 AS (SELECT ra.r, CAST(sum(ra.cnt * rb.cnt) AS BIGINT) AS dot " +
      "FROM ra JOIN rb ON ra.r = rb.r AND ra.bucket = rb.bucket GROUP BY 1), " +
      s"dots AS (SELECT t.r, coalesce(dots0.dot, 0) AS dot " +
      s"FROM generate_series(0, ${depth - 1}) t(r) LEFT JOIN dots0 ON dots0.r = t.r), " +
      s"ka AS (SELECT CAST($aExpr AS VARCHAR) AS k, CAST(count(*) AS BIGINT) AS na FROM $aFrom GROUP BY 1), " +
      s"kb AS (SELECT CAST($bExpr AS VARCHAR) AS k, CAST(count(*) AS BIGINT) AS nb FROM $bFrom GROUP BY 1) " +
      "SELECT (SELECT CAST(min(dot) AS BIGINT) FROM dots) AS est_join_rows, " +
      "(SELECT CAST(coalesce(sum(na * nb), 0) AS BIGINT) FROM ka JOIN kb USING (k)) AS true_join_rows"
  }

  /** Oracle for `dp_laplace_release`: replay of
    * `Quality.dpLaplaceRelease` — the clamped group aggregate, the
    * avalanched-md5 uniform on the 2⁴⁰ grid (top 40 digest bits via a
    * big-endian hex-digit fold of the first 10 hex chars), and the
    * inverse-CDF Laplace transform, in the same double operation
    * order.
    */
  def dpLaplaceRelease(groupExpr: String, groupAlias: String,
      valueExpr: String, from: String,
      epsilon: Double, clampHi: Long, salt: String): String = {
    val mod = PortableMinHash.Mod
    def uExpr(tag: String): String =
      s"((${md5U40(s"'dp:$salt:$tag:' || g")})::DOUBLE + 0.5) / $mod.0 - 0.5"
    def lap(tag: String, scale: String): String = {
      val u = uExpr(tag)
      s"(-($scale) * sign($u) * ln(1.0 - 2.0 * abs($u)))"
    }
    s"WITH b AS (SELECT $groupExpr AS g, $valueExpr AS v FROM $from), " +
      s"a AS (SELECT g, CAST(count(*) AS BIGINT) AS n, " +
      s"CAST(sum(LEAST(GREATEST(v, 0), $clampHi)) AS BIGINT) AS s FROM b GROUP BY 1) " +
      s"SELECT g AS $groupAlias, n::DOUBLE + ${lap("n", s"${1.0 / epsilon}")} AS noisy_n, " +
      s"s::DOUBLE + ${lap("s", s"${clampHi / epsilon}")} AS noisy_sum FROM a"
  }

  /** Oracle for `ann_ivf_deleted`: the persisted-index lifecycle with a
    * right-to-be-forgotten purge — centroids seeded from the ORIGINAL
    * candidate corpus (frozen, exactly [[annIvfTopK]]'s prologue), but
    * cell MEMBERSHIP restricted to the survivors: the index a targeted
    * delete leaves behind, which equals a purge-everything +
    * re-append-survivors rebuild under the same frozen centroids.
    * `deletedWhere` is a predicate on `vec_id`.
    */
  def annIvfTopKDeleted(k: Int, numCentroids: Int, nProbe: Int,
      deletedWhere: String, dim: Int = 64, seed: Long = 42L): String =
    s"WITH ${ivfPrologue(numCentroids, dim, seed)}, " +
      "cent AS (SELECT * FROM cent0), " +
      ivfTail("cent", k, nProbe, dim, memberWhere = s"NOT ($deletedWhere)")

  /** Oracle for `ann_range_search`: replay of
    * `Similarity.ivfRangeSearch` — the IVF prologue, first-max cell
    * assignment and nProbe probes exactly as [[annIvfTopK]], but the
    * scored pairs keep every cosine ≥ threshold instead of ranking.
    */
  def annRangeSearch(threshold: String, numCentroids: Int, nProbe: Int,
      dim: Int = 64, seed: Long = 42L): String =
    s"WITH ${ivfPrologue(numCentroids, dim, seed)}, " +
      s"cd AS (SELECT c.vec_id, c.embedding, c.nrm, ct.cidx, ${pairDot("c.embedding", "ct.cvec", dim)} / c.nrm AS dot " +
      "FROM cnd c CROSS JOIN cent0 ct), " +
      "cellasg AS (SELECT vec_id AS neighbor_id, embedding AS c_vec, nrm AS c_norm, cidx AS cell FROM " +
      "(SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cidx) AS rn FROM cd) t WHERE rn = 1), " +
      s"qd AS (SELECT q.vec_id, q.embedding, q.nrm, ct.cidx, ${pairDot("q.embedding", "ct.cvec", dim)} / q.nrm AS dot " +
      "FROM qry q CROSS JOIN cent0 ct), " +
      "probe AS (SELECT vec_id AS query_id, embedding AS q_vec, nrm AS q_norm, cidx AS cell FROM " +
      s"(SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cidx) AS rn FROM qd) t WHERE rn <= $nProbe) " +
      "SELECT p.query_id, ca.neighbor_id FROM probe p JOIN cellasg ca USING (cell) " +
      s"WHERE ${pairDot("p.q_vec", "ca.c_vec", dim)} / (p.q_norm * ca.c_norm) >= $threshold"

  /** Shared SQ8 codec CTEs over the candidate slice (`cnd` from
    * [[ivfPrologue]]): `grid(j, mn, mx)` (per-dimension float min/max
    * widened to double) and `dec(vec_id, dvec)` — the decoded float
    * vector `x̂_j = mn + code_j·(mx − mn)/255` in dim order, with the
    * affine rounding exactly as Spark's fixed-order double expression.
    */
  private def sqCtes(dim: Int): String = {
    val code = "(CASE WHEN g.mx = g.mn THEN 0 ELSE " +
      "CAST(round(((CAST(c.embedding[g.j] AS DOUBLE) - g.mn) * 255.0) / (g.mx - g.mn)) AS BIGINT) END)"
    s"grid AS (SELECT j, CAST(min(embedding[j]) AS DOUBLE) AS mn, CAST(max(embedding[j]) AS DOUBLE) AS mx " +
      s"FROM cnd CROSS JOIN (SELECT unnest(generate_series(1, $dim)) AS j) dims GROUP BY j), " +
      "dec AS (SELECT c.vec_id, list(CAST(g.mn + CAST(" + code +
      " AS DOUBLE) * ((g.mx - g.mn) / 255.0) AS FLOAT) ORDER BY g.j) AS dvec " +
      "FROM cnd c CROSS JOIN grid g GROUP BY c.vec_id)"
  }

  /** Oracle for `emb_sq8_codes`: the quantizer itself, exploded —
    * replay of `Similarity.sqCodes` (grid + affine half-up rounding;
    * operands are non-negative so DuckDB's half-away rounding agrees
    * with Spark's HALF_UP).
    */
  def embSqCodes(candWhere: String, dim: Int = 64): String =
    s"WITH cnd AS (SELECT vec_id, embedding FROM embeddings WHERE $candWhere), " +
      sqCtes(dim) + ", " +
      "codes AS (SELECT c.vec_id, CAST(g.j - 1 AS INT) AS dim, " +
      "(CASE WHEN g.mx = g.mn THEN 0 ELSE " +
      "CAST(round(((CAST(c.embedding[g.j] AS DOUBLE) - g.mn) * 255.0) / (g.mx - g.mn)) AS BIGINT) END) AS code " +
      "FROM cnd c CROSS JOIN grid g) " +
      "SELECT vec_id, dim, code FROM codes"

  /** Oracle for `ann_sq8_ivf_topk`: full replay of
    * `Similarity.sqIvfTopK` — IVF prologue (seeded unit centroids),
    * raw-vector cell assignment and query probes as in [[annIvfTopK]],
    * but candidates scored through the SQ8 decode: cosine of the raw
    * query against the decoded candidate and its decoded norm.
    */
  def annSqIvfTopK(k: Int, numCentroids: Int, nProbe: Int, dim: Int = 64,
      seed: Long = 42L): String =
    s"WITH ${ivfPrologue(numCentroids, dim, seed)}, " +
      "cent AS (SELECT * FROM cent0), " +
      sqCtes(dim) + ", " +
      s"cd AS (SELECT c.vec_id, c.nrm, ct.cidx, ${pairDot("c.embedding", "ct.cvec", dim)} / c.nrm AS dot " +
      "FROM cnd c CROSS JOIN cent ct), " +
      "cellasg AS (SELECT vec_id AS neighbor_id, cidx AS cell FROM " +
      "(SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cidx) AS rn FROM cd) t WHERE rn = 1), " +
      s"cdec AS (SELECT ca.neighbor_id, ca.cell, d.dvec, sqrt(${selfDot("d.dvec", dim)}) AS dnrm " +
      "FROM cellasg ca JOIN dec d ON d.vec_id = ca.neighbor_id), " +
      s"qd AS (SELECT q.vec_id, q.embedding, q.nrm, ct.cidx, ${pairDot("q.embedding", "ct.cvec", dim)} / q.nrm AS dot " +
      "FROM qry q CROSS JOIN cent ct), " +
      "probe AS (SELECT vec_id AS query_id, embedding AS q_vec, nrm AS q_norm, cidx AS cell FROM " +
      s"(SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cidx) AS rn FROM qd) t WHERE rn <= $nProbe), " +
      s"scored AS (SELECT p.query_id, c.neighbor_id, ${pairDot("p.q_vec", "c.dvec", dim)} / (p.q_norm * c.dnrm) AS cosine " +
      "FROM probe p JOIN cdec c USING (cell)) " +
      "SELECT query_id, neighbor_id, rnk FROM (SELECT query_id, neighbor_id, " +
      "CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rnk " +
      s"FROM scored) t WHERE rnk <= $k"

  /** Oracle for `ann_ivf_cell_stats`: replay of
    * `Similarity.ivfCellStats` — the seeded centroid pick, the argmax
    * cell assignment keeping the winning cosine, then the per-cell
    * occupancy/imbalance/quality report in integer ppm (floor-ppm per
    * member, integer mean; empty cells via a generated cell list).
    */
  def annIvfCellStats(numCentroids: Int, dim: Int = 64, seed: Long = 42L): String =
    s"WITH ${ivfPrologue(numCentroids, dim, seed)}, " +
      s"cd AS (SELECT c.vec_id, ct.cidx, ${pairDot("c.embedding", "ct.cvec", dim)} / c.nrm AS dot " +
      "FROM cnd c CROSS JOIN cent0 ct), " +
      "asg AS (SELECT vec_id, cidx, dot FROM (SELECT *, " +
      "row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cidx) AS rn FROM cd) t WHERE rn = 1), " +
      "agg AS (SELECT cidx AS cell, count(*) AS n, " +
      "sum(CAST(floor(dot * 1000000.0) AS BIGINT)) AS sum_cos FROM asg GROUP BY cidx), " +
      "tot AS (SELECT count(*) AS total FROM asg), " +
      s"cl AS (SELECT CAST(g AS BIGINT) AS cell FROM generate_series(1, $numCentroids) t(g)) " +
      "SELECT cl.cell, CAST(coalesce(agg.n, 0) AS BIGINT) AS n_vectors, " +
      "CAST(coalesce(agg.n, 0) * 1000000 // tot.total AS BIGINT) AS share_ppm, " +
      s"CAST(coalesce(agg.n, 0) * $numCentroids * 1000000 // tot.total AS BIGINT) AS imbalance_ppm, " +
      "CAST(agg.sum_cos // agg.n AS BIGINT) AS avg_cos_ppm " +
      "FROM cl LEFT JOIN agg ON agg.cell = cl.cell, tot"

  /** Oracle for `stage_ivfpq_build`: the per-cell occupancy of the
    * freshly built IVF-PQ index — the coarse seeded pick, the build's
    * `refineIters` Lloyd rounds, argmax-cosine cell assignment of
    * every candidate, counted per cell (cells that attract no vectors
    * hold no code rows, so they are absent on both sides).
    */
  def annIvfPqBuildCells(numCentroids: Int, dim: Int = 64, seed: Long = 42L,
      refineIters: Int = 1): String =
    s"WITH ${ivfPrologue(numCentroids, dim, seed)}, " +
      s"${lloydChain(refineIters, dim)}, " +
      s"cd AS (SELECT c.vec_id, ct.cidx, ${pairDot("c.embedding", "ct.cvec", dim)} / c.nrm AS dot " +
      s"FROM cnd c CROSS JOIN cent$refineIters ct), " +
      "asg AS (SELECT vec_id, cidx FROM (SELECT *, " +
      "row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cidx) AS rn FROM cd) t WHERE rn = 1) " +
      "SELECT CAST(cidx AS BIGINT) AS cell, CAST(count(*) AS BIGINT) AS n_vectors " +
      "FROM asg GROUP BY cidx"

  /** Oracle for `ann_ivf_refined_topk`: the seeded pick plus `iters`
    * replayed Lloyd iterations of `Similarity.kmeansCentroids`. Each
    * iteration reproduces the Scala driver's arithmetic exactly:
    * argmax assignment divides the dot by the row norm (same tie
    * behavior as the operator); per-dimension sums go through the same
    * ×2^24 fixed-point longs (HALF_UP rounding both engines); the mean
    * is the same left-associated `qsum/cnt/Q` double chain; the
    * re-unit-normalization uses the same 0.0-seeded left fold and
    * float cast. Cells that attract no rows keep the previous centroid
    * (left join + coalesce). Result: the refined centroids — and
    * therefore every downstream cell, probe and rank — are
    * bit-identical across engines.
    */
  def annIvfRefinedTopK(k: Int, numCentroids: Int, nProbe: Int, iters: Int,
      dim: Int = 64, seed: Long = 42L): String =
    s"WITH ${ivfPrologue(numCentroids, dim, seed)}, " +
      lloydChain(iters, dim) + ", " +
      ivfTail(s"cent$iters", k, nProbe, dim)

  /** `iters` replayed Lloyd steps over CTEs `cnd` (corpus with norms)
    * and `cent0` (initial centroids); final centroids land in CTE
    * `cent<iters>`. Shared by the refined-IVF and clustered-dedup
    * oracles.
    */
  private def lloydChain(iters: Int, dim: Int): String =
    lloydChainFor(iters, dim, "cnd", "")

  /** [[lloydChain]] with the corpus CTE and a name prefix as
    * parameters, so one oracle can replay TWO independent Lloyd runs
    * (the recall-drift report's stale-vs-rebuilt tiers). Initial
    * centroids read from `<pfx>cent0`; final land in `<pfx>cent<iters>`.
    */
  private def lloydChainFor(iters: Int, dim: Int, corpus: String, pfx: String): String = {
    val Q = (1L << 24).toString
    def lloydStep(prev: String, t: Int): String = {
      // d2 = qsum::double / cnt / Q, left-associated like the Scala fold
      val mean = s"((CAST(qsum AS DOUBLE) / CAST(cnt AS DOUBLE)) / $Q.0)"
      // 0.0-seeded left-assoc sum of squares, matching Array[Double].sum
      val nrm2 = (1 to dim).map(j => s"d[$j] * d[$j]").mkString("(0.0 + ", " + ", ")")
      s"${pfx}asg$t AS (SELECT vec_id, embedding, cell FROM (SELECT c.vec_id, c.embedding, ct.cidx AS cell, " +
        s"row_number() OVER (PARTITION BY c.vec_id ORDER BY ${pairDot("c.embedding", "ct.cvec", dim)} / c.nrm DESC, ct.cidx) AS rn " +
        s"FROM $corpus c CROSS JOIN $prev ct) x WHERE rn = 1), " +
        s"${pfx}sums$t AS (SELECT cell, j, sum(CAST(round(CAST(embedding[j] AS DOUBLE) * $Q.0) AS BIGINT)) AS qsum, " +
        s"count(*) AS cnt FROM ${pfx}asg$t CROSS JOIN (SELECT unnest(generate_series(1, $dim)) AS j) dims GROUP BY cell, j), " +
        s"${pfx}dvec$t AS (SELECT cell, list(($mean) ORDER BY j) AS d FROM ${pfx}sums$t GROUP BY cell), " +
        s"${pfx}norm$t AS (SELECT cell, d, sqrt($nrm2) AS nrm FROM ${pfx}dvec$t), " +
        s"${pfx}cnew$t AS (SELECT cell AS cidx, CASE WHEN nrm = 0 THEN [CAST(d[j] AS FLOAT) FOR j IN generate_series(1, $dim)] " +
        s"ELSE [CAST(d[j] / nrm AS FLOAT) FOR j IN generate_series(1, $dim)] END AS cvec FROM ${pfx}norm$t), " +
        s"${pfx}cent$t AS MATERIALIZED (SELECT p.cidx, coalesce(n.cvec, p.cvec) AS cvec FROM $prev p LEFT JOIN ${pfx}cnew$t n USING (cidx))"
    }
    (1 to iters).map(t =>
      lloydStep(if (t == 1) s"${pfx}cent0" else s"${pfx}cent${t - 1}", t)).mkString(", ")
  }

  /** Oracle for `text_bpe_merges`: full replay of
    * `TextAnalysis.bpeMerges` — the collapsed (word, freq) vocab, the
    * `·`-delimited char segmentation, and `k` unrolled merge rounds
    * (pair counts → (count desc, pair asc) argmax → literal
    * left-to-right replace). Every per-round CTE is MATERIALIZED
    * (each is referenced by two successors — default inlining
    * re-expands the whole chain exponentially).
    */
  def bpeMerges(k: Int, from: String = "documents", textCol: String = "text"): String = {
    val out = (1 to k).map { r =>
      s"SELECT $r AS merge_rank, split_part(p, '··', 1) AS lhs, " +
        s"split_part(p, '··', 2) AS rhs, replace(p, '··', '') AS merged, " +
        s"c AS pair_count FROM b$r"
    }.mkString(" UNION ALL ")
    s"${bpeChain(k, from, textCol)} $out"
  }

  /** Oracle for `text_bpe_compression`: the same k replayed rounds,
    * then the frequency-weighted symbol counts over the FINAL
    * segmentation and the exact-ppm compression. Exhaustion mirrors
    * the engine: `n_merges` counts the rounds whose argmax was
    * non-empty (the Spark side reports `merges.size`, fewer than k
    * when the vocab runs out of pairs), and the v-chain's LEFT JOIN
    * (see [[bpeChain]]) passes segmentations through exhausted rounds
    * unchanged instead of collapsing to zero rows.
    */
  def bpeCompression(k: Int, from: String = "documents", textCol: String = "text"): String = {
    val nMerges = (1 to k).map(r => s"(SELECT count(*) FROM b$r)").mkString(" + ")
    s"${bpeChain(k, from, textCol)}, " +
      s"fin AS (SELECT w, freq, len(list_filter(string_split(seg, '·'), x -> x <> '')) AS nt FROM v$k), " +
      s"agg AS (SELECT CAST($nMerges AS INT) AS n_merges, CAST(sum(freq) AS BIGINT) AS n_words, " +
      "CAST(sum(freq * length(w)) AS BIGINT) AS n_chars, " +
      "CAST(sum(freq * nt) AS BIGINT) AS n_tokens FROM fin) " +
      "SELECT n_merges, n_words, n_chars, n_tokens, " +
      "n_tokens * 1000000 // n_chars AS tokens_per_char_ppm FROM agg"
  }

  /** The shared BPE replay chain: vocab `v0` and `k` rounds, each with
    * pair counts, the (count desc, pair asc) argmax `b<r>`, and the
    * merged segmentation `v<r>`. */
  private def bpeChain(k: Int, from: String, textCol: String): String = {
    val header =
      s"WITH tk AS (SELECT unnest(regexp_split_to_array(lower(trim($textCol)), '\\s+')) AS w FROM $from), " +
        "v0 AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS freq, " +
        "regexp_replace(w, '(.)', '·\\1·', 'g') AS seg FROM tk " +
        "WHERE regexp_matches(w, '^[a-z]{2,}$') GROUP BY w)"
    val rounds = (1 to k).map { r =>
      s"t$r AS (SELECT freq, list_filter(string_split(seg, '·'), x -> x <> '') AS toks FROM v${r - 1}), " +
        s"e$r AS (SELECT freq, unnest([toks[i] || '··' || toks[i + 1] FOR i IN generate_series(1, len(toks) - 1)]) AS p FROM t$r), " +
        s"p$r AS (SELECT p, CAST(sum(freq) AS BIGINT) AS c FROM e$r GROUP BY 1), " +
        s"b$r AS MATERIALIZED (SELECT p, c FROM p$r ORDER BY c DESC, p LIMIT 1), " +
        // LEFT JOIN (not CROSS): an exhausted round's empty argmax must
        // pass every segmentation through unchanged — a cross join with
        // an empty b<r> would collapse v<r> (and every later round) to
        // zero rows, diverging from the engine's early-stop semantics
        s"v$r AS MATERIALIZED (SELECT w, freq, " +
        s"coalesce(replace(seg, '·' || b.p || '·', '·' || replace(b.p, '··', '') || '·'), seg) AS seg " +
        s"FROM v${r - 1} LEFT JOIN b$r b ON TRUE)"
    }.mkString(", ")
    s"$header, $rounds"
  }

  /** Oracle for `layout_zorder_pruning`: replay of
    * `Layout.zOrderPruningReport` — the masked scrambles, the exact
    * 2·bits-term Morton interleave, both unit manifests (min/max per
    * unit) and the closed-interval rectangle-intersection counts.
    */
  def zOrderPruning(xExpr: String, yExpr: String, from: String,
      probes: Seq[(Long, Long, Long, Long)], bits: Int, unitBits: Int): String = {
    val mask = (1L << bits) - 1L
    val z = (0 until bits).flatMap { b =>
      Seq(s"(((x >> $b) & 1) << ${2 * b})", s"(((y >> $b) & 1) << ${2 * b + 1})")
    }.mkString("(", " | ", ")")
    val mm = "min(x) AS x_min, max(x) AS x_max, min(y) AS y_min, max(y) AS y_max"
    val pr = probes.zipWithIndex.map { case ((xl, xh, yl, yh), i) =>
      s"SELECT $i AS probe_id, CAST($xl AS BIGINT) AS x_lo, CAST($xh AS BIGINT) AS x_hi, " +
        s"CAST($yl AS BIGINT) AS y_lo, CAST($yh AS BIGINT) AS y_hi"
    }.mkString(" UNION ALL ")
    s"WITH pts AS (SELECT ($xExpr) & $mask AS x, ($yExpr) & $mask AS y FROM $from), " +
      s"ml AS (SELECT 'linear' AS layout, x >> ${bits - math.min(unitBits, bits)} AS unit, $mm FROM pts GROUP BY 2), " +
      s"mz AS (SELECT 'zorder' AS layout, $z >> ${2 * bits - unitBits} AS unit, $mm FROM pts GROUP BY 2), " +
      "m AS (SELECT * FROM ml UNION ALL SELECT * FROM mz), " +
      s"pr AS ($pr) " +
      "SELECT m.layout, pr.probe_id, pr.x_lo, pr.x_hi, pr.y_lo, pr.y_hi, " +
      "CAST(count(*) AS BIGINT) AS n_units, " +
      "CAST(sum(CASE WHEN m.x_max >= pr.x_lo AND m.x_min <= pr.x_hi AND m.y_max >= pr.y_lo AND m.y_min <= pr.y_hi THEN 1 ELSE 0 END) AS BIGINT) AS units_touched " +
      "FROM m CROSS JOIN pr GROUP BY 1, 2, 3, 4, 5, 6"
  }

  /** Oracle for `ann_ivf_recall_drift`: full replay of
    * `Similarity.ivfRecallDriftReport` on the anchored drift fixture —
    * the label-anchored clustered corpus (+1.0 on dim label·6 for the
    * originals, dim label·6+3 with reversed noise for the drifted
    * delta and queries), brute-force truth, BOTH tiers' md5 seed pick
    * and Lloyd refinement (stale over the pre-drift slice, rebuilt
    * over the full corpus), FULL-corpus cell assignment, probes, and
    * the exact-integer recall fold with the degradation flag.
    */
  def annIvfRecallDrift(k: Int, nProbe: Int, numCentroids: Int, iters: Int,
      flagBelowPpm: Long, dim: Int = 64, seed: Long = 42L): String = {
    def anchored(noise: String, off: Int) =
      s"[CASE WHEN j - 1 = label * 6 + $off THEN CAST(CAST($noise[j] AS DOUBLE) + 1.0 AS FLOAT) " +
        s"ELSE $noise[j] END FOR j IN generate_series(1, $dim)]"
    def tier(pfx: String, slice: String) =
      s"${pfx}ck AS (SELECT vec_id, embedding, nrm, md5('ivf$seed:' || CAST(vec_id AS VARCHAR)) AS h FROM $slice), " +
        s"${pfx}cpick AS (SELECT embedding, nrm, CAST(row_number() OVER (ORDER BY h, vec_id) AS BIGINT) AS cidx " +
        s"FROM ${pfx}ck ORDER BY h, vec_id LIMIT $numCentroids), " +
        s"${pfx}cent0 AS (SELECT cidx, CASE WHEN nrm = 0 THEN embedding ELSE " +
        s"[CAST(CAST(embedding[j] AS DOUBLE) / nrm AS FLOAT) FOR j IN generate_series(1, $dim)] END AS cvec FROM ${pfx}cpick), " +
        lloydChainFor(iters, dim, slice, pfx) + ", " +
        s"${pfx}cells AS MATERIALIZED (SELECT neighbor_id, c_vec, c_norm, cell FROM " +
        s"(SELECT c.vec_id AS neighbor_id, c.embedding AS c_vec, c.nrm AS c_norm, ct.cidx AS cell, " +
        s"row_number() OVER (PARTITION BY c.vec_id ORDER BY ${pairDot("c.embedding", "ct.cvec", dim)} / c.nrm DESC, ct.cidx) AS rn " +
        s"FROM cnd c CROSS JOIN ${pfx}cent$iters ct) t WHERE rn = 1), " +
        s"${pfx}probe AS (SELECT vec_id AS query_id, embedding AS q_vec, nrm AS q_norm, cidx AS cell FROM " +
        s"(SELECT q.vec_id, q.embedding, q.nrm, ct.cidx, " +
        s"row_number() OVER (PARTITION BY q.vec_id ORDER BY ${pairDot("q.embedding", "ct.cvec", dim)} / q.nrm DESC, ct.cidx) AS rn " +
        s"FROM qry q CROSS JOIN ${pfx}cent$iters ct) t WHERE rn <= $nProbe), " +
        s"${pfx}res AS (SELECT query_id, neighbor_id FROM (SELECT p.query_id, ca.neighbor_id, " +
        s"row_number() OVER (PARTITION BY p.query_id ORDER BY ${pairDot("p.q_vec", "ca.c_vec", dim)} / (p.q_norm * ca.c_norm) DESC, ca.neighbor_id) AS rnk " +
        s"FROM ${pfx}probe p JOIN ${pfx}cells ca USING (cell)) t WHERE rnk <= $k), " +
        s"${pfx}hits AS (SELECT CAST(count(*) AS BIGINT) AS n_hits FROM ${pfx}res r JOIN bt USING (query_id, neighbor_id))"
    def row(tag: String, pfx: String) =
      s"SELECT '$tag' AS tier, nq.n_queries, h.n_hits, " +
        s"CAST(h.n_hits * 1000000 // (nq.n_queries * $k) AS BIGINT) AS recall_ppm, " +
        s"h.n_hits * 1000000 // (nq.n_queries * $k) < $flagBelowPpm AS degraded " +
        s"FROM nq CROSS JOIN ${pfx}hits h"
    s"WITH raw AS (SELECT vec_id, label, embedding FROM embeddings), " +
      s"uni AS (SELECT vec_id, ${anchored("embedding", 0)} AS embedding FROM raw WHERE vec_id >= 10 " +
      s"UNION ALL SELECT vec_id + 1000000, ${anchored("r", 3)} " +
      "FROM (SELECT vec_id, label, list_reverse(embedding) AS r FROM raw WHERE vec_id >= 10) t1 " +
      s"UNION ALL SELECT vec_id, ${anchored("r", 3)} " +
      "FROM (SELECT vec_id, label, list_reverse(embedding) AS r FROM raw WHERE vec_id < 10) t2), " +
      s"base AS (SELECT vec_id, embedding, sqrt(${selfDot("embedding", dim)}) AS nrm FROM uni), " +
      "cnd AS MATERIALIZED (SELECT * FROM base WHERE vec_id >= 10), " +
      "qry AS MATERIALIZED (SELECT * FROM base WHERE vec_id < 10), " +
      "cndold AS MATERIALIZED (SELECT * FROM cnd WHERE vec_id < 1000000), " +
      "bt AS MATERIALIZED (SELECT query_id, neighbor_id FROM " +
      s"(SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
      s"row_number() OVER (PARTITION BY q.vec_id ORDER BY ${pairDot("q.embedding", "c.embedding", dim)} / (q.nrm * c.nrm) DESC, c.vec_id) AS rnk " +
      s"FROM qry q CROSS JOIN cnd c) t WHERE rnk <= $k), " +
      "nq AS (SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries FROM bt), " +
      tier("s_", "cndold") + ", " + tier("r_", "cnd") + " " +
      row("stale", "s_") + " UNION ALL " + row("rebuilt", "r_")
  }

  /** Oracle for `dedup_embed_cluster`: full replay of
    * `Dedup.embeddingNearDupClustered` — seeded centroid pick over the
    * WHOLE embeddings table, `iters` Lloyd steps ([[lloydChain]]),
    * first-max cell assignment, then within-cell pairs verified with
    * the exact left-associated double cosine threshold (same operand
    * order as the Spark predicate `dot >= t * norm_a * norm_b`).
    */
  def dedupEmbedClustered(threshold: String, numCentroids: Int, iters: Int,
      dim: Int = 64, seed: Long = 42L): String =
    s"WITH ${ivfPrologue(numCentroids, dim, seed, candWhere = "TRUE")}, " +
      lloydChain(iters, dim) + ", " +
      s"cdX AS (SELECT c.vec_id, c.embedding, c.nrm, ct.cidx, ${pairDot("c.embedding", "ct.cvec", dim)} / c.nrm AS dot " +
      s"FROM cnd c CROSS JOIN cent$iters ct), " +
      "cellX AS (SELECT vec_id, embedding, nrm, cidx AS cell FROM " +
      "(SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cidx) AS rn FROM cdX) t WHERE rn = 1) " +
      "SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM cellX a JOIN cellX b " +
      "ON a.cell = b.cell AND a.vec_id < b.vec_id " +
      s"WHERE ${pairDot("a.embedding", "b.embedding", dim)} >= $threshold * a.nrm * b.nrm"

  /** Oracle for `ann_ivf_recentroid`: full replay of
    * [[graft.operators.Similarity.recentroidCells]] served through the
    * repaired index — the original centroid pick and cell assignment,
    * `iters` CELL-LOCAL Lloyd rounds over ONLY the first `nDirty`
    * cells' members (the dirty slice; [[lloydChainFor]] is the same
    * replayed fixed-point k-means as the refined-IVF oracle), the
    * dirty slice reassigned among the refreshed dirty centroids while
    * clean assignments pass through untouched, and the probe ranking
    * over the merged (refreshed ∪ untouched) centroid set. The
    * byte-identity of the clean partitions is engine-side physical
    * evidence (spec-pinned file stats); what DuckDB verifies is the
    * served RESULT of the localized repair.
    */
  def annIvfRecentroidTopK(k: Int, numCentroids: Int, nProbe: Int,
      nDirty: Int, iters: Int, dim: Int = 64, seed: Long = 42L): String = {
    val pre =
      s"cda AS (SELECT c.vec_id, c.embedding, c.nrm, ct.cidx, ${pairDot("c.embedding", "ct.cvec", dim)} / c.nrm AS dot " +
        "FROM cnd c CROSS JOIN cent0 ct), " +
        "asg0 AS MATERIALIZED (SELECT vec_id, embedding, nrm, cidx AS cell FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cidx) AS rn FROM cda) t WHERE rn = 1), " +
        s"locsl AS MATERIALIZED (SELECT vec_id, embedding, nrm FROM asg0 WHERE cell <= $nDirty), " +
        s"loccent0 AS (SELECT cidx, cvec FROM cent0 WHERE cidx <= $nDirty)"
    val chain = lloydChainFor(iters, dim, "locsl", "loc")
    val merged =
      s"centf AS (SELECT cidx, cvec FROM cent0 WHERE cidx > $nDirty " +
        s"UNION ALL SELECT cidx, cvec FROM loccent$iters), " +
        s"cdr AS (SELECT c.vec_id, c.embedding, c.nrm, ct.cidx, ${pairDot("c.embedding", "ct.cvec", dim)} / c.nrm AS dot " +
        s"FROM locsl c CROSS JOIN loccent$iters ct), " +
        "asgd AS (SELECT vec_id, embedding, nrm, cidx AS cell FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cidx) AS rn FROM cdr) t WHERE rn = 1), " +
        s"cellf AS (SELECT vec_id AS neighbor_id, embedding AS c_vec, nrm AS c_norm, cell FROM asg0 WHERE cell > $nDirty " +
        "UNION ALL SELECT vec_id, embedding, nrm, cell FROM asgd)"
    val tail =
      s"qd AS (SELECT q.vec_id, q.embedding, q.nrm, ct.cidx, ${pairDot("q.embedding", "ct.cvec", dim)} / q.nrm AS dot " +
        "FROM qry q CROSS JOIN centf ct), " +
        "probe AS (SELECT vec_id AS query_id, embedding AS q_vec, nrm AS q_norm, cidx AS cell FROM " +
        s"(SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cidx) AS rn FROM qd) t WHERE rn <= $nProbe), " +
        s"scored AS (SELECT p.query_id, ca.neighbor_id, ${pairDot("p.q_vec", "ca.c_vec", dim)} / (p.q_norm * ca.c_norm) AS cosine " +
        "FROM probe p JOIN cellf ca USING (cell)) " +
        "SELECT query_id, neighbor_id, rnk FROM (SELECT query_id, neighbor_id, " +
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rnk " +
        s"FROM scored) t WHERE rnk <= $k"
    s"WITH ${ivfPrologue(numCentroids, dim, seed)}, $pre, $chain, $merged, $tail"
  }

  /** Oracle for `ann_pq_topk`: full replay of [[graft.operators.Similarity.pqTopK]]
    * — portable avalanched-md5 codebook seed pick (raw corpus vector
    * slices), `trainIters` replayed per-subspace k-means rounds over
    * the candidate slices (min-L2 assignment = argmax of
    * dot − ‖entry‖²/2 with first-max tie-break, fixed-point ×2^24
    * integer sums, qsum/cnt/Q double means, float cast, empty clusters
    * keep their entry — exactly `trainSubspaceCodebooks`), min-L2
    * encoding against the trained book, per-query LUTs (plain dots),
    * the fixed-subspace-order ADC sum (left-associated, so the double
    * is bit-identical), the refine cut, and the exact cosine re-rank.
    */
  def annPqTopK(k: Int, m: Int = 4, codebookSize: Int = 16, refine: Int = 50,
      dim: Int = 64, seed: Long = 42L, trainIters: Int = 2): String = {
    require(dim % m == 0)
    val subDim = dim / m
    val Q = (1L << 24).toString
    // dot of a full-dim vector's subspace-s slice against a subDim entry
    def subDotOff(va: String, vb: String, s: Int): String =
      (1 to subDim)
        .map(j => s"CAST($va[${s * subDim + j}] AS DOUBLE) * CAST($vb[$j] AS DOUBLE)")
        .mkString("(", " + ", ")")
    // ‖entry‖²/2 — 0.0-seeded left-associated, the Scala halfNormOf loop
    def halfNormSql(p: String): String =
      "((0.0 + " + (1 to subDim)
        .map(j => s"CAST($p[$j] AS DOUBLE) * CAST($p[$j] AS DOUBLE)")
        .mkString(" + ") + ") / 2.0)"
    val prologue =
      s"base AS (SELECT vec_id, embedding, sqrt(${selfDot("embedding", dim)}) AS nrm FROM embeddings), " +
        "cnd AS (SELECT * FROM base WHERE vec_id >= 10), " +
        "qry AS (SELECT * FROM base WHERE vec_id < 10), " +
        s"ck AS (SELECT vec_id, embedding, md5('pq$seed:' || CAST(vec_id AS VARCHAR)) AS h FROM cnd), " +
        "pick AS MATERIALIZED (SELECT embedding, CAST(row_number() OVER (ORDER BY h, vec_id) AS BIGINT) AS cidx " +
        s"FROM ck ORDER BY h, vec_id LIMIT $codebookSize), " +
        (0 until m).map { s =>
          s"pick${s}_0 AS (SELECT cidx, [embedding[j] FOR j IN generate_series(${s * subDim + 1}, ${(s + 1) * subDim})] AS pvec FROM pick)"
        }.mkString(", ")
    // trainIters per-subspace Lloyd rounds over the raw candidate
    // slices: min-L2 assignment against pick{s}_{t-1}, exact
    // fixed-point sums, double mean, float cast; clusters that attract
    // no rows keep their previous entry
    val trainChain = (1 to trainIters).flatMap { t =>
      (0 until m).map { s =>
        val prev = s"pick${s}_${t - 1}"
        val mean = s"((CAST(qsum AS DOUBLE) / CAST(cnt AS DOUBLE)) / $Q.0)"
        s"tasg${s}_$t AS (SELECT vec_id, embedding, cidx AS code FROM (SELECT c.vec_id, c.embedding, p.cidx, " +
          s"row_number() OVER (PARTITION BY c.vec_id ORDER BY (${subDotOff("c.embedding", "p.pvec", s)} - ${halfNormSql("p.pvec")}) DESC, p.cidx) AS rn " +
          s"FROM cnd c CROSS JOIN $prev p) x WHERE rn = 1), " +
          s"tsum${s}_$t AS (SELECT code, j, sum(CAST(round(CAST(embedding[${s * subDim} + j] AS DOUBLE) * $Q.0) AS BIGINT)) AS qsum, " +
          s"count(*) AS cnt FROM tasg${s}_$t CROSS JOIN (SELECT unnest(generate_series(1, $subDim)) AS j) dims GROUP BY code, j), " +
          s"tnew${s}_$t AS (SELECT code AS cidx, list(CAST($mean AS FLOAT) ORDER BY j) AS pvec FROM tsum${s}_$t GROUP BY code), " +
          s"pick${s}_$t AS MATERIALIZED (SELECT p.cidx, coalesce(n.pvec, p.pvec) AS pvec FROM $prev p LEFT JOIN tnew${s}_$t n USING (cidx))"
      }
    }.mkString(", ")
    val perSub = (0 until m).map { s =>
      val pk = s"pick${s}_$trainIters"
      // codes are min-L2 (the d − ‖entry‖²/2 argmax); LUTs are plain dots
      s"cd$s AS (SELECT c.vec_id, p.cidx, (${subDotOff("c.embedding", "p.pvec", s)} - ${halfNormSql("p.pvec")}) AS d " +
        s"FROM cnd c CROSS JOIN $pk p), " +
        s"code$s AS (SELECT vec_id, cidx AS code FROM (SELECT vec_id, cidx, " +
        s"row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cidx) AS rn FROM cd$s) t WHERE rn = 1), " +
        s"ql$s AS (SELECT q.vec_id, p.cidx, ${subDotOff("q.embedding", "p.pvec", s)} AS d " +
        s"FROM qry q CROSS JOIN $pk p)"
    }.mkString(", ")
    val codeJoin = (1 until m).map(s => s"JOIN code$s c$s USING (vec_id)").mkString(" ")
    val codeCols = (0 until m).map(s => s"c$s.code AS k$s").mkString(", ")
    val lutJoins = (0 until m).map { s =>
      val qEq = if (s == 0) "" else s" AND l$s.vec_id = l0.vec_id"
      s"JOIN ql$s l$s ON l$s.cidx = cs.k$s$qEq"
    }.mkString(" ")
    // left-associated like the Scala reduce: ((d0 + d1) + d2) + d3
    val adcSum = (1 until m).foldLeft("l0.d")((acc, s) => s"($acc + l$s.d)")
    s"WITH $prologue, " + (if (trainIters > 0) s"$trainChain, " else "") + s"$perSub, " +
      s"codes AS (SELECT c0.vec_id, $codeCols FROM code0 c0 $codeJoin), " +
      s"adc AS (SELECT l0.vec_id AS query_id, cs.vec_id AS neighbor_id, $adcSum AS adc " +
      s"FROM codes cs $lutJoins), " +
      "ref AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id, " +
      s"row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rn FROM adc) t WHERE rn <= $refine) " +
      "SELECT query_id, neighbor_id, rnk FROM (SELECT r.query_id, r.neighbor_id, " +
      s"CAST(row_number() OVER (PARTITION BY r.query_id ORDER BY ${pairDot("q.embedding", "c.embedding", dim)} / (q.nrm * c.nrm) DESC, r.neighbor_id) AS INT) AS rnk " +
      "FROM ref r JOIN qry q ON q.vec_id = r.query_id JOIN cnd c ON c.vec_id = r.neighbor_id) t " +
      s"WHERE rnk <= $k"
  }

  /** Oracle for `ann_ivf_pq_topk`: full replay of
    * [[graft.operators.Similarity.ivfPqTopK]] — the IVF prologue plus
    * `refineIters` Lloyd steps ([[lloydChain]]) for the coarse
    * centroids, RESIDUAL encoding (every candidate coded as its UNIT
    * vector minus its unit cell centroid — normalize-then-subtract in
    * the exact float32 steps of the operator), `trainIters` replayed
    * per-subspace k-means rounds over the residual slices (min-L2
    * assignment = argmax of dot − ‖pick‖²/2, fixed-point ×2^24 integer
    * sums, qsum/cnt/Q double means, float cast, empty clusters keep
    * their entry), min-L2 codes, per-query LUTs, ADC = coarse
    * dot(q, centroid) + the left-associated subspace sum, candidates
    * restricted to probed cells, then the exact cosine re-rank of the
    * refine survivors.
    */
  def annIvfPqTopK(k: Int, numCentroids: Int, nProbe: Int,
      m: Int = 4, codebookSize: Int = 16, refine: Int = 50,
      dim: Int = 64, seed: Long = 42L,
      trainIters: Int = 2, refineIters: Int = 1,
      deletedWhere: String = "FALSE"): String =
    annIvfPqRefChain(numCentroids, nProbe, m, codebookSize, refine, dim,
      seed, trainIters, refineIters, deletedWhere, ivfPqTopKTail(k, dim))

  /** Oracle for `ann_ivfpq_rerank_io`: the SURVIVOR-BUCKET KEY SET of
    * the persisted probe's exact re-rank — replays the full pipeline
    * down to the `refine` survivors ([[annIvfPqTopK]]'s `ref`), then
    * counts the distinct `"b" + substr(md5('vb:' + id), 1, 2)` buckets
    * among them (the exact `vecBucket` formula) against the bucket
    * count of the full serving membership. The file-level footprint
    * itself is physical evidence only the engine can observe — checked
    * by the loud require in `Similarity.ivfPqRerankIoReport` (the
    * [[annIvfProbedCells]] split of responsibilities).
    */
  def annIvfPqRerankBuckets(numCentroids: Int, nProbe: Int,
      m: Int = 4, codebookSize: Int = 16, refine: Int = 50,
      dim: Int = 64, seed: Long = 42L,
      trainIters: Int = 2, refineIters: Int = 1,
      deletedWhere: String = "FALSE"): String = {
    def bkt(idExpr: String): String =
      s"('b' || substr(md5('vb:' || CAST($idExpr AS VARCHAR)), 1, 2))"
    val tail =
      s"SELECT (SELECT CAST(count(DISTINCT ${bkt("vec_id")}) AS BIGINT) " +
        s"FROM cnd WHERE NOT ($deletedWhere)) AS n_buckets_total, " +
        s"CAST(count(DISTINCT ${bkt("neighbor_id")}) AS BIGINT) AS n_buckets_probed, " +
        "TRUE AS io_pruned FROM ref"
    annIvfPqRefChain(numCentroids, nProbe, m, codebookSize, refine, dim,
      seed, trainIters, refineIters, deletedWhere, tail)
  }

  /** Oracle for `ann_ivfpq_retrained`: the full [[annIvfPqTopK]]
    * replay with the CODEBOOK-DRIFT REPAIR spliced in — after the
    * global books train, cells 1..nDirty each re-run `cellIters`
    * per-subspace Lloyd rounds on THEIR OWN residuals (seeded from the
    * trained global book — exactly `retrainPqCellBooks`), the dirty
    * cells' codes re-encode under their cell books, query LUTs carry a
    * per-book dimension (bcell 0 = global), and the ADC decodes each
    * candidate against the book its cell serves with.
    */
  def annIvfPqRetrainedTopK(k: Int, numCentroids: Int, nProbe: Int,
      nDirty: Int, cellIters: Int = 2,
      m: Int = 4, codebookSize: Int = 16, refine: Int = 50,
      dim: Int = 64, seed: Long = 42L,
      trainIters: Int = 2, refineIters: Int = 1): String =
    annIvfPqRefChain(numCentroids, nProbe, m, codebookSize, refine, dim,
      seed, trainIters, refineIters, "FALSE", ivfPqTopKTail(k, dim),
      retrain = Some((nDirty, cellIters)))

  /** The shared WITH-chain of the IVF-PQ replays, ending at the
    * `ref` (refine-survivor) CTE, with a caller-chosen final SELECT.
    * `retrain = Some((nDirty, cellIters))` splices the per-cell
    * codebook repair in ([[annIvfPqRetrainedTopK]]). */
  private def annIvfPqRefChain(numCentroids: Int, nProbe: Int,
      m: Int, codebookSize: Int, refine: Int,
      dim: Int, seed: Long,
      trainIters: Int, refineIters: Int,
      deletedWhere: String, tail: String,
      retrain: Option[(Int, Int)] = None): String = {
    require(dim % m == 0)
    val subDim = dim / m
    val Q = (1L << 24).toString
    val centName = if (refineIters == 0) "cent0" else s"cent$refineIters"
    // dot of a full-dim vector's subspace-s slice against a subDim pick
    def subDotOff(va: String, vb: String, s: Int): String =
      (1 to subDim)
        .map(j => s"CAST($va[${s * subDim + j}] AS DOUBLE) * CAST($vb[$j] AS DOUBLE)")
        .mkString("(", " + ", ")")
    // ‖pick‖²/2 — 0.0-seeded left-associated, the Scala halfNormOf loop
    def halfNormSql(p: String): String =
      "((0.0 + " + (1 to subDim)
        .map(j => s"CAST($p[$j] AS DOUBLE) * CAST($p[$j] AS DOUBLE)")
        .mkString(" + ") + ") / 2.0)"
    // IVF side: cell assignment for candidates, nProbe probes per query
    // (probes also carry the RAW coarse dot — the ADC's cross-cell term)
    val ivfCtes =
      s"cdA AS (SELECT c.vec_id, c.embedding, c.nrm, ct.cidx, ${pairDot("c.embedding", "ct.cvec", dim)} / c.nrm AS dot " +
        s"FROM cnd c CROSS JOIN $centName ct), " +
        "cellasg AS MATERIALIZED (SELECT vec_id, embedding, nrm, cidx AS cell FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cidx) AS rn FROM cdA) t WHERE rn = 1), " +
        // residuals of the UNIT vector: float32 divide-then-subtract
        s"cres AS MATERIALIZED (SELECT ca.vec_id, ca.cell, " +
        s"[CAST(CAST(ca.embedding[j] AS DOUBLE) / ca.nrm AS FLOAT) - ct.cvec[j] FOR j IN generate_series(1, $dim)] AS rvec " +
        s"FROM cellasg ca JOIN $centName ct ON ct.cidx = ca.cell), " +
        s"qd AS (SELECT q.vec_id, q.embedding, q.nrm, ct.cidx, ${pairDot("q.embedding", "ct.cvec", dim)} / q.nrm AS dot, " +
        s"${pairDot("q.embedding", "ct.cvec", dim)} AS rawdot " +
        s"FROM qry q CROSS JOIN $centName ct), " +
        "probe AS (SELECT vec_id AS query_id, cidx AS cell, rawdot AS coarse FROM " +
        s"(SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cidx) AS rn FROM qd) t WHERE rn <= $nProbe)"
    // PQ seed: md5-ordered pick, stored as the
    // picked rows' residuals, sliced per subspace
    val pqPick =
      s"pck AS (SELECT vec_id, md5('pq$seed:' || CAST(vec_id AS VARCHAR)) AS h FROM cnd), " +
        "pickseed AS MATERIALIZED (SELECT cr.rvec, CAST(row_number() OVER (ORDER BY k.h, k.vec_id) AS BIGINT) AS cidx " +
        s"FROM pck k JOIN cres cr ON cr.vec_id = k.vec_id ORDER BY k.h, k.vec_id LIMIT $codebookSize), " +
        (0 until m).map { s =>
          s"pick${s}_0 AS (SELECT cidx, [rvec[j] FOR j IN generate_series(${s * subDim + 1}, ${(s + 1) * subDim})] AS pvec FROM pickseed)"
        }.mkString(", ")
    // trainIters per-subspace Lloyd rounds: min-L2 assignment against
    // pick{s}_{t-1}, exact fixed-point sums, double mean, float cast;
    // clusters that attract no rows keep their previous entry
    val trainChain = (1 to trainIters).flatMap { t =>
      (0 until m).map { s =>
        val prev = s"pick${s}_${t - 1}"
        val mean = s"((CAST(qsum AS DOUBLE) / CAST(cnt AS DOUBLE)) / $Q.0)"
        s"tasg${s}_$t AS (SELECT vec_id, rvec, cidx AS code FROM (SELECT c.vec_id, c.rvec, p.cidx, " +
          s"row_number() OVER (PARTITION BY c.vec_id ORDER BY (${subDotOff("c.rvec", "p.pvec", s)} - ${halfNormSql("p.pvec")}) DESC, p.cidx) AS rn " +
          s"FROM cres c CROSS JOIN $prev p) x WHERE rn = 1), " +
          s"tsum${s}_$t AS (SELECT code, j, sum(CAST(round(CAST(rvec[${s * subDim} + j] AS DOUBLE) * $Q.0) AS BIGINT)) AS qsum, " +
          s"count(*) AS cnt FROM tasg${s}_$t CROSS JOIN (SELECT unnest(generate_series(1, $subDim)) AS j) dims GROUP BY code, j), " +
          s"tnew${s}_$t AS (SELECT code AS cidx, list(CAST($mean AS FLOAT) ORDER BY j) AS pvec FROM tsum${s}_$t GROUP BY code), " +
          s"pick${s}_$t AS MATERIALIZED (SELECT p.cidx, coalesce(n.pvec, p.pvec) AS pvec FROM $prev p LEFT JOIN tnew${s}_$t n USING (cidx))"
      }
    }.mkString(", ")
    val perSub = (0 until m).map { s =>
      val pk = s"pick${s}_$trainIters"
      // codes are min-L2 (the d − ‖pick‖²/2 argmax); LUTs are plain dots
      s"cd$s AS (SELECT c.vec_id, p.cidx, (${subDotOff("c.rvec", "p.pvec", s)} - ${halfNormSql("p.pvec")}) AS d " +
        s"FROM cres c CROSS JOIN $pk p), " +
        s"code$s AS (SELECT vec_id, cidx AS code FROM (SELECT vec_id, cidx, " +
        s"row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cidx) AS rn FROM cd$s) t WHERE rn = 1), " +
        s"ql$s AS (SELECT q.vec_id, p.cidx, ${subDotOff("q.embedding", "p.pvec", s)} AS d " +
        s"FROM qry q CROSS JOIN $pk p)"
    }.mkString(", ")
    val codeJoin = (1 until m).map(s => s"JOIN code$s c$s USING (vec_id)").mkString(" ")
    val codeCols = (0 until m).map(s => s"c$s.code AS k$s").mkString(", ")
    val lutJoins = (0 until m).map { s =>
      val qEq = if (s == 0) "" else s" AND l$s.vec_id = l0.vec_id"
      s"JOIN ql$s l$s ON l$s.cidx = cs.k$s$qEq"
    }.mkString(" ")
    // coarse-first, then left-associated subspaces — exactly the Scala
    // foldLeft(col("__coarse"))(_ + _)
    val adcSum = (1 until m).foldLeft("(pr.coarse + l0.d)")((acc, s) => s"($acc + l$s.d)")
    val lloyd = if (refineIters == 0) "" else s"${lloydChain(refineIters, dim)}, "
    // with retrain: per-cell book chains (seeded from the trained
    // global book, cellIters Lloyd rounds on that cell's residuals),
    // dirty-cell re-encode, and a bcell dimension on the LUTs so each
    // candidate decodes against the book its cell serves with
    val retrainBlock = retrain.map { case (nDirty, cIters) =>
      val mean = s"((CAST(qsum AS DOUBLE) / CAST(cnt AS DOUBLE)) / $Q.0)"
      val chains = (1 to nDirty).flatMap { c =>
        (0 until m).map { s =>
          val steps = (1 to cIters).map { t =>
            val prev = s"cbk${c}_${s}_${t - 1}"
            s"casg${c}_${s}_$t AS (SELECT vec_id, rvec, cidx AS code FROM (SELECT r.vec_id, r.rvec, p.cidx, " +
              s"row_number() OVER (PARTITION BY r.vec_id ORDER BY (${subDotOff("r.rvec", "p.pvec", s)} - ${halfNormSql("p.pvec")}) DESC, p.cidx) AS rn " +
              s"FROM (SELECT * FROM cres WHERE cell = $c) r CROSS JOIN $prev p) x WHERE rn = 1), " +
              s"csum${c}_${s}_$t AS (SELECT code, j, sum(CAST(round(CAST(rvec[${s * subDim} + j] AS DOUBLE) * $Q.0) AS BIGINT)) AS qsum, " +
              s"count(*) AS cnt FROM casg${c}_${s}_$t CROSS JOIN (SELECT unnest(generate_series(1, $subDim)) AS j) dims GROUP BY code, j), " +
              s"cnw${c}_${s}_$t AS (SELECT code AS cidx, list(CAST($mean AS FLOAT) ORDER BY j) AS pvec FROM csum${c}_${s}_$t GROUP BY code), " +
              s"cbk${c}_${s}_$t AS MATERIALIZED (SELECT p.cidx, coalesce(n.pvec, p.pvec) AS pvec FROM $prev p LEFT JOIN cnw${c}_${s}_$t n USING (cidx))"
          }.mkString(", ")
          s"cbk${c}_${s}_0 AS (SELECT cidx, pvec FROM pick${s}_$trainIters), $steps, " +
            s"dcd${c}_$s AS (SELECT r.vec_id, p.cidx, (${subDotOff("r.rvec", "p.pvec", s)} - ${halfNormSql("p.pvec")}) AS d " +
            s"FROM (SELECT * FROM cres WHERE cell = $c) r CROSS JOIN cbk${c}_${s}_$cIters p), " +
            s"dcode${c}_$s AS (SELECT vec_id, cidx AS code FROM (SELECT vec_id, cidx, " +
            s"row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cidx) AS rn FROM dcd${c}_$s) t WHERE rn = 1), " +
            s"dql${c}_$s AS (SELECT q.vec_id, p.cidx, ${subDotOff("q.embedding", "p.pvec", s)} AS d FROM qry q CROSS JOIN cbk${c}_${s}_$cIters p)"
        }
      }.mkString(", ")
      val dcodesAll = (1 to nDirty).map { c =>
        val dJoin = (1 until m).map(s => s"JOIN dcode${c}_$s dj$s USING (vec_id)").mkString(" ")
        val dCols = (0 until m).map(s =>
          (if (s == 0) s"dj0x.code AS k0" else s"dj$s.code AS k$s")).mkString(", ")
        s"dcodes$c AS (SELECT vec_id, CAST($c AS BIGINT) AS cell, $dCols " +
          s"FROM dcode${c}_0 dj0x $dJoin WHERE NOT ($deletedWhere))"
      }.mkString(", ")
      val luts = (0 until m).map { s =>
        val unions = (1 to nDirty).map(c =>
          s"UNION ALL SELECT CAST($c AS BIGINT) AS bcell, vec_id, cidx, d FROM dql${c}_$s").mkString(" ")
        s"lutall$s AS (SELECT CAST(0 AS BIGINT) AS bcell, vec_id, cidx, d FROM ql$s $unions)"
      }.mkString(", ")
      (s"$chains, $dcodesAll, $luts", nDirty)
    }
    val codesCte = retrainBlock match {
      case None =>
        s"codes AS (SELECT c0.vec_id, ca.cell, $codeCols FROM code0 c0 $codeJoin " +
          s"JOIN cellasg ca ON ca.vec_id = c0.vec_id WHERE NOT ($deletedWhere))"
      case Some((_, nDirty)) =>
        val dirtyUnions = (1 to nDirty).map(c =>
          s"UNION ALL SELECT vec_id, cell, ${(0 until m).map(s => s"k$s").mkString(", ")} FROM dcodes$c").mkString(" ")
        s"codes AS (SELECT c0.vec_id, ca.cell, $codeCols FROM code0 c0 $codeJoin " +
          s"JOIN cellasg ca ON ca.vec_id = c0.vec_id WHERE NOT ($deletedWhere) AND ca.cell > $nDirty $dirtyUnions)"
    }
    val adcCte = retrainBlock match {
      case None =>
        s"adc AS (SELECT l0.vec_id AS query_id, cs.vec_id AS neighbor_id, $adcSum AS adc " +
          s"FROM codes cs JOIN probe pr ON pr.cell = cs.cell $lutJoins AND l0.vec_id = pr.query_id)"
      case Some((_, nDirty)) =>
        val bc = s"(CASE WHEN cs.cell <= $nDirty THEN cs.cell ELSE CAST(0 AS BIGINT) END)"
        val joins = (0 until m).map { s =>
          val qEq = if (s == 0) "AND l0.vec_id = pr.query_id" else s"AND l$s.vec_id = l0.vec_id"
          s"JOIN lutall$s l$s ON l$s.cidx = cs.k$s AND l$s.bcell = $bc $qEq"
        }.mkString(" ")
        s"adc AS (SELECT l0.vec_id AS query_id, cs.vec_id AS neighbor_id, $adcSum AS adc " +
          s"FROM codes cs JOIN probe pr ON pr.cell = cs.cell $joins)"
    }
    s"WITH ${ivfPrologue(numCentroids, dim, seed)}, $lloyd$ivfCtes, $pqPick, " +
      (if (trainIters > 0) s"$trainChain, " else "") + s"$perSub, " +
      retrainBlock.map { case (ctes, _) => s"$ctes, " }.getOrElse("") +
      // codes carry their IVF cell so the probe join bounds the ADC
      // scan; a deletedWhere restricts SERVING membership only — the
      // artifacts (centroids + codebooks) stay trained on the full
      // pre-delete corpus, exactly the frozen-artifact RTBF lifecycle
      s"$codesCte, $adcCte, " +
      "ref AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id, " +
      s"row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rn FROM adc) t WHERE rn <= $refine) " +
      tail
  }

  /** The exact-cosine re-rank tail shared by [[annIvfPqTopK]]; split
    * out so [[annIvfPqRerankBuckets]] can replace it with the
    * bucket-key-set tail over the same `ref` survivors. */
  private def ivfPqTopKTail(k: Int, dim: Int): String =
    "SELECT query_id, neighbor_id, rnk FROM (SELECT r.query_id, r.neighbor_id, " +
      s"CAST(row_number() OVER (PARTITION BY r.query_id ORDER BY ${pairDot("q.embedding", "c.embedding", dim)} / (q.nrm * c.nrm) DESC, r.neighbor_id) AS INT) AS rnk " +
      "FROM ref r JOIN qry q ON q.vec_id = r.query_id JOIN cnd c ON c.vec_id = r.neighbor_id) t " +
      s"WHERE rnk <= $k"

  // ----------------------------------------------------------- multimodal

  /** Oracle for `media_byte_stats`: byte length + md5 of the text
    * payload — DuckDB's md5(VARCHAR) hashes the UTF-8 bytes, identical
    * to Spark's md5 over the text cast to binary.
    */
  def mediaByteStats: String =
    "SELECT CAST(doc_id AS BIGINT) AS media_id, 'text' AS kind, " +
      "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, md5(text) AS content_hash " +
      "FROM documents"

  /** Oracle for `media_resize_stats`: the stub resize is a
    * deterministic prefix slice of the payload (`bytes.take(w·h)`).
    * DuckDB's md5 only accepts VARCHAR, so the slice is taken on
    * characters — equal to the byte slice because the documents corpus
    * is pure ASCII (octet_length == length for every row at every SF,
    * which this query itself re-verifies via n_bytes).
    */
  def mediaResizeStats(maxBytes: Int): String =
    "SELECT CAST(doc_id AS BIGINT) AS media_id, 'text' AS kind, " +
      s"CAST(LEAST(octet_length(encode(text)), $maxBytes) AS BIGINT) AS n_bytes, " +
      s"md5(substring(text, 1, $maxBytes)) AS content_hash FROM documents"

  /** Oracle for `media_frame_stats`: the stub container cuts the
    * payload into `ceil(n / max(1, n/16))` slices of `max(1, n/16)`
    * bytes (Scala `grouped` semantics — ragged last slice) and keeps
    * every `everyN`-th. Pure offset arithmetic, replayed with
    * substrings; character slicing equals byte slicing on the
    * all-ASCII corpus (same argument as [[mediaResizeStats]]).
    */
  def mediaFrameStats(nFrames: Int, everyN: Int): String =
    "WITH m AS (SELECT CAST(doc_id AS BIGINT) AS media_id, text, length(text) AS n FROM documents), " +
      s"p AS (SELECT media_id, text, n, greatest(n // $nFrames, 1) AS fs FROM m), " +
      "f AS (SELECT media_id, text, fs, CAST(unnest(generate_series(0, CAST((n + fs - 1) // fs AS INT) - 1)) AS INT) AS frame_idx FROM p) " +
      "SELECT media_id, frame_idx, CAST(length(substring(text, frame_idx * fs + 1, fs)) AS INT) AS n_bytes, " +
      s"md5(substring(text, frame_idx * fs + 1, fs)) AS frame_md5 FROM f WHERE frame_idx % $everyN = 0"

  // ------------------------------------------------- sampling / sketches

  /** CASE expression replaying [[graft.operators.Sampling.splitCol]]:
    * same md5 input string, same 4-hex-char prefix, same threshold
    * literals (generated by the same `Sampling.thresholds` call the
    * operator uses, so query and oracle cannot drift).
    */
  /** Replays [[graft.operators.TextAnalysis.collocations]]: one list
    * comprehension per window offset generates the position pairs from
    * the raw split array (positions INCLUDE edge empties, matching the
    * Spark side, which pairs on the raw array and filters '' pairs).
    */
  def collocations(window: Int, minPairCount: Long, topK: Int): String = {
    val offsets = (1 to window).map { o =>
      val hi = if (o == 1) "len(toks)" else s"len(toks)-${o - 1}"
      s"[{'a': toks[i], 'b': toks[i+$o]} for i in range(1, $hi)]"
    }.mkString(" || ")
    s"WITH d AS (SELECT string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents), " +
      s"p AS (SELECT least(x.a, x.b) AS token_a, greatest(x.a, x.b) AS token_b " +
      s"FROM (SELECT unnest($offsets) AS x FROM d) u " +
      s"WHERE x.a <> '' AND x.b <> '' AND x.a <> x.b), " +
      s"pc AS (SELECT token_a, token_b, count(*) AS n_pair FROM p GROUP BY 1, 2 " +
      s"HAVING count(*) >= $minPairCount), " +
      s"m AS (SELECT t AS token, count(*) AS n FROM " +
      s"(SELECT unnest(toks) AS t FROM d) WHERE t <> '' GROUP BY 1) " +
      s"SELECT pc.token_a, pc.token_b, pc.n_pair, ma.n AS n_a, mb.n AS n_b, " +
      s"CAST(2000000 * pc.n_pair // (ma.n + mb.n) AS BIGINT) AS dice_ppm " +
      s"FROM pc JOIN m ma ON ma.token = pc.token_a JOIN m mb ON mb.token = pc.token_b " +
      s"ORDER BY dice_ppm DESC, pc.token_a, pc.token_b LIMIT $topK"
  }

  def hashSplitCase(
      keyExpr: String, salt: String, fractions: Seq[(String, Double)]): String = {
    val h = s"substr(md5('$salt' || ':' || $keyExpr), 1, 4)"
    val whens = graft.operators.Sampling.thresholds(fractions)
      .map { case (name, hex) => s"WHEN $h < '$hex' THEN '$name'" }
      .mkString(" ")
    s"CASE $whens ELSE '${fractions.last._1}' END"
  }

  /** WHERE condition replaying [[graft.operators.Sampling.stratifiedKeep]]
    * (thresholds from the same `Sampling.rateHex`).
    */
  def stratifiedKeepWhere(
      keyExpr: String,
      strataExpr: String,
      salt: String,
      rates: Seq[(String, Double)],
      defaultRate: Double): String = {
    val h = s"substr(md5('$salt' || ':' || $keyExpr), 1, 4)"
    def keep(rate: Double): String =
      graft.operators.Sampling.rateHex(rate).map(hex => s"$h < '$hex'").getOrElse("TRUE")
    val whens = rates
      .map { case (stratum, rate) => s"WHEN $strataExpr = '$stratum' THEN ${keep(rate)}" }
      .mkString(" ")
    s"CASE $whens ELSE ${keep(defaultRate)} END"
  }

  /** WHERE condition replaying [[graft.operators.Sampling.weightedKeep]]:
    * same md5 draw, same integer-division grid threshold (`//` is
    * DuckDB integer division; `hex`/`lpad`/`lower` render the identical
    * fixed-width threshold string).
    */
  def weightedKeepWhere(
      keyExpr: String, weightExpr: String, salt: String, wMax: Long): String =
    s"($weightExpr >= $wMax OR ($weightExpr > 0 AND " +
      s"substr(md5('$salt' || ':' || $keyExpr), 1, 4) < " +
      s"lpad(lower(hex(($weightExpr * 65536) // $wMax)), 4, '0')))"

  /** Oracle for `sketch_kmv_distinct`: replay of the KMV sketch
    * ([[graft.functions.KmvAgg]]) over distinct users per event type.
    * The 32-bit hash replays [[graft.plans.MixHash32]]: the wrapping
    * multiply by C = 0x9E3779B97F4A7C15 is decomposed into 32-bit limbs
    * (`fold = a·2^32 + b`; `fold·C mod 2^64 = ((a·C_lo + b·C_hi)·2^32
    * + b·C_lo) mod 2^64`) so every intermediate fits HUGEINT; the k-th
    * smallest distinct hash and the floor-division estimate are pure
    * integer arithmetic in both engines.
    */
  def kmvDistinct(k: Int): String = {
    val cap = (k - 1).toLong * 4294967296L
    val cHi = 2654435769L // 0x9E3779B9
    val cLo = 2135587861L // 0x7F4A7C15
    val mix = "(((a * " + cLo + " + b * " + cHi + ") * 4294967296 + b * " + cLo +
      ") % 18446744073709551616)"
    s"WITH d AS (SELECT DISTINCT event_type, user_id FROM events), " +
      "dx AS (SELECT event_type, user_id, hex(encode('kmv:' || CAST(user_id AS VARCHAR))) AS hx FROM d), " +
      s"fl AS (SELECT event_type, user_id, ${rollFold("hx")} AS fold FROM dx), " +
      "lm AS (SELECT event_type, user_id, fold // 4294967296 AS a, fold % 4294967296 AS b FROM fl), " +
      s"h AS (SELECT event_type, user_id, CAST($mix // 4294967296 AS BIGINT) AS h32 FROM lm), " +
      "hd AS (SELECT DISTINCT event_type, h32 FROM h), " +
      "g AS (SELECT event_type, count(*) AS n_h FROM hd GROUP BY event_type), " +
      "r AS (SELECT event_type, h32, row_number() OVER (PARTITION BY event_type ORDER BY h32) AS rn FROM hd), " +
      s"kth AS (SELECT r.event_type, r.h32 AS kth_min FROM r JOIN g ON g.event_type = r.event_type " +
      s"WHERE r.rn = LEAST(g.n_h, $k)), " +
      "ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events GROUP BY event_type) " +
      s"SELECT ex.event_type, ex.n_exact, CAST(LEAST(g.n_h, $k) AS INT) AS n_kept, kth.kth_min, " +
      s"CAST(CASE WHEN g.n_h < $k THEN g.n_h ELSE $cap // kth.kth_min END AS BIGINT) AS est_distinct " +
      "FROM ex JOIN g ON g.event_type = ex.event_type JOIN kth ON kth.event_type = ex.event_type"
  }

  /** Oracle for `sketch_kmv_set_ops`: the KMV set-operation estimates
    * replayed side by side — same rolling-hash → mix pipeline as
    * [[kmvDistinct]] per side, k-min sketches, sketch union, shared
    * count among the union sketch, `cap // kth` estimators and the
    * `shared·est(∪) // k` intersection form.
    */
  def kmvSetOps(k: Int, whereA: String, whereB: String): String = {
    val cap = (k - 1).toLong * 4294967296L
    val cHi = 2654435769L
    val cLo = 2135587861L
    val mix = "(((a * " + cLo + " + b * " + cHi + ") * 4294967296 + b * " + cLo +
      ") % 18446744073709551616)"
    def side(t: String, where: String): String =
      s"d$t AS (SELECT DISTINCT user_id FROM events WHERE $where), " +
        s"dx$t AS (SELECT user_id, hex(encode('kmv:' || CAST(user_id AS VARCHAR))) AS hx FROM d$t), " +
        s"fl$t AS (SELECT user_id, ${rollFold("hx")} AS fold FROM dx$t), " +
        s"lm$t AS (SELECT fold // 4294967296 AS a, fold % 4294967296 AS b FROM fl$t), " +
        s"h$t AS (SELECT DISTINCT CAST($mix // 4294967296 AS BIGINT) AS h32 FROM lm$t), " +
        s"r$t AS (SELECT h32, row_number() OVER (ORDER BY h32) AS rn FROM h$t), " +
        s"sk$t AS (SELECT h32 FROM r$t WHERE rn <= $k), " +
        s"n$t AS (SELECT count(*) AS n, max(h32) AS kth FROM sk$t)"
    s"WITH ${side("a", whereA)}, ${side("b", whereB)}, " +
      "u0 AS (SELECT h32 FROM ska UNION SELECT h32 FROM skb), " +
      "ru AS (SELECT h32, row_number() OVER (ORDER BY h32) AS rn FROM u0), " +
      s"sku AS (SELECT h32 FROM ru WHERE rn <= $k), " +
      "nu AS (SELECT count(*) AS n, max(h32) AS kth FROM sku), " +
      "sh AS (SELECT count(*) AS n_sh FROM sku JOIN ska USING (h32) JOIN skb USING (h32)) " +
      s"SELECT CAST($k AS INT) AS k, " +
      s"CAST(CASE WHEN na.n < $k THEN na.n ELSE $cap // na.kth END AS BIGINT) AS est_a, " +
      s"CAST(CASE WHEN nb.n < $k THEN nb.n ELSE $cap // nb.kth END AS BIGINT) AS est_b, " +
      s"CAST(CASE WHEN nu.n < $k THEN nu.n ELSE $cap // nu.kth END AS BIGINT) AS est_union, " +
      "CAST(sh.n_sh AS BIGINT) AS n_shared_topk, " +
      // nu.n >= k holds in the ELSE arm: the union estimate there is
      // always the cap/kth form (mirrors Sketches.kmvSetEstimates)
      s"CAST(CASE WHEN nu.n < $k THEN sh.n_sh " +
      s"ELSE sh.n_sh * ($cap // nu.kth) // $k END AS BIGINT) AS est_intersect " +
      "FROM na, nb, nu, sh"
  }

  /** Integer bit-length of a non-negative expression known to fit in
    * `bits` bits, as a comparison sum — `(e >= 1) + (e >= 2) + … +
    * (e >= 2^(bits-1))` — valid SQL on BOTH engines (one text, no
    * engine-specific bit intrinsics, no floats).
    */
  def bitLenSum(e: String, bits: Int): String =
    (0 until bits).map(j => s"CAST($e >= ${1L << j} AS INT)").mkString("(", " + ", ")")

  /** Replays the `sketch_hll_registers` query: same rolling-hash +
    * MixHash32 pipeline as [[kmvDistinct]] under an 'hll:' namespace,
    * then register = h32 % m, rho = (32 − log2 m) − bitlen(h32 // m) + 1,
    * max per register. The register table IS the HLL sketch.
    */
  def hllRegisters(m: Int): String =
    hllRegistersOver(m, "events", "event_type", "user_id")

  /** The same replay over any relation: group expression `groupExpr`
    * (emitted under its own name), key expression `keyExpr`. Proves
    * sketch identities cross-engine wherever the engine-side sketch is
    * built at a different grain (e.g. `sketch_hll_rollup`: DuckDB
    * rebuilds directly at region level, Spark merges nation sketches —
    * max-associativity makes them bit-identical).
    */
  def hllRegistersOver(
      m: Int, fromSql: String, groupExpr: String, keyExpr: String): String = {
    require(m > 0 && (m & (m - 1)) == 0, "m must be a power of two")
    val restBits = 32 - Integer.numberOfTrailingZeros(m)
    val cHi = 2654435769L
    val cLo = 2135587861L
    val mix = "(((a * " + cLo + " + b * " + cHi + ") * 4294967296 + b * " + cLo +
      ") % 18446744073709551616)"
    s"WITH d AS (SELECT DISTINCT $groupExpr AS grp, $keyExpr AS key FROM $fromSql), " +
      "dx AS (SELECT grp, key, hex(encode('hll:' || CAST(key AS VARCHAR))) AS hx FROM d), " +
      s"fl AS (SELECT grp, key, ${rollFold("hx")} AS fold FROM dx), " +
      "lm AS (SELECT grp, key, fold // 4294967296 AS a, fold % 4294967296 AS b FROM fl), " +
      s"h AS (SELECT grp, CAST($mix // 4294967296 AS BIGINT) AS h32 FROM lm), " +
      s"rr AS (SELECT grp, h32 % $m AS reg, " +
      s"${restBits + 1} - ${bitLenSum(s"(h32 // $m)", restBits)} AS rho FROM h) " +
      s"SELECT grp AS $groupExpr, reg, CAST(max(rho) AS INT) AS max_rho " +
      "FROM rr GROUP BY grp, reg"
  }

  /** Replays `graph_kcore`: peel rounds unrolled as CTE pairs
    * (degrees → survivors). Peeling is idempotent at the fixpoint, so
    * `rounds` only needs to be ≥ the convergence depth — extra rounds
    * remove nothing.
    */
  def kCore(k: Int, rounds: Int): String = {
    val chain = (0 until rounds).map { i =>
      s"b$i AS (SELECT src FROM (SELECT src, count(*) AS n FROM e$i GROUP BY src) WHERE n < $k), " +
        s"e${i + 1} AS (SELECT x.src, x.dst FROM e$i x WHERE " +
        s"NOT EXISTS (SELECT 1 FROM b$i WHERE b$i.src = x.src) AND " +
        s"NOT EXISTS (SELECT 1 FROM b$i WHERE b$i.src = x.dst))"
    }.mkString(", ")
    "WITH raw AS (SELECT DISTINCT l_suppkey AS s, l_partkey + 1000000 AS p FROM lineitem), " +
      "e0 AS (SELECT s AS src, p AS dst FROM raw UNION SELECT p, s FROM raw), " +
      s"$chain " +
      s"SELECT src AS node, count(*) AS core_degree FROM e$rounds GROUP BY src"
  }

  /** Oracle for `sketch_heavy_hitters`: full replay of
    * [[graft.operators.Sketches.heavyHitters]] — the same seeded
    * rolling hash (`'cm<r>:' || item`, [[rollFold]]) folds every row
    * into depth×width Count-Min registers; the true top-K (ties by
    * item string) probes its depth buckets and takes the min.
    */
  def sketchHeavyHitters(table: String, itemSql: String,
      topK: Int = 20, depth: Int = 4, width: Int = 256): String = {
    def bucket(itemRef: String): String = {
      val hx = s"hex(encode('cm' || CAST(r AS VARCHAR) || ':' || $itemRef))"
      val signed = toSigned(rollFold(hx))
      s"((($signed % $width) + $width) % $width)"
    }
    s"WITH items AS (SELECT CAST($itemSql AS VARCHAR) AS item FROM $table), " +
      s"rs AS (SELECT unnest(generate_series(0, ${depth - 1})) AS r), " +
      s"regs AS MATERIALIZED (SELECT r, ${bucket("item")} AS bucket, count(*) AS cnt " +
      "FROM items CROSS JOIN rs GROUP BY 1, 2), " +
      "truth AS (SELECT item, count(*) AS true_n FROM items GROUP BY 1), " +
      "top AS (SELECT item, true_n FROM (SELECT item, true_n, " +
      s"row_number() OVER (ORDER BY true_n DESC, item) AS rk FROM truth) t WHERE rk <= $topK), " +
      s"probes AS (SELECT item, true_n, r, ${bucket("item")} AS bucket FROM top CROSS JOIN rs) " +
      "SELECT p.item, p.true_n, CAST(min(g.cnt) AS BIGINT) AS est_n " +
      "FROM probes p JOIN regs g USING (r, bucket) GROUP BY 1, 2"
  }

  // ------------------------------------------------- repeated-span excision

  /** Full replay of `Dedup.exciseRepeatedSpans` (raw-text span keys):
    * stride-1 `w`-token spans, global first-occurrence survivors by the
    * same `doc_id·2³² + pos` ordinal, covered-position union, ordered
    * reassembly. Positions are 0-based on both engines.
    */
  def exciseSpans(w: Int): String =
    s"WITH ${exciseSpansCtes(w)} " +
      "SELECT arr.doc_id, CAST(len(a) AS INT) AS n_tokens, COALESCE(cl.n_kept, 0) AS n_kept, " +
      "md5(COALESCE(cl.ct, '')) AS clean_md5 FROM arr LEFT JOIN cl USING (doc_id)"

  /** The excision CTE chain alone (`arr`, `tok`, `sp`, `rep`, `marked`,
    * `cov`, `kept`, `cl`) — `kept(doc_id, pos, tok)` is the cleaned
    * token table and `cl(doc_id, n_kept, ct)` the reassembled docs, for
    * oracles that keep processing the cleaned corpus.
    */
  def exciseSpansCtes(w: Int): String =
    "arr AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS a FROM documents), " +
      "tok AS (SELECT doc_id, CAST(unnest(generate_series(1, len(a))) - 1 AS INT) AS pos, unnest(a) AS tok FROM arr), " +
      s"sp AS (SELECT doc_id, pos, array_to_string(list_slice(a, pos + 1, pos + $w), ' ') AS span FROM " +
      s"(SELECT doc_id, a, CAST(unnest(generate_series(1, greatest(len(a) - ${w - 1}, 0))) - 1 AS INT) AS pos FROM arr)), " +
      "rep AS (SELECT span, min(doc_id * 4294967296 + pos) AS first_ord FROM sp GROUP BY span HAVING count(*) >= 2), " +
      "marked AS (SELECT s.doc_id, s.pos FROM sp s JOIN rep r ON s.span = r.span " +
      "WHERE s.doc_id * 4294967296 + s.pos <> r.first_ord), " +
      s"cov AS (SELECT DISTINCT doc_id, CAST(unnest(generate_series(pos, pos + ${w - 1})) AS INT) AS pos FROM marked), " +
      "kept AS (SELECT t.doc_id, t.pos, t.tok FROM tok t WHERE NOT EXISTS " +
      "(SELECT 1 FROM cov c WHERE c.doc_id = t.doc_id AND c.pos = t.pos)), " +
      "cl AS (SELECT doc_id, CAST(count(*) AS INT) AS n_kept, string_agg(tok, ' ' ORDER BY pos) AS ct FROM kept GROUP BY doc_id)"

  // ------------------------------------------------- fixed-point PageRank

  /** Bit-exact replay of `Graph.pageRankFixed` on the undirected
    * supplier↔part graph (part node ids offset to avoid key collision):
    * the power iteration is UNROLLED into one CTE pair (contributions,
    * new ranks) per round, every step in BIGINT with `//` floor
    * division — the same scaled-integer arithmetic the Spark side runs,
    * so ranks match to the last unit.
    */
  def pageRankTopK(iters: Int, topK: Int,
      dampNum: Long = 85, dampDen: Long = 100,
      massScale: Long = 1000000000000L): String = {
    val base = s"($massScale // cnt)"
    val chain = (1 to iters).map { i =>
      s"c$i AS (SELECT e.dst AS node, CAST(sum(r.rank // d.outdeg) AS BIGINT) AS contrib " +
        s"FROM e JOIN r${i - 1} r ON r.node = e.src JOIN deg d ON d.node = e.src GROUP BY e.dst), " +
        s"r$i AS (SELECT nd.node, $base * ${dampDen - dampNum} // $dampDen + " +
        s"$dampNum * coalesce(c$i.contrib, 0) // $dampDen AS rank " +
        s"FROM nodes nd CROSS JOIN n LEFT JOIN c$i ON c$i.node = nd.node)"
    }.mkString(", ")
    "WITH raw AS (SELECT DISTINCT l_suppkey AS s, l_partkey + 1000000 AS p FROM lineitem), " +
      "e AS (SELECT s AS src, p AS dst FROM raw UNION SELECT p, s FROM raw), " +
      "nodes AS (SELECT DISTINCT src AS node FROM e), " +
      "deg AS (SELECT src AS node, count(*) AS outdeg FROM e GROUP BY src), " +
      "n AS (SELECT count(*) AS cnt FROM nodes), " +
      s"r0 AS (SELECT node, $massScale // cnt AS rank FROM nodes CROSS JOIN n), " +
      s"$chain " +
      s"SELECT node, rank FROM r$iters ORDER BY rank DESC, node LIMIT $topK"
  }

  /** Bit-exact replay of `Graph.pageRankPersonalized` on the same
    * supplier↔part graph, teleport restricted to every 5th supplier:
    * identical unrolled chain as [[pageRankTopK]] with the per-round
    * teleport `sdd · ((massScale // nSeeds) · (den−num) // den)` — all
    * BIGINT floor arithmetic.
    */
  def pageRankPersonalizedTopK(iters: Int, topK: Int,
      dampNum: Long = 85, dampDen: Long = 100,
      massScale: Long = 1000000000000L): String = {
    val base = s"($massScale // cnt)"
    val chain = (1 to iters).map { i =>
      s"c$i AS (SELECT e.dst AS node, CAST(sum(r.rank // d.outdeg) AS BIGINT) AS contrib " +
        s"FROM e JOIN r${i - 1} r ON r.node = e.src JOIN deg d ON d.node = e.src GROUP BY e.dst), " +
        s"r$i AS (SELECT nd.node, nd.sdd * ($base * ${dampDen - dampNum} // $dampDen) + " +
        s"$dampNum * coalesce(c$i.contrib, 0) // $dampDen AS rank " +
        s"FROM nodesT nd CROSS JOIN n LEFT JOIN c$i ON c$i.node = nd.node)"
    }.mkString(", ")
    "WITH raw AS (SELECT DISTINCT l_suppkey AS s, l_partkey + 1000000 AS p FROM lineitem), " +
      "e AS (SELECT s AS src, p AS dst FROM raw UNION SELECT p, s FROM raw), " +
      "nodes AS (SELECT DISTINCT src AS node FROM e), " +
      "deg AS (SELECT src AS node, count(*) AS outdeg FROM e GROUP BY src), " +
      "sd AS (SELECT DISTINCT s_suppkey AS node FROM supplier WHERE s_suppkey % 5 = 0), " +
      "nodesT AS (SELECT nd.node, CASE WHEN sd.node IS NULL THEN 0 ELSE 1 END AS sdd " +
      "FROM nodes nd LEFT JOIN sd ON sd.node = nd.node), " +
      "n AS (SELECT CAST(sum(sdd) AS BIGINT) AS cnt FROM nodesT), " +
      s"r0 AS (SELECT node, sdd * $base AS rank FROM nodesT CROSS JOIN n), " +
      s"$chain " +
      s"SELECT node, rank FROM r$iters ORDER BY rank DESC, node LIMIT $topK"
  }

  /** Bit-exact replay of `Graph.labelPropagation` on the same
    * supplier↔part graph, seeded with each supplier's nation key:
    * rounds unroll into (neighbor-label counts, per-node argmax,
    * clamped relabel) CTE triples; the argmax order (count desc, label
    * asc) is total, so every round is deterministic in both engines.
    */
  def labelPropagation(iters: Int): String = {
    val chain = (1 to iters).map { i =>
      s"c$i AS (SELECT e.dst AS node, l.label, count(*) AS n " +
        s"FROM e JOIN l${i - 1} l ON l.node = e.src WHERE l.label IS NOT NULL GROUP BY 1, 2), " +
        s"a$i AS (SELECT node, label FROM (SELECT node, label, " +
        s"row_number() OVER (PARTITION BY node ORDER BY n DESC, label) AS rn FROM c$i) WHERE rn = 1), " +
        s"l$i AS (SELECT nd.node, coalesce(sd.label, a$i.label) AS label FROM nodes nd " +
        s"LEFT JOIN sd ON sd.node = nd.node LEFT JOIN a$i ON a$i.node = nd.node)"
    }.mkString(", ")
    "WITH raw AS (SELECT DISTINCT l_suppkey AS s, l_partkey + 1000000 AS p FROM lineitem), " +
      "e AS (SELECT s AS src, p AS dst FROM raw UNION SELECT p, s FROM raw), " +
      "nodes AS (SELECT DISTINCT src AS node FROM e), " +
      "sd AS (SELECT s_suppkey AS node, s_nationkey AS label FROM supplier), " +
      "l0 AS (SELECT nd.node, sd.label FROM nodes nd LEFT JOIN sd ON sd.node = nd.node), " +
      s"$chain " +
      s"SELECT node, label FROM l$iters WHERE label IS NOT NULL"
  }

  /** Exact replay of `TextAnalysis.bpeTrainMerges`: each merge round
    * unrolls into (pair counts, argmax pick, corpus-wide fuse) CTEs.
    * The symbol string uses the same two-space-delimited encoding, so
    * DuckDB's left-to-right non-overlapping `replace` applies the merge
    * byte-for-byte like the Spark side; the argmax order
    * (n DESC, pair) is total, so every round is deterministic.
    */
  private def bpeChain(rounds: Int): String = {
    val chain = (1 to rounds).map { r =>
      s"p$r AS (SELECT pair, sum(f) AS n FROM (" +
        s"SELECT f, unnest([syms[i] || ' ' || syms[i+1] for i in range(1, len(syms))]) AS pair " +
        s"FROM (SELECT f, string_split(trim(s), '  ') AS syms FROM w$r)) GROUP BY pair), " +
        s"b$r AS (SELECT pair, n FROM p$r ORDER BY n DESC, pair LIMIT 1), " +
        s"w${r + 1} AS (SELECT w, replace(s, " +
        s"' ' || (SELECT replace(pair, ' ', '  ') FROM b$r) || ' ', " +
        s"' ' || (SELECT replace(pair, ' ', '') FROM b$r) || ' ') AS s, f FROM w$r)"
    }.mkString(", ")
    "WITH w1 AS (SELECT w, ' ' || array_to_string(string_split(w, ''), '  ') || ' ' AS s, f " +
      "FROM (SELECT w, count(*) AS f FROM (" +
      "SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w FROM documents) t " +
      "WHERE w <> '' GROUP BY w)), " +
      s"$chain"
  }

  def bpeTrainMerges(rounds: Int): String = {
    val rows = (1 to rounds)
      .map(r => s"SELECT $r AS round, pair, CAST(n AS BIGINT) AS n FROM b$r")
      .mkString(" UNION ALL ")
    s"${bpeChain(rounds)} SELECT * FROM ($rows)"
  }

  /** Replay of `TextAnalysis.bpeEncodedCounts`: the same merge chain,
    * then each document's words join the final word table and the
    * encoded length is the sum of per-word symbol counts.
    */
  def bpeEncodedCounts(rounds: Int): String =
    s"${bpeChain(rounds)} " +
      s"SELECT d.doc_id, count(*) AS n_words, " +
      s"CAST(sum(len(string_split(trim(ws.s), '  '))) AS BIGINT) AS n_bpe_tokens " +
      s"FROM (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w " +
      s"FROM documents) d JOIN w${rounds + 1} ws ON ws.w = d.w " +
      s"WHERE d.w <> '' GROUP BY d.doc_id"

  // ------------------------------------- temperature mixture allocation

  /** Replay of `Sampling.temperatureAllocation` at alpha = 0.5 over
    * documents-by-source: isqrt weights via the same
    * floor(sqrt(double)) + two integer corrections, largest-remainder
    * seats in exact integer arithmetic, final cap at the group size.
    * Ends with CTE `talloc(source, n, w, alloc)`.
    */
  def temperatureAllocCtes(budget: Long): String =
    "WITH " + temperatureAllocCtesFrom(budget, "documents")

  /** The same chain without the WITH prefix, over any relation exposing
    * a `source` column — composable into larger CTE pipelines.
    */
  def temperatureAllocCtesFrom(budget: Long, rel: String): String =
    s"g AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM $rel GROUP BY source), " +
      "s0 AS (SELECT source, n, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS r FROM g), " +
      "wt AS (SELECT source, n, CASE WHEN (r+1)*(r+1) <= n THEN r+1 WHEN r*r > n THEN r-1 ELSE r END AS w FROM s0), " +
      "tt AS (SELECT source, n, w, CAST(sum(w) OVER () AS BIGINT) AS wtot FROM wt), " +
      s"tb AS (SELECT source, n, w, wtot, CAST((w*$budget) // wtot AS BIGINT) AS base, " +
      s"CAST(w*$budget - ((w*$budget) // wtot)*wtot AS BIGINT) AS rem FROM tt), " +
      s"tr AS (SELECT source, n, w, base, rem, CAST($budget - sum(base) OVER () AS BIGINT) AS seats, " +
      "row_number() OVER (ORDER BY rem DESC, source ASC) AS rrk FROM tb), " +
      "talloc AS (SELECT source, n, w, " +
      "least(base + CASE WHEN rrk <= seats THEN 1 ELSE 0 END, n) AS alloc FROM tr)"

  /** Replay of [[graft.operators.Sampling.epochAllocation]] over
    * documents-by-source with `weight = n_chars`: isqrt temperature
    * weights, `maxEpochs` repetition caps, exact water-filling with
    * HUGEINT cross-multiplied capped-prefix tests and
    * largest-remainder seats — the same total order (IEEE `cap/w`
    * double division, tie-broken by source) as the Spark side.
    */
  def epochAlloc(budget: Long, maxEpochs: Int): String =
    "WITH g AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS n_toks FROM documents GROUP BY source HAVING sum(n_chars) > 0), " +
      "s0 AS (SELECT source, n_toks, CAST(floor(sqrt(CAST(n_toks AS DOUBLE))) AS BIGINT) AS r FROM g), " +
      "wt AS (SELECT source, n_toks, CASE WHEN (r+1)*(r+1) <= n_toks THEN r+1 WHEN r*r > n_toks THEN r-1 ELSE r END AS w FROM s0), " +
      s"b AS (SELECT source, n_toks, w, CAST(n_toks * $maxEpochs AS BIGINT) AS cap FROM wt), " +
      "o AS (SELECT *, row_number() OVER (ORDER BY CAST(cap AS DOUBLE)/w, source) AS rnk, " +
      "CAST(sum(cap) OVER (ORDER BY CAST(cap AS DOUBLE)/w, source ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumcap, " +
      "CAST(sum(w) OVER (ORDER BY CAST(cap AS DOUBLE)/w, source ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw, " +
      "CAST(sum(w) OVER () AS BIGINT) AS wtot FROM b), " +
      s"p AS (SELECT *, CAST(cap AS HUGEINT)*(wtot-cumw) <= CAST($budget - cumcap AS HUGEINT)*w AS cp FROM o), " +
      "kk AS (SELECT coalesce(max(CASE WHEN cp THEN rnk END), 0) AS k FROM p), " +
      "m AS (SELECT p.*, p.rnk <= kk.k AS capped FROM p CROSS JOIN kk), " +
      s"rr AS (SELECT CAST($budget - coalesce(sum(CASE WHEN capped THEN cap END), 0) AS BIGINT) AS r2, " +
      "CAST(coalesce(sum(CASE WHEN NOT capped THEN w END), 0) AS BIGINT) AS wu FROM m), " +
      "bs AS (SELECT m.*, rr.r2, rr.wu, " +
      "CASE WHEN capped THEN cap ELSE CAST((CAST(r2 AS HUGEINT) * w) // wu AS BIGINT) END AS base, " +
      "CASE WHEN capped THEN CAST(0 AS HUGEINT) ELSE CAST(r2 AS HUGEINT)*w - ((CAST(r2 AS HUGEINT)*w) // wu)*wu END AS rem " +
      "FROM m CROSS JOIN rr), " +
      s"st AS (SELECT *, CAST($budget - sum(base) OVER () AS BIGINT) AS seats, " +
      "row_number() OVER (ORDER BY capped ASC, rem DESC, source ASC) AS srk FROM bs), " +
      "fin AS (SELECT source, n_toks, w, cap, " +
      "CASE WHEN capped THEN cap ELSE base + CASE WHEN srk <= seats THEN 1 ELSE 0 END END AS alloc FROM st) " +
      "SELECT source, n_toks, w, cap, alloc, " +
      "CAST((CAST(alloc AS HUGEINT) * 1000000) // n_toks AS BIGINT) AS epochs_ppm FROM fin"

  // ------------------------------------------------- DSIR importance

  /** CTE chain replaying
    * [[graft.operators.TextAnalysis.importanceScores]]: tokens hashed
    * into `buckets` via the rolling-hash → MixHash32 limb pipeline
    * (same decomposition as [[kmvDistinct]]), add-1-smoothed
    * target/raw bucket ratio in HUGEINT ppm, floor-divided per-doc
    * mean. Ends with CTE `dsc(doc_id, n_tokens, score_ppm)`.
    */
  def dsirCtes(targetWhere: String, buckets: Int, salt: String): String = {
    val cHi = 2654435769L // 0x9E3779B9
    val cLo = 2135587861L // 0x7F4A7C15
    val mix = s"(((a * $cLo + b * $cHi) * 4294967296 + b * $cLo)" +
      " % 18446744073709551616)"
    s"dtk AS (SELECT doc_id, CAST(($targetWhere) AS INT) AS is_t, " +
      "unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok FROM documents), " +
      "dtf AS (SELECT * FROM dtk WHERE tok <> ''), " +
      s"ddx AS (SELECT doc_id, is_t, hex(encode('$salt:' || tok)) AS hx FROM dtf), " +
      s"dfl AS (SELECT doc_id, is_t, ${rollFold("hx")} AS fold FROM ddx), " +
      "dlm AS (SELECT doc_id, is_t, fold // 4294967296 AS a, fold % 4294967296 AS b FROM dfl), " +
      s"dhh AS (SELECT doc_id, is_t, CAST($mix // 4294967296 AS BIGINT) % $buckets AS bucket FROM dlm), " +
      "dct AS (SELECT bucket, count(*) AS n_raw, sum(is_t) AS n_tgt FROM dhh GROUP BY bucket), " +
      "dtt AS (SELECT sum(n_raw) AS tot_raw, sum(n_tgt) AS tot_tgt FROM dct), " +
      s"dwt AS (SELECT bucket, ((n_tgt + 1)::HUGEINT * (tot_raw + $buckets) * 1000000) // " +
      s"((n_raw + 1)::HUGEINT * (tot_tgt + $buckets)) AS w_ppm FROM dct, dtt), " +
      "dsc AS (SELECT dhh.doc_id, count(*) AS n_tokens, " +
      "sum(dwt.w_ppm) // count(*) AS score_ppm FROM dhh JOIN dwt USING (bucket) GROUP BY dhh.doc_id)"
  }

  /** Oracle for `eval_ann_metrics`: recall@k / reciprocal-rank of the
    * LSH and IVF tiers against the exact brute top-k. The three tier
    * queries are the already-gated oracles composed as subqueries; the
    * metrics are integer counts and floor divisions on top.
    */
  def annEvalMetrics(k: Int, numPlanes: Int = 8, numCentroids: Int = 16,
      nProbe: Int = 4, dim: Int = 64, seed: Long = 42L): String = {
    val bruteSql = "SELECT query_id, neighbor_id, rnk FROM (SELECT a.vec_id AS query_id, " +
      "b.vec_id AS neighbor_id, CAST(row_number() OVER (PARTITION BY a.vec_id " +
      "ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS INT) AS rnk " +
      s"FROM embeddings a JOIN embeddings b ON b.vec_id >= 10 WHERE a.vec_id < 10) t WHERE rnk <= $k"
    def tierSel(tag: String, tbl: String): String =
      s"SELECT '$tag' AS tier, q.query_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits, " +
        s"CAST(coalesce(h.n_hits, 0) * 1000000 // $k AS BIGINT) AS recall_ppm, " +
        "CAST(coalesce(r.rr, 0) AS BIGINT) AS rr_ppm FROM qs q " +
        s"LEFT JOIN (SELECT t.query_id, count(*) AS n_hits FROM $tbl t " +
        "JOIN brute b ON b.query_id = t.query_id AND b.neighbor_id = t.neighbor_id " +
        "GROUP BY 1) h ON h.query_id = q.query_id " +
        s"LEFT JOIN (SELECT b.query_id, 1000000 // t.rnk AS rr FROM brute b " +
        s"JOIN $tbl t ON t.query_id = b.query_id AND t.neighbor_id = b.neighbor_id " +
        "WHERE b.rnk = 1) r ON r.query_id = q.query_id"
    s"WITH brute AS (SELECT * FROM ($bruteSql) tb), " +
      s"lsht AS (SELECT * FROM (${annLshTopK(k, numPlanes, dim, seed)}) tl), " +
      s"ivft AS (SELECT * FROM (${annIvfTopK(k, numCentroids, nProbe, dim, seed)}) ti), " +
      "qs AS (SELECT DISTINCT query_id FROM brute) " +
      tierSel("lsh", "lsht") + " UNION ALL " + tierSel("ivf", "ivft")
  }

  // ------------------------------------------------------- winnowing

  /** CTE chain replaying `graft.operators.Dedup.winnowFingerprints`
    * bit-for-bit, ending in `wfp(doc_id, pos, fp)`: per-gram rolling
    * hash → MixHash32 (the limb-decomposed 64-bit multiply from the
    * DSIR replay) → rightmost-min window selection, positions 0-based.
    */
  def winnowCtes(k: Int, w: Int): String = {
    val cHi = 2654435769L // 0x9E3779B9
    val cLo = 2135587861L // 0x7F4A7C15
    val mix = s"(((a * $cLo + b * $cHi) * 4294967296 + b * $cLo)" +
      " % 18446744073709551616)"
    // window slice of gs at 0-based offset j, width we (DuckDB 1-based
    // inclusive slicing) — inlined twice below, no let-bindings in
    // DuckDB list comprehensions
    def win = s"gs[j + 1 : j + we]"
    s"wtk AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
      "x -> x <> '') AS toks FROM documents), " +
      s"wgr AS (SELECT doc_id, i, hex(encode(array_to_string(toks[i : i + $k - 1], ' '))) AS hx " +
      s"FROM wtk, LATERAL unnest(generate_series(1, len(toks) - $k + 1)) AS t(i)), " +
      s"wfl AS (SELECT doc_id, i, ${rollFold("hx")} AS fold FROM wgr), " +
      "wlm AS (SELECT doc_id, i, fold // 4294967296 AS a, fold % 4294967296 AS b FROM wfl), " +
      s"wh3 AS (SELECT doc_id, i, CAST($mix // 4294967296 AS BIGINT) AS h32 FROM wlm), " +
      "wgs AS (SELECT doc_id, list(h32 ORDER BY i) AS gs, " +
      s"least($w, count(*)) AS we FROM wh3 GROUP BY doc_id), " +
      "wse AS (SELECT doc_id, unnest([struct_pack(" +
      s"pos := j + we - list_position(list_reverse($win), list_min($win)), " +
      s"fp := list_min($win)) " +
      "FOR j IN generate_series(0, len(gs) - we)]) AS s FROM wgs), " +
      // row-level DISTINCT stands in for Spark's array_distinct (DuckDB
      // cannot list_distinct struct elements)
      "wfp AS (SELECT DISTINCT doc_id, CAST(s.pos AS BIGINT) AS pos, CAST(s.fp AS BIGINT) AS fp FROM wse)"
  }

  /** Oracle for `text_winnow_fp`: the selected fingerprints themselves. */
  def textWinnowFp(k: Int, w: Int): String =
    s"WITH ${winnowCtes(k, w)} SELECT doc_id, pos, fp FROM wfp"

  /** Oracle for `dedup_winnow_pairs`: docs sharing ≥ `minShared`
    * distinct selected fingerprints.
    */
  def dedupWinnowPairs(k: Int, w: Int, minShared: Int): String =
    s"WITH ${winnowCtes(k, w)}, " +
      "wdd AS (SELECT DISTINCT doc_id, fp FROM wfp) " +
      "SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared " +
      "FROM wdd a JOIN wdd b ON a.fp = b.fp AND a.doc_id < b.doc_id " +
      s"GROUP BY a.doc_id, b.doc_id HAVING count(*) >= $minShared"

  // ------------------------------------------------- lexical retrieval

  /** INDEPENDENT phrase-search check (not an index replay): per doc,
    * anchors = 1-based token positions where the whole phrase lines up,
    * found by a direct list-comprehension scan of the token array.
    * `graft.operators.Search.phraseSearch` reaches the same rows
    * through a positional inverted index — the two computations share
    * nothing past tokenization.
    */
  def phraseSearch(phrase: Seq[String]): String = {
    val n = phrase.size
    val conds = phrase.zipWithIndex
      .map { case (w, i) => s"toks[p + $i] = '${w.toLowerCase}'" }
      .mkString(" AND ")
    "WITH pht AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
      "x -> x <> '') AS toks FROM documents), " +
      s"pha AS (SELECT doc_id, list_filter(range(1, len(toks) - ${n - 1}), p -> $conds) AS anchors FROM pht) " +
      "SELECT doc_id, CAST(len(anchors) AS BIGINT) AS n_occ, " +
      "CAST(anchors[1] - 1 AS BIGINT) AS first_pos FROM pha WHERE len(anchors) > 0"
  }

  /** CTE chain replaying `graft.operators.Search.bm25TopK` — identical
    * floor-divided rational arithmetic, HUGEINT standing in for Spark's
    * decimal(38,0) — ending in `brk(query_id, rk, doc_id, score_ppm)`.
    */
  def bm25Ctes(queries: Seq[(Int, Seq[String])], k: Int,
      docWhere: String = "TRUE"): String = {
    val qvals = queries
      .flatMap { case (qid, ts) => ts.map(_.toLowerCase).distinct.map(t => s"($qid, '$t')") }
      .mkString(", ")
    val qvocab = queries.flatMap(_._2.map(_.toLowerCase)).distinct
      .map(t => s"'$t'").mkString(", ")
    "btk AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
      s"x -> x <> '')) AS token FROM documents WHERE $docWhere), " +
      "bdl AS (SELECT doc_id, count(*) AS dl FROM btk GROUP BY doc_id), " +
      "bst AS (SELECT count(*) AS n_docs, sum(dl) AS t_tokens FROM bdl), " +
      s"bq(query_id, token) AS (VALUES $qvals), " +
      s"btf AS (SELECT token, doc_id, count(*) AS tf FROM btk WHERE token IN ($qvocab) GROUP BY token, doc_id), " +
      "bdf AS (SELECT token, count(*) AS df FROM btf GROUP BY token), " +
      "bsc AS (SELECT bq.query_id, btf.doc_id, CAST(sum(CAST(" +
      "(22::HUGEINT * tf * t_tokens * (2 * (n_docs - df) + 1) * 1000000) // " +
      "((10::HUGEINT * tf * t_tokens + 3 * t_tokens + 9 * dl * n_docs) * (2 * df + 1)) " +
      "AS BIGINT)) AS BIGINT) AS score_ppm " +
      "FROM btf JOIN bq USING (token) JOIN bdf USING (token) JOIN bdl USING (doc_id), bst " +
      "GROUP BY bq.query_id, btf.doc_id), " +
      "brk AS (SELECT query_id, rk, doc_id, score_ppm FROM (SELECT query_id, doc_id, score_ppm, " +
      "row_number() OVER (PARTITION BY query_id ORDER BY score_ppm DESC, doc_id) AS rk FROM bsc) r " +
      s"WHERE rk <= $k)"
  }

  /** Oracle for `search_bm25_topk` (and, with `docWhere`, for the
    * post-deletion serving path `search_bm25_deleted` — the oracle
    * simply never tokenizes the revoked docs, which is exactly what a
    * fresh index of the surviving corpus would see).
    */
  def bm25TopK(queries: Seq[(Int, Seq[String])], k: Int,
      docWhere: String = "TRUE"): String =
    s"WITH ${bm25Ctes(queries, k, docWhere)} SELECT query_id, rk, doc_id, score_ppm FROM brk"

  /** Oracle for `search_hybrid_rrf`: BM25 ranking fused with the
    * static length-prior ranking by reciprocal-rank fusion — identical
    * `10⁹ // (kRrf + rank)` integer arithmetic.
    */
  def searchHybridRrf(queries: Seq[(Int, Seq[String])], kIn: Int,
      k: Int, kRrf: Int): String =
    s"WITH ${bm25Ctes(queries, kIn)}, " +
      "hpr AS (SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rk " +
      s"FROM documents QUALIFY rk <= $kIn), " +
      "hqi AS (SELECT DISTINCT query_id FROM bq), " +
      s"hfa AS (SELECT query_id, doc_id, 1000000000 // ($kRrf + rk) AS ra FROM brk), " +
      s"hfb AS (SELECT query_id, doc_id, 1000000000 // ($kRrf + rk) AS rb FROM hqi, hpr), " +
      "hfu AS (SELECT query_id, doc_id, coalesce(ra, 0) + coalesce(rb, 0) AS rrf_score " +
      "FROM hfa FULL OUTER JOIN hfb USING (query_id, doc_id)) " +
      "SELECT query_id, rk, doc_id, rrf_score FROM (SELECT query_id, doc_id, rrf_score, " +
      "row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rk FROM hfu) r " +
      s"WHERE rk <= $k"

  // ------------------------------------------------- k-center coreset

  /** Oracle for `sample_kcenter`: full replay of
    * `Sampling.kCenterSelect` — seed at the smallest id, then k−1
    * greedy rounds each folding the newest center into the per-row
    * best-similarity column (same left-associated double dot products
    * as the ANN oracles) and taking the `(best ASC, vec_id ASC)`
    * argmin.
    */
  def sampleKCenter(k: Int, dim: Int = 64): String = {
    val sb = new StringBuilder
    sb ++= s"WITH base AS (SELECT vec_id, embedding, sqrt(${selfDot("embedding", dim)}) AS nrm FROM embeddings), "
    sb ++= "c0 AS (SELECT vec_id, embedding, nrm FROM base ORDER BY vec_id LIMIT 1), "
    sb ++= s"b0 AS (SELECT e.vec_id, e.embedding, e.nrm, ${pairDot("e.embedding", "c.embedding", dim)} / (e.nrm * c.nrm) AS best " +
      "FROM base e CROSS JOIN c0 c)"
    for (i <- 1 until k) {
      val selUnion = ("SELECT vec_id FROM c0" +:
        (1 until i).map(j => s"SELECT vec_id FROM p$j")).mkString(" UNION ALL ")
      sb ++= s", p$i AS (SELECT vec_id, embedding, nrm, best FROM b${i - 1} " +
        s"WHERE vec_id NOT IN ($selUnion) ORDER BY best ASC, vec_id ASC LIMIT 1)"
      if (i < k - 1)
        sb ++= s", b$i AS (SELECT b.vec_id, b.embedding, b.nrm, " +
          s"greatest(b.best, ${pairDot("b.embedding", "p.embedding", dim)} / (b.nrm * p.nrm)) AS best " +
          s"FROM b${i - 1} b CROSS JOIN p$i p)"
    }
    val rounds = "SELECT CAST(0 AS INT) AS sel_round, vec_id FROM c0" +:
      (1 until k).map(i => s"SELECT CAST($i AS INT), vec_id FROM p$i")
    sb ++= " " + rounds.mkString(" UNION ALL ")
    sb.toString
  }

  // ------------------------------------------------- silence segmentation

  /** Oracle for `media_silence_segments`: full replay of
    * `Multimodal.silenceSegments` — block energies as exact integer
    * `Σ (byte − center)²` over `ord` values, voiced filter, the
    * `block_idx − row_number()` island id, and per-island aggregation.
    */
  def mediaSilenceSegments(blockSize: Int, center: Int, minEnergy: Long): String = {
    val dev = s"(ord(substr(text, CAST(i AS INT), 1)) - $center)"
    s"WITH m AS (SELECT doc_id AS media_id, text, length(text) AS n FROM documents), " +
      s"bl AS (SELECT media_id, text, n, CAST(unnest(generate_series(0, " +
      s"CAST((n + ${blockSize - 1}) // $blockSize AS INT) - 1)) AS INT) AS block_idx FROM m), " +
      s"e AS (SELECT media_id, block_idx, CAST(list_sum(list_transform(" +
      s"range(block_idx * $blockSize + 1, least((block_idx + 1) * $blockSize, n) + 1), " +
      s"i -> $dev * $dev)) AS BIGINT) AS energy FROM bl), " +
      s"v AS (SELECT media_id, block_idx, energy, block_idx - row_number() OVER " +
      s"(PARTITION BY media_id ORDER BY block_idx) AS island FROM e WHERE energy > $minEnergy), " +
      "g AS (SELECT media_id, island, min(block_idx) AS start_block, max(block_idx) AS end_block, " +
      "CAST(count(*) AS BIGINT) AS n_blocks, CAST(sum(energy) AS BIGINT) AS sum_energy " +
      "FROM v GROUP BY 1, 2) " +
      "SELECT media_id, CAST(row_number() OVER (PARTITION BY media_id ORDER BY start_block) AS INT) AS seg_idx, " +
      "start_block, end_block, n_blocks, sum_energy FROM g"
  }

  // ------------------------------------------------- novelty curve

  /** Oracle for `text_novelty_curve`: global first-occurrence trigram
    * attribution (the dedup family's keep-first rule), per-source
    * crawl-order rank, decile by exact integer division.
    */
  def textNoveltyCurve: String =
    s"WITH $wordTriCtes, " +
      "fo AS (SELECT g, min(doc_id) AS doc_id FROM tri GROUP BY g), " +
      "nv AS (SELECT doc_id, count(*) AS n_novel FROM fo GROUP BY doc_id), " +
      "rk AS (SELECT d.doc_id, d.source, coalesce(nv.n_novel, 0) AS n_novel, " +
      "row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id) AS rk " +
      "FROM documents d LEFT JOIN nv USING (doc_id)), " +
      "sc AS (SELECT source, count(*) AS nsrc FROM documents GROUP BY source) " +
      "SELECT r.source, CAST((r.rk - 1) * 10 // s.nsrc AS INT) AS decile, " +
      "count(*) AS n_docs, CAST(sum(r.n_novel) AS BIGINT) AS sum_novel " +
      "FROM rk r JOIN sc s USING (source) GROUP BY 1, 2"

  // ------------------------------------------------- frame-level aHash

  /** Oracle for `media_frame_pairs`: the frame slicing of
    * `Multimodal.sampleFrames` (stub 16-frame container, ragged last
    * frame, every `everyN`-th kept) replayed per doc AND per
    * brightness variant, frames hashed with the shared
    * [[ahashOfVals]] arithmetic, then the exact Hamming ball.
    */
  def mediaFramePairs(nFrames: Int, everyN: Int, maxHamming: Int,
      delta: Int, idOffset: Long): String =
    s"WITH m AS (SELECT doc_id, text, length(text) AS tn, " +
      s"greatest(length(text) // $nFrames, 1) AS fs FROM documents), " +
      "fr AS (SELECT doc_id, fs, tn, text, CAST(unnest(generate_series(0, " +
      "CAST((tn + fs - 1) // fs AS INT) - 1)) AS INT) AS f FROM m), " +
      "fe AS (SELECT doc_id, f, list_transform(range(CAST(f * fs + 1 AS INT), " +
      "CAST(least((f + 1) * fs, tn) AS INT) + 1), " +
      s"i -> ord(substr(text, CAST(i AS INT), 1))) AS vals FROM fr WHERE f % $everyN = 0), " +
      s"vv AS (SELECT doc_id * 32 + f AS media_id, vals FROM fe " +
      s"UNION ALL SELECT (doc_id + $idOffset) * 32 + f, " +
      s"list_transform(vals, x -> least(255, x + $delta)) FROM fe), " +
      "tl AS (SELECT media_id, vals, len(vals) AS n, list_sum(vals) AS total FROM vv), " +
      s"h AS (SELECT media_id, $ahashOfVals AS ahash FROM tl) " +
      "SELECT a.media_id AS id_a, b.media_id AS id_b, " +
      "CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming " +
      "FROM h a JOIN h b ON a.media_id < b.media_id " +
      s"WHERE bit_count(xor(a.ahash, b.ahash)) <= $maxHamming"

  // ------------------------------------------------- blocklist scan

  /** Oracle for `text_blocklist`: per-pattern ALL-occurrence counts by
    * explicit position scan — every i with text[i, i+|p|) = p counts,
    * so overlapping and nested matches agree with the Aho–Corasick
    * semantics (`graft.plans.MultiPatternCount`). ASCII corpus ⇒ char
    * positions and byte positions coincide.
    */
  def textBlocklist(patterns: Seq[String]): String = {
    val vals = patterns.map(p => s"('$p')").mkString(", ")
    "SELECT doc_id, pattern, n_hits FROM (" +
      "SELECT doc_id, p.pattern, CAST(len(list_filter(" +
      "range(1, length(text) - length(p.pattern) + 2), " +
      "i -> substr(text, CAST(i AS INT), length(p.pattern)) = p.pattern)) AS BIGINT) AS n_hits " +
      s"FROM documents, (VALUES $vals) p(pattern)) t WHERE n_hits > 0"
  }

  // ------------------------------------------------- perceptual aHash

  /** The 64-bit average-hash replayed in exact integer SQL over a byte
    * VALUE LIST column `vals` — span-mean-vs-global-mean by
    * cross-multiplication, bit 63 as the two's-complement constant
    * (DuckDB refuses `1 << 63`; a sum of disjoint bit values in BIGINT
    * is the bitwise OR).
    */
  private def ahashOfVals: String = {
    val bitVal = "CASE WHEN b = 63 THEN -9223372036854775808 ELSE (1::BIGINT << CAST(b AS INT)) END"
    val lo = "(b * n) // 64"
    val hi = "((b + 1) * n) // 64"
    val spanSum = s"list_sum(list_slice(vals, CAST($lo AS INT) + 1, CAST($hi AS INT)))"
    s"CAST(list_sum(list_transform(range(0, 64), b -> " +
      s"CASE WHEN $hi > $lo AND $spanSum * n >= total * ($hi - $lo) THEN $bitVal ELSE 0 END)) AS BIGINT)"
  }

  /** Oracle for `media_ahash_pairs`: full replay — byte values via
    * `ord` (the corpus is ASCII at every SF; `graft.plans.AHash64`
    * folds UTF-8 bytes, identical here), the brightness variants as
    * `+delta` on the value lists, hashes from the shared
    * [[ahashOfVals]] arithmetic, then the exact Hamming ball over all
    * pairs — the banded candidate join on the Spark side is
    * recall-lossless (pigeonhole), so the outputs coincide.
    */
  private def ahashCtes(delta: Int, idOffset: Long): String =
    "v0 AS (SELECT doc_id AS media_id, " +
      "list_transform(range(1, length(text) + 1), i -> ord(substr(text, CAST(i AS INT), 1))) AS vals " +
      "FROM documents), " +
      s"vv AS (SELECT media_id, vals FROM v0 UNION ALL " +
      s"SELECT media_id + $idOffset, list_transform(vals, x -> least(255, x + $delta)) FROM v0), " +
      "tl AS (SELECT media_id, vals, len(vals) AS n, list_sum(vals) AS total FROM vv), " +
      s"h AS (SELECT media_id, $ahashOfVals AS ahash FROM tl)"

  def mediaAhashPairs(maxHamming: Int, delta: Int, idOffset: Long): String =
    s"WITH ${ahashCtes(delta, idOffset)} " +
      "SELECT a.media_id AS id_a, b.media_id AS id_b, " +
      "CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming " +
      "FROM h a JOIN h b ON a.media_id < b.media_id " +
      s"WHERE bit_count(xor(a.ahash, b.ahash)) <= $maxHamming"

  /** Oracle for `media_dup_clusters`: the [[mediaAhashPairs]] hash
    * chain feeding a recursive min-label walk — components from first
    * principles, not a replay of the star contraction.
    */
  def mediaDupClusters(maxHamming: Int, delta: Int, idOffset: Long): String =
    s"WITH RECURSIVE ${ahashCtes(delta, idOffset)}, " +
      "pr AS (SELECT a.media_id AS id_a, b.media_id AS id_b " +
      "FROM h a JOIN h b ON a.media_id < b.media_id " +
      s"WHERE bit_count(xor(a.ahash, b.ahash)) <= $maxHamming), " +
      "edges AS (SELECT id_a AS src, id_b AS dst FROM pr UNION SELECT id_b, id_a FROM pr), " +
      "wlk(node, root) AS (SELECT DISTINCT src, src FROM edges " +
      "UNION SELECT e.dst, k.root FROM wlk k JOIN edges e ON e.src = k.node) " +
      "SELECT node AS media_id, min(root) AS cluster_id FROM wlk GROUP BY node"

  // ------------------------------------- nearest-class-centroid

  /** Shared CTE chain replaying
    * `graft.operators.Similarity.classifyByCentroid` bit-for-bit:
    * exact-integer class prototypes from the seed slice, exact-integer
    * dot/norm per (vector, class), one double conversion at the end,
    * argmax with smaller-label tie-break. Ends in
    * `pred(vec_id, label, pred_label)`.
    */
  def classifyCentroidCtes(seedWhere: String, scaleBits: Int = 20,
      dim: Int = 64): String = {
    val q = math.pow(2, scaleBits)
    s"sd AS (SELECT label, j, CAST(round(CAST(embedding[j] AS DOUBLE) * $q) AS BIGINT) AS qv " +
      s"FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, $dim)) AS j) dims WHERE $seedWhere), " +
      "cent AS (SELECT label AS cl, j, sum(qv) AS s FROM sd GROUP BY 1, 2), " +
      "nrm AS (SELECT cl, sum(s * s) AS n2 FROM cent GROUP BY 1), " +
      s"cd AS (SELECT vec_id, label, j, CAST(round(CAST(embedding[j] AS DOUBLE) * $q) AS BIGINT) AS qv " +
      s"FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, $dim)) AS j) dims WHERE NOT ($seedWhere)), " +
      "dts AS (SELECT c.vec_id, c.label, ct.cl, sum(c.qv * ct.s) AS d FROM cd c JOIN cent ct USING (j) GROUP BY 1, 2, 3), " +
      "scr AS (SELECT t.vec_id, t.label, t.cl, CAST(t.d AS DOUBLE) / sqrt(CAST(n.n2 AS DOUBLE)) AS score " +
      "FROM dts t JOIN nrm n USING (cl)), " +
      "pred AS (SELECT vec_id, label, CAST(cl AS INT) AS pred_label FROM " +
      "(SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cl) AS rn FROM scr) r WHERE rn = 1)"
  }

  // ----------------------------------------- linear probe (GD)

  /** CTE chain replaying the linear-probe trainer
    * (`graft.operators.TextAnalysis.fitProbe`) bit-for-bit: hashed
    * bag-of-words features via the shared DSIR bucket pipeline, then
    * `iters` unrolled batch-GD rounds where each doc's gradient
    * contribution is rounded to BIGINT before the (order-independent)
    * sum and the weight update is the identical fixed-order IEEE double
    * expression. Ends in `w$iters(w0..w$buckets)` (one row; last column
    * is the bias) and `feat(doc_id, y, c0..c{buckets-1})`.
    */
  def probeCtes(targetWhere: String, buckets: Int, iters: Int,
      lr: Double, scaleBits: Int, salt: String): String = {
    val qs = math.pow(2, scaleBits)
    val cHi = 2654435769L
    val cLo = 2135587861L
    val mix = s"(((a * $cLo + b * $cHi) * 4294967296 + b * $cLo)" +
      " % 18446744073709551616)"
    val featCols = (0 until buckets)
      .map(b => s"coalesce(sum(CASE WHEN bucket = $b THEN 1 END), 0) AS c$b")
      .mkString(", ")
    def marginOver(wCte: String): String =
      (0 until buckets).map(b => s"c$b * $wCte.w$b").mkString(" + ") +
        s" + $wCte.w$buckets"
    val w0 = (0 to buckets).map(b => s"CAST(0 AS DOUBLE) AS w$b").mkString(", ")
    val rounds = (1 to iters).map { t =>
      val m = marginOver(s"w${t - 1}")
      val gcols = (0 until buckets)
        .map(b => s"sum(CAST(round(((($m) - y) * c$b) * $qs) AS BIGINT)) AS g$b")
        .mkString(", ")
      val upd = (0 to buckets)
        .map(b => s"w${t - 1}.w$b - ((CAST(g$b AS DOUBLE) / n) / $qs) * $lr AS w$b")
        .mkString(", ")
      s"g$t AS (SELECT count(*) AS n, $gcols, " +
        s"sum(CAST(round((($m) - y) * $qs) AS BIGINT)) AS g$buckets " +
        s"FROM feat CROSS JOIN w${t - 1}), " +
        s"w$t AS (SELECT $upd FROM g$t CROSS JOIN w${t - 1})"
    }.mkString(", ")
    s"ptk AS (SELECT doc_id, CAST(($targetWhere) AS INT) AS y, " +
      "unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok FROM documents), " +
      "ptf AS (SELECT * FROM ptk WHERE tok <> ''), " +
      s"pdx AS (SELECT doc_id, y, hex(encode('$salt:' || tok)) AS hx FROM ptf), " +
      s"pfl AS (SELECT doc_id, y, ${rollFold("hx")} AS fold FROM pdx), " +
      "plm AS (SELECT doc_id, y, fold // 4294967296 AS a, fold % 4294967296 AS b FROM pfl), " +
      s"phh AS (SELECT doc_id, y, CAST($mix // 4294967296 AS BIGINT) % $buckets AS bucket FROM plm), " +
      s"feat AS (SELECT doc_id, y, $featCols FROM phh GROUP BY doc_id, y), " +
      s"w0 AS (SELECT $w0), " + rounds
  }

  /** Oracle for `text_probe_weights`: the final `(bucket, weight)`
    * table, bias in the last row.
    */
  def probeWeights(targetWhere: String, buckets: Int, iters: Int,
      lr: Double, scaleBits: Int, salt: String): String = {
    val unpivot = (0 to buckets)
      .map(b => s"SELECT $b AS bucket, w$b AS weight FROM w$iters")
      .mkString(" UNION ALL ")
    s"WITH ${probeCtes(targetWhere, buckets, iters, lr, scaleBits, salt)} $unpivot"
  }

  /** Oracle for `text_probe_scores`: per-doc floor-ppm margin under the
    * final weights.
    */
  def probeScores(targetWhere: String, buckets: Int, iters: Int,
      lr: Double, scaleBits: Int, salt: String): String = {
    val m = (0 until buckets).map(b => s"c$b * w$iters.w$b").mkString(" + ") +
      s" + w$iters.w$buckets"
    s"WITH ${probeCtes(targetWhere, buckets, iters, lr, scaleBits, salt)} " +
      s"SELECT doc_id, y, CAST(floor(($m) * 1000000.0) AS BIGINT) AS score_ppm " +
      s"FROM feat CROSS JOIN w$iters"
  }

  /** Probe chain extended through binning: ends in `cal(bin, n_docs,
    * n_pos)` — the shared base of the calibration, PR-curve, and
    * threshold oracles.
    */
  def probeBinCtes(targetWhere: String, bins: Int, buckets: Int,
      iters: Int, lr: Double, scaleBits: Int, salt: String): String = {
    val m = (0 until buckets).map(b => s"c$b * w$iters.w$b").mkString(" + ") +
      s" + w$iters.w$buckets"
    s"${probeCtes(targetWhere, buckets, iters, lr, scaleBits, salt)}, " +
      s"sc AS (SELECT doc_id, y, CAST(floor(($m) * 1000000.0) AS BIGINT) AS score_ppm " +
      s"FROM feat CROSS JOIN w$iters), " +
      "bd AS (SELECT min(score_ppm) AS mn, max(score_ppm) AS mx FROM sc), " +
      s"bn AS (SELECT y, CAST((score_ppm - mn) * $bins // (mx - mn + 1) AS INT) AS bin FROM sc, bd), " +
      "cal AS (SELECT bin, count(*) AS n_docs, sum(y) AS n_pos FROM bn GROUP BY bin)"
  }

  /** Oracle for `text_probe_calibration`: fixed-width score bins
    * between the observed min/max, per-bin positive rate in ppm.
    */
  def probeCalibration(targetWhere: String, bins: Int, buckets: Int,
      iters: Int, lr: Double, scaleBits: Int, salt: String): String =
    s"WITH ${probeBinCtes(targetWhere, bins, buckets, iters, lr, scaleBits, salt)} " +
      "SELECT bin, CAST(n_docs AS BIGINT) AS n_docs, CAST(n_pos AS BIGINT) AS n_pos, " +
      "CAST(n_pos * 1000000 // n_docs AS BIGINT) AS pos_ppm FROM cal"

  /** Probe chain through the PR curve: ends in `pr(bin, n_kept,
    * n_pos_kept, precision_ppm, recall_ppm)`.
    */
  def probePrCtes(targetWhere: String, bins: Int, buckets: Int,
      iters: Int, lr: Double, scaleBits: Int, salt: String): String =
    s"${probeBinCtes(targetWhere, bins, buckets, iters, lr, scaleBits, salt)}, " +
      "cum AS (SELECT c.bin, sum(h.n_docs) AS n_kept, sum(h.n_pos) AS n_pos_kept " +
      "FROM cal c JOIN cal h ON h.bin >= c.bin GROUP BY c.bin), " +
      "tot AS (SELECT sum(n_pos) AS tot_pos FROM cal), " +
      "pr AS (SELECT bin, CAST(n_kept AS BIGINT) AS n_kept, " +
      "CAST(n_pos_kept AS BIGINT) AS n_pos_kept, " +
      "CAST(n_pos_kept * 1000000 // n_kept AS BIGINT) AS precision_ppm, " +
      "CAST(n_pos_kept * 1000000 // tot_pos AS BIGINT) AS recall_ppm FROM cum, tot)"

  /** Oracle for `text_probe_pr_curve`. */
  def probePrCurve(targetWhere: String, bins: Int, buckets: Int,
      iters: Int, lr: Double, scaleBits: Int, salt: String): String =
    s"WITH ${probePrCtes(targetWhere, bins, buckets, iters, lr, scaleBits, salt)} " +
      "SELECT bin, n_kept, n_pos_kept, precision_ppm, recall_ppm FROM pr"

  /** Oracle for `text_probe_threshold`: the loosest bin meeting the
    * target precision.
    */
  def probeThreshold(targetWhere: String, targetPrecisionPpm: Long,
      bins: Int, buckets: Int, iters: Int, lr: Double, scaleBits: Int,
      salt: String): String =
    s"WITH ${probePrCtes(targetWhere, bins, buckets, iters, lr, scaleBits, salt)}, " +
      s"sel AS (SELECT min(bin) AS bin FROM pr WHERE precision_ppm >= $targetPrecisionPpm) " +
      "SELECT pr.bin, n_kept, n_pos_kept, precision_ppm, recall_ppm " +
      "FROM pr JOIN sel ON pr.bin = sel.bin"

  /** Oracle for `stage_probekeep_build`: the trained probe's keep SET
    * at the target operating point — the doc ids in score bins at or
    * above the loosest bin meeting the target precision (the `pk` CTE
    * of the `pipeline_curation_v6` replay, stand-alone).
    */
  def probeKeepSet(targetWhere: String, targetPrecisionPpm: Long,
      bins: Int, buckets: Int, iters: Int, lr: Double, scaleBits: Int,
      salt: String): String =
    s"WITH ${probePrCtes(targetWhere, bins, buckets, iters, lr, scaleBits, salt)}, " +
      s"psel AS (SELECT min(bin) AS bin FROM pr WHERE precision_ppm >= $targetPrecisionPpm), " +
      s"pbn AS (SELECT doc_id, CAST((score_ppm - mn) * $bins // (mx - mn + 1) AS INT) AS bin FROM sc, bd) " +
      "SELECT doc_id FROM pbn, psel WHERE pbn.bin >= psel.bin"

  /** Oracle for `search_mmr_rerank`: full replay of
    * `graft.operators.Similarity.mmrRerank` — pool by exact cosine
    * top-poolK, pairwise pool sims, then the k greedy rounds unrolled
    * as CTEs with λ / 1−λ embedded as the identical doubles and every
    * argmax tie-broken on the smaller candidate id.
    */
  def mmrRerank(k: Int, poolK: Int, lambda: Double, dim: Int = 64): String =
    s"WITH nb AS (SELECT vec_id, embedding, sqrt(${selfDot("embedding", dim)}) AS nrm FROM embeddings), " +
      s"scored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id, " +
      s"${pairDot("q.embedding", "c.embedding", dim)} / (q.nrm * c.nrm) AS rel " +
      "FROM nb q CROSS JOIN nb c WHERE q.vec_id < 10 AND c.vec_id >= 10), " +
      "pool AS (SELECT query_id, cand_id, rel, rnk FROM (SELECT *, " +
      "row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, cand_id) AS rnk FROM scored) t " +
      s"WHERE rnk <= $poolK), " +
      mmrGreedyTail(k, lambda, dim)

  /** The shared greedy tail: expects CTEs `nb(vec_id, embedding, nrm)`
    * and `pool(query_id, cand_id, rel, rnk)` (rnk ordered rel DESC,
    * cand_id — pick 1 is its head), and unrolls the `k` MMR rounds
    * with λ / 1−λ embedded as the identical doubles and every argmax
    * tie-broken on the smaller candidate id.
    */
  private def mmrGreedyTail(k: Int, lambda: Double, dim: Int): String = {
    val oneMinus = (1 - lambda).toString // exact Scala double, round-trips
    val lam = lambda.toString
    val rounds = (2 to k).map { r =>
      s"msr$r AS (SELECT s.query_id, s.id_a AS cand_id, max(s.sim) AS maxsim " +
        s"FROM sims s JOIN selu${r - 1} u ON u.query_id = s.query_id AND u.sel_id = s.id_b GROUP BY 1, 2), " +
        s"cnd$r AS (SELECT p.query_id, p.cand_id, $lam * p.rel - $oneMinus * m.maxsim AS mmr " +
        s"FROM pool p JOIN msr$r m ON m.query_id = p.query_id AND m.cand_id = p.cand_id " +
        s"WHERE NOT EXISTS (SELECT 1 FROM selu${r - 1} u WHERE u.query_id = p.query_id AND u.sel_id = p.cand_id)), " +
        s"sel$r AS (SELECT query_id, $r AS pick, cand_id AS sel_id, mmr FROM " +
        s"(SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY mmr DESC, cand_id) AS rn FROM cnd$r) t WHERE rn = 1), " +
        s"selu$r AS (SELECT * FROM selu${r - 1} UNION ALL SELECT * FROM sel$r)"
    }.mkString(", ")
    "sims AS (SELECT p1.query_id, p1.cand_id AS id_a, p2.cand_id AS id_b, " +
      s"${pairDot("a.embedding", "b.embedding", dim)} / (a.nrm * b.nrm) AS sim " +
      "FROM pool p1 JOIN pool p2 ON p1.query_id = p2.query_id AND p1.cand_id <> p2.cand_id " +
      "JOIN nb a ON a.vec_id = p1.cand_id JOIN nb b ON b.vec_id = p2.cand_id), " +
      s"sel1 AS (SELECT query_id, 1 AS pick, cand_id AS sel_id, $lam * rel AS mmr FROM pool WHERE rnk = 1), " +
      "selu1 AS (SELECT * FROM sel1), " + rounds +
      s" SELECT query_id, pick, sel_id, mmr FROM selu$k"
  }

  /** Oracle for `search_mmr_rerank` (the PRODUCTION composition):
    * replay of `Similarity.mmrRerankFromPool` over `Similarity.ivfTopK`
    * candidates — the IVF tier's full deterministic replay
    * ([[annIvfTopK]]) produces the (query_id, cand_id) pool, relevance
    * is recomputed from the id pairs with the same fixed-order cosine,
    * and the greedy rounds are the shared tail.
    */
  def mmrRerankIvf(k: Int, poolK: Int, lambda: Double, numCentroids: Int,
      nProbe: Int, dim: Int = 64, seed: Long = 42L): String =
    s"WITH nb AS (SELECT vec_id, embedding, sqrt(${selfDot("embedding", dim)}) AS nrm FROM embeddings), " +
      s"ivft AS (SELECT * FROM (${annIvfTopK(poolK, numCentroids, nProbe, dim, seed)}) ti), " +
      "pool AS (SELECT i.query_id, i.neighbor_id AS cand_id, " +
      s"${pairDot("q.embedding", "c.embedding", dim)} / (q.nrm * c.nrm) AS rel, " +
      "CAST(i.rnk AS BIGINT) AS rnk FROM ivft i " +
      "JOIN nb q ON q.vec_id = i.query_id JOIN nb c ON c.vec_id = i.neighbor_id), " +
      mmrGreedyTail(k, lambda, dim)

  /** Oracle for `class_centroid_assign`. */
  def classifyByCentroid(seedWhere: String, scaleBits: Int = 20,
      dim: Int = 64): String =
    s"WITH ${classifyCentroidCtes(seedWhere, scaleBits, dim)} " +
      "SELECT vec_id, label, pred_label FROM pred"

  /** Oracle for `class_centroid_confusion`. */
  def centroidConfusion(seedWhere: String, scaleBits: Int = 20,
      dim: Int = 64): String =
    s"WITH ${classifyCentroidCtes(seedWhere, scaleBits, dim)} " +
      "SELECT label, pred_label, count(*) AS n FROM pred GROUP BY 1, 2"

  /** Oracle for `search_ndcg`: term-overlap relevance grades over the
    * bm25 CTE chain, per-term ppm-scaled integer DCG contributions
    * (same round-then-sum-longs discipline as the Spark side, so sum
    * order can never wiggle the result), ideal ranking by
    * (rel desc, doc_id).
    */
  def ndcgAtK(queries: Seq[(Int, Seq[String])], k: Int): String =
    s"WITH ${bm25Ctes(queries, k)}, " +
      "nrel AS (SELECT bq.query_id, btf.doc_id, count(*) AS rel " +
      "FROM btf JOIN bq USING (token) GROUP BY 1, 2), " +
      "ndc AS (SELECT b.query_id, CAST(sum(CAST(round(" +
      "CAST(r.rel AS DOUBLE) * 1000000.0 / log2(b.rk + 1)) AS BIGINT)) AS BIGINT) AS dcg_ppm " +
      "FROM brk b JOIN nrel r ON r.query_id = b.query_id AND r.doc_id = b.doc_id GROUP BY 1), " +
      "nid AS (SELECT query_id, CAST(sum(CAST(round(" +
      "CAST(rel AS DOUBLE) * 1000000.0 / log2(irk + 1)) AS BIGINT)) AS BIGINT) AS idcg_ppm " +
      "FROM (SELECT query_id, rel, doc_id, " +
      "row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id) AS irk FROM nrel) t " +
      s"WHERE irk <= $k GROUP BY 1) " +
      "SELECT d.query_id, d.dcg_ppm, i.idcg_ppm, " +
      "CAST(d.dcg_ppm AS DOUBLE) / CAST(i.idcg_ppm AS DOUBLE) AS ndcg " +
      "FROM ndc d JOIN nid i USING (query_id)"

  /** Oracle for `media_scene_cuts`: every frame of the stub container
    * (the `mediaFrameStats` slicing with everyN = 1), hashed with the
    * shared [[ahashOfVals]] arithmetic, consecutive frames joined on
    * `f + 1` and kept where the Hamming distance jumps.
    */
  def mediaSceneCuts(nFrames: Int, minHamming: Int): String =
    s"WITH m AS (SELECT doc_id, text, length(text) AS tn, " +
      s"greatest(length(text) // $nFrames, 1) AS fs FROM documents), " +
      "fr AS (SELECT doc_id, fs, tn, text, CAST(unnest(generate_series(0, " +
      "CAST((tn + fs - 1) // fs AS INT) - 1)) AS INT) AS f FROM m), " +
      "fe AS (SELECT doc_id, f, list_transform(range(CAST(f * fs + 1 AS INT), " +
      "CAST(least((f + 1) * fs, tn) AS INT) + 1), " +
      "i -> ord(substr(text, CAST(i AS INT), 1))) AS vals FROM fr), " +
      "tl AS (SELECT doc_id, f, vals, len(vals) AS n, list_sum(vals) AS total FROM fe), " +
      s"h AS (SELECT doc_id, f, $ahashOfVals AS ahash FROM tl) " +
      "SELECT a.doc_id AS media_id, b.f AS frame_idx, " +
      "CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming " +
      "FROM h a JOIN h b ON a.doc_id = b.doc_id AND b.f = a.f + 1 " +
      s"WHERE bit_count(xor(a.ahash, b.ahash)) >= $minHamming"

  /** Oracle for `text_readability`: exact long counts per source
    * (words / sentence-break runs floored at 1 / vowel-group syllable
    * proxy), Flesch formula once per source row as the identical
    * double expression tree.
    */
  def readabilityBySource: String =
    "SELECT source, count(*) AS n_docs, " +
      "CAST(sum(w) AS BIGINT) AS sum_words, " +
      "CAST(sum(s) AS BIGINT) AS sum_sentences, " +
      "CAST(sum(sy) AS BIGINT) AS sum_syllables, " +
      "CAST(206.835 AS DOUBLE) - CAST(1.015 AS DOUBLE) * " +
      "(CAST(sum(w) AS DOUBLE) / CAST(sum(s) AS DOUBLE)) - CAST(84.6 AS DOUBLE) * " +
      "(CAST(sum(sy) AS DOUBLE) / CAST(sum(w) AS DOUBLE)) AS flesch " +
      "FROM (SELECT source, " +
      "len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '')) AS w, " +
      "greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s, " +
      "len(regexp_extract_all(lower(text), '[aeiou]+')) AS sy FROM documents) t " +
      "GROUP BY source"

  /** Oracle for `seq_ewma`: the identical W-lag dyadic chain over the
    * same (user, ts, event_id) window — exact long numerator and
    * present-weight denominator, one double division.
    */
  def ewmaTrailing(window: Int): String = {
    val terms = (0 until window)
      .map(d => s"coalesce(lag(u, $d) OVER w, 0) * ${1L << (window - 1 - d)}")
      .mkString(" + ")
    val dterms = (0 until window)
      .map(d => s"CASE WHEN lag(u, $d) OVER w IS NOT NULL THEN ${1L << (window - 1 - d)} ELSE 0 END")
      .mkString(" + ")
    "WITH e AS (SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS u FROM events), " +
      s"s AS (SELECT user_id, ts, event_id, ($terms) AS num, ($dterms) AS den " +
      "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) " +
      "SELECT user_id, ts, event_id, CAST(num AS BIGINT) AS ewma_num, " +
      "CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS ewma FROM s"
  }

  // ------------------------------------------------------------- z-order

  /** DuckDB replay of `Layout.zValue`: the same 16-bit linear
    * quantization (identical IEEE expression: `(c − lo) / span ·
    * 65535.0`, floored, clamped) and the same bit interleave, term by
    * term. Bounds arrive as exact decimal literals shared with the
    * Spark side, so quantization cells agree bit-for-bit.
    */
  def zValueSql(
      aExpr: String, aLo: Double, aHi: Double,
      bExpr: String, bLo: Double, bHi: Double): String = {
    def bucket(e: String, lo: Double, hi: Double): String = {
      val span = if (hi > lo) hi - lo else 1.0
      s"CAST(LEAST(GREATEST(floor(($e - $lo) / $span * 65535.0), 0.0), 65535.0) AS BIGINT)"
    }
    val qa = bucket(aExpr, aLo, aHi)
    val qb = bucket(bExpr, bLo, bHi)
    (0 until 16).map { i =>
      s"((($qa >> $i) & 1) * ${1L << (2 * i)} + (($qb >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString("(", " + ", ")")
  }

  /** Replays [[graft.operators.Similarity.prefixDimRecall]]: the IVF
    * top-poolK pool (nested [[annIvfTopK]] replay), full- and
    * prefix-dimension cosines as fixed left-to-right sums, both
    * rankings on one row, overlap@k per query. */
  def prefixRecallIvf(
      poolK: Int, k: Int, prefixDim: Int,
      numCentroids: Int, nProbe: Int,
      dim: Int = 64, seed: Long = 42L): String =
    s"WITH pool AS (SELECT query_id, neighbor_id FROM (${annIvfTopK(poolK, numCentroids, nProbe, dim, seed)})), " +
      s"nb AS (SELECT vec_id, embedding, sqrt(${selfDot("embedding", dim)}) AS nrm, " +
      s"sqrt(${selfDot("embedding", prefixDim)}) AS pnrm FROM embeddings), " +
      "sc AS (SELECT p.query_id, p.neighbor_id, " +
      s"CASE WHEN a.nrm = 0 OR b.nrm = 0 THEN -2 ELSE ${pairDot("a.embedding", "b.embedding", dim)} / (a.nrm * b.nrm) END AS cos_full, " +
      s"CASE WHEN a.pnrm = 0 OR b.pnrm = 0 THEN -2 ELSE ${pairDot("a.embedding", "b.embedding", prefixDim)} / (a.pnrm * b.pnrm) END AS cos_pref " +
      "FROM pool p JOIN nb a ON a.vec_id = p.query_id JOIN nb b ON b.vec_id = p.neighbor_id), " +
      "rk AS (SELECT query_id, neighbor_id, " +
      "row_number() OVER (PARTITION BY query_id ORDER BY cos_full DESC, neighbor_id) AS rf, " +
      "row_number() OVER (PARTITION BY query_id ORDER BY cos_pref DESC, neighbor_id) AS rp FROM sc), " +
      s"hits AS (SELECT query_id, count(*) AS n_hits FROM rk WHERE rf <= $k AND rp <= $k GROUP BY 1) " +
      "SELECT q.query_id, CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits, " +
      s"CAST(coalesce(n_hits, 0) * 1000000 // $k AS BIGINT) AS recall_ppm " +
      "FROM (SELECT DISTINCT query_id FROM pool) q LEFT JOIN hits ON q.query_id = hits.query_id"

  /** Replays [[graft.operators.Events.markovAbsorption]]: same pivot
    * and per-iteration unrolled CTEs as [[markovStationary]], but the
    * absorbing component is pinned at 1.0 in every iteration and the
    * start vector is the absorbing indicator. */
  def markovAbsorption(states: Seq[String], absorbing: String, iters: Int): String = {
    require(states == states.sorted && states.contains(absorbing))
    def v(s: String) = s"v_$s"
    val pivot = (for { s <- states; t <- states } yield
      s"coalesce(max(CASE WHEN prev_type = '$s' AND next_type = '$t' THEN p END), 0.0) AS p_${s}_$t")
      .mkString(", ")
    val it0 = states.map(s =>
      s"CAST(${if (s == absorbing) 1 else 0} AS DOUBLE) AS ${v(s)}").mkString(", ")
    val step = states.map { s =>
      if (s == absorbing) s"CAST(1 AS DOUBLE) AS ${v(s)}"
      else states.map(r => s"p_${s}_$r * ${v(r)}").mkString("(", " + ", s") AS ${v(s)}")
    }.mkString(", ")
    val itCtes = (1 to iters).map(i =>
      s"it$i AS (SELECT $step FROM it${i - 1} CROSS JOIN m)").mkString(", ")
    val out = states.map(s =>
      s"SELECT '$s' AS state, ${v(s)} AS p_absorb FROM it$iters").mkString(" UNION ALL ")
    "WITH seq AS (SELECT event_type, lag(event_type) OVER " +
      "(PARTITION BY user_id ORDER BY ts, event_id) AS prev_type FROM events), " +
      "c AS (SELECT prev_type, event_type AS next_type, count(*) AS n FROM seq " +
      "WHERE prev_type IS NOT NULL GROUP BY 1, 2), " +
      "tot AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS n_tot FROM c GROUP BY 1), " +
      "p AS (SELECT c.prev_type, c.next_type, CAST(c.n AS DOUBLE) / tot.n_tot AS p " +
      "FROM c JOIN tot ON c.prev_type = tot.prev_type), " +
      s"m AS (SELECT $pivot FROM p), " +
      s"it0 AS (SELECT $it0), " +
      s"$itCtes $out"
  }

  /** Replays [[graft.operators.Events.markovSteps]]: same pivot and
    * per-iteration unrolled CTEs as [[markovAbsorption]], but the
    * absorbing component is pinned at 0.0 (an absorbed chain takes no
    * more steps), the start vector is all-zero, and every other
    * component is 1 + the substochastic fold. */
  def markovSteps(states: Seq[String], absorbing: String, iters: Int): String = {
    require(states == states.sorted && states.contains(absorbing))
    def v(s: String) = s"v_$s"
    val pivot = (for { s <- states; t <- states } yield
      s"coalesce(max(CASE WHEN prev_type = '$s' AND next_type = '$t' THEN p END), 0.0) AS p_${s}_$t")
      .mkString(", ")
    val it0 = states.map(s => s"CAST(0 AS DOUBLE) AS ${v(s)}").mkString(", ")
    val step = states.map { s =>
      if (s == absorbing) s"CAST(0 AS DOUBLE) AS ${v(s)}"
      else "(CAST(1 AS DOUBLE) + " +
        states.map(r => s"p_${s}_$r * ${v(r)}").mkString("(", " + ", ")") +
        s") AS ${v(s)}"
    }.mkString(", ")
    val itCtes = (1 to iters).map(i =>
      s"it$i AS (SELECT $step FROM it${i - 1} CROSS JOIN m)").mkString(", ")
    val out = states.map(s =>
      s"SELECT '$s' AS state, ${v(s)} AS exp_steps FROM it$iters").mkString(" UNION ALL ")
    "WITH seq AS (SELECT event_type, lag(event_type) OVER " +
      "(PARTITION BY user_id ORDER BY ts, event_id) AS prev_type FROM events), " +
      "c AS (SELECT prev_type, event_type AS next_type, count(*) AS n FROM seq " +
      "WHERE prev_type IS NOT NULL GROUP BY 1, 2), " +
      "tot AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS n_tot FROM c GROUP BY 1), " +
      "p AS (SELECT c.prev_type, c.next_type, CAST(c.n AS DOUBLE) / tot.n_tot AS p " +
      "FROM c JOIN tot ON c.prev_type = tot.prev_type), " +
      s"m AS (SELECT $pivot FROM p), " +
      s"it0 AS (SELECT $it0), " +
      s"$itCtes $out"
  }

  /** Replays [[graft.operators.Events.markovStationary]]: the
    * transition matrix pivots into ONE row of k² double columns, then
    * each power iteration unrolls as a CTE whose components are the
    * SAME left-to-right alphabetical sums the driver fold computes —
    * the fixed-expression-tree float discipline applied to an
    * iterative algorithm. `states` must be the complete sorted
    * event-type list (the pivot is static SQL).
    */
  def markovStationary(states: Seq[String], iters: Int): String = {
    require(states == states.sorted && states.nonEmpty, "states must be sorted")
    def v(s: String) = s"v_$s"
    val pivot = (for { s <- states; t <- states } yield
      s"coalesce(max(CASE WHEN prev_type = '$s' AND next_type = '$t' THEN p END), 0.0) AS p_${s}_$t")
      .mkString(", ")
    val it0 = states.map(s => s"CAST(1 AS DOUBLE) / ${states.size} AS ${v(s)}").mkString(", ")
    val step = states.map { t =>
      states.map(s => s"${v(s)} * p_${s}_$t").mkString("(", " + ", s") AS ${v(t)}")
    }.mkString(", ")
    val itCtes = (1 to iters).map(i =>
      s"it$i AS (SELECT $step FROM it${i - 1} CROSS JOIN m)").mkString(", ")
    val out = states.map(s =>
      s"SELECT '$s' AS state, ${v(s)} AS prob FROM it$iters").mkString(" UNION ALL ")
    "WITH seq AS (SELECT event_type, lag(event_type) OVER " +
      "(PARTITION BY user_id ORDER BY ts, event_id) AS prev_type FROM events), " +
      "c AS (SELECT prev_type, event_type AS next_type, count(*) AS n FROM seq " +
      "WHERE prev_type IS NOT NULL GROUP BY 1, 2), " +
      "tot AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS n_tot FROM c GROUP BY 1), " +
      "p AS (SELECT c.prev_type, c.next_type, CAST(c.n AS DOUBLE) / tot.n_tot AS p " +
      "FROM c JOIN tot ON c.prev_type = tot.prev_type), " +
      s"m AS (SELECT $pivot FROM p), " +
      s"it0 AS (SELECT $it0), " +
      s"$itCtes $out"
  }
}
