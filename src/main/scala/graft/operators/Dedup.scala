package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{rolling_hash, tokens, vec_dot, PortableMinHash}

/** Document deduplication operators for large-scale training-data
  * pipelines: exact, n-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup.
  *
  * Every operator is a keyed-shuffle DataFrame plan (group-by or
  * equi-join on content-derived keys) — no driver-side loops, no cross
  * joins except where an oracle-exact pairwise scan is explicitly
  * requested — so each scales to a multi-executor cluster by adding
  * partitions. Similarity thresholds are expressed as exact integer
  * cross-multiplications (`inter * den >= union * num`) so results are
  * reproducible bit-for-bit across engines (no float rounding at the
  * decision boundary).
  */
object Dedup {

  /** Exact content dedup: hash-groupBy on md5(text), keep the smallest id
    * as the canonical survivor (deterministic).
    */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Benchmark decontamination: drop corpus rows whose NORMALIZED
    * content (lowercased, whitespace-collapsed — the
    * [[graft.operators.TextAnalysis.fingerprint]] normalization) also
    * appears in the eval set. The standard pre-training hygiene step:
    * an eval document leaked into the training corpus, byte-identical
    * or differing only in case/whitespace, must not be trained on.
    *
    * A LEFT ANTI join on the md5 of the normalized text: the eval side
    * is fingerprints only (one string per eval doc — broadcastable for
    * any real eval suite), so at 100 TB this is one broadcast probe per
    * corpus row, zero shuffles on the corpus.
    */
  def removeContaminated(
      corpus: DataFrame,
      eval: DataFrame,
      textCol: String = "text"): DataFrame = {
    def fp(c: org.apache.spark.sql.Column) =
      md5(regexp_replace(lower(trim(c)), "\\s+", " "))
    val evalFps = eval.select(fp(col(textCol)).as("__fp")).distinct()
    corpus
      .withColumn("__fp", fp(col(textCol)))
      .join(broadcast(evalFps), Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** Bloom-prefiltered decontamination — [[removeContaminated]] for the
    * scale where the eval fingerprint set is too large to broadcast as
    * a join hash relation. The eval set is compressed into a Bloom
    * filter (a bit array — MBs where the hash relation would be GBs)
    * that ships to every task as a codegen'd literal; the corpus probes
    * it with no shuffle and no join, and only might-contain survivors
    * (true hits + ~fpp false positives) pay the exact anti-join.
    *
    * A Bloom filter has NO false negatives, so every row the probe
    * clears is definitely clean — the output is EXACT, identical to
    * [[removeContaminated]], and sits under the same oracle SQL. The
    * probe uses Spark's own `BloomFilterMightContain` expression (the
    * machinery behind runtime row-level filtering), not a UDF.
    */
  def removeContaminatedBloom(
      corpus: DataFrame,
      eval: DataFrame,
      textCol: String = "text",
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.types.BinaryType
    def fp(c: org.apache.spark.sql.Column) =
      md5(regexp_replace(lower(trim(c)), "\\s+", " "))
    val evalFps = eval.select(fp(col(textCol)).as("__fp")).distinct()
    // sentinel hash so the bloom is never built from zero rows (Spark's
    // stat.bloomFilter NPEs on an empty input); a sentinel can only ADD
    // a false positive, and every positive is exactly re-verified below
    val bloom = evalFps.select(xxhash64(col("__fp")).as("__h"))
      .unionByName(eval.sparkSession.range(1).select(lit(0L).as("__h")))
      .stat.bloomFilter("__h", expectedItems + 1, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val might = ColumnBridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      ColumnBridge.expression(xxhash64(col("__fp")))))
    val tagged = corpus.withColumn("__fp", fp(col(textCol)))
    val clean = tagged.filter(!might)
    // no broadcast hint on the verify join: this tier exists for eval
    // sets too large to broadcast — AQE broadcasts when small and
    // falls back to a shuffle anti-join (of only the candidate
    // trickle) when not; a hint would force an OOM instead
    val candidates = tagged.filter(might)
      .join(evalFps, Seq("__fp"), "left_anti")
    clean.unionByName(candidates).drop("__fp")
  }

  /** N-gram-overlap decontamination — the stronger form of
    * [[removeContaminated]]: a corpus row is dropped when it shares at
    * least `minShared` distinct word n-grams with the eval set, so
    * paraphrased or partially-quoted eval content is caught, not just
    * normalized-exact copies.
    *
    * Shape at 100 TB: the eval gram set is distinct (small — eval
    * suites are thousands of docs) and broadcast; corpus grams are
    * generated map-side (zero shuffles, see [[nGramSets]]) and probe
    * the broadcast. Only MATCHED (doc, gram) rows — a trickle — reach
    * the count shuffle; the contaminated-id set is then broadcast back
    * for the anti join. The full corpus is never shuffled.
    */
  def removeContaminatedNgram(
      corpus: DataFrame,
      eval: DataFrame,
      n: Int = 13,
      minShared: Int = 1,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(minShared >= 1, "minShared must be >= 1")
    val evalGrams = nGramSets(eval, n, textCol, idCol).select(col("gram")).distinct()
    val contaminated = nGramSets(corpus, n, textCol, idCol)
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__shared")) // grams are distinct per doc
      .filter(col("__shared") >= minShared)
      .select(col(idCol))
    corpus.join(broadcast(contaminated), Seq(idCol), "left_anti")
  }

  /** Embedding-space decontamination — the SEMANTIC form of
    * [[removeContaminated]]: a corpus row is dropped when its embedding
    * is cosine-similar (≥ `threshold`) to ANY eval-set embedding, so
    * reworded or translated eval leakage that shares no n-grams is
    * still caught.
    *
    * Shape at 100 TB: the eval side (vectors + precomputed norms) is
    * broadcast — eval suites are thousands of vectors, MBs — and the
    * corpus is scanned once with a broadcast nested-loop anti join
    * whose predicate is the codegen'd [[graft.functions.vec_dot]]; no
    * corpus shuffle, no cross-join materialization (the anti join
    * short-circuits on the first hit per row). Exactness: every drop
    * decision is the full double-precision cosine — unlike an
    * LSH-prefiltered variant, recall of contamination is 1.0, which is
    * the property that matters for eval hygiene (a missed contaminated
    * row silently inflates benchmark scores).
    */
  def decontaminateEmbed(
      corpus: DataFrame,
      eval: DataFrame,
      threshold: Double,
      vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val evalVecs = eval.select(
      col(vecCol).as("__eval_vec"),
      sqrt(vec_dot(col(vecCol), col(vecCol))).as("__eval_norm"))
    val withNorm = corpus.withColumn(
      "__norm", sqrt(vec_dot(col(vecCol), col(vecCol))))
    withNorm
      .join(
        broadcast(evalVecs),
        vec_dot(col(vecCol), col("__eval_vec")) >=
          lit(threshold) * col("__norm") * col("__eval_norm"),
        "left_anti")
      .drop("__norm")
  }

  /** Distinct word-trigram set per document: (idCol, gram). */
  def trigramSets(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    nGramSets(docs, 3, textCol, idCol)

  /** Distinct word n-gram set per document: (idCol, gram).
    *
    * Entirely map-side — zero shuffles: tokenize into a materialized
    * array column, then generate-and-dedup the grams in one codegen'd
    * pass ([[graft.plans.WordNGrams]] — fuses what was
    * `array_distinct(transform(...))`, whose lambda executed
    * interpreted outside whole-stage codegen), then explode. The
    * tokenizer stays in its own projection so it is evaluated once per
    * row. Per-doc dedup inside the expression replaces a global
    * `distinct`, which would shuffle the full gram table.
    */
  def nGramSets(docs: DataFrame, n: Int, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(n >= 1)
    docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        explode(graft.functions.word_ngrams_distinct(col("__toks"), n)).as("gram"))
  }

  /** All-pairs n-gram Jaccard via an inverted index on the gram: docs
    * sharing at least one trigram become candidate pairs; Jaccard =
    * |A∩B| / (|A|+|B|-|A∩B|). Pair generation is one shuffle on the gram
    * key: group doc ids per gram, drop grams held by a single doc (they
    * cannot produce a pair — at corpus scale that is nearly all of
    * them), and expand ordered (id_a < id_b) pairs from each gram's
    * sorted doc list. This emits exactly k(k-1)/2 rows per gram —
    * measured 1.6× faster than the textbook inverted-index self-join,
    * which shuffles two branches and filters half its output away. A hot
    * gram held by k docs expands k²/2 pairs in one task — for corpora
    * with stop-gram skew, set `maxGramDf`; that drops only pairs whose
    * sole overlap is a near-universal gram.
    * Output is integer-exact: (id_a, id_b, inter,
    * union_size) with inter/union ≥ num/den.
    *
    * @param maxGramDf stop-gram cap: grams held by more than this many
    *   docs are excluded from pair generation (and from `inter`), which
    *   bounds the quadratic expansion of hot grams to maxGramDf²/2 rows
    *   per gram. The default (`Int.MaxValue`) is exact. With a cap, a
    *   pair is missed only if its entire overlap is near-universal
    *   grams; `union_size` still counts every gram, so reported Jaccard
    *   is a lower bound.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      threshNum: Int = 1,
      threshDen: Int = 20,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxGramDf: Int = Int.MaxValue): DataFrame = {
    // the gram table feeds both the pair expansion AND the per-doc
    // sizes; Spark does not materialize shared subplans, so without
    // persisting, the tokenize+gram pipeline would execute once per use
    // (registered in Caches — callers release between runs)
    val tri = Caches.persisted(trigramSets(docs, textCol, idCol))
    val sizes = tri.groupBy(idCol).agg(count(lit(1)).as("n_grams"))
    gramOverlaps(tri, idCol, maxGramDf)
      .join(sizes.toDF("id_a", "n_a"), "id_a")
      .join(sizes.toDF("id_b", "n_b"), "id_b")
      .withColumn("union_size", col("n_a") + col("n_b") - col("inter"))
      .where(col("inter") * threshDen >= col("union_size") * threshNum)
      .select("id_a", "id_b", "inter", "union_size")
  }

  /** Shared-gram counts per ordered doc pair (id_a < id_b): the
    * inverted-index expansion both Jaccard and containment pair scans
    * are built on. See [[ngramJaccardPairs]] for the shape discussion.
    */
  private def gramOverlaps(
      tri: DataFrame, idCol: String, maxGramDf: Int): DataFrame = {
    // a capped run must drop hot grams BEFORE collecting doc lists (a
    // near-universal gram would blow up the collecting task otherwise);
    // the df-filter join keys on gram, so the following groupBy reuses
    // its partitioning without another exchange
    val eligible =
      if (maxGramDf == Int.MaxValue) tri
      else {
        val ok = tri.groupBy("gram").agg(count(lit(1)).as("gram_df"))
          .where(col("gram_df").between(2, maxGramDf)).select("gram")
        tri.join(ok, "gram")
      }
    eligible
      .groupBy("gram")
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      .where(size(col("ids")) >= 2)
      .select(posexplode(col("ids")).as(Seq("i", "id_a")), col("ids"))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
  }

  /** Asymmetric near-dup detection: pairs where the SMALLER doc's gram
    * set is mostly contained in the other's — `containment(A,B) =
    * |A∩B| / min(|A|,|B|) ≥ num/den`. Jaccard misses exactly these: a
    * paragraph quoted inside a long article has tiny union-relative
    * overlap but near-total containment. This is the quote / subset /
    * expanded-revision detector that complements [[ngramJaccardPairs]]
    * (and the span-level [[exciseRepeatedSpans]]).
    *
    * Output is integer-exact: (id_a, id_b, inter, n_a, n_b,
    * containment_ppm) with containment_ppm = ⌊10⁶·inter/min(n_a,n_b)⌋.
    *
    * Same inverted-index single-shuffle shape (and `maxGramDf` skew
    * cap) as the Jaccard scan — only the final threshold differs.
    */
  def ngramContainmentPairs(
      docs: DataFrame,
      threshNum: Int = 1,
      threshDen: Int = 2,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxGramDf: Int = Int.MaxValue): DataFrame = {
    val tri = Caches.persisted(trigramSets(docs, textCol, idCol))
    val sizes = tri.groupBy(idCol).agg(count(lit(1)).as("n_grams"))
    gramOverlaps(tri, idCol, maxGramDf)
      .join(sizes.toDF("id_a", "n_a"), "id_a")
      .join(sizes.toDF("id_b", "n_b"), "id_b")
      .where(col("inter") * threshDen >= least(col("n_a"), col("n_b")) * threshNum)
      .withColumn("containment_ppm",
        expr("inter * 1000000 div least(n_a, n_b)"))
      .select("id_a", "id_b", "inter", "n_a", "n_b", "containment_ppm")
  }

  /** Prefix-filtered n-gram Jaccard — EXACTLY the same output as
    * [[ngramJaccardPairs]] (same pairs, same integer counts), reached
    * through an order-of-magnitude smaller candidate set. This is the
    * prefix-filtering principle of SSJoin/PPJoin: order every doc's
    * grams by global rarity (document frequency ascending, gram as the
    * tiebreak — any TOTAL order works, rarest-first minimizes fan-in);
    * a pair with Jaccard ≥ t = num/den must share ≥ ⌈t·|A|⌉ grams, and
    * at most ⌈t·|A|⌉−1 of A's grams fit in A's suffix of that length —
    * so the ORDER-SMALLEST shared gram lands inside BOTH docs' prefixes
    * of length |x| − ⌈t·|x|⌉ + 1. Candidate generation therefore only
    * expands pairs from prefix grams, and prefix grams are by
    * construction the rarest ones: the hot grams that dominate
    * [[ngramJaccardPairs]]'s k²/2 expansions sit in suffixes and
    * generate NOTHING. Verification then computes the exact
    * intersection for candidates only.
    *
    * Shape at 100 TB: candidate fan-in per gram is its PREFIX document
    * frequency (≪ raw df for common grams); verification is one
    * equi-join of candidate pairs against the gram table on
    * (doc, gram) — O(Σ_pairs |A|) rows, never all-pairs. The per-doc
    * rarity rank is a window partitioned by doc (state = one doc's
    * grams). Unlike `maxGramDf` capping this is EXACT at any skew:
    * correctness never depends on dropping data, so the same code is
    * the oracle tier AND the scale tier.
    *
    * Requires threshNum ≥ 1 (a zero threshold has empty prefixes —
    * use [[ngramJaccardPairs]] for the degenerate list-everything case).
    */
  def ngramJaccardPairsPrefix(
      docs: DataFrame,
      threshNum: Int = 1,
      threshDen: Int = 20,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(threshNum >= 1 && threshDen >= threshNum,
      "prefix filtering needs 0 < threshold <= 1")
    import org.apache.spark.sql.expressions.Window
    val tri = Caches.persisted(trigramSets(docs, textCol, idCol))
    val sizes = Caches.persisted(
      tri.groupBy(idCol).agg(count(lit(1)).as("n_grams")))
    val gramDf = tri.groupBy("gram").agg(count(lit(1)).as("gram_df"))
    // rarity rank within each doc; prefix keeps the first
    // n − ⌈t·n⌉ + 1 grams (⌈t·n⌉ in exact integer arithmetic)
    val ranked = tri
      .join(gramDf, "gram")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("gram_df"), col("gram"))))
      .join(sizes, idCol)
    val prefix = ranked.where(
      col("rk") <= col("n_grams") + 1 -
        expr(s"(n_grams * $threshNum + ${threshDen - 1}) div $threshDen"))
    // candidate pairs from prefix grams only — same sorted-list
    // expansion as the all-grams variant, distinct because a pair may
    // share several prefix grams
    val cands = prefix
      .groupBy("gram")
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      .where(size(col("ids")) >= 2)
      .select(posexplode(col("ids")).as(Seq("i", "id_a")), col("ids"))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("id_b"))
      .distinct()
    // exact verification: count shared grams per candidate pair
    val g = tri.toDF("vid", "vgram")
    val inter = cands
      .join(g.withColumnsRenamed(Map("vid" -> "id_a", "vgram" -> "gram")), "id_a")
      .join(g.withColumnsRenamed(Map("vid" -> "id_b", "vgram" -> "gram")),
        Seq("id_b", "gram"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("id_a", "n_a"), "id_a")
      .join(sizes.toDF("id_b", "n_b"), "id_b")
      .withColumn("union_size", col("n_a") + col("n_b") - col("inter"))
      .where(col("inter") * threshDen >= col("union_size") * threshNum)
      .select("id_a", "id_b", "inter", "union_size")
  }

  /** Sorted-neighborhood blocking (the classic merge/purge method):
    * sort the corpus by a blocking key — here the first `keyChars`
    * chars of the whitespace-normalized text — and verify exact
    * Jaccard ONLY for pairs within `windowSize` positions of each
    * other. The third member of the blocking family: the inverted
    * index recalls pairs sharing any RARE feature, LSH pairs that
    * COLLIDE, sorted-neighborhood pairs that sort NEAR — strongest
    * exactly where near-dups share their opening (templated docs,
    * prefixed boilerplate, same-title revisions), and immune to
    * hot-gram skew by construction (candidates per doc ≤ 2·window,
    * ALWAYS). Recall is blocking-limited like any blocking method:
    * a near-dup pair whose first `keyChars` differ is missed — run
    * beside the gram/LSH tiers, not instead of them.
    *
    * The global rank is computed by range-partition + sort-within +
    * `zipWithIndex` — the same no-single-partition dense sequence as
    * `Nds.fillSurrogate`'s large path, deterministic because
    * (key, id) is unique. Candidates come from ONE equi-join on the
    * rank cell (`rank div windowSize`; a pair within `windowSize`
    * ranks spans at most adjacent cells, so each left row probes two
    * cells) — never a rank-band theta join.
    *
    * Output matches the pair-scan family: (id_a, id_b, inter,
    * union_size), id_a < id_b, Jaccard ≥ num/den exact.
    */
  def sortedNeighborhoodPairs(
      docs: DataFrame,
      windowSize: Int = 5,
      threshNum: Int = 1,
      threshDen: Int = 20,
      keyChars: Int = 12,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(windowSize >= 1 && keyChars >= 1)
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    val keyed = docs.select(col(idCol), substring(norm, 1, keyChars).as("__bk"))
    val ordered = keyed
      .repartitionByRange(col("__bk"), col(idCol))
      .sortWithinPartitions(col("__bk"), col(idCol))
      .select(col(idCol))
    val spark = docs.sparkSession
    val ranked = Caches.persisted(spark.createDataFrame(
      ordered.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row(r.get(0), i + 1L)
      },
      org.apache.spark.sql.types.StructType(
        ordered.schema.fields :+
          org.apache.spark.sql.types.StructField(
            "__rk", org.apache.spark.sql.types.LongType, nullable = false))))
    val w = windowSize.toLong
    val left = ranked.select(col(idCol).as("__ia"), col("__rk").as("__ra"),
      expr(s"__rk div $w").as("__cell"))
    val probe = left.unionAll(left.withColumn("__cell", col("__cell") + 1))
    val right = ranked.select(col(idCol).as("__ib"), col("__rk").as("__rb"),
      expr(s"__rk div $w").as("__cell"))
    val cands = probe.join(right, "__cell")
      .where(col("__rb") > col("__ra") && col("__rb") - col("__ra") <= w)
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"))
    val tri = Caches.persisted(trigramSets(docs, textCol, idCol))
    val sizes = tri.groupBy(idCol).agg(count(lit(1)).as("n_grams"))
    val g = tri.toDF("vid", "vgram")
    cands
      .join(g.withColumnsRenamed(Map("vid" -> "id_a", "vgram" -> "gram")), "id_a")
      .join(g.withColumnsRenamed(Map("vid" -> "id_b", "vgram" -> "gram")),
        Seq("id_b", "gram"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
      .join(sizes.toDF("id_a", "n_a"), "id_a")
      .join(sizes.toDF("id_b", "n_b"), "id_b")
      .withColumn("union_size", col("n_a") + col("n_b") - col("inter"))
      .where(col("inter") * threshDen >= col("union_size") * threshNum)
      .select("id_a", "id_b", "inter", "union_size")
  }

  /** Per-document novelty: how much content each doc ADDS to the
    * corpus, given every doc with a smaller id — `n_novel` = the doc's
    * distinct trigrams whose corpus-wide first occurrence (minimum doc
    * id) is this doc, `novelty_ppm` = ⌊10⁶·n_novel/n_grams⌋. The
    * curation signal behind "keep documents that contribute diversity":
    * exact duplicates score 0, boilerplate-heavy variants score low,
    * genuinely new text scores high — a graded, attribution-aware
    * complement to binary dedup decisions.
    *
    * Two combinable aggregations, no joins on the big side: min doc id
    * per gram (each gram attributed to exactly ONE doc — deterministic,
    * order-free), then a count per attributed doc; the per-doc gram
    * sizes join in at |docs| scale. Docs with no trigram (< 3 tokens)
    * are omitted.
    */
  def noveltyScores(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val tri = Caches.persisted(trigramSets(docs, textCol, idCol))
    val sizes = tri.groupBy(idCol).agg(count(lit(1)).as("n_grams"))
    val novelCounts = tri.groupBy("gram").agg(min(col(idCol)).as(idCol))
      .groupBy(idCol).agg(count(lit(1)).as("n_novel"))
    sizes.join(novelCounts, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_ppm", expr("n_novel * 1000000 div n_grams"))
  }

  /** Fuzzy record linkage: for every left document, the single
    * best-matching right document by word-trigram Jaccard — the
    * similarity JOIN (argmax per left row) as opposed to the pair
    * LISTING of [[ngramJaccardPairs]]. The shape behind "link each new
    * record to its canonical entry" and "attribute each near-dup to its
    * source document".
    *
    * The score is the Jaccard ratio as a scaled integer
    * (`inter * scoreScale div union`), so ranking and ties are
    * bit-identical across engines; ties break on the smaller right id.
    * Left docs sharing no gram with any right doc have no match and are
    * omitted (the caller left-joins the output back if absence matters).
    *
    * Shape at 100 TB: an inverted-index equi-join on the gram — the
    * fan-in per gram is its document frequency, not the corpus size —
    * then one (left,right)-keyed count shuffle and a per-left-key
    * window over each left doc's candidates only. `maxGramDf` drops
    * grams more frequent than the cap (on the COMBINED corpus) from
    * candidate generation, bounding the worst gram's expansion;
    * union sizes still count every gram, mirroring
    * [[ngramJaccardPairs]]'s capped semantics.
    */
  def bestJaccardMatch(
      left: DataFrame,
      right: DataFrame,
      scoreScale: Long = 1000000000L,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxGramDf: Int = Int.MaxValue): DataFrame = {
    val lg = Caches.persisted(trigramSets(left, textCol, idCol)
      .select(col(idCol).as("id_l"), col("gram")))
    val rg = Caches.persisted(trigramSets(right, textCol, idCol)
      .select(col(idCol).as("id_r"), col("gram")))
    val lsz = lg.groupBy("id_l").agg(count(lit(1)).as("n_l"))
    val rsz = rg.groupBy("id_r").agg(count(lit(1)).as("n_r"))
    val (lj, rj) =
      if (maxGramDf == Int.MaxValue) (lg, rg)
      else {
        val ok = lg.select("gram").unionAll(rg.select("gram"))
          .groupBy("gram").agg(count(lit(1)).as("gram_df"))
          .where(col("gram_df") <= maxGramDf).select("gram")
        (lg.join(ok, "gram"), rg.join(ok, "gram"))
      }
    val inter = lj.join(rj, "gram")
      .groupBy("id_l", "id_r")
      .agg(count(lit(1)).as("inter"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id_l").orderBy(col("score").desc, col("id_r"))
    inter
      .join(lsz, "id_l")
      .join(rsz, "id_r")
      .withColumn("union_size", col("n_l") + col("n_r") - col("inter"))
      .withColumn("score", expr(s"inter * ${scoreScale}L div union_size"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("id_l").as(idCol), col("id_r").as("match_id"),
        col("inter"), col("union_size"), col("score"))
  }

  /** MinHash + LSH near-dup: k independent min-hashes of the trigram set,
    * banded into `numBands` bands; docs sharing any band bucket become
    * candidates (shuffle on the bucket key — at 100 TB this is the only
    * join, and its fan-in per bucket is bounded by the collision rate,
    * not the corpus size); candidates are then verified with the exact
    * integer Jaccard.
    *
    * @param portable when false (default), min-hashes are seeded
    *   `xxhash64` and band buckets Murmur3 — the fast production path.
    *   When true, the [[graft.functions.PortableMinHash]] affine family
    *   over [[graft.functions.rolling_hash]] is used and band buckets
    *   are the raw signature values, so the whole pipeline is
    *   bit-replicable in another engine (the DuckDB oracle replays it —
    *   `graft.OracleSql.dedupMinhashLsh`).
    */
  def minHashLsh(
      docs: DataFrame,
      numHashes: Int = 16,
      numBands: Int = 4,
      threshNum: Int = 1,
      threshDen: Int = 20,
      textCol: String = "text",
      idCol: String = "doc_id",
      portable: Boolean = false): DataFrame = {
    require(numHashes % numBands == 0, "numHashes must divide into numBands")
    val rowsPerBand = numHashes / numBands
    // materialized once: feeds the signature agg, both sides of the
    // candidate verification join, and the per-doc sizes (4 uses)
    val tri = Caches.persisted(trigramSets(docs, textCol, idCol))

    val buckets = lshBuckets(tri, numHashes, numBands, idCol, portable)

    val cand = buckets
      .toDF("id_a", "band", "bucket")
      .join(buckets.toDF("id_b", "band", "bucket"), Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()

    // exact verification on candidates only
    val sizes = tri.groupBy(idCol).agg(count(lit(1)).as("n_grams"))
    val inter = cand
      .join(tri.toDF("id_a", "gram"), "id_a")
      .join(tri.toDF("id_b", "gram"), Seq("id_b", "gram"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("id_a", "n_a"), "id_a")
      .join(sizes.toDF("id_b", "n_b"), "id_b")
      .withColumn("union_size", col("n_a") + col("n_b") - col("inter"))
      .where(col("inter") * threshDen >= col("union_size") * threshNum)
      .select("id_a", "id_b", "inter", "union_size")
  }

  /** MinHash band buckets of a gram table: `(idCol, band, bucket)`, one
    * row per document per band. Shared by the one-shot [[minHashLsh]]
    * and the persistent-index path ([[buildMinHashIndex]] /
    * [[dedupDeltaAgainstIndex]]) so both produce identical buckets.
    */
  private def lshBuckets(
      tri: DataFrame,
      numHashes: Int,
      numBands: Int,
      idCol: String,
      portable: Boolean): DataFrame =
    lshBucketsFromSigs(
      minHashSigs(tri, numHashes, idCol, portable), numHashes, numBands,
      idCol, portable)

  /** The MinHash signature table `(idCol, mh0..mh{numHashes-1})` — the
    * band-count-INDEPENDENT half of [[lshBuckets]], factored out so a
    * multi-band-count sweep ([[blockingRecallReport]]) computes the
    * signature aggregation ONCE and re-bands it per candidate count
    * instead of re-hashing the gram table per sweep point.
    */
  private def minHashSigs(
      tri: DataFrame,
      numHashes: Int,
      idCol: String,
      portable: Boolean): DataFrame = {
    val sigCols =
      if (portable) {
        val h40 = rolling_hash(col("gram")).bitwiseAND(lit(PortableMinHash.Mask))
        (0 until numHashes).map(i =>
          min((h40 * lit(PortableMinHash.a(i)) + lit(PortableMinHash.b(i)))
            % lit(PortableMinHash.Mod)).as(s"mh$i"))
      } else
        (0 until numHashes).map(i =>
          min(xxhash64(concat(lit(s"seed$i:"), col("gram")))).as(s"mh$i"))
    tri.groupBy(idCol).agg(sigCols.head, sigCols.tail: _*)
  }

  /** Band buckets from a [[minHashSigs]] table — pure banding, no
    * re-hashing. Output identical to [[lshBuckets]] on the same grams.
    */
  private def lshBucketsFromSigs(
      sigs: DataFrame,
      numHashes: Int,
      numBands: Int,
      idCol: String,
      portable: Boolean): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val bandStructs = (0 until numBands).map { b =>
      val bandCols = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      // portable: the band's raw values ARE the bucket (equality join on
      // array<long>); default: Murmur3-condensed for a narrower shuffle
      val bucket =
        if (portable) array(bandCols: _*)
        else array(hash(bandCols: _*).cast("long"))
      struct(lit(b).as("band"), bucket.as("bucket"))
    }
    sigs
      .select(col(idCol), explode(array(bandStructs: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Build the persistent dedup index for a corpus: its MinHash band
    * buckets plus each document's gram-set size — everything the
    * incremental path needs so that ingesting a delta NEVER re-reads,
    * re-tokenizes, or re-hashes the historical corpus. Write the result
    * as a warehouse table (it is corpus-keyed and append-friendly:
    * index a new delta with this same function and union/append).
    *
    * @return (idCol, band, bucket, n_grams)
    */
  def buildMinHashIndex(
      docs: DataFrame,
      numHashes: Int = 16,
      numBands: Int = 4,
      textCol: String = "text",
      idCol: String = "doc_id",
      portable: Boolean = false): DataFrame = {
    require(numHashes % numBands == 0, "numHashes must divide into numBands")
    val tri = Caches.persisted(trigramSets(docs, textCol, idCol))
    val sizes = tri.groupBy(idCol).agg(count(lit(1)).as("n_grams"))
    lshBuckets(tri, numHashes, numBands, idCol, portable)
      .join(sizes, idCol)
  }

  /** Incremental near-dup detection: all verified pairs touching the
    * DELTA — delta↔delta and delta↔corpus — against a corpus known only
    * through its [[buildMinHashIndex]] table. THE daily-ingest shape at
    * 100 TB: signature work is O(delta), candidate generation is two
    * equi-joins on (band, bucket) (delta×delta and delta×index), and
    * the historical corpus text is touched ONLY for candidate-matched
    * documents (a semi-joined pruned read — corpus gram sizes come from
    * the index, not recomputation). Output semantics are exactly the
    * full [[minHashLsh]] run restricted to pairs with a delta member —
    * the property the oracle checks.
    *
    * @param corpus the corpus TABLE (scanned only for candidate ids)
    * @param index  its [[buildMinHashIndex]] output (same
    *               numHashes/numBands/portable)
    */
  def dedupDeltaAgainstIndex(
      delta: DataFrame,
      corpus: DataFrame,
      index: DataFrame,
      numHashes: Int = 16,
      numBands: Int = 4,
      threshNum: Int = 1,
      threshDen: Int = 20,
      textCol: String = "text",
      idCol: String = "doc_id",
      portable: Boolean = false): DataFrame = {
    require(numHashes % numBands == 0, "numHashes must divide into numBands")
    val dtri = Caches.persisted(trigramSets(delta, textCol, idCol))
    val dsizes = dtri.groupBy(idCol).agg(count(lit(1)).as("n_grams"))
    val dbuckets = Caches.persisted(
      lshBuckets(dtri, numHashes, numBands, idCol, portable))
    val candDD = dbuckets.toDF("id_a", "band", "bucket")
      .join(dbuckets.toDF("id_b", "band", "bucket"), Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val candDC = dbuckets.toDF("id_d", "band", "bucket")
      .join(index.select(col(idCol).as("id_c"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .select(least(col("id_d"), col("id_c")).as("id_a"),
        greatest(col("id_d"), col("id_c")).as("id_b"))
    val cand = Caches.persisted(candDD.unionByName(candDC).distinct())
    val ctri = trigramSets(prunedCorpus(corpus, cand, idCol), textCol, idCol)
    val tri = dtri.unionByName(ctri)
    val sizes = dsizes.unionByName(
      index.select(col(idCol), col("n_grams")).distinct())
    cand
      .join(tri.toDF("id_a", "gram"), "id_a")
      .join(tri.toDF("id_b", "gram"), Seq("id_b", "gram"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
      .join(sizes.toDF("id_a", "n_a"), "id_a")
      .join(sizes.toDF("id_b", "n_b"), "id_b")
      .withColumn("union_size", col("n_a") + col("n_b") - col("inter"))
      .where(col("inter") * threshDen >= col("union_size") * threshNum)
      .select("id_a", "id_b", "inter", "union_size")
  }

  /** BLOCKING-RECALL report — the banding TUNING CURVE: for each
    * candidate band count, how many of the true near-dup pairs (exact
    * integer-Jaccard ≥ threshNum/threshDen) the LSH band-bucket
    * blocking actually surfaces, next to the candidate volume that
    * recall costs. More bands (fewer rows per band) raise recall AND
    * candidate count — this report is how the curator picks the point
    * on that trade before burning verification compute at corpus
    * scale. Portable signatures, so the unverified candidate sets
    * (bucket = the band's raw signature values — no condensing-hash
    * collisions) replay exactly in the oracle.
    *
    * Scale judgment: the TRUTH side is the exact all-pairs Jaccard —
    * sample-scale by construction (the same documented tier as
    * `dedup_ngram_jaccard`); run the report on a labeled sample and
    * apply the chosen banding to the full corpus, which is precisely
    * the point of measuring recall before scaling out.
    */
  def blockingRecallReport(
      docs: DataFrame,
      numHashes: Int,
      bandCounts: Seq[Int],
      threshNum: Int,
      threshDen: Int,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    blockingRecallReportWithTruth(docs,
      ngramJaccardPairs(docs, threshNum, threshDen, textCol = textCol,
        idCol = idCol).select("id_a", "id_b"),
      numHashes, bandCounts, textCol, idCol)

  /** [[blockingRecallReport]] against a PRE-COMPUTED truth pair list —
    * the production shape where the labeled-sample truth is a
    * materialized artifact (the same exact-Jaccard pair table several
    * eval gates share) rather than re-mined per report. `truthPairs`
    * must be the `(id_a, id_b)` projection of the exact pair scan at
    * the report's threshold; output is identical to
    * [[blockingRecallReport]] on the same pairs. The signature
    * aggregation is computed ONCE and re-banded per band count (the
    * signatures do not depend on the band count).
    */
  def blockingRecallReportWithTruth(
      docs: DataFrame,
      truthPairs: DataFrame,
      numHashes: Int,
      bandCounts: Seq[Int],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(bandCounts.nonEmpty && bandCounts.forall(b => b >= 1 && numHashes % b == 0))
    val tri = Caches.persisted(trigramSets(docs, textCol, idCol))
    val truth = Caches.persisted(truthPairs.select("id_a", "id_b"))
    val sigs = Caches.persisted(minHashSigs(tri, numHashes, idCol, portable = true))
    bandCounts.map { nb =>
      val bk = lshBucketsFromSigs(sigs, numHashes, nb, idCol, portable = true)
      val cand = Caches.persisted(bk.toDF("id_a", "band", "bucket")
        .join(bk.toDF("id_b", "band", "bucket"), Seq("band", "bucket"))
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct())
      truth.agg(count(lit(1)).as("n_true"))
        .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
        .crossJoin(truth.join(cand, Seq("id_a", "id_b"), "left_semi")
          .agg(count(lit(1)).as("n_caught")))
        .select(lit(nb).as("num_bands"), col("n_true"), col("n_candidates"),
          col("n_caught"),
          expr("n_caught * 1000000 div n_true").as("recall_ppm"))
    }.reduce(_ unionByName _)
  }

  /** RIGHT-TO-BE-FORGOTTEN for the persisted MinHash index: purge every
    * band row (and the piggybacked `n_grams` size) of the deleted docs,
    * so the index can never again surface a deleted document as a
    * dedup candidate. One anti-join on the id — deletion-feed-sized,
    * never corpus-sized — and because LSH pair extraction is purely
    * PAIRWISE (a pair's bands/overlap depend on its two docs only), the
    * purged index serves results identical to an index freshly rebuilt
    * from the survivors (gated: `dedup_index_deleted`). Pair the purge
    * with the corpus delete itself; admission decisions that historical
    * deltas made against the doc are history, not index state.
    */
  def deleteFromMinHashIndex(
      index: DataFrame,
      deletedIds: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    index.join(deletedIds.select(col(idCol)).distinct(), Seq(idCol), "left_anti")

  /** Cross-source duplication matrix — the curation diagnostic that
    * answers "which sources overlap": near-dup pairs (from any pair
    * operator) attributed to their unordered source pair with exact
    * counts. High off-diagonal mass means two feeds mirror each other
    * (crawl vs re-crawl, aggregator vs origin) and one should be
    * dropped or down-weighted BEFORE doc-level dedup burns compute on
    * it. Pair-table-sized work: two id joins against the (id, source)
    * projection and one ≤|sources|² count shuffle.
    */
  def sourceOverlapMatrix(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      srcCol: String = "source"): DataFrame = {
    val ids = docs.select(col(idCol), col(srcCol))
    pairs
      .join(ids.toDF("id_a", "__sa"), "id_a")
      .join(ids.toDF("id_b", "__sb"), "id_b")
      .select(
        least(col("__sa"), col("__sb")).as("source_a"),
        greatest(col("__sa"), col("__sb")).as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Pruned corpus read for [[dedupDeltaAgainstIndex]]: only
    * candidate-matched historical docs are re-tokenized for exact
    * verification. The persist is a deliberate optimizer BARRIER as
    * well as a reuse point: without it Catalyst elides the semi join
    * (the later verification joins subsume it logically) and the WHOLE
    * corpus would be tokenized first — correct, but the opposite of
    * the incremental cost model. ScaleSpec asserts the LeftSemi
    * survives in this subplan.
    */
  private[graft] def prunedCorpus(
      corpus: DataFrame, cand: DataFrame, idCol: String): DataFrame = {
    val neededIds = cand.select(col("id_a").as(idCol))
      .unionByName(cand.select(col("id_b").as(idCol))).distinct()
    Caches.persisted(corpus.join(neededIds, Seq(idCol), "left_semi"))
  }

  /** 64-bit SimHash near-dup. Each token votes ±1 on each bit of its
    * xxhash64; the signature takes the sign of each bit's sum. Candidate
    * generation splits the 64-bit signature into 4 16-bit chunks — by
    * pigeonhole, any pair within Hamming distance 3 shares at least one
    * chunk — so candidates come from an equi-join on (chunk_idx, chunk),
    * never a cross join. Output: (id_a, id_b, hamming ≤ maxHamming).
    */
  /** 64-bit SimHash signature per document: each token occurrence votes
    * ±1 on each bit of its token hash; the signature takes the sign of
    * each bit's sum. One shuffle (groupBy doc) with map-side partial
    * aggregation of the 64 bit-sums.
    *
    * @param portable when false (default) the token hash is `xxhash64`;
    *   when true it is [[graft.functions.rolling_hash]], whose fold any
    *   engine can replay byte-for-byte, putting the signatures under a
    *   cross-engine oracle (`graft.OracleSql.dedupSimhash`). The
    *   polynomial mixes short tokens less thoroughly than xxhash64 —
    *   keep the default for production quality.
    */
  def simHashSignatures(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      portable: Boolean = false): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val h = if (portable) rolling_hash(col("tok")) else xxhash64(col("tok"))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"bit$i"))
    toks
      .groupBy(idCol)
      .agg(bitSums.head, bitSums.tail: _*)
      .select(
        col(idCol),
        (0 until 64)
          .map(i => when(col(s"bit$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b))
          .as("simhash"))
  }

  def simHash(
      docs: DataFrame,
      maxHamming: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id",
      portable: Boolean = false): DataFrame = {
    // both sides of the chunk join derive from the signature table; the
    // 64-bit-sum aggregation would otherwise execute twice
    val sig = Caches.persisted(simHashSignatures(docs, textCol, idCol, portable))

    val chunks = sig.select(
      col(idCol),
      col("simhash"),
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("chunk_idx"),
          shiftright(col("simhash"), j * 16).bitwiseAND(lit(0xffffL)).as("chunk"))): _*))
        .as("cc"))
      .select(col(idCol), col("simhash"), col("cc.chunk_idx").as("chunk_idx"), col("cc.chunk").as("chunk"))

    chunks
      .toDF("id_a", "sim_a", "chunk_idx", "chunk")
      .join(chunks.toDF("id_b", "sim_b", "chunk_idx", "chunk"), Seq("chunk_idx", "chunk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Connected components over a near-dup pair list: assigns every doc
    * the smallest doc id reachable through pair edges (the canonical
    * survivor of its duplicate cluster). This is the step that turns
    * pairwise similarity into deduplication decisions.
    *
    * Iterative min-label propagation: each round joins labels across
    * edges and keeps the minimum; rounds needed = graph diameter
    * (near-dup clusters are small and dense, so a handful). Each round
    * is one shuffle on doc id; intermediate results are checkpointed to
    * cut the growing lineage — the standard Spark pattern for iterative
    * graph algorithms without GraphX.
    *
    * @param reliableCheckpoints when true, iterations use reliable
    *   `checkpoint()` (requires `spark.sparkContext.setCheckpointDir`) so
    *   an executor loss mid-run recovers from the checkpoint store; the
    *   default uses executor-local checkpoints — faster, but a lost
    *   executor fails the job (fine locally and for jobs cheap to rerun).
    * @return (doc_id, cluster_id) for every doc appearing in `pairs`;
    *         docs with no edges are their own cluster and are omitted.
    */
  def dedupClusters(
      pairs: DataFrame,
      maxIterations: Int = 50,
      reliableCheckpoints: Boolean = false): DataFrame = {
    def materialize(df: DataFrame): DataFrame =
      if (reliableCheckpoints) df.checkpoint(true) else df.localCheckpoint(true)
    // bidirectional edge list in ONE pass over the pair pipeline: each
    // pair row explodes into both directions (a union of two selects
    // would execute the upstream gram joins twice), materialized once so
    // iterations and convergence checks never re-run it
    val edges = materialize(pairs
      .select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct())
    // labels only ever decrease, so the label sum is a strictly
    // decreasing convergence measure. It rides each checkpoint's
    // materialization job as an observed metric — zero extra actions
    // per round.
    def checkpointWithSum(df: DataFrame): (DataFrame, Option[Long]) = {
      val obs = org.apache.spark.sql.Observation()
      val ck = materialize(df.observe(obs, sum(col("cluster_id")).as("s")))
      (ck, Option(obs.get("s")).map(_.asInstanceOf[Long]))
    }
    // seed each node with the min over itself and its direct neighbors —
    // one aggregation over the edge list, equivalent to a free first
    // propagation round (edges are bidirectional, so min(src) per dst
    // covers the whole neighborhood)
    val (labels0, firstSum) = checkpointWithSum(
      edges
        .groupBy(col("dst").as("doc_id"))
        .agg(least(min(col("src")), col("dst")).as("cluster_id")))
    var labels = labels0
    if (firstSum.isEmpty) return labels // no pairs -> no clusters
    var prevSum = firstSum.get
    var converged = false
    var i = 0
    // one min-label propagation step: each node takes the min over its
    // own label and its neighbors' labels
    def propagate(ls: DataFrame): DataFrame = {
      val viaEdges = edges
        .join(ls.withColumnRenamed("doc_id", "src"), "src")
        .groupBy(col("dst").as("doc_id"))
        .agg(min(col("cluster_id")).as("nbr_min"))
      ls.join(viaEdges, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"))
    }
    while (!converged && i < maxIterations) {
      // two propagation steps per materialization: the checkpoint action
      // dominates round cost at the small end, and a deeper lazy plan
      // between checkpoints is free
      val prev = labels
      val propagated = propagate(propagate(labels))
      // pointer jumping (take my label's label) makes a chain of length n
      // converge in O(log n) rounds instead of O(n) — but it costs an
      // extra join per round, and near-dup clusters are usually dense
      // with diameter ≤ 2. Engage it only once plain propagation hasn't
      // converged within the first round (i.e. a long-chain component
      // exists).
      val jumped =
        if (i < 1) propagated
        else {
          val mapping = propagated.select(col("doc_id").as("m_id"), col("cluster_id").as("m_cl"))
          propagated.join(mapping, col("cluster_id") === col("m_id"), "left")
            .select(col("doc_id"),
              least(col("cluster_id"), coalesce(col("m_cl"), col("cluster_id")))
                .as("cluster_id"))
        }
      val (next, sumOpt) = checkpointWithSum(jumped)
      val nextSum = sumOpt.get
      labels = next
      // the new checkpoint's lineage is cut, so the previous round's
      // materialized blocks are unreferenced — free them NOW instead of
      // letting every round's blocks pile up in the block manager for
      // the life of the session (a long suite run measurably slows as
      // leaked checkpoint blocks force eviction churn)
      prev.unpersist(false)
      converged = nextSum == prevSum
      prevSum = nextSum
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"dedupClusters did not converge in $maxIterations rounds — " +
          "raise maxIterations (component diameter exceeds 2^rounds)")
    labels
  }

  /** The keep-decision that closes the dedup loop: given the corpus and
    * a `(doc_id, cluster_id)` near-dup clustering (from
    * [[dedupClusters]]), keep exactly ONE representative per cluster —
    * the row maximizing `(scoreCol, then smallest id)`, so "best copy
    * wins, ties stable" — and every unclustered document. Emits the
    * full corpus as `(doc_id, cluster_id, keep_flag)`: downstream
    * filters on `keep_flag = 1`, audits read the rest.
    *
    * Shape at scale: the cluster table is pair-derived (tiny next to
    * the corpus); scoring joins it to the corpus on the doc key, the
    * representative window partitions by cluster (group size = cluster
    * size, bounded by dedup radius), and one left join on the doc key
    * flags the corpus. No corpus-sized window, no skew beyond cluster
    * size.
    */
  def keepListFromClusters(
      docs: DataFrame,
      clusters: DataFrame,
      scoreCol: String = "n_chars",
      idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col(scoreCol).desc, col(idCol))
    val flagged = clusters
      .join(docs.select(col(idCol), col(scoreCol)), idCol)
      .withColumn("__rn", row_number().over(w))
      .select(col(idCol), col("cluster_id"),
        when(col("__rn") === 1, lit(1)).otherwise(lit(0)).as("keep_flag"))
    docs.select(col(idCol))
      .join(flagged, Seq(idCol), "left")
      .select(col(idCol), col("cluster_id"),
        coalesce(col("keep_flag"), lit(1)).as("keep_flag"))
  }

  /** Exact repeated-span excision — substring-level deduplication.
    * Doc-level dedup (all the operators above) drops whole documents;
    * this operator cuts the REPEATED PART out of otherwise-distinct
    * documents: every `window`-token span whose exact text occurs more
    * than once in the corpus (boilerplate headers, license blocks,
    * quoted passages) is removed from every occurrence except the
    * globally first one, and each document is reassembled from its
    * surviving tokens. Token-granularity form of the exact substring
    * deduplication used by large-corpus curation pipelines
    * (suffix-array ES dedup), re-expressed as keyed shuffles.
    *
    * Algorithm — all DataFrame ops, no driver loops:
    *   1. stride-1 spans: `(doc, pos, span_text)`, generated map-side
    *      from the materialized token array (slice + array_join are
    *      codegen'd, not lambda HOFs);
    *   2. group by span key → spans seen ≥2× keep their first
    *      occurrence ordinal (`min(doc·2³² + pos)`, one integer — no
    *      struct shuffle);
    *   3. every non-first occurrence explodes into its `window`
    *      covered positions (a trickle — only repeated spans survive
    *      step 2's filter);
    *   4. anti-join the token table on `(doc, pos)`, then ordered
    *      reassembly (`listagg WITHIN GROUP` — `collect_list` order is
    *      partition-dependent) against the full document spine, so
    *      fully-excised docs emit with `n_kept = 0` rather than
    *      vanishing.
    *
    * Overlapping repeated spans union their covered positions, so a
    * shared run of L ≥ window tokens is excised exactly (its L−window+1
    * spans cover positions 0..L−1 of the run).
    *
    * At 100 TB the span-key shuffle dominates; `hashSpans = true` keys
    * step 2 by the 64-bit [[graft.functions.rolling_hash]] of the span
    * instead of its text (8-byte shuffle keys). The gated query runs
    * the raw-text keys — exact by construction and replayed verbatim by
    * the DuckDB oracle; DedupSpec pins hashed == raw on the fixture.
    *
    * @return (doc_id, n_tokens, n_kept, clean_md5): original and
    *         surviving token counts plus the md5 of the reassembled
    *         text ('' when everything was excised).
    */
  def exciseRepeatedSpans(
      docs: DataFrame,
      window: Int = 10,
      hashSpans: Boolean = false,
      textCol: String = "text",
      idCol: String = "doc_id",
      emitText: Boolean = false): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val toks = Caches.persisted(
      docs.select(col(idCol), tokens(col(textCol)).as("__toks")))
    // positions 0..n-window: posexplode a prefix slice of the token
    // array (the exploded token itself is discarded — only `pos` and
    // the array survive to the span projection)
    val spans = toks
      .select(col(idCol), col("__toks"),
        posexplode(slice(col("__toks"), lit(1),
          greatest(size(col("__toks")) - (window - 1), lit(0)))).as(Seq("pos", "__t0")))
      .select(col(idCol), col("pos"),
        array_join(slice(col("__toks"), col("pos") + 1, lit(window)), " ").as("span"))
    val keyed = spans.select(col(idCol), col("pos"),
      (if (hashSpans) rolling_hash(col("span")) else col("span")).as("__k"))
    val ord = col(idCol) * lit(4294967296L) + col("pos")
    val repeated = keyed
      .groupBy("__k")
      .agg(min(ord).as("first_ord"), count(lit(1)).as("__n"))
      .where(col("__n") >= 2)
      .select("__k", "first_ord")
    val marked = keyed
      .join(repeated, "__k")
      .where(ord =!= col("first_ord"))
      .select(col(idCol), col("pos"))
    val covered = marked
      .select(col(idCol), explode(sequence(col("pos"), col("pos") + (window - 1))).as("pos"))
      .distinct()
    val kept = toks
      .select(col(idCol), posexplode(col("__toks")).as(Seq("pos", "tok")))
      .join(covered, Seq(idCol, "pos"), "left_anti")
    val clean = kept
      .groupBy(idCol)
      .agg(count(lit(1)).cast("int").as("n_kept"),
        expr("listagg(tok, ' ') WITHIN GROUP (ORDER BY pos)").as("__ct"))
    val out = toks.select(col(idCol), size(col("__toks")).as("n_tokens"))
      .join(clean, Seq(idCol), "left")
    val base = Seq(col(idCol), col("n_tokens"),
      coalesce(col("n_kept"), lit(0)).as("n_kept"),
      md5(coalesce(col("__ct"), lit(""))).as("clean_md5"))
    // emitText: the reassembled document itself, for pipelines that
    // keep processing the cleaned corpus (the md5 stays for the gate)
    out.select(
      (if (emitText) base :+ coalesce(col("__ct"), lit("")).as("clean_text")
       else base): _*)
  }

  /** Embedding-cosine near-dup, exact pairwise. Norms are precomputed
    * once per row so the O(n²/2) pair scan only evaluates the codegen'd
    * FloatVecDot. This variant is oracle-exact; at 100 TB-scale use the
    * LSH-bucketed variant in [[Similarity]] for candidate generation.
    * Output: (id_a, id_b) with cosine ≥ threshold.
    */
  def embeddingNearDup(
      emb: DataFrame,
      threshold: Double,
      vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val withNorm = emb.select(
      col(idCol),
      col(vecCol),
      sqrt(vec_dot(col(vecCol), col(vecCol))).as("norm"))
    val a = withNorm.toDF("id_a", "vec_a", "norm_a")
    val b = withNorm.toDF("id_b", "vec_b", "norm_b")
    a.crossJoin(b)
      .where(col("id_a") < col("id_b"))
      .where(vec_dot(col("vec_a"), col("vec_b")) >= lit(threshold) * col("norm_a") * col("norm_b"))
      .select("id_a", "id_b")
  }

  /** Embedding near-dup at scale: sign-random-projection LSH buckets
    * replace the O(n²) cross join of [[embeddingNearDup]]. Candidates
    * are pairs whose bucket ids differ in at most one bit (multi-probe:
    * side a explodes into its bucket plus every 1-bit flip), generated
    * by an equi-join on the bucket key; each candidate is then verified
    * with the exact double-precision cosine, so every emitted pair
    * truly clears `threshold` — recall is approximate, precision exact.
    *
    * Shuffle volume is the bucket collision volume, not n²/2: at 100 TB
    * this is the production tier, with [[embeddingNearDup]] as its
    * verification oracle on samples. Planes are seeded constants, so
    * the whole pipeline (bucketing included) is deterministic and
    * replayed bit-for-bit by the DuckDB oracle
    * (`graft.OracleSql.dedupEmbedLsh`).
    */
  def embeddingNearDupLsh(
      emb: DataFrame,
      threshold: Double,
      numPlanes: Int = 8,
      dim: Int = 64,
      seed: Long = 42L,
      vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val planes = Similarity.hyperplanes(numPlanes, dim, seed)
    // feeds the probe side, the bucket side, and both verify joins
    val n = Caches.persisted(emb.select(
      col(idCol),
      col(vecCol),
      sqrt(vec_dot(col(vecCol), col(vecCol))).as("norm"),
      Similarity.lshBucket(col(vecCol), planes).as("bucket")))
    val probes = explode(array(
      (col("bucket") +: (0 until numPlanes).map(i =>
        col("bucket").bitwiseXOR(shiftleft(lit(1L), i)))): _*))
    val a = n.select(col(idCol).as("id_a"), probes.as("bucket"))
    val b = n.select(col(idCol).as("id_b"), col("bucket"))
    val cand = a.join(b, "bucket")
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct() // a pair can collide in several probe buckets
    val va = n.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"), col("norm").as("norm_a"))
    val vb = n.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"), col("norm").as("norm_b"))
    cand.join(va, "id_a").join(vb, "id_b")
      .where(vec_dot(col("vec_a"), col("vec_b")) >= lit(threshold) * col("norm_a") * col("norm_b"))
      .select("id_a", "id_b")
  }

  /** Embedding near-dup, cluster-bucketed (the SemDeDup shape): corpus
    * vectors are k-means-clustered ([[Similarity.kmeansCentroids]] —
    * deterministic distributed Lloyd over seeded picks) and ONLY
    * within-cell pairs are scored with the exact double-precision
    * cosine. The third tier of the embedding-dedup family:
    *
    *   - [[embeddingNearDup]] — exact O(n²), the oracle;
    *   - [[embeddingNearDupLsh]] — hyperplane buckets, data-oblivious;
    *   - this — data-ADAPTIVE buckets: cells follow the corpus
    *     geometry, so near-dups co-locate with far fewer buckets than
    *     sign projections need on clustered corpora.
    *
    * Pair volume is Σ|cell|²/2, not n²/2 — with balanced cells an
    * n/numCentroids-fold reduction; hot cells split by raising
    * `numCentroids` (√n rule of thumb) or re-clustering within a cell.
    * Precision is exact (every emitted pair clears `threshold`); recall
    * misses only cross-cell pairs, the quantity SemDeDup trades. All
    * constants are seeded/fixed-point, so the DuckDB oracle replays the
    * whole pipeline bit-for-bit (`graft.OracleSql.dedupEmbedClustered`).
    */
  def embeddingNearDupClustered(
      emb: DataFrame,
      threshold: Double,
      numCentroids: Int = 8,
      refineIters: Int = 2,
      seed: Long = 42L,
      vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val n = Caches.persisted(Similarity.withNorm(emb, vecCol, idCol))
    val seeded = Similarity.seedCentroids(n, numCentroids, seed, vecCol, idCol)
    val cents =
      if (refineIters <= 0) seeded
      else Similarity.kmeansCentroids(emb, seeded, refineIters, vecCol)
    val cells = Similarity.assignCells(n, cents, vecCol, idCol)
    val a = cells.toDF("id_a", "vec_a", "norm_a", "cell")
    val b = cells.toDF("id_b", "vec_b", "norm_b", "cell")
    a.join(b, "cell")
      .where(col("id_a") < col("id_b"))
      .where(vec_dot(col("vec_a"), col("vec_b")) >= lit(threshold) * col("norm_a") * col("norm_b"))
      .select("id_a", "id_b")
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003
    * — the MOSS document-fingerprinting algorithm): hash every k-token
    * gram, slide a window of `w` consecutive gram hashes, and select
    * each window's minimum (rightmost on ties). The selection
    * guarantee: any match of at least w+k−1 consecutive tokens between
    * two documents shares at least one selected fingerprint, while the
    * stored density is ~2/(w+1) of all grams — position-aware local
    * match detection (where MinHash sketches whole-doc similarity and
    * loses locality).
    *
    * Hashes are the portable rolling-hash → MixHash32 pipeline, so the
    * whole selection — including tie-direction — replays bit-for-bit
    * in the DuckDB oracle ([[graft.OracleSql.winnowCtes]]).
    *
    * Output: (idCol, pos, fp) — distinct selected fingerprints with the
    * 0-based gram position; docs shorter than k tokens emit nothing,
    * docs with fewer than w grams winnow over one all-grams window.
    *
    * Shape at 100 TB: gram hashing AND window selection are per-doc
    * array transforms inside one codegen projection — ZERO shuffles
    * until the output itself is aggregated; reduce volume is the
    * selected-fingerprint stream (~2/(w+1) of token volume).
    */
  def winnowFingerprints(
      docs: DataFrame,
      k: Int = 4,
      w: Int = 4,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(k >= 1 && w >= 1)
    // drop empty tokens (empty-text degenerate) so gram positions match
    // the filtered token stream every other text operator sees.
    //
    // The token and gram arrays are BOUND AS COLUMNS, not inlined into
    // the downstream lambdas: higher-order functions evaluate
    // interpreted, so an inline `grams` subtree referenced from inside
    // the per-window lambda would be RE-EVALUATED once per window —
    // O(n²·k) per document (measured: one sf0.1 bench task spun for
    // 20+ minutes). As multi-referenced non-trivial aliases they
    // survive CollapseProject, so each array is computed once per row
    // and every window reads the attribute in O(1).
    val toks = filter(tokens(col(textCol)), t => t =!= "")
    val bound = docs
      .withColumn("__toks", toks)
      .filter(size(col("__toks")) >= k)
      .withColumn("__grams", transform(
        sequence(lit(0), size(col("__toks")) - k),
        i => graft.functions.mixed_hash32(
          concat_ws(" ", slice(col("__toks"), i + 1, lit(k))))))
    // rightmost-min selection per window of we = min(w, |grams|)
    val g = col("__grams")
    val we = least(lit(w), size(g))
    val sel = transform(sequence(lit(0), size(g) - we),
      j => {
        val win = slice(g, j + 1, we)
        val m = array_min(win)
        // rightmost occurrence: first position in the reversed window
        struct((j + we - array_position(reverse(win), m)).cast("int").as("pos"),
          m.as("fp"))
      })
    bound
      .select(col(idCol), explode(array_distinct(sel)).as("s"))
      .select(col(idCol), col("s.pos").as("pos"), col("s.fp").as("fp"))
  }

  /** Near-dup candidate pairs from shared winnowing fingerprints:
    * docs sharing ≥ `minShared` selected fingerprints, with the shared
    * count. Same single-shuffle inverted-index shape as the gram
    * scans; `maxFpDf` drops boilerplate fingerprints shared by more
    * than that many docs before the doc-list expansion (the skew cap —
    * default exact).
    */
  def winnowPairs(
      docs: DataFrame,
      k: Int = 4,
      w: Int = 4,
      minShared: Int = 2,
      maxFpDf: Int = Int.MaxValue,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val fps = winnowFingerprints(docs, k, w, textCol, idCol)
      .select(col(idCol), col("fp")).distinct()
      .withColumnRenamed("fp", "gram")
    gramOverlaps(fps, idCol, maxFpDf)
      .where(col("inter") >= minShared)
      .withColumnRenamed("inter", "n_shared")
  }

  /** Golden-record consensus — the step AFTER linkage: every cluster of
    * matched records (from [[dedupClusters]], [[exact]] groups, or any
    * blocking+verify pass) is collapsed to ONE canonical row whose
    * attributes are the per-attribute MAJORITY among the cluster's
    * non-null values. Survivorship is deterministic: highest count
    * wins, count ties break to the lexicographically smallest value
    * (compared as the values' STRING rendering — the one ordering
    * every engine agrees on), and an attribute null in every member
    * stays null. `canonical_id` is the cluster's smallest member id,
    * the same survivor rule the dedup operators use.
    *
    * Attributes must be atomic types (string/numeric/date/timestamp/
    * boolean — enforced); the consensus is computed over their string
    * rendering and CAST BACK, so surviving values come home under
    * their original names AND original types.
    *
    * Shape at scale: the rows are unpivoted to (cluster, attr, value)
    * — ×|attrs|, but attrs is a fixed small list — then ONE combinable
    * count shuffle keyed by (cluster, attr, value); the majority pick
    * is a window over the COUNT table (|distinct values per attr per
    * cluster| rows, not corpus rows); the pivot back emits |clusters|
    * rows. The corpus is scanned once and never re-shuffled at full
    * width.
    */
  def goldenRecords(
      clustered: DataFrame,
      clusterCol: String,
      idCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "need at least one attribute to survive")
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    attrCols.foreach { c =>
      clustered.schema(c).dataType match {
        case _: ArrayType | _: MapType | _: StructType =>
          throw new IllegalArgumentException(
            s"goldenRecords: attribute '$c' is a nested type — string " +
              "consensus cannot round-trip it; project a scalar first")
        case _ => ()
      }
    }
    // names are interpolated into SQL: quote the identifier (backticks,
    // doubled inside) and escape the label literal, so an attr named
    // with quotes/backticks cannot break or inject the expression
    def ident(c: String) = "`" + c.replace("`", "``") + "`"
    def label(c: String) = "'" + c.replace("'", "''") + "'"
    val stackArgs = attrCols
      .map(c => s"${label(c)}, CAST(${ident(c)} AS STRING)")
      .mkString(", ")
    val long = clustered.select(
      col(clusterCol),
      expr(s"stack(${attrCols.size}, $stackArgs) AS (__attr, __value)"))
      .filter(col("__value").isNotNull)
    val wins = Window.partitionBy(col(clusterCol), col("__attr"))
      .orderBy(col("__n").desc, col("__value"))
    val majorities = long
      .groupBy(col(clusterCol), col("__attr"), col("__value"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__rn", row_number().over(wins))
      .filter(col("__rn") === 1)
      .groupBy(col(clusterCol))
      .pivot("__attr", attrCols)
      .agg(first(col("__value")))
    val canon = clustered.groupBy(col(clusterCol))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_members"))
    canon.join(majorities, Seq(clusterCol), "left")
      .select(col(clusterCol) +: col("canonical_id") +: col("n_members") +:
        // the pivot emitted strings; restore each attr's input type
        attrCols.map(c =>
          col(c).cast(clustered.schema(c).dataType).as(c)): _*)
  }
}
