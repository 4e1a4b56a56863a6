package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.{mixed_hash32, occurrences, rolling_hash, tokens}

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token statistics, and content fingerprinting.
  *
  * Every operator is a narrow (shuffle-free) projection over the
  * documents table — built-in string expressions only, fully inside
  * whole-stage codegen — so they parallelize embarrassingly at 100 TB.
  * All scores are exact integers (occurrence counts via literal replace
  * arithmetic) so results are engine-reproducible; ratios are left to the
  * consumer to avoid float-boundary nondeterminism.
  */
object TextAnalysis {

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "fr" -> Seq("le", "la", "les", "des", "une"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  val langOrder = Seq("en", "es", "de", "fr", "zh")

  private def padded(text: Column): Column =
    concat(lit(" "), lower(trim(text)), lit(" "))

  private def langScore(text: Column, lang: String): Column =
    stopwords(lang).map(w => occurrences(padded(text), s" $w ")).reduce(_ + _)

  /** N-gram/stopword-heuristic language ID: score = total occurrences of
    * each language's marker words; prediction = argmax with a fixed
    * precedence order (en > es > de > fr > zh) as the deterministic
    * tie-break.
    */
  def langId(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val scores = langOrder.map(l => langScore(col(textCol), l).as(s"score_$l"))
    val scored = docs.select((col(idCol) +: col("lang") +: scores): _*)
    val mx = greatest(langOrder.map(l => col(s"score_$l")): _*)
    val pred = langOrder.init.foldRight(lit(langOrder.last): Column) {
      case (l, elseCol) => when(col(s"score_$l") === mx, lit(l)).otherwise(elseCol)
    }
    scored.select(col(idCol), col("lang"), pred.as("pred_lang"))
  }

  /** Integer quality signals: character count, token count, punctuation
    * hits ('.' + ','), stopword hits (' the ' + ' a ' occurrences).
    */
  def qualitySignals(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      length(col(textCol)).as("n_chars_measured"),
      size(tokens(col(textCol))).as("n_tokens"),
      (occurrences(col(textCol), ".") + occurrences(col(textCol), ",")).as("punct_hits"),
      (occurrences(padded(col(textCol)), " the ") + occurrences(padded(col(textCol)), " a "))
        .as("stopword_hits"))

  /** Composite quality score — the single calibrated number downstream
    * mixers sort by, fused from three cheap monotone signals: token
    * count (substance), distinct-token share (lexical diversity — the
    * inverse of degenerate repetition), and stopword share (natural
    * prose rather than keyword lists, the C4 heuristic). Each signal
    * is min-max normalized over the corpus to exact integer ppm
    * (`(x − min)·10⁶ div (max − min)`, constant-signal guard → 0) and
    * the composite is their floor-divided mean — deterministic,
    * engine-replayable, no floats.
    *
    * Shape at scale: signals are a zero-shuffle codegen projection;
    * the normalization constants are ONE tiny min/max aggregate
    * broadcast back; the corpus is scanned once and never shuffled.
    * (Rank-based fusion would need corpus-wide windows — this
    * formulation deliberately avoids them.)
    */
  def compositeQuality(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val sig = docs.select(
        col(idCol),
        size(tokens(col(textCol))).cast("long").as("__len"),
        size(array_distinct(tokens(col(textCol)))).cast("long").as("__dis"),
        (occurrences(padded(col(textCol)), " the ") +
          occurrences(padded(col(textCol)), " a ")).cast("long").as("__hits"))
      .select(col(idCol), col("__len"),
        expr("__dis * 1000000 div __len").as("__div"),
        expr("__hits * 1000000 div __len").as("__stop"))
    val bounds = sig.agg(
      min(col("__len")).as("__len_min"), max(col("__len")).as("__len_max"),
      min(col("__div")).as("__div_min"), max(col("__div")).as("__div_max"),
      min(col("__stop")).as("__stop_min"), max(col("__stop")).as("__stop_max"))
    def norm(c: String): org.apache.spark.sql.Column =
      when(col(s"${c}_max") === col(s"${c}_min"), lit(0L))
        .otherwise(expr(s"($c - ${c}_min) * 1000000 div (${c}_max - ${c}_min)"))
    sig.crossJoin(broadcast(bounds))
      .select(col(idCol),
        norm("__len").as("len_norm_ppm"),
        norm("__div").as("div_norm_ppm"),
        norm("__stop").as("stop_norm_ppm"))
      .withColumn("composite_ppm",
        expr("(len_norm_ppm + div_norm_ppm + stop_norm_ppm) div 3"))
  }

  /** Deflate compression ratio per document — the Gopher-family
    * quality signal the ratio-of-counts heuristics approximate:
    * heavily repetitive or templated text compresses far below prose.
    * Emits `(id, n_bytes, n_deflated, ratio_ppm)` with `ratio_ppm =
    * n_deflated·10⁶ div n_bytes` (small = redundant).
    *
    * Runs at the codec boundary like the multimodal decoders: ONE
    * `Deflater` per partition, reset between documents, streaming
    * iterator — zlib is a native-buffer machine you construct once,
    * not per row. Deflate output length is deterministic for a fixed
    * level and input, but it is a JVM-library artifact, not portable
    * SQL — so this signal is spec-gated (like the decoders), not
    * DuckDB-oracled; the ordering it induces is what downstream
    * filters consume.
    */
  def compressionSignals(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      level: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val out = docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(level)
        val buf = new Array[Byte](64 * 1024)
        it.map { case (id, text) =>
          val in = if (text == null) Array.empty[Byte] else text.getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(in)
          deflater.finish()
          var n = 0L
          while (!deflater.finished()) n += deflater.deflate(buf)
          (id, in.length.toLong, n)
        }
      }
    out.toDF(idCol, "n_bytes", "n_deflated")
      .withColumn("ratio_ppm",
        expr("CASE WHEN n_bytes = 0 THEN 0 ELSE n_deflated * 1000000 div n_bytes END"))
  }

  /** Token statistics: total and distinct token counts per document. */
  def tokenStats(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      size(tokens(col(textCol))).as("n_tokens"),
      size(array_distinct(tokens(col(textCol)))).as("n_distinct_tokens"))

  /** Content fingerprint: md5 of the whitespace-collapsed, lowercased,
    * trimmed text — the canonical key for exact dedup across formatting
    * variants.
    */
  def fingerprint(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      md5(regexp_replace(lower(trim(col(textCol))), "\\s+", " ")).as("fingerprint"))

  /** Rolling-hash fingerprint (codegen'd 64-bit polynomial hash over the
    * normalized text) — cheaper than md5 per byte, and the primitive a
    * shingling pipeline composes chunk-wise.
    */
  def rollingFingerprint(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      rolling_hash(regexp_replace(lower(trim(col(textCol))), "\\s+", " "))
        .as("rolling_fp"))

  /** PII patterns, written in the common subset of Java regex (Spark)
    * and RE2 (DuckDB, Go, C++ engines): character classes, bounded
    * repetition, ASCII `\b` — no lookaround, no backreferences — so the
    * exact same pattern string runs on every engine a pipeline spans.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val phonePattern = "\\b[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}\\b"
  val longNumPattern = "\\b[0-9]{9,}\\b"

  /** PII redaction — the scrub pass a training corpus gets before
    * anything else sees it. Emails, IPv4 addresses, phone numbers, and
    * long digit runs (IDs, account numbers) are replaced by typed
    * placeholder tags; per-category match counts ride along so the
    * yield of the scrub is observable per document.
    *
    * Counts are taken on the ORIGINAL text (the categories cannot
    * overlap: `\b` never splits adjacent word characters, so a digit
    * run inside an email local-part is not a separate long-number hit).
    * Replacement order matters only for nested shapes — email first so
    * its digits are gone before the looser numeric patterns run.
    *
    * Shuffle-free narrow projection; regexes are fixed literals so the
    * whole operator compiles into one codegen stage.
    */
  def redactPii(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    def n(pat: String) = size(regexp_extract_all(col(textCol), lit(pat), lit(0)))
    val redacted = Seq(
      emailPattern -> "<EMAIL>",
      ipv4Pattern -> "<IP>",
      phonePattern -> "<PHONE>",
      longNumPattern -> "<NUM>"
    ).foldLeft(col(textCol)) { case (c, (pat, tag)) => regexp_replace(c, lit(pat), lit(tag)) }
    docs.select(
      col(idCol),
      n(emailPattern).as("n_emails"),
      n(ipv4Pattern).as("n_ipv4"),
      n(phonePattern).as("n_phones"),
      n(longNumPattern).as("n_longnums"),
      redacted.as("redacted"))
  }

  /** Per-document repetition signals — the Gopher-style quality filter
    * inputs: total/distinct token counts, the count of the most frequent
    * token, and the count of the most frequent bigram. High
    * top-token/top-bigram mass flags boilerplate and degenerate
    * repetition that perplexity filters miss.
    *
    * Shape at scale: ONE posexplode pass feeds both aggregations;
    * bigrams come from a `lead` window over (doc, pos) — codegen'd,
    * no higher-order functions (an array-side `transform` runs its
    * lambda interpreted and was 20× slower here). Count by
    * `(doc, term)` is partial-aggregatable (map-side combine collapses
    * each document's repeats before the shuffle); the window, both
    * rollups, and the final join all hash on `doc_id`, so one logical
    * key partitioning serves the whole plan.
    */
  def repetitionSignals(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      includeBigrams: Boolean = true): DataFrame = {
    val exploded =
      docs.select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("__pos", "__tok")))
    val tokAgg = exploded
      .groupBy(col(idCol), col("__tok")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(
        sum("__c").cast("int").as("n_tokens"),
        count(lit(1)).cast("int").as("n_distinct_tokens"),
        max("__c").cast("int").as("top_token_count"))
    // a consumer that only gates on token stats skips the bigram
    // window+aggs entirely — Catalyst cannot prune them itself (a join
    // may change multiplicity, so the unused branch would still run)
    if (!includeBigrams) return tokAgg
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__pos"))
    val gramAgg = exploded
      .withColumn("__nxt", lead(col("__tok"), 1).over(w))
      .filter(col("__nxt").isNotNull)
      .select(col(idCol), concat_ws(" ", col("__tok"), col("__nxt")).as("__g"))
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(max("__c").cast("int").as("top_bigram_count"))
    tokAgg.join(gramAgg, Seq(idCol), "left")
      .na.fill(0, Seq("top_bigram_count")) // a <2-token doc has no bigrams
  }

  /** Per-document bigram NOVELTY — the leave-one-out containment
    * signal: what fraction of a document's bigram occurrences appear in
    * NO other document. Novelty near zero flags boilerplate, template
    * spam, near-duplicates and benchmark contamination that token-level
    * repetition misses (every token can be common while the document is
    * still one-of-a-kind — and vice versa); a bigram is "novel" when
    * its corpus count equals its in-document count, i.e. every
    * occurrence lives here.
    *
    * Shape at scale: the same lead-window bigram pass as
    * [[repetitionSignals]] (codegen'd — no interpreted array lambdas),
    * then two COMBINABLE counts — (doc, bigram) and (bigram) — and one
    * join on the bigram key. Common bigrams are heavy as COUNTS, not
    * rows (map-side combine collapses repeats), so the join skew is the
    * keyed-count kind AQE splits. Docs with <2 tokens report zeros.
    */
  def bigramNovelty(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val exploded =
      docs.select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("__pos", "__tok")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__pos"))
    val dc = exploded
      .withColumn("__nxt", lead(col("__tok"), 1).over(w))
      .filter(col("__nxt").isNotNull)
      .select(col(idCol), concat_ws(" ", col("__tok"), col("__nxt")).as("__g"))
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__c"))
    val gc = dc.groupBy(col("__g")).agg(sum(col("__c")).as("__gct"))
    val agg = dc.join(gc, Seq("__g"))
      .groupBy(col(idCol))
      .agg(
        sum(col("__c")).as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"),
        sum(when(col("__gct") === col("__c"), col("__c")).otherwise(0L)).as("n_novel"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .na.fill(0L, Seq("n_bigrams", "n_distinct_bigrams", "n_novel"))
      .withColumn("novelty_ppm",
        when(col("n_bigrams") === 0L, 0L)
          .otherwise(expr("n_novel * 1000000L div n_bigrams")))
  }

  /** Corpus collocations: unordered token pairs co-occurring within
    * `window` positions, scored by the Dice coefficient — the phrase /
    * multi-word-expression miner (word2vec's co-occurrence table,
    * `New York`-style phrase detection, topic fingerprints). The score
    * is the exact integer `2·10⁶·n_pair div (n_a + n_b)` (ppm), so
    * ranking and ties are bit-identical across engines; ties break on
    * (token_a, token_b).
    *
    * Pair generation is entirely MAP-SIDE — a nested `transform` over
    * the token array pairs each position with the next `window`
    * positions in one codegen'd projection, so the only shuffles are
    * the two combinable counts (pairs, marginals). The naive
    * formulation — positions table self-joined on doc id with a band
    * predicate — shuffles the full position table twice and rediscovers
    * per-doc locality the array already has. Pair keys are canonical
    * (least, greatest); same-token pairs are excluded (repetition is
    * [[repetitionSignals]]' business).
    *
    * Shape at 100 TB: output of the pair expansion is ≤ window·tokens
    * rows feeding a partial-aggregated groupBy on (token_a, token_b) —
    * Zipf-bounded group count, no join until the ≤vocab² aggregate is
    * reduced. `minPairCount` prunes the long tail before the marginal
    * joins.
    */
  def collocations(
      docs: DataFrame,
      window: Int = 2,
      minPairCount: Long = 2,
      topK: Int = 50,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(window >= 1 && topK >= 1)
    val toks = docs.select(tokens(col(textCol)).as("__toks"))
    val pairs = toks
      .select(explode(flatten(transform(col("__toks"), (t, i) =>
        transform(slice(col("__toks"), i + lit(2), lit(window)), u =>
          struct(least(t, u).as("a"), greatest(t, u).as("b")))))).as("p"))
      .where(col("p.a") =!= col("p.b") && col("p.a") =!= "" && col("p.b") =!= "")
    val pairCounts = pairs
      .groupBy(col("p.a").as("token_a"), col("p.b").as("token_b"))
      .agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minPairCount)
    val marginals = toks
      .select(explode(col("__toks")).as("token"))
      .where(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
    pairCounts
      .join(marginals.toDF("token_a", "n_a"), "token_a")
      .join(marginals.toDF("token_b", "n_b"), "token_b")
      .withColumn("dice_ppm", expr("(2000000 * n_pair) div (n_a + n_b)"))
      .select("token_a", "token_b", "n_pair", "n_a", "n_b", "dice_ppm")
      .orderBy(col("dice_ppm").desc, col("token_a"), col("token_b"))
      .limit(topK)
  }

  /** Top distinctive terms per document — the TF-IDF shape with an
    * exact ordering: terms rank by `tf/df` (term frequency over corpus
    * document frequency), which orders identically to tf·idf for any
    * monotone idf and, being a ratio of small exact integers, computes
    * to the SAME double on every IEEE engine — no log in the sort key,
    * so the ranking is reproducible bit-for-bit. Ties break on
    * `(df, token)` for full determinism.
    *
    * Two aggregations, both partial-aggregatable: `(doc, term) → tf`
    * and `term → df`; df joins back by term, then one window per doc
    * picks the top `k`. The term-dictionary side is deliberately NOT
    * broadcast-hinted: a clean corpus has a small vocabulary, but at
    * web scale unique tokens (typos, ids) can reach billions — AQE
    * broadcasts when the built side is actually small and falls back
    * to a shuffle join when it isn't, whereas a hint would force an
    * OOM instead of a fallback.
    */
  def topDistinctiveTerms(
      docs: DataFrame,
      k: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val tf = toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")) // tf rows are distinct (doc, term)
      .agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
      .orderBy((col("tf").cast("double") / col("df")).desc, col("df"), col("token"))
    tf.join(df, Seq("token"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col(idCol), col("token"), col("tf").cast("int").as("tf"),
        col("df").cast("int").as("df"), col("__rk").as("rank"))
  }

  /** Per-SOURCE distinctive terms — the corpus-characterization shape
    * (c-TF-IDF / BERTopic-style): aggregate each source's token mass
    * and rank terms by `tf_source / n_sources_containing`, so a term
    * scores high when one source uses it heavily and few others use it
    * at all. The "what is each feed about" report behind mixture
    * design and source-level quality review.
    *
    * Same exact-ordering discipline as [[topDistinctiveTerms]]: the
    * sort key is a ratio of small exact integers (identical double on
    * every IEEE engine), ties break on `(n_sources, token)` — fully
    * deterministic. Shape: two combinable counts ((source, token) and
    * per-token source-df over the distinct pairs), one join, one
    * window per source over that source's vocabulary only.
    */
  def sourceDistinctiveTerms(
      docs: DataFrame,
      k: Int = 5,
      textCol: String = "text",
      srcCol: String = "source"): DataFrame = {
    require(k >= 1)
    val toks = docs.select(col(srcCol), explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val tf = toks.groupBy(col(srcCol), col("token")).agg(count(lit(1)).as("tf"))
    val sdf = tf.groupBy(col("token")).agg(count(lit(1)).as("n_sources"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(srcCol))
      .orderBy((col("tf").cast("double") / col("n_sources")).desc,
        col("n_sources"), col("token"))
    tf.join(sdf, Seq("token"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col(srcCol), col("token"), col("tf").cast("int").as("tf"),
        col("n_sources").cast("int").as("n_sources"), col("__rk").as("rank"))
  }

  /** Fixed-window document chunking — the sequence-prep step that cuts
    * each document into consecutive `chunkTokens`-token windows for
    * training (last chunk ragged). Emits
    * `(id, chunk_idx, n_chunk_tokens, chunk_text)`.
    *
    * Chunk membership is `pos / chunkTokens` — a pure function of the
    * token position, so chunk boundaries are deterministic on any
    * partitioning/engine. Reassembly uses `listagg ... WITHIN GROUP
    * (ORDER BY pos)` (Spark 4 / DuckDB `string_agg ... ORDER BY`):
    * an ORDERED aggregate, because `collect_list` order is
    * partition-dependent. One shuffle on `(doc, chunk)`; per-group
    * state is bounded by `chunkTokens`, so no group can outgrow a task
    * regardless of document length — long docs SPREAD over chunks
    * instead of hitting one reducer.
    */
  def chunkDocuments(
      docs: DataFrame,
      chunkTokens: Int = 512,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    docs.select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("__pos", "__tok")))
      .withColumn("chunk_idx", floor(col("__pos") / chunkTokens).cast("int"))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(
        count(lit(1)).cast("int").as("n_chunk_tokens"),
        expr("listagg(__tok, ' ') WITHIN GROUP (ORDER BY __pos)").as("chunk_text"))
  }

  /** Vocabulary coverage curve: for each candidate vocab size V (the
    * top-V tokens by corpus frequency, ties lexicographic), the
    * out-of-vocabulary token-occurrence share in exact integer ppm and
    * the count of OOV types — "how big must the tokenizer vocab be?"
    * answered as one table. The multi-size generalization of
    * [[oovRate]].
    *
    * Shape at scale: everything after the (token → count) aggregation
    * runs on the VOCABULARY table (|distinct tokens| rows — Zipf keeps
    * this millions, not corpus-sized); the global rank window over it
    * is the same deliberate vocabulary-sized single partition as
    * [[oovRate]]'s.
    */
  def vocabCoverageCurve(
      docs: DataFrame,
      sizes: Seq[Int],
      textCol: String = "text"): DataFrame = {
    require(sizes.nonEmpty, "need at least one vocab size")
    val counts = docs
      .select(explode(tokens(col(textCol))).as("__tok"))
      .where(col("__tok") =!= "")
      .groupBy("__tok").agg(count(lit(1)).as("__n"))
    val ranked = counts.withColumn("__rk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("__n").desc, col("__tok"))))
    val total = counts.agg(sum(col("__n")).as("__total"))
    ranked
      .crossJoin(broadcast(total))
      .withColumn("vocab_size", explode(typedLit(sizes)))
      .groupBy("vocab_size")
      .agg(
        sum(when(col("__rk") > col("vocab_size"), 1L).otherwise(0L))
          .as("n_oov_types"),
        sum(when(col("__rk") > col("vocab_size"), col("__n")).otherwise(0L))
          .as("__oov_occ"),
        first(col("__total")).as("__tot"))
      .select(col("vocab_size"), col("n_oov_types"),
        // exact integer ppm — floor division, engine-replayable
        expr("__oov_occ * 1000000 div __tot").as("oov_ppm"))
  }

  /** Sliding training windows: `windowTokens`-token chunks starting
    * every `stride` tokens — the overlapping-context form of
    * [[chunkDocuments]] (stride < window ⇒ consecutive windows share
    * `window − stride` tokens, the standard LM-pretraining layout that
    * keeps context across chunk boundaries). Only FULL windows are
    * emitted except the document's last window, which is kept ragged
    * so no trailing token is ever dropped (`stride ≥ 1`; stride =
    * window degenerates to non-overlapping chunking minus the
    * empty-tail case).
    *
    * Each token lands in at most `⌈window/stride⌉` windows — the
    * explode factor is a constant of the configuration, not of corpus
    * size; grouping state per (doc, window) is one window's tokens,
    * the same bound as [[chunkDocuments]].
    */
  def slidingWindows(
      docs: DataFrame,
      windowTokens: Int,
      stride: Int,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    require(stride >= 1 && stride <= windowTokens,
      "stride must be in [1, windowTokens]")
    val toks = docs.select(col(idCol), tokens(col(textCol)).as("__t"))
      .select(col(idCol), size(col("__t")).as("__n"),
        posexplode(col("__t")).as(Seq("__pos", "__tok")))
    // window w covers positions [w·stride, w·stride + window); token at
    // __pos belongs to windows max(0, ceil((pos−window+1)/stride)) ..
    // floor(pos/stride) — enumerate that constant-size range per token.
    // A window is emitted when it is full OR it is the doc's last
    // window start (covers the tail).
    // exact integer ceil: clamp the numerator to >= 0 first (the clamp
    // commutes with ceil-div for non-positive numerators), then
    // (x + stride − 1) div stride — no float division anywhere
    val wLo = expr(
      s"CAST((GREATEST(0, __pos - ${windowTokens - 1}) + ${stride - 1}) DIV $stride AS INT)")
    val wHi = expr(s"CAST(__pos DIV $stride AS INT)")
    val lastStart = expr(
      s"CAST((GREATEST(0, __n - $windowTokens) + ${stride - 1}) DIV $stride AS INT)")
    toks
      .withColumn("window_idx", explode(sequence(wLo, wHi)))
      .where(col("window_idx") <= lastStart)
      .groupBy(col(idCol), col("window_idx"))
      .agg(
        count(lit(1)).cast("int").as("n_window_tokens"),
        expr("listagg(__tok, ' ') WITHIN GROUP (ORDER BY __pos)").as("window_text"))
  }

  /** Domain-relevance scoring against a target lexicon — the signal
    * behind importance-resampled data selection (DSIR-style): documents
    * whose token mass overlaps a target-domain vocabulary are
    * up-weighted when assembling a training mix. Emits
    * `(id, n_tokens, n_relevant)` with `n_relevant` = occurrences of
    * lexicon tokens (with multiplicity) — an exact integer, so a
    * downstream [[Sampling.weightedKeep]] with `weightCol =
    * "n_relevant"` is deterministic and engine-replayable end to end.
    *
    * Shape at scale: tokens explode map-side and probe the BROADCAST
    * lexicon (any real lexicon is KBs–MBs); only matches — a trickle —
    * reach the per-doc count shuffle, and the doc spine joins the
    * counts back so zero-relevance docs survive with 0 rather than
    * vanishing.
    */
  def lexiconRelevance(
      docs: DataFrame,
      lexicon: Seq[String],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(lexicon.nonEmpty, "lexicon must not be empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val lex = broadcast(lexicon.distinct.toDF("tok"))
    val rel = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .join(lex, "tok")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_relevant"))
    docs.select(col(idCol), size(tokens(col(textCol))).as("n_tokens"))
      .join(rel, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"))
  }

  // normalization patterns -- plain character classes in the RE2/Java
  // common subset, so one pattern string runs on every engine; built
  // from \u escapes (the characters themselves are invisible or
  // easily-confused glyphs)
  val zeroWidthPattern = "[\u200B\u200C\u200D\uFEFF]"
  val controlPattern = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
  val singleQuotePattern = "[\u2018\u2019]"
  val doubleQuotePattern = "[\u201C\u201D]"
  val dashPattern = "[\u2013\u2014]"

  /** Canonical text normalization -- the first pass of corpus curation,
    * making byte-different but visually/semantically identical text
    * compare equal before any fingerprint, dedup, or tokenizer sees it:
    *
    *   1. Unicode NFC ([[graft.functions.nfc]], codegen'd native
    *      expression -- decomposed "e + combining acute" becomes the
    *      precomposed letter);
    *   2. zero-width characters (ZWSP/ZWNJ/ZWJ/BOM) removed;
    *   3. NBSP to space; curly quotes to ASCII quotes; en/em dash to "-";
    *   4. remaining C0 control characters removed (newline/tab fall
    *      under the whitespace collapse);
    *   5. whitespace runs collapsed to one space, ends trimmed.
    *
    * Zero shuffles -- one codegen'd projection; every pattern is a plain
    * character class, portable across regex engines. Emits per-doc raw
    * and normalized lengths so the scrub's effect is observable.
    */
  def normalizeText(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val norm =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(graft.functions.nfc(col(textCol)),
                  zeroWidthPattern, ""),
                "\u00A0", " "),
              singleQuotePattern, "'"),
            doubleQuotePattern, "\""),
          dashPattern, "-"),
        controlPattern, "")
    val collapsed = trim(regexp_replace(norm, "\\s+", " "))
    docs.select(
      col(idCol),
      length(col(textCol)).as("n_raw_chars"),
      length(collapsed).as("n_norm_chars"),
      collapsed.as("norm_text"))
  }

  /** Corpus bigram language-model statistics with Kneser-Ney
    * discounting — the classical data-driven scorer behind
    * perplexity-style quality filtering, computed entirely in exact
    * integer arithmetic so the probabilities replay bit-for-bit on any
    * engine.
    *
    * For each of the `topK` most frequent bigrams `(w1, w2)` emits the
    * raw count `c12`, the unigram context count `c1`, the KN
    * continuation inputs (`n_follow_types` = distinct successors of
    * w1, `n_prec_types` = distinct predecessors of w2), and the
    * interpolated KN probability as parts-per-million:
    *
    *   kn_ppm = ⌊(4·c12 − 3)·10⁶ / (4·c1)⌋
    *          + ⌊3·n_follow_types·n_prec_types·10⁶ / (4·c1·T)⌋
    *
    * i.e. discount d = 3/4 carried as an exact rational (numerators
    * ×4), continuation probability `n_prec_types / T` with T = total
    * distinct bigram types. Every division is a single integer floor —
    * no float ever enters, so two engines cannot round apart.
    *
    * Shape at 100 TB: bigrams come from one per-doc lead() window (doc
    * id is the partition key — no global sort); every aggregation is a
    * combinable count keyed by bigram or word; T rides a broadcast
    * 1-row aggregate instead of a driver action. The bigram-type table
    * is the largest intermediate — Zipf-bounded far below corpus size.
    */
  def bigramLmStats(
      docs: DataFrame,
      topK: Int = 50,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(topK >= 1)
    bigramLm(docBigrams(docs, textCol, idCol))
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Per-doc adjacent token pairs: (idCol, w1, w2). Adjacency is taken
    * on the ARRAY (slice + positional explode + element_at), never via
    * a lead() window: the window form exchanged and sorted the entire
    * exploded token stream per doc, where the array form is one
    * generator in the scan's codegen stage — row-identical output
    * (pairs of consecutive non-empty tokens in document order).
    */
  private def docBigrams(
      docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val ft = filter(tokens(col(textCol)), t => t =!= "")
    docs
      .select(col(idCol), ft.as("__ft"))
      .select(col(idCol), col("__ft"),
        posexplode(slice(col("__ft"), lit(1), greatest(size(col("__ft")) - 1, lit(0))))
          .as(Seq("__i", "w1")))
      .select(col(idCol), col("w1"),
        element_at(col("__ft"), col("__i") + 2).as("w2"))
  }

  /** The full (un-truncated) KN bigram LM table over a bigram stream —
    * see [[bigramLmStats]] for the arithmetic.
    */
  private def bigramLm(bigrams: DataFrame): DataFrame = {
    val bc = Caches.persisted(
      bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12")))
    val ctx = bc.groupBy("w1")
      .agg(sum("c12").as("c1"), count(lit(1)).as("n_follow_types"))
    val cont = bc.groupBy("w2").agg(count(lit(1)).as("n_prec_types"))
    val types = bc.agg(count(lit(1)).as("__t"))
    bc.join(ctx, "w1")
      .join(cont, "w2")
      .crossJoin(broadcast(types))
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        col("n_follow_types"), col("n_prec_types"),
        (expr("(4 * c12 - 3) * 1000000 div (4 * c1)") +
          expr("3 * n_follow_types * n_prec_types * 1000000 div (4 * c1 * __t)"))
          .as("kn_ppm"))
  }

  /** Per-document LM quality score: the occurrence-weighted mean KN
    * bigram probability (in ppm) of the doc's bigrams under the LM
    * trained on the WHOLE corpus — the CCNet/perplexity-filter shape
    * ("how typical is this document of the corpus"): gibberish, boiler-
    * plate-free spam, and wrong-language docs score low; fluent
    * in-distribution text scores high. The arithmetic mean of exact
    * integer ppm probabilities ranks the same direction as perplexity's
    * geometric mean while staying in integer arithmetic end-to-end —
    * bit-portable, no log, replayable in the oracle.
    *
    * Docs with fewer than two tokens have no bigrams and are omitted
    * (no evidence either way — gate them on length instead).
    *
    * Shape at 100 TB: the bigram stream is computed ONCE (persisted)
    * and feeds both the LM counts and the per-doc join; the LM table is
    * Zipf-bounded (bigram TYPES, not occurrences) and joins back by
    * (w1, w2); the final aggregate is a combinable per-doc sum/count.
    */
  def docLmScore(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val bg = Caches.persisted(docBigrams(docs, textCol, idCol))
    bg.join(bigramLm(bg.select("w1", "w2")).select("w1", "w2", "kn_ppm"),
        Seq("w1", "w2"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum("kn_ppm").as("sum_kn_ppm"))
      .withColumn("avg_kn_ppm", expr("sum_kn_ppm div n_bigrams"))
  }

  /** BPE-ish token count: letter runs, single digits, or single
    * punctuation marks — the pre-tokenizer shape GPT-style BPE vocabularies
    * assume, as a portable ASCII regex.
    */
  val bpeishPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  def bpeTokenCount(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      size(regexp_extract_all(col(textCol), lit(bpeishPattern), lit(0)))
        .as("n_bpeish_tokens"))

  /** Tokenizer fertility per source: BPE-ish tokens per whitespace
    * word, in exact integer ppm — the tokenizer-sizing signal a
    * multilingual pipeline watches (fertility ≫ 1e6 means the
    * tokenizer fragments that source's text; the standard argument for
    * growing the vocabulary or retraining merges on that slice). One
    * combinable aggregation; integer division of non-negative sums, so
    * the ratio hashes identically cross-engine.
    */
  def tokenFertility(
      docs: DataFrame,
      textCol: String = "text",
      srcCol: String = "source"): DataFrame =
    docs.select(col(srcCol),
        size(regexp_extract_all(col(textCol), lit(bpeishPattern), lit(0)))
          .cast("long").as("__bpe"),
        size(tokens(col(textCol))).cast("long").as("__w"))
      .groupBy(srcCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__bpe")).as("sum_bpe_tokens"),
        sum(col("__w")).as("sum_words"))
      .withColumn("fertility_ppm",
        expr("sum_bpe_tokens * 1000000 div sum_words"))

  /** BPE tokenizer training — the full greedy merge loop (Sennrich
    * 2016), not just one iteration: `rounds` times, count adjacent
    * symbol pairs across the corpus vocabulary (frequency-weighted),
    * pick the most frequent pair (ties to the lexicographically
    * smallest — deterministic), and fuse it corpus-wide. Emits the
    * learned merge table `(round, pair, n)` — the artifact a tokenizer
    * ships.
    *
    * Representation: a word's symbol sequence is a string with TWO
    * spaces between symbols and one at each edge, so applying a merge
    * is a literal `replace(" a  b ", " ab ")`: adjacent occurrences
    * share no characters (the boundary spaces are distinct), which
    * makes one left-to-right non-overlapping `replace` exactly the
    * greedy-left merge BPE specifies — engine-portable, since every
    * engine's `replace` scans left-to-right. (With single spaces,
    * "a b a b" would merge only once: the shared middle space is
    * consumed by the first match.)
    *
    * Shape at 100 TB: the corpus collapses ONCE into its word-type
    * table (one combinable shuffle — Zipf makes this tiny relative to
    * the corpus); each round is then a map-side pair explosion over
    * word TYPES, one combinable pair-count shuffle into ≤|vocab|²-ish
    * groups, an O(1) driver argmax (like the k-means centroid read),
    * and a narrow `replace` projection. Corpus size is paid once, not
    * per round — the classic distributed BPE-trainer shape.
    */
  def bpeTrainMerges(
      docs: DataFrame,
      rounds: Int,
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeTrain(docs, rounds, textCol)._2.toDF("round", "pair", "n")
  }

  /** The shared trainer loop: returns the final word table
    * `(w, s, f)` — word, its merged symbol string, corpus frequency —
    * plus the learned merges. [[bpeTrainMerges]] emits the merge
    * table; [[bpeEncodedCounts]] applies the word table back to the
    * corpus.
    */
  private def bpeTrain(
      docs: DataFrame,
      rounds: Int,
      textCol: String): (DataFrame, Seq[(Int, String, Long)]) = {
    require(rounds >= 1, "need at least one merge round")
    var cur = Caches.persisted(
      docs.select(explode(tokens(col(textCol))).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("f"))
        .select(col("w"),
          concat(lit(" "), array_join(split(col("w"), ""), "  "), lit(" ")).as("s"),
          col("f")))
    val merges = Seq.newBuilder[(Int, String, Long)]
    for (r <- 1 to rounds) {
      val pc = cur
        .select(col("f"),
          explode(graft.functions.wordNGrams(split(trim(col("s")), "  "), 2)).as("pair"))
        .groupBy("pair").agg(sum("f").as("n"))
      val top = pc.orderBy(col("n").desc, col("pair")).limit(1).collect()
      // an empty pair table (every word fused to one symbol) would make
      // the oracle's scalar subqueries NULL — fail loudly instead of
      // silently diverging
      require(top.nonEmpty, s"bpeTrainMerges: no pairs left at round $r")
      val pair = top(0).getString(0)
      merges += ((r, pair, top(0).getLong(1)))
      cur = cur.withColumn("s",
        replace(col("s"),
          lit(" " + pair.replace(" ", "  ") + " "),
          lit(" " + pair.replace(" ", "") + " ")))
    }
    (cur, merges.result())
  }

  /** Tokenizer INFERENCE over the corpus — closes the loop opened by
    * [[bpeTrainMerges]]: train `rounds` merges, apply them to every
    * word, and emit per-document encoded-sequence lengths
    * `(id, n_words, n_bpe_tokens)` — the number a packing/budgeting
    * stage actually consumes (token counts under the LEARNED
    * vocabulary, not whitespace counts).
    *
    * Application is a broadcast-friendly join of the corpus's words
    * against the trained word-type table (vocabulary-sized, Zipf-small)
    * — encoding never re-runs the merge loop per document.
    */
  def bpeEncodedCounts(
      docs: DataFrame,
      rounds: Int,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val (words, _) = bpeTrain(docs, rounds, textCol)
    val syms = words.select(col("w"),
      size(split(trim(col("s")), "  ")).as("__n_syms"))
    docs.select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .join(syms, "w")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum(col("__n_syms")).as("n_bpe_tokens"))
  }

  /** BPE merge-candidate statistics: corpus-wide adjacent-CHARACTER-pair
    * frequencies inside whitespace words — the counting step of byte-pair
    * -encoding tokenizer training (each top pair is the next merge the
    * trainer would pick; rerunning after applying a merge yields the
    * next, so this operator IS the per-iteration inner loop).
    *
    * Shape at 100 TB: pair generation is entirely map-side (tokenize,
    * then slide a 2-char window per word in one codegen'd
    * higher-order-function chain — no per-word shuffle); the only
    * shuffle is the final pair-count aggregation, which partial-
    * aggregates map-side into at most |alphabet|² ≈ thousands of
    * groups, so reduce-side volume is tiny and independent of corpus
    * size. Output: the `topK` most frequent pairs, deterministically
    * ordered (count desc, then pair) — ties cannot reorder across runs.
    */
  def bpePairStats(
      docs: DataFrame,
      topK: Int = 25,
      textCol: String = "text"): DataFrame = {
    require(topK >= 1)
    // slide over 1..length: the final window yields a 1-char remnant
    // (filtered by length) instead of risking sequence(1, 0), which
    // Spark would "helpfully" generate as a DESCENDING [1, 0]
    val pairsPerWord = (w: Column) =>
      filter(
        transform(sequence(lit(1), greatest(length(w), lit(1))),
          i => w.substr(i, lit(2))),
        p => length(p) === 2)
    docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .select(explode(pairsPerWord(col("w"))).as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topK)
  }

  /** DSIR-style importance scores (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): hash every token
    * into one of `buckets` feature buckets, estimate the bucket
    * distribution of a TARGET slice (`targetCond`) and of the raw
    * corpus, and score each document by the mean importance weight of
    * its tokens — `w(b) = p_target(b) / p_raw(b)` with add-1 smoothing,
    * in exact integer ppm. Documents that look like the target
    * distribution score above 1e6; off-target docs score below. The
    * standard data-selection move: pick high-scoring raw docs to enrich
    * a pretraining mix toward a target domain.
    *
    * All arithmetic is integer end-to-end: counts, decimal(38,0)
    * cross-multiplication (`(n_tgt+1)·(tot_raw+B)·10⁶ //
    * (n_raw+1)·(tot_tgt+B)`), and a floor-divided per-doc mean — two
    * engines cannot round apart, so the whole chain sits under the
    * oracle gate. The bucket hash is the portable rolling-hash →
    * MixHash32 pipeline ([[graft.OracleSql.dsirCtes]] replays it).
    *
    * Output: (idCol, n_tokens, score_ppm), one row per doc with ≥ 1
    * token.
    *
    * Shape at 100 TB: the token stream is computed once (persisted) and
    * feeds both the bucket counts and the per-doc join; the weight
    * table is exactly `buckets` rows — a broadcast — so scoring is a
    * zero-shuffle map-side join plus one combinable per-doc sum. The
    * totals ride a broadcast 1-row aggregate, never a driver action.
    * Hashed buckets (not raw vocabulary) are the DSIR trick that keeps
    * the feature table bounded when the corpus has billions of n-gram
    * types.
    */
  /** Per-document out-of-vocabulary rate against the corpus's own
    * top-`vocabSize` token vocabulary — the tokenizer-coverage audit:
    * docs full of tokens the vocabulary doesn't cover fragment into
    * long byte-level encodings and waste training compute. Vocabulary
    * rank ties break lexicographically (deterministic truncation).
    * Output: (idCol, n_tokens, n_oov, oov_ppm) per doc with ≥ 1 token.
    *
    * Shape at 100 TB: the token stream is computed once (persisted) and
    * feeds the vocabulary count AND the coverage join; the vocabulary
    * is exactly `vocabSize` rows — a broadcast — so coverage is a
    * zero-shuffle map-side join plus one combinable per-doc count.
    */
  def oovRate(
      docs: DataFrame,
      vocabSize: Int = 100,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(vocabSize >= 1)
    val toks = Caches.persisted(
      docs.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
        .filter(col("__tok") =!= ""))
    val vocab = toks.groupBy("__tok").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__tok")).limit(vocabSize)
      .select(col("__tok"), lit(1).as("__in_vocab"))
    toks
      .join(broadcast(vocab), Seq("__tok"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col(idCol), col("n_tokens"), col("n_oov"),
        expr("n_oov * 1000000 div n_tokens").as("oov_ppm"))
  }

  def importanceScores(
      docs: DataFrame,
      targetCond: Column,
      buckets: Int = 1024,
      salt: String = "dsir",
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(buckets >= 2)
    val toks = Caches.persisted(
      docs
        .select(col(idCol), targetCond.cast("int").as("__is_tgt"),
          explode(tokens(col(textCol))).as("__tok"))
        .filter(col("__tok") =!= "")
        .select(col(idCol), col("__is_tgt"),
          (mixed_hash32(concat_ws(":", lit(salt), col("__tok"))) % buckets)
            .as("bucket")))
    val counts = toks.groupBy("bucket")
      .agg(count(lit(1)).as("n_raw"), sum("__is_tgt").as("n_tgt"))
    val tots = counts.agg(
      sum("n_raw").as("__tot_raw"), sum("n_tgt").as("__tot_tgt"))
    val weights = counts
      .crossJoin(broadcast(tots))
      .select(col("bucket"),
        expr(s"CAST((CAST(n_tgt + 1 AS DECIMAL(38,0)) * (__tot_raw + $buckets) * 1000000)" +
          s" div (CAST(n_raw + 1 AS DECIMAL(38,0)) * (__tot_tgt + $buckets)) AS BIGINT)")
          .as("w_ppm"))
    toks
      .join(broadcast(weights), "bucket")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), sum("w_ppm").as("__sw"))
      .select(col(idCol), col("n_tokens"),
        expr("__sw div n_tokens").as("score_ppm"))
  }

  // ----------------------------- trainable linear probe classifier

  /** Per-doc dense hashed-bag-of-words features: `(idCol, y,
    * c0..c{buckets-1})` with integer token counts per hash bucket (the
    * fastText-style feature map every learned quality/domain filter
    * starts from) and the binary label from `labelCond`. Docs with zero
    * tokens carry no feature row. One map-side-combinable aggregation;
    * the bucket hash is the portable rolling-hash → MixHash32 pipeline
    * shared with [[importanceScores]].
    */
  def probeFeatures(
      docs: DataFrame,
      labelCond: Column,
      buckets: Int = 16,
      salt: String = "probe",
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(buckets >= 2 && buckets <= 64, "buckets out of sane range")
    val toks = docs
      .select(col(idCol), labelCond.cast("int").as("y"),
        explode(tokens(col(textCol))).as("__tok"))
      .filter(col("__tok") =!= "")
      .select(col(idCol), col("y"),
        (mixed_hash32(concat_ws(":", lit(salt), col("__tok"))) % buckets)
          .as("__b"))
    val ccols = (0 until buckets).map(b =>
      sum(when(col("__b") === b, 1L).otherwise(0L)).as(s"c$b"))
    toks.groupBy(col(idCol), col("y"))
      .agg(ccols.head, ccols.tail: _*)
  }

  /** Batch-gradient-descent fit of a linear probe `margin(d) = Σ_b
    * w_b·c_db + w_bias` against the squared loss to the binary label —
    * the trainable scoring stage of a learned data filter, run entirely
    * as Spark aggregations with a bounded driver loop (`iters` rounds,
    * one `buckets+2`-value collect each).
    *
    * The distributed sum that usually makes learned filters
    * non-reproducible is made exact: each doc's gradient contribution
    * `((margin − y)·c_b)·2^scaleBits` is rounded to a Long FIRST, so
    * the cross-partition reduction is integer — identical on any
    * partitioning and replayed bit-for-bit by the DuckDB oracle
    * ([[graft.OracleSql.probeWeights]]), including the weight-update
    * float arithmetic, which is a fixed-order IEEE expression on both
    * engines. No transcendental appears anywhere (squared loss, not
    * log-loss), so there is no libm divergence to tolerate.
    *
    * Shape at 100 TB: each round is ONE whole-stage-codegen aggregation
    * over the persisted feature table (buckets+2 partial sums,
    * combiner-friendly); driver state is `buckets+1` doubles. Feature
    * extraction is a single keyed groupBy. Everything else is map-side.
    *
    * @return per-round weights are internal; the result is the final
    *         `(bucket, weight)` table with `bucket = buckets` holding
    *         the bias row.
    */
  def trainLinearProbe(
      docs: DataFrame,
      labelCond: Column,
      buckets: Int = 16,
      iters: Int = 3,
      lr: Double = 1.0 / 1024,
      scaleBits: Int = 20,
      salt: String = "probe",
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val (w, _) = fitProbe(docs, labelCond, buckets, iters, lr, scaleBits,
      salt, textCol, idCol)
    val spark = docs.sparkSession
    import spark.implicits._
    w.zipWithIndex.map { case (wt, b) => (b, wt) }.toSeq
      .toDF("bucket", "weight")
  }

  private[operators] def fitProbe(
      docs: DataFrame,
      labelCond: Column,
      buckets: Int,
      iters: Int,
      lr: Double,
      scaleBits: Int,
      salt: String,
      textCol: String,
      idCol: String): (Array[Double], DataFrame) = {
    require(iters >= 1 && iters <= 16, "iters out of sane range")
    val qs = math.pow(2, scaleBits)
    val feat = Caches.persisted(
      probeFeatures(docs, labelCond, buckets, salt, textCol, idCol))
    // the fitted weights are a pure (deterministic, integer-reduced)
    // function of the inputs — memoize per session so the five probe
    // queries train ONCE instead of re-running iters aggregations each
    // ("train once, score everywhere", which is the deployment shape)
    val memoKey = s"fitProbe|$buckets|$iters|$lr|$scaleBits|$salt|$textCol|$idCol|" +
      s"$labelCond|${Memo.planKey(docs)}"
    val w = Memo.cached(docs.sparkSession, memoKey) {
      val wts = Array.fill(buckets + 1)(0.0)
      for (_ <- 1 to iters) {
        // margin in fixed bucket order: ((c0·w0 + c1·w1) + …) + bias —
        // the identical left-associated IEEE expression the oracle uses
        val margin = (0 until buckets)
          .map(b => col(s"c$b") * lit(wts(b)))
          .reduce(_ + _) + lit(wts(buckets))
        val resid = margin - col("y")
        val grads = feat.agg(
          count(lit(1)).as("n"),
          (0 until buckets).map(b =>
            sum(round((resid * col(s"c$b")) * lit(qs)).cast("long")).as(s"g$b")) :+
            sum(round(resid * lit(qs)).cast("long")).as("gb"): _*)
          .head()
        val n = grads.getLong(0).toDouble
        for (b <- 0 to buckets) {
          val g = grads.getLong(1 + b)
          wts(b) = wts(b) - ((g.toDouble / n) / qs) * lr
        }
      }
      wts
    }
    (w, feat)
  }

  /** Per-doc margin of the trained probe in exact integer ppm:
    * `(idCol, y, score_ppm)` with `score_ppm = floor(margin·10⁶)`.
    * The margin is the same fixed-order double expression the trainer
    * used, so the floor is engine-identical. One broadcast-free
    * map-side projection over the persisted feature table.
    */
  def probeScores(
      docs: DataFrame,
      labelCond: Column,
      buckets: Int = 16,
      iters: Int = 3,
      lr: Double = 1.0 / 1024,
      scaleBits: Int = 20,
      salt: String = "probe",
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val (w, feat) = fitProbe(docs, labelCond, buckets, iters, lr, scaleBits,
      salt, textCol, idCol)
    val margin = (0 until buckets)
      .map(b => col(s"c$b") * lit(w(b)))
      .reduce(_ + _) + lit(w(buckets))
    feat.select(col(idCol), col("y"),
      floor(margin * lit(1e6)).cast("long").as("score_ppm"))
  }

  /** Reliability diagram of the probe: scores bucketed into `bins`
    * fixed-width ranges between the observed min and max score, with
    * per-bin doc count, positive count, and positive rate in ppm — the
    * calibration report a learned filter is promoted on. All integer
    * arithmetic; the min/max ride a broadcast 1-row aggregate (no
    * global sort, no single-partition window).
    */
  def probeCalibration(
      docs: DataFrame,
      labelCond: Column,
      bins: Int = 10,
      buckets: Int = 16,
      iters: Int = 3,
      lr: Double = 1.0 / 1024,
      scaleBits: Int = 20,
      salt: String = "probe",
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(bins >= 2)
    val scores = probeScores(docs, labelCond, buckets, iters, lr, scaleBits,
      salt, textCol, idCol)
    val bounds = scores.agg(min("score_ppm").as("__mn"), max("score_ppm").as("__mx"))
    scores.crossJoin(broadcast(bounds))
      .select(col("y"),
        expr(s"CAST((score_ppm - __mn) * $bins div (__mx - __mn + 1) AS INT)").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("y").as("n_pos"))
      .select(col("bin"), col("n_docs"), col("n_pos"),
        expr("n_pos * 1000000 div n_docs").as("pos_ppm"))
  }

  /** Precision/recall curve of the probe as a filter: for each score
    * bin b, the operating point "keep every doc scoring in bin >= b" —
    * kept count, kept positives, precision and recall in exact integer
    * ppm. The cumulation runs over the `bins`-row bin table (a
    * self-join on bin2 >= bin), never over the corpus, so the curve is
    * one corpus aggregation + one bins²-row join at any scale.
    */
  def probePrCurve(
      docs: DataFrame,
      labelCond: Column,
      bins: Int = 10,
      buckets: Int = 16,
      iters: Int = 3,
      lr: Double = 1.0 / 1024,
      scaleBits: Int = 20,
      salt: String = "probe",
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val cal = probeCalibration(docs, labelCond, bins, buckets, iters, lr,
      scaleBits, salt, textCol, idCol)
      .select(col("bin"), col("n_docs"), col("n_pos"))
    val tot = cal.agg(sum("n_pos").as("__tot_pos"))
    val hi = cal.select(col("bin").as("__b2"), col("n_docs").as("__nd"),
      col("n_pos").as("__np"))
    cal.select("bin").join(hi, col("__b2") >= col("bin"))
      .groupBy("bin")
      .agg(sum("__nd").as("n_kept"), sum("__np").as("n_pos_kept"))
      .crossJoin(broadcast(tot))
      .select(col("bin"), col("n_kept"), col("n_pos_kept"),
        expr("n_pos_kept * 1000000 div n_kept").as("precision_ppm"),
        expr("n_pos_kept * 1000000 div __tot_pos").as("recall_ppm"))
  }

  /** Operating-point selection: the loosest bin threshold (smallest
    * bin, most docs kept) whose precision meets `targetPrecisionPpm` —
    * how a learned filter is actually deployed: train, draw the curve,
    * pick the point, keep everything above it. Integer comparison, so
    * the pick is engine-exact; empty result when no bin qualifies.
    */
  def probeThreshold(
      docs: DataFrame,
      labelCond: Column,
      targetPrecisionPpm: Long,
      bins: Int = 10,
      buckets: Int = 16,
      iters: Int = 3,
      lr: Double = 1.0 / 1024,
      scaleBits: Int = 20,
      salt: String = "probe",
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val curve = probePrCurve(docs, labelCond, bins, buckets, iters, lr,
      scaleBits, salt, textCol, idCol)
    val best = curve.where(col("precision_ppm") >= targetPrecisionPpm)
      .agg(min("bin").as("bin"))
    curve.join(broadcast(best), "bin")
  }

  /** The deployed filter: ids of the docs whose score bin is at or
    * above the [[probeThreshold]] pick — the keep set a learned-filter
    * curation stage feeds downstream. Empty when no bin meets the
    * target (fail-closed). One corpus projection + two broadcast joins.
    */
  def probeKeepDocs(
      docs: DataFrame,
      labelCond: Column,
      targetPrecisionPpm: Long,
      bins: Int = 10,
      buckets: Int = 16,
      iters: Int = 3,
      lr: Double = 1.0 / 1024,
      scaleBits: Int = 20,
      salt: String = "probe",
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // train ONCE and derive binning, curve, and threshold from the same
    // persisted score table — calling probeThreshold here would refit
    // the (identical, deterministic) weights a second time
    val scores = Caches.persisted(probeScores(docs, labelCond, buckets,
      iters, lr, scaleBits, salt, textCol, idCol))
    val bounds = scores.agg(min("score_ppm").as("__mn"), max("score_ppm").as("__mx"))
    val binned = scores.crossJoin(broadcast(bounds))
      .select(col(idCol), col("y"),
        expr(s"CAST((score_ppm - __mn) * $bins div (__mx - __mn + 1) AS INT)").as("__bin"))
    val cal = binned.groupBy("__bin")
      .agg(count(lit(1)).as("__nd"), sum("y").as("__np"))
    val hi = cal.select(col("__bin").as("__b2"), col("__nd"), col("__np"))
    val curve = cal.select("__bin").join(hi, col("__b2") >= col("__bin"))
      .groupBy("__bin")
      .agg(sum("__nd").as("__nk"), sum("__np").as("__npk"))
    val best = curve
      .where(expr("__npk * 1000000 div __nk") >= targetPrecisionPpm)
      .agg(min("__bin").as("__thr"))
    binned.crossJoin(broadcast(best))
      .where(col("__bin") >= col("__thr"))
      .select(idCol)
  }

  /** Source-level Flesch reading-ease profile from exact integer
    * counts: words (non-empty whitespace tokens), sentences (runs of
    * `[.!?]`, floored at one per doc), and a syllable proxy (runs of
    * `[aeiou]` in the lowercased text — the standard cheap stand-in;
    * hyphenation-exact syllables need a dictionary).
    *
    * All three counts aggregate per source as LONG sums — one
    * combinable scan — and the Flesch formula
    * `206.835 − 1.015·(W/S) − 84.6·(Sy/W)` runs ONCE per source row on
    * the exact sums, as a fixed double expression both engines
    * evaluate identically. Averaging per-doc double scores instead
    * would reintroduce sum-order noise and weight short docs equally
    * with long ones; the sum-first form is the corpus-level score.
    */
  def readabilityBySource(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val words = size(filter(tokens(col(textCol)), t => t =!= ""))
    val sentences = greatest(
      size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))), lit(1))
    val syllables = size(regexp_extract_all(lower(col(textCol)), lit("[aeiou]+"), lit(0)))
    val agg = docs.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(words.cast("long")).as("sum_words"),
        sum(sentences.cast("long")).as("sum_sentences"),
        sum(syllables.cast("long")).as("sum_syllables"))
    agg.withColumn("flesch",
      lit(206.835)
        - lit(1.015) * (col("sum_words").cast("double") / col("sum_sentences").cast("double"))
        - lit(84.6) * (col("sum_syllables").cast("double") / col("sum_words").cast("double")))
  }

  /** ZIPF-SLOPE vocabulary health check: per source, the least-squares
    * slope of ln(frequency) on ln(rank) over the top-`topK` tokens — a
    * natural-language corpus sits near −1; a slope far shallower flags
    * templated/boilerplate feeds (flat head), far steeper flags
    * degenerate repetition (one token dominating). The distribution
    * fit a mix planner reads next to [[graft.operators.TextAnalysis]]'s
    * token-Gini and vocab-growth curves.
    *
    * Scale shape: one token-count aggregate (combinable), a
    * source-keyed top-K window over the DISTINCT-token table, then a
    * K-point moment fold per source — everything past the count is
    * vocabulary-sized, and the fit itself sees ≤ topK points per
    * source. Double moments over ≤ topK ln() terms: no fixed-point
    * rounding cliff anywhere, and the closed-form combination is
    * stable far inside the compare grid.
    */
  def zipfSlope(docs: DataFrame, topK: Int = 64,
      textCol: String = "text", srcCol: String = "source"): DataFrame = {
    val counts = docs
      .select(col(srcCol).as("source"), explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("source", "token").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("n").desc, col("token"))
    val xy = counts.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("source"), log(col("rank").cast("double")).as("x"),
        log(col("n").cast("double")).as("y"))
    val m = xy.groupBy("source").agg(count(lit(1)).as("n_points"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val nD = col("n_points").cast("double")
    val num = nD * col("sxy") - col("sx") * col("sy")
    val den = nD * col("sxx") - col("sx") * col("sx")
    val deny = nD * col("syy") - col("sy") * col("sy")
    m.select(col("source"), col("n_points"),
      when(den =!= 0.0, num / den).as("slope"),
      when(den =!= 0.0,
        (col("sy") - (num / den) * col("sx")) / nD).as("intercept"),
      when(den =!= 0.0 && deny =!= 0.0, (num * num) / (den * deny)).as("r2"))
  }

  /** BPE MERGE LEARNING — the first `k` byte-pair-encoding merges of
    * the corpus, learned deterministically: the tokenizer-training step
    * of an LLM data pipeline, run where the data lives instead of
    * shipping the corpus to a single machine. Each round counts every
    * adjacent symbol pair weighted by word frequency and merges the
    * most frequent one (ties break lexicographically); output row r is
    * the r-th learned merge with its count — exactly the `merges.txt`
    * a BPE tokenizer ships.
    *
    * Scale shape: the corpus collapses ONCE to the (word, freq) vocab
    * (one combinable aggregate; Zipf makes this table tiny next to the
    * corpus), and every round is one aggregate over the vocab plus a
    * single-row argmax collect — k driver round-trips, like Lloyd.
    * Segmentations ride as `·`-delimited strings (`·a··b··c·`, symbols
    * can never contain the delimiter), so applying a merge is ONE
    * literal left-to-right non-overlapping replace (`·a··b·`→`·ab·`)
    * that any engine performs identically — adjacent same-pair runs
    * resolve left-first in both, the reference BPE behavior.
    *
    * Determinism: counts are exact longs of a pure function of the
    * corpus; the argmax is (count desc, pair asc); no RNG anywhere.
    * Words are lowercase-letter runs of length ≥ 2 (tokenizer-training
    * hygiene — punctuation/number handling is a pre-tokenization
    * concern).
    */
  def bpeMerges(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeCore(docs, k, textCol)._3
      .toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
  }

  /** Corpus-level effect of the [[bpeMerges]] vocabulary — the
    * tokenizer-eval number that decides k: frequency-weighted symbol
    * counts before (characters) and after the k merges, with the
    * compression as exact integer ppm. One row:
    * (n_merges, n_words, n_chars, n_tokens, tokens_per_char_ppm).
    */
  def bpeCompressionReport(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame = {
    val (vocab, seg, merges) = bpeCore(docs, k, textCol)
    val toks = filter(split(seg, "·+"), t => t =!= "")
    vocab.select(col("w"), col("freq"), size(toks).cast("long").as("nt"))
      .agg(lit(merges.size).as("n_merges"),
        sum(col("freq")).as("n_words"),
        sum(col("freq") * length(col("w")).cast("long")).as("n_chars"),
        sum(col("freq") * col("nt")).as("n_tokens"))
      .withColumn("tokens_per_char_ppm",
        expr("n_tokens * 1000000L div n_chars"))
  }

  /** Shared BPE loop: the persisted (word, freq, char-seg) vocab, the
    * final segmentation column after ≤ k merges, and the learned
    * merges. */
  private def bpeCore(docs: DataFrame, k: Int, textCol: String)
      : (DataFrame, Column, Seq[(Int, String, String, String, Long)]) = {
    require(k >= 1 && k <= 32, "k merges per call is bounded (driver rounds)")
    val vocab = Caches.persisted(
      docs.select(explode(tokens(col(textCol))).as("w"))
        .where(col("w").rlike("^[a-z]{2,}$"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
        .withColumn("seg", regexp_replace(col("w"), "(.)", "·$1·")))
    var seg: Column = col("seg")
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val toks = filter(split(seg, "·+"), t => t =!= "")
      val pairs = zip_with(
        slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit("··"), b))
      val best = vocab.select(explode(pairs).as("p"), col("freq"))
        .groupBy("p").agg(sum("freq").as("c"))
        .orderBy(col("c").desc, col("p")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val Array(l, rt) = best(0).getString(0).split("··", 2)
        out += ((r, l, rt, l + rt, best(0).getLong(1)))
        seg = regexp_replace(seg,
          java.util.regex.Pattern.quote(s"·${l}··${rt}·"), s"·${l}${rt}·")
        r += 1
      }
    }
    (vocab, seg, out.toSeq)
  }
}
