package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.functions.tokens

/** Lexical retrieval over a document corpus: a positional inverted
  * index, exact phrase search, and BM25 ranked retrieval — the
  * term-based twin of the vector tiers in [[Similarity]]. A training
  * corpus needs both: ANN finds semantic near-matches, lexical search
  * finds exact mentions (contamination strings, entity audits,
  * targeted subset extraction).
  *
  * Everything is deterministic and integer-exact (scores in ppm via
  * floor division) so the whole family sits under the DuckDB oracle
  * gate — two engines cannot round apart.
  *
  * Shape at 100 TB: the token explosion is computed once per corpus
  * version and persisted as the inverted index (a warehouse table,
  * [[invertedIndex]]); query batches are small and ride broadcasts, so
  * a search touches one combinable aggregation over the postings of
  * the query terms only — never a corpus scan per query. Postings are
  * partitioned by token (the index's natural key), so a term lookup is
  * a partition-pruned read.
  */
object Search {

  /** Positional inverted index: one row per (token, doc) with the
    * 0-based positions of every occurrence and the term frequency.
    * Persist with [[graft.sources.Warehouse]] and reuse across query
    * batches — the index is the expensive pass, queries are cheap.
    */
  def invertedIndex(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
      .filter(col("token") =!= "")
      .groupBy("token", idCol)
      .agg(sort_array(collect_list(col("pos"))).as("positions"),
        count(lit(1)).as("tf"))

  /** Exact phrase search: documents containing `phrase` as consecutive
    * tokens. Anchor positions are occurrences of the first word whose
    * successors line up; output is (idCol, n_occ, first_pos) for
    * matching docs only.
    *
    * The postings of the phrase's (few, broadcast) distinct terms are
    * pivoted to one row per candidate doc — a doc survives only if it
    * contains EVERY phrase term, so the candidate set is bounded by the
    * rarest term's df long before the position check runs. No
    * corpus-wide work after the index: one groupBy over the selected
    * postings.
    */
  def phraseSearch(
      index: DataFrame,
      phrase: Seq[String],
      idCol: String = "doc_id"): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val terms = phrase.map(_.toLowerCase)
    val distinctTerms = terms.distinct
    // positions arrays per distinct term, one column each (phrase is a
    // handful of words — static pivot keeps the check codegen-friendly)
    def pcol(t: String) = s"__pos_${distinctTerms.indexOf(t)}"
    val pivoted = index
      .filter(col("token").isin(distinctTerms: _*))
      .groupBy(idCol)
      .agg(
        first(when(col("token") === distinctTerms.head, col("positions")), ignoreNulls = true)
          .as(pcol(distinctTerms.head)),
        distinctTerms.tail.map(t =>
          first(when(col("token") === t, col("positions")), ignoreNulls = true)
            .as(pcol(t))): _*)
      // every phrase term must occur
      .filter(distinctTerms.map(t => col(pcol(t)).isNotNull).reduce(_ && _))
    // p anchors a match iff token at p+i is terms(i) for every slot
    val slotChecks = (p: Column) =>
      terms.zipWithIndex.tail
        .map { case (t, i) => array_contains(col(pcol(t)), p + i) }
        .foldLeft(lit(true))(_ && _)
    pivoted
      .withColumn("__anchors", filter(col(pcol(terms.head)), slotChecks))
      .filter(size(col("__anchors")) > 0)
      .select(col(idCol), size(col("__anchors")).cast("long").as("n_occ"),
        element_at(col("__anchors"), 1).cast("long").as("first_pos"))
  }

  /** Phrase search straight from documents (builds the postings
    * inline). Same output as [[phraseSearch]] over [[invertedIndex]].
    */
  def phraseSearchDocs(
      docs: DataFrame,
      phrase: Seq[String],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    phraseSearch(invertedIndex(docs, textCol, idCol), phrase, idCol)

  /** BM25 ranked retrieval, integer-exact: top-`k` documents per query
    * under Okapi BM25 with k1 = 6/5, b = 3/4 and the Robertson–Spärck
    * Jones odds `(N − df + ½)/(df + ½)` as the term weight — the odds
    * ratio BM25's log-idf is the logarithm of, kept unlogged so every
    * score is an exact integer ratio (logs are transcendental and
    * engine-dependent; the odds preserve per-term monotonicity in df).
    *
    * Per matched term, with T = total corpus tokens, N = docs, dl =
    * doc length, both BM25 factors multiplied out over the common
    * denominator 10·T (k1 = 6/5, b = 3/4 are exact rationals):
    *
    * {{{
    * score_ppm(t,d) = (22·tf·T · (2(N−df)+1) · 10⁶)
    *              div ((10·tf·T + 3·T + 9·dl·N) · (2df+1))
    * }}}
    *
    * summed over the query's distinct terms. All products are carried
    * in decimal(38,0) — at a 100 TB corpus (T ≈ 2.5·10¹³ tokens) the
    * widest product is ~10³⁷, inside decimal(38) but far past int64,
    * which is why the longs are promoted before multiplying.
    *
    * Queries are a small batch (broadcast); the corpus-side work is one
    * persisted token explosion feeding doc lengths, tfs, and dfs, then
    * a combinable per-(query, doc) sum and a k-deep top-k. Ties are
    * deterministic: (score desc, doc id asc).
    *
    * Output: (query_id, rk, idCol, score_ppm), rk = 1..k.
    */
  def bm25TopK(
      docs: DataFrame,
      queries: Seq[(Int, Seq[String])],
      k: Int,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val qvocab = queries.flatMap(_._2.map(_.toLowerCase)).distinct
    val toks = Caches.persisted(
      docs
        .select(col(idCol), explode(tokens(col(textCol))).as("token"))
        .filter(col("token") =!= ""))
    val dl = toks.groupBy(idCol).agg(count(lit(1)).as("dl"))
    val tf = toks.filter(col("token").isin(qvocab: _*))
      .groupBy("token", idCol)
      .agg(count(lit(1)).as("tf"))
    bm25Score(tf, dl, queries, k, idCol)
  }

  /** [[bm25TopK]] served from a persisted [[invertedIndex]] instead of
    * re-tokenizing the corpus — the 100 TB serving path: doc lengths
    * and corpus totals come from the index's tf column, and the query
    * terms' postings are the only rows whose tf is read. Output is
    * identical to [[bm25TopK]] on the same corpus by construction
    * (spec-proven).
    */
  def bm25TopKFromIndex(
      index: DataFrame,
      queries: Seq[(Int, Seq[String])],
      k: Int,
      idCol: String = "doc_id"): DataFrame = {
    val qvocab = queries.flatMap(_._2.map(_.toLowerCase)).distinct
    val dl = index.groupBy(idCol).agg(sum("tf").as("dl"))
    val tf = index.filter(col("token").isin(qvocab: _*))
      .select(col("token"), col(idCol), col("tf"))
    bm25Score(tf, dl, queries, k, idCol)
  }

  // shared scorer: tf = (token, idCol, tf) restricted to the query
  // vocabulary; dl = (idCol, dl) over ALL docs with >= 1 token
  private def bm25Score(
      tf0: DataFrame,
      dl: DataFrame,
      queries: Seq[(Int, Seq[String])],
      k: Int,
      idCol: String): DataFrame = {
    require(k >= 1)
    require(queries.nonEmpty, "empty query batch")
    val spark = tf0.sparkSession
    import spark.implicits._
    val stats = dl.agg(count(lit(1)).as("__n_docs"), sum("dl").as("__t_tokens"))
    val qterms = queries
      .flatMap { case (qid, ts) => ts.map(_.toLowerCase).distinct.map(qid -> _) }
      .toDF("query_id", "token")
    val tf = Caches.persisted(tf0)
    val df_ = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(qterms), "token")
      .join(broadcast(df_), "token")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("__w_ppm",
        expr("CAST((CAST(22 AS DECIMAL(38,0)) * tf * __t_tokens * (2 * (__n_docs - df) + 1) * 1000000)" +
          " div ((CAST(10 AS DECIMAL(38,0)) * tf * __t_tokens + 3 * __t_tokens + 9 * dl * __n_docs)" +
          " * (2 * df + 1)) AS BIGINT)"))
      .groupBy("query_id", idCol)
      .agg(sum("__w_ppm").as("score_ppm"))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score_ppm").desc, col(idCol))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col(idCol), col("score_ppm"))
  }

  /** O(delta) maintenance of a persisted [[invertedIndex]]: postings
    * for `delta` docs are computed alone and appended; docs already
    * present are skipped wholesale (anti-join on the doc id), so a
    * crash-replayed batch is a no-op — the same replay-safe append
    * discipline as the MinHash and IVF index maintainers.
    */
  def appendToInvertedIndex(
      index: DataFrame,
      delta: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val existing = index.select(idCol).distinct()
    val fresh = invertedIndex(delta, textCol, idCol)
      .join(existing, Seq(idCol), "left_anti")
    index.unionByName(fresh)
  }

  /** Deletion maintenance for a persisted [[invertedIndex]] — the
    * revocation path (takedowns, opt-outs, contamination discoveries).
    * Every posting of the revoked ids is dropped in ONE broadcast
    * anti-join over the index: no re-tokenization, no corpus read, no
    * shuffle (the revocation list is takedown-sized and rides the
    * broadcast). Because [[bm25TopKFromIndex]] derives doc lengths,
    * dfs, and corpus totals FROM the index rows, a served query after
    * the delete scores exactly as a fresh index of the surviving
    * corpus — df shifts from the removed docs included (spec- and
    * oracle-gated).
    *
    * Replay-safe both ways: deleting an absent id is a no-op, and a
    * revoked doc can be legitimately re-ingested later through
    * [[appendToInvertedIndex]] (its postings are gone, so the append's
    * anti-join re-admits it).
    */
  def deleteFromInvertedIndex(
      index: DataFrame,
      deleteIds: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    index.join(broadcast(deleteIds.select(idCol).distinct()),
      Seq(idCol), "left_anti")
      // the using-column join fronts idCol; hand back the index schema
      // unchanged so delete/append round-trips are column-identical
      .select(index.columns.map(col): _*)

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttner, SIGIR 2009):
    * merge two ranked lists into one by `score = Σ 1/(kRrf + rank)`,
    * the standard hybrid-retrieval combiner (lexical + vector, or
    * relevance + static prior) — rank-based, so the two systems'
    * incomparable score scales never meet. Kept integer-exact as
    * `10⁹ div (kRrf + rank)` per side (a doc absent from one list
    * contributes 0), so the fused order replays bit-for-bit.
    *
    * Inputs are (query_id, idCol, rk) rankings — [[bm25TopK]] output
    * shape. Output: (query_id, rk, idCol, rrf_score) re-ranked top-`k`,
    * ties (score desc, id asc).
    *
    * Shape at 100 TB: both inputs are already k-deep per query —
    * fusion joins two query-batch-sized tables, never the corpus; one
    * full-outer join on (query, doc) + one k-deep top-k window.
    */
  def rrfFuse(
      a: DataFrame,
      b: DataFrame,
      k: Int,
      kRrf: Int = 60,
      idCol: String = "doc_id"): DataFrame = {
    require(k >= 1 && kRrf >= 0)
    def side(df: DataFrame, nm: String) =
      df.select(col("query_id"), col(idCol),
        expr(s"1000000000 div (${kRrf} + rk)").as(nm))
    side(a, "__ra")
      .join(side(b, "__rb"), Seq("query_id", idCol), "full_outer")
      .select(col("query_id"), col(idCol),
        (coalesce(col("__ra"), lit(0L)) + coalesce(col("__rb"), lit(0L)))
          .as("rrf_score"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("rrf_score").desc, col(idCol))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col(idCol), col("rrf_score"))
  }

  /** NDCG@k of the BM25 ranking against a term-overlap relevance
    * grade: rel(q, d) = number of distinct query terms present in d.
    * The ranking-quality eval for the lexical path, beside the ANN
    * eval harness's recall@k.
    *
    * Kept order-independent and engine-portable the same way the BM25
    * scores are: each DCG term `rel / log2(rank+1)` is computed in
    * double (one fixed expression), scaled to ppm and ROUNDED TO AN
    * INTEGER, then summed as longs — so the sum order Spark picks
    * cannot wiggle the result. `ndcg` is the one final double division.
    *
    * Shape at 100 TB: relevance grades live only on docs containing
    * ≥ 1 query term (the btf-sized slice, not the corpus); the ideal
    * ranking is a per-query top-k window over that slice — the same
    * bound as the BM25 ranking itself.
    *
    * Output: (query_id, dcg_ppm, idcg_ppm, ndcg).
    */
  def ndcgAtK(
      docs: DataFrame,
      queries: Seq[(Int, Seq[String])],
      k: Int,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranking = bm25TopK(docs, queries, k, textCol, idCol)
    val qvocab = queries.flatMap(_._2.map(_.toLowerCase)).distinct
    val qterms = queries
      .flatMap { case (q, ts) => ts.map(_.toLowerCase).distinct.map(t => (q, t)) }
      .toDF("query_id", "token")
    val docTerms = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .filter(col("token").isin(qvocab: _*))
      .distinct()
    val rel = docTerms.join(broadcast(qterms), "token")
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("rel"))
    def term(rkCol: Column): Column =
      round(col("rel").cast("double") * 1000000.0 / log2(rkCol + lit(1)))
        .cast("long")
    val dcg = ranking.join(rel, Seq("query_id", idCol))
      .groupBy("query_id").agg(sum(term(col("rk"))).as("dcg_ppm"))
    val idcg = rel
      .withColumn("__irk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("rel").desc, col(idCol))))
      .filter(col("__irk") <= k)
      .groupBy("query_id").agg(sum(term(col("__irk"))).as("idcg_ppm"))
    dcg.join(idcg, "query_id")
      .select(col("query_id"), col("dcg_ppm"), col("idcg_ppm"),
        (col("dcg_ppm").cast("double") / col("idcg_ppm").cast("double")).as("ndcg"))
  }
}
