package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite with SparkTest {

  private def docs = {
    val s = spark; import s.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again today"),
      (1L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup of 0
      (2L, "completely different content about spark query engines and shuffles"),
      (3L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 0
      (4L, "unrelated words nothing shared here at all zebra xylophone quasar")
    ).toDF("doc_id", "text")
  }

  test("removeContaminated drops normalized matches, keeps everything else") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (1L, "The Quick   Brown Fox"), // eval match modulo case/whitespace
      (2L, "an innocent training document"),
      (3L, "another   clean\tdoc")
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "the quick brown fox")).toDF("doc_id", "text")
    val kept = Dedup.removeContaminated(corpus, eval).collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
    // no eval overlap -> corpus unchanged
    val none = Seq((100L, "zzz")).toDF("doc_id", "text")
    assert(Dedup.removeContaminated(corpus, none).count() == 3)
  }

  test("removeContaminatedBloom is exactly removeContaminated (no false negatives)") {
    val s = spark; import s.implicits._
    // 200 corpus docs, every 5th contaminated; tiny bloom (high fpp)
    // to force false positives through the verify join
    val corpus = (0 until 200).map(i => (i.toLong, s"document number $i content"))
      .toDF("doc_id", "text")
    val eval = (0 until 200 by 5)
      .map(i => (1000L + i, s"Document   NUMBER $i CONTENT")) // normalized match
      .toDF("doc_id", "text")
    val exact = Dedup.removeContaminated(corpus, eval)
      .collect().map(_.getLong(0)).toSet
    val bloomed = Dedup.removeContaminatedBloom(corpus, eval,
      expectedItems = 8L, fpp = 0.1) // undersized on purpose
      .collect().map(_.getLong(0)).toSet
    assert(bloomed == exact)
    assert(exact.size == 160)
    // empty eval set: everything is clean, no join needed to say so
    val none = Dedup.removeContaminatedBloom(corpus, corpus.limit(0))
    assert(none.count() == 200)
  }

  test("removeContaminatedNgram drops partial-overlap docs at the threshold") {
    val s = spark; import s.implicits._
    val eval = Seq((100L, "the quick brown fox jumps high")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "witness the quick brown fox escaping"), // 2 shared trigrams
      (2L, "the quick brown cookbook for spark"),   // 1 shared trigram
      (3L, "nothing in common at all here")
    ).toDF("doc_id", "text")
    val kept2 = Dedup.removeContaminatedNgram(corpus, eval, n = 3, minShared = 2)
      .collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(2L, 3L))
    val kept1 = Dedup.removeContaminatedNgram(corpus, eval, n = 3, minShared = 1)
      .collect().map(_.getLong(0)).toSet
    assert(kept1 == Set(3L))
  }

  test("exact dedup groups identical content, keeps smallest id") {
    val out = Dedup.exact(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 4) // 5 docs, one exact pair
    val dupGroup = out.filter(_._3 == 2L)
    assert(dupGroup.length == 1 && dupGroup.head._2 == 0L)
  }

  test("ngramJaccardPairs finds the near-dup pair with exact integer counts") {
    val pairs = Dedup.ngramJaccardPairs(docs, 1, 2) // jaccard >= 0.5
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 0-1 near dup, 0-3 identical, 1-3 near dup
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((0L, 1L), (0L, 3L), (1L, 3L)))
    val exact = pairs.find(p => p._1 == 0L && p._2 == 3L).get
    assert(exact._3 == exact._4) // identical docs: inter == union
  }

  test("ngramJaccardPairs maxGramDf drops hot grams from pair generation only") {
    // docs 0,1,3 share their full overlap; with a cap of 2, grams held
    // by all three of them (df=3) stop generating pairs, so only pairs
    // whose overlap includes a df<=2 gram survive. Doc 0 and 3 are
    // identical (every shared gram has df=3 via doc 1 or df=2... their
    // unique-together grams have df>=2), so assert the capped result is
    // a subset of the exact result and the exact pair count is unchanged
    // at cap = corpus size.
    val exact = Dedup.ngramJaccardPairs(docs, 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cappedSame = Dedup.ngramJaccardPairs(docs, 1, 2, maxGramDf = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cappedSame == exact)
    // reported jaccard is a lower bound under a cap (inter loses the
    // capped grams, union keeps all), so compare at a loose threshold
    val capped = Dedup.ngramJaccardPairs(docs, 1, 25, maxGramDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactLoose = Dedup.ngramJaccardPairs(docs, 1, 25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(exactLoose))
    // a gram shared by exactly two docs still pairs them: 0-3 share
    // "and again today" (absent from 1's "tonight" text), df=2
    assert(capped.contains((0L, 3L)))
    // pairs whose entire overlap is df=3 grams are the ones dropped
    assert(!capped.contains((0L, 1L)))
  }

  test("ngramJaccardPairsPrefix equals the all-grams join, at several thresholds") {
    for ((num, den) <- Seq((1, 2), (1, 20), (9, 10), (1, 1))) {
      val full = Dedup.ngramJaccardPairs(docs, num, den)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val pref = Dedup.ngramJaccardPairsPrefix(docs, num, den)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(pref == full, s"threshold $num/$den")
    }
  }

  test("ngramJaccardPairsPrefix: prefix expansion is much smaller than all-grams") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val tri = Dedup.trigramSets(docs)
    def expansions(grams: org.apache.spark.sql.DataFrame): Long =
      grams.groupBy("gram").agg(count(lit(1)).as("k")).where(col("k") >= 2)
        .agg(coalesce(sum(col("k") * (col("k") - 1) / 2), lit(0L)))
        .collect()(0).get(0).toString.toDouble.toLong
    // rebuild the prefix slice exactly as the operator does (t = 9/10)
    val sizes = tri.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val gramDf = tri.groupBy("gram").agg(count(lit(1)).as("gram_df"))
    val prefix = tri.join(gramDf, "gram")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("gram_df"), col("gram"))))
      .join(sizes, "doc_id")
      .where(col("rk") <= col("n_grams") + 1 -
        expr("(n_grams * 9 + 9) div 10"))
    val allExp = expansions(tri)
    val prefExp = expansions(prefix.select("doc_id", "gram"))
    // the trio (0,1,3) shares ~all grams: all-grams expands every one,
    // prefixes expand only each doc's rarest ~10%
    assert(allExp > 3 * prefExp,
      s"prefix candidates $prefExp not << all-grams $allExp")
    // and a zero threshold (empty prefixes) is refused
    intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPairsPrefix(docs, 0, 20)
    }
  }

  test("ngramContainmentPairs: quoted paragraph detected where jaccard misses it") {
    val s = spark; import s.implicits._
    val quote = "the five boxing wizards jump quickly over it"
    val d = Seq(
      (0L, quote), // 6 trigrams
      (1L, s"a very long article with lots of framing text begins here $quote " +
        "and then continues with much more unrelated content for many words " +
        "so the union is large relative to the quoted span overlap"),
      (2L, "completely unrelated text about something else entirely here")
    ).toDF("doc_id", "text")
    // jaccard at 1/2 misses the pair (overlap small vs union)...
    val jac = Dedup.ngramJaccardPairs(d, 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((0L, 1L)))
    // ...containment at 9/10 catches it: all 6 of doc 0's grams appear in doc 1
    val cont = Dedup.ngramContainmentPairs(d, 9, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val hit = cont.find(p => p._1 == 0L && p._2 == 1L).get
    assert(hit._3 == hit._4)            // inter == n_a: full containment
    assert(hit._6 == 1000000L)          // ppm of a fully-contained doc
    assert(!cont.exists(p => p._2 == 2L || p._1 == 2L))
  }

  test("sortedNeighborhoodPairs: prefix-sorted near-dups found, subset of all-pairs, stable") {
    // the fixture's near-dups (0,1,3) share their opening, so they sort
    // adjacently under the normalized-prefix key
    val sn = Dedup.sortedNeighborhoodPairs(docs, windowSize = 2, threshNum = 1, threshDen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(sn.map(p => (p._1, p._2)) == Set((0L, 1L), (0L, 3L), (1L, 3L)))
    // blocking output is a SUBSET of the all-pairs scan with identical counts
    val full = Dedup.ngramJaccardPairs(docs, 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(sn.subsetOf(full))
    // rank is partition-invariant (zipWithIndex over range partitions)
    val repart = Dedup.sortedNeighborhoodPairs(docs.repartition(7), windowSize = 2,
      threshNum = 1, threshDen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(repart == sn)
  }

  test("sortedNeighborhoodPairs: candidates beyond the window are not verified") {
    val s = spark; import s.implicits._
    // doc 5 is a near-dup of doc 0 but sorts far away (different prefix)
    val d = Seq(
      (0L, "aaa shared body text one two three four"),
      (1L, "bbb unrelated text entirely different here"),
      (2L, "ccc another unrelated doc goes right here"),
      (3L, "ddd more filler separating the neighborhood"),
      (4L, "eee still more filler separating them now"),
      (5L, "zzz shared body text one two three four")
    ).toDF("doc_id", "text")
    val sn = Dedup.sortedNeighborhoodPairs(d, windowSize = 2, threshNum = 1, threshDen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (0,5) share most grams but are 5 ranks apart with window 2 — missed
    // BY DESIGN (blocking recall); nothing else clears the threshold
    assert(!sn.contains((0L, 5L)))
    // widening the window past the gap recovers the pair
    val wide = Dedup.sortedNeighborhoodPairs(d, windowSize = 5, threshNum = 1, threshDen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide.contains((0L, 5L)))
  }

  test("noveltyScores: dups score zero, first doc claims shared grams") {
    val s = spark; import s.implicits._
    val d = Seq(
      (0L, "alpha beta gamma delta epsilon"),   // 3 trigrams, all novel
      (1L, "alpha beta gamma delta epsilon"),   // exact dup -> 0 novel
      (2L, "alpha beta gamma zeta eta theta")   // shares 1 trigram with 0
    ).toDF("doc_id", "text")
    val got = Dedup.noveltyScores(d)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(0L) == ((3L, 3L, 1000000L)))
    assert(got(1L) == ((3L, 0L, 0L)))
    // doc 2: 4 trigrams, "alpha beta gamma" first seen in doc 0
    assert(got(2L) == ((4L, 3L, 750000L)))
  }

  test("minHashLsh surfaces the exact-dup pair (jaccard 1 collides in every band)") {
    val pairs = Dedup.minHashLsh(docs, 16, 4, 9, 10) // verify at jaccard >= 0.9
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 3L)))
  }

  test("simHash: identical docs have identical signatures; near-dups are close") {
    val sig = Dedup.simHashSignatures(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(0L) == sig(3L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sig(0L), sig(1L)) < hamming(sig(0L), sig(4L)))
    val pairs = Dedup.simHash(docs, maxHamming = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 3L)))
  }

  test("dedupClusters converges in O(log n) rounds on a 1000-node chain") {
    val s = spark; import s.implicits._
    // worst case for plain propagation: a single path graph — the min
    // label must travel 999 hops; pointer jumping must cover it well
    // inside maxIterations (each round = 2 propagations + a jump)
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.dedupClusters(chain, maxIterations = 20).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 1000)
    assert(got.forall(_._2 == 0L), "every node must reach the chain head's label")
  }

  test("dedupClusters with reliable checkpoints produces identical clusters") {
    val s = spark; import s.implicits._
    s.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("cc-ckpt").toString)
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val local = Dedup.dedupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reliable = Dedup.dedupClusters(pairs, reliableCheckpoints = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable == local)
  }

  test("dedupClusters: min-label connected components over pair edges") {
    val s = spark; import s.implicits._
    // components: {1,2,3,9} (chain incl. transitive), {5,6}; 7-8 edge too
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 6L), (7L, 8L))
      .toDF("id_a", "id_b")
    val got = Dedup.dedupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 7L))
  }

  test("embeddingNearDup finds parallel vectors only") {
    val s = spark; import s.implicits._
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(2f, 0f, 0f, 0f)), // parallel to 0 -> cosine 1
      (2L, Array(0f, 1f, 0f, 0f)), // orthogonal
      (3L, Array(0.9f, 0.1f, 0f, 0f)) // cosine ~0.994 with 0
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(emb, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L), (0L, 3L), (1L, 3L)))
  }

  test("decontaminateEmbed drops cosine-similar rows, keeps the rest") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (10L, Array(1f, 0f, 0f, 0f), 0),   // parallel to eval vec -> dropped
      (11L, Array(0f, 1f, 0f, 0f), 1),   // orthogonal -> kept
      (12L, Array(0.9f, 0.1f, 0f, 0f), 0), // cosine ~0.994 -> dropped
      (13L, Array(-1f, 0f, 0f, 0f), 1)   // anti-parallel -> kept
    ).toDF("vec_id", "embedding", "label")
    val eval = Seq((0L, Array(2f, 0f, 0f, 0f), 9)).toDF("vec_id", "embedding", "label")
    val kept = Dedup.decontaminateEmbed(corpus, eval, 0.99)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 13L))
    // empty eval set -> nothing is contaminated
    val keptAll = Dedup.decontaminateEmbed(corpus, eval.filter($"vec_id" < 0), 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(keptAll == Set(10L, 11L, 12L, 13L))
    // survivors carry their full original row (payload columns intact)
    val labels = Dedup.decontaminateEmbed(corpus, eval, 0.99)
      .select("vec_id", "label").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(labels == Map(11L -> 1, 13L -> 1))
  }

  test("bestJaccardMatch links each left doc to its top right doc, ties to smaller id") {
    val s = spark; import s.implicits._
    val left = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "completely unrelated payload zebra xylophone quasar")
    ).toDF("doc_id", "text")
    val right = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"), // best for 0
      (11L, "the quick brown fox sat still"),
      (12L, "nothing in common with anything here at all")
    ).toDF("doc_id", "text")
    val got = Dedup.bestJaccardMatch(left, right)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 10L)) // doc 1 shares no trigram -> omitted
    // exact duplicate on both sides: score = scale (jaccard 1), id tie broken low
    val l2 = Seq((0L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val r2 = Seq((21L, "alpha beta gamma delta"), (20L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val row = Dedup.bestJaccardMatch(l2, r2).collect().head
    assert(row.getLong(1) == 20L && row.getLong(4) == 1000000000L)
  }

  test("portable minHashLsh: exact-verified pairs, still catches the exact dup") {
    // portable hashes are a different permutation family, so CANDIDATES
    // can differ from the xxhash64 path — but both verify with exact
    // Jaccard, so emitted pairs are always a subset of the exact tier
    val exact = Dedup.ngramJaccardPairs(docs, 9, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val port = Dedup.minHashLsh(docs, 16, 4, 9, 10, portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(port.subsetOf(exact))
    // jaccard-1 pair has identical signatures in every band under ANY
    // hash family -> guaranteed candidate, survives verification
    assert(port.contains((0L, 3L)))
  }

  test("portable simHash signatures are deterministic and group exact dups") {
    def sigs() = Dedup.simHashSignatures(docs, portable = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sig = sigs()
    assert(sig(0L) == sig(3L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sig(0L), sig(1L)) < hamming(sig(0L), sig(4L)))
    assert(sigs() == sig)
  }

  test("embeddingNearDupLsh: precision is exact, parallel vectors always collide") {
    val s = spark; import s.implicits._
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(2f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0.9f, 0.1f, 0f, 0f)),
      (4L, Array(-1f, 0f, 0f, 0f)) // antipodal: cosine -1 with 0
    ).toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDup(emb, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupLsh(emb, 0.99, numPlanes = 4, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every emitted pair passed the exact double-cosine verify
    assert(lsh.subsetOf(exact))
    // same-direction vectors share every plane sign -> same bucket ->
    // guaranteed candidate -> guaranteed emitted
    assert(lsh.contains((0L, 1L)))
  }

  test("embeddingNearDupClustered: precision exact, same-direction vectors co-cluster") {
    val s = spark; import s.implicits._
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(2f, 0f, 0f, 0f)), // parallel to 0 -> same cell, cos 1
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0.9f, 0.1f, 0f)), // near 2
      (4L, Array(-1f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDup(emb, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val clustered = Dedup.embeddingNearDupClustered(emb, 0.9,
      numCentroids = 3, refineIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every emitted pair passed the exact cosine verify
    assert(clustered.subsetOf(exact), s"clustered $clustered must be subset of exact $exact")
    // identical-direction vectors share the argmax cell by construction
    assert(clustered.contains((0L, 1L)))
    // determinism: same seed, same output
    val again = Dedup.embeddingNearDupClustered(emb, 0.9,
      numCentroids = 3, refineIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == clustered)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("exciseRepeatedSpans cuts a shared run from the later doc only") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "one two alpha beta gamma delta epsilon zeta three"),
      (2L, "totally unrelated content here now")
    ).toDF("doc_id", "text")
    val out = Dedup.exciseRepeatedSpans(docs, window = 4).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    // doc 0 holds the first occurrence of every repeated span: intact
    assert(out(0L) == ((6, 6, md5hex("alpha beta gamma delta epsilon zeta"))))
    // doc 1 loses exactly the 6-token shared run (positions 2..7)
    assert(out(1L) == ((9, 3, md5hex("one two three"))))
    // doc 2 shares nothing: intact
    assert(out(2L) == ((5, 5, md5hex("totally unrelated content here now"))))
    // emitText returns the reassembled document alongside the md5
    val withText = Dedup.exciseRepeatedSpans(docs, window = 4, emitText = true)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(withText(1L) == "one two three")
    assert(withText(0L) == "alpha beta gamma delta epsilon zeta")
  }

  test("exciseRepeatedSpans: exact duplicate doc is fully excised, short docs untouched") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (0L, "p q r s t u v w"),
      (1L, "p q r s t u v w"), // exact dup, longer than the window
      (2L, "tiny doc") // shorter than the window: no spans, untouched
    ).toDF("doc_id", "text")
    val out = Dedup.exciseRepeatedSpans(docs, window = 4).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(0L) == ((8, 8, md5hex("p q r s t u v w"))))
    assert(out(1L) == ((8, 0, md5hex("")))) // emitted, not dropped
    assert(out(2L) == ((2, 2, md5hex("tiny doc"))))
  }

  test("exciseRepeatedSpans handles repetition WITHIN one doc; hashed keys match raw") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (0L, "x y z w x y z w"), // internal repeat of the 4-token span
      (1L, "a b c d e f g h")
    ).toDF("doc_id", "text")
    val raw = Dedup.exciseRepeatedSpans(docs, window = 4).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    // second occurrence (positions 4..7) excised, first kept
    assert(raw(0L) == ((8, 4, md5hex("x y z w"))))
    assert(raw(1L) == ((8, 8, md5hex("a b c d e f g h"))))
    val hashed = Dedup.exciseRepeatedSpans(docs, window = 4, hashSpans = true).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(hashed == raw)
  }

  test("dedupDeltaAgainstIndex equals the from-scratch run restricted to the delta") {
    val delta = docs.filter("doc_id < 2") // docs 0, 1
    val corpus = docs.filter("doc_id >= 2") // docs 2, 3, 4
    val index = Dedup.buildMinHashIndex(corpus, 16, 4)
    val incr = Dedup.dedupDeltaAgainstIndex(delta, corpus, index, 16, 4, 1, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    graft.operators.Caches.release()
    val full = Dedup.minHashLsh(docs, 16, 4, 1, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(p => p._1 < 2 || p._2 < 2).toSet
    graft.operators.Caches.release()
    assert(incr == full && incr.nonEmpty)
    // the near/exact dup pairs that touch the delta must be present
    assert(incr.exists(p => p._1 == 0L && p._2 == 1L))
    assert(incr.exists(p => p._1 == 0L && p._2 == 3L))
    // corpus-internal pairs (e.g. none here touch only 2,3,4 besides
    // 0/1-adjacent ones) never leak in: every pair has a delta member
    assert(incr.forall(p => p._1 < 2 || p._2 < 2))
  }

  test("deleteFromMinHashIndex: purged index serves the survivor rebuild exactly") {
    val delta = docs.filter("doc_id < 2")
    val corpus = docs.filter("doc_id >= 2")
    val s = spark; import s.implicits._
    val deleted = Seq(3L).toDF("doc_id") // the corpus doc that pairs with the delta
    val purged = Dedup.deleteFromMinHashIndex(
      Dedup.buildMinHashIndex(corpus, 16, 4), deleted)
    // the purged index carries no band or size row for the deleted doc
    assert(purged.filter("doc_id = 3").isEmpty)
    val survivors = corpus.filter("doc_id <> 3")
    // rebuild-from-survivors equivalence, at the INDEX level...
    val rebuilt = Dedup.buildMinHashIndex(survivors, 16, 4)
    assert(purged.collect().map(_.toSeq).toSet == rebuilt.collect().map(_.toSeq).toSet)
    // ...and at the SERVED level: the delta dedup through the purged
    // index equals the run against the survivor corpus, and the
    // deleted doc's pair (0,3 — present pre-delete) is gone
    val incr = Dedup.dedupDeltaAgainstIndex(delta, survivors, purged, 16, 4, 1, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.operators.Caches.release()
    assert(!incr.exists(p => p._1 == 3L || p._2 == 3L))
    assert(incr.exists(p => p._1 == 0L && p._2 == 1L), "delta-delta pairs unaffected")
  }

  test("sourceOverlapMatrix attributes pairs to unordered source pairs") {
    val s = spark; import s.implicits._
    val d = Seq((1L, "A"), (2L, "B"), (3L, "A"), (4L, "C"))
      .toDF("doc_id", "source")
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.sourceOverlapMatrix(d, pairs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // (1,2): A-B; (2,3): B-A -> least/greatest folds to A-B; (1,3): A-A
    assert(got == Map(("A", "B") -> 2L, ("A", "A") -> 1L))
  }

  test("keepListFromClusters keeps the best copy per cluster and all singletons") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (1L, "short", 5L), (2L, "longest copy", 12L), (3L, "longer", 6L),
      (4L, "tied", 4L), (5L, "tied", 4L), // equal scores: smaller id wins
      (9L, "alone", 5L)
    ).toDF("doc_id", "text", "n_chars")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("doc_id", "cluster_id")
    val got = Dedup.keepListFromClusters(corpus, clusters).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), r.getInt(2)))).toMap
    assert(got(2L) == ((Some(1L), 1))) // longest in cluster 1 kept
    assert(got(1L) == ((Some(1L), 0)) && got(3L) == ((Some(1L), 0)))
    assert(got(4L) == ((Some(4L), 1)) && got(5L) == ((Some(4L), 0)))
    assert(got(9L) == ((None, 1))) // singleton: no cluster, kept
  }

  // ------------------------------------------------------------ winnowing

  test("winnowFingerprints: selected fps are real gram hashes at their positions") {
    val s = spark; import s.implicits._
    val d = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val k = 3; val w = 3
    val sel = Dedup.winnowFingerprints(d, k, w).collect()
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
    // independent recompute of every gram hash
    val words = "a b c d e f g h i j".split(" ")
    val gramHash = words.sliding(k).map(_.mkString(" ")).toArray
      .map(g => Seq(g).toDF("g")
        .select(graft.functions.mixed_hash32(org.apache.spark.sql.functions.col("g")))
        .head().getLong(0))
    assert(sel.nonEmpty)
    sel.foreach { case (pos, fp) => assert(gramHash(pos) == fp, s"pos $pos") }
    // every window of w grams contains a selected position (coverage)
    val poss = sel.keys.toSet
    (0 to gramHash.length - w).foreach { j =>
      assert((j until j + w).exists(poss), s"window at $j uncovered")
    }
  }

  test("winnowFingerprints guarantee: a shared run >= w+k-1 tokens shares a fingerprint") {
    val s = spark; import s.implicits._
    val shared = "q r s t u v" // 6 tokens = w+k-1 with k=3,w=4
    val d = Seq(
      (1L, s"x1 y1 $shared z1"),
      (2L, s"m2 $shared n2 o2"),
      (3L, "p p p p p p p p")).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(d, k = 3, w = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val f1 = fps.filter(_._1 == 1L).map(_._2).toSet
    val f2 = fps.filter(_._1 == 2L).map(_._2).toSet
    val f3 = fps.filter(_._1 == 3L).map(_._2).toSet
    assert((f1 & f2).nonEmpty) // the winnowing guarantee
    assert((f1 & f3).isEmpty && (f2 & f3).isEmpty)
  }

  test("winnowFingerprints edge cases: short docs and partition invariance") {
    val s = spark; import s.implicits._
    val d = Seq(
      (1L, "a b"), // shorter than k -> nothing
      (2L, "a b c d"), // 2 grams < w -> one all-grams window, 1 fp
      (3L, "a b c d e f g h")).toDF("doc_id", "text")
    val got = Dedup.winnowFingerprints(d, k = 3, w = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(!got.exists(_._1 == 1L))
    assert(got.count(_._1 == 2L) == 1)
    val re = Dedup.winnowFingerprints(d.repartition(5), k = 3, w = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSet == re.toSet)
  }

  test("winnowPairs finds the planted near-dup pair only") {
    val s = spark; import s.implicits._
    val base = "the five boxing wizards jump quickly over the lazy brown dog tonight"
    val d = Seq(
      (1L, base),
      (2L, base + " extra tail words here"), // near-dup of 1
      (3L, "completely different content with no shared runs at all today friends")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(d, k = 3, w = 4, minShared = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("goldenRecords: majority survives, ties break to smallest value, nulls stay null") {
    val s = spark; import s.implicits._
    val clustered = Seq(
      // cluster A: majority en (2 of 3), source tie web/wiki -> "web"
      ("A", 5L, "en", "web"),
      ("A", 3L, "en", "wiki"),
      ("A", 9L, "de", null),
      // cluster B: lang null in every member
      ("B", 7L, null, "crawl"),
      ("B", 8L, null, "crawl")
    ).toDF("cluster", "doc_id", "lang", "source")
    val out = Dedup.goldenRecords(clustered, "cluster", "doc_id", Seq("lang", "source"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    assert(out("A") == ((3L, 3L, "en", "web"))) // canonical = min id; 1-1 source tie -> "web"
    assert(out("B") == ((7L, 2L, null, "crawl"))) // all-null attr survives as null
    // deterministic under repartitioning
    val rep = Dedup.goldenRecords(clustered.repartition(5), "cluster", "doc_id",
      Seq("lang", "source")).collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    assert(rep == out)
  }

  test("goldenRecords: attrs keep their input types; quoted names don't break the expr") {
    val s = spark; import s.implicits._
    val clustered = Seq(
      ("A", 1L, 10L, java.sql.Date.valueOf("2024-01-02")),
      ("A", 2L, 10L, java.sql.Date.valueOf("2024-01-02")),
      ("A", 3L, 7L, java.sql.Date.valueOf("2024-01-01"))
    ).toDF("cluster", "doc_id", "n'chars", "day")
    val out = Dedup.goldenRecords(clustered, "cluster", "doc_id", Seq("n'chars", "day"))
    // surviving values come home under their ORIGINAL types
    assert(out.schema("n'chars").dataType == org.apache.spark.sql.types.LongType)
    assert(out.schema("day").dataType == org.apache.spark.sql.types.DateType)
    val r = out.collect()(0)
    assert(r.getLong(3) == 10L)
    assert(r.getDate(4) == java.sql.Date.valueOf("2024-01-02"))
    // nested attrs are rejected up front, not silently stringified
    val nested = clustered.withColumn("arr",
      org.apache.spark.sql.functions.array(org.apache.spark.sql.functions.col("doc_id")))
    val err = intercept[IllegalArgumentException] {
      Dedup.goldenRecords(nested, "cluster", "doc_id", Seq("arr"))
    }
    assert(err.getMessage.contains("nested"))
  }
}
