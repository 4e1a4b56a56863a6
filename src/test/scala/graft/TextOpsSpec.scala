package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

class TextOpsSpec extends AnyFunSuite with SparkTest {

  private def docs(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  // ----------------------------------------------------------- docLmScore

  test("docLmScore: typical docs outscore rare-bigram docs; counts exact") {
    val d = docs(
      (0L, "the cat sat"),        // bigrams shared with docs 1-3
      (1L, "the cat sat"),
      (2L, "the cat sat"),
      (3L, "the cat sat here"),
      (4L, "zq xv qqn mmo"),      // three singleton bigrams
      (5L, "one"),                // no bigram -> omitted
      (6L, ""))
    val rows = TextAnalysis.docLmScore(d)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(!rows.contains(5L) && !rows.contains(6L))
    assert(rows(0L)._1 == 2 && rows(3L)._1 == 3 && rows(4L)._1 == 3)
    // identical docs, identical scores
    assert(rows(0L) == rows(1L) && rows(1L) == rows(2L))
    // "the cat"/"cat sat" occur 4x each; doc 4's bigrams once each —
    // the common-phrase doc must outscore the gibberish doc
    assert(rows(0L)._3 > rows(4L)._3,
      s"typical ${rows(0L)._3} !> rare ${rows(4L)._3}")
    // avg is the exact integer floor of sum/count
    rows.values.foreach { case (n, sum, avg) => assert(avg == sum / n) }
  }

  // ---------------------------------------------------------- collocations

  test("collocations: hand-computed window-2 pairs, Dice ppm, exclusions") {
    val d = docs(
      (0L, "new york new york"),
      (1L, "big apple pie"))
    val rows = TextAnalysis.collocations(d, window = 2, minPairCount = 1, topK = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // doc 0 offsets: (1,2)(2,3)(3,4) all {new,york}; offset-2 pairs are
    // same-token and excluded => n_pair(new,york)=3, marginals 2 and 2,
    // dice = 2e6*3 div 4 = 1,500,000 (window pairs may exceed 1e6 — a
    // score, not a probability)
    assert(rows.head == ("new", "york", 3L, 2L, 2L, 1500000L))
    // doc 1: three distinct pairs, one occurrence each, dice 2e6/2 = 1e6
    val d1 = rows.filter(_._3 == 1L).toSet
    assert(d1 == Set(
      ("apple", "big", 1L, 1L, 1L, 1000000L),
      ("apple", "pie", 1L, 1L, 1L, 1000000L),
      ("big", "pie", 1L, 1L, 1L, 1000000L)))
    // minPairCount prunes singles; ordering is (dice desc, a, b)
    val pruned = TextAnalysis.collocations(d, window = 2, minPairCount = 2, topK = 10)
      .collect()
    assert(pruned.length == 1)
    assert(rows.map(r => (r._6, r._1, r._2)).sortBy(t => (-t._1, t._2, t._3)).toSeq
      == rows.map(r => (r._6, r._1, r._2)).toSeq)
  }

  test("collocations: window reach and cross-doc isolation") {
    val d = docs(
      (0L, "a b c d"),  // window 3: a pairs with b,c,d
      (1L, "x y"))
    val rows = TextAnalysis.collocations(d, window = 3, minPairCount = 1, topK = 20)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"), ("x", "y")))
    // no (a,x)-style cross-document pair can exist by construction
  }

  // ------------------------------------------------------------- redactPii

  test("redactPii replaces each PII category with its tag and counts hits") {
    val d = docs(
      (1L, "mail a.smith+x@corp.example.org or b@x.io from 192.168.1.254 now"),
      (2L, "call 555-867-5309 or 555.123.4567 acct 123456789 ref 98765432100"),
      (3L, "clean text with no pii at all"))
    val out = TextAnalysis.redactPii(d).collect()
      .map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getInt(1) == 2 && out(1L).getInt(2) == 1)
    assert(out(1L).getString(5) ==
      "mail <EMAIL> or <EMAIL> from <IP> now")

    assert(out(2L).getInt(3) == 2 && out(2L).getInt(4) == 2)
    assert(out(2L).getString(5) == "call <PHONE> or <PHONE> acct <NUM> ref <NUM>")

    assert(out(3L).getInt(1) == 0 && out(3L).getInt(2) == 0 &&
      out(3L).getInt(3) == 0 && out(3L).getInt(4) == 0)
    assert(out(3L).getString(5) == "clean text with no pii at all")
  }

  test("redactPii does not double-count digits inside an email") {
    // 123456789 has 9+ digits but sits inside the email local part —
    // \b never splits adjacent word chars, so no long-number hit
    val out = TextAnalysis.redactPii(docs((1L, "x123456789@example.com"))).collect().head
    assert(out.getInt(1) == 1, "email must match")
    assert(out.getInt(4) == 0, "no long-number hit inside the email")
    assert(out.getString(5) == "<EMAIL>")
  }

  // ---------------------------------------------------- repetitionSignals

  test("repetitionSignals computes token and bigram repetition exactly") {
    val d = docs(
      (1L, "buy now buy now buy later"), // 'buy'×3; 'buy now'×2
      (2L, "all words here differ"),
      (3L, "one")) // single token: no bigrams
    val out = TextAnalysis.repetitionSignals(d).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(out(1L) == ((6, 3, 3, 2)))
    assert(out(2L) == ((4, 4, 1, 1)))
    assert(out(3L) == ((1, 1, 1, 0)))
  }

  test("chunkDocuments cuts fixed windows in order with a ragged tail") {
    val d = docs((1L, (1 to 7).map(i => s"t$i").mkString(" ")), (2L, "solo"))
    val out = TextAnalysis.chunkDocuments(d, chunkTokens = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getInt(2), r.getString(3))).toMap
    assert(out((1L, 0)) == ((3, "t1 t2 t3")))
    assert(out((1L, 1)) == ((3, "t4 t5 t6")))
    assert(out((1L, 2)) == ((1, "t7"))) // ragged tail
    assert(out((2L, 0)) == ((1, "solo")))
    assert(out.size == 4)
  }

  test("chunkDocuments order survives repartitioning (ordered aggregate)") {
    val text = (1 to 200).map(i => s"w$i").mkString(" ")
    val d = docs((1L, text)).repartition(8)
    val chunks = TextAnalysis.chunkDocuments(d, chunkTokens = 64).collect()
      .map(r => r.getInt(1) -> r.getString(3)).toMap
    assert(chunks(0).startsWith("w1 w2 w3") && chunks(0).endsWith("w64"))
    assert(chunks(3) == (193 to 200).map(i => s"w$i").mkString(" "))
  }

  test("repetitionSignals flags degenerate repetition") {
    val boiler = Seq.fill(50)("lorem ipsum").mkString(" ")
    val out = TextAnalysis.repetitionSignals(docs((1L, boiler))).collect().head
    // 100 tokens, 2 distinct, top token 50, top bigram ('ipsum lorem'
    // 49 + 'lorem ipsum' 50) = 50
    assert(out.getInt(1) == 100 && out.getInt(2) == 2 &&
      out.getInt(3) == 50 && out.getInt(4) == 50)
  }

  test("lexiconRelevance counts lexicon tokens with multiplicity, zero-docs survive") {
    val d = docs(
      (1L, "spark join hash join scan"), // join x2, hash, scan -> 4 of 5 tokens
      (2L, "nothing relevant here"),
      (3L, "JOIN Join"))// tokenizer lowercases -> 2 hits
    val out = TextAnalysis.lexiconRelevance(d, Seq("join", "hash", "scan"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(out == Map(1L -> ((5, 4L)), 2L -> ((3, 0L)), 3L -> ((2, 2L))))
  }

  test("bpePairStats counts adjacent char pairs inside words, corpus-wide") {
    // "ab ab" -> pairs ab, ab; "abc" -> ab, bc; "a" and "" contribute none
    val d = docs((1L, "ab  Ab"), (2L, "abc"), (3L, "a"), (4L, ""))
    val out = TextAnalysis.bpePairStats(d, topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toList
    assert(out == List("ab" -> 3L, "bc" -> 1L)) // count desc, pair asc
    // topK truncates after the deterministic (count desc, pair) order
    val top1 = TextAnalysis.bpePairStats(d, topK = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toList
    assert(top1 == List("ab" -> 3L))
  }

  // -------------------------------------------------------- bpeTrainMerges

  test("bpeTrainMerges learns the classic low/lower/lowest merge sequence") {
    val d = docs((1L, "low lower lowest"))
    val out = TextAnalysis.bpeTrainMerges(d, rounds = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toList
    graft.operators.Caches.release()
    // round 1: "l o" and "o w" tie at 3 — lexicographic tie-break picks "l o";
    // round 4: three pairs tie at 1 — "lowe r" is the smallest
    assert(out == List(
      (1, "l o", 3L), (2, "lo w", 3L), (3, "low e", 2L), (4, "lowe r", 1L)))
  }

  test("bpeTrainMerges fuses adjacent occurrences greedily left-to-right") {
    // "a a a a" as one word "aaaa": round 1 merges (a,a) twice (greedy
    // non-overlap -> [aa, aa]), round 2 merges (aa,aa) once
    val d = docs((1L, "aaaa aaaa"))
    val out = TextAnalysis.bpeTrainMerges(d, rounds = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toList
    graft.operators.Caches.release()
    assert(out == List((1, "a a", 6L), (2, "aa aa", 2L)))
  }

  test("bpeTrainMerges weights pairs by corpus word frequency") {
    // "xy" occurs 3 times, "zq" once -> (x,y) outscores (z,q)
    val d = docs((1L, "xy xy zq"), (2L, "xy"))
    val out = TextAnalysis.bpeTrainMerges(d, rounds = 1)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toList
    graft.operators.Caches.release()
    assert(out == List((1, "x y", 3L)))
  }

  // ------------------------------------------------------ bpeEncodedCounts

  test("bpeEncodedCounts applies learned merges: per-doc encoded lengths") {
    // after 4 merges (l o, lo w, low e, lowe r): low -> [low],
    // lower -> [lower] (round 4 fuses it whole), lowest -> [lowe, s, t]
    // => 1 + 1 + 3 symbols
    val d = docs((1L, "low lower lowest"), (2L, "low low"))
    val out = TextAnalysis.bpeEncodedCounts(d, rounds = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    graft.operators.Caches.release()
    assert(out == Map(1L -> ((3L, 5L)), 2L -> ((2L, 2L))))
  }

  // ------------------------------------------------- sourceDistinctiveTerms

  test("sourceDistinctiveTerms ranks by tf/source-df with deterministic ties") {
    val s = spark; import s.implicits._
    val d = Seq(
      (1L, "A", "alpha alpha beta"),
      (2L, "B", "beta gamma")).toDF("doc_id", "source", "text")
    val out = graft.operators.TextAnalysis.sourceDistinctiveTerms(d, k = 1)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    // A: alpha 2/1 beats beta 1/2; B: gamma 1/1 beats beta 1/2
    assert(out == Map("A" -> (("alpha", 2, 1)), "B" -> (("gamma", 1, 1))))
  }

  // --------------------------------------------------------- normalizeText

  test("normalizeText: NFC, zero-width/quote/dash/control scrub, whitespace collapse") {
    // built from escapes: decomposed e+COMBINING ACUTE, curly quotes,
    // em dash, ZWSP, NBSP, double space, a BEL control char
    val messy = "Cafe\u0301 \u201Cq\u201D \u2014 \u200Bx\u00A0y \u2018z\u2019  tail"
    val d = docs((1L, messy), (2L, "plain ascii stays"), (3L, "ctl\u0007chars"))
    val out = TextAnalysis.normalizeText(d).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L)._3 == "Caf\u00E9 \"q\" - x y 'z' tail")
    assert(out(1L)._1 == 26 && out(1L)._2 == 23)
    assert(out(2L) == ((17, 17, "plain ascii stays")))
    assert(out(3L)._3 == "ctlchars")
  }

  test("nfc expression composes decomposed sequences and passes normalized text through") {
    val s = spark; import s.implicits._
    val out = Seq(("e\u0301", "\u00E9", "abc"))
      .toDF("decomposed", "composed", "ascii")
      .select(
        graft.functions.nfc(col("decomposed")).as("a"),
        graft.functions.nfc(col("composed")).as("b"),
        graft.functions.nfc(col("ascii")).as("c"))
      .head()
    assert(out.getString(0) == "\u00E9" && out.getString(1) == "\u00E9" &&
      out.getString(2) == "abc")
  }

  // --------------------------------------------------------- bigramLmStats

  test("bigramLmStats computes exact-integer Kneser-Ney ppm") {
    // "a b a b": bigrams (a,b)x2, (b,a)x1; T=2 types
    // kn(a,b) = (8-3)e6 // 8 + 3*1*1e6 // 16 = 625000 + 187500
    // kn(b,a) = (4-3)e6 // 4 + 3*1*1e6 // 8  = 250000 + 375000
    val d = docs((1L, "a b a b"))
    val out = TextAnalysis.bigramLmStats(d, topK = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toList
    graft.operators.Caches.release()
    assert(out == List(
      ("a", "b", 2L, 2L, 1L, 1L, 812500L),
      ("b", "a", 1L, 1L, 1L, 1L, 625000L)))
  }

  test("bigramLmStats does not pair across document boundaries") {
    val d = docs((1L, "p q"), (2L, "q r"))
    val got = TextAnalysis.bigramLmStats(d, topK = 10).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    graft.operators.Caches.release()
    assert(got == Set(("p", "q"), ("q", "r")))
  }

  // --------------------------------------------------------------- oovRate

  test("oovRate: hand-computed coverage against the top-2 vocabulary") {
    // counts: a=3, b=1, c=1 -> top-2 by (count desc, token) = {a, b}
    val d = docs((0L, "a a b"), (1L, "a c"), (2L, ""))
    val rows = TextAnalysis.oovRate(d, vocabSize = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    graft.operators.Caches.release()
    assert(!rows.contains(2L)) // tokenless doc omitted
    assert(rows(0L) == ((3L, 0L, 0L)))
    assert(rows(1L) == ((2L, 1L, 500000L))) // "c" is OOV
  }

  // ------------------------------------------------------ importanceScores

  test("importanceScores: target-like docs outscore off-target; invariant") {
    val s = spark; import s.implicits._
    val d = Seq(
      (0L, "alpha beta gamma alpha beta", "en"),
      (1L, "alpha beta gamma", "en"),
      (2L, "alpha beta gamma beta", "fr"), // target-vocabulary doc
      (3L, "zuzu qort mlep zuzu qort", "fr"), // shares nothing with target
      (4L, "", "fr")) // tokenless -> omitted
      .toDF("doc_id", "text", "lang")
    val scores = TextAnalysis.importanceScores(d, col("lang") === "en")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    graft.operators.Caches.release()
    assert(!scores.contains(4L))
    assert(scores(0L)._1 == 5 && scores(2L)._1 == 4 && scores(3L)._1 == 5)
    // docs over the target vocabulary must outscore the disjoint doc —
    // both for a target member (0) and an off-target lookalike (2),
    // which is the doc DSIR selection exists to find
    assert(scores(2L)._2 > scores(3L)._2,
      s"lookalike ${scores(2L)._2} !> disjoint ${scores(3L)._2}")
    assert(scores(0L)._2 > scores(3L)._2)
    // partitioning cannot move a single ppm
    val rep = TextAnalysis.importanceScores(
      d.repartition(7), col("lang") === "en")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    graft.operators.Caches.release()
    assert(rep == scores)
  }

  test("compositeQuality: hand-computed normalization and integer fusion") {
    val s = spark; import s.implicits._
    val d = Seq(
      (1L, "the cat sat on a mat"), // 6 tokens, 6 distinct, 2 stopword hits
      (2L, "dup dup dup dup"), // 4 tokens, 1 distinct, 0 hits
      (3L, "one two three four five six seven eight") // 8 tokens, 8 distinct, 0 hits
    ).toDF("doc_id", "text")
    val out = TextAnalysis.compositeQuality(d)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // len: min 4 max 8 -> doc1 (6-4)*1e6/4 = 500000; div: doc2 floor(1e6/4)=250000
    // is min, doc1/doc3 1e6 is max; stop: doc1 2*1e6/6=333333 max, others 0 min
    assert(out(1L) == ((500000L, 1000000L, 1000000L, 833333L)))
    assert(out(2L) == ((0L, 0L, 0L, 0L)))
    assert(out(3L) == ((1000000L, 1000000L, 0L, 666666L)))
  }

  test("compressionSignals: repetition compresses below prose; deterministic") {
    val s = spark; import s.implicits._
    val d = Seq(
      (1L, "abc " * 200), // highly redundant
      (2L, (1 to 200).map(i => s"w${i * 7919 % 997}x$i").mkString(" ")) // high-entropy-ish
    ).toDF("doc_id", "text")
    val out = TextAnalysis.compressionSignals(d)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L)._3 < out(2L)._3, s"repetitive doc should compress harder: $out")
    assert(out(1L)._2 > 0 && out(1L)._3 > 0)
    // deterministic across runs and partitionings
    val again = TextAnalysis.compressionSignals(d.repartition(3))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(again == out)
  }

  test("slidingWindows: overlap, ragged tail, and the stride=window degenerate case") {
    val s = spark; import s.implicits._
    // 10 tokens, window 4, stride 2 -> starts 0,2,4,6 (6 covers 6..9);
    // window 6 is the last start ((10-4+1)/2 rounded up = 3 -> idx 3)
    val d = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val w = TextAnalysis.slidingWindows(d, windowTokens = 4, stride = 2)
      .collect().map(r => r.getInt(1) -> (r.getInt(2), r.getString(3))).toMap
    assert(w == Map(
      0 -> (4, "t0 t1 t2 t3"),
      1 -> (4, "t2 t3 t4 t5"),
      2 -> (4, "t4 t5 t6 t7"),
      3 -> (4, "t6 t7 t8 t9")))
    // 9 tokens, window 4, stride 3 -> starts 0, 3; last start ceil(5/3)=2 covers tail
    val d2 = Seq((1L, "a b c d e f g h i")).toDF("doc_id", "text")
    val w2 = TextAnalysis.slidingWindows(d2, windowTokens = 4, stride = 3)
      .collect().map(r => r.getInt(1) -> r.getString(3)).toMap
    assert(w2 == Map(0 -> "a b c d", 1 -> "d e f g", 2 -> "g h i"))
    // stride == window reproduces chunkDocuments except the tail rule
    val short = Seq((1L, "x y z")).toDF("doc_id", "text")
    val w3 = TextAnalysis.slidingWindows(short, windowTokens = 8, stride = 8)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
    assert(w3.toSeq == Seq((0, 3, "x y z")))
  }

  test("vocabCoverageCurve: hand-computed OOV ppm at each vocab size") {
    val s = spark; import s.implicits._
    // frequencies: a×4, b×2, c×1, d×1 (ties c<d lexicographic)
    val d = Seq((1L, "a a b c"), (2L, "a a b d")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverageCurve(d, Seq(1, 2, 3, 4))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    // total 8 occurrences; ranks: a=1, b=2, c=3, d=4
    assert(out(1) == ((3L, 500000L))) // b,c,d OOV: 4/8
    assert(out(2) == ((2L, 250000L))) // c,d: 2/8
    assert(out(3) == ((1L, 125000L))) // d: 1/8
    assert(out(4) == ((0L, 0L)))
  }

  test("novelty-curve composition: deciles partition each source, novelty conserved") {
    val s = spark; import s.implicits._
    // 2 sources, 5 docs each; doc texts share one trigram run so later
    // docs yield fewer novel grams
    val base = "alpha beta gamma delta epsilon zeta"
    val docs = (0 until 10).map { i =>
      (i.toLong, if (i % 2 == 0) "web" else "wiki", s"$base token$i extra$i")
    }.toDF("doc_id", "source", "text")
    val nov = graft.operators.Dedup.noveltyScores(docs).select("doc_id", "n_novel")
    val curve = docs.join(nov, Seq("doc_id"), "left")
      .withColumn("n_novel", coalesce(col("n_novel"), lit(0L)))
    graft.operators.Caches.release()
    // every gram's first occurrence is attributed exactly once
    val totalNovel = curve.agg(sum("n_novel")).head().getLong(0)
    val distinctGrams = graft.operators.Dedup.trigramSets(docs)
      .select("gram").distinct().count()
    assert(totalNovel == distinctGrams)
    // the first doc of the global order holds the shared run's grams
    val first = curve.filter(col("doc_id") === 0L).head().getAs[Long]("n_novel")
    val later = curve.filter(col("doc_id") === 9L).head().getAs[Long]("n_novel")
    assert(first > later)
  }


  test("readabilityBySource: hand-computed Flesch on exact counts") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "Hello world. Nice day!", "w"),
      (2L, "no terminator here", "w") // sentence count floors at 1
    ).toDF("doc_id", "text", "source")
    val r = graft.operators.TextAnalysis.readabilityBySource(docs).collect().head
    assert(r.getLong(1) == 2L)
    assert(r.getLong(2) == 4L + 3L, "words")
    assert(r.getLong(3) == 2L + 1L, "sentence runs, floored")
    // hello(e,o) world(o) nice(i,e) day(a) = 6; no(o) terminator(e,i,a,o) here(e,e) = 7
    assert(r.getLong(4) == 6L + 7L, "vowel-group syllable proxy")
    val expected = 206.835 - 1.015 * (7.0 / 3.0) - 84.6 * (13.0 / 7.0)
    assert(math.abs(r.getDouble(5) - expected) < 1e-12)
  }

  test("multi_count: Aho-Corasick counts all occurrences, nested and overlapping") {
    val s = spark; import s.implicits._
    val pats = Seq("table scan", "scan", "aa", "missing")
    val d = Seq(
      (1L, "table scan then another scan"), // "table scan" 1, "scan" 2
      (2L, "aaa"), // "aa" overlaps itself: positions 0 and 1
      (3L, "nothing here")
    ).toDF("doc_id", "text")
    val got = d.select($"doc_id",
      graft.functions.multi_count($"text", pats).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == Seq(1L, 2L, 0L, 0L))
    assert(got(2L) == Seq(0L, 0L, 2L, 0L))
    assert(got(3L) == Seq(0L, 0L, 0L, 0L))
    // direct automaton check incl. a pattern that is a suffix of another
    val ac = new graft.plans.AhoCorasick(Seq("he", "she", "his", "hers"))
    assert(ac.counts("ushers".getBytes("UTF-8")).toSeq == Seq(1L, 1L, 0L, 1L))
  }

  // ------------------------------------------------- linear probe

  test("linear probe separates a token-disjoint fixture and is partition-invariant") {
    val s = spark; import s.implicits._
    // class 1 docs speak only "spam"-side tokens, class 0 only "ham":
    // three GD rounds on disjoint vocabularies must separate margins
    val docs = (0 until 20).map { i =>
      val y1 = i % 2 == 1
      val txt = if (y1) "win free prize now win free" else "meeting notes agenda review notes"
      (i.toLong, txt, if (y1) "pos" else "neg")
    }.toDF("doc_id", "text", "source")
    val cond = col("source") === "pos"
    val scores = TextAnalysis.probeScores(docs, cond, buckets = 8, iters = 3, lr = 1.0 / 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val pos = scores.filter(_._2 == 1).map(_._3)
    val neg = scores.filter(_._2 == 0).map(_._3)
    assert(pos.min > neg.max,
      s"probe failed to separate: pos=${pos.toSeq} neg=${neg.toSeq}")
    // exact-integer gradients: weights identical under repartitioning
    val w1 = TextAnalysis.trainLinearProbe(docs, cond, buckets = 8, iters = 3, lr = 1.0 / 64)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val w2 = TextAnalysis.trainLinearProbe(docs.repartition(7), cond,
      buckets = 8, iters = 3, lr = 1.0 / 64)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(w1 == w2, "training drifted under repartitioning")
    // squared loss decreases over rounds (GD actually descends)
    def sse(it: Int): Double = {
      val sc = TextAnalysis.probeScores(docs, cond, buckets = 8, iters = it, lr = 1.0 / 64)
        .collect().map(r => (r.getInt(1), r.getLong(2)))
      sc.map { case (y, ppm) => val m = ppm / 1e6; (m - y) * (m - y) }.sum
    }
    assert(sse(3) < sse(1), "loss did not decrease from round 1 to round 3")
  }

  test("probePrCurve is monotone in kept count and probeThreshold picks the loosest qualifying bin") {
    val s = spark; import s.implicits._
    val docs = (0 until 40).map { i =>
      val y1 = i % 2 == 0
      // separable vocab => high bins are pure positive
      (i.toLong, if (y1) "win free prize now" else "meeting agenda notes review",
        if (y1) "pos" else "neg")
    }.toDF("doc_id", "text", "source")
    val cond = col("source") === "pos"
    val curve = TextAnalysis.probePrCurve(docs, cond, bins = 4, buckets = 8,
      iters = 3, lr = 1.0 / 64)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    // keeping-from-bin-0 keeps everything; kept counts shrink as the bin rises
    assert(curve.head._2 == 40 && curve.head._5 == 1000000L)
    assert(curve.map(_._2).reverse.sorted.sameElements(curve.map(_._2).reverse),
      "n_kept must be non-increasing in bin")
    // separable fixture: the top bin is pure positive
    assert(curve.last._4 == 1000000L, s"top bin must be pure: ${curve.toSeq}")
    val pick = TextAnalysis.probeThreshold(docs, cond, targetPrecisionPpm = 900000L,
      bins = 4, buckets = 8, iters = 3, lr = 1.0 / 64)
      .collect().map(r => (r.getInt(0), r.getLong(3)))
    assert(pick.length == 1 && pick.head._2 >= 900000L)
    val qualifying = curve.filter(_._4 >= 900000L).map(_._1)
    assert(pick.head._1 == qualifying.min, "must pick the loosest qualifying bin")
    // unreachable target -> empty, not an error
    assert(TextAnalysis.probeThreshold(docs, cond, targetPrecisionPpm = 2000000L,
      bins = 4, buckets = 8, iters = 3, lr = 1.0 / 64).count() == 0)
  }

  test("probeKeepDocs equals the threshold pick applied to the score bins") {
    val s = spark; import s.implicits._
    val docs = (0 until 40).map { i =>
      val y1 = i % 2 == 0
      (i.toLong, if (y1) "win free prize now" else "meeting agenda notes review",
        if (y1) "pos" else "neg")
    }.toDF("doc_id", "text", "source")
    val cond = col("source") === "pos"
    val keep = TextAnalysis.probeKeepDocs(docs, cond, targetPrecisionPpm = 900000L,
      bins = 4, buckets = 8, iters = 3, lr = 1.0 / 64)
      .collect().map(_.getLong(0)).toSet
    // independent derivation: bin each score, keep bins >= the pick
    val pickBin = TextAnalysis.probeThreshold(docs, cond, 900000L,
      bins = 4, buckets = 8, iters = 3, lr = 1.0 / 64)
      .collect().head.getInt(0)
    val sc = TextAnalysis.probeScores(docs, cond, buckets = 8, iters = 3, lr = 1.0 / 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
    val (mn, mx) = (sc.map(_._2).min, sc.map(_._2).max)
    val expect = sc.filter { case (_, p) =>
      ((p - mn) * 4 / (mx - mn + 1)).toInt >= pickBin }.map(_._1).toSet
    assert(keep == expect)
    // separable fixture at 90% precision: keeps positives only
    val ys = docs.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(keep.forall(ys(_) == "pos"), "kept docs must be the positive class")
    // unreachable target -> empty keep set (fail-closed)
    assert(TextAnalysis.probeKeepDocs(docs, cond, targetPrecisionPpm = 2000000L,
      bins = 4, buckets = 8, iters = 3, lr = 1.0 / 64).count() == 0)
  }

  test("probeCalibration bins cover all docs with integer positive rates") {
    val s = spark; import s.implicits._
    val docs = (0 until 30).map { i =>
      val y1 = i % 3 == 0
      (i.toLong, if (y1) "alpha beta gamma" else "delta epsilon zeta eta",
        if (y1) "pos" else "neg")
    }.toDF("doc_id", "text", "source")
    val cal = TextAnalysis.probeCalibration(docs, col("source") === "pos",
      bins = 5, buckets = 8, iters = 2, lr = 1.0 / 64)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(cal.map(_._2).sum == 30, "bins must cover every doc")
    assert(cal.forall { case (b, n, p, ppm) =>
      b >= 0 && b < 5 && p <= n && ppm == p * 1000000L / n })
  }

  test("zipfSlope: steep for power-law text, near-flat for a uniform vocabulary") {
    val s = spark; import s.implicits._
    // power-law source: token k appears ~ 64/k times (harmonic head);
    // uniform source: every token exactly 5 times (slope -> 0)
    val power = (1 to 32).flatMap(k => Seq.fill(64 / k)(s"w$k")).mkString(" ")
    val flat = (1 to 32).flatMap(k => Seq.fill(5)(s"u$k")).mkString(" ")
    val df = Seq((1L, "pw", power), (2L, "fl", flat))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.zipfSlope(df, topK = 32)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(4)))).toMap
    val (nPw, slopePw, r2Pw) = out("pw")
    val (nFl, slopeFl, _) = out("fl")
    assert(nPw == 32 && nFl == 32)
    assert(slopePw < -0.8 && slopePw > -1.2, s"harmonic head fits near -1: $slopePw")
    assert(r2Pw > 0.9, s"power-law fit should be tight: $r2Pw")
    assert(math.abs(slopeFl) < 1e-9, s"uniform vocabulary is flat: $slopeFl")
  }

  test("bpeMerges: reference merge order on a hand corpus, left-first runs, exhaustion stops early") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    // round 1: (a,a) weighted 2*2=4 beats (a,b)=3; left-first collapse
    //   makes aaab -> (aa, a, b), the reference BPE behavior
    // round 2: (a,b)=3 beats (aa,a)=2; round 3: (aa,ab)=2; then no
    //   pairs remain -> k=4 returns only 3 merges
    val m = graft.operators.TextAnalysis.bpeMerges(docs, k = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    graft.operators.Caches.release()
    assert(m == Seq(
      (1, "a", "a", "aa", 4L),
      (2, "a", "b", "ab", 3L),
      (3, "aa", "ab", "aaab", 2L)))
  }
}
