package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._
import graft.operators.{Dedup, Merge, MergeSpec}

/** Property-based checks (SURVEY §5.4): merge idempotency, single
  * survivor per dedup key, banding totality, rolling-hash consistency.
  * Uses ScalaCheck generators with fixed seeds (no scalatestplus bridge
  * in the offline resolver).
  */
class PropertySpec extends AnyFunSuite with SparkTest {

  private def samples[A](g: Gen[A], n: Int, seed: Long = 42L): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("property: gridPairs is radius-monotone and translation-invariant") {
    val s = spark; import s.implicits._
    for (round <- 0 until 3) {
      val gen = Gen.zip(Gen.chooseNum(0L, 5000L), Gen.chooseNum(0L, 5000L))
      val pts = samples(gen, 150, seed = 7L + round).zipWithIndex
        .map { case ((x, y), i) => (i.toLong, x, y) }
      val df = pts.toDF("id", "x", "y")
      def pairSet(d: org.apache.spark.sql.DataFrame, r: Long) =
        graft.operators.Geo.gridPairs(d, r)
          .collect().map(w => (w.getLong(0), w.getLong(1), w.getLong(2))).toSet
      val small = pairSet(df, 400L)
      val big = pairSet(df, 800L)
      // radius-monotone: everything within 400 is within 800, with the
      // SAME exact distance
      assert(small.subsetOf(big), s"round=$round: pairs(400) ⊄ pairs(800)")
      assert(big.exists(p => p._3 > 400L * 400L),
        "the bigger radius must actually admit farther pairs")
      // translation-invariant: shifting all points moves cell
      // boundaries but must not change a single match or distance
      val shifted = pts.map { case (i, x, y) => (i, x + 137L, y + 291L) }
        .toDF("id", "x", "y")
      assert(pairSet(shifted, 400L) == small, s"round=$round: shift changed pairs")
    }
  }

  test("property: asofJoin matches a brute-force reference on random timelines") {
    val s = spark; import s.implicits._
    for (round <- 0 until 4) {
      // small key/time domains force heavy collisions: equal timestamps
      // across and within sides, empty keys, multi-match timelines
      val gen = Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 20L))
      val rightRows = samples(gen, 40).zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
      val leftRows = samples(gen, 30).zipWithIndex
        .map { case ((k, t), i) => (1000L + i, k, t) }

      // reference: latest right with same key, ts <= left ts; ties on
      // ts resolved to the highest right id
      def expected(k: Long, t: Long): Option[Long] = {
        val c = rightRows.filter(r => r._2 == k && r._3 <= t)
        if (c.isEmpty) None else Some(c.maxBy(r => (r._3, r._1))._1)
      }

      val left = leftRows.toDF("event_id", "user_id", "t")
        .withColumn("ts", timestamp_seconds(col("t") + 1700000000L)).drop("t")
      val right = rightRows.toDF("r_id", "user_id", "t")
        .withColumn("ts", timestamp_seconds(col("t") + 1700000000L)).drop("t")

      val got = graft.operators.AsOf.asofJoin(
        left, right, Seq("user_id"), "ts", "r_id", Seq("r_id"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toMap
      for ((id, k, t) <- leftRows)
        assert(got(id) == expected(k, t), s"round=$round left=$id key=$k t=$t")
    }
  }

  test("property: aqiCategory is total and matches the reference python bands") {
    def referenceBand(aqi: Int): String =
      if (0 <= aqi && aqi <= 50) "Good"
      else if (51 <= aqi && aqi <= 100) "Moderate"
      else if (101 <= aqi && aqi <= 150) "Unhealthy for Sensitive Groups"
      else if (151 <= aqi && aqi <= 200) "Unhealthy"
      else if (201 <= aqi && aqi <= 300) "Very Unhealthy"
      else if (aqi > 300) "Hazardous"
      else "Unknown"
    val s = spark; import s.implicits._
    val values = samples(Gen.chooseNum(-1000, 1000), 300)
    val got = values.toDF("aqi").select($"aqi", aqiCategory($"aqi")).collect()
      .map(r => r.getInt(0) -> r.getString(1))
    got.foreach { case (aqi, cat) => assert(cat == referenceBand(aqi), s"aqi=$aqi") }
  }

  test("property: merge of random source into random target is idempotent") {
    val s = spark; import s.implicits._
    for (round <- 0 until 5) {
      val pairs = samples(Gen.zip(Gen.chooseNum(0L, 20L), Gen.alphaStr.map(_.take(5))), 30)
      val src = pairs.distinctBy(_._1).toDF("k", "v")
      val spec = MergeSpec(Seq("k"), Seq("v"))
      val now = to_timestamp(lit("2024-06-01 00:00:00"))
      val tgt = src.limit(0)
      val once = Merge.scd1(tgt, src, spec, now)
      val twice = Merge.scd1(once, src, spec, now)
      val a = once.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val b = twice.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(a == b, s"round=$round")
    }
  }

  test("property: exact dedup keeps exactly one survivor per distinct text") {
    val s = spark; import s.implicits._
    for (round <- 0 until 5) {
      val texts = samples(Gen.oneOf("aa", "bb", "cc", "dd", "ee"), 40 + round)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = Dedup.exact(docs).collect()
      assert(out.length == texts.distinct.length)
      assert(out.map(_.getLong(2)).sum == texts.length) // copies partition the corpus
      out.foreach { r =>
        val minId = docs.filter(md5(col("text")) === r.getString(0))
          .agg(min("doc_id")).head().getLong(0)
        assert(r.getLong(1) == minId) // survivor is smallest id of its group
      }
    }
  }

  test("property: nGramSets matches a reference implementation on random docs") {
    val s = spark; import s.implicits._
    val word = Gen.oneOf("the", "fox", "ran", "over", "a", "dog", "and", "cat")
    val docGen = Gen.chooseNum(0, 7).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    for (n <- Seq(1, 2, 3)) {
      val texts = samples(docGen, 60)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      def refGrams(t: String): Set[String] = {
        val toks = t.trim.toLowerCase.split("\\s+").toSeq
        if (toks.length < n) Set.empty else toks.sliding(n).map(_.mkString(" ")).toSet
      }
      val got = Dedup.nGramSets(docs, n).collect()
        .map(r => (r.getLong(0), r.getString(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val expected = refGrams(t)
        assert(got.getOrElse(i.toLong, Set.empty) == expected, s"n=$n doc=$i text='$t'")
      }
    }
  }

  test("property: ngramJaccardPairs is ordered, symmetric-free, and threshold-exact") {
    val s = spark; import s.implicits._
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val docGen = Gen.chooseNum(3, 8).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val texts = samples(docGen, 25)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Dedup.ngramJaccardPairs(docs, 1, 10).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    got.keys.foreach { case (a, b) => assert(a < b) }
    // brute-force reference over all pairs
    def grams(t: String): Set[String] = {
      val toks = t.trim.toLowerCase.split("\\s+").toSeq
      if (toks.length < 3) Set.empty else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val gsets = texts.map(grams)
    for (a <- texts.indices; b <- texts.indices if a < b) {
      val inter = (gsets(a) & gsets(b)).size
      val union = (gsets(a) | gsets(b)).size
      val expectPair = inter > 0 && inter * 10 >= union * 1
      val gotPair = got.get((a.toLong, b.toLong))
      assert(gotPair.isDefined == expectPair, s"pair ($a,$b) inter=$inter union=$union")
      gotPair.foreach { case (i2, u2) => assert(i2 == inter && u2 == union) }
    }
  }

  test("property: prefix-filter join equals the all-grams join on random corpora") {
    val s = spark; import s.implicits._
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val docGen = Gen.chooseNum(3, 9).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    // several corpora × several thresholds: the lemma must hold everywhere
    for (round <- 0 until 3; (num, den) <- Seq((1, 10), (1, 2), (4, 5))) {
      val texts = samples(docGen, 30, seed = 100 + round)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val full = Dedup.ngramJaccardPairs(docs, num, den).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val pref = Dedup.ngramJaccardPairsPrefix(docs, num, den).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(pref == full, s"round=$round threshold=$num/$den")
      graft.operators.Caches.release()
    }
  }

  test("property: containment pairs match a brute-force reference on random corpora") {
    val s = spark; import s.implicits._
    val word = Gen.oneOf("one", "two", "three", "four", "five", "six", "seven")
    val docGen = Gen.chooseNum(3, 9).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val texts = samples(docGen, 30)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Dedup.ngramContainmentPairs(docs, 1, 2).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(5)))).toMap
    def grams(t: String): Set[String] = {
      val toks = t.trim.toLowerCase.split("\\s+").toSeq
      if (toks.length < 3) Set.empty else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val gsets = texts.map(grams)
    for (a <- texts.indices; b <- texts.indices if a < b) {
      val inter = (gsets(a) & gsets(b)).size
      val minSz = math.min(gsets(a).size, gsets(b).size)
      val expectPair = inter > 0 && inter * 2 >= minSz
      val gotPair = got.get((a.toLong, b.toLong))
      assert(gotPair.isDefined == expectPair, s"pair ($a,$b) inter=$inter min=$minSz")
      gotPair.foreach { case (i2, ppm) =>
        assert(i2 == inter && ppm == inter * 1000000L / minSz)
      }
    }
  }

  test("property: novelty totals — novel grams per doc sum to the corpus vocabulary") {
    val s = spark; import s.implicits._
    val word = Gen.oneOf("red", "green", "blue", "cyan", "teal", "pink")
    val docGen = Gen.chooseNum(3, 9).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val texts = samples(docGen, 40)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rows = Dedup.noveltyScores(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def grams(t: String): Set[String] = {
      val toks = t.trim.toLowerCase.split("\\s+").toSeq
      if (toks.length < 3) Set.empty else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val vocab = texts.flatMap(grams).toSet
    // every gram attributed exactly once => novel counts sum to |vocab|
    assert(rows.map(_._3).sum == vocab.size)
    // and per doc: novel = grams not present in ANY earlier doc
    val gsets = texts.map(grams)
    rows.foreach { case (id, nGrams, nNovel) =>
      val i = id.toInt
      val earlier = gsets.take(i).foldLeft(Set.empty[String])(_ ++ _)
      assert(nGrams == gsets(i).size && nNovel == (gsets(i) -- earlier).size, s"doc $i")
    }
  }

  test("rolling_hash matches a reference implementation and is deterministic") {
    val s = spark; import s.implicits._
    def ref(str: String, base: Long = 1315423911L): Long =
      str.getBytes("UTF-8").foldLeft(0L)((h, b) => h * base + (b & 0xff))
    val samplesIn = Seq("", "a", "hello world", "the same the same", "ünïcödé ok")
    val got = samplesIn.toDF("t").select(rolling_hash($"t")).collect().map(_.getLong(0))
    assert(got.toSeq == samplesIn.map(ref(_)))
  }

  test("property: triangleCounts matches brute-force triple enumeration on random graphs") {
    val s = spark; import s.implicits._
    for (round <- 0 until 4) {
      val gen = Gen.zip(Gen.chooseNum(1L, 12L), Gen.chooseNum(1L, 12L))
      val raw = samples(gen, 60 + round * 10)
      val canon = raw.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.toSet
      val nodes = canon.flatMap(e => Seq(e._1, e._2))
      // reference: count triples with all three canonical edges present
      val expect = nodes.map { v =>
        val sorted = nodes.toSeq.sorted
        v -> (for {
          a <- sorted; b <- sorted if a < b
          if canon((math.min(a, v), math.max(a, v))) && a != v && b != v
          if canon((math.min(b, v), math.max(b, v)))
          if canon((a, b))
        } yield 1).size.toLong
      }.toMap
      val got = graft.operators.Graph
        .triangleCounts(raw.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.operators.Caches.release()
      assert(got == expect, s"round $round: $canon")
    }
  }

  test("property: bpeTrainMerges matches an independent Sennrich reference") {
    val s = spark; import s.implicits._
    // reference implementation: classic list-based greedy BPE over a
    // word-frequency map — no string-replace trickery, so it checks the
    // engine's two-space replace encoding from first principles
    def refBpe(words: Map[String, Long], rounds: Int): Seq[(Int, String, Long)] = {
      var tbl: Map[List[String], Long] =
        words.map { case (w, f) => w.toList.map(_.toString) -> f }
      (1 to rounds).map { r =>
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        tbl.foreach { case (syms, f) =>
          syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
        }
        val ((a, b), n) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        def fuse(in: List[String]): List[String] = in match {
          case `a` :: `b` :: rest => (a + b) :: fuse(rest)
          case h :: rest => h :: fuse(rest)
          case Nil => Nil
        }
        tbl = tbl.groupBy { case (syms, _) => fuse(syms) }
          .map { case (k, vs) => k -> vs.values.sum }
        (r, s"$a $b", n)
      }
    }
    for (round <- 0 until 3) {
      // tiny alphabet + short words force repeated/overlapping pairs
      val wordGen = Gen.stringOfN(4 + round, Gen.oneOf('a', 'b', 'c'))
      val ws = samples(wordGen, 25)
      val corpus = ws.mkString(" ")
      val wordFreq = ws.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val expect = refBpe(wordFreq, 3)
      val got = graft.operators.TextAnalysis
        .bpeTrainMerges(Seq((1L, corpus)).toDF("doc_id", "text"), rounds = 3)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      graft.operators.Caches.release()
      assert(got == expect, s"round $round corpus=$corpus")
    }
  }

  test("property: numericDriftKs matches a direct KS computation on random samples") {
    val s = spark; import s.implicits._
    for (round <- 0 until 4) {
      val g = Gen.chooseNum(0, 12)
      val xs = samples(g, 30 + round * 7).map(_.toDouble)
      val ys = samples(Gen.chooseNum(round, 14), 25).map(_.toDouble)
      val vals = (xs ++ ys).distinct.sorted
      val gaps = vals.map { v =>
        val ca = xs.count(_ <= v).toLong; val cb = ys.count(_ <= v).toLong
        (math.abs(ca * ys.size - cb * xs.size), v)
      }
      val expectGap = gaps.map(_._1).max
      val expectAt = gaps.filter(_._1 == expectGap).map(_._2).min
      val r = graft.operators.Quality
        .numericDriftKs(xs.toDF("v"), ys.toDF("v"), "v").head()
      assert(r.getLong(0) == xs.size.toLong && r.getLong(1) == ys.size.toLong)
      assert(r.getLong(2) == expectGap && r.getDouble(3) == expectAt,
        s"round $round")
    }
  }

  test("property: linearAttribution credit mass is conserved up to floor remainders") {
    val s = spark; import s.implicits._
    for (round <- 0 until 3) {
      val gen = Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0L, 500L),
        Gen.oneOf("view", "click", "purchase", "error"))
      val rows = samples(gen, 120, seed = 100L + round).zipWithIndex.map {
        case ((u, t, ty), i) =>
          (u, new java.sql.Timestamp(1700000000000L + t * 1000), i.toLong, ty, 0.0)
      }
      val ev = rows.toDF("user_id", "ts", "event_id", "event_type", "value")
      val nConv = rows.count(_._4 == "purchase").toLong
      val credits = graft.operators.Events
        .linearAttribution(ev, Seq("view", "click"), "purchase")
        .collect().map(r => r.getLong(1))
      val total = credits.sum
      // every conversion distributes exactly 1e6 ppm, minus at most
      // (channels - 1) ppm of floor loss when split across touches
      assert(total <= 1000000L * nConv, s"round $round: overcredit $total")
      assert(total >= 1000000L * nConv - 1L * nConv,
        s"round $round: lost more than the floor remainder ($total of ${1000000L * nConv})")
    }
  }

  test("property: rangePrefixSum equals the sequential prefix on random multisets") {
    val s = spark; import s.implicits._
    for (round <- 0 until 3) {
      val gen = Gen.zip(Gen.chooseNum(0L, 50L), Gen.chooseNum(0L, 99L))
      val rows = samples(gen, 200, seed = 7L * (round + 1)).zipWithIndex
        .map { case ((k, v), i) => (k, i.toLong, v) }
      val df = rows.toDF("k", "uniq", "v")
      val got = graft.operators.Stats.rangePrefixSum(
        df, Seq(col("k").asc, col("uniq").asc), "v", "cum")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
      var run = 0L
      rows.sortBy(t => (t._1, t._2)).foreach { case (k, u, v) =>
        run += v
        assert(got((k, u)) == run, s"round $round diverges at ($k,$u)")
      }
      graft.operators.Caches.release()
    }
  }

  test("property: spearman/U are partition-invariant and match a brute-force rank reference") {
    val s = spark; import s.implicits._
    val gen = for {
      n <- Gen.choose(5, 60)
      xs <- Gen.listOfN(n, Gen.choose(-20L, 20L))
      ys <- Gen.listOfN(n, Gen.choose(-20L, 20L))
    } yield xs.zip(ys)
    for (seed <- 1 to 5) {
      val data = gen(Gen.Parameters.default, Seed(seed.toLong)).get
      val df = data.toDF("x", "y")
      def rho(d: org.apache.spark.sql.DataFrame) =
        graft.operators.Stats.spearman(
          d.withColumn("g", lit("all")), Seq("g"), col("x"), col("y"))
          .collect().head match {
            case r if r.isNullAt(2) => None
            case r => Some(r.getDouble(2))
          }
      assert(rho(df) == rho(df.repartition(7)),
        s"seed $seed: bucketed rank prefix must be partition-invariant")
      // brute-force average ranks on the driver
      def ranks(v: Seq[Long]): Seq[Double] = {
        val byVal = v.zipWithIndex.sortBy(_._1)
        val out = new Array[Double](v.size)
        var i = 0
        while (i < byVal.size) {
          var j = i
          while (j < byVal.size && byVal(j)._1 == byVal(i)._1) j += 1
          val avg = (i + 1 + j).toDouble / 2 // mean of ranks i+1..j
          for (k <- i until j) out(byVal(k)._2) = avg
          i = j
        }
        out.toSeq
      }
      val rx = ranks(data.map(_._1)); val ry = ranks(data.map(_._2))
      val n = data.size.toDouble
      val (sx, sy) = (rx.sum, ry.sum)
      val sxx = rx.map(a => a * a).sum; val syy = ry.map(a => a * a).sum
      val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
      val den = n * sxx - sx * sx; val deny = n * syy - sy * sy
      val expect =
        if (den == 0 || deny == 0) None
        else Some((n * sxy - sx * sy) / math.sqrt(den * deny))
      (rho(df), expect) match {
        case (Some(a), Some(b)) =>
          assert(math.abs(a - b) < 1e-9, s"seed $seed: $a vs brute $b")
        case (a, b) => assert(a.isDefined == b.isDefined, s"seed $seed: $a vs $b")
      }
    }
  }
}
