package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Sampling, TextAnalysis}

/** End-to-end corpus preparation: the operators compose into the
  * standard training-data chain —
  *
  *   dedup (exact survivors) → quality gate → per-source mixing →
  *   per-class cap → train/val/test split
  *
  * and the result obeys the invariants a training run depends on:
  * no duplicate content, splits partition the corpus, caps hold, and
  * the whole chain is a pure function of the input (re-runs agree).
  */
class TrainingMixSpec extends AnyFunSuite with SparkTest {

  private def corpus: DataFrame = {
    val s = spark; import s.implicits._
    (0 until 300).map { i =>
      val src = s"src${i % 3}"
      // every 10th doc duplicates the content of the previous one;
      // every 7th is junk (no real words)
      val text =
        if (i % 10 == 9) s"shared content body number ${i - 1} with many plain words"
        else if (i % 7 == 6) "!!!! #### $$$$"
        else s"shared content body number $i with many plain words"
      (i.toLong, text, src)
    }.toDF("doc_id", "text", "source")
  }

  private def prepared: DataFrame = {
    val docs = corpus
    // 1. exact dedup: smallest doc_id survives per distinct text
    val survivors = Dedup.exact(docs).select(col("doc_id"))
    val deduped = docs.join(survivors, "doc_id")
    // 2. quality gate: drop docs with no alphabetic tokens
    val quality = TextAnalysis.qualitySignals(deduped)
      .filter(col("n_tokens") >= 5)
      .select("doc_id")
    val clean = deduped.join(quality, "doc_id")
    // 3. mix: all of src0, half of src1, a quarter of src2
    val mixed = Sampling.stratifiedKeep(clean, "doc_id", "source", "mix",
      Seq("src0" -> 1.0, "src1" -> 0.5), defaultRate = 0.25)
    // 4. cap: at most 40 docs per source
    val capped = Sampling.capPerGroup(mixed, "doc_id", "source", "cap", 40)
    // 5. split
    Sampling.hashSplit(capped, "doc_id", "exp",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
  }

  test("prepared corpus has no duplicate content and no junk docs") {
    val out = prepared.cache()
    assert(out.count() > 0)
    val texts = out.groupBy("text").count().filter(col("count") > 1)
    assert(texts.isEmpty, "duplicate content survived the chain")
    assert(out.filter(col("text").contains("####")).isEmpty)
  }

  test("mix, cap, and split invariants hold simultaneously") {
    val out = prepared.cache()
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.values.forall(_ <= 40), s"cap violated: $bySrc")
    // src0 keeps everything (up to the cap); src2 keeps ~a quarter
    assert(bySrc("src0") == 40L, s"src0=${bySrc("src0")}")
    assert(bySrc("src2") < bySrc("src0"))
    // splits partition the output
    assert(out.filter(!col("split").isin("train", "val", "test")).isEmpty)
    val n = out.count()
    val splitN = out.groupBy("split").count().collect().map(_.getLong(1)).sum
    assert(splitN == n)
  }

  test("the chain is deterministic end to end") {
    val a = prepared.collect().map(r => (r.getLong(0), r.getString(3))).sortBy(_._1).toSeq
    val b = prepared.collect().map(r => (r.getLong(0), r.getString(3))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
