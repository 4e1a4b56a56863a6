package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis}

/** Empty-corpus behavior: every document operator returns an empty
  * result (never throws) when the input has no rows — the guarantee a
  * pipeline needs when an upstream filter leaves nothing.
  */
class EdgeSpec extends AnyFunSuite with SparkTest {

  private def emptyDocs = {
    val s = spark; import s.implicits._
    Seq.empty[(Long, String, String, String, Int)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("dedup operators return empty on an empty corpus") {
    assert(Dedup.exact(emptyDocs).count() == 0)
    assert(Dedup.trigramSets(emptyDocs).count() == 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs).count() == 0)
    assert(Dedup.minHashLsh(emptyDocs).count() == 0)
    assert(Dedup.simHashSignatures(emptyDocs).count() == 0)
    assert(Dedup.simHash(emptyDocs).count() == 0)
    val s = spark; import s.implicits._
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.dedupClusters(noPairs).count() == 0)
  }

  test("text operators return empty on an empty corpus") {
    assert(TextAnalysis.langId(emptyDocs).count() == 0)
    assert(TextAnalysis.qualitySignals(emptyDocs).count() == 0)
    assert(TextAnalysis.tokenStats(emptyDocs).count() == 0)
    assert(TextAnalysis.fingerprint(emptyDocs).count() == 0)
    assert(TextAnalysis.rollingFingerprint(emptyDocs).count() == 0)
    assert(TextAnalysis.bpeTokenCount(emptyDocs).count() == 0)
  }
}
