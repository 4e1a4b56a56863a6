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
    assert(TextAnalysis.redactPii(emptyDocs).count() == 0)
    assert(TextAnalysis.repetitionSignals(emptyDocs).count() == 0)
    assert(TextAnalysis.chunkDocuments(emptyDocs).count() == 0)
    assert(TextAnalysis.topDistinctiveTerms(emptyDocs).count() == 0)
  }

  test("round-3 text operators on null text: nulls propagate, rows never invent tokens") {
    val s = spark; import s.implicits._
    val d = Seq((1L, None: Option[String]), (2L, Some("real text here")))
      .toDF("doc_id", "text")
    val red = TextAnalysis.redactPii(d).collect()
      .map(r => r.getLong(0) -> r.isNullAt(5)).toMap
    assert(red == Map(1L -> true, 2L -> false), "null text -> null redacted, never a crash")
    // split(null) yields no token rows: the null doc disappears from
    // token-derived outputs instead of contributing phantom tokens
    val rep = TextAnalysis.repetitionSignals(d).collect().map(_.getLong(0)).toSet
    assert(rep == Set(2L))
    val chunks = TextAnalysis.chunkDocuments(d, 2).collect().map(_.getLong(0)).toSet
    assert(chunks == Set(2L))
  }

  test("non-equi joins and sampling behave on empty inputs") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    def ev(rows: Seq[(Long, Long, String)]) =
      rows.toDF("event_id", "user_id", "ts_s")
        .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val some = ev(Seq((1L, 1L, "2024-01-01 10:00:00")))
    val none = ev(Seq.empty)
    val right = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("user_id"), col("ts"), col("event_id").as("r_id"))

    // empty left -> empty output; empty right -> all-null payload
    assert(graft.operators.AsOf.asofJoin(none, right(some),
      Seq("user_id"), "ts", "r_id", Seq("r_id")).count() == 0)
    val unmatched = graft.operators.AsOf.asofJoin(some, right(none),
      Seq("user_id"), "ts", "r_id", Seq("r_id")).collect()
    assert(unmatched.length == 1 && unmatched.head.isNullAt(3))

    val bands = s.createDataFrame(Seq(("b", 0.0, 10.0))).toDF("band", "lo", "hi")
    val noFact = Seq.empty[(Long, Double)].toDF("id", "v")
    assert(graft.operators.RangeJoin.bandJoin(noFact, "v", bands).count() == 0)
    assert(graft.operators.RangeJoin.uniformBandJoin(noFact, "v", bands, 10.0).count() == 0)

    val noKeys = Seq.empty[Long].toDF("id")
    assert(graft.operators.Sampling.hashSplit(noKeys, "id", "s",
      Seq("a" -> 0.5, "b" -> 0.5)).count() == 0)
    assert(graft.operators.Sampling.stratifiedKeep(noKeys.withColumn("src",
      org.apache.spark.sql.functions.lit("x")), "id", "src", "s",
      Seq("x" -> 0.5), 0.1).count() == 0)
  }
}
