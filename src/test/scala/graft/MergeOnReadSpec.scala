package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Merge, MergeSpec}
import graft.sources.MergeOnRead

class MergeOnReadSpec extends AnyFunSuite with SparkTest {

  private def nowCol = to_timestamp(lit("2024-06-01 00:00:00"))

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("mor").toString

  test("readView after N delta merges equals the eager copy-on-write chain") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    val spec = MergeSpec(Seq("k"), Seq("name"),
      createdCol = Some("created"), updatedCol = Some("updated"))
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
      .withColumn("created", to_timestamp(lit("2020-01-01 00:00:00")))
      .withColumn("updated", to_timestamp(lit("2020-01-01 00:00:00")))
    MergeOnRead.init(base, dir, "t", Seq("k"))

    val b1 = Seq((1L, "a1", 11.0), (4L, "d", 40.0)).toDF("k", "name", "bal")
    val b2 = Seq((1L, "a2", 12.0), (2L, "b2", 22.0)).toDF("k", "name", "bal")
    assert(MergeOnRead.deltaMerge(s, dir, "t", b1, spec, nowCol, batchId = 1L))
    assert(MergeOnRead.deltaMerge(s, dir, "t", b2, spec, nowCol, batchId = 2L))

    // eager twin: scd1 applied batch by batch to the full table
    val eager = Merge.scd1(Merge.scd1(base, b1, spec, nowCol), b2, spec, nowCol)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "name", "bal", "created", "updated")
        .collect().map(_.toString).sorted.toSeq
    assert(canon(MergeOnRead.readView(s, dir, "t")) == canon(eager))

    // spec semantics survive MoR: k=1 updated twice — created stamp
    // preserved from the base, bal (not in updateCols) keeps the
    // TARGET value on match, so b1's insert of k=4 carries 40.0 and
    // k=1 keeps 10.0 despite two source touches
    val view = MergeOnRead.readView(s, dir, "t")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getDouble(2), r.getTimestamp(3).toString))).toMap
    assert(view(1L) == (("a2", 10.0, "2020-01-01 00:00:00.0")))
    assert(view(4L) == (("d", 40.0, "2024-06-01 00:00:00.0")))
    assert(view.keySet == Set(1L, 2L, 3L, 4L))
  }

  test("crash-replayed batch id is skipped; write amplification is O(touched keys)") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    val spec = MergeSpec(Seq("k"), Seq("v"))
    val base = (1L to 1000L).map(i => (i, i * 10L)).toDF("k", "v")
    MergeOnRead.init(base, dir, "t", Seq("k"))

    val small = Seq((7L, 1L), (8L, 2L)).toDF("k", "v")
    assert(MergeOnRead.deltaMerge(s, dir, "t", small, spec, nowCol, 1L))
    // replay: same id, different payload — must be skipped entirely
    assert(!MergeOnRead.deltaMerge(s, dir, "t",
      Seq((7L, 999L)).toDF("k", "v"), spec, nowCol, 1L))
    val view = MergeOnRead.readView(s, dir, "t")
    assert(view.count() == 1000L)
    assert(view.where(col("k") === 7L).head().getLong(1) == 1L)
    // the delta holds exactly the touched keys — never the partition
    assert(MergeOnRead.deltaRowCounts(s, dir, "t") == Seq(2L))
  }

  test("compact folds the chain into a new base; view hash-unchanged; ratio guard no-ops") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    val spec = MergeSpec(Seq("k"), Seq("v"))
    val base = (1L to 100L).map(i => (i, i)).toDF("k", "v")
    MergeOnRead.init(base, dir, "t", Seq("k"))
    MergeOnRead.deltaMerge(s, dir, "t", Seq((5L, 50L)).toDF("k", "v"), spec, nowCol, 1L)
    MergeOnRead.deltaMerge(s, dir, "t", Seq((5L, 51L), (101L, 0L)).toDF("k", "v"), spec, nowCol, 2L)
    val before = MergeOnRead.readView(s, dir, "t")
      .collect().map(_.toString).sorted.toSeq

    // 3 delta rows on a 100-row base = 3% — below a 10% threshold
    MergeOnRead.compact(s, dir, "t", maxDeltaRatio = 0.1)
    assert(MergeOnRead.manifest(s, dir, "t").deltaSeqs.size == 2, "guarded compact must no-op")

    MergeOnRead.compact(s, dir, "t")
    val m = MergeOnRead.manifest(s, dir, "t")
    assert(m.baseGen == 2L && m.deltaSeqs.isEmpty)
    val after = MergeOnRead.readView(s, dir, "t")
      .collect().map(_.toString).sorted.toSeq
    assert(after == before, "compaction must not change the view")
    // merges keep working after compaction (chain seqs stay monotone)
    MergeOnRead.deltaMerge(s, dir, "t", Seq((5L, 52L)).toDF("k", "v"), spec, nowCol, 3L)
    assert(MergeOnRead.readView(s, dir, "t")
      .where(col("k") === 5L).head().getLong(1) == 52L)
    assert(MergeOnRead.manifest(s, dir, "t").deltaSeqs == Seq(3L))
    // reader grace: the displaced base gen survives ONE cycle (an
    // in-flight reader of the old manifest still finds its files) and
    // the NEXT compaction prunes it
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/t.morbase/1")),
      "the just-displaced base generation must be retained one cycle")
    MergeOnRead.compact(s, dir, "t")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/t.morbase/1")),
      "the previous cycle's superseded base must be pruned")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/t.morbase/2")))
  }

  test("readView plans a broadcast anti-join — the base is never shuffled") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    val spec = MergeSpec(Seq("k"), Seq("v"))
    MergeOnRead.init((1L to 1000L).map(i => (i, i)).toDF("k", "v"), dir, "t", Seq("k"))
    MergeOnRead.deltaMerge(s, dir, "t", Seq((3L, 0L)).toDF("k", "v"), spec, nowCol, 1L)
    val view = MergeOnRead.readView(s, dir, "t")
    view.count()
    val plan = view.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
    assert(!plan.contains("SortMergeJoin"), s"base must not shuffle:\n$plan")
  }

  test("deltaDelete tombstones: keys vanish, re-insert resurrects, compact drops them physically") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    val spec = MergeSpec(Seq("k"), Seq("v"))
    MergeOnRead.init((1L to 10L).map(i => (i, i * 10L)).toDF("k", "v"), dir, "t", Seq("k"))
    // delete 3 keys, including one updated just before (tombstone must
    // supersede the image) and one absent key (harmless)
    MergeOnRead.deltaMerge(s, dir, "t", Seq((2L, 99L)).toDF("k", "v"), spec, nowCol, 1L)
    assert(MergeOnRead.deltaDelete(s, dir, "t",
      Seq(2L, 5L, 77L).toDF("k"), batchId = 2L))
    val v1 = MergeOnRead.readView(s, dir, "t")
    assert(v1.count() == 8L)
    assert(v1.where(col("k").isin(2L, 5L)).isEmpty)
    // replayed delete is skipped
    assert(!MergeOnRead.deltaDelete(s, dir, "t", Seq(1L).toDF("k"), 2L))
    assert(MergeOnRead.readView(s, dir, "t").count() == 8L)
    // resurrection: re-insert a deleted key with a fresh value
    MergeOnRead.deltaMerge(s, dir, "t", Seq((5L, 555L)).toDF("k", "v"), spec, nowCol, 3L)
    val v2 = MergeOnRead.readView(s, dir, "t")
    assert(v2.count() == 9L)
    assert(v2.where(col("k") === 5L).head().getLong(1) == 555L)
    // compact physically removes the tombstoned key and keeps the view
    val before = v2.collect().map(_.toString).sorted.toSeq
    MergeOnRead.compact(s, dir, "t")
    val after = MergeOnRead.readView(s, dir, "t")
    assert(after.collect().map(_.toString).sorted.toSeq == before)
    assert(after.columns.toSeq == Seq("k", "v"), "marker must not leak into the view")
  }

  test("changesSince: net per-key change feed with tombstones; compaction truncates it") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    val spec = MergeSpec(Seq("k"), Seq("v"))
    MergeOnRead.init((1L to 10L).map(i => (i, i * 10L)).toDF("k", "v"), dir, "t", Seq("k"))
    MergeOnRead.deltaMerge(s, dir, "t", Seq((2L, 99L), (3L, 33L)).toDF("k", "v"), spec, nowCol, 1L)
    MergeOnRead.deltaDelete(s, dir, "t", Seq(2L, 5L).toDF("k"), 2L)
    MergeOnRead.deltaMerge(s, dir, "t", Seq((5L, 555L), (11L, 111L)).toDF("k", "v"), spec, nowCol, 3L)
    def feed(since: Long): Map[Long, (String, Option[Long])] =
      MergeOnRead.changesSince(s, dir, "t", since)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(2), if (r.isNullAt(1)) None else Some(r.getLong(1))))).toMap
    // after batch 1: key 2's NET change is the batch-2 tombstone, key 5
    // resurrected in batch 3, key 11 inserted; key 3 (batch-1-only) absent
    assert(feed(1L) == Map(
      2L -> (("delete", None)),
      5L -> (("upsert", Some(555L))),
      11L -> (("upsert", Some(111L)))))
    // from the beginning, batch 1's surviving touch (key 3) appears too
    assert(feed(0L) == Map(
      2L -> (("delete", None)),
      3L -> (("upsert", Some(33L))),
      5L -> (("upsert", Some(555L))),
      11L -> (("upsert", Some(111L)))))
    // compaction truncates the feed (the documented retention contract)
    MergeOnRead.compact(s, dir, "t")
    assert(feed(0L).isEmpty)
  }

  test("randomized chains: readView equals the eager scd1 fold for any batch sequence") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(20260815L)
    val spec = MergeSpec(Seq("k"), Seq("v"), updatedCol = Some("updated"))
    for (trial <- 0 until 3) {
      val dir = tmpDir()
      val base = (1L to 50L).map(i => (i, i * 100L)).toDF("k", "v")
        .withColumn("updated", to_timestamp(lit("2020-01-01 00:00:00")))
      MergeOnRead.init(base, dir, "t", Seq("k"))
      var eager = base
      for (b <- 1 to 5) {
        val keys = rnd.shuffle((1L to 70L).toList).take(1 + rnd.nextInt(12)).distinct
        val src = keys.map(k => (k, rnd.nextLong(100000L))).toDF("k", "v")
        val ts = to_timestamp(lit(f"2024-01-0$b 00:00:00"))
        MergeOnRead.deltaMerge(s, dir, "t", src, spec, ts, b.toLong)
        eager = Merge.scd1(eager, src, spec, ts)
      }
      val got = MergeOnRead.readView(s, dir, "t")
        .collect().map(_.toString).sorted.toSeq
      val want = eager.select("k", "v", "updated")
        .collect().map(_.toString).sorted.toSeq
      assert(got == want, s"trial $trial diverged")
    }
  }

  test("null-safe keyed specs are rejected") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    MergeOnRead.init(Seq((1L, 1L)).toDF("k", "v"), dir, "t", Seq("k"))
    val e = intercept[IllegalArgumentException] {
      MergeOnRead.deltaMerge(s, dir, "t", Seq((1L, 2L)).toDF("k", "v"),
        MergeSpec(Seq("k"), Seq("v"), nullSafeKeys = true), nowCol, 1L)
    }
    assert(e.getMessage.contains("null-strict"))
  }
}
