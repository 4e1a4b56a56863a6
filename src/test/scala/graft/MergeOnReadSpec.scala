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
    // the consumer contract: a replica bootstrapped after batch 1
    // (base + batch-1 images, re-derived eagerly) + the feed equals the
    // current view — deletes drop, the resurrection and insert land
    val snapshot = Merge.scd1(
      (1L to 10L).map(i => (i, i * 10L)).toDF("k", "v"),
      Seq((2L, 99L), (3L, 33L)).toDF("k", "v"), spec, nowCol)
    val replica = MergeOnRead.applyChanges(snapshot,
      MergeOnRead.changesSince(s, dir, "t", 1L), Seq("k"))
      .collect().map(_.toString).sorted.toSeq
    assert(replica == MergeOnRead.readView(s, dir, "t")
      .collect().map(_.toString).sorted.toSeq)
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

  test("duplicate source keys are rejected loudly (no nondeterministic delta winner)") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    MergeOnRead.init(Seq((1L, 1L)).toDF("k", "v"), dir, "t", Seq("k"))
    val e = intercept[IllegalArgumentException] {
      MergeOnRead.deltaMerge(s, dir, "t",
        Seq((1L, 2L), (1L, 3L)).toDF("k", "v"),
        MergeSpec(Seq("k"), Seq("v")), nowCol, 1L)
    }
    assert(e.getMessage.contains("unique"))
  }

  test("unsafe key/partition column names are rejected at init") {
    val s = spark; import s.implicits._
    assert(intercept[IllegalArgumentException] {
      MergeOnRead.init(Seq((1L, 1L)).toDF("k;bad", "v"), tmpDir(), "t", Seq("k;bad"))
    }.getMessage.contains("A-Za-z0-9"))
    assert(intercept[IllegalArgumentException] {
      MergeOnRead.initPartitioned(Seq((1L, "a", 1L)).toDF("k", "p=x", "v"),
        tmpDir(), "t", Seq("k"), "p=x")
    }.getMessage.contains("A-Za-z0-9"))
  }

  test("empty micro-batches stamp their batch id without extending the chain") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    val spec = MergeSpec(Seq("k"), Seq("v"))
    MergeOnRead.init((1L to 10L).map(i => (i, i)).toDF("k", "v"), dir, "t", Seq("k"))
    assert(MergeOnRead.deltaMerge(s, dir, "t",
      Seq.empty[(Long, Long)].toDF("k", "v"), spec, nowCol, 1L))
    val m = MergeOnRead.manifest(s, dir, "t")
    assert(m.deltaSeqs.isEmpty && m.lastBatch == 1L)
    // replay of the empty batch is recognized
    assert(!MergeOnRead.deltaMerge(s, dir, "t",
      Seq((1L, 99L)).toDF("k", "v"), spec, nowCol, 1L))
    assert(MergeOnRead.readView(s, dir, "t").count() == 10L)
  }

  // ------------------------------------------------------ partitioned

  /** month(k) = k % 4 as a string — an immutable function of the key,
    * the partition contract.
    */
  private def pval(k: Long): String = s"m${k % 4}"

  private def initPart(s: org.apache.spark.sql.SparkSession, dir: String,
      n: Long = 400L): Unit = {
    import s.implicits._
    val base = (1L to n).map(i => (i, pval(i), i * 10L)).toDF("k", "p", "v")
    MergeOnRead.initPartitioned(base, dir, "t", Seq("k"), "p")
  }

  test("partitioned: view equals the eager chain; merge reads only touched partitions") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    initPart(s, dir)
    val spec = MergeSpec(Seq("k"), Seq("v"))
    val base = (1L to 400L).map(i => (i, pval(i), i * 10L)).toDF("k", "p", "v")
    // batch 1 touches partitions m1 and m2 only; batch 2 inserts new
    // keys into m1 (401 % 4 = 1, 405 % 4 = 1)
    val b1 = Seq((1L, pval(1L), -1L), (2L, pval(2L), -2L), (5L, pval(5L), -5L))
      .toDF("k", "p", "v")
    val b2 = Seq((401L, pval(401L), -401L), (405L, pval(405L), -405L))
      .toDF("k", "p", "v")
    assert(MergeOnRead.deltaMerge(s, dir, "t", b1, spec, nowCol, 1L))
    assert(MergeOnRead.deltaMerge(s, dir, "t", b2, spec, nowCol, 2L))
    val eager = Merge.scd1(Merge.scd1(base, b1, spec, nowCol), b2, spec, nowCol)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "p", "v").collect().map(_.toString).sorted.toSeq
    assert(canon(MergeOnRead.readView(s, dir, "t")) == canon(eager))
    // the merge's base-read footprint: only m1/m2 files
    val (touched, total) = MergeOnRead.baseFileFootprint(s, dir, "t",
      Seq("m1", "m2"))
    assert(touched > 0 && touched < total, s"footprint $touched/$total")
  }

  test("partitioned compact folds ONLY dirty partitions; clean partitions keep their generation") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    initPart(s, dir)
    val spec = MergeSpec(Seq("k"), Seq("v"))
    // touch only partition m1
    MergeOnRead.deltaMerge(s, dir, "t",
      Seq((1L, pval(1L), -1L), (5L, pval(5L), -5L)).toDF("k", "p", "v"),
      spec, nowCol, 1L)
    val before = MergeOnRead.readView(s, dir, "t")
      .collect().map(_.toString).sorted.toSeq
    MergeOnRead.compact(s, dir, "t")
    val m = MergeOnRead.manifest(s, dir, "t")
    assert(m.deltaSeqs.isEmpty)
    val gens = m.pmap.map(e => e._1 -> e._2).toMap
    assert(gens("m1") == 2L, "dirty partition must move to the new generation")
    assert(Seq("m0", "m2", "m3").forall(gens(_) == 1L),
      "clean partitions must keep generation 1 (never copied)")
    // compaction rewrote ~one partition's rows, not the table
    val rewritten = m.pmap.filter(_._2 == 2L).map(_._3).sum
    assert(rewritten == 100L, s"rewrote $rewritten rows, expected the 100-row dirty partition")
    assert(m.baseRows == 400L)
    val after = MergeOnRead.readView(s, dir, "t")
      .collect().map(_.toString).sorted.toSeq
    assert(after == before, "compaction must not change the view")
    // displaced m1@gen1 dir survives one cycle (grace), then reclaims
    assert(m.grace == Seq((1L, "m1")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/t.morbase/1/p=m1")))
    MergeOnRead.compact(s, dir, "t") // quiescent: chain empty, still prunes grace
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/t.morbase/1/p=m1")),
      "quiescent compact must reclaim the previous cycle's grace set")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/t.morbase/1/p=m0")),
      "live partitions of the old generation must survive")
  }

  test("partitioned deletes route by partition; compact drops them physically; view stable") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    initPart(s, dir, n = 40L)
    val spec = MergeSpec(Seq("k"), Seq("v"))
    // partitioned deletes must carry the partition column
    assert(intercept[IllegalArgumentException] {
      MergeOnRead.deltaDelete(s, dir, "t", Seq(2L).toDF("k"), 1L)
    }.getMessage.contains("routing"))
    MergeOnRead.deltaDelete(s, dir, "t",
      Seq((2L, pval(2L)), (6L, pval(6L))).toDF("k", "p"), 1L)
    // resurrect key 6 with a fresh value
    MergeOnRead.deltaMerge(s, dir, "t",
      Seq((6L, pval(6L), 666L)).toDF("k", "p", "v"), spec, nowCol, 2L)
    val v = MergeOnRead.readView(s, dir, "t")
    assert(v.count() == 39L)
    assert(v.where(col("k") === 6L).head().getLong(2) == 666L)
    val before = v.collect().map(_.toString).sorted.toSeq
    MergeOnRead.compact(s, dir, "t")
    val after = MergeOnRead.readView(s, dir, "t")
      .collect().map(_.toString).sorted.toSeq
    assert(after == before)
    assert(MergeOnRead.manifest(s, dir, "t").baseRows == 39L)
  }

  test("partitioned: generation fan-in is bounded — maxGenerations forces the full fold") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    initPart(s, dir, n = 40L)
    val spec = MergeSpec(Seq("k"), Seq("v"))
    // compact after touching a different partition each time with
    // maxGenerations = 2: the second compaction must fold EVERYTHING
    // (fan-in would otherwise reach 3 generations)
    MergeOnRead.deltaMerge(s, dir, "t",
      Seq((1L, pval(1L), -1L)).toDF("k", "p", "v"), spec, nowCol, 1L)
    MergeOnRead.compact(s, dir, "t", maxGenerations = 2)
    assert(MergeOnRead.manifest(s, dir, "t").pmap.map(_._2).distinct.sorted == Seq(1L, 2L))
    MergeOnRead.deltaMerge(s, dir, "t",
      Seq((2L, pval(2L), -2L)).toDF("k", "p", "v"), spec, nowCol, 2L)
    MergeOnRead.compact(s, dir, "t", maxGenerations = 2)
    val m = MergeOnRead.manifest(s, dir, "t")
    assert(m.pmap.map(_._2).distinct == Seq(3L),
      s"full fold expected at the fan-in bound, got pmap gens ${m.pmap.map(_._2).distinct}")
    assert(MergeOnRead.readView(s, dir, "t").count() == 40L)
  }

  // ------------------------------------------------------ concurrency

  test("a claimed-but-uncommitted delta seq fails the second writer loudly; releaseStaleClaims recovers") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    val spec = MergeSpec(Seq("k"), Seq("v"))
    MergeOnRead.init((1L to 10L).map(i => (i, i)).toDF("k", "v"), dir, "t", Seq("k"))
    // simulate a crashed (or in-flight) writer holding the next seq
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/t.mordelta"))
    java.nio.file.Files.createFile(java.nio.file.Paths.get(s"$dir/t.mordelta/1.claim"))
    val e = intercept[MergeOnRead.ConcurrentWriterException] {
      MergeOnRead.deltaMerge(s, dir, "t", Seq((1L, 0L)).toDF("k", "v"), spec, nowCol, 1L)
    }
    assert(e.getMessage.contains("releaseStaleClaims"))
    // the claim is seconds old — it could belong to a LIVE peer, so the
    // age guard refuses it without force (the Txn.releaseStaleClaims
    // lost-commit guard, ported here)
    assert(MergeOnRead.releaseStaleClaims(s, dir, "t") == 0)
    assert(MergeOnRead.releaseStaleClaims(s, dir, "t", force = true) == 1)
    assert(MergeOnRead.deltaMerge(s, dir, "t", Seq((1L, 0L)).toDF("k", "v"), spec, nowCol, 1L))
    assert(MergeOnRead.readView(s, dir, "t").where(col("k") === 1L).head().getLong(1) == 0L)
  }

  test("two interleaved writers: claims serialize commits and no committed batch is lost") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    val spec = MergeSpec(Seq("k"), Seq("v"))
    MergeOnRead.init((1L to 100L).map(i => (i, 0L)).toDF("k", "v"), dir, "t", Seq("k"))
    // the documented multi-writer client protocol: derive the batch id
    // from the manifest at attempt time, retry on the loud conflict AND
    // on a false return (a peer consumed the id) with a fresh id
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(tag: Long, keys: Seq[Long]): Thread = new Thread(() => {
      try {
        val src = keys.map(k => (k, tag)).toDF("k", "v")
        var done = false
        var tries = 0
        while (!done && tries < 200) {
          tries += 1
          val id = MergeOnRead.manifest(s, dir, "t").lastBatch + 1
          try done = MergeOnRead.deltaMerge(s, dir, "t", src, spec, nowCol, id)
          catch { case _: MergeOnRead.ConcurrentWriterException => Thread.sleep(250) }
        }
        if (!done) throw new AssertionError(s"writer $tag never landed")
      } catch { case t: Throwable => errs.add(t) }
    })
    val (w1, w2) = (writer(1L, Seq(1L, 2L)), writer(2L, Seq(3L, 4L)))
    w1.start(); w2.start(); w1.join(120000); w2.join(120000)
    assert(errs.isEmpty, s"writer thread failed: ${Option(errs.peek()).map(_.toString)}")
    val m = MergeOnRead.manifest(s, dir, "t")
    // ids derive from lastBatch (-1 at init): two commits stamp 0 and 1
    assert(m.lastBatch == 1L && m.deltaSeqs == Seq(1L, 2L),
      s"both batches must have committed: $m")
    val view = MergeOnRead.readView(s, dir, "t")
      .where(col("k").isin(1L, 2L, 3L, 4L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(view == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L),
      s"a committed batch was lost: $view")
    // every committed seq has exactly one delta dir; chain is contiguous
    assert(MergeOnRead.deltaRowCounts(s, dir, "t") == Seq(2L, 2L))
  }

  // -------------------------------------------------- broadcast guard

  test("reconcile broadcast degrades to a shuffled anti-join past the delta-bytes guard") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    val spec = MergeSpec(Seq("k"), Seq("v"))
    MergeOnRead.init((1L to 1000L).map(i => (i, i)).toDF("k", "v"), dir, "t", Seq("k"))
    MergeOnRead.deltaMerge(s, dir, "t", Seq((3L, 0L)).toDF("k", "v"), spec, nowCol, 1L)
    // silence Spark's own size-estimate broadcasts so the plan shape is
    // decided by OUR guard alone
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = scala.util.Try(
      s.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")).toOption
      .filter(_ != null)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val guarded = MergeOnRead.readView(s, dir, "t", broadcastDeltaBytesLimit = 0L)
      guarded.count()
      val plan = guarded.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), s"guard must suppress the broadcast:\n$plan")
      assert(guarded.collect().map(_.toString).sorted.toSeq ==
        MergeOnRead.readView(s, dir, "t").collect().map(_.toString).sorted.toSeq)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevA match {
        case Some(v) => s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => s.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  // -------------------------------------------------------- Bloom index

  test("Bloom-indexed flat table: merges open only files that may hold touched keys") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    val spec = MergeSpec(Seq("k"), Seq("v"))
    // 16 files hashed on k so each key lives in exactly one file
    val base = s.range(1, 4001).select(col("id").as("k"), (col("id") * 10).as("v"))
      .repartition(16, col("k"))
    MergeOnRead.init(base, dir, "t", Seq("k"), bloomBits = 65536, bloomHashes = 4)
    val m0 = MergeOnRead.manifest(s, dir, "t")
    assert(m0.bloomBits == 65536 && m0.bloomHashes == 4)
    // the candidate-file probe is a strict subset for a few keys
    val bloomDf = s.read.parquet(s"$dir/t.morbloom/1")
    val cand = MergeOnRead.bloomCandidateFiles(
      bloomDf, Seq(7L, 999L).toDF("k"), "k", 65536, 4)
    assert(cand.nonEmpty && cand.size < 16, s"pruned to ${cand.size} of 16 files")
    // the merge through the pruned scan is exact
    MergeOnRead.deltaMerge(s, dir, "t",
      Seq((7L, -7L), (999L, -999L)).toDF("k", "v"), spec, nowCol, 1L)
    val view = MergeOnRead.readView(s, dir, "t")
    assert(view.count() == 4000L)
    assert(view.where(col("k").isin(7L, 999L)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(7L -> -7L, 999L -> -999L))
    // compaction refreshes the index for the new generation
    MergeOnRead.compact(s, dir, "t")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/t.morbloom/2")))
    MergeOnRead.deltaMerge(s, dir, "t", Seq((8L, -8L)).toDF("k", "v"), spec, nowCol, 2L)
    assert(MergeOnRead.readView(s, dir, "t").where(col("k") === 8L)
      .head().getLong(1) == -8L)
  }

  test("minor compaction folds the chain without touching the base; view, feed and tombstones unchanged") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    val spec = MergeSpec(Seq("k"), Seq("v"))
    MergeOnRead.init((1L to 1000L).map(i => (i, i * 10L)).toDF("k", "v"),
      dir, "t", Seq("k"))
    MergeOnRead.deltaMerge(s, dir, "t", Seq((5L, -5L), (7L, -7L)).toDF("k", "v"),
      spec, nowCol, 1L)
    MergeOnRead.deltaDelete(s, dir, "t", Seq(9L).toDF("k"), 2L)
    MergeOnRead.deltaMerge(s, dir, "t", Seq((5L, -55L)).toDF("k", "v"),
      spec, nowCol, 3L)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val viewBefore = canon(MergeOnRead.readView(s, dir, "t"))
    val feedBefore = canon(MergeOnRead.changesSince(s, dir, "t", sinceBatch = 0L))

    // length guard: a short-enough chain no-ops
    MergeOnRead.compactMinor(s, dir, "t", maxChainLength = 5)
    assert(MergeOnRead.manifest(s, dir, "t").deltaSeqs.size == 3)

    MergeOnRead.compactMinor(s, dir, "t")
    val m = MergeOnRead.manifest(s, dir, "t")
    assert(m.baseGen == 1L, "minor compaction must never touch the base")
    assert(m.deltaSeqs == Seq(4L) && m.deltaRows == Seq(3L),
      s"chain must fold to one element holding the 3 touched keys: $m")
    assert(canon(MergeOnRead.readView(s, dir, "t")) == viewBefore)
    assert(canon(MergeOnRead.changesSince(s, dir, "t", sinceBatch = 0L)) == feedBefore,
      "per-image batch stamps must survive the fold")
    assert(MergeOnRead.readView(s, dir, "t").where(col("k") === 9L).isEmpty,
      "tombstones must survive the fold (base rows still need masking)")

    // merges continue on the folded chain; displaced files get one
    // cycle of grace, reclaimed by the next entry sweep
    MergeOnRead.deltaMerge(s, dir, "t", Seq((7L, -77L)).toDF("k", "v"),
      spec, nowCol, 4L)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/t.mordelta/1")))
    MergeOnRead.compactMinor(s, dir, "t")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/t.mordelta/1")),
      "the previous fold's displaced deltas must be reclaimed")
    assert(MergeOnRead.readView(s, dir, "t")
      .where(col("k") === 7L).head().getLong(1) == -77L)
  }

  test("pc-less sources route by a column-pruned key probe; inserts and tombstoned keys reject") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    initPart(s, dir, n = 40L)
    val spec = MergeSpec(Seq("k"), Seq("v"))
    // update-only source WITHOUT the partition column: keys 1 and 5
    // both live in partition m1 — the probe must route there
    assert(MergeOnRead.deltaMerge(s, dir, "t",
      Seq((1L, -1L), (5L, -5L)).toDF("k", "v"), spec, nowCol, 1L))
    val v = MergeOnRead.readView(s, dir, "t")
    assert(v.count() == 40L)
    assert(v.where(col("k").isin(1L, 5L)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap == Map(1L -> -1L, 5L -> -5L))
    // the delta images carried the routed partition value, so the
    // dirty-only compact works exactly as with a pc-carrying source
    MergeOnRead.compact(s, dir, "t")
    val m = MergeOnRead.manifest(s, dir, "t")
    assert(m.pmap.map(e => e._1 -> e._2).toMap.apply("m1") == 2L)
    assert(m.pmap.filter(_._1 != "m1").forall(_._2 == 1L),
      "routing must keep clean partitions out of the fold")
    // a NEW key has no routable partition: loud reject
    assert(intercept[IllegalArgumentException] {
      MergeOnRead.deltaMerge(s, dir, "t",
        Seq((999L, 0L)).toDF("k", "v"), spec, nowCol, 2L)
    }.getMessage.contains("update-only"))
    // a tombstoned key would re-insert partitionless: same reject
    MergeOnRead.deltaDelete(s, dir, "t",
      Seq((2L, pval(2L))).toDF("k", "p"), batchId = 2L)
    intercept[IllegalArgumentException] {
      MergeOnRead.deltaMerge(s, dir, "t",
        Seq((2L, 0L)).toDF("k", "v"), spec, nowCol, 3L)
    }
    // resurrection WITH the partition column still works
    assert(MergeOnRead.deltaMerge(s, dir, "t",
      Seq((2L, pval(2L), 222L)).toDF("k", "p", "v"), spec, nowCol, 3L))
    assert(MergeOnRead.readView(s, dir, "t")
      .where(col("k") === 2L).head().getLong(2) == 222L)
  }

  test("clustered compaction: the folded base's per-file key intervals come out disjoint") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    val spec = MergeSpec(Seq("k"), Seq("v"))
    // hash-routed base: every file spans the whole key domain
    MergeOnRead.init(
      s.range(1, 4001).select(col("id").as("k"), (col("id") * 10).as("v"))
        .repartition(16, col("k")),
      dir, "t", Seq("k"))
    def depths(gen: Long): Seq[Long] = graft.sources.Layout.clusteringDepth(
      graft.sources.Layout.fileManifest(s, s"$dir/t.morbase/$gen", Seq("k")), "k")
      .select("n_overlaps").collect().map(_.getLong(0)).toSeq
    assert(depths(1L).forall(_ > 0), "hash layout must be deeply overlapped")
    MergeOnRead.deltaMerge(s, dir, "t", Seq((7L, -7L)).toDF("k", "v"),
      spec, nowCol, 1L)
    val before = MergeOnRead.readView(s, dir, "t")
      .collect().map(_.toString).sorted.toSeq
    MergeOnRead.compact(s, dir, "t", sortCols = Seq("k"))
    assert(depths(2L).forall(_ == 0L),
      "clustered compaction must produce disjoint per-file key ranges")
    assert(MergeOnRead.readView(s, dir, "t")
      .collect().map(_.toString).sorted.toSeq == before,
      "clustering is physical only — the view must not change")
  }

  // --------------------------------------------------- schema evolution

  test("evolve adds columns metadata-only: NULL backfill, later merges populate, compact materializes") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    MergeOnRead.init((1L to 100L).map(i => (i, i * 10L)).toDF("k", "v"),
      dir, "t", Seq("k"))
    MergeOnRead.deltaMerge(s, dir, "t", Seq((5L, 50L)).toDF("k", "v"),
      MergeSpec(Seq("k"), Seq("v")), nowCol, 1L)

    // DDL is a manifest flip: no base or delta file changes
    val baseFiles = java.nio.file.Files.walk(
        java.nio.file.Paths.get(s"$dir/t.morbase")).count()
    MergeOnRead.evolve(s, dir, "t", Seq("tag" -> "string"))
    assert(java.nio.file.Files.walk(
      java.nio.file.Paths.get(s"$dir/t.morbase")).count() == baseFiles,
      "evolve must not rewrite anything")

    // everything predates the column: NULL across the board, rows intact
    val v1 = MergeOnRead.readView(s, dir, "t")
    assert(v1.columns.toSeq == Seq("k", "v", "tag"))
    assert(v1.count() == 100L && v1.where(col("tag").isNotNull).isEmpty)

    // a post-evolve merge populates it; pre-evolve images stay NULL
    MergeOnRead.deltaMerge(s, dir, "t",
      Seq((7L, 70L, "hot"), (101L, 1010L, "ins")).toDF("k", "v", "tag"),
      MergeSpec(Seq("k"), Seq("v", "tag")), nowCol, 2L)
    val v2 = MergeOnRead.readView(s, dir, "t")
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(v2(7L).contains("hot") && v2(101L).contains("ins"))
    assert(v2(5L).isEmpty && v2(1L).isEmpty)

    // the change feed and time travel read the evolved schema too
    val feed = MergeOnRead.changesSince(s, dir, "t", sinceBatch = 1L)
    assert(feed.columns.toSeq == Seq("k", "v", "tag", "change"))
    assert(feed.count() == 2L)
    assert(MergeOnRead.readViewAsOf(s, dir, "t", asOfBatch = 1L)
      .where(col("tag").isNotNull).isEmpty,
      "the as-of-batch-1 view predates every populated tag")

    // compaction materializes the column physically, view unchanged
    val before = MergeOnRead.readView(s, dir, "t")
      .collect().map(_.toString).sorted.toSeq
    MergeOnRead.compact(s, dir, "t")
    assert(MergeOnRead.readView(s, dir, "t")
      .collect().map(_.toString).sorted.toSeq == before)
    assert(s.read.parquet(s"$dir/t.morbase/2").columns.contains("tag"),
      "the folded base must carry the evolved column physically")

    // guard rails: duplicate and unsafe names are rejected
    assert(intercept[IllegalArgumentException] {
      MergeOnRead.evolve(s, dir, "t", Seq("tag" -> "string"))
    }.getMessage.contains("already has"))
    intercept[IllegalArgumentException] {
      MergeOnRead.evolve(s, dir, "t", Seq("bad;name" -> "string"))
    }
  }

  test("partitioned evolve: clean partitions backfill at read; dirty-only compact keeps the schema") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    initPart(s, dir, n = 40L)
    MergeOnRead.evolve(s, dir, "t", Seq("bonus" -> "bigint"))
    // populate the column in partition m1 only
    MergeOnRead.deltaMerge(s, dir, "t",
      Seq((1L, pval(1L), -1L, 11L)).toDF("k", "p", "v", "bonus"),
      MergeSpec(Seq("k"), Seq("v", "bonus")), nowCol, 1L)
    val v = MergeOnRead.readView(s, dir, "t")
    assert(v.columns.toSeq == Seq("k", "p", "v", "bonus"))
    assert(v.count() == 40L)
    assert(v.where(col("k") === 1L).head().getLong(3) == 11L)
    assert(v.where(col("p") =!= "m1").where(col("bonus").isNotNull).isEmpty,
      "clean partitions must read the added column as NULL")
    val before = v.collect().map(_.toString).sorted.toSeq
    // dirty-only fold: m1 moves to gen 2 WITH the column; clean
    // partitions stay on gen-1 files that physically lack it
    MergeOnRead.compact(s, dir, "t")
    val m = MergeOnRead.manifest(s, dir, "t")
    assert(m.pmap.map(e => e._1 -> e._2).toMap.apply("m1") == 2L)
    assert(m.pmap.filter(_._1 != "m1").forall(_._2 == 1L))
    assert(MergeOnRead.readView(s, dir, "t")
      .collect().map(_.toString).sorted.toSeq == before)
    // a held writer claim fails evolve loudly (same barrier as compact)
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$dir/t.mordelta/${m.deltaTo + 1}.claim"))
    intercept[MergeOnRead.ConcurrentWriterException] {
      MergeOnRead.evolve(s, dir, "t", Seq("extra" -> "string"))
    }
    MergeOnRead.releaseStaleClaims(s, dir, "t", force = true)
  }

  test("bloom index under deletes: stale bits over-approximate safely, compaction refreshes the manifest") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mor-bloom-del").toString
    val base = (1L to 400L).map(k => (k, k * 10)).toDF("k", "v")
    MergeOnRead.init(base.repartition(4, col("k")), dir, "t", Seq("k"),
      bloomBits = 1 << 16, bloomHashes = 4)
    val dead = (1L to 400L by 7).toDF("k")
    def files(keys: org.apache.spark.sql.DataFrame) = {
      val m = MergeOnRead.manifest(s, dir, "t")
      MergeOnRead.bloomCandidateFiles(
        s.read.parquet(s"$dir/t.morbloom/${m.baseGen}"),
        keys, "k", m.bloomBits, m.bloomHashes)
    }
    MergeOnRead.deltaDelete(s, dir, "t", dead, batchId = 1L)
    // tombstones leave the bits stale: deleted keys still candidate
    // into files — over-approximate (extra opens), never a missed key
    val stale = files(dead)
    assert(stale.nonEmpty, "stale bloom bits must still cover tombstoned keys")
    assert(MergeOnRead.readView(s, dir, "t").join(dead, Seq("k"), "left_semi").isEmpty,
      "the view must drop deleted keys regardless of bloom state")
    MergeOnRead.compact(s, dir, "t")
    val m2 = MergeOnRead.manifest(s, dir, "t")
    assert(m2.baseGen == 2L)
    // the refreshed manifest is built from the SURVIVOR rewrite: the
    // deleted keys' candidate set collapses, survivors still hit, and
    // every manifest row references the new generation's files
    assert(files(dead).isEmpty, "refreshed bloom must clear the deleted keys' bits")
    val survivors = (2L to 400L by 7).toDF("k")
    assert(files(survivors).nonEmpty, "survivors must still candidate after the refresh")
    val mfFiles = s.read.parquet(s"$dir/t.morbloom/2").select("file")
      .distinct().collect().map(_.getString(0))
    assert(mfFiles.nonEmpty && mfFiles.forall(_.contains("t.morbase/2")),
      s"bloom manifest rows must be replaced by the new generation's files: ${mfFiles.take(2).mkString(",")}")
    assert(MergeOnRead.readView(s, dir, "t").count() == 400L - dead.count())
  }
}
