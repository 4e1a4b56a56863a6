package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warehouse

/** Versioned-snapshot layer over the atomic warehouse swap: archived
  * versions, time-travel reads, retention pruning, rollback, and the
  * unchanged crash self-heal.
  */
class WarehouseVersionSpec extends AnyFunSuite with SparkTest {

  private def newDir() = java.nio.file.Files.createTempDirectory("whv").toString

  private def write(dir: String, vals: Seq[Int], keep: Int = 3): Unit = {
    val s = spark; import s.implicits._
    Warehouse.overwriteVersioned(vals.toDF("x"), dir, "t", keepVersions = keep)
  }

  private def liveVals(dir: String): Set[Int] =
    Warehouse.read(spark, dir, "t").collect().map(_.getInt(0)).toSet

  test("writeOrderedShards: files hold disjoint ascending key ranges, each sorted") {
    val s = spark; import s.implicits._
    val dir = newDir()
    // scrambled input; order_key 0..999
    val df = scala.util.Random.shuffle((0L until 1000L).toList).toDF("order_key")
    graft.sources.Layout.writeOrderedShards(df, dir, "shards", "order_key", 4)
    val files = new java.io.File(s"$dir/shards").listFiles()
      .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
    assert(files.length == 4)
    val ranges = files.map { f =>
      val ks = s.read.parquet(f.getAbsolutePath)
        .collect().map(_.getLong(0)).toSeq
      assert(ks == ks.sorted, s"${f.getName} not internally sorted")
      (ks.min, ks.max)
    }
    // disjoint and ascending across the file-name order
    ranges.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi < lo2, s"shard ranges overlap or misorder: ${ranges.toSeq}")
    }
    // nothing lost
    assert(graft.sources.Warehouse.read(s, dir, "shards").count() == 1000L)
  }

  test("overwriteVersioned archives the displaced table; readVersion time-travels") {
    val dir = newDir()
    write(dir, Seq(1)) // first write: nothing displaced, no archive
    assert(Warehouse.versions(spark, dir, "t").isEmpty)
    write(dir, Seq(2))
    write(dir, Seq(3))
    assert(liveVals(dir) == Set(3))
    val vs = Warehouse.versions(spark, dir, "t")
    assert(vs == Seq(1L, 2L))
    assert(Warehouse.readVersion(spark, dir, "t", 1L).collect().map(_.getInt(0)).toSet == Set(1))
    assert(Warehouse.readVersion(spark, dir, "t", 2L).collect().map(_.getInt(0)).toSet == Set(2))
    intercept[java.io.IOException](Warehouse.readVersion(spark, dir, "t", 99L))
  }

  test("retention keeps only the newest keepVersions archives") {
    val dir = newDir()
    (1 to 6).foreach(i => write(dir, Seq(i), keep = 2))
    assert(liveVals(dir) == Set(6))
    // five displaced tables archived as versions 1..5; only newest 2 kept
    assert(Warehouse.versions(spark, dir, "t") == Seq(4L, 5L))
    assert(Warehouse.readVersion(spark, dir, "t", 5L).collect().map(_.getInt(0)).toSet == Set(5))
  }

  test("rollback restores a snapshot and is itself undoable") {
    val dir = newDir()
    write(dir, Seq(10))
    write(dir, Seq(20))
    write(dir, Seq(30)) // archives: v1=10, v2=20
    Warehouse.rollback(spark, dir, "t", 1L)
    assert(liveVals(dir) == Set(10))
    // the displaced live (30) was archived by the rollback itself
    val vs = Warehouse.versions(spark, dir, "t")
    assert(vs.contains(3L), s"rollback must archive the displaced table, have $vs")
    assert(Warehouse.readVersion(spark, dir, "t", 3L).collect().map(_.getInt(0)).toSet == Set(30))
    // undo the rollback through the same mechanism
    Warehouse.rollback(spark, dir, "t", 3L)
    assert(liveVals(dir) == Set(30))
  }

  test("pointer commits: readers always see a complete generation; retention prunes") {
    val s = spark; import s.implicits._
    val dir = newDir()
    def w(vals: Seq[Int]) = Warehouse.Pointer.overwrite(vals.toDF("x"), dir, "t", keepGenerations = 2)
    assert(!Warehouse.Pointer.exists(spark, dir, "t"))
    intercept[java.io.IOException](Warehouse.Pointer.read(spark, dir, "t"))
    w(Seq(1))
    assert(Warehouse.Pointer.currentGeneration(spark, dir, "t").contains(1L))
    // a reader that resolved gen 1 BEFORE the next commit still reads
    // its immutable directory afterwards (retention covers in-flight)
    val inFlight = s.read.parquet(s"$dir/t.data/1")
    w(Seq(2))
    assert(Warehouse.Pointer.read(spark, dir, "t").collect().map(_.getInt(0)).toSet == Set(2))
    assert(inFlight.collect().map(_.getInt(0)).toSet == Set(1))
    w(Seq(3)) // gen 3; keep=2 prunes gen 1
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val gens = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/t.data"))
      .map(_.getPath.getName.toLong).sorted.toSeq
    assert(gens == Seq(2L, 3L))
    assert(Warehouse.Pointer.read(spark, dir, "t").collect().map(_.getInt(0)).toSet == Set(3))
  }

  test("pointer commits: a crashed write before the commit is invisible and cleaned later") {
    val s = spark; import s.implicits._
    val dir = newDir()
    Warehouse.Pointer.overwrite(Seq(1).toDF("x"), dir, "t")
    // simulate a writer crash AFTER materializing a generation but
    // BEFORE the pointer commit: an orphan directory appears
    Seq(99).toDF("x").write.parquet(s"$dir/t.data/7")
    assert(Warehouse.Pointer.currentGeneration(spark, dir, "t").contains(1L))
    assert(Warehouse.Pointer.read(spark, dir, "t").collect().map(_.getInt(0)).toSet == Set(1))
    // next successful commit numbers PAST the orphan, prunes the orphan
    // (it was never committed — not history), and retains gen 1
    Warehouse.Pointer.overwrite(Seq(2).toDF("x"), dir, "t", keepGenerations = 2)
    assert(Warehouse.Pointer.currentGeneration(spark, dir, "t").contains(8L))
    assert(Warehouse.Pointer.read(spark, dir, "t").collect().map(_.getInt(0)).toSet == Set(2))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val gens = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/t.data"))
      .map(_.getPath.getName.toLong).sorted.toSeq
    assert(gens == Seq(1L, 8L), s"orphan pruned, history retained: $gens")
  }

  test("crash window between the swap renames still self-heals") {
    val dir = newDir()
    write(dir, Seq(1))
    write(dir, Seq(2))
    // simulate a crash after rename(live -> old): table only under .old
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$dir/t"),
      new org.apache.hadoop.fs.Path(s"$dir/t.old")))
    assert(liveVals(dir) == Set(2)) // read() heals old -> live
    assert(Warehouse.versions(spark, dir, "t") == Seq(1L)) // archive untouched
  }

  test("readEvolved presents mixed-era parquet files under the current schema") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("evolved").toString
    // era 1: (k int, name); era 2 adds score; the CURRENT schema widens
    // k to long and adds a lang column no era has yet
    Seq((1, "a"), (2, "b")).toDF("k", "name")
      .write.mode("append").parquet(dir)
    Seq((3, "c", 1.5)).toDF("k", "name", "score")
      .write.mode("append").parquet(dir)
    val target = StructType(Seq(
      StructField("k", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("lang", StringType)))
    val got = graft.sources.Tables.readEvolved(s, dir, target)
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3)))).toSet
    assert(got == Set(
      (1L, "a", None, None), (2L, "b", None, None),
      (3L, "c", Some(1.5), None)))
    // narrowing is refused, never silently truncated
    val bad = StructType(Seq(StructField("k", ShortType)))
    val e = intercept[IllegalArgumentException](
      graft.sources.Tables.readEvolved(s, dir, bad))
    assert(e.getMessage.contains("cannot safely widen"))
  }

  test("JSONL and CSV exports round-trip behind the atomic swap") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wh-export").toString
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", -2.25), (3L, null, 0.0))
      .toDF("k", "name", "score")
    Warehouse.exportJsonl(df, dir, "docs_jsonl")
    val back = Warehouse.readJsonl(s, dir, "docs_jsonl", df.schema)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSet
    assert(back == Set((1L, Some("alpha"), 1.5), (2L, Some("beta"), -2.25), (3L, None, 0.0)))
    // re-export swaps atomically over the previous export
    Warehouse.exportJsonl(df.filter($"k" =!= 2L), dir, "docs_jsonl")
    assert(Warehouse.readJsonl(s, dir, "docs_jsonl", df.schema).count() == 2)
    Warehouse.exportCsv(df, dir, "docs_csv")
    val csv = s.read.option("header", "true").schema(df.schema)
      .csv(s"$dir/docs_csv")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSet
    assert(csv == back)
  }

  test("ORC export round-trips nested columns CSV cannot carry") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wh-orc").toString
    val df = Seq(
      (1L, Seq(1.0f, 2.5f), Map("a" -> 1)),
      (2L, Seq.empty[Float], Map.empty[String, Int]))
      .toDF("k", "vec", "tags")
    Warehouse.exportOrc(df, dir, "docs_orc")
    val back = Warehouse.readOrc(s, dir, "docs_orc")
    // ORC carries its own schema (names+types; nullability flags relax
    // to nullable on read, as for any file source)
    assert(back.schema.map(f => (f.name, f.dataType.sql))
      == df.schema.map(f => (f.name, f.dataType.sql)))
    val rows = back.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1), r.getMap[String, Int](2).toMap)).toSet
    assert(rows == Set(
      (1L, Seq(1.0f, 2.5f), Map("a" -> 1)),
      (2L, Seq.empty[Float], Map.empty[String, Int])))
    // re-export swaps atomically, like the other formats
    Warehouse.exportOrc(df.filter($"k" === 1L), dir, "docs_orc")
    assert(Warehouse.readOrc(s, dir, "docs_orc").count() == 1)
  }

  test("multi-table txn: one commit covers all tables; readers see all of it or none") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wh-txn").toString
    val facts1 = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val rollup1 = Seq(("all", 30L)).toDF("g", "total")
    val t1 = Warehouse.Txn.commit(s, dir, "grp",
      Map("facts" -> facts1, "rollup" -> rollup1))
    assert(t1 == 1L)
    val snap1 = Warehouse.Txn.snapshot(s, dir, "grp").get
    assert(Warehouse.Txn.readAt(s, dir, "grp", snap1, "facts").count() == 2L)
    assert(Warehouse.Txn.readAt(s, dir, "grp", snap1, "rollup")
      .head().getLong(1) == 30L)

    // a crashed writer: generation dirs written, root NOT flipped —
    // readers still resolve txn 1 in full
    Seq((9L, 9L)).toDF("k", "v").write
      .parquet(s"$dir/grp.txndata/facts/99")
    assert(Warehouse.Txn.snapshot(s, dir, "grp").get.txn == 1L)
    assert(Warehouse.Txn.read(s, dir, "grp", "facts").count() == 2L)

    // txn 2 updates BOTH tables atomically; the orphan is pruned
    val facts2 = facts1.unionByName(Seq((3L, 30L)).toDF("k", "v"))
    val t2 = Warehouse.Txn.commit(s, dir, "grp",
      Map("facts" -> facts2, "rollup" -> Seq(("all", 60L)).toDF("g", "total")),
      expectedTxn = 1L)
    assert(t2 == 2L)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/grp.txndata/facts/99")),
      "crashed-writer orphans must be pruned by the next commit")
    val snap2 = Warehouse.Txn.snapshot(s, dir, "grp").get
    assert(Warehouse.Txn.readAt(s, dir, "grp", snap2, "facts").count() == 3L)
    assert(Warehouse.Txn.readAt(s, dir, "grp", snap2, "rollup")
      .head().getLong(1) == 60L)
    // snapshot isolation: the OLD resolved snapshot still reads the old
    // generations (one-commit reader grace)
    assert(Warehouse.Txn.readAt(s, dir, "grp", snap1, "facts").count() == 2L)
    assert(Warehouse.Txn.readAt(s, dir, "grp", snap1, "rollup")
      .head().getLong(1) == 30L)

    // partial commit: only the rollup moves; facts carry their gen
    Warehouse.Txn.commit(s, dir, "grp",
      Map("rollup" -> Seq(("all", 61L)).toDF("g", "total")))
    val snap3 = Warehouse.Txn.snapshot(s, dir, "grp").get
    assert(snap3.txn == 3L)
    assert(snap3.gens("facts") == snap2.gens("facts"),
      "untouched members must not be rewritten")
    assert(Warehouse.Txn.readAt(s, dir, "grp", snap3, "rollup")
      .head().getLong(1) == 61L)

    // the replay / optimistic-concurrency guard fails loudly
    assert(intercept[java.io.IOException] {
      Warehouse.Txn.commit(s, dir, "grp",
        Map("rollup" -> rollup1), expectedTxn = 1L)
    }.getMessage.contains("retry"))
  }

  test("txn commit: claim barrier makes the racing loser loud, no commit is lost") {
    val s = spark; import s.implicits._
    import graft.sources.MergeOnRead.ConcurrentWriterException
    val dir = java.nio.file.Files.createTempDirectory("wh-txn-race").toString
    Warehouse.Txn.commit(s, dir, "grp",
      Map("facts" -> Seq((1L, 10L)).toDF("k", "v")))

    // a peer mid-commit: its claim on txn 2 is on disk, root unmoved —
    // our commit must fail LOUDLY before writing any data
    val claim = java.nio.file.Paths.get(s"$dir/grp.txnclaim/2")
    java.nio.file.Files.createDirectories(claim.getParent)
    java.nio.file.Files.createFile(claim)
    assert(intercept[ConcurrentWriterException] {
      Warehouse.Txn.commit(s, dir, "grp",
        Map("facts" -> Seq((2L, 20L)).toDF("k", "v")), expectedTxn = 1L)
    }.getMessage.contains("claimed"))
    assert(Warehouse.Txn.snapshot(s, dir, "grp").get.txn == 1L)
    // a FRESH claim might be a live peer mid-commit: the age guard
    // refuses it — deleting it would re-open the lost-commit window
    assert(Warehouse.Txn.releaseStaleClaims(s, dir, "grp") == 0)
    // an AGED claim (mtime past minAgeMs) is a crashed writer: released
    java.nio.file.Files.setLastModifiedTime(claim,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 700000L))
    assert(Warehouse.Txn.releaseStaleClaims(s, dir, "grp") == 1)
    assert(Warehouse.Txn.commit(s, dir, "grp",
      Map("facts" -> Seq((2L, 20L)).toDF("k", "v")), expectedTxn = 1L) == 2L)
    // force releases a fresh claim when liveness was confirmed out of band
    val claim3 = java.nio.file.Paths.get(s"$dir/grp.txnclaim/3")
    java.nio.file.Files.createFile(claim3)
    assert(Warehouse.Txn.releaseStaleClaims(s, dir, "grp") == 0)
    assert(Warehouse.Txn.releaseStaleClaims(s, dir, "grp", force = true) == 1)

    // two live racers on the same expected state: exactly one commits,
    // the loser throws (claim lost, or root moved under its claim /
    // before its expectedTxn check), and the winner's generation is
    // what the root resolves — never a silently vanished commit
    import scala.collection.parallel.CollectionConverters._
    val outcomes = (10L to 11L).par.map { v =>
      scala.util.Try(Warehouse.Txn.commit(s, dir, "grp",
        Map("facts" -> Seq((v, v)).toDF("k", "v")), expectedTxn = 2L))
    }.toList
    assert(outcomes.count(_.isSuccess) == 1, s"exactly one racer must win: $outcomes")
    assert(outcomes.collect { case scala.util.Failure(e) => e }.forall(e =>
      e.isInstanceOf[ConcurrentWriterException] || e.isInstanceOf[java.io.IOException]))
    val snap = Warehouse.Txn.snapshot(s, dir, "grp").get
    assert(snap.txn == 3L)
    val k = Warehouse.Txn.readAt(s, dir, "grp", snap, "facts").head().getLong(0)
    assert(k == 10L || k == 11L)
  }

  test("txn batch stamp: out-of-band commits shift the counter, not the replay guard") {
    val s = spark; import s.implicits._
    import graft.operators.MergeSpec
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("wh-txn-stamp").toString
    def roll(f: org.apache.spark.sql.DataFrame) =
      f.agg(sum("v").as("total")).select(lit("all").as("g"), col("total"))
    val spec = MergeSpec(Seq("k"), Seq("v"))
    val ts = to_timestamp(lit("2024-06-01 00:00:00"))
    val f0 = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    Warehouse.Txn.commit(s, dir, "grp", Map("facts" -> f0, "rollup" -> roll(f0)))
    assert(Warehouse.Txn.snapshot(s, dir, "grp").get.lastBatch == -1L)

    import graft.streaming.Streams
    assert(Streams.foldTxnBatch(Seq((1L, 11L)).toDF("k", "v"), 0L, dir, "grp", spec, ts, roll))
    assert(Streams.foldTxnBatch(Seq((2L, 22L)).toDF("k", "v"), 1L, dir, "grp", spec, ts, roll))
    assert(Warehouse.Txn.snapshot(s, dir, "grp").get.lastBatch == 1L)
    // crash replay of batch 1 no-ops
    assert(!Streams.foldTxnBatch(Seq((2L, -9L)).toDF("k", "v"), 1L, dir, "grp", spec, ts, roll))

    // OUT-OF-BAND fix-up commit (no batch id): the txn counter moves,
    // the batch stamp must NOT — under a counter-derived guard the next
    // live batch would silently vanish as a "replay"
    val fixed = Warehouse.Txn.read(s, dir, "grp", "facts")
      .unionByName(Seq((9L, 90L)).toDF("k", "v"))
    Warehouse.Txn.commit(s, dir, "grp", Map("facts" -> fixed, "rollup" -> roll(fixed)))
    assert(Warehouse.Txn.snapshot(s, dir, "grp").get.lastBatch == 1L,
      "an unstamped commit must carry the batch stamp forward, not reset or bump it")
    assert(Streams.foldTxnBatch(Seq((3L, 30L)).toDF("k", "v"), 2L, dir, "grp", spec, ts, roll),
      "a live batch after an out-of-band commit must still apply")
    val snap = Warehouse.Txn.snapshot(s, dir, "grp").get
    assert(snap.lastBatch == 2L)
    val facts = Warehouse.Txn.readAt(s, dir, "grp", snap, "facts")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(facts == Set((1L, 11L), (2L, 22L), (3L, 30L), (9L, 90L)))
    // the committed rollup matches the committed facts (atomicity held
    // across every path above)
    assert(Warehouse.Txn.readAt(s, dir, "grp", snap, "rollup").head().getLong(1)
      == facts.toSeq.map(_._2).sum)
  }

  test("pre-stamp root seeds lastBatch = txn - 2: the migration window's first replay skips on modified content") {
    val s = spark; import s.implicits._
    import graft.operators.MergeSpec
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("wh-txn-prestamp").toString
    def roll(f: org.apache.spark.sql.DataFrame) =
      f.agg(sum("v").as("total")).select(lit("all").as("g"), col("total"))
    val spec = MergeSpec(Seq("k"), Seq("v"))
    val ts = to_timestamp(lit("2024-06-01 00:00:00"))
    // a pre-stamp group: bootstrap (txn 1), then batch 0 applied
    // OLD-STYLE — merged content committed with no batch stamp (txn 2,
    // root line carries no batch= key)
    val f0 = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    Warehouse.Txn.commit(s, dir, "grp", Map("facts" -> f0, "rollup" -> roll(f0)))
    assert(Warehouse.Txn.snapshot(s, dir, "grp").get.lastBatch == -1L,
      "a bootstrap-only pre-stamp root seeds -1 (txn 1 - 2)")
    val m0 = Seq((1L, 11L), (2L, 20L)).toDF("k", "v")
    Warehouse.Txn.commit(s, dir, "grp", Map("facts" -> m0, "rollup" -> roll(m0)))
    assert(Warehouse.Txn.snapshot(s, dir, "grp").get.lastBatch == 0L,
      "a pre-stamp root at txn 2 seeds lastBatch 0 (one batch applied)")
    import graft.streaming.Streams
    // the derived seed rests on an UNVERIFIABLE convention assumption:
    // resuming a stream on it must be an explicit operator decision —
    // the default REFUSES loudly instead of silently skipping batches
    // for a convention-violating group
    val refusal = intercept[IllegalStateException] {
      Streams.foldTxnBatch(Seq((1L, -99L)).toDF("k", "v"), 0L, dir, "grp", spec, ts, roll)
    }
    assert(refusal.getMessage.contains("PRE-STAMP"),
      "resume on a derived seed must refuse without the explicit opt-in")
    // the window that used to be open: a crash replay of batch 0 with
    // MODIFIED content under the stamped sink — must skip via the seed
    // once the operator opts in
    assert(!Streams.foldTxnBatch(Seq((1L, -99L)).toDF("k", "v"), 0L, dir, "grp", spec, ts, roll,
      acceptPrestampSeed = true),
      "a pre-stamp root's replayed batch must skip even with modified content")
    // and the next live batch applies, stamping explicitly from then on
    assert(Streams.foldTxnBatch(Seq((3L, 30L)).toDF("k", "v"), 1L, dir, "grp", spec, ts, roll,
      acceptPrestampSeed = true))
    val snap = Warehouse.Txn.snapshot(s, dir, "grp").get
    assert(snap.lastBatch == 1L)
    assert(Warehouse.Txn.readAt(s, dir, "grp", snap, "facts")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == Set((1L, 11L), (2L, 20L), (3L, 30L)))
  }
}
