package graft

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.sources.Layout

/** Scale-path behaviors: salted joins equal plain joins; co-bucketed
  * joins plan without a shuffle.
  */
class ScaleSpec extends AnyFunSuite with SparkTest {

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val s = spark; import s.implicits._
    // fact partitioned by day (20 partitions); the filter lives on the
    // DIM side only, so static pruning can't help — the scan must pick
    // up a DPP subquery fed by the broadcast side and read only the
    // days the filtered dim actually contains
    val base = java.nio.file.Files.createTempDirectory("dpp").toString
    val dir = base + "/fact"
    val fact = (1 to 10000).map(i => (i.toLong, s"d${i % 20}")).toDF("v", "day")
    Layout.writePartitioned(fact, dir, Seq("day"))
    // the dim must be a real file scan: DPP's planning rule only
    // builds the pruning subquery from a scannable filter side
    (0 until 20).map(i => (s"d$i", i % 10)).toDF("day", "grp")
      .write.parquet(base + "/dim")
    val q = s.read.parquet(dir)
      .join(broadcast(s.read.parquet(base + "/dim").filter($"grp" === 3)), "day")
      .agg(sum("v").as("sv"))
    assert(q.collect().head.getLong(0) > 0)
    val helper = new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
    val scans = helper.collectWithSubqueries(q.queryExecution.executedPlan) {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }
    val factScan = scans.find(_.metadata.get("Location").exists(_.contains("fact")))
      .getOrElse(scans.head)
    assert(factScan.partitionFilters.exists(
      _.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression])),
      s"fact scan carries no DPP filter:\n${q.queryExecution.executedPlan}")
    // the runtime metric proves pruning HAPPENED: 2 of 20 day
    // partitions read (d3 and d13 are the grp=3 days)
    val read = factScan.metrics("numPartitions").value
    assert(read == 2, s"expected 2 partitions read after DPP, got $read")
  }

  test("bucket pruning: a point lookup on the bucket key reads 1 of 8 buckets") {
    val s = spark; import s.implicits._
    s.sql("DROP TABLE IF EXISTS bucketed_prune")
    val loc = new java.io.File(
      s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "bucketed_prune")
    org.apache.commons.io.FileUtils.deleteQuietly(loc)
    val df = (1 to 10000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    Layout.writeBucketed(df, "bucketed_prune", 8, Seq("k"))
    val q = Layout.table(s, "bucketed_prune").where($"k" === 4242L)
    assert(q.count() == 1)
    val scan = q.queryExecution.executedPlan.collectWithSubqueries {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }.head
    // the scan itself must carry the bucket restriction — pruning at
    // planning, not a post-scan filter: 1 of 8 buckets opened
    assert(scan.optionalBucketSet.exists(_.cardinality() == 1),
      s"expected exactly one selected bucket:\n$scan")
  }

  test("AQE splits a skewed join partition at runtime (no salting needed)") {
    val s = spark; import s.implicits._
    // one hot key with ~100k rows vs 99 cold keys: a plain sort-merge
    // join would hang one reducer; AQE's skew handling must split it.
    // Thresholds are lowered so the 'skewed partition' regime is
    // reachable at test scale; the assertion is on the join node's
    // own isSkewJoin flag, not a string match.
    val conf = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.map { case (k, _) => k -> util.Try(s.conf.get(k)).toOption }
    conf.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val fact = (1 to 200000).map(i =>
        (if (i % 2 == 0) 7L else (i % 100).toLong, s"payload_$i")).toDF("k", "pay")
      val dim = (0 until 100).map(i => (i.toLong, s"d$i")).toDF("k", "dv")
      // no aggregation downstream of the join: a consumer requiring
      // the join's hash partitioning forbids the skew split (the
      // regime where Skew.saltedJoin is the remedy instead — that is
      // exactly the division of labor this suite documents)
      val j = fact.join(dim, "k")
      // run THIS dataset's plan (count()/collect() build new ones)
      assert(j.queryExecution.toRdd.count() == 200000)
      val plan = j.queryExecution.executedPlan
      val smj = plan.toString()
      assert(smj.contains("isSkewJoin=true") || smj.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$smj")
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("z-ordered files cover narrow ranges of BOTH filter columns") {
    val s = spark; import s.implicits._
    import graft.sources.Layout
    // deterministic pseudo-uniform 2D points, x and y independent
    val pts = (0 until 20000).map { i =>
      ((i * 2654435761L) % 100000, (i * 40503L + 7919L) % 100000)
    }.toDF("x", "y")
    def fileRanges(dir: String, c: String): Seq[Double] =
      s.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(((max(col(c)) - min(col(c))) / 100000.0).as("r"))
        .collect().map(_.getDouble(1)).toSeq
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    Layout.writeZOrdered(pts, "x", "y", zDir, numFiles = 16)
    val zx = fileRanges(zDir, "x"); val zy = fileRanges(zDir, "y")
    // a z-interval of 1/16 of the curve bounds both dims near sqrt(1/16)
    assert(zx.sum / zx.size < 0.6, s"x ranges too wide: ${zx.sum / zx.size}")
    assert(zy.sum / zy.size < 0.6, s"y ranges too wide: ${zy.sum / zy.size}")
    // contrast: linear sort narrows ONLY the sort column
    val linDir = java.nio.file.Files.createTempDirectory("linorder").toString + "/t"
    pts.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(linDir)
    val lx = fileRanges(linDir, "x"); val ly = fileRanges(linDir, "y")
    assert(lx.sum / lx.size < 0.2, "sort column should be narrow")
    assert(ly.sum / ly.size > 0.9, "non-sort column spans the domain — the gap z-order closes")
  }

  test("bloom pruning opens few files for a point probe; result equals plain filter; absent key opens ~none") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bloom").toString + "/t"
    // 20k keys hashed into 16 files on an UNRELATED column: every file
    // spans the whole key domain, so min/max pruning would keep all 16
    (0L until 20000L).map(i => (i, i % 997L)).toDF("k", "grp")
      .repartition(16, col("grp")).write.parquet(dir)
    val mf = Layout.bloomManifest(s, dir, "k", bits = 262144, hashes = 4)
    mf.cache().count()
    val hitDf = Layout.readBloomPruned(s, dir, mf, "k", lit(12345L),
      bits = 262144, hashes = 4)
    assert(hitDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((12345L, 12345L % 997L)))
    assert(hitDf.inputFiles.length <= 4,
      s"bloom must prune most of the 16 files, opened ${hitDf.inputFiles.length}")
    val missDf = Layout.readBloomPruned(s, dir, mf, "k", lit(999999999L),
      bits = 262144, hashes = 4)
    assert(missDf.isEmpty, "absent key returns no rows")
    assert(missDf.inputFiles.length <= 2,
      s"absent key should open at most a false-positive file or two, opened ${missDf.inputFiles.length}")
    // the manifest carries its own (bits, hashes); a mismatched probe
    // would silently DROP ROWS (false negatives) — rejected instead
    val e = intercept[IllegalArgumentException] {
      Layout.readBloomPruned(s, dir, mf, "k", lit(12345L), bits = 65536, hashes = 4)
    }
    assert(e.getMessage.contains("bits=262144"))
    mf.unpersist()
  }

  test("partitioned MoR read: stale partition copies are PRUNED at the scan, not filtered") {
    val s = spark; import s.implicits._
    import graft.sources.MergeOnRead
    import graft.operators.{MergeSpec => MSpec}
    val dir = java.nio.file.Files.createTempDirectory("morprune").toString
    val base = (1L to 4000L).map(i => (i, s"m${i % 8}", i * 10L)).toDF("k", "p", "v")
    MergeOnRead.initPartitioned(base, dir, "t", Seq("k"), "p")
    MergeOnRead.deltaMerge(s, dir, "t",
      Seq((1L, "m1", -1L), (9L, "m1", -9L)).toDF("k", "p", "v"),
      MSpec(Seq("k"), Seq("v")), to_timestamp(lit("2024-06-01 00:00:00")), 1L)
    MergeOnRead.compact(s, dir, "t")
    // gen 1 now holds a STALE m1 copy (grace) beside 7 live partitions;
    // gen 2 holds the live m1 — the view must prune, not read-and-drop
    val view = MergeOnRead.readView(s, dir, "t")
    view.count()
    // inputFiles reports the PRE-pruning inventory; the pruned truth is
    // each scan's selected partitions
    val selected = view.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.toPartitionArray.toSeq.map(_.filePath.toString)
    }.flatten
    assert(selected.nonEmpty)
    assert(!selected.exists(_.contains("morbase/1/p=m1")),
      "the superseded partition copy must never be opened")
    assert(selected.exists(_.contains("morbase/2/p=m1")))
    assert(view.count() == 4000L)
  }

  test("pc-less routing probe is COLUMN-PRUNED: the scan reads keys + partition column only") {
    val s = spark; import s.implicits._
    import graft.sources.MergeOnRead
    val dir = java.nio.file.Files.createTempDirectory("morroute").toString
    // a deliberately WIDE table: the probe must not pay for the payload
    val base = (1L to 4000L).map(i =>
      (i, s"m${i % 8}", i * 10L, s"payload-$i", s"more-$i")).toDF("k", "p", "v", "w1", "w2")
    MergeOnRead.initPartitioned(base, dir, "t", Seq("k"), "p")
    val m = MergeOnRead.manifest(s, dir, "t")
    val probe = MergeOnRead.routingProbe(s, dir, "t", m,
      Seq(1L, 9L).toDF("k"), "p", Seq("k"))
    probe.count()
    val helper = new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
    val scans = helper.collectWithSubqueries(probe.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    // every base scan's ReadSchema carries the key alone (p is a
    // partition column — zero data bytes); the payload columns are gone
    val baseScans = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains("morbase")))
    assert(baseScans.nonEmpty)
    baseScans.foreach { f =>
      val read = f.requiredSchema.fieldNames.toSet
      assert(read == Set("k"),
        s"probe must read only the key column, got $read")
    }
    // and the probe routes correctly: both keys live in m1
    assert(probe.select(col("p")).distinct().collect().map(_.getString(0)).toSeq == Seq("m1"))
  }

  test("MoR reconcile: broadcast below the delta-bytes guard, shuffled join past it — same rows") {
    val s = spark; import s.implicits._
    import graft.sources.MergeOnRead
    import graft.operators.{MergeSpec => MSpec}
    val dir = java.nio.file.Files.createTempDirectory("morguard").toString
    MergeOnRead.init((1L to 5000L).map(i => (i, i)).toDF("k", "v"), dir, "t", Seq("k"))
    MergeOnRead.deltaMerge(s, dir, "t", (1L to 50L).map(i => (i, -i)).toDF("k", "v"),
      MSpec(Seq("k"), Seq("v")), to_timestamp(lit("2024-06-01 00:00:00")), 1L)
    val below = MergeOnRead.readView(s, dir, "t") // default limit: chain ≪ 256 MB
    below.count()
    assert(below.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "compact chains must broadcast (base never shuffles)")
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val above = MergeOnRead.readView(s, dir, "t", broadcastDeltaBytesLimit = 0L)
      above.count()
      assert(!above.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "an overgrown chain must fall back to a shuffled anti-join, not a driver-sized broadcast")
      assert(above.collect().map(_.toString).sorted.toSeq ==
        below.collect().map(_.toString).sorted.toSeq)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("MoR merge slice: reconcile + source-key broadcasts guarded, shuffled past the limits — same rows") {
    val s = spark; import s.implicits._
    import graft.sources.MergeOnRead
    import graft.operators.{MergeSpec => MSpec}
    val dir = java.nio.file.Files.createTempDirectory("morslice").toString
    MergeOnRead.init((1L to 5000L).map(i => (i, i)).toDF("k", "v"), dir, "t", Seq("k"))
    MergeOnRead.deltaMerge(s, dir, "t", (1L to 50L).map(i => (i, -i)).toDF("k", "v"),
      MSpec(Seq("k"), Seq("v")), to_timestamp(lit("2024-06-01 00:00:00")), 1L)
    val m = MergeOnRead.manifest(s, dir, "t")
    val src = (10L to 30L).map(i => (i, 0L)).toDF("k", "v")
    val below = MergeOnRead.mergeSlice(s, dir, "t", m, src, Seq("k"), srcKeyRows = 21L)
    below.count()
    assert(below.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "within both guards the slice's joins broadcast")
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      // past the guards (delta bytes AND source-key rows) every join in
      // the merge path runs shuffled — a backfill-sized batch degrades
      // to a plan change, never a driver OOM
      val above = MergeOnRead.mergeSlice(s, dir, "t", m, src, Seq("k"), srcKeyRows = 21L,
        broadcastDeltaBytesLimit = 0L, broadcastSourceKeyRowsLimit = 0L)
      above.count()
      assert(!above.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "past the guards the merge path must not plan a driver-sized broadcast")
      assert(above.collect().map(_.toString).sorted.toSeq ==
        below.collect().map(_.toString).sorted.toSeq)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("MoR reserved columns: init and evolve reject the __mor_ namespace") {
    val s = spark; import s.implicits._
    import graft.sources.MergeOnRead
    val dir = java.nio.file.Files.createTempDirectory("morresv").toString
    assert(intercept[IllegalArgumentException] {
      MergeOnRead.init(Seq((1L, true)).toDF("k", "__mor_del"), dir, "bad", Seq("k"))
    }.getMessage.contains("__mor_"))
    MergeOnRead.init(Seq((1L, 1L)).toDF("k", "v"), dir, "t", Seq("k"))
    // evolving a reserved name would silently corrupt tombstone/batch
    // resolution on every later read — rejected at DDL time
    for (bad <- Seq("__mor_del", "__mor_batch", "__mor_seq"))
      assert(intercept[IllegalArgumentException] {
        MergeOnRead.evolve(s, dir, "t", Seq(bad -> "string"))
      }.getMessage.contains("__mor_"))
  }

  test("encodingAdvisor / schemaDriftReport survive non-identifier column names") {
    val s = spark; import s.implicits._
    import graft.sources.Layout
    import graft.operators.Quality
    // names that are valid Spark columns but not bare SQL identifiers:
    // spaces, dots, hyphens, an embedded quote — the string-SQL unpivot
    // these ops used to build would misparse or break on every one
    val df = Seq((1L, "a", "x"), (1L, "a", null), (2L, "b", "y"))
      .toDF("file id", "run.col", "weird-name'q")
    val adv = Layout.encodingAdvisor(df, col("`file id`"),
      Seq(col("`run.col`")), Seq("run.col", "weird-name'q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(adv == Set(("run.col", 3L, 0L), ("weird-name'q", 3L, 1L)))
    val drift = Quality.schemaDriftReport(
      df.select(col("`file id`"), col("`run.col`")),
      df.select(expr("try_cast(`run.col` AS int)").as("run.col"), col("`weird-name'q`")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(drift == Set(("file id", "dropped"), ("run.col", "type_changed"),
      ("weird-name'q", "added")))
  }

  test("rendezvousShard: uniform-ish occupancy, adds-only relocation, deterministic") {
    val s = spark; import s.implicits._
    import graft.sources.Layout
    val keys = (1L to 4000L).toDF("k")
    val a = Layout.rendezvousShard(keys, "k", 8, salt = "t").withColumnRenamed("shard", "s8")
    val counts = a.groupBy("s8").count().collect().map(r => r.getLong(1))
    assert(counts.length == 8 && counts.min > 300 && counts.max < 700,
      s"md5 weights keep occupancy near uniform: ${counts.mkString(",")}")
    // adding shard 8: every relocation lands ON the new shard, ~1/9 move
    val b = Layout.rendezvousShard(keys, "k", 9, salt = "t").withColumnRenamed("shard", "s9")
    val j = a.join(b, "k").select("s8", "s9").collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(j.forall { case (x, y) => x == y || y == 8 },
      "HRW relocations may only target the added shard")
    val moved = j.count { case (x, y) => x != y }
    assert(moved > 4000 / 9 / 2 && moved < 4000 / 9 * 2, s"~1/9 should move: $moved")
    // same salt, same assignment — pure function of (salt, key, n)
    assert(Layout.rendezvousShard(keys.repartition(7), "k", 8, salt = "t")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet ==
      a.collect().map(r => (r.getLong(0), r.getInt(1))).toSet)
  }

  test("blockingRecallReport: recall climbs with band count, candidates grow, truth fixed") {
    val s = spark; import s.implicits._
    import graft.operators.Dedup
    // near-dup pairs of long token strings + unrelated docs
    def text(seed: Int, mut: Int) = (1 to 30).map(i =>
      if (i == mut) s"x$seed$i" else s"w$seed${i % 7}").mkString(" ")
    val docs = (Seq((1L, text(1, 0)), (2L, text(1, 3)), (3L, text(2, 0)),
      (4L, text(2, 5)), (5L, text(5, 0)), (6L, text(6, 0))))
      .toDF("doc_id", "text")
    val out = Dedup.blockingRecallReport(docs, 16, Seq(2, 4, 8), 1, 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    graft.operators.Caches.release()
    assert(out.map(_._2).distinct.length == 1, "truth pair count is config-independent")
    assert(out.map(_._3).sliding(2).forall(p => p.head <= p.last),
      "more bands never shrink the candidate set (coarser per-band signatures)")
    assert(out.map(_._4).sliding(2).forall(p => p.head <= p.last),
      "recall is monotone in band count")
    assert(out.forall { case (_, t, _, c) => c <= t }, "caught <= truth")
  }

  test("manifest pruning reads only overlapping files, result equals full filter") {
    val s = spark; import s.implicits._
    import graft.sources.Layout
    val pts = (0 until 20000).map { i =>
      ((i * 2654435761L) % 100000, (i * 40503L + 7919L) % 100000)
    }.toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString + "/t"
    Layout.writeZOrdered(pts, "x", "y", dir, numFiles = 16)
    val manifest = Layout.fileManifest(s, dir, Seq("x", "y"))
    val nFiles = manifest.count()
    assert(nFiles == 16)
    // narrow 2D box: z-order keeps most files fully outside it
    val ranges = Seq(("x", 10000.0, 20000.0), ("y", 30000.0, 40000.0))
    val pruned = Layout.readPruned(s, dir, manifest, ranges)
    val expected = s.read.parquet(dir)
      .where($"x".between(10000, 20000) && $"y".between(30000, 40000))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val got = pruned.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == expected && got.nonEmpty)
    assert(pruned.inputFiles.length < nFiles,
      s"pruning skipped nothing: ${pruned.inputFiles.length} of $nFiles files read")
    // a box outside the domain reads zero files and returns zero rows
    val none = Layout.readPruned(s, dir, manifest, Seq(("x", 200000.0, 300000.0)))
    assert(none.count() == 0)
  }

  test("compact merges small files without changing content") {
    val s = spark; import s.implicits._
    import graft.sources.{Layout, Warehouse}
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    // simulate micro-batch dribble: 64 tiny files
    val data = (0 until 6400).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    Warehouse.overwrite(data.repartition(64), dir, "t")
    def files() = Warehouse.read(s, dir, "t").inputFiles.length
    val before = files()
    assert(before >= 32, s"expected many small files, got $before")
    Layout.compact(s, dir, "t", rowsPerFile = 2000L)
    assert(files() <= 4, s"expected ~4 files after compaction, got ${files()}")
    val got = Warehouse.read(s, dir, "t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 6400 && got(17L) == "v17", "content must be byte-for-byte preserved")
  }

  test("saltedJoin returns exactly the plain join result on skewed data") {
    val s = spark; import s.implicits._
    // heavy skew: 90% of rows share key 7
    val large = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 50 else 7L, i)).toDF("k", "v")
    val small = (0L to 49L).map(k => (k, s"dim-$k")).toDF("k", "name")
    val plain = large.join(small, Seq("k"), "inner")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val salted = Skew.saltedJoin(large, small, Seq("k"), 8)
      .select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
  }

  test("interleaveOrder: dominant source spreads across partitions, no window in the plan") {
    val s = spark; import s.implicits._
    // the Common Crawl shape: one source holds 90% of the corpus.
    // AQE rightly coalesces a 5000-row shuffle to one partition; turn
    // that off so the partition evidence shows the PLAN's spread.
    val savedCoalesce = s.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    def srcOf(i: Int): String = if (i % 10 == 0) s"minor${i % 3}" else "cc"
    val docs = (0 until 5000).map(i => (i.toLong, srcOf(i))).toDF("id", "src")
    val out =
      try graft.operators.Sampling.interleaveOrder(docs, "src", "id", salt = "sk")
      finally s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", savedCoalesce)
    // independent oracle: local md5 replay of the striped-rank formula
    def hex(t: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = (0 until 5000).map(i => (i.toLong, srcOf(i)))
    val srcs = rows.map(_._2).distinct.sorted
    val sidx = srcs.zipWithIndex.toMap
    val expected = rows.groupBy(_._2).flatMap { case (srcName, rs) =>
      rs.map(r => (r._1, hex(s"sk:${r._1}")))
        .sortBy { case (id, h) => (h, id) }
        .zipWithIndex
        .map { case ((id, _), rk) =>
          id -> (rk.toLong * srcs.size + sidx(srcName)) }
    }.toMap
    val got = out.select("id", "order_key").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // plan: no window rank, no single-partition funnel anywhere
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"per-source window rank is the 100 TB killer:\n$plan")
    assert(!plan.contains("SinglePartition"), plan)
    // the dominant source's rows physically span many range partitions
    val ccParts = out.filter($"src" === "cc")
      .select(spark_partition_id().as("pid")).distinct().count()
    assert(ccParts > 4, s"dominant source landed on only $ccParts partition(s)")
  }

  test("packContextStream: range prefix sum equals sequential replay; full windows; no single-partition funnel") {
    val s = spark; import s.implicits._
    val savedCoalesce = s.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val docs = (1 to 3000).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "w")
    val out =
      try graft.operators.Sampling.packContextStream(docs, "id", "w", capacity = 32)
      finally s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", savedCoalesce)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    // sequential replay: one pass, one cursor — the semantics the
    // distributed two-level prefix sum must reproduce exactly
    var off = 0L
    val expected = scala.collection.mutable.Set[(Long, Long, Long, Long)]()
    (1 to 3000).foreach { i =>
      val w = (i % 7).toLong
      if (w > 0) {
        val start = off; val end = off + w; off = end
        var q = start / 32
        while (q <= (end - 1) / 32) {
          val b = math.max(start, q * 32); val e2 = math.min(end, (q + 1) * 32)
          expected += ((i.toLong, q, b - q * 32, e2 - b)); q += 1
        }
      }
    }
    assert(got == expected)

    // packing invariant: every window except the final one is
    // completely filled — the zero-padding layout the op promises
    val fills = got.groupBy(_._2).view.mapValues(_.toSeq.map(_._4).sum).toMap
    val lastSeq = fills.keys.max
    assert(fills.forall { case (q, f) => q == lastSeq || f == 32L }, fills.toString)

    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global-window prefix sum is the 100 TB killer:\n$plan")
    graft.operators.Caches.release()
  }


  test("ewmaTrailing plans ONE window pass; standardize broadcasts the moment table") {
    val s = spark; import s.implicits._
    val ev = (1 to 1000).map(i => (i.toLong % 7, i.toLong, (i % 50).toLong))
      .toDF("user_id", "seq", "units")
    val ewmaPlan = graft.operators.Events
      .ewmaTrailing(ev, "user_id", Seq("seq"), col("units"), window = 20)
      .queryExecution.executedPlan.toString
    // all W lag terms share one window definition -> exactly one Window
    // operator (a second one would mean a second per-key sorted pass)
    val nWindows = "\\bWindow\\b".r.findAllIn(ewmaPlan).size
    assert(nWindows == 1, s"expected one Window op, got $nWindows:\n$ewmaPlan")

    val stdPlan = graft.operators.Stats
      .standardize(ev, Seq("user_id"), Seq("seq"), col("units"))
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(stdPlan.contains("BroadcastHashJoin"),
      s"moment table must ride a broadcast, not a shuffle:\n$stdPlan")
  }

  test("saltedJoin spreads the hot key across reducers where the plain join funnels it") {
    val s = spark; import s.implicits._
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled").map(k => k -> s.conf.get(k))
    try {
      // force a real shuffled join and keep reducer ids honest
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val large = (1 to 20000)
        .map(i => (if (i % 10 == 0) i.toLong % 50 else 7L, i)).toDF("k", "v")
      val small = (0L to 49L).map(k => (k, s"dim-$k")).toDF("k", "name")
      def hotParts(df: org.apache.spark.sql.DataFrame): Long =
        df.filter($"k" === 7L)
          .select(spark_partition_id().as("pid")).distinct().count()
      val plainHot = hotParts(large.join(small, Seq("k"), "inner"))
      val saltedHot = hotParts(Skew.saltedJoin(large, small, Seq("k"), 8))
      assert(plainHot == 1L,
        s"plain join should funnel key 7 through one reducer, got $plainHot")
      assert(saltedHot >= 4L,
        s"salt spread failed: key 7 met the join on only $saltedHot reducer(s)")
    } finally saved.foreach { case (k, v) => s.conf.set(k, v) }
  }

  test("saltedJoinHot: profiled hot key fans out, cold keys stay single-reducer, result exact") {
    val s = spark; import s.implicits._
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled").map(k => k -> s.conf.get(k))
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val fact = (1 to 20000)
        .map(i => (if (i % 10 == 0) i.toLong % 50 else 7L, i)).toDF("k", "v")
      val dim = (0L to 49L).map(k => (k, s"dim-$k")).toDF("dk", "name")
      // act on the profile: key 7 is the one hot key
      val hot = Skew.keyProfile(fact.select($"k"), Seq("k"), topK = 1)
        .select("k").collect().map(_.get(0)).toSeq
      assert(hot == Seq(7L), s"profile should surface key 7, got $hot")
      val salted = Skew.saltedJoinHot(fact, dim, "k", "dk", hot, 8)
      // exactness vs the plain join
      val plain = fact.join(dim, $"k" === $"dk", "inner")
        .select("k", "v", "name")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
      val got = salted.select("k", "v", "name")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
      assert(got == plain)
      // the hot key meets the join on many reducers; a cold key on one
      def parts(df: org.apache.spark.sql.DataFrame, key: Long): Long =
        df.filter($"k" === key)
          .select(spark_partition_id().as("pid")).distinct().count()
      assert(parts(salted, 7L) >= 4L, "hot key failed to fan out across salts")
      assert(parts(salted, 10L) == 1L, "cold key should stay on one reducer")
    } finally saved.foreach { case (k, v) => s.conf.set(k, v) }
  }

  test("keyProfile ranks hot keys with exact integer ppm shares") {
    val s = spark; import s.implicits._
    // 100 rows: key 7 holds 60, key 3 holds 25, keys 0-14 one each
    val rows = Seq.fill(60)(7L) ++ Seq.fill(25)(3L) ++ (0L to 14L)
    val df = rows.map(k => (k, "x")).toDF("k", "pad")
    val prof = Skew.keyProfile(df, Seq("k"), topK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // 61 rows of key 7 (60 + the 7 from the range), 26 of key 3
    assert(prof.toList == List(
      (7L, 61L, 1, 610000L, 15L, 100L),
      (3L, 26L, 2, 260000L, 15L, 100L)))
    // partition layout must not change the profile
    val prof2 = Skew.keyProfile(df.repartition(7), Seq("k"), topK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(prof2.toList == prof.toList)
  }

  test("co-bucketed tables join without any Exchange (shuffle paid at write)") {
    val s = spark; import s.implicits._
    Seq("bucketed_a", "bucketed_b").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      org.apache.commons.io.FileUtils.deleteQuietly(loc)
    }
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (500 to 1500).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Layout.writeBucketed(a, "bucketed_a", 8, Seq("k"))
    Layout.writeBucketed(b, "bucketed_b", 8, Seq("k"))
    val joined = Layout.table(s, "bucketed_a")
      .join(Layout.table(s, "bucketed_b"), Seq("k"))
    assert(joined.count() == 501)
    val exec = joined.queryExecution.executedPlan
    val exchanges = exec.collectWithSubqueries { case e: Exchange => e }
    assert(exchanges.isEmpty, s"expected shuffle-free bucketed join, got:\n$exec")
  }

  test("partitioned layout prunes partitions at the scan") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("layout-part").toString + "/t"
    val df = (1 to 1000).map(i => (i.toLong, s"d${i % 10}")).toDF("v", "day")
    Layout.writePartitioned(df, dir, Seq("day"))
    val q = s.read.parquet(dir).where($"day" === "d3")
    assert(q.count() == 100)
    val scans = q.queryExecution.executedPlan.collectWithSubqueries {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    // the scan's file listing must be restricted to the one matching
    // partition directory — pruning happened at planning, not as a filter
    assert(scan.partitionFilters.nonEmpty, "no partition filters on the scan")
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected exactly one pruned partition, got ${scan.selectedPartitions.partitionCount}")
  }

  test("embeddingNearDupLsh plans equi-joins only — no cartesian product") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(3)
    val emb = (0 until 200).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    def nonEqui(df: org.apache.spark.sql.DataFrame): Boolean = {
      df.count() // run so AQE finalizes the plan
      val plan = df.queryExecution.executedPlan.toString
      plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin")
    }
    // the exact tier IS the documented cross join…
    val exact = graft.operators.Dedup.embeddingNearDup(emb, 0.9)
    assert(nonEqui(exact), "exact tier should be the cross-join oracle")
    // …the LSH tier must never be: candidates come from a bucket
    // equi-join, verification from key equi-joins
    val lsh = graft.operators.Dedup.embeddingNearDupLsh(emb, 0.9, numPlanes = 6, dim = 8)
    assert(!nonEqui(lsh),
      s"LSH tier planned a non-equi join:\n${lsh.queryExecution.executedPlan}")
    graft.operators.Caches.release()
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("hashSplit is a pure projection — zero exchanges, fused into the scan") {
    val s = spark; import s.implicits._
    val docs = (0 until 200).map(i => (i.toLong, s"t$i")).toDF("doc_id", "text")
    val ps = finalPlan(graft.operators.Sampling.hashSplit(
      docs, "doc_id", "s", Seq("a" -> 0.5, "b" -> 0.5)))
    assert(!ps.contains("Exchange "), s"hashSplit shuffled:\n$ps")
  }

  test("decontamination never shuffles the corpus — broadcast anti join") {
    val s = spark; import s.implicits._
    val docs = (0 until 300).map(i => (i.toLong, s"document body $i")).toDF("doc_id", "text")
    val eval = docs.filter($"doc_id" < 10)
    val ps = finalPlan(graft.operators.Dedup.removeContaminated(docs, eval))
    assert(ps.contains("BroadcastHashJoin") && ps.contains("LeftAnti"),
      s"expected broadcast anti join:\n$ps")
    assert(!ps.contains("SortMergeJoin"), s"corpus was shuffled for the anti join:\n$ps")
  }

  test("KMV aggregation is partial (map-side) with a single exchange") {
    val s = spark; import s.implicits._
    val kmv = udaf(new graft.functions.KmvAgg(8),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]())
    val rows = (0 until 500).map(i => (s"g${i % 3}", s"u$i")).toDF("g", "u")
    val df = rows.repartition(4)
      .select($"g", graft.functions.mixed_hash32($"u").as("h"))
      .groupBy("g").agg(kmv($"h").as("mins"))
    val ps = finalPlan(df)
    // two ObjectHashAggregate stages (partial + merge) around ONE exchange:
    // k values per group per map task cross the shuffle, not every row
    assert("ObjectHashAggregate".r.findAllIn(ps).size >= 2,
      s"no partial aggregation:\n$ps")
    assert("Exchange hashpartitioning".r.findAllIn(ps).size == 1,
      s"expected exactly one shuffle:\n$ps")
  }

  test("triangleCounts plans equi-joins only, even on a skewed hub") {
    val s = spark; import s.implicits._
    val e = ((1L to 50L).map(i => (100L, i)) ++ (1L to 20L).map(i => (i, i + 1)))
      .toDF("src", "dst")
    val df = graft.operators.Graph.triangleCounts(e)
    val ps = finalPlan(df)
    graft.operators.Caches.release()
    assert(!ps.contains("CartesianProduct") && !ps.contains("BroadcastNestedLoopJoin"),
      s"triangle counting planned a non-equi join:\n$ps")
  }

  test("zOrderKey interleaves exactly; z layout prunes rectangles the linear sort cannot") {
    val s = spark; import s.implicits._
    // hand case: x=3 (bits 1,1), y=1 (bits 1,0) -> z bits x0,y0,x1,y1
    // = 1,1,1,0 -> z = 0b0111 = 7
    val z = Seq((3L, 1L)).toDF("x", "y")
      .select(graft.sources.Layout.zOrderKey(col("x"), col("y"), 2).as("z"))
      .head().getLong(0)
    assert(z == 7L)
    // uniform 64x64 grid in 16 units: z units are a 4x4 grid of 16x16
    // cells, linear units are 16 x-slices spanning the full y domain
    val grid = (0L until 64L).flatMap(x => (0L until 64L).map(y => (x, y)))
      .toDF("x", "y")
    val rep = graft.sources.Layout.zOrderPruningReport(grid, col("x"), col("y"),
      probes = Seq((0L, 15L, 0L, 15L), (0L, 63L, 8L, 11L)),
      bits = 6, unitBits = 4)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(7)).toMap
    assert(rep(("zorder", 0)) == 1L, s"aligned square must hit ONE z cell: $rep")
    assert(rep(("linear", 0)) == 4L)
    assert(rep(("zorder", 1)) == 4L, "a thin y-band hits one z row")
    assert(rep(("linear", 1)) == 16L, "the linear layout cannot prune the non-lead dim at all")
  }

  test("logRankTest at-risk set plans keyed joins only — no range join") {
    val s = spark; import s.implicits._
    val subj = ((1 to 40).map(i => (i.toLong % 2, (i % 7 + 1).toLong, i % 3 min 1)))
      .toDF("g", "t", "observed")
    val plan = finalPlan(graft.operators.Stats.logRankTest(subj, "g", "t", "observed"))
    // the at-risk counts must come from the suffix-sum window over the
    // collapsed (g, t) axis, never from a subjects x times non-equi
    // join (BNL, |subjects| x |times| intermediate)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"log-rank planned a non-equi join:\n$plan")
    assert(plan.contains("Window"), s"expected the suffix-sum window:\n$plan")
  }

  test("collocations generates pairs map-side — no join before the pair count") {
    val s = spark; import s.implicits._
    val docs = (0 until 50).map(i => (i.toLong, "alpha beta gamma delta " + i))
      .toDF("doc_id", "text")
    val plan = finalPlan(graft.operators.TextAnalysis.collocations(docs, 2, 1, 10))
    // pair generation must be a Generate (explode of the map-side
    // nested transform), never a positions self-join; the only joins
    // are the vocabulary-sized marginal attachments
    assert(plan.contains("Generate explode"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"), plan)
  }

  test("prefix-filter join plans equi-joins only — no cartesian") {
    val s = spark; import s.implicits._
    val docs = (0 until 60).map(i =>
      (i.toLong, if (i % 3 == 0) "the quick brown fox jumps over the lazy dog"
      else s"doc $i with its own words ${i * 7} ${i * 13} here")).toDF("doc_id", "text")
    val df = graft.operators.Dedup.ngramJaccardPairsPrefix(docs, 9, 10)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    graft.operators.Caches.release()
  }

  test("linkFuzzyNamePairs: composite blocking equals noun-only result with bounded candidates") {
    val s = spark; import s.implicits._
    // one big noun block, three length cohorts far apart: within a
    // cohort names differ by <=2 chars (fuzzy matches), across cohorts
    // lengths differ by >3 (never matches) — the length bucket must
    // cut the cross-cohort candidates the noun block alone would pair
    val names =
      (11 to 40).map(i => s"item $i copper") ++
        (11 to 40).map(i => s"shiny heavy item $i copper") ++
        (11 to 40).map(i => s"extraordinarily polished item $i copper")
    val part = names.toDF("p_name")
    val got = SparkEntry.linkFuzzyNamePairs(part)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // oracle: noun-only blocking (single key), then the same dist filter
    val p = part.select(col("p_name")).distinct()
      .withColumn("blk", element_at(split(col("p_name"), " "), -1))
    val nounPairs = p.select(col("p_name").as("name_a"), col("blk"))
      .join(p.select(col("p_name").as("name_b"), col("blk").as("blk2")),
        col("blk") === col("blk2") && col("name_a") < col("name_b"))
    val want = nounPairs
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= 3)
      .select("name_a", "name_b", "dist")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(want.nonEmpty, "fixture must produce fuzzy matches")
    assert(got == want, "composite blocking must be recall-exact under dist <= 3")
    // candidate-count bound: probe pairs before the dist filter
    val lb = expr("length(p_name) div 4")
    val probes = p.withColumn("lb", lb)
      .select(col("p_name").as("name_a"), col("blk"), col("lb"))
      .withColumn("lbp", explode(array(col("lb") - 1, col("lb"), col("lb") + 1)))
    val composite = probes.join(
      p.withColumn("lb2", lb).select(col("p_name").as("name_b"),
        col("blk").as("blk2"), col("lb2")),
      col("blk") === col("blk2") && col("lbp") === col("lb2") &&
        col("name_a") < col("name_b")).count()
    val nounOnly = nounPairs.count()
    assert(composite * 2 < nounOnly,
      s"composite candidates ($composite) must be well under noun-only ($nounOnly)")
  }

  test("pointInTime is the one-shuffle as-of shape — no range-join expansion") {
    val s = spark; import s.implicits._
    val hist = Seq((1L, 10.0)).toDF("k", "bal")
      .withColumn("valid_from", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("valid_to", lit(null).cast("timestamp"))
    val facts = (0 until 100).map(i => (i.toLong, 1L)).toDF("fid", "k")
      .withColumn("ts", to_timestamp(lit("2024-06-01 00:00:00")))
    val df = graft.operators.Merge.pointInTime(facts, hist, Seq("k"), "ts", Seq("bal"))
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    // the naive formulation is a non-equi join (the ORACLE shape);
    // the operator must plan as union + window, no join at all
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("hllRegisters is one partial-aggregated exchange — sketches through the wire") {
    val s = spark; import s.implicits._
    val df = (0 until 500).map(i => ("g" + i % 3, i.toLong)).toDF("grp", "k")
    val regs = graft.operators.Sketches.hllRegisters(df, "grp", "k")
    val plan = finalPlan(regs)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("partial_max"), plan)
  }

  test("sortedNeighborhoodPairs candidates come from an equi-join — no theta join") {
    val s = spark; import s.implicits._
    val docs = (0 until 80).map(i => (i.toLong, s"prefix shared words here tail $i"))
      .toDF("doc_id", "text")
    val df = graft.operators.Dedup.sortedNeighborhoodPairs(docs, windowSize = 3)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    // the rank-band predicate must ride an equi-join on the rank cell,
    // never a nested-loop/cartesian rank comparison
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    graft.operators.Caches.release()
  }

  test("temperatureSample joins the allocation by broadcast — corpus shuffles once for the rank") {
    val s = spark; import s.implicits._
    val docs = (0 until 400).map(i => (i.toLong, s"src${i % 5}")).toDF("doc_id", "src")
    val ps = finalPlan(graft.operators.Sampling.temperatureSample(
      docs, "doc_id", "src", "t", 50, 0.5))
    assert(ps.contains("BroadcastHashJoin"), s"allocation join not broadcast:\n$ps")
    assert(!ps.contains("SortMergeJoin"),
      s"corpus shuffled to meet the groups-sized allocation table:\n$ps")
  }

  test("bm25TopK broadcasts queries, dfs, and stats — no corpus-side sort-merge join") {
    val s = spark; import s.implicits._
    val docs = (0 until 300).map(i =>
      (i.toLong, s"alpha beta w${i % 9} gamma w${(i + 3) % 9} delta")).toDF("doc_id", "text")
    val df = graft.operators.Search.bm25TopK(docs, Seq(1 -> Seq("alpha", "w1")), k = 5)
    val ps = finalPlan(df)
    graft.operators.Caches.release()
    assert(ps.contains("BroadcastHashJoin"), s"query-side joins not broadcast:\n$ps")
    // the only sort allowed is the per-query top-k window, never a
    // corpus-keyed sort-merge join
    assert(!ps.contains("SortMergeJoin"), s"corpus shuffled through a sort-merge join:\n$ps")
  }

  test("winnowFingerprints selects map-side — zero exchanges before the output") {
    val s = spark; import s.implicits._
    val docs = (0 until 100).map(i =>
      (i.toLong, (0 to 12).map(j => s"w${(i + j) % 11}").mkString(" "))).toDF("doc_id", "text")
    val ps = finalPlan(graft.operators.Dedup.winnowFingerprints(docs, 3, 4))
    assert(!ps.contains("Exchange "), s"winnowing shuffled:\n$ps")
  }

  test("normalizeText is a pure projection — zero exchanges") {
    val s = spark; import s.implicits._
    val docs = (0 until 100).map(i => (i.toLong, s"text body $i")).toDF("doc_id", "text")
    val ps = finalPlan(graft.operators.TextAnalysis.normalizeText(docs))
    assert(!ps.contains("Exchange "), s"normalizeText shuffled:\n$ps")
  }

  test("incremental dedup touches corpus text only via a semi-joined pruned read") {
    val s = spark; import s.implicits._
    val mk = (r: Range) => r.map(i => (i.toLong, s"document body number $i with words " +
      (1 to 10).map(j => s"w${(i + j) % 7}").mkString(" "))).toDF("doc_id", "text")
    val delta = mk(0 until 20)
    val corpus = mk(100 until 200)
    val index = graft.operators.Dedup.buildMinHashIndex(corpus, 16, 4)
    val pairs = graft.operators.Dedup.dedupDeltaAgainstIndex(delta, corpus, index, 16, 4)
    val ps = finalPlan(pairs)
    assert(!ps.contains("CartesianProduct"), s"non-equi join in the index probe:\n$ps")
    // the pruned corpus read is a persist barrier, so the semi join
    // lives inside the cached subplan (invisible in the outer string) —
    // assert on the subplan the operator actually builds
    val cand = pairs.select("id_a", "id_b")
    val pruned = graft.operators.Dedup.prunedCorpus(corpus, cand, "doc_id")
    val prunedPlan = pruned.queryExecution.optimizedPlan.toString
    graft.operators.Caches.release()
    assert(prunedPlan.contains("LeftSemi"),
      s"no semi-join pruning of the corpus read:\n$prunedPlan")
  }

  test("consistentShard matches a local ring replay and is partition-invariant") {
    val s = spark; import s.implicits._
    val keys = (0L until 500L).toDF("k")
    val got = Layout.consistentShard(keys, "k", nShards = 8, vnodes = 16, salt = "t")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // independent local replay of the same formula
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(x: String) = { val d = md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString; md.reset(); d }
    val ring = Layout.ringPoints(8, 16, "t")
    val expected = (0L until 500L).map { k =>
      val kh = h(s"t:key:$k")
      k -> ring.find(_._1 >= kh).getOrElse(ring.head)._2
    }.toMap
    assert(got == expected)
    val reparted = Layout.consistentShard(
      keys.repartition(7), "k", nShards = 8, vnodes = 16, salt = "t")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(reparted == got)
  }

  test("consistentShard: growing the ring moves few keys, all onto the new shard") {
    val s = spark; import s.implicits._
    val keys = (0L until 2000L).toDF("k")
    val both = Layout.consistentShard(
      Layout.consistentShard(keys, "k", 8, 16, "t", "s8"), "k", 9, 16, "t", "s9")
      .collect().map(r => (r.getInt(1), r.getInt(2)))
    val moved = both.count { case (a, b) => a != b }
    // expectation 1/9 of 2000 ≈ 222; generous band, but far below the
    // ~8/9 (≈1778) a mod-hash reshard would move
    assert(moved > 50 && moved < 600, s"moved $moved of 2000")
    // the 8-shard ring is a PREFIX of the 9-shard ring: a key moves
    // only when a new shard-8 point became its successor
    assert(both.forall { case (a, b) => a == b || b == 8 },
      "a moved key landed on a pre-existing shard")
  }

  test("consistentShard is a zero-exchange projection") {
    val s = spark; import s.implicits._
    val out = Layout.consistentShard((0L until 100L).toDF("k"), "k", 8, 16, "t")
    val exchanges = out.queryExecution.executedPlan.collect { case e: Exchange => e }
    assert(exchanges.isEmpty, "shard assignment must not shuffle")
  }

  test("production MMR (ANN pool) plans NO cartesian relevance pass") {
    val s = spark; import s.implicits._
    import graft.operators.Similarity
    val rnd = new scala.util.Random(7)
    val emb = (0L until 60L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat()), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    val pool = Similarity.ivfTopK(emb, col("vec_id") < 5, col("vec_id") >= 5,
      k = 8, numCentroids = 4, nProbe = 2)
      .select(col("query_id"), col("neighbor_id").as("cand_id"))
    // force, then unwrap AQE AND recurse into persisted subplans — the
    // pool rides an InMemoryTableScan whose cached build plan is where
    // a cartesian would hide
    def strip(p: org.apache.spark.sql.execution.SparkPlan) = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    def cartesiansIn(
        plan: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      strip(plan).collectWithSubqueries {
        case e: org.apache.spark.sql.execution.joins.CartesianProductExec =>
          Seq(e.nodeName)
        case e: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
          Seq(e.nodeName)
        case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          cartesiansIn(s.relation.cachedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          // AQE stages are leaf wrappers — their real subtree is .plan
          cartesiansIn(q.plan)
      }.flatten
    def cartesians(df: org.apache.spark.sql.DataFrame) = {
      df.count()
      cartesiansIn(df.queryExecution.executedPlan)
    }
    val out = Similarity.mmrRerankFromPool(emb, pool, k = 3)
    assert(out.count() > 0)
    // the whole point of composing over the ANN tier: no |Q|x|C|
    // expansion anywhere — neither a CartesianProduct nor a
    // BroadcastNestedLoopJoin may appear in the physical plan
    assert(cartesians(out).isEmpty,
      s"cartesian pass in production MMR:\n${out.queryExecution.executedPlan}")
    // the oracle tier (exact pool) is EXPECTED to carry one — the
    // contrast pins that the two tiers really take different paths
    val oracleTier = Similarity.mmrRerank(
      emb, col("vec_id") < 5, col("vec_id") >= 5, k = 3, poolK = 8)
    assert(cartesians(oracleTier).nonEmpty,
      "oracle tier should be the labeled cross join")
    graft.operators.Caches.release()
  }
}
