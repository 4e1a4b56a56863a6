package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Merge, MergeSpec}

class MergeSuite extends AnyFunSuite with SparkTest {

  private def nowCol = to_timestamp(lit("2024-06-01 00:00:00"))

  test("scd1: matched rows update only updateCols; audit columns move correctly") {
    val s = spark; import s.implicits._
    val tgt = Seq((1L, "old", 10.0), (2L, "keep", 20.0))
      .toDF("k", "name", "bal")
      .withColumn("created", to_timestamp(lit("2020-01-01 00:00:00")))
      .withColumn("updated", to_timestamp(lit("2020-01-01 00:00:00")))
    val src = Seq((1L, "new", 99.0), (3L, "ins", 30.0)).toDF("k", "name", "bal")
    val out = Merge.scd1(tgt, src,
      MergeSpec(Seq("k"), Seq("name"),
        createdCol = Some("created"), updatedCol = Some("updated"),
        statusCol = Some("st")), nowCol)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getTimestamp(3).toString,
          r.getTimestamp(4).toString, r.getString(5))).toMap
    assert(out(1L) == (("new", 10.0, "2020-01-01 00:00:00.0", "2024-06-01 00:00:00.0", "updated")))
    assert(out(2L) == (("keep", 20.0, "2020-01-01 00:00:00.0", "2020-01-01 00:00:00.0", "kept")))
    assert(out(3L) == (("ins", 30.0, "2024-06-01 00:00:00.0", "2024-06-01 00:00:00.0", "inserted")))
  }

  test("scd1 nullSafeKeys: NULL key matches NULL key (reference U2 quirk)") {
    val s = spark; import s.implicits._
    val tgt = Seq((Some(1L), "a"), (None, "null-row")).toDF("k", "name")
    val src = Seq((Some(2L), "b"), (None, "NULL-NEW")).toDF("k", "name")
    val out = Merge.scd1(tgt, src,
      MergeSpec(Seq("k"), Seq("name"), nullSafeKeys = true,
        statusCol = Some("st")), nowCol)
    val byStatus = out.collect().groupBy(_.getString(2)).view.mapValues(_.length).toMap
    // null matches null -> updated, not inserted
    assert(byStatus == Map("updated" -> 1, "kept" -> 1, "inserted" -> 1))
    val nullRow = out.filter(col("k").isNull).head()
    assert(nullRow.getString(1) == "NULL-NEW")
  }

  test("scd1 touchCols: stamped now on match, source value on insert") {
    val s = spark; import s.implicits._
    val tgt = Seq((1L, "2021-05-05 00:00:00")).toDF("k", "lu")
      .withColumn("lu", to_timestamp($"lu"))
    val src = Seq((1L, "2022-01-01 00:00:00"), (2L, "2022-02-02 00:00:00"))
      .toDF("k", "lu").withColumn("lu", to_timestamp($"lu"))
    val out = Merge.scd1(tgt, src,
      MergeSpec(Seq("k"), Seq.empty, touchCols = Seq("lu")), nowCol)
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1).toString).toMap
    assert(out(1L) == "2024-06-01 00:00:00.0") // matched: stamped now
    assert(out(2L) == "2022-02-02 00:00:00.0") // inserted: source value
  }

  test("scd1 is idempotent: re-merging identical source changes nothing but audit") {
    val s = spark; import s.implicits._
    val src = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "name", "bal")
    val empty = src.limit(0)
      .withColumn("created", to_timestamp(lit("2020-01-01 00:00:00")))
      .withColumn("updated", to_timestamp(lit("2020-01-01 00:00:00")))
    val spec = MergeSpec(Seq("k"), Seq("name"),
      createdCol = Some("created"), updatedCol = Some("updated"))
    val once = Merge.scd1(empty, src, spec, nowCol)
    val twice = Merge.scd1(once, src, spec, to_timestamp(lit("2025-01-01 00:00:00")))
    assert(twice.count() == 2)
    val data = twice.select("k", "name", "bal", "created").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getTimestamp(3).toString)).toSet
    assert(data == Set(
      (1L, "a", 1.0, "2024-06-01 00:00:00.0"),
      (2L, "b", 2.0, "2024-06-01 00:00:00.0")))
  }

  test("scd2: closes changed versions, opens new ones, leaves history immutable") {
    val s = spark; import s.implicits._
    def ts(v: String) = to_timestamp(lit(v))
    val history = Seq(
      (1L, 10.0, "2024-01-01 00:00:00", None: Option[String]), // will change
      (2L, 20.0, "2024-01-01 00:00:00", None), // identical update: no-op
      (3L, 30.0, "2024-01-01 00:00:00", None), // no update row: untouched
      (1L, 5.0, "2023-01-01 00:00:00", Some("2024-01-01 00:00:00"))) // closed: immutable
      .toDF("k", "bal", "vf", "vt")
      .select($"k", $"bal", to_timestamp($"vf").as("valid_from"),
        to_timestamp($"vt").as("valid_to"))
    val updates = Seq((1L, 11.0), (2L, 20.0), (9L, 90.0)).toDF("k", "bal")
    val out = Merge.scd2(history, updates, Seq("k"), Seq("bal"), ts("2024-06-01 00:00:00"))
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getTimestamp(2).toString,
        if (r.isNullAt(3)) "open" else r.getTimestamp(3).toString)).toSet
    assert(out == Set(
      (1L, 10.0, "2024-01-01 00:00:00.0", "2024-06-01 00:00:00.0"), // closed at now
      (1L, 11.0, "2024-06-01 00:00:00.0", "open"), // new current version
      (2L, 20.0, "2024-01-01 00:00:00.0", "open"), // no-op: still the same row
      (3L, 30.0, "2024-01-01 00:00:00.0", "open"), // untouched
      (1L, 5.0, "2023-01-01 00:00:00.0", "2024-01-01 00:00:00.0"), // history kept
      (9L, 90.0, "2024-06-01 00:00:00.0", "open"))) // brand-new key
  }

  test("pointInTime: facts read the version valid at their timestamp") {
    val s = spark; import s.implicits._
    val history = Seq(
      (1L, 5.0, "2023-01-01 00:00:00", Some("2024-01-01 00:00:00")),
      (1L, 10.0, "2024-01-01 00:00:00", None: Option[String]), // current
      (2L, 20.0, "2023-06-01 00:00:00", Some("2023-09-01 00:00:00"))) // deleted key
      .toDF("k", "bal", "vf", "vt")
      .select($"k", $"bal", to_timestamp($"vf").as("valid_from"),
        to_timestamp($"vt").as("valid_to"))
    val facts = Seq(
      (100L, 1L, "2022-06-01 00:00:00"), // before any version -> nulls
      (101L, 1L, "2023-06-01 00:00:00"), // old version: 5.0
      (102L, 1L, "2024-01-01 00:00:00"), // boundary: new version opens AT ts
      (103L, 1L, "2025-01-01 00:00:00"), // current: 10.0
      (104L, 2L, "2023-07-01 00:00:00"), // inside the closed window: 20.0
      (105L, 2L, "2023-09-01 00:00:00"), // at deletion boundary -> nulls
      (106L, 3L, "2023-07-01 00:00:00")) // unknown key -> nulls
      .toDF("fid", "k", "fts")
      .select($"fid", $"k", to_timestamp($"fts").as("ts"))
    val out = Merge.pointInTime(facts, history, Seq("k"), "ts", Seq("bal"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getTimestamp(4).toString))).toMap
    assert(out(100L) == ((None, None)))
    assert(out(101L) == ((Some(5.0), Some("2023-01-01 00:00:00.0"))))
    assert(out(102L) == ((Some(10.0), Some("2024-01-01 00:00:00.0"))))
    assert(out(103L) == ((Some(10.0), Some("2024-01-01 00:00:00.0"))))
    assert(out(104L) == ((Some(20.0), Some("2023-06-01 00:00:00.0"))))
    assert(out(105L) == ((None, None)))
    assert(out(106L) == ((None, None)))
    assert(out.size == 7) // row count preserved: it's a lookup, not a fan-out
  }

  test("scd2 change detection is null-safe on payload columns") {
    val s = spark; import s.implicits._
    val history = Seq((1L, None: Option[Double]), (2L, Some(2.0)))
      .toDF("k", "bal")
      .withColumn("valid_from", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("valid_to", lit(null).cast("timestamp"))
    val updates = Seq((1L, None: Option[Double]), (2L, None: Option[Double]))
      .toDF("k", "bal")
    val out = Merge.scd2(history, updates, Seq("k"), Seq("bal"),
      to_timestamp(lit("2024-06-01 00:00:00")))
    // k=1: NULL == NULL -> no-op (1 row); k=2: 2.0 -> NULL is a change (2 rows)
    assert(out.count() == 3)
    assert(out.filter($"k" === 1L).count() == 1)
    assert(out.filter($"k" === 2L && $"valid_to".isNull && $"bal".isNull).count() == 1)
  }

  test("diff emits inserted/deleted/changed rows only, null-safely") {
    val s = spark; import s.implicits._
    val prev = Seq((1L, Some(10.0)), (2L, Some(20.0)), (3L, None: Option[Double]), (4L, Some(40.0)))
      .toDF("k", "bal")
    val next = Seq((1L, Some(10.0)), (2L, Some(21.0)), (3L, None: Option[Double]), (5L, Some(50.0)))
      .toDF("k", "bal")
    val out = Merge.diff(prev, next, Seq("k"), Seq("bal")).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    // k=1 identical, k=3 NULL<=>NULL -> neither appears
    assert(out == Map(2L -> "changed", 4L -> "deleted", 5L -> "inserted"))
  }

  test("constraint checker counts violations in one pass; null predicate = violation") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Some(5.0)), (2L, Some(-1.0)), (3L, None: Option[Double]))
      .toDF("k", "price")
    val out = graft.operators.Quality.constraintViolations(df, Seq(
      "price_positive" -> (col("price") > 0),
      "key_small" -> (col("k") < 10)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // null price cannot prove price > 0 -> violation
    assert(out == Map("price_positive" -> ((2L, 3L)), "key_small" -> ((0L, 3L))))
    intercept[IllegalArgumentException] {
      graft.operators.Quality.requireConstraints(df, Seq("p" -> (col("price") > 0)))
    }
    assert(graft.operators.Quality.requireConstraints(df, Seq("k" -> (col("k") < 10)))
      .count() == 3) // passes through unchanged
  }

  test("adaptivePercentileGate trims each group against its own distribution") {
    val s = spark; import s.implicits._
    // group a: metrics 1..8 (p25 -> 2); group b: 101..104 (p25 -> 101)
    val df = ((1 to 8).map(i => ("a", i.toLong)) ++
      (101 to 104).map(i => ("b", i.toLong))).toDF("grp", "m")
    val out = graft.operators.Quality.adaptivePercentileGate(df, "m", "grp", 0.25)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byGrp = out.groupBy(_._1)
    // a keeps 2..8 against cutoff 2; b keeps all four against 101
    assert(byGrp("a").map(_._2).sorted.toSeq == (2L to 8L) &&
      byGrp("a").forall(_._3 == 2L))
    assert(byGrp("b").map(_._2).sorted.toSeq == (101L to 104L) &&
      byGrp("b").forall(_._3 == 101L))
  }

  test("kAnonymize releases only crowds of k, counts null QI cohorts, keeps widths") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "a", "x"), (2L, "a", "x"), (3L, "a", "x"), // crowd of 3
      (4L, "b", "y"), (5L, "b", "y"), // crowd of 2 -> suppressed at k=3
      (6L, null, "z"), (7L, null, "z"), (8L, null, "z") // null QI crowd of 3
    ).toDF("id", "qi1", "qi2")
    val out = graft.operators.Quality.kAnonymize(df, Seq("qi1", "qi2"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 6L -> 3L, 7L -> 3L, 8L -> 3L))
  }

  test("lDiversityReport flags homogeneous cohorts a size check would pass") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      // big cohort, single sensitive value: k-anonymous yet homogeneous
      (1L, "a", 7L), (2L, "a", 7L), (3L, "a", 7L), (4L, "a", 7L),
      // small but diverse cohort
      (5L, "b", 1L), (6L, "b", 2L)
    ).toDF("id", "qi", "sensitive")
    val got = graft.operators.Quality.lDiversityReport(df, Seq("qi"), col("sensitive"), l = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map("a" -> ((4L, 1L, false)), "b" -> ((2L, 2L, true))))
  }

  test("tClosenessReport: hand-computed integer EMD; skewed cohort fails where diverse passes") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.col
    // global over values {1,2}: 4 vs 4 -> cum 4, 8 (N=8, m=2)
    val df = Seq(
      // cohort a mirrors the global mix exactly -> EMD 0
      (1L, "a", 1L), (2L, "a", 1L), (3L, "a", 2L), (4L, "a", 2L),
      // cohort b is all value-1 -> maximal skew
      (5L, "b", 1L), (6L, "b", 1L),
      // cohort c is all value-2
      (7L, "c", 2L), (8L, "c", 2L)
    ).toDF("id", "qi", "v")
    val got = graft.operators.Quality.tClosenessReport(
      df, Seq("qi"), col("v"), tPpm = 400000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    // emd_num at value 1 (the only i < m step):
    //   a: |2*8 - 4*4| = 0;  b: |2*8 - 4*2| = 8;  c: |0*8 - 4*2| = 8
    // (the value-2 step is always 0: cumC*N = n*N = cumG*n)
    // true EMD = emd_num / (n*N*(m-1)) -> b: 8/16 = 0.5 > 0.4 -> fails
    assert(got("a") == ((4L, 8L, 2L, 0L, true)))
    assert(got("b") == ((2L, 8L, 2L, 8L, false)))
    assert(got("c") == ((2L, 8L, 2L, 8L, false)))
  }

  test("categoricalDrift reports exact ppm shares, zeros for absent sides") {
    val s = spark; import s.implicits._
    val before = Seq("x", "x", "x", "y").toDF("cat")          // x 75%, y 25%
    val after = Seq("x", "y", "y", "z").toDF("cat")           // x 25%, y 50%, z new
    val got = graft.operators.Quality.categoricalDrift(before, after, "cat")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got == Map(
      "x" -> ((3L, 1L, 750000L, 250000L, -500000L)),
      "y" -> ((1L, 2L, 250000L, 500000L, 250000L)),
      "z" -> ((0L, 1L, 0L, 250000L, 250000L))))
    // an empty side reports zero shares instead of dividing by zero
    val emptyB = graft.operators.Quality.categoricalDrift(
      before.filter(lit(false)), after, "cat")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(emptyB.values.forall(_ == 0L) && emptyB.keySet == Set("x", "y", "z"))
  }

  test("insertMissing appends only absent keys") {
    val s = spark; import s.implicits._
    val tgt = Seq((1L, "a")).toDF("k", "v")
    val src = Seq((1L, "dup"), (2L, "new")).toDF("k", "v")
    val out = Merge.insertMissing(tgt, src, Seq("k"))
    assert(out.count() == 2)
    assert(out.filter($"k" === 1L).head().getString(1) == "a")
  }

  test("numericDriftKs: exact cross-multiplied CDF gap with deterministic argmax") {
    val s = spark; import s.implicits._
    // A = {1,2,3,4}, B = {3,4,5,6}: at v=2 gap = |2*4 - 0*4| = 8 (max);
    // v=1 gives 4, v=3 gives |3*4-1*4|=8 too -> tie, smaller value wins
    val a = Seq(1, 2, 3, 4).map(_.toDouble).toDF("v")
    val b = Seq(3, 4, 5, 6).map(_.toDouble).toDF("v")
    val r = graft.operators.Quality.numericDriftKs(a, b, "v").head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L)
    assert(r.getLong(2) == 8L)
    assert(r.getDouble(3) == 2.0, "argmax tie must resolve to the smaller value")
    // identical distributions -> gap 0 only at... (cum equal everywhere)
    val same = graft.operators.Quality.numericDriftKs(a, a, "v").head()
    assert(same.getLong(2) == 0L)
  }

  test("profileColumns: nulls, exact distincts, min/max per column in one pass") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Some("a"), Some(10)), (2L, None, Some(30)),
      (3L, Some("b"), None), (4L, Some("a"), Some(10))
    ).toDF("k", "cat", "v")
    val got = graft.operators.Quality.profileColumns(df, Seq("k", "cat", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(got("k") == ((4L, 0L, 4L, "1", "4")))
    assert(got("cat") == ((4L, 1L, 2L, "a", "b")))
    assert(got("v") == ((4L, 1L, 2L, "10", "30")))
  }

  test("scd1PartitionScoped: equals the flat merge, untouched partitions not rewritten") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pmerge").toString
    val base = (1 to 1000).map(i => (i.toLong, f"2024-${i % 10 + 1}%02d", i * 1.0))
      .toDF("k", "month", "v")
    graft.sources.Layout.writePartitioned(base, s"$dir/fact", Seq("month"))

    // partition-month "2024-05" is untouched by the delta: snapshot its
    // physical files so we can prove the scoped merge never rewrote them
    def fileState(sub: String): Map[String, Long] = {
      val d = new java.io.File(s"$dir/fact/month=$sub")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val before = fileState("2024-05")

    val upd = base.filter($"month" === "2024-03").withColumn("v", $"v" * 2)
    val delta = upd.unionByName(upd.withColumn("k", -$"k"))
    val spec = MergeSpec(Seq("k"), Seq("v"))
    Merge.scd1PartitionScoped(s, dir, "fact", "month", delta, spec, nowCol)

    val got = s.read.parquet(s"$dir/fact")
      .select($"k", $"month".cast("string").as("month"), $"v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val expected = Merge.scd1(base, delta, spec, nowCol)
      .select($"k", $"month", $"v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == expected)
    assert(got.exists(_._1 == -2L), "inserted rows present")
    assert(got.count(_._2 == "2024-03") == 2 * base.filter($"month" === "2024-03").count())

    assert(fileState("2024-05") == before,
      "untouched partition files must not be rewritten by the scoped merge")

    // idempotency: re-applying the same delta is a bit-identical no-op
    Merge.scd1PartitionScoped(s, dir, "fact", "month", delta, spec, nowCol)
    val again = s.read.parquet(s"$dir/fact")
      .select($"k", $"month".cast("string").as("month"), $"v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(again == expected)
  }
  test("fdViolations reports only violated LHS values with deterministic majority") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "y"),          // violated: majority x
      ("b", "x"), ("b", "x"), ("b", "y"), ("b", "y"), // tie: smallest rhs wins
      ("c", "z"), ("c", "z"),                      // clean
      ("d", null), (null, "q")                     // nulls don't participate
    ).toDF("lhs", "rhs")
    val out = graft.operators.Quality.fdViolations(df, "lhs", "rhs").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out == Map(
      "a" -> ((2L, 3L, "x", 2L, 1L)),
      "b" -> ((2L, 4L, "x", 2L, 2L))))
  }

  test("bucketDiff: equal replicas fold clean; dirty buckets localize the drill to the touched rows") {
    val s = spark; import s.implicits._
    val left = (1L to 2000L).map(i => (i, i * 100L)).toDF("k", "v")
    val digest = col("k").cast("decimal(38,0)") * lit(1000003L) +
      col("v").cast("decimal(38,0)") * lit(998244353L)
    // identical replicas: no bucket disagrees
    assert(Merge.dirtyBuckets(left, left, "k", digest, 64).isEmpty)
    // one changed value, one deleted key, one inserted key
    val right = left.where(col("k") =!= 500L)
      .select(col("k"),
        when(col("k") === 7L, lit(777L)).otherwise(col("v")).as("v"))
      .unionByName(Seq((3000L, 1L)).toDF("k", "v"))
    val dirty = Merge.dirtyBuckets(left, right, "k", digest, 64)
      .select("bucket").collect().map(_.getLong(0)).toSet
    assert(dirty == Set(7L % 64, 500L % 64, 3000L % 64),
      s"exactly the touched keys' buckets must disagree: $dirty")
    // the drill restricted to dirty buckets equals the full diff
    val pred = pmod(col("k"), lit(64L)).isin(dirty.toSeq: _*)
    val drilled = Merge.diff(left.where(pred), right.where(pred), Seq("k"), Seq("v"))
      .collect().map(_.toString).sorted.toSeq
    val full = Merge.diff(left, right, Seq("k"), Seq("v"))
      .collect().map(_.toString).sorted.toSeq
    assert(drilled == full && full.size == 3)
  }

  test("referentialAudit: counts dangling and null FKs, exact ppm") {
    val s = spark; import s.implicits._
    val child = Seq(Some(1L), Some(2L), Some(3L), None).toDF("fk_id")
    val parent = Seq(1L, 2L).toDF("id")
    val clean = Seq(Some(1L), Some(2L)).toDF("fk_id")
    val out = graft.operators.Quality.referentialAudit(Seq(
      ("child->parent", child, "fk_id", parent, "id"),
      ("clean->parent", clean, "fk_id", parent, "id")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("child->parent") == ((4L, 2L, 500000L)),
      "key 3 dangles and the null FK dangles: 2 of 4 = 500000 ppm")
    assert(out("clean->parent") == ((2L, 0L, 0L)))
  }

  test("threeWayMerge: every classification cell, both policies, deletes merge as changes") {
    val s = spark; import s.implicits._
    // base keys 1..8 exercise every cell:
    //   1: neither changed            5: ours deleted, theirs unchanged
    //   2: ours updated only          6: ours deleted, theirs UPDATED  -> conflict
    //   3: theirs updated only        7: both deleted (equal change)
    //   4: both updated DIFFERENTLY   8: both updated IDENTICALLY
    //   9/10: insert ours-only / theirs-only
    //   11: inserted BOTH sides with different payloads -> conflict
    val base = (1L to 8L).map(k => (k, k * 10L)).toDF("k", "v")
    val ours = Seq((1L, 10L), (2L, 21L), (3L, 30L), (4L, 41L), (8L, 88L),
      (9L, 90L), (11L, 111L)).toDF("k", "v")
    val theirs = Seq((1L, 10L), (2L, 20L), (3L, 31L), (4L, 42L), (5L, 50L), (6L, 66L),
      (8L, 88L), (10L, 100L), (11L, 112L)).toDF("k", "v")
    def run(policy: String) = Merge.threeWayMerge(base, ours, theirs,
      Seq("k"), Seq("v"), policy)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val th = run("theirs")
    assert(th == Map(
      1L -> ((10L, false)),   // untouched
      2L -> ((21L, false)),   // ours-only update wins
      3L -> ((31L, false)),   // theirs-only update wins
      4L -> ((42L, true)),    // both differ: policy theirs, flagged
      6L -> ((66L, true)),    // delete-vs-update conflict: theirs kept it
      8L -> ((88L, false)),   // identical change merges silently
      10L -> ((100L, false)), // theirs insert
      9L -> ((90L, false)),   // ours insert
      11L -> ((112L, true)))) // insert-vs-insert conflict
    // keys 5 (ours delete accepted) and 7 (both deleted) are absent
    val ou = run("ours")
    assert(ou(4L) == ((41L, true)) && ou(11L) == ((111L, true)))
    assert(!ou.contains(6L), "policy ours honors the ours-side delete")
    assert(ou(2L) == ((21L, false)) && ou(3L) == ((31L, false)),
      "policy only decides CONFLICTS — clean one-side changes are unaffected")
  }

  test("threeWayMerge rejects duplicate key images loudly, naming the side") {
    val s = spark; import s.implicits._
    import graft.operators.Merge
    // the guard rides the merge plan (per-side key-count window +
    // raise_error filter — no extra eager pass), so it fires at ACTION
    // time wrapped in Spark's job failure; walk the cause chain for the
    // raised message
    def chainMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val base = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val dup = Seq((1L, 11L), (1L, 12L), (2L, 20L)).toDF("k", "v")
    val e = intercept[Exception] {
      Merge.threeWayMerge(base, dup, base, Seq("k"), Seq("v")).collect()
    }
    val m = chainMsg(e)
    assert(m.contains("'ours'") && m.contains("duplicate"),
      s"must name the offending side: $m")
    // duplicates in base reject too (they would fan out BOTH joins)
    val e2 = intercept[Exception] {
      Merge.threeWayMerge(dup, base, base, Seq("k"), Seq("v")).collect()
    }
    assert(chainMsg(e2).contains("'base'"))
    // the key the guard trips on is named in the message
    assert(m.contains("key=1"), s"offending key must be named: $m")
  }

  test("cohensKappa: textbook 2x2 hand value, chance-corrected, degenerate raters guarded") {
    val s = spark; import s.implicits._
    import graft.operators.Quality
    // hand fixture: 22 yes/yes, 15 no/no, 3 yes/no, 10 no/yes ->
    // po = 37/50 = 0.74, pe = (25*32 + 25*18)/2500 = 0.5,
    // kappa = 0.24/0.5 = 0.48 (safely inside the moderate band —
    // a band-EDGE kappa would flip labels on the last float ulp)
    val pairs = (Seq.fill(22)(("yes", "yes")) ++ Seq.fill(15)(("no", "no")) ++
      Seq.fill(3)(("yes", "no")) ++ Seq.fill(10)(("no", "yes")))
      .toDF("ra", "rb")
    val r = Quality.cohensKappa(pairs, "ra", "rb").head()
    assert(r.getLong(0) == 50L && r.getLong(1) == 37L)
    assert(math.abs(r.getDouble(2) - 0.74) < 1e-12)
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-12)
    assert(math.abs(r.getDouble(4) - 0.48) < 1e-12)
    assert(r.getString(5) == "moderate")
    // degenerate: both raters constant and equal -> pe = 1, kappa = 1
    // by the explicit guard (not a 0/0)
    val const = Seq.fill(5)(("x", "x")).toDF("ra", "rb")
    val rc = Quality.cohensKappa(const, "ra", "rb").head()
    assert(rc.getDouble(4) == 1.0 && rc.getString(5) == "near_perfect")
    // constant but DISJOINT labels: zero overlap in marginals -> pe = 0,
    // po = 0 -> kappa = 0
    val disj = Seq.fill(5)(("x", "y")).toDF("ra", "rb")
    assert(Quality.cohensKappa(disj, "ra", "rb").head().getDouble(4) == 0.0)
  }

  test("krippendorffAlpha: hand coincidence value, unpairable units excluded, degenerate guarded") {
    val s = spark; import s.implicits._
    import graft.operators.Quality
    // units: u1 {a,a} (agree), u2 {a,b} (disagree), u3 {b,b,b}
    // (3 raters agree), u4 {c} (single rating — unpairable, excluded).
    // D_o = (4-4)/1 + (4-2)/1 + (9-9)/2 = 2; marginals over pairable
    // units a:3 b:4 -> n_tot 7, De_num = 49 - (9+16) = 24;
    // alpha = 1 - 6*2/24 = 0.5, d_e = 24/6 = 4
    val ratings = Seq(("u1", "a"), ("u1", "a"), ("u2", "a"), ("u2", "b"),
      ("u3", "b"), ("u3", "b"), ("u3", "b"), ("u4", "c"))
      .toDF("unit", "value")
    val r = Quality.krippendorffAlpha(ratings, "unit", "value").head()
    assert(r.getLong(0) == 3L, "u4 is unpairable and must not count")
    assert(r.getLong(1) == 7L)
    assert(math.abs(r.getDouble(2) - 2.0) < 1e-12)
    assert(math.abs(r.getDouble(3) - 4.0) < 1e-12)
    assert(math.abs(r.getDouble(4) - 0.5) < 1e-12, s"alpha: ${r.getDouble(4)}")
    assert(r.getString(5) == "unreliable")
    // perfect agreement across variable rater counts -> alpha = 1
    val perfect = Seq(("u1", "x"), ("u1", "x"), ("u2", "y"), ("u2", "y"),
      ("u2", "y")).toDF("unit", "value")
    val rp = Quality.krippendorffAlpha(perfect, "unit", "value").head()
    assert(rp.getDouble(4) == 1.0 && rp.getString(5) == "reliable")
    // single-value degenerate data (De = 0): guarded alpha = 1, no 0/0
    val one = Seq(("u1", "x"), ("u1", "x"), ("u2", "x"), ("u2", "x"))
      .toDF("unit", "value")
    assert(Quality.krippendorffAlpha(one, "unit", "value").head().getDouble(4) == 1.0)
    // null ratings are missing data, not a value
    val withNull = ratings.unionByName(
      Seq(("u2", null: String)).toDF("unit", "value"))
    assert(Quality.krippendorffAlpha(withNull, "unit", "value").head().getDouble(4)
      == r.getDouble(4))
  }

  test("dpLaplaceRelease: deterministic per salt, clamping bounds the sum's sensitivity") {
    val s = spark; import s.implicits._
    import graft.operators.Quality
    val df = Seq(("a", 100L), ("a", 50L), ("a", 999999L), ("b", 10L), ("b", -5L))
      .toDF("g", "v")
    def rel(salt: String) = Quality.dpLaplaceRelease(df, "g", "v",
      epsilon = 0.5, clampHi = 1000L, salt = salt)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val r1 = rel("s1")
    assert(rel("s1") == r1, "a retried release publishes identical numbers")
    assert(rel("s2") != r1, "a fresh salt draws fresh noise")
    // noise bound: |Laplace(b)| <= b * ln(2^40) =~ 27.73 * b for the
    // 2^40 grid, so counts sit within 55.5 of truth at eps = 0.5 and
    // sums within 55451 of the CLAMPED truth (1150 for a, 10 for b —
    // the 999999 outlier contributes exactly clampHi, negatives clamp
    // to 0: sensitivity honest, release usable)
    val nb = 27.8 / 0.5
    assert(math.abs(r1("a")._1 - 3.0) <= nb && math.abs(r1("b")._1 - 2.0) <= nb)
    assert(math.abs(r1("a")._2 - 1150.0) <= nb * 1000 &&
      math.abs(r1("b")._2 - 10.0) <= nb * 1000)
  }
}
