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

  test("insertMissing appends only absent keys") {
    val s = spark; import s.implicits._
    val tgt = Seq((1L, "a")).toDF("k", "v")
    val src = Seq((1L, "dup"), (2L, "new")).toDF("k", "v")
    val out = Merge.insertMissing(tgt, src, Seq("k"))
    assert(out.count() == 2)
    assert(out.filter($"k" === 1L).head().getString(1) == "a")
  }
}
