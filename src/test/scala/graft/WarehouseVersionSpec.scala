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
}
