package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Caches

class CachesSpec extends AnyFunSuite with SparkTest {

  test("releasing one scope leaves a concurrent scope's caches persisted") {
    val (df1, s1) = Caches.scoped(Caches.persisted(spark.range(10).toDF()))
    val (df2, s2) = Caches.scoped(Caches.persisted(spark.range(20).toDF()))
    df1.count(); df2.count()
    s1.release()
    assert(df1.storageLevel == StorageLevel.NONE, "own scope must unpersist")
    assert(df2.storageLevel != StorageLevel.NONE,
      "releasing scope 1 must not drop scope 2's in-flight cache")
    s2.release()
    assert(df2.storageLevel == StorageLevel.NONE)
  }

  test("global release drains only unscoped registrations") {
    val unscoped = Caches.persisted(spark.range(5).toDF())
    val (scoped, s) = Caches.scoped(Caches.persisted(spark.range(6).toDF()))
    unscoped.count(); scoped.count()
    Caches.release()
    assert(unscoped.storageLevel == StorageLevel.NONE)
    assert(scoped.storageLevel != StorageLevel.NONE,
      "process-wide release must not touch scoped caches")
    s.release()
  }
}
