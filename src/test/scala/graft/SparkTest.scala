package graft

import org.apache.spark.sql.SparkSession

/** Shared local SparkSession for all suites (one JVM, Test/fork). */
trait SparkTest {
  lazy val spark: SparkSession = Sessions.local("graft-test", "4")
}
