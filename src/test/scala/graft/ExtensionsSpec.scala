package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftExtensions

/** The engine's native expressions as SQL-text functions (the
  * SparkSessionExtensions injection tier): registered names must
  * resolve in `spark.sql(...)` and compute exactly what the Column API
  * wrappers compute.
  */
class ExtensionsSpec extends AnyFunSuite with SparkTest {

  test("registered SQL functions match the Column-API expressions") {
    val s = spark; import s.implicits._
    GraftExtensions.register(s)
    val v = graft.Views.unique("ext")
    Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f), "spark graft", "é"))
      .toDF("a", "b", "txt", "dec").createOrReplaceTempView(v)
    try {
      val row = s.sql(
        s"SELECT vec_dot(a, b), rolling_hash(txt), mix_hash32(txt), nfc(dec) FROM $v").head()
      val exp = s.table(v).select(
        graft.functions.vec_dot(col("a"), col("b")),
        graft.functions.rolling_hash(col("txt")),
        graft.functions.mixed_hash32(col("txt")),
        graft.functions.nfc(col("dec"))).head()
      assert(row.getDouble(0) == 32.0 && row.getDouble(0) == exp.getDouble(0))
      assert(row.getLong(1) == exp.getLong(1))
      assert(row.getLong(2) == exp.getLong(2))
      assert(row.getString(3) == "\u00E9" && row.getString(3) == exp.getString(3))
    } finally s.catalog.dropTempView(v)
  }

  test("arity errors surface at analysis time") {
    GraftExtensions.register(spark)
    val e = intercept[Exception](spark.sql("SELECT nfc('a', 'b')").head())
    assert(e.getMessage.contains("1 argument"))
  }

  test("ahash64 and multi_count resolve from SQL text and match the wrappers") {
    val s = spark; import s.implicits._
    GraftExtensions.register(s)
    val v = graft.Views.unique("ext2")
    Seq(("table scan then scan", "payload bytes here"))
      .toDF("txt", "pay").createOrReplaceTempView(v)
    try {
      val row = s.sql(
        s"SELECT ahash64(CAST(pay AS BINARY)), multi_count(txt, 'table scan', 'scan') FROM $v").head()
      val exp = s.table(v).select(
        graft.functions.ahash64(col("pay").cast("binary")),
        graft.functions.multi_count(col("txt"), Seq("table scan", "scan"))).head()
      assert(row.getLong(0) == exp.getLong(0))
      assert(row.getSeq[Long](1) == Seq(1L, 2L) && row.getSeq[Long](1) == exp.getSeq[Long](1))
      // patterns must be literals — a column reference is rejected
      val e = intercept[Exception](s.sql(s"SELECT multi_count(txt, pay) FROM $v").head())
      assert(e.getMessage.contains("literal"))
    } finally s.catalog.dropTempView(v)
  }

  test("MaterializedAggRewrite: plan-identical aggregate reads the MV table, others untouched") {
    val s = spark
    import org.apache.spark.sql.functions._
    import s.implicits._
    import graft.plans.MaterializedAggRewrite
    val dir = java.nio.file.Files.createTempDirectory("mv_rw").toString
    val ev = (1L to 300L).map(i => (i % 7, s"t${i % 3}", i.toDouble))
      .toDF("user_id", "event_type", "value")
      .localCheckpoint() // freeze the plan so canonical forms compare across uses
    val cents = round(col("value") * 100).cast("long")
    def aggQuery = ev.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_events"), sum(cents).as("sum_units"))
    graft.sources.Warehouse.overwrite(aggQuery, dir, "mv")
    MaterializedAggRewrite.register(s, aggQuery,
      () => graft.sources.Warehouse.read(s, dir, "mv"))
    MaterializedAggRewrite.ensureInjected(s)
    try {
      // the raw aggregate is rewritten: no Aggregate in the optimized
      // plan, and the scan reads the MV path
      def scanPaths(df: org.apache.spark.sql.DataFrame): String =
        df.queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            r.relation match {
              case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                h.location.rootPaths.mkString(",")
              case _ => ""
            }
        }.mkString(";")
      val q = aggQuery
      val opt = q.queryExecution.optimizedPlan
      val aggs = opt.collect { case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }
      assert(aggs.isEmpty, s"aggregate not rewritten:\n$opt")
      assert(scanPaths(q).contains("/mv"), s"MV scan missing:\n$opt")
      // results identical to the unrewritten computation
      val viaMv = q.collect().map(_.toSeq).toSet
      MaterializedAggRewrite.clear(s)
      val raw = aggQuery.collect().map(_.toSeq).toSet
      assert(viaMv == raw)
      // a DIFFERENT aggregate over the same source is untouched
      MaterializedAggRewrite.register(s, aggQuery,
        () => graft.sources.Warehouse.read(s, dir, "mv"))
      val other = ev.groupBy("user_id").agg(sum(cents).as("sum_units"))
      val otherAggs = other.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      assert(otherAggs.nonEmpty, "non-registered aggregate must not be rewritten")
      // re-registering replaces the reader (staleness pattern): point
      // at a second table and the rewrite follows
      graft.sources.Warehouse.overwrite(aggQuery, dir, "mv2")
      MaterializedAggRewrite.register(s, aggQuery,
        () => graft.sources.Warehouse.read(s, dir, "mv2"))
      assert(scanPaths(aggQuery).contains("mv2"))
    } finally MaterializedAggRewrite.clear(s)
  }
}
