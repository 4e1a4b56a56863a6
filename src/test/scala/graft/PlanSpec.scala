package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.sources.Tables

/** Physical-plan shape assertions: these lock in the properties the
  * operators were designed around (no shuffle where none is needed,
  * broadcast for small dims, scan-level pushdown). A correctness-green
  * refactor that regresses one of these still fails the build.
  */
class PlanSpec extends AnyFunSuite with SparkTest {

  private def sf = "/root/testdata/sf0.001"

  private def executed(df: org.apache.spark.sql.DataFrame) = {
    df.count() // force AQE to finalize the plan
    df.queryExecution.executedPlan
  }

  test("nGramSets is map-side only: no Exchange anywhere in the plan") {
    val docs = Tables.table(spark, sf, "documents")
    val plan = executed(Dedup.trigramSets(docs))
    val exchanges = plan.collectWithSubqueries { case e: Exchange => e }
    assert(exchanges.isEmpty, s"expected shuffle-free gram generation, got:\n$plan")
  }

  test("dim join (nation x region) plans as a broadcast hash join") {
    val nation = Tables.table(spark, sf, "nation")
    val region = Tables.table(spark, sf, "region")
    val joined = nation.join(broadcast(region),
      col("n_regionkey") === col("r_regionkey"))
    val plan = executed(joined) match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val bhj = plan.collectWithSubqueries { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, s"expected BroadcastHashJoin, got:\n$plan")
  }

  test("filter + projection reach the parquet scan (pushdown, pruning)") {
    val li = Tables.table(spark, sf, "lineitem")
      .filter(col("l_extendedprice") > 45000)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    val plan = executed(li)
    val scans = plan.collectWithSubqueries { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, s"no FileSourceScanExec found in:\n$plan")
    val scan = scans.head
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThan(l_extendedprice"),
      s"filter not pushed to scan: $pushed")
    val readCols = scan.requiredSchema.fieldNames.toSet
    assert(readCols == Set("l_orderkey", "l_linenumber", "l_extendedprice"),
      s"scan reads more columns than the projection needs: $readCols")
  }
}
