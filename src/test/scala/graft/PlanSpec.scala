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

  private def unwrapped(df: org.apache.spark.sql.DataFrame) =
    executed(df) match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  test("decontaminateEmbed anti-joins via broadcast nested loop — no corpus shuffle") {
    val emb = Tables.table(spark, sf, "embeddings")
    val out = Dedup.decontaminateEmbed(
      emb.filter(col("vec_id") >= 10), emb.filter(col("vec_id") < 10), 0.35)
    val plan = unwrapped(out)
    val exchanges = plan.collectWithSubqueries {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, s"expected shuffle-free anti join, got:\n$plan")
    val bnlj = plan.collectWithSubqueries {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bnlj.nonEmpty && bnlj.head.joinType.sql == "LEFT ANTI",
      s"expected broadcast nested-loop LEFT ANTI, got:\n$plan")
  }

  test("keyProfile top-K plans as TakeOrderedAndProject, never a full sort") {
    val events = Tables.table(spark, sf, "events")
    val plan = unwrapped(graft.operators.Skew.keyProfile(events, Seq("user_id"), 10))
    val topk = plan.collectWithSubqueries {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }
    assert(topk.nonEmpty, s"expected TakeOrderedAndProject for the hot-key pick, got:\n$plan")
    val sorts = plan.collectWithSubqueries {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }
    assert(sorts.isEmpty, s"expected no global sort, got:\n$plan")
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

  test("blocklist scan is shuffle-free: the automaton rides the scan's codegen stage") {
    val docs = Tables.table(spark, sf, "documents")
    val counted = docs.select(col("doc_id"),
      graft.functions.multi_count(col("text"), Seq("table scan", "batch")).as("c"))
    val plan = unwrapped(counted)
    val exchanges = plan.collectWithSubqueries { case e: Exchange => e }
    assert(exchanges.isEmpty, s"expected zero-shuffle blocklist scan, got:\n$plan")
    val wscg = plan.collectWithSubqueries {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wscg.nonEmpty, s"multi_count fell out of codegen:\n$plan")
  }

  test("ahashPairs plans as an equi-join on chunks — no cartesian product, no BNLJ") {
    val docs = Tables.table(spark, sf, "documents")
    val media = graft.operators.Multimodal
      .fromText(docs, "doc_id", "text", "text").toDF()
    val plan = unwrapped(graft.operators.Multimodal.ahashPairs(media, maxHamming = 3))
    val s = plan.toString
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s"banded hamming join degenerated to a pairwise scan:\n$s")
  }

  test("q5 snowflake: nation and region join as broadcasts, never shuffled") {
    val plan = unwrapped(SparkEntry.queries("q5_region_revenue")(spark, sf))
    val bhj = plan.collectWithSubqueries { case j: BroadcastHashJoinExec => j }
    assert(bhj.size >= 2,
      s"nation and region must ride broadcast hash joins, got ${bhj.size}:\n$plan")
  }

  test("ohlcBars is one combinable aggregate: map-side partials, no window") {
    val ev = Tables.table(spark, sf, "events")
    val plan = unwrapped(graft.operators.Events.ohlcBars(ev))
    val wins = plan.collectWithSubqueries {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.isEmpty, s"struct min/max must not plan a window:\n$plan")
    // struct min/max is not hash-aggregable, so Spark plans
    // SortAggregate — the property that matters at scale is the
    // partial (map-side) aggregation before the exchange
    assert(plan.toString.contains("partial_min(struct"),
      s"expected map-side partial struct min:\n$plan")
  }

  test("rollingActiveUsers: no window, no cartesian — dedup then bounded explode") {
    val ev = Tables.table(spark, sf, "events")
    val plan = unwrapped(graft.operators.Events.rollingActiveUsers(ev))
    val s = plan.toString
    assert(!s.contains("WindowExec") && !s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"),
      s"sliding distinct must stay explode-shaped:\n$s")
    assert(s.contains("Generate"), s"expected the explode Generate node:\n$s")
  }

  test("basket pairLift: no cartesian product; the only BNLJ is the 1-row scalar") {
    val li = Tables.table(spark, sf, "lineitem")
    val plan = unwrapped(graft.operators.Affinity.pairLift(li, 2))
    val s = plan.toString
    assert(!s.contains("CartesianProduct"),
      s"pair expansion must key on the basket id:\n$s")
    val bnlj = plan.collectWithSubqueries {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bnlj.size <= 1,
      s"only the broadcast basket-count scalar may nested-loop:\n$s")
  }

  test("q19 disjunction: Catalyst extracts per-table OR branches into BOTH scans") {
    val plan = unwrapped(SparkEntry.queries("q19_disjunctive")(spark, sf))
    val scans = plan.collectWithSubqueries { case f: FileSourceScanExec => f }
    val pushedOr = scans.count(_.metadata.getOrElse("PushedFilters", "").contains("Or("))
    assert(pushedOr >= 2,
      s"the OR-of-ANDs must reach both the lineitem and part scans as pushed filters:\n$plan")
  }

  test("levenshtein filters gain the length-difference short-circuit") {
    graft.plans.LevenshteinPrefilter.ensureInjected(spark)
    val p = Tables.table(spark, sf, "part").select(col("p_name")).distinct()
    val joined = p.select(col("p_name").as("a"))
      .crossJoin(p.select(col("p_name").as("b")))
      .where(levenshtein(col("a"), col("b")) <= 3)
    val opt = joined.queryExecution.optimizedPlan.toString
    assert(opt.contains("abs(") && opt.contains("length(a"),
      s"expected the abs(length-length) guard in the optimized plan:\n$opt")
    // the guard must not change results: every surviving pair still
    // satisfies the distance predicate, and no pair is lost (length
    // difference is a lower bound on edit distance)
    val n = joined.count()
    val plain = p.select(col("p_name").as("a"))
      .crossJoin(p.select(col("p_name").as("b")))
      .collect().count(r => {
        val (a, b) = (r.getString(0), r.getString(1))
        org.apache.commons.text.similarity.LevenshteinDistance.getDefaultInstance
          .apply(a, b) <= 3
      })
    assert(n == plain, s"guard changed the result: $n vs $plain")
  }

  test("q2 argmin plans as ONE aggregate join-back — no correlated rescan") {
    // the correlated min-cost subquery must decorrelate to a single
    // per-part min aggregate joined back once: exactly TWO lineitem
    // scans (detail + min side), one min(ps_supplycost_c) aggregate
    // subtree, and no nested-loop/cartesian anywhere — a correlated
    // rescan would show up as a scan count proportional to parts or a
    // BNLJ probe
    val df = SparkEntry.queries("q2_min_cost_supp")(spark, sf)
    val plan = unwrapped(df)
    val liScans = plan.collectWithSubqueries {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("lineitem")) => s
    }
    assert(liScans.size == 2,
      s"expected exactly 2 lineitem scans (detail + min join-back), got ${liScans.size}:\n$plan")
    val bnlj = plan.collectWithSubqueries {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(bnlj.isEmpty, s"q2 must stay equi-join only:\n$plan")
  }

  test("kCenterSelect never shuffles the corpus: argmin is a TakeOrdered") {
    val emb = Tables.table(spark, sf, "embeddings")
    // one greedy round's argmin plan (what every round executes)
    val base = emb.select(col("vec_id"), col("embedding"),
      graft.functions.vec_norm(col("embedding")).as("__norm"))
    val picked = base
      .orderBy(col("__norm").asc, col("vec_id").asc).limit(1)
    val plan = unwrapped(picked)
    val s = plan.toString
    assert(s.contains("TakeOrderedAndProject"),
      s"expected per-partition top-1 + driver merge, got:\n$s")
    val exchanges = plan.collectWithSubqueries { case e: Exchange => e }
    assert(exchanges.isEmpty, s"argmin shuffled the corpus:\n$s")
  }
}
