package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{call_function, struct, xxhash64}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query seconds.
  *
  * One untimed warmup pass precedes two timed passes; each query reports
  * its faster pass. Warmup amortizes one-time costs a resident engine
  * never pays per query (whole-stage codegen compilation, JIT, parquet
  * footer caches); the min-of-two damps GC/scheduler jitter, which at
  * this data scale is of the same order as the shortest queries.
  *
  * Each timed pass evaluates a checksum over EVERY output column
  * (bit_xor of xxhash64 over the row struct), not a bare count — a count
  * would let Catalyst prune unevaluated projections, so projection-only
  * queries would time a scan instead of their expression work. bit_xor
  * (not sum) because a sum of uniform 64-bit hashes overflows LongType
  * under ANSI mode at benchmark row counts.
  *
  * A query that throws is recorded in the `failures` JSON field with its
  * elapsed-time slot set to -1 — a regression can only lower the score,
  * never masquerade as a fast success. The JSON line also lands in
  * `SPARK_GRAFT_BENCH_OUT` (default `BENCH_LAST.json`) so the driver
  * needn't parse it out of sbt's log prefixes.
  */
object Bench {

  /** Previous round's per-query seconds, parsed from the existing
    * BENCH output file BEFORE this run overwrites it. The format is
    * our own single JSON line; a flat regex over `"name":secs` pairs
    * inside the `"queries"` object is exact for it (names are
    * [a-z0-9_], values are non-negative or -1 at millisecond
    * precision) — no JSON dependency needed.
    */
  private def previousQueryTimes(path: String): Map[String, Double] =
    try {
      val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
      val qStart = txt.indexOf("\"queries\":{")
      if (qStart < 0) Map.empty
      else {
        val body = txt.substring(qStart + 11, txt.indexOf('}', qStart))
        """"([a-z0-9_]+)":(-?[0-9.]+)""".r.findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    } catch { case _: Throwable => Map.empty }

  /** The prior run's recorded control-set seconds ([[controlQueries]]) —
    * comparable ONLY when the prior run timed the SAME control set
    * (`control_set` version match): a prior total over a different set
    * of queries would push the ratio arbitrarily far from 1. None on
    * pre-control or different-set output files.
    */
  private def previousControlSec(path: String): Option[Double] =
    try {
      val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
      val sameSet = """"control_set":([0-9]+)""".r.findFirstMatchIn(txt)
        .exists(_.group(1).toInt == controlSetVersion)
      if (!sameSet) None
      else """"control_sec":(-?[0-9.]+)""".r.findFirstMatchIn(txt)
        .map(_.group(1).toDouble).filter(_ > 0)
    } catch { case _: Throwable => None }

  /** Four pinned NEVER-CHANGING queries (code paths untouched for
    * rounds: the flagship aggregate, the AQI banding when-chain, a
    * point lookup, and one multi-second iterative graph query) re-timed
    * at suite start, middle and end. Their median-of-three total,
    * divided by the prior run's recorded total, is the CONTROL RATIO —
    * the ambient speed of this machine/session relative to the run the
    * `prev` baselines came from. Three rounds of driver regression
    * flags all dissolved under controlled A/Bs as uniform ambient shift
    * (BASELINE.md "Round-9 regression A/B"); the control ratio
    * normalizes that shift out mechanically, so a uniform 1.3× ambient
    * slowdown raises zero flags while a real 2× single-query regression
    * still flags (BenchLogicSpec pins both). `graph_sssp` joined in v2
    * because the original three are sub-second scheduling-floor queries
    * whose regime does not extrapolate to multi-second GC/iteration-
    * bound queries — the round-10 driver run measured ratio 0.636 on
    * them and spuriously "confirmed" seven graph queries that had run
    * absolutely FASTER. Bump [[controlSetVersion]] whenever this list
    * changes: the prior run's `control_sec` total is then incomparable
    * and the next run falls back to an unnormalized compare.
    */
  private[graft] val controlQueries =
    Seq("q1_agg", "p6_aqi_banding", "s5_point_lookup", "graph_sssp")
  private[graft] val controlSetVersion = 2

  /** Regression candidates, AMBIENT-NORMALIZED: `cur` regresses on
    * `prev` only relative to `prev × controlRatio` (>30% past it with a
    * 0.15 s absolute guard — sub-100 ms queries jitter past 30% from
    * scheduler noise alone). Pure so the flag logic is unit-testable
    * without a timed suite.
    */
  private[graft] def regressionCandidates(
      results: Map[String, Double],
      prev: Map[String, Double],
      controlRatio: Double): Seq[String] =
    results.toSeq.collect {
      case (q, cur) if cur >= 0 && prev.get(q).exists(p =>
        p > 0 && cur > p * 1.3 * controlRatio && cur - p * controlRatio > 0.15) => q
    }.sortBy(q => -(results(q) - prev(q) * controlRatio))

  /** FALLBACK control ratio for runs whose recorded `control_sec` is
    * incomparable (a control-set version bump, or a pre-control
    * baseline file): the pinned control queries are ordinary gates, so
    * their per-query SUITE times exist in both runs' `queries` maps —
    * the ratio of those sums normalizes the same ambient shift, one
    * regime noisier than the dedicated median-of-three passes but far
    * better than the unnormalized 1.0 that let round 11's first
    * v2-control run flag eight uniformly-shifted queries. Requires
    * EVERY control query present in both maps (a partial sum would
    * bias toward whichever regime the missing query lived in).
    */
  private[graft] def ratioFromQueryTimes(
      prevTimes: Map[String, Double],
      curTimes: Map[String, Double]): Option[Double] = {
    val ok = controlQueries.forall(q =>
      prevTimes.get(q).exists(_ > 0) && curTimes.get(q).exists(_ > 0))
    if (!ok) None
    else Some(controlQueries.map(curTimes).sum / controlQueries.map(prevTimes).sum)
  }

  /** CONFIRMED verdict for a solo-retimed regression candidate. The
    * ambient scaling is applied ONE-SIDED — `max(controlRatio, 1)` — so
    * a faster-than-baseline session (ratio < 1) can never LOWER the
    * confirm bar below the unscaled `prev × 1.3`: round 10's driver run
    * measured ratio 0.636 on the sub-second controls and the scaled bar
    * (prev × 0.83) "confirmed" seven queries that ran absolutely faster
    * than the prior round. A slower session (ratio > 1) still raises
    * the bar, which is the direction ambient noise actually needs
    * normalizing in. Pure so BenchLogicSpec pins both directions.
    */
  private[graft] def confirmedRegression(
      soloT: Double, prevT: Double, controlRatio: Double): Boolean =
    soloT >= 0 && soloT > prevT * 1.3 * math.max(controlRatio, 1.0)

  /** Startup wipe of every `stage_*` materialized-view table and every
    * `ivf*` persisted ANN index under `target/graft_wh` — a bench run
    * may NEVER inherit a derived artifact from a previous run. The
    * first gate that needs a stage rebuilds it (in the untimed warmup
    * pass), and the derivation cost itself is carried by the timed
    * MV-refresh gates (`stage_*_build`, plus `basket_pair_lift` /
    * `dedup_ngram_jaccard` / `dedup_keep_list`, which recompute their
    * stages' derivations from parquet on every pass), so a fresh run's
    * JSON always contains the build seconds. Fixture tables (the data
    * being operated ON — delta/MoR tables, maintained states) stay:
    * building an input fixture is setup, not the timed operator.
    */
  private def wipeDerivedArtifacts(): Unit = {
    val root = new java.io.File("target/graft_wh")
    val subs = Option(root.listFiles()).getOrElse(Array.empty)
    for (sf <- subs if sf.isDirectory;
         t <- Option(sf.listFiles()).getOrElse(Array.empty)
         if t.getName.startsWith("stage_") || t.getName.startsWith("ivf"))
      org.apache.commons.io.FileUtils.deleteQuietly(t)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    wipeDerivedArtifacts()
    // optional comma-separated query-name filter for focused timing runs
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val selected = only match {
      case Some(names) => SparkEntry.queries.view.filterKeys(names).toMap
      case None        => SparkEntry.queries
    }

    // Forces evaluation of every output column. xxhash64 covers all the
    // types our queries emit (primitives, strings, arrays, timestamps).
    def force(df: DataFrame): Unit =
      try {
        val ck: Column = call_function("bit_xor", xxhash64(struct(df.columns.map(df.col): _*)))
        df.select(ck.as("__ck")).collect()
        ()
      } finally {
        graft.operators.Caches.release() // free operator-persisted subplans
        // localCheckpoint blocks (iterative operators' returned tables)
        // are RDD-level and invisible to the SQL cache registry; left
        // alone they accumulate across a 136-query suite and the
        // eviction churn slows later queries ~20%. Between queries
        // nothing may survive, so drop every persistent RDD.
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }

    // warmup: JIT, codegen caches, parquet footers, broadcast paths
    selected.foreach { case (_, fn) =>
      try force(fn(spark, sfDir)) catch { case _: Throwable => () }
    }

    // one control-set measurement: total seconds across the pinned
    // controls (always run from the FULL registry, present even under a
    // SPARK_GRAFT_QUERIES filter so filtered runs still normalize)
    def controlsPass(): Double = controlQueries.map { name =>
      val t0 = System.nanoTime()
      try force(SparkEntry.queries(name)(spark, sfDir))
      catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }.sum

    def timedPass(): (Map[String, Double], Set[String]) = {
      val failed = scala.collection.mutable.Set[String]()
      val times = selected.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { force(fn(spark, sfDir)); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed += name
          false
        }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
      (times, failed.toSet)
    }
    val ctlStart = controlsPass()
    val (p1, f1) = timedPass()
    val ctlMid = controlsPass()
    val (p2, f2) = timedPass()
    val ctlEnd = controlsPass()
    val failures = f1 ++ f2
    val results = p1.map { case (k, v) =>
      k -> (if (failures(k)) -1.0 else math.min(v, p2(k)))
    }
    // Per-query regression candidates vs the PREVIOUS round, AMBIENT-
    // NORMALIZED: the prior BENCH output's per-query baselines are
    // unnormalized cross-session times, so every comparison is scaled
    // by the control ratio (this run's median control-set time over the
    // prior run's recorded one) before flagging — a uniform machine/
    // session shift moves the controls identically and raises zero
    // flags; a real single-query regression stands out against the
    // shifted baseline. Candidates join the solo pool below.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    val prev = previousQueryTimes(outPath)
    val controlSec = Seq(ctlStart, ctlMid, ctlEnd).sorted.apply(1) // median
    val controlRatio = previousControlSec(outPath) match {
      case Some(prevCtl) if controlSec > 0 => controlSec / prevCtl
      // incomparable or absent recorded control total: normalize from
      // the shared control queries' suite times; 1.0 only when even
      // those are unavailable (first run ever / filtered prior map)
      case _ => ratioFromQueryTimes(prev, results).getOrElse(1.0)
    }
    val regressionCands = regressionCandidates(results, prev, controlRatio)

    // Solo re-timing: the five slowest queries PLUS the ANN family
    // (whose suite numbers drifted 1.4-1.75x across rounds with
    // insertion-only diffs — suite/JVM pressure, which solo timing
    // separates from real regressions) PLUS the top regression
    // candidates. Each runs again in a quiet JVM with no suite
    // immediately behind it. Published as "solo" next to the suite
    // numbers.
    val annFamily = Seq("ann_ivf_topk", "ann_pq_topk", "ann_ivf_pq_topk",
      "ann_ivf_refined_topk").filter(results.contains)
    val slowest = (results.toSeq.filter(_._2 >= 0).sortBy(-_._2).take(5).map(_._1) ++
      annFamily ++ regressionCands.take(8)).distinct
    val solo = slowest.map { name =>
      // Warm once UNTIMED before the timed solo run: a solo-cold
      // execution pays shared fixture/Memo builds that the in-suite
      // `prev` baseline never contained (suite order amortizes them
      // onto whichever gate runs first), so cold-solo vs in-suite-prev
      // systematically over-confirms — round 11 "confirmed"
      // feat_best_split at solo 2.019 s against in-suite 0.583 s purely
      // from the shared-fixture build landing on the solo run. The warm
      // pass absorbs one-time costs; the timed pass measures the
      // steady-state the in-suite baseline actually measures.
      try force(selected(name)(spark, sfDir)) catch { case _: Throwable => () }
      System.gc()
      val t0 = System.nanoTime()
      val ok = try { force(selected(name)(spark, sfDir)); true }
      catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }.toMap
    // millisecond precision keeps the line ~2 KB for 80+ queries — the
    // driver captures a bounded output tail, and the round-2 line (9
    // significant digits per query, ~4 KB) was truncated mid-line there
    def ms(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val fj = failures.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val sj = solo.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    // regressions section: in-suite delta plus the solo verdict —
    // "confirmed" only when the QUIET-JVM time also exceeds the
    // previous round's AMBIENT-SCALED baseline by 30% (suite-pressure
    // drift solo-clears itself; machine drift control-clears itself)
    val rj = regressionCands.map { q =>
      val soloT = solo.getOrElse(q, -1.0)
      val confirmed = confirmedRegression(soloT, prev(q), controlRatio)
      s"""{"q":"$q","prev":${ms(prev(q))},"cur":${ms(results(q))},"solo":${ms(soloT)},"confirmed":$confirmed}"""
    }.mkString("[", ",", "]")
    // the 5M flat-vs-partitioned merge crossover (BASELINE.md's layout
    // claim), regression-tracked: full-suite runs only, timed once
    val merge5m =
      if (only.nonEmpty) ""
      else try {
        val (flatSec, partSec, rewritten) = MergeCrossoverBench.run(spark)
        val c = MergeCrossoverBench.runCorrection(spark)
        // the merge5m timings carry the SAME control discipline as the
        // per-query tracker: the block records this session's control
        // ratio plus ratio-NORMALIZED seconds (raw / control_ratio —
        // what the time would read at the baseline session's ambient
        // speed), so cross-session flat-vs-partitioned crossover
        // comparisons in BASELINE.md are drift-proof instead of raw
        def nrm(v: Double): String =
          if (v < 0 || controlRatio <= 0) "-1" else ms(v / controlRatio)
        s""","merge5m":{"control_ratio":${f"$controlRatio%.3f"},"flat_delta_sec":${ms(flatSec)},"flat_delta_norm_sec":${nrm(flatSec)},"partitioned_delta_sec":${ms(partSec)},"partitioned_delta_norm_sec":${nrm(partSec)},"rows_rewritten":$rewritten,"mor_correction_sec":${ms(c.morSec)},"mor_correction_norm_sec":${nrm(c.morSec)},"mor_rows_written":${c.morRows},"mor_base_files_read":${c.filesRead},"mor_base_files_total":${c.filesTotal},"mor_minor_sec":${ms(c.minorSec)},"mor_minor_norm_sec":${nrm(c.minorSec)},"mor_minor_rows":${c.minorRows},"mor_compact_sec":${ms(c.compactSec)},"mor_compact_norm_sec":${nrm(c.compactSec)},"mor_compact_rows_rewritten":${c.compactRows},"partitioned_correction_sec":${ms(c.partSec)},"partitioned_correction_norm_sec":${nrm(c.partSec)},"partitioned_rows_rewritten":${c.partRows},"partitioned_minor_sec":${ms(c.pMinorSec)},"partitioned_minor_norm_sec":${nrm(c.pMinorSec)},"partitioned_minor_rows":${c.pMinorRows}}"""
      } catch { case e: Throwable =>
        System.err.println(s"[bench] merge5m FAILED: ${e.getMessage}")
        // keep the object shape identical to the success path so
        // consumers of the published schema never hit a missing key
        ""","merge5m":{"control_ratio":-1,"flat_delta_sec":-1,"flat_delta_norm_sec":-1,"partitioned_delta_sec":-1,"partitioned_delta_norm_sec":-1,"rows_rewritten":-1,"mor_correction_sec":-1,"mor_correction_norm_sec":-1,"mor_rows_written":-1,"mor_base_files_read":-1,"mor_base_files_total":-1,"mor_minor_sec":-1,"mor_minor_norm_sec":-1,"mor_minor_rows":-1,"mor_compact_sec":-1,"mor_compact_norm_sec":-1,"mor_compact_rows_rewritten":-1,"partitioned_correction_sec":-1,"partitioned_correction_norm_sec":-1,"partitioned_rows_rewritten":-1,"partitioned_minor_sec":-1,"partitioned_minor_norm_sec":-1,"partitioned_minor_rows":-1}"""
      }
    val total = results.values.filter(_ >= 0).sum
    // the env block lets the driver VERIFY the core-count env was
    // honored (round-12 `suspect_cpus_ignored` flag): the session's
    // actual master parallelism and shuffle partitioning, not just the
    // requested count
    val ej = s""""cpus":$cpus,"default_parallelism":${spark.sparkContext.defaultParallelism},""" +
      s""""shuffle_partitions":${spark.conf.get("spark.sql.shuffle.partitions")}"""
    val cj = s"""$ej,"controls":{"start":${ms(ctlStart)},"mid":${ms(ctlMid)},"end":${ms(ctlEnd)}},""" +
      s""""control_sec":${ms(controlSec)},"control_set":$controlSetVersion,""" +
      s""""control_ratio":${f"$controlRatio%.3f"}"""
    val line =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"solo":$sj,$cj,"regressions":$rj,"failures":$fj$merge5m,"sf":"$sfDir"}"""
    // the full per-query line (430 queries ≈ 17 KB) exceeds the
    // driver's bounded output capture — round 10's artifact caught only
    // a truncated, unparseable tail of it. Print a SHORT summary line
    // (total, counts, control ratio, confirmed regressions) FIRST and
    // again LAST so whichever end of the output the driver keeps always
    // contains a complete JSON line; the full map goes in between and
    // lands intact in the `outPath` file regardless.
    val confirmedJ = regressionCands
      .filter(q => confirmedRegression(solo.getOrElse(q, -1.0), prev(q), controlRatio))
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val summary =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","n_queries":${results.size},"n_failures":${failures.size},$cj,"confirmed":$confirmedJ,"sf":"$sfDir"}"""
    println(summary)
    println(line)
    println(summary)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath: ${e.getMessage}") }
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
