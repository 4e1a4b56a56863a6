package graft

/** Plan-audit CLI: print the FINAL (post-AQE) physical plan of any
  * gated query, after executing it so adaptive re-planning has
  * happened. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ExplainMain q3_seg_revenue asof_join"
  *
  * The per-operator plan expectations this is used to audit live in
  * ScaleSpec/NonEquiSpec as assertions; this tool is for eyeballing a
  * query whose cost surprised you in BENCH output.
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.local("explain", "16")
    s.sparkContext.setLogLevel("WARN")
    try {
      for (q <- args) {
        println(s"===== $q")
        val df = SparkEntry.queries(q)(s, sfDir)
        df.collect()
        println(df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0).take(4000))
        graft.operators.Caches.release()
      }
    } finally s.stop()
  }
}
