package graft

/** Optimization-round plan snapshotter: write `explain("formatted")`
  * output of gated queries to `plans/<round>/<query>_<tag>.txt` — the
  * before/after evidence files the optimization rounds commit. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.PlanDump r12 before q1_agg graph_pagerank"
  *
  * The plan printed is the pre-execution formatted plan (the shape
  * evidence: Exchange count, join strategy, PushedFilters/ReadSchema);
  * iterative operators whose driver loop materializes intermediates
  * print the plan of the RETURNED DataFrame, which is what the final
  * stage executes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <round> <tag> <query...>")
    val round = args(0); val tag = args(1); val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.local("plandump", sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    s.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Paths.get("plans", round)
    java.nio.file.Files.createDirectories(dir)
    try {
      for (q <- names) {
        val df = SparkEntry.queries(q)(s, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(dir.resolve(s"${q}_$tag.txt"), txt)
        println(s"[plandump] wrote ${dir.resolve(s"${q}_$tag.txt")}")
        graft.operators.Caches.release()
        s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    } finally s.stop()
  }
}
