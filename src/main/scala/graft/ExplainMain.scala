package graft
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local("explain", "16")
    s.sparkContext.setLogLevel("WARN")
    for (q <- args) {
      println(s"===== $q")
      val df = SparkEntry.queries(q)(s, "/root/testdata/sf0.1")
      df.collect()
      println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0).take(3000))
    }
    s.stop()
  }
}
