package graft

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame

/** One-shot helper: print canonical golden hashes for a list of queries
  * on the sf0.001 fixture (same canonicalization as GoldenQueriesSpec),
  * to pin new rounds' flagships. Run:
  * `sbt "Test/runMain graft.PinDump q1,q2,..."`.
  */
object PinDump {
  private def canonicalHash(df: DataFrame): String = {
    val cols = df.columns.sorted
    val lines = df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map {
        case null => "NULL"
        case d: java.lang.Double => if (d == d.longValue()) d.longValue().toString else d.toString
        case v => v.toString
      }.mkString("|"))
      .sorted
    val md = MessageDigest.getInstance("MD5")
    lines.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("pin-dump", "8")
    spark.sparkContext.setLogLevel("ERROR")
    args.head.split(",").map(_.trim).filter(_.nonEmpty).foreach { q =>
      val h = canonicalHash(SparkEntry.queries(q)(spark, "/root/testdata/sf0.001"))
      println(s"""PIN "$q" -> "$h",""")
      graft.operators.Caches.release()
    }
    spark.stop()
  }
}
