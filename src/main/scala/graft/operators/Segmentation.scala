package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Customer-base segmentation: RFM (recency / frequency / monetary)
  * scoring, the workhorse of CRM analytics.
  *
  * Scale shape: one combinable per-customer aggregate over the orders
  * fact, then quintile THRESHOLDS via exact `percentile_disc` (12
  * scalars — percentile of an aggregate that is customer-dimension
  * sized, not fact-sized), broadcast back as one row; scoring is a
  * pure projection. No ntile — a global ntile window would funnel the
  * customer dimension through one reducer AND make scores depend on
  * row count parity; threshold scoring is the two-pass shape that
  * scales and replays exactly in any engine.
  *
  * Scores: 1 + Σ(x > t_q) over the four quintile cuts, recency
  * inverted (recent = high). Boundary ties resolve by strict `>` on
  * exact integers (days / counts / cents) in both engines.
  */
object Segmentation {

  def rfmScores(orders: DataFrame, refTs: Column): DataFrame = {
    val spark = orders.sparkSession
    val base = orders.groupBy(col("o_custkey"))
      .agg(
        datediff(to_date(refTs), to_date(max(col("o_orderdate"))))
          .cast("int").as("r_days"),
        count(lit(1)).as("f_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("m_cents"))
    val v = graft.Views.unique("rfm_base")
    base.createOrReplaceTempView(v)
    val cuts = spark.sql(
      Seq("r_days", "f_orders", "m_cents").flatMap { c =>
        Seq(20, 40, 60, 80).map(q =>
          s"percentile_disc(0.$q) WITHIN GROUP (ORDER BY $c) AS ${c}_$q")
      }.mkString("SELECT ", ", ", s" FROM $v"))
    val out = base.crossJoin(broadcast(cuts))
    spark.catalog.dropTempView(v)
    def rawScore(c: String) =
      (lit(1) + (col(c) > col(s"${c}_20")).cast("int") +
        (col(c) > col(s"${c}_40")).cast("int") +
        (col(c) > col(s"${c}_60")).cast("int") +
        (col(c) > col(s"${c}_80")).cast("int"))
    out.select(col("o_custkey"), col("r_days"), col("f_orders"), col("m_cents"),
      (lit(6) - rawScore("r_days")).as("r_score"),
      rawScore("f_orders").as("f_score"),
      rawScore("m_cents").as("m_score"))
      .withColumn("segment",
        concat(col("r_score").cast("string"), col("f_score").cast("string"),
          col("m_score").cast("string")))
  }

  /** DuckDB replay of [[rfmScores]] — the threshold expressions are
    * generated from the same quintile list so the sides cannot drift.
    */
  def rfmScoresSql(table: String, refDate: String): String = {
    val qs = Seq(20, 40, 60, 80)
    val cutCols = Seq("r_days", "f_orders", "m_cents").flatMap { c =>
      qs.map(q => s"percentile_disc(0.$q) WITHIN GROUP (ORDER BY $c) AS ${c}_$q")
    }.mkString(", ")
    def raw(c: String) =
      qs.map(q => s"CAST($c > ${c}_$q AS INT)").mkString("(1 + ", " + ", ")")
    s"WITH base AS (SELECT o_custkey, " +
      s"CAST(date_diff('day', CAST(max(o_orderdate) AS DATE), DATE '$refDate') AS INT) AS r_days, " +
      "count(*) AS f_orders, " +
      s"CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS m_cents FROM $table GROUP BY 1), " +
      s"cuts AS (SELECT $cutCols FROM base), " +
      s"sc AS (SELECT o_custkey, r_days, f_orders, m_cents, " +
      s"6 - ${raw("r_days")} AS r_score, ${raw("f_orders")} AS f_score, " +
      s"${raw("m_cents")} AS m_score FROM base CROSS JOIN cuts) " +
      "SELECT o_custkey, r_days, f_orders, m_cents, r_score, f_score, m_score, " +
      "CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR) AS segment FROM sc"
  }
}
