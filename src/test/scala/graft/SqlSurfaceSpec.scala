package graft

import org.apache.spark.sql.functions._

/** The SQL front-end over the same tables: spark.sql results must agree
  * with the DataFrame formulations (both lower to the same Catalyst
  * plans — this pins the registration path and names).
  */
class SqlSurfaceSpec extends SparkTestBase {

  private def registerViews(): Unit =
    graft.sources.Tables.all.foreach { t =>
      graft.sources.Tables.load(spark, sf("sf0.001"), t)
        .createOrReplaceTempView(t)
    }

  test("SQL and DataFrame agree on an aggregation") {
    registerViews()
    val viaSql = spark.sql(
      """SELECT l_returnflag, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect()
    val viaDf = graft.sources.Tables.lineitem(spark, sf("sf0.001"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
      .orderBy("l_returnflag").collect()
    assert(viaSql.sameElements(viaDf))
  }

  test("SQL join + window agree with the DataFrame plan") {
    registerViews()
    val viaSql = spark.sql(
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin)
      .collect()
    val viaDf = graft.operators.Relational
      .windowTopOrdersPerCustomer(spark, sf("sf0.001"))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey")
      .orderBy("o_custkey").collect()
    assert(viaSql.sameElements(viaDf))
  }
}
