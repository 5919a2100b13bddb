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

  test("custom vec_dot expression is callable from SQL") {
    graft.functions.GraftFunctions.register(spark)
    graft.sources.Tables.embeddings(spark, sf("sf0.001"))
      .createOrReplaceTempView("embeddings")
    val viaSql = spark.sql(
      """SELECT vec_id, round(vec_dot(embedding, embedding), 6) AS sq
        |FROM embeddings ORDER BY vec_id LIMIT 5""".stripMargin).collect()
    val viaDf = graft.sources.Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id"),
        round(graft.operators.Similarity.dot(col("embedding"), col("embedding")), 6).as("sq"))
      .orderBy("vec_id").limit(5).collect()
    assert(viaSql.sameElements(viaDf))
  }

  test("custom array_count_less expression is callable from SQL") {
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      """SELECT array_count_less(array(0.25D, 0.5D, 0.5D, 0.75D), 0.5D) AS c,
        |       array_count_less(array(10L, 20L, 30L), 25L) AS cl""".stripMargin)
      .collect().head
    assert(viaSql.getInt(0) === 1)
    assert(viaSql.getInt(1) === 2)
  }

  test("array_count_less coerces mixed numeric inputs like the HOF it replaced") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT array_count_less(array(0.25D, 0.5D, 0.75D), 1) AS int_probe,
        |       array_count_less(array(10, 20, 30), 25L) AS int_array,
        |       array_count_less(array(10L, 20L, 30L), 25.5D) AS frac_probe,
        |       array_count_less(array(CAST(1.5 AS FLOAT)), 2) AS float_arr
        |""".stripMargin).collect().head
    // int literal probe against array<double>: probe promotes to double
    assert(r.getInt(0) === 3)
    // array<int> against a long probe: array promotes to array<bigint>
    assert(r.getInt(1) === 2)
    // fractional probe against an integral array: BOTH promote to
    // double (the lambda's `s < v` promotion), not probe-truncation
    assert(r.getInt(2) === 2)
    assert(r.getInt(3) === 1)
  }

  test("vec_cosine in SQL matches the Column-API cosine bit-for-bit") {
    graft.functions.GraftFunctions.register(spark)
    graft.sources.Tables.embeddings(spark, sf("sf0.001"))
      .createOrReplaceTempView("embeddings")
    val viaSql = spark.sql(
      """SELECT a.vec_id, vec_cosine(a.embedding, b.embedding) AS c
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 20 ORDER BY a.vec_id""".stripMargin).collect()
    val emb = graft.sources.Tables.embeddings(spark, sf("sf0.001"))
    val viaDf = emb.as("a")
      .join(emb.as("b"),
        org.apache.spark.sql.functions.col("b.vec_id") ===
          org.apache.spark.sql.functions.col("a.vec_id") + 1)
      .filter(org.apache.spark.sql.functions.col("a.vec_id") < 20)
      .select(org.apache.spark.sql.functions.col("a.vec_id"),
        graft.operators.Similarity.cosine(
          org.apache.spark.sql.functions.col("a.embedding"),
          org.apache.spark.sql.functions.col("b.embedding")).as("c"))
      .orderBy("vec_id").collect()
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

  test("GraftExtensions injects vec_dot into a session built with spark.sql.extensions") {
    import org.apache.spark.sql.SparkSession
    val shared = spark // force lazy init so the SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // reuses the live SparkContext. `spark.sql.extensions` is a
      // STATIC conf read at SparkContext creation, so the test injects
      // through builder.withExtensions — the same GraftExtensions class
      // a cluster would name in spark.sql.extensions.
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val got = s2.sql(
        "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect().head.getDouble(0)
      assert(got === 11.0)
      val acl = s2.sql(
        "SELECT array_count_less(array(1.0D, 2.0D, 3.0D), 2.5D) AS c")
        .collect().head.getInt(0)
      assert(acl === 2)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("RewriteSelfDotProduct turns the HOF self-dot-product into VecDot — only when provably safe") {
    import org.apache.spark.sql.SparkSession
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      // literal arrays: element containsNull = false -> rule may fire
      val df = s2.range(3).select(
        array((0 to 4).map(j => (col("id") + j).cast("double")): _*).as("a"))
      val hofSelf = graft.operators.Similarity.dotHof(col("a"), col("a"))
      val rewritten = df.select(hofSelf.as("d"))
      assert(rewritten.queryExecution.optimizedPlan.toString.contains("vec_dot"),
        s"rule did not fire:\n${rewritten.queryExecution.optimizedPlan}")
      val viaRule = rewritten.collect().map(_.getDouble(0))
      val direct = df.select(graft.plans.VecDot(col("a"), col("a")).as("d"))
        .collect().map(_.getDouble(0))
      assert(viaRule.sameElements(direct))

      // different arrays: zip_with padding is possible -> must NOT fire
      val two = s2.range(3).select(
        array(col("id").cast("double")).as("a"),
        array(col("id").cast("double"), lit(1.0)).as("b"))
      val unsafe = two.select(
        graft.operators.Similarity.dotHof(col("a"), col("b")).as("d"))
      assert(!unsafe.queryExecution.optimizedPlan.toString.contains("vec_dot"),
        "rule fired on arrays it cannot prove equal-length")

      // int-element arrays reach the same shape through CAST(x AS
      // DOUBLE) * CAST(y AS DOUBLE) — VecDot only reads float/double
      // storage, so the rule must NOT fire, and the HOF result must
      // still be correct
      val ints = s2.sql(
        """SELECT aggregate(
          |  zip_with(a, a, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
          |  0.0D, (acc, v) -> acc + v) AS d
          |FROM (SELECT array(1, 2, 3) AS a)""".stripMargin)
      assert(!ints.queryExecution.optimizedPlan.toString.contains("vec_dot"),
        "rule fired on an int-element array (VecDot would misread storage)")
      assert(ints.collect().head.getDouble(0) === 14.0)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
