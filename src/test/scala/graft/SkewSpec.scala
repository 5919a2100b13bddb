package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.operators.Skew

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("salted two-phase count equals the plain groupBy count") {
    val words = TextOps.explodedWords(
      graft.sources.Tables.documents(spark, sf("sf0.001")), col("doc_id"))
    val plain = words.groupBy(col("word")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(words, col("word"), saltFactor = 8)
      .as[(String, Long)].collect().toMap
    assert(salted === plain)
  }

  test("salted join equals the plain join and joins on (key, salt)") {
    // hot key: one word carries half the fact rows; dim has multiple
    // rows per key to prove multiplicity survives the replication
    val fact = (1 to 400).map(i => (if (i % 2 == 0) "hot" else s"w$i", i))
      .toDF("word", "v")
    val dim = Seq(("hot", "a"), ("hot", "b"), ("w1", "c"), ("w3", "d"))
      .toDF("word", "tag")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a shuffle join: salting exists precisely for dims too
      // big to broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val salted = Skew.saltedJoin(fact, dim, "word", saltFactor = 8)
        .as[(String, Int, String)]
      val expected = fact.join(dim, "word")
        .as[(String, Int, String)].collect().sorted
      assert(salted.collect().sorted === expected)
      // executedPlan of the SAME dataset, after execution — under AQE
      // the final plan only exists once the query has run
      val plan = salted.queryExecution.executedPlan.toString
      assert(plan.contains("_salt"),
        s"join must key on (word, _salt); plan:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("native session_window agrees with the lag-gap sessionization") {
    val ev = graft.sources.Tables.events(spark, sf("sf0.001"))
    val native = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"))
      .as[(Long, Long)].collect().toMap
    val lagGap = graft.operators.EventOps.sessionize(spark, sf("sf0.001"))
      .select(col("user_id"), col("n_sessions"))
      .as[(Long, Long)].collect().toMap
    assert(native === lagGap)
  }
}
