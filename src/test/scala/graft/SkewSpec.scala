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
