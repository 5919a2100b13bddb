package graft

import org.apache.spark.sql.SparkSession

/** Post-query hygiene for harness mains (Bench/Verify/Prof/ScaleSmoke):
  * drop persisted RDD blocks left by localCheckpoint intermediates.
  * Checkpoints are consumed entirely within their query; once the query
  * has materialized, keeping the blocks only squeezes storage memory
  * out from under LATER queries (observed: unrelated queries slowing
  * 2-4x after a checkpoint-heavy one). The ContextCleaner would get
  * there eventually via GC; harnesses that time queries should not
  * wait for it.
  *
  * Blocking on purpose: the call sits OUTSIDE the timed window (Bench
  * computes dt first), and an async unpersist could overlap — and
  * steal memory/cycles from — the next timed query.
  */
object Cleanup {
  def dropPersisted(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))

  /** Between TIMED queries: drop checkpoint blocks AND trigger the
    * ContextCleaner's weak-reference path. Shuffle files and broadcast
    * blocks from a finished query are reclaimed only when the driver
    * GC notices their references died; across a 123-query suite that
    * reclamation otherwise lands wherever GC happens to run — i.e.
    * inside a LATER query's measured window (the r6 official-bench
    * pattern: slowdowns confined to the checkpoint/shuffle-heavy
    * stretch of the suite). An explicit gc after each measured query
    * moves that work deterministically outside every timed window.
    * Costs ~100 ms per call on this heap — untimed by construction.
    */
  def fullRelease(spark: SparkSession): Unit = {
    dropPersisted(spark)
    System.gc()
  }
}
