package graft

import org.apache.spark.sql.functions._
import graft.operators.SuffixRanks

/** Dev-only: measure [[SuffixRanks.incremental]] AT the
  * MaxDeltaClasses cap (the r15 verdict's "measure the typedLit
  * payload" item). The three delta-class arrays ride the plan as
  * literals; Spark serializes each stage's task binary ONCE into a
  * broadcast (DAGScheduler), so the question is whether ~48 MB of
  * literal longs in that broadcast is materially worse than an
  * explicit broadcast variable — this probe records the merge
  * wall-time and the largest task-binary broadcast it triggered.
  *
  *   sbt "Test/runMain graft.TripleCapProbe [nChars]"
  */
object TripleCapProbe {
  def main(args: Array[String]): Unit = {
    // ~2M delta chars -> ~2M window positions, near-distinct under a
    // high-entropy 27-letter PRNG stream -> ~MaxDeltaClasses classes
    val nChars = args.headOption.map(_.toInt).getOrElse(2000000)
    val spark = Verify.session()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // task-binary broadcast sizes surface as DAGScheduler WARN lines
    // ("Broadcasting large task binary with size ...") in the output
    val oldDir = "/root/testdata/sf0.001"
    val oldDocs = graft.sources.Tables.documents(spark, oldDir)
      .select(col("doc_id"), col("text"))
    val oldIdx = SuffixRanks.suffixRanks(oldDocs).localCheckpoint()

    // deterministic high-entropy delta text (27-char alphabet), split
    // into 1000-char docs keyed past the old ids
    val docLen = 1000
    val nDocs = nChars / docLen
    val mkDoc = udf { (id: Long) =>
      val rng = new scala.util.Random(id)
      val sb = new StringBuilder(docLen)
      (0 until docLen).foreach { _ =>
        val c = rng.nextInt(27)
        sb.append(if (c == 26) ' ' else ('a' + c).toChar)
      }
      sb.toString
    }
    val delta = spark.range(nDocs)
      .select((col("id") + 1000000L).as("doc_id"), mkDoc(col("id")).as("text"))
      .localCheckpoint()
    println(s"[probe] delta: $nDocs docs x $docLen chars = $nChars positions")

    val rt = Runtime.getRuntime
    System.gc()
    val heap0 = rt.totalMemory() - rt.freeMemory()
    val t0 = System.nanoTime()
    val merged = SuffixRanks.incremental(oldIdx, oldDocs, delta)
    val n = merged.count()
    val dt = (System.nanoTime() - t0) / 1e9
    System.gc()
    val heap1 = rt.totalMemory() - rt.freeMemory()
    println(f"[probe] merge at cap: $n rows in $dt%.1f s; driver heap " +
      f"delta ${(heap1 - heap0) / 1e6}%.0f MB (max binary tracked via WARN log)")
    spark.stop()
  }
}
