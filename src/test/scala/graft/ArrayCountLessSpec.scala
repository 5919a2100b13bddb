package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.ArrayCountLess

/** The binary-search bucket expression must be a drop-in for the
  * interpreted HOF it replaced in avgRank2Kinds — bit-identical on
  * contract inputs (sorted null-free splits), including duplicate
  * split points, probes outside the range, and NaN probes; and the
  * null-probe difference (NULL bucket vs HOF's bucket 0) must not
  * change any rank the machinery produces.
  */
class ArrayCountLessSpec extends SparkTestBase {
  import spark.implicits._

  test("binary search equals the filter-HOF count on randomized sorted splits") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { _ =>
      val n = 1 + rnd.nextInt(40)
      // duplicates on purpose: draw from a small value pool
      val splits = Seq.fill(n)(rnd.nextInt(12).toDouble).sorted
      val v = rnd.nextInt(14) - 1.0 // probes below, inside, above
      (splits, v)
    } :+ ((Seq(1.0, 2.0, 3.0), Double.NaN))
    val df = rows.toDF("splits", "v")
      .withColumn("hof", expr("size(filter(splits, s -> s < v))"))
      .withColumn("bs", ArrayCountLess(col("splits"), col("v")))
    val bad = df.filter(col("hof") =!= col("bs")).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.mkString("; ")}")
  }

  test("whole-stage codegen path agrees with interpreted eval") {
    // force both paths over the same rows: the expression must not
    // depend on which engine evaluates it
    val data = Seq((Seq(0.25, 0.5, 0.5, 0.75), 0.5), (Seq.empty[Double], 1.0))
    def run(codegen: String): Seq[Int] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try data.toDF("splits", "v")
        .select(ArrayCountLess(col("splits"), col("v")).as("c"))
        .as[Int].collect().toSeq
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    assert(run("true") === Seq(1, 0))
    assert(run("false") === Seq(1, 0))
  }

  test("long-typed splits take the integer comparison path (zorder keys)") {
    val df = Seq((Seq(10L, 20L, 20L, 30L), 20L), (Seq(1L, 2L), 5L),
        (Seq(7L), Long.MinValue))
      .toDF("splits", "v")
      .withColumn("hof", expr("size(filter(splits, s -> s < v))"))
      .withColumn("bs", ArrayCountLess(col("splits"), col("v")))
    val bad = df.filter(col("hof") =!= col("bs")).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.mkString("; ")}")
  }

  test("null keys still rank below everything (HOF bucket-0 equivalence)") {
    // avgRank2Kinds via its public faces: zorderRanked keeps null keys
    // through null-safe joins. A null x must get the lowest rank-bucket
    // (z interleave treats its rank as minimal), exactly as under the
    // HOF formulation where null landed in bucket 0 and sorted first.
    val rows = Seq[(java.lang.Long, java.lang.Long)](
      (null, 5L), (1L, 4L), (2L, 3L), (3L, 2L), (4L, 1L), (5L, 0L))
      .toDF("x", "y")
    val z = graft.operators.Analytics.zorderRanked(
        rows, col("x").cast("double"), col("y").cast("double"))
      .collect().map(r => Option(r.get(0)) -> r.getLong(2)).toMap
    assert(z.size === 6, "null-keyed row must survive the rank join")
    // the null x ranks below every real x, so its even-bit (x) spread
    // of z must be strictly minimal among all rows — bit spreading is
    // order-preserving, so comparing spread components compares ranks
    def xPart(v: Long): Long = v & 0x5555555555555555L
    val zNull = xPart(z(None))
    z.collect { case (Some(_), v) => v }.foreach { v =>
      assert(zNull < xPart(v),
        f"null x must hold the minimal x-bucket: $zNull%x vs ${xPart(v)}%x")
    }
  }
}
