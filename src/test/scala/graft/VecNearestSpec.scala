package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.VecNearest

/** vec_nearest must be a drop-in for the crossJoin + min_by shape it
  * replaced in the IVF family: same winner (argmax cosine, ties to the
  * smaller candidate position — min_by(cid, struct(-cos, cid)) with
  * positions ordered by cid), same winning cosine bit-for-bit (VecDot
  * accumulation), identical under interpreted and codegen evaluation,
  * and Spark-min NaN semantics (a zero-norm vector's all-NaN cosines
  * resolve to position 0, like min_by over all-NaN keys).
  */
class VecNearestSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)

  private def randVec(dim: Int): Seq[Float] =
    Seq.fill(dim)(rnd.nextFloat() * 2f - 1f)

  test("winner and cosine match the crossJoin + min_by formulation") {
    val dim = 16
    // no zero-norm candidate here: a NaN ordering key makes the
    // REFERENCE min_by itself arrival-order-sensitive (its codegen
    // compares with primitive <, so a first-seen NaN never loses);
    // vec_nearest's NaN-always-loses rule is the deterministic
    // behavior and is covered by the dedicated zero-norm test below
    val cands = Vector.fill(10)(randVec(dim))
    val vecs = ((1 to 200).map(i => (i.toLong, randVec(dim))) :+
      // duplicate of a candidate: cosine exactly 1 plus fp ties
      (900L, cands(3))).toDF("vec_id", "embedding")
    // expectation under non-ANSI IEEE division: the reference
    // formulation would ERROR on any zero denominator under ANSI
    // (the Spark 4 default) where vec_nearest stays quiet-NaN
    val expected = {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      try vecs
        .crossJoin(cands.zipWithIndex.toDF("cvec", "pos"))
        .select(col("vec_id"), col("pos"),
          (-(graft.plans.VecDot(col("embedding"), col("cvec")) /
            (sqrt(graft.plans.VecDot(col("embedding"), col("embedding"))) *
              sqrt(graft.plans.VecDot(col("cvec"), col("cvec")))))).as("d"))
        .groupBy(col("vec_id"))
        .agg(min_by(col("pos"), struct(col("d"), col("pos"))).as("pos"),
          min(col("d")).as("negcos"))
        .select(col("vec_id"), col("pos"), (-col("negcos")).as("cos"))
        .collect()
      finally spark.conf.unset("spark.sql.ansi.enabled")
    }
    val got = vecs.select(col("vec_id"),
      VecNearest(col("embedding"), typedLit(cands)).getField("pos").as("pos"),
      VecNearest(col("embedding"), typedLit(cands)).getField("cos").as("cos"))
    val e = expected.map(r =>
      r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    val g = got.collect().map(r =>
      r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(g.keySet === e.keySet)
    g.foreach { case (id, (pos, cos)) =>
      assert(pos === e(id)._1, s"vec $id winner")
      // bit-identical, not approximately equal
      assert(java.lang.Double.doubleToLongBits(cos) ===
        java.lang.Double.doubleToLongBits(e(id)._2), s"vec $id cosine")
    }
  }

  test("codegen and interpreted evaluation agree") {
    val cands = Vector.fill(5)(randVec(8))
    val data = (1 to 40).map(i => (i.toLong, randVec(8)))
    def run(codegen: String): Seq[(Long, Int, Double)] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try data.toDF("vec_id", "embedding")
        .select(col("vec_id"),
          VecNearest(col("embedding"), typedLit(cands)).as("n"))
        .select(col("vec_id"), col("n.pos"), col("n.cos"))
        .as[(Long, Int, Double)].collect().toSeq.sortBy(_._1)
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    assert(run("true") === run("false"))
  }

  test("zero-norm vector resolves to position 0 (Spark min over all-NaN)") {
    val cands = Vector.fill(3)(randVec(4))
    val got = Seq((1L, Seq(0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
      .select(VecNearest(col("embedding"), typedLit(cands)).as("n"))
      .select(col("n.pos"), col("n.cos"))
      .as[(Int, Double)].head()
    assert(got._1 === 0)
    assert(got._2.isNaN)
  }

  test("length mismatch uses the dot prefix but each side's own norm") {
    // vec longer than candidate: dot over the shared prefix, norms
    // over full lengths — the VecDot-composition contract
    val vec = Seq(1f, 0f, 3f)
    val cand = Seq(1f, 0f)
    val got = Seq((1L, vec)).toDF("vec_id", "embedding")
      .select(VecNearest(col("embedding"),
        typedLit(Vector(cand))).getField("cos"))
      .as[Double].head()
    val expected = 1.0 / (math.sqrt(10.0) * math.sqrt(1.0))
    assert(java.lang.Double.doubleToLongBits(got) ===
      java.lang.Double.doubleToLongBits(expected))
  }

  test("exact cosine ties break to the smaller position") {
    val v = Seq(1f, 1f)
    // two identical candidates (exact tie) placed at positions 1 and 2
    val cands = Vector(Seq(-1f, 0f), Seq(1f, 0f), Seq(1f, 0f))
    val got = Seq((1L, v)).toDF("vec_id", "embedding")
      .select(VecNearest(col("embedding"), typedLit(cands)).getField("pos"))
      .as[Int].head()
    assert(got === 1)
  }
}
