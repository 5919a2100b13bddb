package graft

import org.apache.spark.sql.functions._

import graft.plans.TripleCountLess

/** [[graft.plans.TripleCountLess]] against a driver-side reference
  * count, through the DataFrame (whole-stage codegen) path: random
  * sorted triple arrays, probes below/at/above every boundary, both
  * the strict and the or-equal variant, plus the empty-array and
  * boundary-duplicate corners the suffix merge leans on.
  */
class TripleCountLessSpec extends SparkTestBase {
  import spark.implicits._

  private def ref(bs: Seq[(Long, Long, Long)], v: (Long, Long, Long),
      orEq: Boolean): Int = {
    implicit val ord: Ordering[(Long, Long, Long)] = Ordering.Tuple3
    bs.count(b => if (orEq) ord.lteq(b, v) else ord.lt(b, v))
  }

  test("codegen binary search == reference count on random triples") {
    val rnd = new scala.util.Random(42)
    // small value domain forces heavy tie structure across components
    def t3() = (rnd.nextInt(5).toLong, rnd.nextInt(5).toLong,
      rnd.nextInt(5).toLong)
    for (trial <- 1 to 8) {
      val bs = Seq.fill(rnd.nextInt(40))(t3()).distinct.sorted
      val probes = (Seq.fill(60)(t3()) ++ bs).distinct
      val b1 = typedLit(bs.map(_._1))
      val b2 = typedLit(bs.map(_._2))
      val b3 = typedLit(bs.map(_._3))
      val got = probes.toDF("v1", "v2", "v3")
        .select(col("v1"), col("v2"), col("v3"),
          TripleCountLess(b1, b2, b3, col("v1"), col("v2"), col("v3"),
            orEq = false).as("lt"),
          TripleCountLess(b1, b2, b3, col("v1"), col("v2"), col("v3"),
            orEq = true).as("le"))
        .collect()
      got.foreach { r =>
        val v = (r.getLong(0), r.getLong(1), r.getLong(2))
        assert(r.getInt(3) === ref(bs, v, orEq = false),
          s"trial=$trial lt mismatch at $v vs $bs")
        assert(r.getInt(4) === ref(bs, v, orEq = true),
          s"trial=$trial le mismatch at $v vs $bs")
      }
    }
  }

  test("broadcast variants == literal variants on random triples") {
    val rnd = new scala.util.Random(7)
    def t3() = (rnd.nextInt(5).toLong, rnd.nextInt(5).toLong,
      rnd.nextInt(5).toLong)
    for (trial <- 1 to 6) {
      val bs = Seq.fill(rnd.nextInt(40))(t3()).distinct.sorted
      val probes = (Seq.fill(60)(t3()) ++ bs).distinct
      val bc = spark.sparkContext.broadcast(new graft.plans.SortedLongs(
        bs.map(_._1).toArray, bs.map(_._2).toArray, bs.map(_._3).toArray))
      val insBc = spark.sparkContext.broadcast(new graft.plans.SortedLongs(
        bs.map(_._1).toArray, Array.emptyLongArray, Array.emptyLongArray))
      val got = probes.toDF("v1", "v2", "v3")
        .select(col("v1"), col("v2"), col("v3"),
          graft.plans.TripleCountLessBcast(bc, col("v1"), col("v2"),
            col("v3"), orEq = false).as("lt"),
          graft.plans.TripleCountLessBcast(bc, col("v1"), col("v2"),
            col("v3"), orEq = true).as("le"),
          graft.plans.LongCountLessBcast(insBc, col("v1")).as("l1lt"))
        .collect()
      got.foreach { r =>
        val v = (r.getLong(0), r.getLong(1), r.getLong(2))
        assert(r.getInt(3) === ref(bs, v, orEq = false),
          s"trial=$trial bcast lt mismatch at $v vs $bs")
        assert(r.getInt(4) === ref(bs, v, orEq = true),
          s"trial=$trial bcast le mismatch at $v vs $bs")
        assert(r.getInt(5) === bs.map(_._1).count(_ < v._1),
          s"trial=$trial long bcast mismatch at $v")
      }
      // interpreted (non-codegen) path parity: evaluate via the
      // expression's eval directly
      val exprLt = graft.plans.TripleCountLessBcast(bc,
        org.apache.spark.sql.catalyst.expressions.Literal(3L),
        org.apache.spark.sql.catalyst.expressions.Literal(3L),
        org.apache.spark.sql.catalyst.expressions.Literal(3L), orEq = false)
      assert(exprLt.eval(null) === ref(bs, (3L, 3L, 3L), orEq = false))
    }
  }

  test("empty array counts zero; equality detected via le > lt") {
    val empty = typedLit(Seq.empty[Long])
    val one = Seq((7L, 8L, 9L)).toDF("v1", "v2", "v3")
      .select(
        TripleCountLess(empty, empty, empty, col("v1"), col("v2"),
          col("v3"), orEq = false).as("lt"),
        TripleCountLess(typedLit(Seq(7L)), typedLit(Seq(8L)),
          typedLit(Seq(9L)), col("v1"), col("v2"), col("v3"),
          orEq = true).as("le"),
        TripleCountLess(typedLit(Seq(7L)), typedLit(Seq(8L)),
          typedLit(Seq(9L)), col("v1"), col("v2"), col("v3"),
          orEq = false).as("lt1"))
      .collect().head
    assert(one.getInt(0) === 0)
    assert(one.getInt(1) === 1 && one.getInt(2) === 0,
      "le > lt must signal an exact triple match")
  }
}
