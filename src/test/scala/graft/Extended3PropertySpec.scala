package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws for the q87–q110 wave, sampled with fixed-seed
  * scalacheck generators (same explicit-sampling style as
  * [[Extended2PropertySpec]]). The chunking and split laws are pure
  * enough to check thousands of cases driver-side against one Spark
  * evaluation of the same expressions. */
class Extended3PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  import spark.implicits._

  test("chunk starts cover [0, n) with stride 48 for arbitrary n ≥ 1") {
    // law: starts = {0, 48, 96, …} ∩ [0, n); every token index lands in
    // ≥1 chunk; indices in overlap bands land in exactly 2
    val nGen = Gen.chooseNum(1L, 5000L)
    val ns = (0 until 300).flatMap { i =>
      nGen.apply(Gen.Parameters.default, Seed(7L + i))
    } ++ Seq(1L, 47L, 48L, 49L, 63L, 64L, 65L, 112L, 113L)
    val rows = ns.distinct.toDF("n")
      .select(col("n"), explode(sequence(lit(0L), col("n") - 1L,
        lit(48L))).as("start"))
      .select(col("n"), col("start"),
        least(col("start") + 64L, col("n")).as("end"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    ns.distinct.foreach { n =>
      val chunks = rows(n).map(c => (c._2, c._3)).sortBy(_._1)
      assert(chunks.head._1 == 0L)
      assert(chunks.last._2 == n, s"n=$n last chunk must reach n")
      // consecutive chunks overlap by exactly min(16, prev coverage)
      chunks.sliding(2).foreach {
        case Array((s1, e1), (s2, _)) =>
          assert(s2 == s1 + 48L)
          assert(s2 <= e1, s"n=$n gap between chunks at $s2")
        case _ =>
      }
    }
  }

  test("md5 split bands are exhaustive, disjoint, and growth-stable") {
    // law: every key lands in exactly one band, and adding MORE keys
    // never changes an existing key's band (the hash depends only on
    // the key itself)
    val keys = (0L until 3000L)
    val h = substring(md5(col("id").cast("string")), 1, 4)
    val split = when(h < "cccd", "train").when(h < "e666", "val")
      .otherwise("test")
    val full = keys.toDF("id").select(col("id"), split.as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(full.size == keys.size)
    val half = keys.take(1500).toDF("id").select(col("id"), split.as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    half.foreach { case (k, s) => assert(full(k) == s) }
    // band shares approach 80/10/10 over 3000 uniform hashes
    val shares = full.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(shares("train") / 3000.0 - 0.8) < 0.05)
    assert(math.abs(shares("val") / 3000.0 - 0.1) < 0.03)
    assert(math.abs(shares("test") / 3000.0 - 0.1) < 0.03)
  }

  test("multiset ops: intersectAll/exceptAll counting laws on random bags") {
    val gen = Gen.listOfN(60, Gen.chooseNum(0, 5))
    (0 until 5).foreach { trial =>
      val xs = gen(Gen.Parameters.default, Seed(11L + trial)).get
      val ys = gen(Gen.Parameters.default, Seed(99L + trial)).get
      val a = xs.toDF("v"); val b = ys.toDF("v")
      val inter = a.intersectAll(b).groupBy("v").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val excpt = a.exceptAll(b).groupBy("v").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val ca = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cb = ys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      (0 to 5).foreach { v =>
        assert(inter.getOrElse(v, 0L) ==
          math.min(ca.getOrElse(v, 0L), cb.getOrElse(v, 0L)))
        assert(excpt.getOrElse(v, 0L) ==
          math.max(ca.getOrElse(v, 0L) - cb.getOrElse(v, 0L), 0L))
      }
    }
  }
}
