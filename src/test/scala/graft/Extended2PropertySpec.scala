package graft

import graft.ops.{Extended, LayoutOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws for the round-3 operators, sampled with fixed-seed
  * scalacheck generators (explicit sampling — the scalatest bridge
  * artifact isn't in the offline cache). JVM-level laws (Morton
  * bijectivity) sample thousands of cases; Spark-job laws sample few
  * but with structurally adversarial generators. */
class Extended2PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  import spark.implicits._

  private def refMorton(a: Long, b: Long): Long =
    (0 until 32).foldLeft(0L) { (z, i) =>
      z | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  private def deinterleave(z: Long): (Long, Long) =
    (0 until 32).foldLeft((0L, 0L)) { case ((a, b), i) =>
      (a | (((z >> (2 * i)) & 1L) << i),
       b | (((z >> (2 * i + 1)) & 1L) << i))
    }

  test("zorderKey is a bijection on 32-bit pairs (round-trips through deinterleave)") {
    val gen = for {
      a <- Gen.chooseNum(0L, 0xFFFFFFFFL)
      b <- Gen.chooseNum(0L, 0xFFFFFFFFL)
    } yield (a, b)
    val pairs = (0 until 2000).flatMap { i =>
      gen(Gen.Parameters.default, Seed(42L + i))
    } ++ Seq((0L, 0L), (0xFFFFFFFFL, 0xFFFFFFFFL), (0L, 0xFFFFFFFFL))
    // check the Column implementation agrees with the reference on a
    // Spark pass, and the reference round-trips — together: bijection
    val fromSpark = pairs.toDF("a", "b")
      .select(LayoutOps.zorderKey(col("a"), col("b"))).collect()
      .map(_.getLong(0))
    pairs.zip(fromSpark).foreach { case ((a, b), z) =>
      assert(z == refMorton(a, b))
      assert(deinterleave(z) == ((a, b)), s"($a,$b) -> $z")
    }
    assert(fromSpark.distinct.length == pairs.distinct.length)
  }

  test("interval coalescing: spans disjoint, cover preserved, idempotent") {
    val genIv = for {
      k <- Gen.chooseNum(1L, 3L)
      s <- Gen.chooseNum(0L, 100L)
      len <- Gen.chooseNum(1L, 40L)
    } yield (k, s, s + len)
    (0 until 6).foreach { round =>
      val ivs = (0 until 30).flatMap { i =>
        genIv(Gen.Parameters.default, Seed(round * 1000L + i))
      }.zipWithIndex.map { case ((k, s, e), id) => (k, id.toLong, s, e) }
      def merge(df: org.apache.spark.sql.DataFrame) = {
        val w1 = Window.partitionBy("k").orderBy("s", "id")
          .rowsBetween(Long.MinValue, -1)
        val w2 = Window.partitionBy("k").orderBy("s", "id")
          .rowsBetween(Long.MinValue, 0)
        df.withColumn("pmax", max(col("e")).over(w1))
          .withColumn("island",
            sum(when(col("pmax").isNull || col("s") > col("pmax"), 1L)
              .otherwise(0L)).over(w2))
          .groupBy("k", "island")
          .agg(min("s").as("s"), max("e").as("e"))
      }
      val spans = merge(ivs.toDF("k", "id", "s", "e"))
        .select("k", "s", "e").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // disjoint and strictly separated per key
      spans.groupBy(_._1).foreach { case (_, ss) =>
        ss.sortBy(_._2).sliding(2).foreach {
          case Array((_, _, e1), (_, s2, _)) => assert(s2 > e1)
          case _ =>
        }
      }
      // cover preserved: every input point set equals the span point set
      def points(rs: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
        rs.flatMap { case (k, s, e) => (s to e).map(k -> _) }.toSet
      assert(points(ivs.map { case (k, _, s, e) => (k, s, e) }) ==
        points(spans.toSeq))
      // idempotent: merging the merged spans changes nothing
      val again = merge(spans.toSeq.zipWithIndex
        .map { case ((k, s, e), id) => (k, id.toLong, s, e) }
        .toDF("k", "id", "s", "e"))
        .select("k", "s", "e").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(again.sorted.toSeq == spans.sorted.toSeq)
    }
  }

  test("sharded packing is shard-count invariant for generated workloads") {
    val genDoc = for {
      id <- Gen.chooseNum(0L, 500L)
      n <- Gen.chooseNum(1L, 300L)
    } yield (id, n)
    (0 until 3).foreach { round =>
      val docs = (0 until 80).flatMap { i =>
        genDoc(Gen.Parameters.default, Seed(round * 77L + i))
      }.groupBy(_._1).map { case (id, xs) => (id, xs.head._2) }.toSeq
      val tok = docs.toDF("doc_id", "n_tokens")
      val results = Seq(1, 2, 5, 13).map { nShards =>
        Extended.packSequences(tok, 64, nShards)
          .collect().map(_.toSeq).toSeq
      }
      assert(results.distinct.length == 1,
        s"shard-count-dependent packing in round $round")
    }
  }
}
