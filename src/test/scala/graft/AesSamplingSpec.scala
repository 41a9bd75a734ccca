package graft

import graft.ops.Extended9
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Law pins for the A-ES weighted sample (q182). The draw has no SQL
  * oracle by design (ln/pow keys are not cross-engine bit-exact), so
  * correctness is pinned by the DISTRIBUTIONAL laws the algorithm
  * guarantees, measured across independent seeds on planted weights.
  */
class AesSamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  // 20 items: id 0 carries weight 50, the rest weight 1
  private def planted = (0 to 19).map(i =>
    (i.toLong, if (i == 0) 50.0 else 1.0)).toDF("id", "w")

  private def draw(seed: Long, k: Int = 5): Set[Long] =
    Extended9.weightedSampleWithoutReplacement(planted, "id", "w", k, seed)
      .select("id").collect().map(_.getLong(0)).toSet

  test("exact k, distinct ids, deterministic under a fixed seed") {
    val s = Extended9
      .weightedSampleWithoutReplacement(planted, "id", "w", 5, 42L)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(s.length == 5 && s.distinct.length == 5)
    assert(draw(42L) == s.toSet, "same seed must reproduce the draw")
  }

  test("inclusion laws across seeds: heavy item near-always, light items symmetric") {
    val seeds = (1L to 40L)
    val draws = seeds.map(draw(_))
    // weight 50 vs 19× weight 1: the heavy item's key u^(1/50) is
    // near 1 for almost every u; P(excluded from a 5-of-20 draw) is
    // well under 5% — demand ≥ 36/40 inclusions
    val heavy = draws.count(_.contains(0L))
    assert(heavy >= 36, s"heavy item included only $heavy/40 times")
    // each light item: expected ≈ (5 − P_heavy)/19 ≈ 21% of seeds
    // (binomial sd ≈ 2.6 over 40) — generous [1, 20] band per item
    val lightCounts = (1L to 19L).map(id => draws.count(_.contains(id)))
    assert(lightCounts.forall(c => c >= 1 && c <= 20),
      s"light inclusion counts out of band: $lightCounts")
  }

  test("q182 over documents: exact k=100 distinct docs with true lengths") {
    val out = Extended9.q182WeightedSample(spark, SparkTest.sfDir).collect()
    assert(out.length == 100)
    val ids = out.map(_.getLong(0))
    assert(ids.distinct.length == 100)
    // weights republish the real document lengths (floor 1)
    val lens = Tables.documents(spark, SparkTest.sfDir)
      .select(col("doc_id"), greatest(length(col("text")), lit(1)).as("l"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.forall(r => r.getLong(1) == lens(r.getLong(0)).toLong))
  }
}
