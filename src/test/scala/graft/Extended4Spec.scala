package graft

import graft.ops.Extended4
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q121–q125 structural laws (values are oracle-checked; these pin the
  * properties that make each op trustworthy). */
class Extended4Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val dir: String = SparkTest.sfDir

  test("q122: the k stride boundaries land exactly once each (Σ n_hits = k)") {
    // stride = total div k ⇒ every boundary i·stride (i = 1..k) is ≤ total
    // and falls in exactly one document's (cum−w, cum] interval — the
    // PPS invariant that makes the sample size exact, not approximate
    val hits = Extended4.q122PpsSample(spark, dir).collect()
    assert(hits.map(_.getLong(3)).sum == 20L)
    // multiplicity only for docs spanning several boundaries
    hits.foreach(r => assert(r.getLong(3) >= 1))
  }

  test("q125: prefix filtering loses no planted near-duplicate pair") {
    // every planted (doc, doc+1e6) suffix copy has Jaccard well above
    // 0.6, so the PPJoin prefix rule MUST propose and keep it — a
    // missing pair means the candidate rule dropped a true match
    // (false negatives are the one thing prefix filtering promises not
    // to have)
    val pairs = Extended4.q125SetSimJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val planted = pairs.filter(p => p._2 == p._1 + 1000000L)
    val nDocs = Tables.documents(spark, dir)
      .filter(org.apache.spark.sql.functions
        .size(org.apache.spark.sql.functions.filter(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.lower(
              org.apache.spark.sql.functions.col("text")), "[^a-z]+"),
          x => x =!= "")) >= 3)
      .count()
    assert(planted.length >= (nDocs * 9) / 10,
      s"prefix filter kept ${planted.length} of $nDocs planted pairs")
    planted.foreach(p => assert(p._3 >= 0.6 && p._3 <= 1.0))
  }

  test("q123: slope columns are finite (exact sums never overflow to null)") {
    val rows = Extended4.q123RegrTrend(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(!r.isNullAt(2), s"null slope for ${r.getString(0)}")
      assert(!r.getDouble(2).isNaN && !r.getDouble(2).isInfinite)
    }
  }
}
