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

  test("q126: map-side TopKAgg cap equals the window row_number formulation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // the window version is the obvious-but-skew-fragile formulation;
    // the aggregator must agree with it EXACTLY (same hash order, same
    // doc_id tiebreak) while never sorting a whole source partition
    val w = Window.partitionBy("source")
      .orderBy(substring(md5(col("doc_id").cast("string").cast("binary")),
        1, 12), col("doc_id"))
    val expect = Tables.documents(spark, dir)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 10)
      .select("source", "rnk", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = Extended4.q126SourceCap(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect && got.nonEmpty)
    // the cap is a cap
    got.groupBy(_._1).foreach { case (_, rows) => assert(rows.size <= 10) }
  }

  test("q127: OOV counts are consistent and the vocab actually covers tokens") {
    val rows = Extended4.q127OovScore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, oov, rate) =>
      assert(oov >= 0 && oov <= n)
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // the synthetic corpus draws from a small shared vocabulary, so the
    // top-50 list must cover most tokens of most documents — a
    // regression where the vocab join silently misses (e.g. a
    // tokenization mismatch between the vocab and scoring passes) would
    // push every rate to 1.0
    val meanRate = rows.map(_._4).sum / rows.length
    assert(meanRate < 0.5, s"mean OOV rate $meanRate — vocab join broken?")
  }

  test("q128: duplicate-gram counts bounded; shared-vocab corpus has dups") {
    val rows = Extended4.q128DupGramRate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, dup, rate) =>
      assert(n >= 1 && dup >= 0 && dup <= n)
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // 3-grams over a ~40-word vocabulary collide across documents with
    // near-certainty at any sf — zero duplicate grams corpus-wide means
    // the doc-frequency join matched nothing
    assert(rows.map(_._3).sum > 0, "no inter-document duplicate grams found")
  }

  test("q129: epoch shuffle is a balanced, contiguous, deterministic order") {
    val rows = Extended4.q129EpochShuffle(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // a permutation of the corpus: every doc exactly once
    assert(rows.map(_._3).distinct.length == rows.length)
    // positions are 1..|shard| with no gaps (resumability contract)
    rows.groupBy(_._1).foreach { case (s, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq,
        s"shard $s has position gaps")
    }
    // md5 equidistributes: no shard more than 3x the mean (16 shards
    // over >=500 docs — a skewed shard means the hash bucketing broke)
    val sizes = rows.groupBy(_._1).map(_._2.size)
    assert(sizes.max <= 3 * (rows.length / 16).max(1),
      s"shard sizes $sizes not balanced")
    // deterministic: a second run is bit-identical
    val again = Extended4.q129EpochShuffle(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == rows.toSeq)
  }
}
