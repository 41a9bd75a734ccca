package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Cross-implementation pins for the md5-rank sampling/split family
  * (q47 hash sample, q72 md5 sample, q94 train split, q129 epoch
  * shuffle, q136 stratified sample, q166 temperature sample) — the
  * Extended10PropertySpec/TextCrossImplSpec pattern: a generated
  * corpus runs through the Spark core AND an independent driver-side
  * reimplementation (Scala collections + java MessageDigest only),
  * outputs compared exactly. The shipped testdata's strata are all
  * comfortably sized; the corpora here are adversarial — a singleton
  * stratum, a two-doc stratum straddling the rank boundary, stratum
  * sizes at every ceil-(n/5) residue, and a language q47's rate map
  * doesn't know (exercising the default rate). These pins are what
  * verify the shardedMd5Rank decomposition (shard prefix + in-shard
  * rank + broadcast offsets ≡ one per-stratum (md5, id) rank) on
  * distributions the parquet tables never produce.
  */
class SamplingCrossImplSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Generated (doc_id, tag) corpus: a dominant tag, mid tags, plus
    * forced degenerate strata — a SINGLETON tag and a two-doc tag —
    * appended regardless of the draw. Ids are sparse (i·13+5) so md5
    * orderings interleave strata. */
  private def corpus(seed: Long, n: Int): Seq[(Long, String)] = {
    val tags = Vector("en", "en", "en", "en", "es", "es", "fr", "xx")
    val g = Gen.oneOf(tags)
    val base = (0 until n).map(i => (i.toLong * 13 + 5,
      g(Gen.Parameters.default, Seed(seed + i)).get))
    base ++ Seq((999983L, "solo"), (999991L, "duo"), (999997L, "duo"))
  }

  // ------------------------------------------------------------- q47
  test("q47 hash sample matches an independent reimplementation") {
    val docs = corpus(101L, 240)
    val got = graft.ops.TextOps.hashSample(docs.toDF("doc_id", "lang"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .toSeq
    val rates = Map("en" -> 50, "es" -> 30, "fr" -> 30, "de" -> 30)
    val expect = docs
      .map { case (id, l) =>
        (id, l, Integer.parseInt(md5hex(id.toString).substring(0, 4), 16) % 100) }
      .filter { case (_, l, b) => b < rates.getOrElse(l, 10) }
      .sortBy(_._1)
    assert(expect.exists(x => !rates.contains(x._2)),
      "corpus must exercise the default rate (lang outside the map)")
    assert(got == expect)
  }

  // ------------------------------------------------------------- q94
  test("q94 train split matches an independent reimplementation") {
    val docs = corpus(202L, 240)
    val got = graft.ops.Extended3.trainSplit(docs.toDF("doc_id", "source"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq
    def split(h4: String): String =
      if (h4 < "cccd") "train" else if (h4 < "e666") "val" else "test"
    val expect = docs
      .map { case (id, src) => (src, split(md5hex(id.toString).substring(0, 4))) }
      .groupBy(identity).toSeq
      .map { case ((src, sp), xs) => (src, sp, xs.size.toLong) }
      .sortBy(x => (x._1, x._2))
    assert(got == expect)
  }

  // ------------------------------------------------------------ q129
  test("q129 epoch shuffle matches an independent reimplementation") {
    val docs = corpus(303L, 240)
    val got = graft.ops.Extended4.epochShuffle(docs.toDF("doc_id", "lang"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val expect = docs.map(_._1)
      .map(id => (md5hex(id.toString), id))
      .groupBy(_._1.substring(0, 1)).toSeq
      .flatMap { case (sh, xs) =>
        xs.sortBy(x => (x._1, x._2)).zipWithIndex
          .map { case ((_, id), i) => (sh, (i + 1).toLong, id) } }
      .sortBy(x => (x._1, x._2))
    assert(got == expect)
  }

  // ------------------------------------------------------------ q136
  test("q136 stratified sample matches an independent reimplementation") {
    val docs = corpus(404L, 240)
    val got = graft.ops.Extended5.stratifiedSample(
        docs.toDF("doc_id", "lang"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .toSeq
    val expect = docs.groupBy(_._2).toSeq
      .flatMap { case (lang, xs) =>
        val sorted = xs.map(_._1).sortBy(id => (md5hex(id.toString), id))
        val take = (sorted.size + 4) / 5
        sorted.take(take).zipWithIndex
          .map { case (id, i) => (id, lang, i + 1) } }
      .sortBy(x => (x._2, x._3))
    // the singleton stratum must keep its one doc: ceil(1/5) = 1
    assert(expect.exists(_._2 == "solo"), "singleton stratum sampled")
    assert(got == expect)
  }

  // ------------------------------------------------------------ q166
  test("q166 temperature sample matches an independent reimplementation") {
    val docs = corpus(505L, 240)
    val got = graft.ops.Extended8.temperatureSample(
        docs.toDF("doc_id", "source"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getLong(3))).toSeq
    val bySrc = docs.groupBy(_._2)
    val w = bySrc.map { case (s, xs) =>
      s -> (xs.size.toLong, math.sqrt(xs.size.toDouble).toLong) }
    val wTot = w.values.map(_._2).sum
    val expect = bySrc.toSeq
      .flatMap { case (s, xs) =>
        val (n, ws) = w(s)
        val budget = math.min(100L * ws / wTot, n)
        val sorted = xs.map(_._1).sortBy(id => (md5hex(id.toString), id))
        sorted.take(budget.toInt).zipWithIndex
          .map { case (id, i) => (s, id, i + 1, budget) } }
      .sortBy(x => (x._1, x._3))
    // √-damping must over-represent small sources: the two-doc
    // stratum's budget share (if any) exceeds its corpus share, and
    // some budget is capped by n_s (the least() arm is exercised)
    assert(expect.exists(x => x._4 == w(x._1)._1),
      "some source must be budget-capped at its own size")
    assert(got == expect)
  }

  // ------------------------------------------------------------ q122
  test("q122 PPS sample matches an independent reimplementation") {
    // adversarial weights: zeros (never sampled), a giant doc spanning
    // many strides (n_hits > 1 — systematic PPS samples it repeatedly),
    // ordinary docs
    val g = Gen.chooseNum(0L, 50L)
    val docs = (0 until 200).map(i => (i.toLong * 11 + 3,
        g(Gen.Parameters.default, Seed(606L + i)).get)) ++
      Seq((100003L, 0L), (100019L, 5000L), (100043L, 0L))
    val got = graft.ops.Extended4.ppsSample(docs.toDF("doc_id", "w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val total = docs.map(_._2).sum
    val stride = math.max(1L, total / 20)
    var cum = 0L
    val expect = docs.sortBy(_._1).map { case (id, w) =>
      cum += w
      (id, w, cum, cum / stride - (cum - w) / stride)
    }.filter(_._4 > 0)
    assert(expect.exists(_._4 > 1), "giant doc must be sampled repeatedly")
    assert(got == expect)
  }

  test("q122 PPS sample stride-1 guard on a total < k corpus") {
    // total weight below k=20: stride clamps to 1 and every doc is
    // sampled w times (the div-0 guard regime, ADVICE r4)
    val docs = Seq((3L, 1L), (17L, 0L), (29L, 2L), (41L, 1L), (53L, 3L))
    val got = graft.ops.Extended4.ppsSample(docs.toDF("doc_id", "w"))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got == Seq((3L, 1L), (29L, 2L), (41L, 1L), (53L, 3L)))
  }

  // ------------------------------------------------------------ q126
  test("q126 source cap matches an independent reimplementation") {
    val docs = corpus(707L, 240)
    val got = graft.ops.Extended4.sourceCap(docs.toDF("doc_id", "source"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    def h48(id: Long): Long =
      java.lang.Long.parseLong(md5hex(id.toString).substring(0, 12), 16)
    val expect = docs.groupBy(_._2).toSeq
      .flatMap { case (src, xs) =>
        xs.map(_._1).sortBy(id => (h48(id), id)).take(10).zipWithIndex
          .map { case (id, i) => (src, (i + 1).toLong, id) } }
      .sortBy(x => (x._1, x._2))
    // under-cap sources keep everything: solo keeps 1, duo keeps 2
    assert(expect.count(_._1 == "solo") == 1 &&
      expect.count(_._1 == "duo") == 2)
    assert(got == expect)
  }

  // ------------------------------------------------------------- q72
  test("q72 md5 sample matches an independent reimplementation") {
    // synthetic customers: a large segment, a singleton (rnk 1 only),
    // and a two-customer segment (both kept — the ≤2 boundary exactly)
    val cust = (0 until 150).map(i =>
        (i.toLong * 7 + 2, s"cust#$i", if (i % 3 == 0) "AUTO" else "BIKE")) ++
      Seq((500009L, "solo-cust", "SOLO"),
        (500023L, "duo-a", "DUO"), (500027L, "duo-b", "DUO"))
    val got = graft.ops.Extended2.md5Sample(
        cust.toDF("c_custkey", "c_name", "c_mktsegment"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4))).toSeq
    val expect = cust.groupBy(_._3).toSeq
      .flatMap { case (seg, xs) =>
        xs.map(c => (md5hex(c._1.toString), c._1, c._2))
          .sortBy(x => (x._1, x._2)).take(2).zipWithIndex
          .map { case ((h, key, name), i) =>
            (seg, (i + 1).toLong, key, name, h) } }
      .sortBy(x => (x._1, x._2))
    assert(expect.count(_._1 == "SOLO") == 1 &&
      expect.count(_._1 == "DUO") == 2)
    assert(got == expect)
  }
}
