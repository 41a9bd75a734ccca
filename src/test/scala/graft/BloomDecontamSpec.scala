package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Cross-implementation pins for q193 Bloom 13-gram decontamination:
  * generated corpora run through the Spark core AND an independent
  * driver-side reimplementation (Scala collections + java
  * MessageDigest only — no shared code with the operator), outputs
  * compared exactly. The corpora are adversarial where the testdata
  * is not: planted verbatim 13-token windows (true positives), a
  * benchmark-free corpus (empty filter), a 13-token boundary doc,
  * and a deliberately UNDERSIZED filter (m = 64) whose false
  * positives are real — the pin proves Spark and the
  * reimplementation produce the SAME false positives, which is the
  * property the DuckDB oracle relies on. The no-false-NEGATIVE law
  * (Bloom flags ⊇ exact 13-gram matches) is asserted separately
  * against a from-scratch exact matcher.
  */
class BloomDecontamSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // --- independent reimplementation (mirrors the q193 CONTRACT, not
  // --- its code: tokenize, distinct sliding 13-grams, one 60-bit md5
  // --- prefix split h1/h2, Kirsch–Mitzenmacher positions, bitset)
  private def toks(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z]+").toSeq.filter(_.nonEmpty)
  private def grams13(text: String): Seq[String] = {
    val t = toks(text)
    if (t.size < 13) Nil else t.sliding(13).map(_.mkString(" ")).toSeq.distinct
  }
  private def positions(g: String, m: Long): Seq[Long] = {
    val h = java.lang.Long.parseLong(md5hex(g).substring(0, 15), 16)
    val h1 = h >>> 30
    val h2 = (h % 1073741824L) | 1L
    (0L to 3L).map(j => (h1 + j * h2) % m)
  }
  private def reimpl(docs: Seq[(Long, String)], m: Long): Seq[(Long, Long)] = {
    val bits = docs.filter(_._1 % 97 == 0)
      .flatMap(d => grams13(d._2)).distinct
      .flatMap(positions(_, m)).toSet
    docs.flatMap { case (id, text) =>
      val nh = grams13(text).count(g => positions(g, m).forall(bits))
      if (nh > 0) Some((id, nh.toLong)) else None
    }.sortBy(_._1)
  }

  private def run(docs: Seq[(Long, String)], m: Int): Seq[(Long, Long)] =
    graft.ops.Extended10.bloomDecontaminate(
        docs.toDF("doc_id", "text"), mBits = Some(m))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  /** Word-soup corpus with planted contamination: benchmark docs at
    * ids divisible by 97; `planted` docs embed a verbatim 13-token
    * window copied from a benchmark doc between random padding. */
  private def corpus(seed: Long): Seq[(Long, String)] = {
    val vocab = Vector("alpha", "bravo", "carol", "delta", "echoes",
      "foxtrot", "golf", "hotel", "india", "julie", "kilo", "lima",
      "mike", "november", "oscar", "papa", "quebec", "romeo")
    def words(n: Int, s: Long): Seq[String] =
      (0 until n).map(i => Gen.oneOf(vocab)(
        Gen.Parameters.default, Seed(s + i)).get)
    val benchA = (97L, words(30, seed).mkString(" "))
    val benchB = (194L, words(25, seed + 1000).mkString(" "))
    val window = toks(benchA._2).slice(8, 21) // 13 contiguous tokens
    val plantedMid = (11L,
      (words(5, seed + 2000) ++ window ++ words(4, seed + 3000)).mkString(" "))
    val plantedExact = (23L, window.mkString(" "))    // exactly 13 tokens
    val tooShort = (31L, toks(benchA._2).slice(8, 20).mkString(" ")) // 12
    val clean = (0 until 40).map(i =>
      (200L + i * 3, words(20, seed + 10000 + i * 100).mkString(" ")))
    Seq(benchA, benchB, plantedMid, plantedExact, tooShort) ++ clean
  }

  test("q193 matches an independent reimplementation (planted contamination)") {
    val docs = corpus(424L)
    val got = run(docs, 131072)
    val expect = reimpl(docs, 131072L)
    // the planted docs and the benchmark docs themselves must flag
    assert(Seq(11L, 23L, 97L, 194L).forall(id => expect.exists(_._1 == id)))
    // the 12-token prefix doc cannot contain any 13-gram
    assert(!expect.exists(_._1 == 31L))
    assert(got == expect)
  }

  test("q193 never misses an exact 13-gram match (no-false-negative law)") {
    val docs = corpus(777L)
    val flagged = run(docs, 131072).map(_._1).toSet
    // from-scratch exact matcher: docs sharing ANY 13-gram with bench
    val bench = docs.filter(_._1 % 97 == 0).flatMap(d => grams13(d._2)).toSet
    val exact = docs.filter(d => grams13(d._2).exists(bench)).map(_._1).toSet
    assert(exact.subsetOf(flagged),
      s"missed exact matches: ${exact -- flagged}")
  }

  test("q193 with an undersized filter reproduces the SAME false positives") {
    // m = 64 bits over dozens of benchmark grams: heavy saturation,
    // most clean grams collide into set bits — the regime where a
    // semantic mismatch between engines would surface instantly
    val docs = corpus(515L)
    val got = run(docs, 64)
    val expect = reimpl(docs, 64L)
    val exact = {
      val bench = docs.filter(_._1 % 97 == 0).flatMap(d => grams13(d._2)).toSet
      docs.filter(d => grams13(d._2).exists(bench)).map(_._1).toSet
    }
    assert(expect.map(_._1).toSet.diff(exact).nonEmpty,
      "undersized filter must produce real false positives")
    assert(got == expect)
  }

  test("q193 with no benchmark docs flags nothing") {
    val docs = corpus(606L).filter(_._1 % 97 != 0)
    assert(run(docs, 131072).isEmpty)
  }

  test("bloomSizeBits: next-pow-2 of 32·grams, clamped to [2^17, 2^27]") {
    import graft.ops.Extended10.bloomSizeBits
    // floor regime (incl. the empty benchmark) and its exact boundary:
    // 32·4096 = 2^17 stays at the floor, one more gram doubles
    assert(bloomSizeBits(0L) == 131072)
    assert(bloomSizeBits(1L) == 131072)
    assert(bloomSizeBits(4096L) == 131072)
    assert(bloomSizeBits(4097L) == 262144)
    // interior: exact power stays, +1 rounds up
    assert(bloomSizeBits(1L << 15) == (1 << 20))
    assert(bloomSizeBits((1L << 15) + 1) == (1 << 21))
    // cap boundary: 32·2^22 = 2^27 is the last unclamped width
    assert(bloomSizeBits(1L << 22) == (1 << 27))
    assert(bloomSizeBits((1L << 22) + 1) == (1 << 27))
    assert(bloomSizeBits(1000000000L) == (1 << 27))
    // every width divides into longs (BitsetAgg's unit)
    Seq(0L, 3L, 4097L, 999999L).foreach(n =>
      assert(bloomSizeBits(n) % 64 == 0))
  }

  test("saturation regime: benchmark-sized m stays selective where 2^17 saturates") {
    // The regime the r9 1000× probe exposed: a benchmark with ≫4096
    // distinct grams fills a fixed 2^17-bit filter (fill → 1, FP → 1,
    // every doc flags). Vocabularies are DISJOINT by construction
    // (benchmark words start 'a', clean words start 'n'), so every
    // flagged clean doc is a Bloom false positive, exactly countable.
    // All hashing is deterministic (md5 over a seeded corpus), so the
    // FP counts below are pins, not expectations.
    def word(prefix: Char, base: Char, i: Int): String =
      prefix +: Seq(i / 169 % 13, i / 13 % 13, i % 13)
        .map(d => (base + d).toChar).mkString
    val rnd = new scala.util.Random(193L)
    def text(vocab: Int => String, n: Int): String =
      Seq.fill(n)(vocab(rnd.nextInt(2000))).mkString(" ")
    val vocabA = (i: Int) => word('a', 'a', i) // benchmark + planted window
    val vocabB = (i: Int) => word('n', 'n', i) // clean docs
    val bench = Seq(97L, 194L, 291L).map(id => (id, text(vocabA, 10000)))
    val window = toks(bench.head._2).slice(100, 113)
    val planted = (11L,
      (toks(text(vocabB, 6)) ++ window ++ toks(text(vocabB, 5))).mkString(" "))
    val clean = (0 until 60).map(i => (200L + 3 * i, text(vocabB, 40)))
    val docs = bench ++ Seq(planted) ++ clean
    val nGrams = bench.flatMap(d => grams13(d._2)).distinct.size.toLong
    val m = graft.ops.Extended10.bloomSizeBits(nGrams)
    assert(nGrams > 4096L && m > 131072,
      s"regime precondition: $nGrams grams must outgrow the floor (m=$m)")
    val auto = graft.ops.Extended10.bloomDecontaminate(
        docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val fixed = run(docs, 131072)
    // cross-impl pins hold in BOTH regimes — the filter is exact about
    // its own false positives at any width
    assert(auto == reimpl(docs, m.toLong))
    assert(fixed == reimpl(docs, 131072L))
    // true positives flag at either width
    Seq(11L, 97L, 194L, 291L).foreach { id =>
      assert(auto.exists(_._1 == id) && fixed.exists(_._1 == id))
    }
    val cleanIds = clean.map(_._1).toSet
    val autoFp = auto.count(r => cleanIds(r._1))
    val fixedFp = fixed.count(r => cleanIds(r._1))
    assert(fixedFp >= 30,
      s"fixed 2^17 must saturate on this benchmark (flagged $fixedFp/60 clean)")
    assert(autoFp <= 5,
      s"benchmark-sized m=$m must stay selective (flagged $autoFp/60 clean)")
  }

  test("q193 degenerate: every doc is benchmark — each flags itself exactly") {
    // all ids ≡ 0 (mod 97): the filter holds the union of ALL grams,
    // so every ≥13-token doc must flag with n_hits == its own distinct
    // gram count (its grams are in the filter by construction), and
    // every <13-token doc has no gram to probe and must not appear.
    // Auto-sizing replays over the same inputs (reimpl at the width
    // bloomSizeBits computes from the all-docs benchmark).
    val docs = corpus(909L).zipWithIndex
      .map { case ((_, t), i) => (i.toLong * 97, t) }
    val nGrams = docs.flatMap(d => grams13(d._2)).distinct.size.toLong
    val m = graft.ops.Extended10.bloomSizeBits(nGrams)
    val auto = graft.ops.Extended10.bloomDecontaminate(
        docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(auto == reimpl(docs, m.toLong))
    val withGrams = docs.filter(d => grams13(d._2).nonEmpty)
    assert(withGrams.size < docs.size,
      "corpus must include a <13-token doc (the no-gram path)")
    withGrams.foreach { case (id, t) =>
      assert(auto.contains((id, grams13(t).size.toLong)),
        s"benchmark doc $id must flag itself with its full gram count")
    }
    assert(auto.size == withGrams.size)
  }

  test("q193 degenerate: single-gram benchmark at the floor width") {
    // the smallest possible benchmark: ONE 13-token doc = ONE gram;
    // sizing clamps to the 2^17 floor, a verbatim copy flags with
    // n_hits = 1, and a 13-token near-miss (last token differs) or a
    // 12-token prefix must not flag (at 4 set bits of 2^17 the FP term
    // is deterministic-zero on this corpus, so the flag set is exact)
    val window = "alpha bravo carol delta echoes foxtrot golf hotel " +
      "india julie kilo lima mike"
    assert(grams13(window).size == 1)
    val bench = (97L, window)
    val planted = (5L, s"zulu $window yankee")
    val tooShort = (7L, window.split(" ").take(12).mkString(" "))
    val nearMiss = (9L, window.split(" ").take(12).mkString(" ") + " oscar")
    val clean = (0 until 20).map(i =>
      (101L + 2 * i, corpus(333L + i).drop(5).head._2))
    val docs = Seq(bench, planted, tooShort, nearMiss) ++ clean
    assert(graft.ops.Extended10.bloomSizeBits(1L) == 131072)
    val auto = graft.ops.Extended10.bloomDecontaminate(
        docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(auto == reimpl(docs, 131072L))
    assert(auto.toSet == Set((97L, 1L), (5L, 1L)),
      s"exactly the benchmark and its verbatim copy must flag: $auto")
  }

  test("q193 adversarial unicode: engine and reimpl tokenize identically") {
    // The tokenizer contract is lower + split on [^a-z]+: EVERYTHING
    // non-a-z — digits, punctuation, CJK, emoji (astral-plane
    // surrogate pairs), full-width letters, combining marks, ß, İ —
    // is a separator, and A-Z case-folds in. This corpus plants the
    // same 13-token window three ways (unicode-noise separators,
    // UPPER-case, wrapped in hostile codepoints); Spark's
    // lower()+regexp split and the JVM reimplementation must produce
    // the IDENTICAL flag set, pinning the two tokenizers against each
    // other exactly where full-vs-simple case mapping and surrogate
    // handling could diverge.
    val window = "alpha bravo carol delta echoes foxtrot golf hotel " +
      "india julie kilo lima mike"
    val bench = (97L, s"Начало ${window} 終わり")   // noise-wrapped bench
    val noiseSep = (5L, "x1" + window.split(" ").mkString("🚀") + "2y")
    val upper = (7L, window.toUpperCase)
    val hostile = (9L, s"İstanbul $window ß ＡＢＣ")
    val cjkOnly = (11L, "漢字テスト 🎉🎉 12345 ＡＢＣ ≠≠≠")
    val clean = (0 until 10).map(i =>
      (101L + 2 * i, s"§${corpus(555L + i).drop(5).head._2}✓"))
    val docs = Seq(bench, noiseSep, upper, hostile, cjkOnly) ++ clean
    val auto = graft.ops.Extended10.bloomDecontaminate(
        docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(auto == reimpl(docs, 131072L))
    val flagged = auto.map(_._1).toSet
    assert(Set(97L, 5L, 7L, 9L).subsetOf(flagged),
      s"every planted variant must flag through the unicode noise: $auto")
    assert(!flagged.contains(11L), "a doc with no a-z token has no gram")
  }

  test("q193 auto-sizing equals the explicit width it computes") {
    // the declared query passes mBits = None; the result must be
    // byte-identical to pinning the width bloomSizeBits picks (and to
    // the reimplementation at that width) — i.e. auto-sizing changes
    // WHO computes m, never the answer
    val docs = corpus(848L)
    val nGrams = docs.filter(_._1 % 97 == 0)
      .flatMap(d => grams13(d._2)).distinct.size.toLong
    val m = graft.ops.Extended10.bloomSizeBits(nGrams)
    assert(m == 131072) // word-soup benchmark ≪ 4096 grams → floor
    val auto = graft.ops.Extended10.bloomDecontaminate(
        docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(auto == run(docs, m))
    assert(auto == reimpl(docs, m.toLong))
  }
}
