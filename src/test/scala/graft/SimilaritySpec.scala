package graft

import graft.ops.{MinHashAgg, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Correctness for the sketch-based ops (q25/q38/q39) that have no DuckDB
  * oracle: planted duplicates must be found, the ANN path must agree with
  * brute force on what it returns, and the MinHash aggregate must be an
  * elementwise min. Runs on sf0.001. */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val dir: String = SparkTest.sfDir

  test("MinHashAgg: reduce/merge are elementwise min") {
    val agg = new MinHashAgg(4)
    val b = agg.reduce(agg.zero, Seq(5L, 7L, 1L, 9L))
    val b2 = agg.reduce(b, Seq(6L, 2L, 3L, 9L))
    assert(b2.toSeq == Seq(5L, 2L, 1L, 9L))
    val m = agg.merge(Array(4L, 8L, 0L, 9L), b2)
    assert(m.toSeq == Seq(4L, 2L, 0L, 9L))
  }

  test("minhash: codegen'd column path equals the Aggregator path") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text").limit(50)
    val fast = Similarity.minhashSignatures(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agg = Similarity.minhashSignaturesAgg(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fast == agg)
  }

  test("q25: LSH recovers nearly all planted near-duplicate pairs") {
    val pairs = Similarity.q25NearDup(spark, dir).collect()
    val planted = pairs.count(r => r.getLong(1) == r.getLong(0) + 1000000L)
    assert(planted >= 450, s"found only $planted of 500 planted pairs")
    // estimates are valid jaccard estimates
    pairs.foreach { r =>
      val e = r.getDouble(2)
      assert(e >= 0.5 && e <= 1.0)
    }
  }

  test("q25 twins: fast and portable instances agree on the planted corpus") {
    // Two declared MinHash instances over the same architecture: the
    // splitmix64 fast path (nearDupPairs — the pipeline default) and the
    // portable md5 path (q25 — the oracle-checkable one). Different hash
    // families make different banding luck on borderline pairs, so the
    // pin is the honest law, not set identity (measured at sf0.1:
    // |sym-diff| ≈ 3% of ~5.8k pairs; MinhashTwinBench): each instance
    // recovers ≥90% of the planted pairs, and the two pair sets overlap
    // on ≥90% of their union.
    val base = Tables.documents(spark, dir).select("doc_id", "text")
    val corpus = base.unionByName(base.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" planted near duplicate suffix")).as("text")))
    val fast = Similarity.nearDupPairs(corpus)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val port = Similarity.q25NearDup(spark, dir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nDocs = base.count()
    def plantedIn(s: Set[(Long, Long)]) =
      s.count { case (a, b) => b == a + 1000000L }
    assert(plantedIn(fast) >= (nDocs * 9) / 10,
      s"fast instance planted recall: ${plantedIn(fast)} of $nDocs")
    assert(plantedIn(port) >= (nDocs * 9) / 10,
      s"portable instance planted recall: ${plantedIn(port)} of $nDocs")
    val overlap = (fast & port).size.toDouble / (fast | port).size
    assert(overlap >= 0.9, s"instance pair-set overlap only $overlap")
  }

  test("q26: returns 10 rows, descending, cosine in [-1,1]") {
    val rows = Similarity.q26CosineTopK(spark, dir).collect()
    assert(rows.length == 10)
    val sims = rows.map(_.getDouble(1))
    assert(sims.sameElements(sims.sortBy(-_)))
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
  }

  test("q38: ANN results are true cosines and overlap brute-force top-10") {
    val ann = Similarity.q38AnnLsh(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ann.nonEmpty && ann.size <= 10)
    val brute = Similarity.q26CosineTopK(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // every ANN candidate's cosine equals the brute-force value for that id
    val all = graft.Tables.embeddings(spark, dir).count()
    ann.foreach { case (id, c) =>
      brute.get(id).foreach(b => assert(math.abs(b - c) < 1e-9)) }
    // LSH with 4 bands on the fixed seed recovers at least part of the true top-k
    assert(ann.keySet.intersect(brute.keySet).nonEmpty,
      s"ANN top-10 disjoint from brute-force top-10 (corpus $all)")
  }

  test("q45: IVF probe returns true cosines and overlaps brute-force top-10") {
    val ivf = Similarity.q45AnnIvf(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ivf.nonEmpty && ivf.size <= 10)
    val brute = Similarity.q26CosineTopK(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // IVF never invents similarities: every returned cosine is the exact one
    ivf.foreach { case (id, c) =>
      brute.get(id).foreach(b => assert(math.abs(b - c) < 1e-9)) }
    // recall floor vs brute force with the TRAINED quantizer (k-means
    // cells, 4 of 16 probed) — was `nonEmpty` with data-sampled centroids
    val recall = ivf.keySet.intersect(brute.keySet).size
    assert(recall >= 5, s"IVF recall $recall/10 vs brute-force top-10")
  }

  test("q39: finds exactly the planted scaled-copy pairs at 0.9999") {
    val rows = Similarity.q39EmbedNearDup(spark, dir).collect()
    val planted = rows.filter(r => r.getLong(1) == r.getLong(0) + 1000000L)
    assert(planted.length == 500, s"planted found: ${planted.length}")
    planted.foreach(r => assert(r.getDouble(2) >= 0.9999))
  }

  test("q39 candidates: a planted hot cone stays O(n·bands), not quadratic") {
    // 10^4 vectors in the all-positive cone (pairwise cosine ≈ 0.75):
    // they agree on any COARSE sign pattern, so round 3's full-16-bit
    // bucket key co-bucketed nearly all of them — ~C(n,2) ≈ 5·10^7
    // candidate pairs. A 32-bit band must agree on 32 fine signs
    // (per-band odds ≈ 2·10^-4 at cosine 0.75), so candidates stay a
    // small multiple of n across all 4 bands.
    val n = 10000
    val cone = spark.range(1, n + 1).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        j => (pmod(xxhash64(col("id") * 64 + j), lit(1000)) + 1) / 1000.0)
        .as("e"))
    val candidates = Similarity.embedCandidates(cone).count()
    assert(candidates < 40L * n,
      s"candidate blowup: $candidates pairs for $n cone vectors")
    assert(candidates > 0, "cone produced no candidates at all")
  }

  test("q41: SimHash finds most planted 1-token-suffix copies, no far pairs") {
    val rows = Similarity.q41SimHash(spark, dir).collect()
    val planted = rows.count(r => r.getLong(1) == r.getLong(0) + 1000000L)
    assert(planted >= 250, s"simhash found only $planted of 500 planted pairs")
    rows.foreach(r => assert(r.getInt(2) <= 7))
  }

  test("q175: source matrix aggregates exactly the unplanted q25-style pairs") {
    val rows = Similarity.q175SourceOverlap(spark, dir).collect()
    assert(rows.nonEmpty, "synthetic corpus should contain organic near-dups")
    rows.foreach { r =>
      assert(r.getString(0) <= r.getString(1), "source pair must be ordered")
      assert(r.getLong(2) > 0L)
    }
  }

  test("q42: exact jaccard on LSH candidates recovers planted pairs with high J") {
    val rows = Similarity.q42NgramJaccard(spark, dir).collect()
    val planted = rows.filter(r => r.getLong(1) == r.getLong(0) + 1000000L)
    assert(planted.length >= 450, s"found only ${planted.length} of 500")
    // suffix adds ≤4 shingles to ~50+: true J must be well above threshold
    planted.foreach(r => assert(r.getDouble(2) > 0.5 && r.getDouble(2) <= 1.0))
  }

  test("q153: incremental dedup routes each new doc to its true source") {
    val rows = Similarity.q153IncrementalDedup(spark, dir).collect()
    // every new id is ≥ 1e6, every match is an existing doc, one row per
    // new doc (the best-match window guarantees uniqueness)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getLong(0) >= 1000000L && r.getLong(1) < 1000000L)
      assert(r.getDouble(2) >= 0.5 && r.getDouble(2) <= 1.0)
    }
    // planted truth: new doc d + 1e6 is a suffix-perturbed copy of d —
    // the best existing match must be d itself for nearly all
    val correct = rows.count(r => r.getLong(1) == r.getLong(0) - 1000000L)
    assert(correct >= (rows.length * 9) / 10,
      s"only $correct of ${rows.length} matched their true source")
    assert(rows.length >= 400, s"batch recall too low: ${rows.length} of 500")
  }

  test("q164: cluster mass equals the docs touched by pairs; stars collapse") {
    val clusters = Similarity.q164DupClusters(spark, dir).collect()
    val pairs = Similarity.q25NearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val touched = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    assert(clusters.map(_.getLong(1)).sum == touched.length,
      "every doc in a pair lands in exactly one cluster")
    // the planted graph is star-shaped (orig, orig+1e6): clusters are
    // overwhelmingly size-2 pairs headed by an ORIGINAL id (a copy can
    // only head a cluster in the rare case where its own original pair
    // fell below the estimate threshold but a copy-copy pair did not)
    assert(clusters.count(_.getLong(1) == 2L) > clusters.length / 2)
    val copyHeaded = clusters.count(_.getLong(0) >= 1000000L)
    assert(copyHeaded <= clusters.length / 10,
      s"$copyHeaded of ${clusters.length} clusters headed by a copy")
  }

  test("q25 recall law: every exact-Jaccard pair q42 confirms appears in q25") {
    // q42 computes TRUE Jaccard ≥ 0.5 on the shared band candidates;
    // q25 keeps the signature ESTIMATE ≥ 0.5 on the same candidates.
    // This is the cross-validated recall floor (VERDICT r3 item 5): a
    // law over the full output, not a planted sample.
    val est = Similarity.q25NearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.q42NgramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = exact -- est
    assert(missed.isEmpty,
      s"q25 missed ${missed.size} true-Jaccard pairs, e.g. ${missed.take(5)}")
  }

  test("q183: star collapse equals pair collapse on a clustered corpus") {
    import spark.implicits._
    // 20 clusters × 5 suffix-perturbed members, disjoint per-cluster
    // vocabulary — the boilerplate regime the star tier exists for.
    // Law: star candidates (O(n·bands)) and full pair enumeration
    // (O(n·c)) collapse to the SAME (rep, cluster_size) groups.
    // tokenization keeps [a-z] runs ONLY — digits split words, so the
    // vocabulary must be letters (digit ids would collapse every
    // cluster's text to the same "w x w x ..." token stream)
    def alpha(n: Int): String = n.toString.map(d => ('a' + (d - '0')).toChar)
    val docs = (for {
      cid <- 0 until 20
      rep <- 0 until 5
    } yield {
      val base = (0 until 30).map(j => s"w${alpha(cid)}x${alpha(j)}").mkString(" ")
      (cid * 100L + rep,
        if (rep == 0) base else s"$base zz${alpha(rep)}")
    }).toDF("doc_id", "text")
    val star = Similarity.starCollapse(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // pair-collapse twin (q164's rule) on the full pair enumeration
    val pairs = Similarity.portablePairs(docs).select("a_id", "b_id")
    val members = pairs.select(explode(array(
      struct(col("a_id").as("doc_id"), col("b_id").as("peer")),
      struct(col("b_id").as("doc_id"), col("a_id").as("peer")),
      struct(col("a_id").as("doc_id"), col("a_id").as("peer")),
      struct(col("b_id").as("doc_id"), col("b_id").as("peer")))).as("m"))
      .select(col("m.doc_id").as("doc_id"), col("m.peer").as("peer"))
    val pair = members.groupBy("doc_id").agg(min("peer").as("rep"))
      .groupBy("rep").agg(count(lit(1)).as("cluster_size")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(star == pair,
      s"star ${star.size} groups vs pair ${pair.size}: sym-diff ${
        (star diff pair) ++ (pair diff star)}")
    // the clusters themselves: every cluster collapses to its min id
    assert(star.count { case (rep, n) => rep % 100 == 0 && n >= 4 } >= 18,
      s"expected ~20 five-doc clusters, got $star")
  }

  test("q183: under-merges but never over-merges vs pair collapse on chains") {
    import spark.implicits._
    // A–B similar, B–C similar, A–C not: pair collapse may link all
    // three through B; the star tier guarantees it never merges MORE
    // than the pair graph does (its edges are a subset) — the law that
    // makes it a safe dedup substitute (it only keeps extra docs).
    def alpha(n: Int): String = n.toString.map(d => ('a' + (d - '0')).toChar)
    val words = (0 until 50).map(j => s"ch${alpha(j)}")
    val docs = Seq(
      (1L, words.slice(0, 30).mkString(" ")),
      (2L, words.slice(10, 40).mkString(" ")),
      (3L, words.slice(20, 50).mkString(" "))
    ).toDF("doc_id", "text")
    val starDocs = Similarity.starCollapse(docs)
      .agg(coalesce(sum("cluster_size"), lit(0L))).collect()(0).getLong(0)
    val pairTouched = Similarity.portablePairs(docs).select("a_id", "b_id")
      .select(explode(array(col("a_id"), col("b_id"))).as("doc_id"))
      .distinct().count()
    assert(starDocs <= pairTouched,
      s"star collapsed $starDocs docs > pair graph's $pairTouched")
  }

  test("winnowing: doc shares fingerprints with its extended copy, not with others") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again PLUS EXTRA TAIL"),
      (3L, "completely different content with no overlap whatsoever here"))
      .toDF("doc_id", "text")
    val fps = Similarity.winnowFingerprints(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val j12 = fps(1L).intersect(fps(2L)).size.toDouble / fps(1L).union(fps(2L)).size
    val j13 = fps(1L).intersect(fps(3L)).size.toDouble / fps(1L).union(fps(3L)).size
    assert(j12 > 0.5, s"near-identical docs jaccard $j12")
    assert(j13 < 0.1, s"unrelated docs jaccard $j13")
  }
}
