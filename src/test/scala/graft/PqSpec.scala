package graft

import graft.ops.{Clustering, Extended10, PqOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for q201 PQ/ADC (rows-only in t2 — float k-means codebooks,
  * the q45/q108/q199 precedent):
  *  - pack/unpack roundtrip over the full 8-bit × 8-subspace domain;
  *  - the LOSSLESS-ALPHABET law: on a binary-exact corpus whose every
  *    subspace takes ≤ ks distinct subvector values, the codebooks
  *    recover the alphabet exactly, reconstruction is exact, and the
  *    asymmetric distance EQUALS the exact distance bit-for-bit —
  *    so the ADC ranking IS the exact ranking;
  *  - planted-cluster recovery: ADC top-10 vs brute exact top-10
  *    overlap ≥ 9/10 per query on a noisy corpus (q199's bar);
  *  - self-retrieval at rank 1 with d2 = 0;
  *  - IVFADC composition: at FULL probe, ADC over the probed cells of
  *    a q199/q200 ivfIndex equals the exhaustive scan bit-for-bit.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  test("pack/unpack roundtrip over the code domain") {
    val codes = Seq(
      Array(0, 0, 0, 0, 0, 0, 0, 0), Array(255, 0, 255, 0, 255, 0, 255, 0),
      Array(1, 2, 3, 4, 5, 6, 7, 8), Array(255, 255, 255, 255, 255, 255, 255, 255),
      Array(17, 0, 0, 0, 0, 0, 0, 200))
    codes.foreach { cs =>
      var packed = 0L
      cs.zipWithIndex.foreach { case (c, i) =>
        packed |= (c.toLong & 0xffL) << (8 * i)
      }
      assert(PqOps.unpackCode(packed, 8).toSeq == cs.toSeq)
    }
  }

  /** Binary-exact alphabet corpus: dim 16, m 8 (subDim 2); subspace s
    * offers 4 distinct subvectors ((a + s) % 4) / 16-scaled — all
    * values k/16, so every squared difference and every ≤16-term sum
    * is exact in IEEE. Ids 0–3 enumerate alphabet entry i in EVERY
    * subspace, so the first-k-by-id Lloyd init already holds the whole
    * alphabet and the update fixes it exactly (means of identical
    * points). */
  private def alphabetVec(i: Long): Seq[Double] =
    (0 until 8).flatMap { s =>
      val a = if (i < 4) i.toInt else ((i * 7 + s) % 4).toInt
      Seq((a * 4 + s % 3) / 16.0, (a * 3) / 16.0)
    }

  test("lossless alphabet: ADC distance IS the exact distance") {
    val rows = (0L until 64L).map(i => (i, alphabetVec(i)))
    val df = rows.toDF("id", "e")
    val model = PqOps.pqTrain(df, dim = 16, m = 8, ks = 4)
    // codebooks recover the alphabet exactly → reconstruction exact
    val codes = df.select(col("id"),
        PqOps.pqEncode(model)(col("e")).as("code")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (i, v) =>
      assert(PqOps.decodeLocal(model, codes(i)).toSeq == v,
        s"vector $i must reconstruct exactly from its code")
    }
    // asymmetric distance == exact distance, bit-for-bit, for every
    // (query, candidate) pair — same ascending-subspace IEEE order
    val qs = rows.take(5)
    qs.foreach { case (qi, qv) =>
      val t = PqOps.adcTable(model, qv.toArray)
      rows.foreach { case (ci, cv) =>
        var adc = 0.0
        val ids = PqOps.unpackCode(codes(ci), 8)
        (0 until 8).foreach(s => adc += t(s)(ids(s)))
        val exact = Clustering.l2sqLocal(qv.toArray, cv.toArray)
        assert(adc == exact,
          s"ADC($qi,$ci)=$adc must bit-equal exact $exact")
      }
    }
    // and therefore the declared pipeline's ADC column equals its
    // exact column on every emitted row
    val qvecs = qs.map { case (i, v) => (i, v.toArray) }.toArray
    val out = PqOps.pqAdcQuery(df, model, qvecs, topR = 64, depth = 64)
      .collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getDouble(3) == r.getDouble(4),
      "lossless corpus: adc_d2 must equal d2 on every row"))
  }

  /** Noisy planted clusters: 4 one-hot anchors (scale 8) in 16-d with
    * deterministic small residues. */
  private def planted(n: Int): Seq[(Long, Seq[Double])] =
    (0L until n.toLong).map { i =>
      val v = Array.fill(16)(0.0)
      v(((i % 4) * 4).toInt) = 8.0
      (0 until 16).foreach(j => v(j) += ((i * 13 + j * 5) % 3) * 0.1)
      (i, v.toSeq)
    }

  test("planted clusters: ADC top-10 overlaps exact top-10 >= 9/10") {
    val rows = planted(200)
    val df = rows.toDF("id", "e")
    val model = PqOps.pqTrain(df, dim = 16, m = 8, ks = 8)
    val qvecs = rows.take(3).map { case (i, v) => (i, v.toArray) }.toArray
    val adcTop = PqOps.pqAdcQuery(df, model, qvecs, topR = 10, depth = 10)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    qvecs.foreach { case (q, qv) =>
      val exactTop = rows
        .map { case (i, v) => (i, Clustering.l2sqLocal(qv, v.toArray)) }
        .sortBy { case (i, d) => (d, i) }.take(10).map(_._1).toSet
      val overlap = (adcTop(q) intersect exactTop).size
      assert(overlap >= 9, s"query $q: ADC top-10 overlap $overlap < 9")
      // self-retrieval: the query is a corpus vector — rank 1, d2 = 0
      assert(adcTop(q).contains(q))
    }
    val out = PqOps.pqAdcQuery(df, model, qvecs, topR = 10, depth = 1)
      .collect()
    out.foreach { r =>
      assert(r.getLong(2) == r.getLong(0) && r.getDouble(4) == 0.0,
        "self-retrieval must lead with exact distance 0")
    }
  }

  test("IVFADC composition: full probe equals the exhaustive scan") {
    // candidates from ALL cells of a q199/q200 coarse index, ADC-
    // ranked and refined, must reproduce the exhaustive q201 pipeline
    // bit-for-bit — the composed (IVFADC) path only changes WHICH
    // candidates are scanned, and full probe makes that set the corpus
    val rows = planted(120)
    val df = rows.toDF("id", "e")
    val model = PqOps.pqTrain(df, dim = 16, m = 8, ks = 8)
    val qvecs = rows.take(2).map { case (i, v) => (i, v.toArray) }.toArray
    val (index, cents) = Extended10.ivfIndex(
      df.select(col("id").as("vec_id"), col("e").as("e0")),
      dim = 16, nCells = 4)
    val nProbe = cents.length // full probe
    val probed = qvecs.flatMap { case (q, e) =>
      cents.map { case (cid, ce) => (cid, Clustering.l2sqLocal(e, ce)) }
        .sortBy { case (cid, d) => (d, cid) }.take(nProbe).map(_._1)
    }.distinct.toSeq
    val candidates = index
      .filter(col("cell").isin(probed.map(Long.box): _*))
      .select(col("vec_id").as("id"), col("e0").as("e"))
    val composed = PqOps.pqAdcQuery(candidates, model, qvecs,
      topR = 16, depth = 10).collect().map(_.toSeq).toSeq
    val exhaustive = PqOps.pqAdcQuery(df, model, qvecs,
      topR = 16, depth = 10).collect().map(_.toSeq).toSeq
    assert(composed == exhaustive)
  }

  /** Dense exact anchors (multiples of 2, far apart in EVERY
    * subspace) + exact small residues — the clustered geometry where
    * residual coding's advantage is structural: plain PQ must spend
    * subspace centroids separating the anchor clouds, residual PQ
    * sees only the within-cell noise. */
  private def plantedDense(n: Int): Seq[(Long, Seq[Double])] =
    (0L until n.toLong).map { i =>
      val c = (i % 4).toInt
      val v = Array.tabulate(16)(j => ((c * 31 + j * 17) % 5) * 2.0)
      (0 until 16).foreach(j => v(j) += ((i * 13 + j * 5) % 7) * 0.07)
      (i, v.toSeq)
    }

  test("IVFADC residual codes: recon win, refinement law, overlap") {
    val rows = plantedDense(240)
    val df = rows.toDF("id", "e")
    val (index, cents) = Extended10.ivfIndex(
      df.select(col("id").as("vec_id"), col("e").as("e0")),
      dim = 16, nCells = 4)
    val plain = PqOps.pqTrain(df, dim = 16, m = 8, ks = 8)
    val resid = PqOps.pqTrainResidual(index, cents, dim = 16, m = 8,
      ks = 8)
    val idx = PqOps.ivfAdcIndex(index, cents, resid)
    // (1) at the same bits, residual recon (cell centroid + decoded
    // residual) beats plain recon on clustered data — the published
    // IVFADC motivation, measured
    val cmap = cents.toMap
    val plainCodes = df.select(col("id"),
        PqOps.pqEncode(plain)(col("e")).as("code")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val idxRows = idx.select(col("vec_id"), col("e0"), col("cell"),
      col("code")).collect()
    var plainSse = 0.0
    var residSse = 0.0
    idxRows.foreach { r =>
      val id = r.getLong(0)
      val e = r.getSeq[Double](1).toArray
      val c = cmap(r.getLong(2))
      val rp = PqOps.decodeLocal(plain, plainCodes(id))
      val rr = PqOps.decodeLocal(resid, r.getLong(3))
        .zip(c).map { case (a, b) => a + b }
      plainSse += Clustering.l2sqLocal(e, rp)
      residSse += Clustering.l2sqLocal(e, rr)
    }
    assert(residSse < plainSse,
      s"residual recon SSE $residSse must beat plain $plainSse")
    // (2) refinement law: full probe + topR ≥ corpus makes the output
    // the brute exact ranking REGARDLESS of code quality
    val qvecs = rows.take(3).map { case (i, v) => (i, v.toArray) }
      .toArray
    val full = PqOps.ivfAdcQuery(idx, cents, resid, qvecs,
      nProbe = cents.length, topR = 240, depth = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = qvecs.flatMap { case (q, qv) =>
      rows.map { case (i, v) =>
        (i, Clustering.l2sqLocal(qv, v.toArray)) }
        .sortBy { case (i, d) => (d, i) }.take(10).zipWithIndex
        .map { case ((i, _), r) => (q, (r + 1).toLong, i) }
    }.sorted
    assert(full.sorted.toSeq == brute.toSeq,
      "full probe + full-depth refinement must be the exact ranking")
    // (3) partial probe: the query's own cell is always probed, so
    // self-retrieval holds and top-10 overlap vs brute stays ≥ 9/10
    val part = PqOps.ivfAdcQuery(idx, cents, resid, qvecs, nProbe = 2,
      topR = 20, depth = 10).collect()
    qvecs.foreach { case (q, qv) =>
      val got = part.filter(_.getLong(0) == q)
      val top = got.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(top.head == q && got.sortBy(_.getLong(1)).head
        .getDouble(4) == 0.0, "self-retrieval at rank 1")
      val exact = rows.map { case (i, v) =>
        (i, Clustering.l2sqLocal(qv, v.toArray)) }
        .sortBy { case (i, d) => (d, i) }.take(10).map(_._1).toSet
      assert((top.toSet intersect exact).size >= 9,
        s"query $q: partial-probe overlap < 9/10")
    }
  }

  test("IVFADC stored index: partial probe prunes cell partitions") {
    // over a cell-PARTITIONED code store, pruneCells pushes the probed
    // cells as a static isin: the candidate scan must carry cell
    // partition filters (file-listing pruning — the q199 prebuilt pin
    // applied to codes)
    import org.apache.spark.sql.execution.FileSourceScanExec
    val rows = plantedDense(160)
    val df = rows.toDF("id", "e")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfadc")
    try {
      val (index, cents) = Extended10.ivfIndex(
        df.select(col("id").as("vec_id"), col("e").as("e0")),
        dim = 16, nCells = 4)
      val model = PqOps.pqTrainResidual(index, cents, dim = 16, m = 8,
        ks = 8)
      PqOps.ivfAdcIndex(index, cents, model)
        .write.partitionBy("cell").mode("overwrite")
        .parquet(dir.toString)
      val stored = spark.read.parquet(dir.toString)
      val qvecs = rows.take(2).map { case (i, v) => (i, v.toArray) }
        .toArray
      val cand = PqOps.ivfAdcCandidates(stored, cents, model, qvecs,
        nProbe = 2, topR = 8, pruneCells = true)
      val pruned = cand.queryExecution.sparkPlan.collect {
        case s: FileSourceScanExec if s.partitionFilters.exists(
          _.references.exists(_.name == "cell")) => s
      }
      assert(pruned.nonEmpty,
        "candidate scan must carry cell partition filters")
      // and the pruned path still answers: self-retrieval via the
      // full query over the stored index
      val out = PqOps.ivfAdcQuery(stored, cents, model, qvecs,
        nProbe = 2, topR = 8, depth = 3, pruneCells = true).collect()
      qvecs.foreach { case (q, _) =>
        val top = out.filter(_.getLong(0) == q).minBy(_.getLong(1))
        assert(top.getLong(2) == q && top.getDouble(4) == 0.0)
      }
    } finally FsUtil.deleteRecursively(dir)
  }

  test("q201 plan: rank-limit pushdown, codes-only scan, point lookups") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val rows = planted(300)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_plan")
    try {
      rows.toDF("id", "e").coalesce(2).sortWithinPartitions("id")
        .write.mode("overwrite").parquet(s"$dir/vectors")
      val emb = spark.read.parquet(s"$dir/vectors")
      val model = PqOps.pqTrain(emb, dim = 16, m = 8, ks = 8)
      val qvecs = rows.take(2).map { case (i, v) => (i, v.toArray) }
        .toArray
      emb.select(col("id"), PqOps.pqEncode(model)(col("e")).as("code"))
        .sortWithinPartitions("id")
        .write.mode("overwrite").parquet(s"$dir/codes")
      val codes = spark.read.parquet(s"$dir/codes")
      // the ADC scan: map-side rank limit, broadcast query fanout
      // (never a cartesian), and the ONLY file read is the code files
      val adcPlan = PqOps.adcTopFrame(codes, model, qvecs, topR = 8)
        .queryExecution.sparkPlan
      assert(adcPlan.collect { case w: WindowGroupLimitExec => w }
        .nonEmpty, "ADC top-R must push a rank group limit map-side")
      assert(adcPlan.collect { case c: CartesianProductExec => c }
        .isEmpty, "query fanout must broadcast, not cartesian")
      val adcScans = adcPlan.collect { case s: FileSourceScanExec => s }
      assert(adcScans.nonEmpty && adcScans.forall(
        _.relation.location.rootPaths.forall(
          _.toString.contains("codes"))),
        "the ADC scan must read the 8-byte code files only")
      // refinement: the raw-vector read carries the PUSHED candidate
      // ids (literal isin → row-group pruning), not a full scan
      val out = PqOps.pqAdcQueryCodes(emb, codes, model, qvecs,
        topR = 8, depth = 5)
      val embScans = out.queryExecution.sparkPlan.collect {
        case s: FileSourceScanExec if s.relation.location.rootPaths
          .forall(_.toString.contains("vectors")) => s
      }
      assert(embScans.nonEmpty && embScans.forall(_.metadata
        .get("PushedFilters").exists(_.contains("In(id"))),
        "refinement must push the candidate ids to the corpus scan")
    } finally FsUtil.deleteRecursively(dir)
  }

  test("pqAppend: frozen-model append ≡ rebuild bit-exact; drift trigger") {
    // the add-with-ids law: encode is a pure per-row function of the
    // FROZEN codebooks, so codes appended batch-by-batch are
    // bit-identical to a one-shot encode of the union — the exactness
    // that makes the append path safe (no approximation until retrain)
    val rows = plantedDense(200)
    val base = rows.filter(_._1 % 10 != 9)
    val batch = rows.filter(_._1 % 10 == 9)
    val baseDf = base.toDF("id", "e")
    val model = PqOps.pqTrain(baseDf, dim = 16, m = 8, ks = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_append")
    try {
      PqOps.pqAppend(baseDf, model, s"$dir/codes")
      PqOps.pqAppend(batch.toDF("id", "e"), model, s"$dir/codes")
      val stored = spark.read.parquet(s"$dir/codes")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val rebuilt = rows.toDF("id", "e")
        .select(col("id"), PqOps.pqEncode(model)(col("e")).as("code"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(stored.size == rows.size && stored == rebuilt)
      // drift audit (q200's 2× MSE trigger on reconstruction error):
      // an in-distribution batch must not trip retrain…
      val audit = PqOps.pqAppendAudit(baseDf, batch.toDF("id", "e"),
        model).collect().head
      assert(audit.getLong(0) == base.size && audit.getLong(1) == batch.size)
      assert(!audit.getBoolean(4),
        s"in-distribution batch tripped retrain: $audit")
      // …and a planted off-distribution batch (far from every
      // codeword) must
      val off = (900L until 920L).map(i =>
        (i, Seq.tabulate(16)(j => 1000.0 + i * 0.1 + j)))
      val audit2 = PqOps.pqAppendAudit(baseDf, off.toDF("id", "e"),
        model).collect().head
      assert(audit2.getBoolean(4),
        s"off-distribution batch must trip retrain: $audit2")
    } finally FsUtil.deleteRecursively(dir)
  }

  test("ivfAdcAppend: appended cell partitions ≡ rebuilt; stored query intact") {
    // the IVFADC half: batch assigned to the STORED coarse cells,
    // residual-coded under the stored codebooks, blind-appended beside
    // the cell partitions — (vec_id, cell, code) triples must equal a
    // one-shot rebuild under the same frozen quantizer and model
    val rows = plantedDense(160)
    val base = rows.filter(_._1 % 10 != 9)
    val batch = rows.filter(_._1 % 10 == 9)
    def asIdx(s: Seq[(Long, Seq[Double])]) = s.toDF("id", "e")
      .select(col("id").as("vec_id"), col("e").as("e0"))
    val (index, cents) = Extended10.ivfIndex(asIdx(base), dim = 16,
      nCells = 4)
    val model = PqOps.pqTrainResidual(index, cents, dim = 16, m = 8,
      ks = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfadc_app")
    try {
      PqOps.ivfAdcIndex(index, cents, model)
        .write.partitionBy("cell").mode("overwrite")
        .parquet(s"$dir/index")
      PqOps.ivfAdcAppend(asIdx(batch), cents, model, s"$dir/index")
      val stored = spark.read.parquet(s"$dir/index")
      val sTriples = stored
        .select(col("vec_id"), col("cell").cast("long"), col("code"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val rTriples = PqOps.ivfAdcIndex(
          Extended10.ivfAppend(cents, asIdx(rows), 16), cents, model)
        .select(col("vec_id"), col("cell"), col("code"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(sTriples.size == rows.size && sTriples == rTriples)
      // the appended store still serves: self-retrieval for batch
      // vectors through the full stored-index query path
      val qvecs = batch.take(2).map { case (i, v) => (i, v.toArray) }
        .toArray
      val out = PqOps.ivfAdcQuery(stored, cents, model, qvecs,
        nProbe = 4, topR = 160, depth = 3, pruneCells = true).collect()
      qvecs.foreach { case (q, _) =>
        val top = out.filter(_.getLong(0) == q).minBy(_.getLong(1))
        assert(top.getLong(2) == q && top.getDouble(4) == 0.0)
      }
    } finally FsUtil.deleteRecursively(dir)
  }

  test("q201 over embeddings: shape, self-retrieval, refinement order") {
    val out = ops.PqOps.q201PqAdc(spark, SparkTest.sfDir).collect()
    val qids = out.map(_.getLong(0)).distinct
    assert(qids.length == 5 && out.length == qids.length * 10)
    qids.foreach { q =>
      val rowsQ = out.filter(_.getLong(0) == q).sortBy(_.getLong(1))
      // the query vector is in the corpus: exact distance 0 leads
      assert(rowsQ.head.getLong(2) == q && rowsQ.head.getDouble(4) == 0.0)
      // refined output is ordered by exact distance, not ADC
      val d2s = rowsQ.map(_.getDouble(4))
      assert(d2s.sameElements(d2s.sorted))
    }
  }
}
