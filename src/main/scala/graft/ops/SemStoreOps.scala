package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q208 — INCREMENTAL SemDeDup: the maintenance tier of q187 (the last
  * dedup family without one), the q200/q153/q203 batch-vs-store shape
  * applied to semantic near-duplicates (SemDeDup is Abbas et al. 2023,
  * arXiv:2303.09540 — the published pipeline q187 implements; this
  * file adds the standing-index half a 100 TB ingest loop needs).
  *
  * Store artifact (the q200 cells+reps shape): the standing corpus's
  * exact-collapsed representatives with their frozen-quantizer cell
  * ids — (cid, id, e, cnt) — plus the k·d centroid model (driver-held
  * during a probe, a k-row table at rest; the model-artifact class).
  * An arriving batch is exact-collapsed, assigned to the STORED cells
  * by the same in-row argmin the ingest used, and judged within-cell
  * against the store's reps — the store side is semi-reduced to the
  * batch's cells FIRST (∝ batch), so the standing reps are never
  * rescanned beyond that semi-join and never rewritten. Admitted
  * (un-hit) reps append BLIND, bucketed by cid.
  *
  * Sequential contract (the q205 keep-first precedent): a batch row
  * drops iff its representative has a cosine ≥ τ neighbour in the
  * store, or an EARLIER (lower rep id) batch representative in its
  * cell — every row judged against everything that arrived before it.
  * This is greedy where q187's connected components are transitive:
  * on exact-duplicate groups (cliques — cosine(x, x) = 1) the two
  * coincide, which is what SemStoreSpec pins bit-for-bit on planted
  * corpora; on borderline near-dup CHAINS the greedy rule can keep a
  * row CC would drop — the inherent (and standard) price of never
  * revisiting admitted data.
  *
  * Rows-only in t2 (float k-means cells — the q45/q108/q187/q200
  * precedent). SemStoreSpec pins planted-copy recovery, the
  * no-false-positive side, incremental ≡ full on planted cliques,
  * the append law (a copy of an admitted rep drops on the next
  * probe), and the drift-trigger reuse.
  *
  * Scale: probe work ∝ batch reps × their cells' stored populations —
  * cells bound pair work (the q187 argument; the stored quantizer's
  * adaptive k sizes cells to ≤ 256 reps on average at build). The
  * quantizer model rides the closure and follows semDedupOnReps's
  * regime switch: FLAT fit/argmin at k ≤ 64 (the sf ladder and q200's
  * exact store shape), [[Clustering.lloydTwoLevel]] beyond it — √k
  * per-row fit and assignment work, the answer to the flat-Lloyd
  * O(n·k·d) ingest wall at adaptive k over large distinct corpora.
  * Both shapes serialize to ONE model table ([[semModelRows]] /
  * [[semModelFromRows]]: top rows + leaf rows, flat = leaves only),
  * so the stored-path probe reconstructs the exact build-time
  * assignment — what keeps "a copy of a stored vector lands in the
  * stored rep's cell" true across JVMs. A batch whose vectors the
  * frozen quantizer no longer fits concentrates into few cells AND
  * lands far from every centroid — exactly what [[semDriftAudit]]
  * (q200's 2× MSE trigger, reused verbatim over the model's flat
  * LEAVES) flags as retrain-due.
  */
object SemStoreOps {

  private val Tau = 0.99

  /** The base quantizer — flat (q200's shape) or two-level
    * (semDedupOnReps's k > 64 regime). `assignLocal` is the
    * driver-side (cid, d2) argmin so [[SemModel]] can compose the
    * split walk on top inside ONE udf. */
  private[graft] sealed trait SemBase {
    def leaves: Array[(Long, Array[Double])]
    def assignLocal(e: Seq[Double]): (Long, Double)
  }
  private[graft] final case class SemFlat(
      cents: Array[(Long, Array[Double])]) extends SemBase {
    private val sorted = cents.sortBy(_._1)
    def leaves: Array[(Long, Array[Double])] = cents
    def assignLocal(e: Seq[Double]): (Long, Double) =
      Clustering.argminLocal(sorted, e)
  }
  private[graft] final case class SemTwoLevel(
      m: Clustering.TwoLevelModel) extends SemBase {
    // the nearestTwoLevel safety rule verbatim: restrict the top
    // argmin to populated cells (an empty top cell has no subs key)
    private val top = m.top.filter(t => m.subs.contains(t._1)).sortBy(_._1)
    def leaves: Array[(Long, Array[Double])] =
      m.subs.toSeq.flatMap { case (tc, arr) =>
        arr.map { case (bc, ce) => (tc * m.k2 + bc, ce) }
      }.sortBy(_._1).toArray
    def assignLocal(e: Seq[Double]): (Long, Double) = {
      val tc = Clustering.argminLocal(top, e)._1
      val (bc, bd) = Clustering.argminLocal(m.subs(tc), e)
      (tc * m.k2 + bc, bd)
    }
  }

  /** The store's quantizer: a base (flat or two-level) plus the
    * worst-case SPLIT map — parent leaf cid → (global child cid,
    * centroid) — that [[semStoreBuild]]'s population guard produced
    * (code review r15: the store previously lacked the
    * boundCellPopulations bound q187 gained in r12, so a hot cone the
    * quantizer failed to split re-created unbounded within-cell pair
    * work at probe time). `assign` descends: base argmin, then walk
    * split parents until a real leaf (children of children are split
    * rows themselves — depth bounded by the build's maxRounds).
    * `flatLeaves` is the FINAL leaf set (split parents replaced by
    * their children) — the drift audit's lookup view, keyed by
    * exactly the cids stored rows carry. */
  private[graft] final case class SemModel(base: SemBase,
      splits: Map[Long, Array[(Long, Array[Double])]]) {
    def isEmpty: Boolean = base.leaves.isEmpty
    def assignLocal(e: Seq[Double]): (Long, Double) = {
      var cur = base.assignLocal(e)
      var guard = 0
      while (splits.contains(cur._1) && guard < 16) {
        cur = Clustering.argminLocal(splits(cur._1), e)
        guard += 1
      }
      cur
    }
    def assign: org.apache.spark.sql.expressions.UserDefinedFunction =
      udf { (e: Seq[Double]) => assignLocal(e) }.asNonNullable()
    def flatLeaves: Array[(Long, Array[Double])] = {
      val out = scala.collection.mutable.LinkedHashMap(
        base.leaves.map(l => l._1 -> l._2).toSeq: _*)
      splits.foreach { case (parent, kids) =>
        out.remove(parent)
        kids.foreach { case (c, ce) =>
          if (!splits.contains(c)) out(c) = ce
        }
      }
      out.toArray.sortBy(_._1)
    }
  }

  /** Serialize a model to rows (tcid, sub, k2, ce):
    *  - flat leaf: (−1, cid, 0, ce)
    *  - two-level: top rows (tc, −1, k2, ce) + leaf rows (tc, bc, k2,
    *    ce) with k2 ≥ 1
    *  - split rows: (parent global cid, CHILD global cid, −1, ce)
    * One small table — k·d doubles, the model-artifact class. */
  private[graft] def semModelRows(model: SemModel)
      : Seq[(Long, Long, Int, Seq[Double])] = {
    val baseRows = model.base match {
      case SemFlat(cents) =>
        cents.toSeq.map { case (cid, ce) => (-1L, cid, 0, ce.toSeq) }
      case SemTwoLevel(m) =>
        m.top.toSeq.map { case (tc, ce) => (tc, -1L, m.k2, ce.toSeq) } ++
          m.subs.toSeq.flatMap { case (tc, arr) =>
            arr.toSeq.map { case (bc, ce) => (tc, bc, m.k2, ce.toSeq) }
          }
    }
    baseRows ++ model.splits.toSeq.flatMap { case (parent, kids) =>
      kids.toSeq.map { case (c, ce) => (parent, c, -1, ce.toSeq) }
    }
  }

  /** Reconstruct the EXACT build-time model (and therefore the exact
    * assignment function) from its table rows. */
  private[graft] def semModelFromRows(
      rows: Seq[(Long, Long, Int, Seq[Double])]): SemModel = {
    val (splitRows, baseRows) = rows.partition(_._3 == -1)
    val base: SemBase =
      if (baseRows.forall(_._1 == -1L))
        SemFlat(baseRows.sortBy(_._2)
          .map { case (_, cid, _, ce) => (cid, ce.toArray) }.toArray)
      else SemTwoLevel(Clustering.TwoLevelModel(
        k2 = baseRows.head._3,
        top = baseRows.filter(_._2 == -1L).sortBy(_._1)
          .map { case (tc, _, _, ce) => (tc, ce.toArray) }.toArray,
        subs = baseRows.filter(_._2 >= 0L).groupBy(_._1).map {
          case (tc, leaf) => tc -> leaf.sortBy(_._2)
            .map { case (_, bc, _, ce) => (bc, ce.toArray) }.toArray
        }))
    SemModel(base, splitRows.groupBy(_._1).map { case (parent, kids) =>
      parent -> kids.sortBy(_._2)
        .map { case (_, c, _, ce) => (c, ce.toArray) }.toArray
    })
  }

  /** Build the store: exact-collapse, size k adaptively from the rep
    * count ([[Extended10.semDedupK]] — cells average ≤ 256 reps), fit
    * the quantizer via the SHARED regime switch
    * ([[Clustering.fitQuantizer]]: flat at k ≤ 64, two-level beyond),
    * assign, then bound the WORST-CASE cell population (the r12
    * boundCellPopulations argument, applied at build time so the
    * bound SERIALIZES with the model): every cell whose rep count
    * exceeds `maxCell` is recursively split via
    * [[Clustering.fitWithinCells]], split subcentroids recorded as
    * model rows with fresh global cids, and the reps remapped — so a
    * probe against the stored model sees the same bounded cells the
    * build produced. Returns the driver-held model and the reps frame
    * (cid, id, e, cnt), materialized so the caller can persist or
    * table it. */
  private[graft] def semStoreBuild(emb: DataFrame, dim: Int,
      kOverride: Option[Int] = None,
      maxCell: Int = Extended10.SemDedupMaxCell): (SemModel, DataFrame) =
    semStoreBuildFromReps(Extended10.collapseExact(emb), dim, kOverride,
      maxCell)

  /** [[semStoreBuild]] over ALREADY-collapsed reps (id, e, cnt) — the
    * retrain path's entry: exact collapse is associative (min id, Σ
    * cnt), so a rebuild can merge the stored reps with a collapsed
    * batch instead of re-collapsing raw corpora it no longer has.
    * cnt never shapes the model: the fit runs on (id, e) and the
    * population guard counts rep ROWS, so any rep set with the same
    * vector set yields the identical model. */
  private[graft] def semStoreBuildFromReps(reps0: DataFrame, dim: Int,
      kOverride: Option[Int] = None,
      maxCell: Int = Extended10.SemDedupMaxCell): (SemModel, DataFrame) = {
    val reps = reps0.persist()
    try {
      val n = reps.count()
      val k = kOverride.getOrElse(Extended10.semDedupK(n))
      val repsSel = reps.select(col("id"), col("e"))
      val base: SemBase = Clustering.fitQuantizer(repsSel, k, dim,
        Some(n)).fold(SemFlat, SemTwoLevel)
      if (base.leaves.isEmpty)
        return (SemModel(base, Map.empty),
          reps.select(lit(0L).as("cid"), col("id"), col("e"), col("cnt"))
            .limit(0))
      val asg0 = ScaleOps.stageCheckpoint(reps.select(
        SemModel(base, Map.empty).assign(col("e")).getField("_1")
          .as("cid"),
        col("id"), col("e"), col("cnt")))
      val (splits, asg) = boundStoreCells(asg0, base, dim, maxCell)
      (SemModel(base, splits), asg)
    } finally reps.unpersist()
  }

  /** The build-time population guard (the boundCellPopulations loop,
    * capturing the split STRUCTURE so it serializes): per round, one
    * k-sized count audit; all oversized cells fitted simultaneously
    * (fitWithinCells, per-cell bounded draws); fresh global cids
    * allocated above every existing leaf and split id in ascending
    * parent order (deterministic); reps remapped and re-materialized.
    * A cell still oversized after maxRounds (or whose draw came up
    * empty) is left as-is — degrade, never loop (the q187 posture). */
  private def boundStoreCells(asg0: DataFrame, base: SemBase, dim: Int,
      maxCell: Int, splitK: Int = 16, maxRounds: Int = 4)
      : (Map[Long, Array[(Long, Array[Double])]], DataFrame) = {
    var asg = asg0
    var splits = Map.empty[Long, Array[(Long, Array[Double])]]
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      // k-sized audit collect (one row per populated cell)
      val counts = asg.groupBy("cid").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val over = counts.filter(_._2 > maxCell).toMap
      if (over.isEmpty) done = true
      else {
        var nextCid = (base.leaves.iterator.map(_._1) ++
          splits.valuesIterator.flatMap(_.iterator.map(_._1))).max + 1
        val subs = Clustering.fitWithinCells(asg, over, splitK, dim,
          maxIters = 4, salt = 300L + round)
        val newSplits = subs.toSeq.sortBy(_._1).collect {
          case (cid, cands) if cands.nonEmpty =>
            val kids = cands.map { case (sid, ce) => (nextCid + sid, ce) }
            nextCid += splitK
            cid -> kids
        }.toMap
        if (newSplits.isEmpty) done = true // every draw empty — degrade
        else {
          splits ++= newSplits
          val remap = udf { (cid: Long, e: Seq[Double]) =>
            newSplits.get(cid) match {
              case Some(kids) => Clustering.argminLocal(kids, e)._1
              case None => cid
            }
          }.asNonNullable()
          asg = ScaleOps.stageCheckpoint(
            asg.withColumn("cid", remap(col("cid"), col("e"))))
          round += 1
        }
      }
    }
    (splits, asg)
  }

  /** The probe core: batch reps (cid, id, e, cnt) extended with the
    * sequential-contract hit flag `h` — true iff the rep has a
    * cosine ≥ τ neighbour among the store's reps in its cell or an
    * earlier (lower id) batch rep in its cell. Both joins are
    * equi-joins on `keys` (the cell id, plus the ephemeral `sub`
    * refinement key when [[refineBatchCells]] fired); the store side
    * arrives ALREADY semi-reduced to the batch's cells (the caller's
    * contract, ∝ batch). Output keys stay at cid granularity. */
  private[graft] def semProbe(bReps: DataFrame, storeInCells: DataFrame,
      tau: Double, keys: Seq[String] = Seq("cid")): DataFrame = {
    import graft.functions.CosineSim.cosineSim
    val k = keys.map(col)
    val storeHit = bReps.select(k :+ col("id") :+ col("e").as("eb"): _*)
      .join(storeInCells.select(k :+ col("e").as("es"): _*), keys)
      .filter(cosineSim(col("eb"), col("es")) >= tau)
      .select("id").distinct()
    val a = bReps.select(k :+ col("id") :+ col("e").as("ea"): _*)
    val b = bReps.select(k :+ col("id").as("id2")
      :+ col("e").as("eb2"): _*)
    val earlierHit = a.join(b, keys)
      .filter(col("id2") < col("id"))
      .filter(cosineSim(col("ea"), col("eb2")) >= tau)
      .select("id").distinct()
    val hit = storeHit.union(earlierHit).distinct()
      .withColumn("h0", lit(true))
    bReps.join(hit, Seq("id"), "left")
      .select(col("cid"), col("id"), col("e"), col("cnt"),
        coalesce(col("h0"), lit(false)).as("h"))
  }

  /** BATCH-side population guard (r15 verdict item 2): stored cells
    * are split-bounded at build time, but a batch concentrated in one
    * cell made [[semProbe]]'s within-batch pair join O(b_c²) with no
    * bound. Audit per-cell BATCH populations (the collect is filtered
    * to oversized cells first, so it is ≤ nBatchReps/maxCell rows —
    * never cell-count- or data-sized) and split every flooded cell
    * once via [[Clustering.fitWithinCells]] into an ephemeral `sub`
    * key (0 outside flooded cells). The refinement is per-probe and
    * NEVER serialized — the store's model and cids are untouched; the
    * same udf re-assigns the store's semi-reduced rows, so an exact
    * copy of a stored rep still meets it in the same (cid, sub) group
    * and the probe's pair joins run on the refined key while audit
    * and append payload stay at true cid granularity.
    *
    * Semantics under flood: pairs split across two sub-cells are not
    * compared — the same documented degrade as the build-time cell
    * splits (cells only bound pair work; exact copies collapse before
    * the quantizer, and cosine < τ pairs never drop under ANY
    * partition). On a batch with no flooded cell the refinement is a
    * no-op and the probe is bit-identical (SemStoreSpec pins both
    * sides). ONE round, splitK sized to the flood (≤ 256): a round
    * divides the flood by up to splitK; a cell still oversized after
    * it (or whose sample draw came up empty) is served as-is —
    * degrade, never loop (the q187 posture). */
  private[graft] def refineBatchCells(bReps: DataFrame, model: SemModel,
      maxCell: Int, salt: Long = 700L)
      : Option[org.apache.spark.sql.expressions.UserDefinedFunction] = {
    val over = bReps.groupBy("cid").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxCell).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    if (over.isEmpty) return None
    val dim = model.base.leaves.head._2.length
    val splitK = math.min(256L,
      2L * ((over.values.max + maxCell - 1) / maxCell)).toInt
    val subs = Clustering.fitWithinCells(bReps, over, splitK, dim,
      maxIters = 4, salt = salt)
    if (subs.isEmpty) return None // every draw empty — serve unsplit
    Some(udf { (cid: Long, e: Seq[Double]) =>
      subs.get(cid) match {
        case Some(kids) => Clustering.argminLocal(kids, e)._1 + 1L
        case None => 0L
      }
    }.asNonNullable())
  }

  /** Incremental SemDeDup of a batch against the stored cells+reps:
    * the per-cell audit (cid, n_store, n_batch, n_dropped) —
    * multiplicity-weighted like q187's (a hit rep drops all its cnt
    * rows; an admitted rep keeps one and drops its cnt − 1 exact
    * copies), n_store = stored reps in the cell (0 for a cell only
    * the batch touched). Work ∝ batch: one collapse shuffle, one
    * in-row assignment, one semi-join, two bounded within-cell
    * pair joins. */
  /** Shared probe front half: collapse + assign the batch, semi-reduce
    * the store to the batch's cells (the only store read the probe
    * does, ∝ batch cells), run [[semProbe]] — with the probed frame
    * MATERIALIZED so both ingest outputs derive from one probe pass
    * (code review r15: a real ingest step needs the audit AND the
    * admitted payload, and the two public entries each re-ran the
    * collapse/assignment/pair joins on identical inputs). */
  private def probeFrames(batch: DataFrame, model: SemModel,
      storedReps: DataFrame, tau: Double,
      maxCell: Int = Extended10.SemDedupMaxCell)
      : (DataFrame, DataFrame) = {
    val bReps = ScaleOps.stageCheckpoint(
      Extended10.collapseExact(batch).select(
        model.assign(col("e")).getField("_1").as("cid"),
        col("id"), col("e"), col("cnt")))
    val storeInCells = storedReps
      .join(bReps.select("cid").distinct(), Seq("cid"), "left_semi")
    val probed = refineBatchCells(bReps, model, maxCell) match {
      case None => semProbe(bReps, storeInCells, tau)
      case Some(refine) =>
        // flood: pair joins on the refined (cid, sub) key — the store
        // side re-assigned by the SAME udf, output back at cid grain
        val sub = (f: DataFrame) =>
          f.withColumn("sub", refine(col("cid"), col("e")))
        semProbe(ScaleOps.stageCheckpoint(sub(bReps)), sub(storeInCells),
          tau, keys = Seq("cid", "sub"))
    }
    (ScaleOps.stageCheckpoint(probed), storeInCells)
  }

  /** The per-cell audit over a probed frame (see [[semDedupVsStore]]
    * for the column contract). */
  private def auditOf(probed: DataFrame,
      storeInCells: DataFrame): DataFrame =
    probed.groupBy("cid")
      .agg(sum(col("cnt")).as("n_batch"),
        sum(when(col("h"), col("cnt")).otherwise(col("cnt") - 1))
          .as("n_dropped"))
      .join(storeInCells.groupBy("cid").agg(count(lit(1)).as("n_store")),
        Seq("cid"), "left")
      .select(col("cid"), coalesce(col("n_store"), lit(0L)).as("n_store"),
        col("n_batch"), col("n_dropped"))
      .orderBy("cid")

  private def admittedOf(probed: DataFrame): DataFrame =
    probed.filter(!col("h")).select("cid", "id", "e", "cnt")

  private[graft] def semDedupVsStore(batch: DataFrame,
      model: SemModel, storedReps: DataFrame,
      tau: Double = Tau,
      maxCell: Int = Extended10.SemDedupMaxCell): DataFrame = {
    if (model.isEmpty)
      return batch.select(lit(0L).as("cid"), lit(0L).as("n_store"),
        lit(0L).as("n_batch"), lit(0L).as("n_dropped")).limit(0)
    val (probed, storeInCells) = probeFrames(batch, model, storedReps,
      tau, maxCell)
    auditOf(probed, storeInCells)
  }

  /** The admitted (un-hit) batch reps in store schema — the blind-
    * append payload. Exact copies of an admitted rep are ABSORBED
    * into its cnt (the collapse), so the store stays one row per
    * distinct surviving vector. */
  private[graft] def semAdmitted(batch: DataFrame,
      model: SemModel, storedReps: DataFrame,
      tau: Double = Tau): DataFrame = {
    require(!model.isEmpty, "cannot admit into an empty-model store")
    admittedOf(probeFrames(batch, model, storedReps, tau)._1)
  }

  /** ONE ingest step — the maintenance loop's real shape: probe once,
    * return (per-cell audit, admitted append payload) both derived
    * from the same materialized probed frame. Callers run the audit,
    * then [[semStoreAppend]] the admitted half. */
  private[graft] def semIngest(batch: DataFrame, model: SemModel,
      storedReps: DataFrame, tau: Double = Tau,
      maxCell: Int = Extended10.SemDedupMaxCell)
      : (DataFrame, DataFrame) = {
    require(!model.isEmpty, "cannot ingest into an empty-model store")
    val (probed, storeInCells) = probeFrames(batch, model, storedReps,
      tau, maxCell)
    (auditOf(probed, storeInCells), admittedOf(probed))
  }

  /** Blind bucketed append of reps (store build or admitted batch)
    * into the standing reps table — never reads the store; an
    * existing table's bucket spec wins (ADVICE r14). Bucketing by cid
    * co-locates the probe's cell joins with the store side at rest. */
  private[graft] def semStoreAppend(reps: DataFrame, table: String,
      nBuckets: Int = 32): Unit = {
    val nb = ScaleOps.appendBuckets(reps.sparkSession, table, nBuckets)
    // repartition BY THE BUCKET HASH before the bucketed write so the
    // append lands ONE file per bucket it touches — without it each of
    // the payload's input partitions emits a file per bucket
    // (the sparseIndexAppend/sparseStoreCompact lesson, measured there
    // at ~1.3× serve cost; code review r16 caught this copy unfixed)
    ScaleOps.stageCheckpoint(reps.select("cid", "id", "e", "cnt"))
      .repartition(nb, col("cid"))
      .write.mode("append")
      .bucketBy(nb, "cid")
      .sortBy("cid")
      .saveAsTable(table)
  }

  /** Drift audit — q200's [[Extended10.ivfAppendAudit]] reused
    * verbatim: the reps store IS an IVF index of the collapsed corpus
    * ((cid, id, e) ≅ (cell, vec_id, e0)), so the same per-cell
    * population/MSE audit and the same global 2×-MSE retrain trigger
    * apply unchanged. Retrain = rebuild the store via
    * [[semStoreBuild]] over store ∪ batch (the ivfMaintain shape). */
  private[graft] def semDriftAudit(storedReps: DataFrame,
      batch: DataFrame, model: SemModel, dim: Int): DataFrame =
    Extended10.ivfAppendAudit(
      storedReps.select(col("id").as("vec_id"), col("e").as("e0"),
        col("cid").as("cell")),
      // the FINAL flat leaves (split parents replaced by children):
      // stored rows look their own assigned leaf up, k-free
      model.flatLeaves,
      batch.select(col("id").as("vec_id"), col("e").as("e0")),
      dim,
      // SYMMETRY (code review r15): the batch side must use the
      // model's REAL assignment — a flat global-min over leaves
      // lower-bounds the hierarchical assignment's d2 and would
      // systematically understate batch MSE, masking drift
      batchAsg = Some(model.assign))

  /** Load the serialized quantizer from the store's model table
    * (prefix P → table P_model; k·d doubles — the model-artifact
    * collect class). */
  private[graft] def loadStoredModel(spark: SparkSession,
      prefix: String): SemModel =
    semModelFromRows(spark.table(s"${prefix}_model").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getSeq[Double](3))).toSeq)

  /** (Over)write the store pair — P_reps bucketed by cid (an existing
    * table's bucket spec wins) and P_model as [[semModelRows]]. Used
    * for the initial store create and the retrain rewrite; `reps`
    * must be MATERIALIZED by the caller when it derives from the
    * table being replaced (every [[semMaintain]] frame already is). */
  private[graft] def semStoreWrite(spark: SparkSession, model: SemModel,
      reps: DataFrame, prefix: String, nBuckets: Int = 32): Unit = {
    import spark.implicits._
    val nb = ScaleOps.appendBuckets(spark, s"${prefix}_reps", nBuckets)
    // bucket-hash repartition first → exactly one file per bucket
    // (a retrain's reps frame is a union of checkpointed frames with
    // arbitrary partitioning; without this the rewrite lands up to
    // partitions×buckets files — code review r16, the sparse lesson)
    reps.select("cid", "id", "e", "cnt")
      .repartition(nb, col("cid"))
      .write.mode("overwrite")
      .bucketBy(nb, "cid")
      .sortBy("cid")
      .saveAsTable(s"${prefix}_reps")
    semModelRows(model).toDF("tcid", "sub", "k2", "ce")
      .write.mode("overwrite").saveAsTable(s"${prefix}_model")
  }

  /** ONE-call merge policy for the stored cells+reps pair — the
    * ivfMaintain/sparseMaintain shape for SemDeDup (r15 verdict item
    * 5: consumers previously composed semIngest + semStoreAppend +
    * semDriftAudit by hand, and the drift trigger's documented
    * response had no executable path). Audit the batch against the
    * frozen quantizer first; then either
    *   - NO drift: the ∝-batch path — one probe pass, blind bucketed
    *     append of the admitted reps, audit at the frozen model's cid
    *     granularity; or
    *   - drift (the 2× MSE global trigger): RETRAIN — refit quantizer
    *     and cells over stored ∪ batch reps ([[semStoreBuildFromReps]]
    *     on the exact-merged rep set, so the model is BIT-IDENTICAL to
    *     a semStoreBuild from scratch over the union corpus —
    *     SemStoreSpec pins it), probe the batch against the stored
    *     reps within the NEW cells (the rebuild's population guard
    *     already bounds them — no batch-side refinement needed), and
    *     rewrite both tables with the surviving reps: stored reps
    *     re-celled, hit batch reps dropped (exact copies of stored
    *     vectors drop outright, near-dups via the within-cell probe),
    *     admitted reps in. The returned audit is at the NEW model's
    *     cid granularity.
    * Ingest invariant (shared with every append tier): batch ids are
    * fresh — stored and batch rep ids must not collide, or the
    * origin split below misattributes rows. The retrain-≡-scratch
    * identity additionally assumes batch ids EXCEED stored ids (the
    * streaming/append id discipline every caller here has): when a
    * batch vector exactly equals a stored rep's, this code keeps the
    * STORED rep row, while a scratch collapseExact over the union
    * would keep the min id — with lower fresh batch ids the two rep
    * id sets differ, and the fit's id-keyed sample draws and
    * lowest-id init make the rebuilt model id-sensitive (code review
    * r16). Same-vector cnt also stays the stored rep's on both the
    * ingest and retrain paths (dropped copies never bump cnt — the
    * semStoreAppend absorption rule applies only at admission), which
    * is why the SemStoreSpec pin states reps = scratch minus dropped
    * rather than raw equality.
    *
    * `kOverride`/`maxCell` are the store's ORIGINAL build parameters —
    * the model table does not persist them (code review r16), so a
    * caller that built with non-defaults must thread the same values
    * here or a fired retrain silently changes the store's cell-
    * structure class (and the retrain ≡ scratch identity only holds
    * against a scratch build with the same parameters). Returns
    * (per-cell audit, retrained). */
  private[graft] def semMaintain(spark: SparkSession, batch0: DataFrame,
      prefix: String, dim: Int, tau: Double = Tau,
      kOverride: Option[Int] = None,
      maxCell: Int = Extended10.SemDedupMaxCell)
      : (DataFrame, Boolean) = {
    val model = loadStoredModel(spark, prefix)
    val storedReps = spark.table(s"${prefix}_reps")
    // checkpoint hygiene: everything this call persists — the batch
    // materialization below AND every internal stage checkpoint
    // (probeFrames' probed/bReps on the ingest leg; bReps/bFresh/
    // sAsg/probed and semStoreBuildFromReps' assignment on the
    // retrain leg, several of them store-sized) — is freed on exit
    // via the rddMark/freeSince scope, keeping only the returned
    // audit's blocks. Without this a long-lived maintenance loop
    // accumulates full-store RDD copies per round (catalog.clearCache
    // never reclaims RDD persists — the r15 ADVICE; code review r16
    // caught this call freeing only `batch`). Same single-flow caveat
    // as the q210 trigger: the mark→free window must not overlap
    // another query persisting frames on this session (freeSince's
    // documented contract).
    val mark = ScaleOps.rddMark(spark)
    var keep: Option[DataFrame] = None
    // the raw batch feeds two consumers (drift MSE scan + the probe's
    // collapse; three on the retrain leg) — materialize once (code
    // review r16); every consumer below is itself materialized before
    // its store mutation
    val batch = batch0.localCheckpoint(true)
    try {
    val drift = semDriftAudit(storedReps, batch, model, dim)
    val retrain = drift
      .agg(coalesce(max(col("retrain")), lit(false)).as("r"))
      .head.getBoolean(0)
    if (!retrain) {
      val (audit0, admitted) = semIngest(batch, model, storedReps, tau,
        maxCell)
      // materialize BEFORE the append: the audit's n_store side reads
      // the reps TABLE lazily, and a post-append evaluation would
      // count the admitted reps as store rows (cell-sized frame)
      val audit = ScaleOps.stageCheckpoint(audit0)
      semStoreAppend(admitted, s"${prefix}_reps")
      keep = Some(audit)
      (audit, false)
    } else {
      val bReps = ScaleOps.stageCheckpoint(Extended10.collapseExact(batch))
      // exact copies of stored vectors drop outright (they would drop
      // as probe hits anyway — splitting them out keeps the merged
      // rep set identical to collapseExact(store ∪ batch)'s VECTOR
      // set, which is what makes the rebuilt model scratch-identical)
      val storeVecs = storedReps.select("e")
      val bFresh = ScaleOps.stageCheckpoint(
        bReps.join(storeVecs, Seq("e"), "left_anti"))
      val merged = storedReps.select("id", "e", "cnt").unionByName(
        bFresh.select("id", "e", "cnt"))
      val (model2, asg2) = semStoreBuildFromReps(merged, dim, kOverride,
        maxCell)
      // origin split on id (fresh-id ingest invariant)
      val bIds = bFresh.select("id")
      val bAsg = asg2.join(bIds, Seq("id"), "left_semi")
        .select("cid", "id", "e", "cnt")
      val sAsg = ScaleOps.stageCheckpoint(
        asg2.join(bIds, Seq("id"), "left_anti")
          .select("cid", "id", "e", "cnt"))
      // exact hits re-enter the audit as pre-flagged rows, celled by
      // the NEW model (same vector as a stored rep → same cell)
      val bExact = bReps.join(storeVecs, Seq("e"), "left_semi")
        .select(model2.assign(col("e")).getField("_1").as("cid"),
          col("id"), col("e"), col("cnt"), lit(true).as("h"))
      val batchCells = bAsg.select("cid")
        .union(bExact.select("cid")).distinct()
      val storeInCells = sAsg.join(batchCells, Seq("cid"), "left_semi")
      val probed = ScaleOps.stageCheckpoint(
        semProbe(bAsg, storeInCells, tau).unionByName(bExact))
      // materialize BEFORE the rewrite: bExact (hence batchCells →
      // storeInCells → the audit's n_store) reads the reps TABLE
      // lazily through storeVecs, and semStoreWrite replaces it
      val audit = ScaleOps.stageCheckpoint(auditOf(probed, storeInCells))
      val newReps = sAsg.unionByName(
        probed.filter(!col("h")).select("cid", "id", "e", "cnt"))
      semStoreWrite(spark, model2, newReps, prefix)
      keep = Some(audit)
      (audit, true)
    }
    } finally ScaleOps.freeSince(spark, mark, keep.toSeq: _*)
  }

  /** q208 — incremental SemDeDup over the embeddings table: vectors
    * with vec_id ≡ 0 (mod 7) arrive as the batch (the q203 split),
    * the rest build the standing cells+reps store. Emits the per-cell
    * probe audit (cid, n_store, n_batch, n_dropped). Store derived
    * inline by default (testdata ships no store — the q200/q203
    * precedent); a pre-built store plugs in via the `graft.sem.store`
    * property / SPARK_GRAFT_SEM_STORE env var naming a table prefix
    * P → tables P_reps (cid, id, e, cnt) and P_model (tcid, sub, k2,
    * ce — [[semModelRows]]'s shape, flat or two-level) — the pair
    * [[semStoreAppend]] + the QSemProf maintenance tier maintain — so
    * the declared query runs EXACTLY the stored-table path with the
    * exact build-time assignment. Rows-only (float cells). */
  def q208SemDedupIncr(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.fanout(Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("e")))
    val batch = emb.filter(pmod(col("id"), lit(7L)) === 0L)
    val (model, reps) = sys.props.get("graft.sem.store")
      .orElse(sys.env.get("SPARK_GRAFT_SEM_STORE")) match {
        case Some(p) =>
          (loadStoredModel(spark, p), spark.table(s"${p}_reps"))
        case None =>
          semStoreBuild(emb.filter(pmod(col("id"), lit(7L)) =!= 0L),
            dim = 64)
      }
    semDedupVsStore(batch, model, reps)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q208_semdedup_incr" -> (q208SemDedupIncr _))

  /** No oracle: cell boundaries are float k-means fixpoints (the
    * q45/q108/q187/q200 precedent) — SemStoreSpec pins the laws. */
  val oracleSql: Map[String, String] = Map.empty
}
