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

  /** The store's quantizer — flat (q200's shape) or two-level
    * (semDedupOnReps's k > 64 regime). `assign` is the build-time
    * assignment UDF (e → struct(cid, d2)); `flatLeaves` is the full
    * leaf (cid, ce) array — the drift audit's view (leaf ids ARE the
    * stored cell ids in both shapes). */
  private[graft] sealed trait SemModel {
    def assign: org.apache.spark.sql.expressions.UserDefinedFunction
    def flatLeaves: Array[(Long, Array[Double])]
    def isEmpty: Boolean = flatLeaves.isEmpty
  }
  private[graft] final case class SemFlat(
      cents: Array[(Long, Array[Double])]) extends SemModel {
    def assign = Clustering.nearestCentroid(cents)
    def flatLeaves: Array[(Long, Array[Double])] = cents
  }
  private[graft] final case class SemTwoLevel(
      m: Clustering.TwoLevelModel) extends SemModel {
    def assign = Clustering.nearestTwoLevel(m)
    def flatLeaves: Array[(Long, Array[Double])] =
      m.subs.toSeq.flatMap { case (tc, arr) =>
        arr.map { case (bc, ce) => (tc * m.k2 + bc, ce) }
      }.sortBy(_._1).toArray
  }

  /** Serialize a model to rows (tcid, sub, k2, ce): flat = leaves
    * only with tcid = −1 and sub = cid; two-level = top rows
    * (sub = −1) + leaf rows (sub = within-cell id). One small table —
    * k·d doubles, the model-artifact class. */
  private[graft] def semModelRows(model: SemModel)
      : Seq[(Long, Long, Int, Seq[Double])] = model match {
    case SemFlat(cents) =>
      cents.toSeq.map { case (cid, ce) => (-1L, cid, 0, ce.toSeq) }
    case SemTwoLevel(m) =>
      m.top.toSeq.map { case (tc, ce) => (tc, -1L, m.k2, ce.toSeq) } ++
        m.subs.toSeq.flatMap { case (tc, arr) =>
          arr.toSeq.map { case (bc, ce) => (tc, bc, m.k2, ce.toSeq) }
        }
  }

  /** Reconstruct the EXACT build-time model (and therefore the exact
    * assignment function) from its table rows. */
  private[graft] def semModelFromRows(
      rows: Seq[(Long, Long, Int, Seq[Double])]): SemModel =
    if (rows.forall(_._1 == -1L))
      SemFlat(rows.sortBy(_._2)
        .map { case (_, cid, _, ce) => (cid, ce.toArray) }.toArray)
    else SemTwoLevel(Clustering.TwoLevelModel(
      k2 = rows.head._3,
      top = rows.filter(_._2 == -1L).sortBy(_._1)
        .map { case (tc, _, _, ce) => (tc, ce.toArray) }.toArray,
      subs = rows.filter(_._2 >= 0L).groupBy(_._1).map {
        case (tc, leaf) => tc -> leaf.sortBy(_._2)
          .map { case (_, bc, _, ce) => (bc, ce.toArray) }.toArray
      }))

  /** Build the store: exact-collapse, size k adaptively from the rep
    * count ([[Extended10.semDedupK]] — cells average ≤ 256 reps), fit
    * the quantizer on a bounded draw (flat at k ≤ 64, two-level
    * beyond — the semDedupOnReps switch, with its lazy empty-draw
    * fallback), assign. Returns the driver-held model and the reps
    * frame (cid, id, e, cnt), materialized so the caller can persist
    * or table it. */
  private[graft] def semStoreBuild(emb: DataFrame, dim: Int,
      kOverride: Option[Int] = None): (SemModel, DataFrame) = {
    val reps = Extended10.collapseExact(emb).persist()
    try {
      val n = reps.count()
      val k = kOverride.getOrElse(Extended10.semDedupK(n))
      val repsSel = reps.select(col("id"), col("e"))
      val model: SemModel =
        if (k > 64) {
          val sample = Clustering.trainingSample(repsSel, k, Some(n))
          var m = Clustering.lloydTwoLevel(sample, k = k, dim = dim,
            maxIters = 4)
          if (m.top.isEmpty && (sample ne repsSel))
            m = Clustering.lloydTwoLevel(repsSel, k = k, dim = dim,
              maxIters = 4)
          SemTwoLevel(m)
        } else SemFlat(Clustering.fitCentroidsSampled(repsSel, k, dim,
          maxIters = 4))
      val out =
        if (model.isEmpty)
          reps.select(lit(0L).as("cid"), col("id"), col("e"), col("cnt"))
            .limit(0)
        else reps.select(
          model.assign(col("e")).getField("_1").as("cid"),
          col("id"), col("e"), col("cnt"))
      (model, ScaleOps.stageCheckpoint(out))
    } finally reps.unpersist()
  }

  /** The probe core: batch reps (cid, id, e, cnt) extended with the
    * sequential-contract hit flag `h` — true iff the rep has a
    * cosine ≥ τ neighbour among the store's reps in its cell or an
    * earlier (lower id) batch rep in its cell. Both joins are cell
    * equi-joins; the store side arrives ALREADY semi-reduced to the
    * batch's cells (the caller's contract, ∝ batch). */
  private[graft] def semProbe(bReps: DataFrame, storeInCells: DataFrame,
      tau: Double): DataFrame = {
    import graft.functions.CosineSim.cosineSim
    val storeHit = bReps.select(col("cid"), col("id"), col("e").as("eb"))
      .join(storeInCells.select(col("cid"), col("e").as("es")), Seq("cid"))
      .filter(cosineSim(col("eb"), col("es")) >= tau)
      .select("id").distinct()
    val a = bReps.select(col("cid"), col("id"), col("e").as("ea"))
    val b = bReps.select(col("cid"), col("id").as("id2"),
      col("e").as("eb2"))
    val earlierHit = a.join(b, Seq("cid"))
      .filter(col("id2") < col("id"))
      .filter(cosineSim(col("ea"), col("eb2")) >= tau)
      .select("id").distinct()
    val hit = storeHit.union(earlierHit).distinct()
      .withColumn("h0", lit(true))
    bReps.join(hit, Seq("id"), "left")
      .select(col("cid"), col("id"), col("e"), col("cnt"),
        coalesce(col("h0"), lit(false)).as("h"))
  }

  /** Incremental SemDeDup of a batch against the stored cells+reps:
    * the per-cell audit (cid, n_store, n_batch, n_dropped) —
    * multiplicity-weighted like q187's (a hit rep drops all its cnt
    * rows; an admitted rep keeps one and drops its cnt − 1 exact
    * copies), n_store = stored reps in the cell (0 for a cell only
    * the batch touched). Work ∝ batch: one collapse shuffle, one
    * in-row assignment, one semi-join, two bounded within-cell
    * pair joins. */
  private[graft] def semDedupVsStore(batch: DataFrame,
      model: SemModel, storedReps: DataFrame,
      tau: Double = Tau): DataFrame = {
    if (model.isEmpty)
      return batch.select(lit(0L).as("cid"), lit(0L).as("n_store"),
        lit(0L).as("n_batch"), lit(0L).as("n_dropped")).limit(0)
    val bReps = ScaleOps.stageCheckpoint(
      Extended10.collapseExact(batch).select(
        model.assign(col("e")).getField("_1").as("cid"),
        col("id"), col("e"), col("cnt")))
    // semi-reduce the store to the batch's cells FIRST — the only
    // store read the probe does, ∝ batch cells
    val storeInCells = storedReps
      .join(bReps.select("cid").distinct(), Seq("cid"), "left_semi")
    val probed = semProbe(bReps, storeInCells, tau)
    probed.groupBy("cid")
      .agg(sum(col("cnt")).as("n_batch"),
        sum(when(col("h"), col("cnt")).otherwise(col("cnt") - 1))
          .as("n_dropped"))
      .join(storeInCells.groupBy("cid").agg(count(lit(1)).as("n_store")),
        Seq("cid"), "left")
      .select(col("cid"), coalesce(col("n_store"), lit(0L)).as("n_store"),
        col("n_batch"), col("n_dropped"))
      .orderBy("cid")
  }

  /** The admitted (un-hit) batch reps in store schema — the blind-
    * append payload. Exact copies of an admitted rep are ABSORBED
    * into its cnt (the collapse), so the store stays one row per
    * distinct surviving vector. */
  private[graft] def semAdmitted(batch: DataFrame,
      model: SemModel, storedReps: DataFrame,
      tau: Double = Tau): DataFrame = {
    require(!model.isEmpty, "cannot admit into an empty-model store")
    val bReps = ScaleOps.stageCheckpoint(
      Extended10.collapseExact(batch).select(
        model.assign(col("e")).getField("_1").as("cid"),
        col("id"), col("e"), col("cnt")))
    val storeInCells = storedReps
      .join(bReps.select("cid").distinct(), Seq("cid"), "left_semi")
    semProbe(bReps, storeInCells, tau)
      .filter(!col("h"))
      .select("cid", "id", "e", "cnt")
  }

  /** Blind bucketed append of reps (store build or admitted batch)
    * into the standing reps table — never reads the store; an
    * existing table's bucket spec wins (ADVICE r14). Bucketing by cid
    * co-locates the probe's cell joins with the store side at rest. */
  private[graft] def semStoreAppend(reps: DataFrame, table: String,
      nBuckets: Int = 32): Unit =
    ScaleOps.stageCheckpoint(reps.select("cid", "id", "e", "cnt"))
      .write.mode("append")
      .bucketBy(ScaleOps.appendBuckets(reps.sparkSession, table, nBuckets),
        "cid")
      .sortBy("cid")
      .saveAsTable(table)

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
      // the flat LEAVES: stored rows look their own cell up (k-free);
      // the audit's batch-side flat argmin is measurement, not
      // assignment (its d2 lower-bounds the two-level assignment's)
      model.flatLeaves,
      batch.select(col("id").as("vec_id"), col("e").as("e0")),
      dim)

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
          // k·d doubles — the model-artifact collect class
          val rows = spark.table(s"${p}_model").collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
              r.getSeq[Double](3))).toSeq
          (semModelFromRows(rows), spark.table(s"${p}_reps"))
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
