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
  * centroid model rides the closure. A batch whose vectors the frozen
  * quantizer no longer fits concentrates into few cells AND lands far
  * from every centroid — exactly what [[semDriftAudit]] (q200's 2×
  * MSE trigger, reused verbatim) flags as retrain-due. The quantizer
  * is the FLAT fit/argmin pair — deliberately q200's exact store
  * shape, and what a (cid, ce) table can serialize; at adaptive k
  * over ≥10⁸ distinct reps the flat O(k·d) per-row assignment becomes
  * the build/probe wall q187 already solved, and the known upgrade is
  * the same one: fit with [[Clustering.lloydTwoLevel]] and persist
  * top + leaf tables so assignment is O(√k·d) (semDedupOnReps's
  * k > 64 switch) — leaf cells remain flat (cid, ce) rows, so the
  * probe and append halves here are unchanged by it.
  */
object SemStoreOps {

  private val Tau = 0.99

  /** Build the store: exact-collapse, size k adaptively from the rep
    * count ([[Extended10.semDedupK]] — cells average ≤ 256 reps), fit
    * the quantizer on a bounded draw, assign. Returns the driver-held
    * centroid model and the reps frame (cid, id, e, cnt),
    * materialized so the caller can persist or table it. */
  private[graft] def semStoreBuild(emb: DataFrame, dim: Int,
      kOverride: Option[Int] = None)
      : (Array[(Long, Array[Double])], DataFrame) = {
    val reps = Extended10.collapseExact(emb).persist()
    try {
      val n = reps.count()
      val k = kOverride.getOrElse(Extended10.semDedupK(n))
      val cents = Clustering.fitCentroidsSampled(
        reps.select(col("id"), col("e")), k, dim, maxIters = 4)
      val out =
        if (cents.isEmpty)
          reps.select(lit(0L).as("cid"), col("id"), col("e"), col("cnt"))
            .limit(0)
        else reps.select(
          Clustering.nearestCentroid(cents)(col("e")).getField("_1")
            .as("cid"),
          col("id"), col("e"), col("cnt"))
      (cents, ScaleOps.stageCheckpoint(out))
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
      cents: Array[(Long, Array[Double])], storedReps: DataFrame,
      tau: Double = Tau): DataFrame = {
    if (cents.isEmpty)
      return batch.select(lit(0L).as("cid"), lit(0L).as("n_store"),
        lit(0L).as("n_batch"), lit(0L).as("n_dropped")).limit(0)
    val bReps = ScaleOps.stageCheckpoint(
      Extended10.collapseExact(batch).select(
        Clustering.nearestCentroid(cents)(col("e")).getField("_1")
          .as("cid"),
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
      cents: Array[(Long, Array[Double])], storedReps: DataFrame,
      tau: Double = Tau): DataFrame = {
    require(cents.nonEmpty, "cannot admit into an empty-model store")
    val bReps = ScaleOps.stageCheckpoint(
      Extended10.collapseExact(batch).select(
        Clustering.nearestCentroid(cents)(col("e")).getField("_1")
          .as("cid"),
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
      batch: DataFrame, cents: Array[(Long, Array[Double])],
      dim: Int): DataFrame =
    Extended10.ivfAppendAudit(
      storedReps.select(col("id").as("vec_id"), col("e").as("e0"),
        col("cid").as("cell")),
      cents,
      batch.select(col("id").as("vec_id"), col("e").as("e0")),
      dim)

  /** q208 — incremental SemDeDup over the embeddings table: vectors
    * with vec_id ≡ 0 (mod 7) arrive as the batch (the q203 split),
    * the rest build the standing cells+reps store. Emits the per-cell
    * probe audit (cid, n_store, n_batch, n_dropped). Store derived
    * inline by default (testdata ships no store — the q200/q203
    * precedent); a pre-built store plugs in via the `graft.sem.store`
    * property / SPARK_GRAFT_SEM_STORE env var naming a table prefix
    * P → tables P_reps (cid, id, e, cnt) and P_cents (cid, ce) — the
    * pair [[semStoreAppend]] + the QSemProf maintenance tier
    * maintain — so the declared query runs EXACTLY the stored-table
    * path. Rows-only (float cells). */
  def q208SemDedupIncr(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.fanout(Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("e")))
    val batch = emb.filter(pmod(col("id"), lit(7L)) === 0L)
    val (cents, reps) = sys.props.get("graft.sem.store")
      .orElse(sys.env.get("SPARK_GRAFT_SEM_STORE")) match {
        case Some(p) =>
          // k·d doubles — the model-artifact collect class
          val c = spark.table(s"${p}_cents").collect()
            .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
          (c, spark.table(s"${p}_reps"))
        case None =>
          semStoreBuild(emb.filter(pmod(col("id"), lit(7L)) =!= 0L),
            dim = 64)
      }
    semDedupVsStore(batch, cents, reps)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q208_semdedup_incr" -> (q208SemDedupIncr _))

  /** No oracle: cell boundaries are float k-means fixpoints (the
    * q45/q108/q187/q200 precedent) — SemStoreSpec pins the laws. */
  val oracleSql: Map[String, String] = Map.empty
}
