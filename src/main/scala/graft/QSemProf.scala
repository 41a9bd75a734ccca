package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does the declared q187 spend its time on a
  * DISTINCT-vector corpus (adaptive k, two-level quantizer)? Times the
  * stages the declared plan composes, each materialized independently
  * in one session:
  *   collapse  — exact-collapse groupBy + the nReps count
  *   fit       — trainingSample + lloydTwoLevel at the adaptive k
  *   assign    — rep assignment argmin (noop write of (id, cid))
  *   full      — the whole declared query (pairing + CC + audit =
  *               full − the above, plus re-run overlap: each stage
  *               here RE-RUNS its predecessors since the declared
  *               plan persists only reps/asg internally)
  * Usage: runMain graft.QSemProf [dir]
  */
object QSemProf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_distinct200k"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_semprof/warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"SEMPROF $label%-10s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    }
    def emb() = Tables.fanout(Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("e")))
    def collapse() = ops.Extended10.collapseExact(emb())
    // warmup (codegen) outside timings
    emb().limit(10).write.format("noop").mode("overwrite").save()
    var nReps = 0L
    timed("collapse") { nReps = collapse().count() }
    val k = ops.Extended10.semDedupK(nReps)
    println(s"SEMPROF nReps=$nReps k=$k")
    var model: ops.Clustering.TwoLevelModel = null
    timed("fit") {
      val reps = collapse().persist()
      reps.count()
      model = ops.Clustering.lloydTwoLevel(
        ops.Clustering.trainingSample(reps.select(col("id"), col("e")),
          k, Some(nReps)),
        k = k, dim = 64, maxIters = 4)
      reps.unpersist()
    }
    timed("assign") {
      collapse().select(col("id"),
          ops.Clustering.nearestTwoLevel(model)(col("e"))
            .getField("_1").as("cid"))
        .write.format("noop").mode("overwrite").save()
    }
    var outRows: Array[org.apache.spark.sql.Row] = Array.empty
    timed("full") {
      // collect instead of noop-write: the output is cell-sized
      // (k + split cells rows), and the summary line below needs it
      outRows = ops.Extended10.q187SemDedup(spark, dir).collect()
    }
    // split-guard visibility (r13): on a distinct-vector corpus
    // n_members IS the rep count, so maxMembers ≤ 1024 shows the
    // worst-case population bound held; maxCid above the adaptive k
    // shows the recursive split actually fired (split cids allocate
    // above the pre-split max)
    if (outRows.nonEmpty)
      println(s"SEMPROF cells=${outRows.length}" +
        s" maxMembers=${outRows.map(_.getLong(1)).max}" +
        s" maxCid=${outRows.map(_.getLong(0)).max}")
    // q208 maintenance tier: build the cells+reps store once (∝ corpus,
    // the generation cost), then probe an arriving batch against the
    // STORED tables through the declared q208 — must sit far under
    // `full` (the probe never re-quantizes or re-pairs the corpus,
    // only the batch's cells)
    val batchFrac = emb().filter(pmod(col("id"), lit(7L)) === 0L)
    val storeFrac = emb().filter(pmod(col("id"), lit(7L)) =!= 0L)
    spark.sql("DROP TABLE IF EXISTS sem_prof_reps")
    spark.sql("DROP TABLE IF EXISTS sem_prof_model")
    // the in-memory catalog is fresh per JVM, so DROP alone leaves a
    // stale managed-table LOCATION from a previous run on disk and the
    // create fails with LOCATION_ALREADY_EXISTS — remove the dirs too
    Seq("sem_prof_reps", "sem_prof_model").foreach { t =>
      FsUtil.deleteRecursively(s"/tmp/graft_semprof/warehouse/$t")
    }
    timed("store.build") {
      val (model, reps) = ops.SemStoreOps.semStoreBuild(storeFrac,
        dim = 64)
      ops.SemStoreOps.semStoreAppend(reps, "sem_prof_reps")
      import spark.implicits._
      ops.SemStoreOps.semModelRows(model)
        .toDF("tcid", "sub", "k2", "ce").write.mode("overwrite")
        .saveAsTable("sem_prof_model")
    }
    sys.props("graft.sem.store") = "sem_prof"
    try timed("probe") {
      ops.SemStoreOps.q208SemDedupIncr(spark, dir)
        .write.format("noop").mode("overwrite").save()
    } finally sys.props.remove("graft.sem.store")
    spark.catalog.clearCache()
    // the REAL maintenance loop shape (audit + admitted from ONE
    // probe pass — code review r15: calling the two public entries
    // separately re-ran the whole probe)
    timed("ingest") {
      val model = ops.SemStoreOps.semModelFromRows(
        spark.table("sem_prof_model").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
            r.getSeq[Double](3))).toSeq)
      val (audit, admitted) = ops.SemStoreOps.semIngest(
        batchFrac, model, spark.table("sem_prof_reps"))
      audit.write.format("noop").mode("overwrite").save()
      admitted.write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()
    timed("drift.audit") {
      // constructed INSIDE the timed block: the audit materializes
      // its k-row frame eagerly on construction
      ops.SemStoreOps.semDriftAudit(
          spark.table("sem_prof_reps"),
          batchFrac,
          ops.SemStoreOps.semModelFromRows(
            spark.table("sem_prof_model").collect()
              .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
                r.getSeq[Double](3))).toSeq),
          dim = 64)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
