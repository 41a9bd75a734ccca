package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: the q197-vs-q199 dense-term scale story at a tier dir
  * (QScale output or a plain sf dir). Measures wall time for:
  *   - q197_brute         — the full-corpus dense scan (the r9/r10
  *                          `weak` mark being retired)
  *   - q199_inline_cK     — IVF build + query in one run, nCells = K
  *   - ivf_build_cK       — index build alone, written as
  *                          cell-PARTITIONED parquet (the ingest path)
  *   - q199_prebuilt_cK   — query over the prebuilt index (the
  *                          amortized vector-store posture; the probe
  *                          join's cell filter prunes partitions)
  * Per-query RDD/cache hygiene between timings mirrors Bench, and the
  * JVM warms up (entry noop, Bench's rule) BEFORE the first timing so
  * the first stage is not codegen-inflated. Usage:
  *   runMain graft.QIvfProbe [tierDir] [nCellsCsv] [noinline] [nobrute] [nobuild] [append]
  * `append` adds the q200 stage: assign a ~0.1% batch against the
  * stored centroids and write the delta files (ivf_append_cK) — read
  * it against ivf_build_cK to see append ∝ batch, not corpus.
  * (the flags skip the inline / brute / index-build stages so a tier
  * can be split across invocations under a wall-clock cap; nobuild
  * reuses the index + centroid parquet a prior build wrote — the
  * clean one-window comparison is a build-only run followed by a
  * nobuild run timing brute and the amortized queries warm)
  */
object QIvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_scale100"
    val cellsList =
      if (args.length > 1) args(1).split(",").map(_.trim.toInt)
      else Array(16, 64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    def timed(label: String)(f: => Unit): Unit = {
      val before = sc.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      f
      println(f"IVFPROBE $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      spark.catalog.clearCache()
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!before.contains(id)) rdd.unpersist(blocking = true)
      }
    }
    def docs() = Tables.fanout(
      Tables.documents(spark, dir).select("doc_id", "text"))
    def emb() = Tables.fanout(Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e0")))

    val noInline = args.contains("noinline")
    val noBrute = args.contains("nobrute")
    val noBuild = args.contains("nobuild")
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    if (!noBrute) timed("q197_brute") {
      ops.Extended10.q197RrfHybrid(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    cellsList.foreach { nc =>
      if (!noInline) timed(s"q199_inline_c$nc") {
        val (out, caches) =
          ops.Extended10.rrfHybridIvfPlan(docs(), emb(), dim = 64,
            nCells = nc)
        try out.write.format("noop").mode("overwrite").save()
        finally caches.foreach(_.unpersist())
      }
      val idxDir = s"/tmp/graft_ivf_idx_c$nc"
      val centsDir = s"/tmp/graft_ivf_cents_c$nc"
      var cents: Array[(Long, Array[Double])] = Array.empty
      if (!noBuild) timed(s"ivf_build_c$nc") {
        val (index, cs) = ops.Extended10.ivfIndex(emb(), dim = 64,
          nCells = nc)
        cents = cs
        // one file per cell, vec_id-sorted inside: the partition dir
        // prunes the probe's cell filter at the listing, the tight
        // per-row-group vec_id stats prune the query-vector lookup —
        // without the sort, vec_ids are scattered and the 5-row isin
        // lookup decodes the fat embedding column corpus-wide
        index.repartition(col("cell")).sortWithinPartitions("vec_id")
          .write.partitionBy("cell").mode(SaveMode.Overwrite)
          .parquet(idxDir)
        import spark.implicits._
        cs.toSeq.map { case (cid, ce) => (cid, ce.toSeq) }
          .toDF("cid", "ce").coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(centsDir)
      }
      if (noBuild)
        cents = spark.read.parquet(centsDir).select("cid", "ce").collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      timed(s"q199_prebuilt_c$nc") {
        val index = spark.read.parquet(idxDir)
        val (out, caches) =
          ops.Extended10.rrfHybridIvfQuery(docs(), index, cents, nProbe = 4)
        try out.write.format("noop").mode("overwrite").save()
        finally caches.foreach(_.unpersist())
      }
      // q200 incremental maintenance: append a ~0.1% batch to the
      // prebuilt index — one argmin pass over the BATCH + a
      // partitioned write of batch-sized delta files; the stored
      // index is never read. Compare against ivf_build_cK (the full
      // rebuild) to see append cost ∝ batch, not corpus. The delta
      // lands in its own dir (production appends new files beside the
      // old; keeping the probe dir immutable keeps reruns comparable).
      if (args.contains("append")) timed(s"ivf_append_c$nc") {
        // the batch is DRAWN from the indexed corpus, so offset its
        // ids out of the stored range (ADVICE r12): the delta then
        // never duplicates an index row if someone later reads
        // delta + index together; geometry — and thus the timing this
        // probe exists for — is unchanged
        val batch = emb().filter(pmod(col("vec_id"), lit(1000L)) === 7)
          .withColumn("vec_id", col("vec_id") + lit(1000000000000L))
        ops.Extended10.ivfAppend(cents, batch, dim = 64)
          .repartition(col("cell")).sortWithinPartitions("vec_id")
          .write.partitionBy("cell").mode(SaveMode.Overwrite)
          .parquet(s"/tmp/graft_ivf_delta_c$nc")
      }
    }
    spark.stop()
  }
}
