package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: q153 signature-store tier probe — the ingest/maintenance
  * split for incremental MinHash near-dedup (the QSpanProbe shape
  * applied to the LSH band table).
  *
  *   runMain graft.QSigProbe [srcDir] [workDir]
  *
  * Corpus: the tier documents table is the standing store; the batch is
  * a planted near-duplicate copy of every 7th doc (suffix-perturbed,
  * doc_id + 1e11 — the tier corpora carry ids up to ~1e10, so the
  * plantedCorpus +1e6 offset would collide). Stages:
  *   full          — batch vs an inline-derived store band table (the
  *                   from-scratch shape the declared q153 runs)
  *   build         — sigBands(store) written to parquet (the ingest
  *                   artifact; ∝ corpus, paid once per generation)
  *   probe         — batch vs the stored table read back (the recurring
  *                   maintenance cost; ∝ batch)
  *   buildBucketed/probeBucketed — same, bucketed by BOTH join keys
  *                   (band_idx, band_key):
  *                   requireAllClusterKeysForCoPartition defaults to
  *                   true since Spark 3.3, so a band_key-only layout
  *                   does NOT co-partition the join (measured: plain
  *                   and bucketed tied at 5 exchanges). Two join
  *                   regimes asserted: with a broadcastable batch
  *                   (default) the planner broadcasts the BATCH bands
  *                   and the store streams shuffle-free for plain
  *                   parquet too (bucketing must not add an exchange);
  *                   with broadcast forced off (probeNoBroadcast /
  *                   probeBucketedNoBroadcast — the big-ingest tier
  *                   where the batch exceeds the broadcast limit) the
  *                   plain store must shuffle into the band join while
  *                   the bucketed store must not
  *   mergeBucketed — sigStoreAppend of the batch's band rows into the
  *                   bucketed table; must cost ∝ batch (vs buildBucketed
  *                   = the full rebuild), and the post-merge row count
  *                   is asserted ≡ the rebuilt combined table's
  *                   (set-level equality is SigStoreSpec's pin)
  *   declared.probeBucketed — the DECLARED q153 entry against a
  *                   bucketed store via graft.sig.store, on the sf0.1
  *                   testdata (the declared query's own corpus).
  */
object QSigProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/tmp/graft_scale100"
    val work = if (args.length > 1) args(1) else "/tmp/graft_sig_probe"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", s"$work/warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"SIGPROBE $name ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val store = spark.read.parquet(s"$src/documents.parquet")
      .select("doc_id", "text")
    val batch = store.filter(pmod(col("doc_id"), lit(7L)) === 0L)
      .select((col("doc_id") + 100000000000L).as("doc_id"),
        concat(col("text"), lit(" planted near duplicate suffix")).as("text"))

    timed("full") {
      noop(ops.Similarity.dedupVsSigStore(batch, ops.Similarity.sigBands(store)))
    }
    spark.catalog.clearCache()
    timed("build") {
      ops.Similarity.sigBands(store).write.mode(SaveMode.Overwrite)
        .parquet(s"$work/sigbands.parquet")
    }
    val idx = spark.read.parquet(s"$work/sigbands.parquet")
    timed("probe") { noop(ops.Similarity.dedupVsSigStore(batch, idx)) }
    spark.catalog.clearCache()
    timed("buildBucketed") {
      ops.ScaleOps.writeBucketedState(ops.Similarity.sigBands(store),
        "sig_bands_probe", s"$work/sigbands-b", Seq("band_idx", "band_key"), 32)
    }
    spark.catalog.clearCache()
    timed("probeBucketed") {
      noop(ops.Similarity.dedupVsSigStore(batch, spark.table("sig_bands_probe")))
    }
    spark.catalog.clearCache()
    def exchanges(i: DataFrame): Int =
      "Exchange hashpartitioning".r.findAllIn(
        ops.Similarity.dedupVsSigStore(batch, i)
          .queryExecution.executedPlan.toString).length
    def storeShuffleFree(i: DataFrame): Boolean = {
      // the store side streams without an exchange iff no
      // hashpartitioning on the band keys appears (batch-side
      // exchanges are on doc_id / new_id / the distinct triple)
      val plan = ops.Similarity.dedupVsSigStore(batch, i)
        .queryExecution.executedPlan.toString
      !"Exchange hashpartitioning\\(band_idx".r.findFirstIn(plan).isDefined
    }
    // regime 1 — batch broadcastable (the default small-batch serving
    // posture): the planner broadcasts the BATCH bands, so the store
    // streams shuffle-free for plain parquet too; bucketing must never
    // ADD an exchange (the q187 dup-regime precedent)
    val plainEx = exchanges(idx)
    val bucketEx = exchanges(spark.table("sig_bands_probe"))
    println(s"SIGPROBE exchanges.broadcast plain=$plainEx bucketed=$bucketEx")
    require(bucketEx <= plainEx,
      s"bucketing must not add exchanges ($plainEx -> $bucketEx)")
    require(storeShuffleFree(idx) && storeShuffleFree(spark.table("sig_bands_probe")),
      "store side must stream shuffle-free when the batch broadcasts")
    spark.catalog.clearCache()
    // regime 2 — batch too large to broadcast (the big-ingest tier):
    // force the join off broadcast; the plain store must then shuffle
    // into the band join while the bucketed store must not — bucketing
    // removes exactly the store-side exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      timed("probeNoBroadcast") {
        noop(ops.Similarity.dedupVsSigStore(batch, idx))
      }
      spark.catalog.clearCache()
      timed("probeBucketedNoBroadcast") {
        noop(ops.Similarity.dedupVsSigStore(batch, spark.table("sig_bands_probe")))
      }
      spark.catalog.clearCache()
      val plainEx2 = exchanges(idx)
      val bucketEx2 = exchanges(spark.table("sig_bands_probe"))
      println(s"SIGPROBE exchanges.noBroadcast plain=$plainEx2 bucketed=$bucketEx2")
      require(bucketEx2 < plainEx2,
        s"bucketed store must drop the store-side exchange " +
          s"(plain=$plainEx2 bucketed=$bucketEx2)")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.catalog.clearCache()
    timed("mergeBucketed") {
      ops.Similarity.sigStoreAppend(batch, "sig_bands_probe")
    }
    spark.catalog.clearCache()
    val mergedCnt = spark.table("sig_bands_probe").count()
    val rebuiltCnt =
      ops.Similarity.sigBands(store.unionByName(batch)).count()
    spark.catalog.clearCache()
    println(s"SIGPROBE merged=$mergedCnt rebuilt=$rebuiltCnt")
    require(mergedCnt == rebuiltCnt,
      s"append must reproduce the combined band table ($mergedCnt != $rebuiltCnt)")

    // declared entry over its own corpus (sf0.1), bucketed store path
    val sfDir = "/root/testdata/sf0.1"
    val declStore = ops.Similarity.plantedCorpus(spark, sfDir)
      .filter(col("doc_id") < 1000000L)
    ops.ScaleOps.writeBucketedState(ops.Similarity.sigBands(declStore),
      "sig_bands_declared", s"$work/declared-sigbands-b", Seq("band_idx", "band_key"), 32)
    spark.catalog.clearCache()
    sys.props("graft.sig.store") = "sig_bands_declared"
    try timed("declared.probeBucketed") {
      noop(ops.Similarity.q153IncrementalDedup(spark, sfDir))
    } finally sys.props.remove("graft.sig.store")
    spark.catalog.clearCache()

    spark.stop()
  }
}
