package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: q202/q203 tier probe — the ingest/maintenance split.
  *
  *   runMain graft.QSpanProbe [srcDir] [workDir]
  *
  * Stages (wall on this host is throttle-noisy; compare within one
  * window):
  *   full         — q202 over the whole tier corpus (from-scratch dedup)
  *   build        — spanIndex over the 6/7 "store" docs, written to
  *                  parquet (the ingest artifact; ∝ corpus, paid once
  *                  per generation)
  *   probe        — q203 core: 1/7 batch vs the stored index read back
  *                  (the recurring maintenance cost)
  *   buildBucketed/probeBucketed — same, with the index written as a
  *                  bucketed table (ScaleOps.writeBucketedState): the
  *                  store side must show NO exchange in the probe plan
  *                  (asserted), so only batch digests cross the wire.
  *   mergeBucketed  — the store-update half (q200 ivfAppend analogue):
  *                  spanIndexAppend of the batch's new digests into the
  *                  bucketed table; must cost ∝ batch (vs buildBucketed
  *                  = full rebuild), and the post-merge set is asserted
  *                  ≡ the rebuilt combined index.
  *   declared.probeBucketed — the DECLARED q203 entry run against the
  *                  bucketed store via the graft.span.store property:
  *                  the maintenance tier is a property of the shipped
  *                  operator, not probe-only plumbing.
  *   keyed.buildBucketed/probeBucketed/append — the q205 keep-first
  *                  lifecycle over the KEYED index (digest → min
  *                  corpus key): blind batch append (version rows,
  *                  merge-on-read), probe ∝ batch.
  *                  SPARK_GRAFT_SPAN_KEYED_ONLY=1 runs just these.
  *
  * Two corpora exercise the two regimes (the q187 dup/distinct probe
  * precedent): the QScale replica corpus (every interior span ~K×
  * duplicated — dup-heavy, small distinct-digest store) and a
  * synthesized distinct-heavy corpus (50-token docs over a wide token
  * id space — the store index is corpus-sized and CANNOT broadcast,
  * which is what makes the bucketed layout matter).
  */
object QSpanProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/tmp/graft_scale100"
    val work = if (args.length > 1) args(1) else "/tmp/graft_span_probe"
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
      println(f"SPANPROBE $name ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def runCorpus(tag: String, docs: DataFrame,
        storeBroadcastable: Boolean): Unit = {
      val batch = docs.filter(pmod(col("doc_id"), lit(7L)) === 0L)
      val store = docs.filter(pmod(col("doc_id"), lit(7L)) =!= 0L)
      timed(s"$tag.full") { noop(ops.SpanOps.spanDedup(docs)) }
      spark.catalog.clearCache()
      timed(s"$tag.build") {
        ops.SpanOps.spanIndex(store).write.mode(SaveMode.Overwrite)
          .parquet(s"$work/$tag-spanidx.parquet")
      }
      val idx = spark.read.parquet(s"$work/$tag-spanidx.parquet")
      timed(s"$tag.probe") { noop(ops.SpanOps.spanDedupVsStore(batch, idx)) }
      spark.catalog.clearCache()
      timed(s"$tag.buildBucketed") {
        ops.ScaleOps.writeBucketedState(ops.SpanOps.spanIndex(store),
          s"span_idx_${tag}", s"$work/$tag-spanidx-b", "g", 32)
      }
      spark.catalog.clearCache()
      val probed = ops.SpanOps.spanDedupVsStore(batch,
        spark.table(s"span_idx_${tag}"))
      timed(s"$tag.probeBucketed") { noop(probed) }
      spark.catalog.clearCache()
      // the bucketed claim, ASSERTED per regime with the regime's OWN
      // batch. In the regime where the store digest set is too big to
      // broadcast (dist), the bucketed probe must need exactly one
      // fewer hash exchange than the plain-parquet probe — the store
      // side's. In the dup regime the distinct store set is SMALL and
      // the planner broadcasts it for the plain index too (also
      // store-shuffle-free), so bucketing is moot there: assert only
      // that it never ADDS an exchange.
      def exchanges(i: DataFrame): Int =
        "Exchange hashpartitioning".r.findAllIn(
          ops.SpanOps.spanDedupVsStore(batch, i)
            .queryExecution.executedPlan.toString).length
      val plainEx = exchanges(idx)
      val bucketEx = exchanges(spark.table(s"span_idx_${tag}"))
      println(s"SPANPROBE $tag.exchanges plain=$plainEx bucketed=$bucketEx")
      if (storeBroadcastable)
        require(bucketEx <= plainEx,
          s"bucketing must not add exchanges ($plainEx -> $bucketEx)")
      else
        // strictly fewer, not exactly-one-fewer: the count is taken on
        // the pre-execution plan string, and AQE may convert other
        // joins at runtime (r13 ADVICE) — the store-side removal is
        // what the bucketing buys, the rest is planner latitude
        require(bucketEx < plainEx,
          s"bucketed store must drop the store-side exchange " +
            s"(plain=$plainEx bucketed=$bucketEx)")
      spark.catalog.clearCache()
      // the store-update half (q200 ivfAppend analogue): merge the
      // admitted batch's digests into the bucketed index — cost must
      // sit at batch scale (compare to $tag.buildBucketed = the full
      // rebuild), and the post-merge index must equal the combined set
      timed(s"$tag.mergeBucketed") {
        ops.SpanOps.spanIndexAppend(spark, batch, s"span_idx_${tag}")
      }
      spark.catalog.clearCache()
      val mergedCnt = spark.table(s"span_idx_${tag}").count()
      val rebuiltCnt = ops.SpanOps.spanIndex(docs).count()
      spark.catalog.clearCache()
      println(s"SPANPROBE $tag.merged=$mergedCnt rebuilt=$rebuiltCnt")
      require(mergedCnt == rebuiltCnt,
        s"append must reproduce the combined digest set ($mergedCnt != $rebuiltCnt)")
    }

    // the declared q203 entry runs the SAME bucketed-store path via the
    // graft.span.store escape hatch — the maintenance tier is a property
    // of the shipped operator, not the probe (r13 verdict item 5). The
    // dup-regime corpus IS $src/documents.parquet, so the declared
    // reader sees it; the store table must predate the merge stage,
    // so build it separately here.
    def declaredBucketed(): Unit = {
      val docs = spark.read.parquet(s"$src/documents.parquet")
        .select("doc_id", "text")
      val store = docs.filter(pmod(col("doc_id"), lit(7L)) =!= 0L)
      ops.ScaleOps.writeBucketedState(ops.SpanOps.spanIndex(store),
        "span_idx_declared", s"$work/declared-spanidx-b", "g", 32)
      spark.catalog.clearCache()
      sys.props("graft.span.store") = "span_idx_declared"
      try timed("declared.probeBucketed") {
        noop(ops.SpanOps.q203SpanDedupIncr(spark, src))
      } finally sys.props.remove("graft.span.store")
      spark.catalog.clearCache()
    }

    // q205 keyed-store stages (the keep-first maintenance tier): build
    // the keyed index, probe, blind-append a batch (version rows), and
    // verify probe-result invariance vs the rebuilt index. Runs on the
    // tier documents corpus; SPARK_GRAFT_SPAN_KEYED_ONLY=1 skips the
    // q202/q203 stages so this can run standalone at big tiers.
    def keyedStages(): Unit = {
      val docs = spark.read.parquet(s"$src/documents.parquet")
        .select("doc_id", "text")
      val batch = docs.filter(pmod(col("doc_id"), lit(7L)) === 0L)
      val store = docs.filter(pmod(col("doc_id"), lit(7L)) =!= 0L)
      timed("keyed.buildBucketed") {
        ops.ScaleOps.writeBucketedState(ops.SpanOps.spanIndexKeyed(store),
          "span_kidx_probe", s"$work/span-kidx-b", "g", 32)
      }
      spark.catalog.clearCache()
      timed("keyed.probeBucketed") {
        noop(ops.SpanOps.spanDedupKeepFirstVsStore(batch,
          spark.table("span_kidx_probe")))
      }
      spark.catalog.clearCache()
      timed("keyed.append") {
        ops.SpanOps.spanKeyedAppend(batch, "span_kidx_probe")
      }
      spark.catalog.clearCache()
      val versions = spark.table("span_kidx_probe").count()
      val distinctG = spark.table("span_kidx_probe")
        .select("g").distinct().count()
      println(s"SPANPROBE keyed.rows=$versions distinctDigests=$distinctG")
      require(versions >= distinctG, "version rows can only add")
      spark.catalog.clearCache()
    }

    if (sys.env.get("SPARK_GRAFT_SPAN_KEYED_ONLY").contains("1")) {
      keyedStages(); spark.stop(); return
    }

    // regime 1: the QScale replica corpus (dup-heavy — the distinct
    // digest set stays corpus-of-origin-sized and broadcasts)
    runCorpus("dup",
      spark.read.parquet(s"$src/documents.parquet").select("doc_id", "text"),
      storeBroadcastable = true)
    declaredBucketed()
    keyedStages()

    // regime 2: distinct-heavy — 50-token docs over a wide id space;
    // multiplying by a large odd constant mod a wide vocab makes
    // within-corpus 8-span collisions negligible, so the store index
    // is ~43 digests per store doc and cannot broadcast
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_SPAN_DOCS", "500000").toLong
    val distinct = spark.range(nDocs).toDF("doc_id")
      .select(col("doc_id"), concat_ws(" ",
        transform(sequence(lit(0L), lit(49L)), i =>
          concat(lit("w"), pmod((col("doc_id") * 50L + i) *
            lit(2654435761L), lit(20000000L))))).as("text"))
      // token ids carry digits, which the [^a-z]+ tokenizer strips —
      // spell them as letters instead
      .select(col("doc_id"),
        translate(col("text"), "0123456789", "abcdefghij").as("text"))
    runCorpus("dist", distinct, storeBroadcastable = false)

    spark.stop()
  }
}
