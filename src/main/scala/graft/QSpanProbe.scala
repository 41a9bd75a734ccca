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
        require(bucketEx == plainEx - 1,
          s"bucketed store must remove exactly the store-side exchange " +
            s"(plain=$plainEx bucketed=$bucketEx)")
      spark.catalog.clearCache()
    }

    // regime 1: the QScale replica corpus (dup-heavy — the distinct
    // digest set stays corpus-of-origin-sized and broadcasts)
    runCorpus("dup",
      spark.read.parquet(s"$src/documents.parquet").select("doc_id", "text"),
      storeBroadcastable = true)

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
