package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoders => SqlEncoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Latest-event state per (user_id, event_type) — the streaming shape of
  * the reference's Redis upsert (SURVEY.md §2.1 R10). */
case class EventRow(user_id: Long, event_type: String, event_id: Long, ts_us: Long)

/** [[StreamingOps.statefulUpsertTws]]'s processor: one schema'd
  * ValueState slot per key holding the current winner; merge rule
  * identical to the reference's (strictly-later wins, ties keep
  * existing — SURVEY.md §2.2 quirk 2, DataTransformationService.java:245). */
class LatestEventProcessor
    extends StatefulProcessor[(Long, String), EventRow, EventRow] {
  @transient private var latest: ValueState[EventRow] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    latest = getHandle.getValueState[EventRow]("latest",
      SqlEncoders.product[EventRow], TTLConfig.NONE)
  override def handleInputRows(key: (Long, String), rows: Iterator[EventRow],
      timerValues: TimerValues): Iterator[EventRow] = {
    var cur = if (latest.exists()) latest.get() else null
    rows.foreach { e =>
      if (cur == null || e.ts_us > cur.ts_us) cur = e
    }
    latest.update(cur)
    Iterator.single(cur)
  }
}

/** q28–q30 batch analogs + real Structured Streaming builders.
  *
  * `window()` / `session_window()` are batch-evaluable, so the t2 queries
  * run the SAME expressions the streaming jobs use — the streaming
  * variants add only watermarking and state management. StreamingSpec
  * drives the streaming builders through MemoryStream and asserts they
  * equal the batch analogs on identical data.
  */
object StreamingOps {

  private def valDec = col("value").cast("decimal(18,6)")

  /** Sum exactly in decimal (order-independent), emit as double: the
    * driver's hash-compare diverges on decimal OUTPUT columns even with
    * identical values and declared types (round-2 finding — all seven
    * decimal-emitting queries failed, all decimal-free ones passed).
    * The exact decimal sum converts to the same IEEE double in both
    * engines (unscaled magnitude < 2^53 at any plausible sf). */
  private def sumValue = sum(valDec).cast("double").as("sum_value")

  /** q28 — tumbling 1-hour windows: count + exact decimal sum per window.
    * Epoch-aligned starts (Spark window origin = epoch; oracle uses
    * time_bucket, also epoch-aligned for sub-day widths). */
  def q28Tumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"), sumValue)
      .select(unix_micros(col("w.start")).as("ws_us"),
        col("n_events"), col("sum_value"))
      .orderBy("ws_us")

  /** q29 — sliding windows (1 hour every 30 minutes): each event lands in
    * exactly 2 windows; Spark plans this as an Expand (2 rows per input)
    * before the hash aggregate — no per-window scan repetition. */
  def q29Sliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), sumValue)
      .select(unix_micros(col("w.start")).as("ws_us"),
        col("n_events"), col("sum_value"))
      .orderBy("ws_us")

  /** q30 — session windows (30-minute gap) per user: a new session starts
    * when an event arrives ≥ gap after the previous one. Oracle mirrors
    * with the lag/flag/cumsum idiom. */
  def q30Session(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), sumValue)
      .select(col("user_id"), unix_micros(col("w.start")).as("start_us"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "start_us")

  // ------------------------------------------------- streaming builders

  /** Streaming tumbling counts with a 10-minute watermark: late events
    * beyond the watermark are dropped; windows finalize (Append mode)
    * once the watermark passes their end. */
  def streamingTumbling(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"), sumValue)
      .select(unix_micros(col("w.start")).as("ws_us"),
        col("n_events"), col("sum_value"))

  /** Streaming session windows per user (30-minute gap, 10-minute
    * watermark) — state store merges/expires sessions automatically. */
  def streamingSessions(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("w.start")).as("start_us"),
        col("n_events"))

  /** Streaming exact dedup (R9's streaming shape): drop repeats of
    * (user_id, event_type, event_id) arriving within the watermark
    * horizon. `dropDuplicatesWithinWatermark` keys state on the dedup
    * columns but stamps each entry with its event time, so entries are
    * purged once the watermark passes them — bounded state. (Plain
    * `dropDuplicates` without the event-time column in the key would
    * never purge and grow without bound.) */
  def streamingDedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "event_id")

  /** Stream-stream inner join with an event-time interval: each click
    * joins the purchases of the SAME user that happen within 1 hour
    * after it. Both sides carry watermarks and the join condition
    * bounds event-time distance, so each side's buffered state is
    * bounded (watermark + interval) and rows are evicted as the
    * watermark advances — the only shape under which Spark permits an
    * append-mode stream-stream join. Batch-evaluable too (same
    * expressions; the interval condition becomes a range join). */
  def streamingIntervalJoin(clicks: DataFrame, purchases: DataFrame): DataFrame =
    intervalJoin(clicks, purchases, "inner")

  /** LEFT OUTER flavor: clicks with NO purchase within the hour still
    * emit — with null purchase columns — once the watermark proves no
    * match can still arrive (the row leaves the state store at that
    * point; before the watermark passes, the click is withheld, not
    * emitted unmatched). The two-sided time bound is what makes the
    * outer result well-defined on an infinite stream at all. */
  def streamingIntervalJoinLeftOuter(clicks: DataFrame,
      purchases: DataFrame): DataFrame =
    intervalJoin(clicks, purchases, "left_outer")

  private def intervalJoin(clicks: DataFrame, purchases: DataFrame,
      joinType: String): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("event_id").as("c_id"),
        col("ts").as("c_ts"))
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        col("ts").as("p_ts"))
    c.join(p,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"),
        joinType)
      .select(col("user_id"), col("c_id"), col("p_id"),
        unix_micros(col("c_ts")).as("c_ts_us"),
        unix_micros(col("p_ts")).as("p_ts_us"))
  }

  /** Streaming keyed upsert (the reference's Redis merge, R10): keep the
    * latest event per (user_id, event_type); ties favor existing state —
    * the strict `Date.after` rule (SURVEY.md §2.2 quirk 2). State never
    * expires (the reference's Redis keys live forever; documented in
    * SURVEY.md §7.4). Emits the updated state row per input batch. */
  def statefulUpsert(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .as[EventRow]
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (_: (Long, String), rows: Iterator[EventRow], state: GroupState[EventRow]) => {
          var cur = state.getOption.orNull
          rows.foreach { e =>
            // strictly-later wins; equal ts keeps existing (quirk 2)
            if (cur == null || e.ts_us > cur.ts_us) cur = e
          }
          state.update(cur)
          Iterator.single(cur)
        })
      .toDF()
  }

  /** The same keyed upsert on Spark 4.x's arbitrary-state API
    * (`transformWithState` + [[LatestEventProcessor]]). Differences from
    * the `flatMapGroupsWithState` form that matter at scale: state is
    * SCHEMA'd (encoder-backed, evolvable across restarts), lives in the
    * RocksDB state store (required by the API; spills off-heap instead
    * of growing the JVM heap), supports per-entry TTL natively
    * (TTLConfig — here NONE, matching the reference's forever-lived
    * Redis keys), and timers replace the coarse GroupStateTimeout.
    * StreamingSpec proves it bit-equal to [[statefulUpsert]]. */
  def statefulUpsertTws(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .as[EventRow]
      .groupByKey(e => (e.user_id, e.event_type))
      .transformWithState(new LatestEventProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF()
  }

  /** Stream-static enrichment: each streaming event joins a STATIC
    * dimension table (no state on either side — the static side is
    * re-planned per micro-batch, so a dim refresh between batches is
    * picked up automatically; with a small dim Catalyst broadcasts it
    * into every batch, the streaming analog of q12). Inner join: events
    * without a dim match drop, matching the batch semantics. */
  def streamingStaticEnrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("segment"))

  /** q172 — a REAL Structured Streaming run, oracle-checked: the events
    * table replayed through `readStream` with `Trigger.AvailableNow`
    * into the q28 tumbling aggregation and a memory sink, returned as
    * the finished batch result. AvailableNow processes everything
    * available then stops — the incremental-backfill posture (at scale:
    * the same code runs unbounded with the watermark bounding state;
    * here Complete mode emits every window, so the finished result is
    * EXACTLY q28's batch answer and shares its DuckDB oracle — the
    * driver's t2 hash-compare therefore covers the streaming path
    * end-to-end, not just spec assertions). Checkpoint lives in a fresh
    * java.io.tmpdir directory (no driver contract needed; AvailableNow
    * finishes, so the checkpoint is single-use by construction). */
  /** File-stream a parquet table that may be a single FILE (shipped
    * testdata) or a DIRECTORY of part files (any Spark-written table,
    * e.g. the QScale probes). The source requires a directory path:
    * for a file, stream the parent glob-filtered down to the table;
    * for a directory, stream the directory itself — a glob on the
    * parent would match nothing there, because pathGlobFilter tests
    * LEAF file paths (part-*.parquet), silently producing an empty
    * stream (found live by the 1000× probe on q192). */
  /** An empty batch frame with the given schema — the analysis-only
    * probe both ingest operators (and their specs) use to derive the
    * drain's output schema without running a job (code review r15b:
    * the five-line boilerplate was triplicated, and one copy
    * re-READ its store from disk purely for the schema). */
  private[graft] def emptyFrame(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)

  /** Test/prof support (code review r16 — this was copy-pasted five
    * times): stage each frame as ONE parquet file under `dir/f<i>`
    * with strictly increasing mtimes (1 s apart), so a
    * maxFilesPerTrigger=1 file stream over `dir` yields one
    * DETERMINISTIC trigger per frame, in order (the file source
    * orders by modification time). */
  private[graft] def stageTriggerFiles(dir: String,
      frames: Seq[DataFrame]): Unit =
    frames.zipWithIndex.foreach { case (f, i) =>
      f.coalesce(1).write.parquet(s"$dir/f$i")
      val walked = java.nio.file.Files.walk(
        java.nio.file.Paths.get(s"$dir/f$i"))
      try walked.forEach(p => java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime
          .fromMillis(1700000000000L + i * 1000L)))
      finally walked.close()
    }

  private def tableStream(spark: SparkSession, dir: String, table: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val rdr = spark.readStream.schema(schema)
    if (fs.getFileStatus(path).isDirectory) rdr.parquet(path.toString)
    else rdr.option("pathGlobFilter", s"$table.parquet").parquet(dir)
  }

  /** Drain an AvailableNow query DISTRIBUTED and CLEAN UP: foreachBatch
    * writes each trigger's result to a temp parquet dir on the
    * EXECUTORS (Complete overwrites with the full result, append
    * appends the newly-emitted rows), the drained table is read back
    * with the aggregate's own schema, `finish` materializes off it,
    * and the single-use checkpoint + sink dirs are deleted (the
    * leak fix, ADVICE r8).
    *
    * Until round 9 this used the MEMORY sink — a hidden
    * collect-to-driver: Complete mode retains the entire result in
    * driver memory, which is fine for dimension-sized results
    * (q172's 720 windows, q192's 20 sketches, q196's 5 segments) but
    * OOMs spark.driver.maxResultSize the moment the result is
    * data-sized — the 100× probe killed q194 (per-user sessions,
    * 1 GB of task results) exactly there, masked at sf scales by
    * small outputs. foreachBatch keeps the whole drain path
    * distributed, the posture every other operator already has. */
  /** Bytes on disk under `dir/table.parquet` (file or directory) — the
    * cheap input-volume probe [[drainParts]] sizes from. */
  private[graft] def tableBytes(spark: SparkSession, dir: String,
      table: String): Long = pathBytes(spark, s"$dir/$table.parquet")

  private[graft] def pathBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf())
      .getContentSummary(p).getLength
  }

  /** Scale-adaptive shuffle/state partition count for ONE drain,
    * derived from the stream's input volume (guide §2: derive
    * partitioning from input size, never a constant tuned for local
    * mode or the cluster). Why it matters for STREAMING specifically:
    * each stateful operator keeps one state-store instance PER SHUFFLE
    * PARTITION, each paying per-trigger provider/commit overhead
    * regardless of rows (QJoinProf r9 measured q195's symmetric-hash
    * join: 4 stores/partition — summed commit 75–90 s/batch at 32
    * partitions for 40k state rows, ~6 s at 8, ~0.9 s at 2), streaming
    * has NO AQE to coalesce post-shuffle partitions, and the
    * partition count is frozen into the checkpoint at first start. A
    * deployment therefore sizes state partitions to state VOLUME —
    * exactly what this derives. Floor 2 (never collapse a distributed
    * drain to one task; multi-partition state semantics stay
    * exercised); cap 4× cluster width (more instances than cores buys
    * no intra-trigger parallelism, only commit overhead). Grain:
    * SPARK_GRAFT_STATE_PART_BYTES (default 8 MiB of input per
    * partition — at the driver's sf0.1 this yields 2, at the 100×
    * probe ~25, past 1000× it rides the cap: grows with data, not
    * with the bench host). */
  private[graft] def drainParts(spark: SparkSession, bytes: Long): Int = {
    val grain = sys.env.getOrElse("SPARK_GRAFT_STATE_PART_BYTES",
      (8L << 20).toString).toLong
    val cap = spark.sparkContext.defaultParallelism.toLong * 4L
    math.max(2L, math.min((bytes + grain - 1L) / grain, cap)).toInt
  }

  private[graft] def drainAndClean(spark: SparkSession, agg: DataFrame,
      name: String, outputMode: String = "complete",
      // scale-adaptive shuffle/state partition count for this drain
      // ([[drainParts]]); -1 = keep the session setting. Scoped: set
      // before start(), restored in the finally. Also governs the
      // perBatch hook's batch jobs — micro-batch-sized inputs want the
      // same adaptive layout (the r17 per-task-overhead finding).
      shuffleParts: Int = -1,
      // driver-side per-trigger hook (default: write the batch as-is).
      // Runs INSIDE foreachBatch, so it may launch its own batch jobs
      // against the micro-batch (q206 runs the span-dedup operator and
      // folds the store); if it changes the schema, pass `outSchema`
      // so the sink readback matches. A hook that mutates driver state
      // must produce the SAME output under batch REPLAY (foreachBatch
      // re-runs a batch that wrote-then-died with the same batchId —
      // q206 tracks its pre-fold store per batchId and re-probes
      // against that, since the post-fold store would change the
      // replayed answer).
      perBatch: (DataFrame, Long) => DataFrame = (df, _) => df,
      outSchema: Option[org.apache.spark.sql.types.StructType] = None)(
      finish: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory(s"graft-ckpt-$name")
    val sink = java.nio.file.Files.createTempDirectory(s"graft-sink-$name")
    val partsKey = "spark.sql.shuffle.partitions"
    val prevParts = spark.conf.get(partsKey)
    if (shuffleParts > 0) spark.conf.set(partsKey, shuffleParts.toString)
    // held for the finally: on a mid-drain failure the drain's OWN
    // query is still in spark.streams.active — the concurrency WARN
    // below must not misreport it as an "other" query, and it must be
    // stopped before its dirs are deleted (ADVICE r10)
    var own: Option[org.apache.spark.sql.streaming.StreamingQuery] = None
    // the whole body sits inside the try so an analysis-time start()
    // failure (unwatermarked append, non-aggregated complete) still
    // deletes the two dirs just created — otherwise each failed call
    // leaks a ckpt+sink pair in /tmp
    try {
      // Complete re-emits the FULL result each trigger → keep the last
      // (overwrite of the sink root); append and update emit
      // per-trigger deltas → keep them all, each batch in its OWN
      // batchId-keyed subdirectory written with overwrite. The subdir
      // makes replay idempotent: foreachBatch writes the sink BEFORE
      // the WAL commit, so a batch that wrote and died is re-run on
      // restart with the same batchId — a flat `append` would then
      // duplicate its rows (harmless inside this single-use
      // checkpoint, wrong the moment the pattern is copied somewhere
      // a checkpoint is reused, ADVICE r9). overwrite-into-b<id>
      // replays to the identical sink state.
      val complete = outputMode == "complete"
      val sq = agg.writeStream
        .outputMode(outputMode)
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          val target = if (complete) sink.toString
                       else s"$sink/b$batchId"
          perBatch(df, batchId).write.mode("overwrite").parquet(target)
        }
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      own = Some(sq)
      sq.awaitTermination()
      // explicit schema: a drain whose every batch emitted zero rows
      // leaves no part files to infer from; recursive lookup descends
      // the b<id> subdirs (and is a no-op for complete's flat root)
      finish(spark.read.schema(outSchema.getOrElse(agg.schema))
          .option("recursiveFileLookup", "true").parquet(sink.toString))
        .localCheckpoint()
    } finally {
      if (shuffleParts > 0) spark.conf.set(partsKey, prevParts)
      // Unload the query's state store providers BEFORE deleting its
      // dirs / letting the JVM exit: Spark keeps providers (and their
      // maintenance + RocksDB background compaction threads) loaded
      // after the query stops, so at JVM shutdown the temp-dir hooks
      // delete the working dirs under a live compaction, the thread
      // logs "background compaction error", and the JNI logger
      // (LoggerJniCallback) dereferences a null env — AttachCurrentThread
      // fails post-DestroyJavaVM — and SIGSEGVs the exit (observed 3×
      // at the 1000× q194 probe, hs_err 2026-08-15, AFTER the drain
      // had already produced its correct answer). stop() closes every
      // provider gracefully and the next streaming query restarts the
      // maintenance pool lazily. stop() is JVM-GLOBAL (there is no
      // public per-checkpoint unload), so this teardown assumes the
      // drain contract every caller here has: finite AvailableNow
      // drains run ONE AT A TIME (Verify/Bench/tests are sequential).
      // A concurrent long-lived query would have its providers
      // unloaded mid-run and pay a checkpoint reopen on its next
      // batch — correct but slow. Nothing structural enforces the
      // sequential assumption, so check it loudly (ADVICE r9): a
      // future concurrent caller gets a WARN naming the degradation
      // instead of a silent slowdown.
      // on the failure path the drain's own query may still be active:
      // stop it (its checkpoint/sink dirs are deleted just below), and
      // exclude it from the concurrency WARN — it is not an "other"
      // query (ADVICE r10)
      own.filter(_.isActive).foreach { q =>
        try q.stop()
        catch { case _: Throwable => () }
      }
      val ownId = own.map(_.id)
      val stillActive = spark.streams.active
        .filterNot(q => ownId.contains(q.id))
      if (stillActive.nonEmpty)
        org.apache.logging.log4j.LogManager.getLogger(getClass)
          .warn(s"drainAndClean($name): StateStore.stop() is JVM-global " +
            s"and ${stillActive.length} other streaming quer" +
            s"${if (stillActive.length == 1) "y is" else "ies are"} active " +
            s"(${stillActive.map(_.name).mkString(", ")}) — their state " +
            "providers will be unloaded and reopened from checkpoint on " +
            "their next batch (correct but slow)")
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      Seq(ckpt, sink).foreach { d =>
        val walked = java.nio.file.Files.walk(d)
        try walked
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally walked.close()
      }
    }
  }

  /** The events table as a ts-normalized file STREAM — the readStream
    * twin of `Tables.events`: raw-schema probe (the nanosAsLong
    * session flag covers the nanos generation — ADVICE r7), then the
    * same two-generation normalization contract. Shared by every
    * declared streaming query over events (q172/q194/q195/q196). */
  private[graft] def eventStream(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val raw = tableStream(spark, dir, "events", schema)
    schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      // fail fast like the batch twin Tables.events — a third physical
      // generation must be DIAGNOSED here, not surface as an obscure
      // cast error inside a downstream window aggregation
      case other => throw new IllegalStateException(
        s"events.ts: unexpected storage type $other — extend eventStream " +
          "alongside Tables.events (TablesSpec names the loader contract)")
    }
  }

  def q172StreamingAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val agg = eventStream(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"), sumValue)
    drainAndClean(spark, agg, "q172",
      shuffleParts = drainParts(spark, tableBytes(spark, dir, "events")))(
      _.select(unix_micros(col("w.start")).as("ws_us"),
          col("n_events"), col("sum_value"))
        .orderBy("ws_us"))
  }

  // ---------------------------------------------------------------- q194
  /** q194 — STREAMING session windows, oracle-checked: q30's per-user
    * session aggregation (30-minute gap) running as a real
    * `session_window` streaming aggregation — the state store merges
    * overlapping session fragments as batches arrive. AvailableNow +
    * Complete mode drains the table and finishes with exactly q30's
    * batch answer, so the driver's t2 hash-compare covers streaming
    * session state end-to-end (the q172 pattern); before this the
    * session-window streaming builder was spec-only. At scale the
    * same code runs unbounded with a watermark bounding session
    * state; Complete here keeps the finite-drain answer total. */
  def q194StreamingSession(spark: SparkSession, dir: String): DataFrame =
    // per-user session state is DATA-sized → RocksDB store (the
    // on-heap default OOM'd the 1000× probe at ~10M sessions)
    withRocksDbState(spark) {
      val agg = eventStream(spark, dir)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), sumValue)
      drainAndClean(spark, agg, "q194",
        shuffleParts = drainParts(spark, tableBytes(spark, dir, "events")))(
        _.select(col("user_id"), unix_micros(col("w.start")).as("start_us"),
            col("n_events"), col("sum_value"))
          .orderBy("user_id", "start_us"))
    }

  // ---------------------------------------------------------------- q195
  /** q195 — STREAMING stream-stream interval join, oracle-checked:
    * the [[streamingIntervalJoin]] builder (clicks ⋈ purchases of the
    * same user within 1 hour after the click, both sides watermarked,
    * append mode — the only shape Spark permits for stream-stream
    * joins) driven by two file streams over the SAME events table and
    * drained with AvailableNow. Inner-join matches emit as they are
    * found (the watermark bounds STATE, it never withholds an inner
    * match), so the finished sink holds exactly the batch range-join
    * answer and the driver hash-compares the stream-stream join path.
    *
    * Multi-batch caveat (documented, not hit here): if the source
    * splits into several micro-batches, rows arriving more than the
    * watermark delay out of event-time order can be dropped from
    * state before their match arrives — the shipped single-file
    * tables drain in one batch, and an unbounded deployment relies on
    * the same bounded-disorder contract every watermark query does. */
  def q195StreamingIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = () => eventStream(spark, dir)
    val joined = streamingIntervalJoin(
      ev().filter(col("event_type") === "click"),
      ev().filter(col("event_type") === "purchase"))
    drainAndClean(spark, joined, "q195", outputMode = "append",
      shuffleParts = drainParts(spark, tableBytes(spark, dir, "events")))(
      _.orderBy("c_id", "p_id"))
  }

  // ---------------------------------------------------------------- q196
  /** q196 — STREAMING stream-static enrichment, oracle-checked: the
    * [[streamingStaticEnrich]] shape — each micro-batch of events
    * broadcast-joins the STATIC customer dimension (re-planned per
    * batch; the streaming analog of q12) — aggregated per market
    * segment. The join is stateless; the only streaming state is the
    * segment-sized aggregate, and AvailableNow + Complete finishes
    * with the batch join+group answer for the driver's hash-compare. */
  def q196StreamingEnrich(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val agg = eventStream(spark, dir)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"), sumValue)
    drainAndClean(spark, agg, "q196",
      shuffleParts = drainParts(spark, tableBytes(spark, dir, "events")))(
      _.select(col("c_mktsegment"), col("n_events"), col("sum_value"))
        .orderBy("c_mktsegment"))
  }

  // ---------------------------------------------------------------- q192
  /** q192 — STREAMING distinct-vocabulary sketch: the [[KmvAgg]]
    * bottom-k sketch (q191) running as a Structured Streaming
    * aggregation — per-source distinct token counts maintained
    * incrementally as document files arrive. The typed Aggregator is
    * mergeable, so streaming state per source is the ≤k-long sketch
    * (bounded forever — the property that makes a DISTINCT count
    * streamable at all; a naive distinct holds the whole vocabulary
    * in state). AvailableNow + Complete mode drains the current
    * directory and finishes with exactly the batch answer, so the
    * driver's hash-compare covers the streaming path (the q172
    * pattern); in the unsaturated regime the published count is
    * exact, hence the DuckDB oracle. At scale the same code runs
    * unbounded with the sketch as the only state.
    */
  def q192StreamingKmv(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val raw = tableStream(spark, dir, "documents", schema)
    val kmv = udaf(new KmvAgg(2048))
    val agg = raw
      .select(col("source"), explode(Extended10.toks(col("text"))).as("w"))
      .select(col("source"),
        graft.functions.Md5Bucket.md5Bucket(col("w"), 15, 0).as("h"))
      .groupBy("source").agg(kmv(col("h")).as("sk"))
    drainAndClean(spark, agg, "q192",
      shuffleParts = drainParts(spark, tableBytes(spark, dir, "documents")))(
      _.select(col("source"), size(col("sk")).cast("long").as("d"))
        .orderBy("source"))
  }

  // ---------------------------------------------------------------- q198
  /** q198 — STREAMING keyed upsert on transformWithState, oracle-
    * checked: the reference's Redis merge (R10 — latest event per
    * (user_id, event_type), strictly-later wins, ties keep existing)
    * running as REAL arbitrary streaming state — RocksDB-backed
    * [[LatestEventProcessor]] via [[statefulUpsertTws]], driven by
    * the events file stream and drained with AvailableNow in Update
    * mode. Update mode re-emits a key's current winner each batch it
    * is touched, and strictly-later-wins makes the per-key emission
    * sequence MONOTONE in ts_us (an equal-ts arrival keeps existing,
    * so its re-emission is the identical row) — the final winner is
    * therefore the max-ts_us emission, recovered by one argmax window
    * over the drained (keys × batches)-sized frame. The shipped data
    * has no max-ts tie on any key (checked at every sf), so the
    * answer is the plain per-key argmax the oracle replays.
    *
    * transformWithState requires the RocksDB state store provider;
    * the conf is scoped to the drain and restored after (the
    * StreamingSpec pattern). Before this the transformWithState
    * builder was spec-only — this closes the last spec-only
    * streaming capability. */
  def q198StreamingUpsert(spark: SparkSession, dir: String): DataFrame =
    withRocksDbState(spark) {
      import org.apache.spark.sql.expressions.Window
      val agg = statefulUpsertTws(eventStream(spark, dir))
      drainAndClean(spark, agg, "q198", outputMode = "update",
        shuffleParts = drainParts(spark, tableBytes(spark, dir, "events"))) { df =>
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy(col("ts_us").desc, col("event_id"))
        df.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
          .orderBy("user_id", "event_type")
      }
    }

  /** Scope the RocksDB state store provider to one drain and restore
    * the session default after. Two users: transformWithState REQUIRES
    * it (q198), and any query whose state is DATA-sized needs it at
    * scale — the default HDFSBackedStateStore keeps every partition's
    * full state map ON-HEAP, which the 1000× probe caught OOM-ing
    * q194's ~10M-session state (100M events); RocksDB keeps state
    * off-heap/on-disk, the standard production posture for large
    * state. Dimension-sized state (q172/q192/q196) stays on the
    * default store — no native-lib overhead for 20-row state.
    *
    * The log4j level for Spark's RocksDB wrapper class is pinned to
    * ERROR for the drain: Spark derives the NATIVE info-log level
    * from that logger's isWarnEnabled/isInfoEnabled (RocksDB.scala
    * createLogger — ERROR_LEVEL unless log4j says more), and
    * rocksdb's free Log() filters against that level BEFORE the JNI
    * LoggerJniCallback hop — so routine compaction/flush chatter from
    * RocksDB's native (JVM-unattached) background threads never
    * crosses JNI. This is hardening only: the 1000× exit SIGSEGV it
    * was first aimed at still reproduced at ERROR (the dying message
    * was itself ERROR-level — "background compaction error" against
    * shutdown-deleted dirs) and was actually fixed by the
    * StateStore.stop() teardown in drainAndClean. State-store ERRORs
    * still surface — and any real failure also fails the query. */
  private def withRocksDbState[T](spark: SparkSession)(body: => T): T = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.config.Configurator
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    val logName = "org.apache.spark.sql.execution.streaming.state.RocksDB"
    // restore-by-removal when the level was INHERITED (ADVICE r9):
    // Configurator.setLevel materializes a LoggerConfig for logName if
    // none exists, and re-setting the captured effective level on exit
    // would PIN it — a later change to the parent's level would no
    // longer propagate here. Capture whether the logger had its own
    // config; if not, delete the one setLevel created instead of
    // setting a level on it.
    val ctx = LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val hadOwnConfig =
      ctx.getConfiguration.getLoggerConfig(logName).getName == logName
    val prevLevel = LogManager.getLogger(logName)
      .asInstanceOf[org.apache.logging.log4j.core.Logger].getLevel
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    Configurator.setLevel(logName, Level.ERROR)
    try body
    finally {
      if (hadOwnConfig) Configurator.setLevel(logName, prevLevel)
      else {
        ctx.getConfiguration.removeLogger(logName)
        ctx.updateLoggers()
      }
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  // ---------------------------------------------------------------- q206
  /** Core of q206, driven by any documents stream (the spec feeds it a
    * multi-file directory with maxFilesPerTrigger=1 to pin the
    * multi-trigger semantics): every micro-batch runs the SHIPPED
    * q203 operator against the store-so-far, then folds its own
    * digests in — [[SpanOps.spanIngestTrigger]], the spanIndexAppend
    * shape over a batchId-VERSIONED parquet store at `storeRoot`
    * (segment `init` + one `b<id>` delta per batch; store bytes
    * written per trigger ∝ batch, the standing segments never
    * rewritten). RESTART-DURABLE (r14 verdict item 1): the driver
    * holds no store state — the probe for batch id reads only
    * segments < id and the fold overwrites b<id>, so BOTH replay
    * shapes (an in-JVM foreachBatch re-run and a cross-restart WAL
    * replay of a batch that wrote-then-died before its commit)
    * re-probe the exact pre-fold snapshot and rewrite identical sink
    * and store state. StreamingSpec pins the cross-restart case by
    * deleting the checkpoint's commit marker between drains. */
  private[graft] def streamingSpanIngest(spark: SparkSession,
      docStream: DataFrame, store0: DataFrame,
      storeRoot: String, shuffleParts: Int = -1): DataFrame = {
    SpanOps.spanStoreInit(store0, storeRoot, parts = shuffleParts)
    // analysis-only probe for the output schema (no job: .schema on an
    // empty frame); the persist it marks is dropped right after
    val outSchema = SpanOps.spanDedupVsStore(
      emptyFrame(spark, docStream.schema), store0).schema
    spark.catalog.clearCache()
    drainAndClean(spark, docStream, "q206", outputMode = "append",
      shuffleParts = shuffleParts,
      perBatch = SpanOps.spanIngestTrigger(spark, storeRoot),
      outSchema = Some(outSchema))(
      _.orderBy("doc_id"))
  }

  /** q206 — STREAMING span-dedup ingest, oracle-checked: the q203
    * maintenance loop running as a real `readStream` — the batch
    * documents (doc_id ≡ 0 mod 7) arrive as a file stream and each
    * micro-batch is deduped against the standing corpus's digest
    * index, then admitted into it. With the shipped single-file table
    * AvailableNow yields ONE deterministic trigger, so the finished
    * result is EXACTLY q203's and shares its DuckDB oracle (the q172
    * pattern — t2 covers the streaming ingest path end-to-end).
    * Multi-trigger semantics are the sequential contract SpanSpec
    * pins: every occurrence is judged against everything that arrived
    * before it (trigger granularity), which at scale IS the
    * production ingest loop. The declared query's versioned store
    * lives in a throwaway temp dir (testdata ships no store — the
    * q200/q203 precedent); a production deployment points storeRoot
    * at shared storage and REUSES it with the checkpoint across
    * restarts. */
  def q206StreamingSpanIngest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val store0 = SpanOps.spanIndex(
      docs.filter(pmod(col("doc_id"), lit(7L)) =!= 0L))
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val stream = tableStream(spark, dir, "documents", schema)
      .filter(pmod(col("doc_id"), lit(7L)) === 0L)
      .select("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-spanstore")
    // the result is localCheckpoint'd by the drain, so the store dir
    // can be deleted as soon as the drain returns
    try streamingSpanIngest(spark, stream, store0, root.toString,
      shuffleParts = drainParts(spark, tableBytes(spark, dir, "documents")))
    finally graft.FsUtil.deleteRecursively(root)
  }

  // ---------------------------------------------------------------- q209
  /** Per-trigger hook for the q209 sig ingest (the q206 shape on the
    * signature store): probe the micro-batch against the versioned
    * band store with the SHIPPED [[Similarity.dedupVsSigStore]], then
    * fold the batch's OWN band rows in. The fold is BLIND and
    * set-identical to a rebuild — signatures are per-document, the
    * sigStoreAppend contract — and the b<id> overwrite is
    * replay-idempotent ([[VersionedStore]]'s two invariants, shared
    * with q206, including the cross-restart case StreamingSpec pins
    * there). Per-trigger work ∝ batch: one signature pass + the band
    * equi-join probe + a batch-sized segment write. */
  private[graft] def sigIngestTrigger(spark: SparkSession, root: String,
      maxSegments: Int = 8): (DataFrame, Long) => DataFrame = {
    var lastOut: Option[DataFrame] = None
    (b: DataFrame, id: Long) => {
      // free the PREVIOUS trigger's blocks first (ADVICE r15: these
      // are RDD persists — catalog.clearCache() never reclaims them,
      // so a long drain would accumulate storage unbounded); its sink
      // write has completed, foreachBatch being sequential
      lastOut.foreach(ScaleOps.freeLocalCheckpoint)
      lastOut = None
      // merge policy: fold committed segments (all strictly < id) into
      // one band-key-laid-out generation past maxSegments — probe cost
      // flat in trigger count, replay-safe (VersionedStore.maintain)
      VersionedStore.maintain(spark, root, id,
        Seq("band_idx", "band_key"), maxSegments)
      val bc = b.localCheckpoint(true)
      // ONE signature pass per trigger: the materialized bands feed
      // both the probe and the fold (code review r15b — the semIngest
      // lesson)
      val bands = Similarity.sigBands(bc).localCheckpoint(true)
      val out = Similarity.dedupVsSigStoreBands(bands,
        VersionedStore.before(spark, root, id)).localCheckpoint(true)
      VersionedStore.write(bands, root, id)
      // bc fed only bands; bands fed the probe (out, materialized) and
      // the fold (written) — both consumed, free their blocks now
      ScaleOps.freeLocalCheckpoint(bands)
      ScaleOps.freeLocalCheckpoint(bc)
      lastOut = Some(out)
      out
    }
  }

  /** q209 — STREAMING near-dup (MinHash/LSH) ingest, oracle-checked:
    * the q153 maintenance loop as a real `readStream` — the planted
    * batch documents arrive as a file stream and each micro-batch is
    * near-dedup-probed against the standing corpus's banded signature
    * store, then its band rows are admitted into it. The batch lands
    * as ONE file, so AvailableNow yields one deterministic trigger and
    * the finished result is EXACTLY q153's, sharing its DuckDB oracle
    * verbatim (the q206/q172 precedent — t2 covers the streaming
    * sig-ingest path end-to-end). Multi-trigger semantics are the
    * sequential contract StreamingSpec pins: each trigger judged
    * against the store plus every earlier trigger's bands — at scale
    * the production near-dup ingest loop. Store + batch staging live
    * in a throwaway temp dir (testdata ships neither — the q206
    * posture; production points the store root at shared storage and
    * reuses it with the checkpoint across restarts). */
  def q209StreamingSigIngest(spark: SparkSession, dir: String): DataFrame = {
    // persisted across its two staging consumers (store bands + batch
    // file) — both otherwise re-derive the fanout corpus from parquet;
    // released before the drain, which never touches it
    val corpus = Similarity.plantedCorpus(spark, dir).persist()
    val work = java.nio.file.Files.createTempDirectory("graft-sigingest")
    // one adaptive partition count for the whole query (store init
    // layout ≡ per-trigger read ≡ drain state), sized from the source
    // table the planted corpus derives from
    val parts = drainParts(spark, tableBytes(spark, dir, "documents"))
    try {
      val store0 = Similarity.sigBands(
        corpus.filter(col("doc_id") < 1000000L))
      VersionedStore.init(store0, s"$work/store", parts)
      // the arriving batch as a one-file stream source (the planted
      // docs are DERIVED from testdata, so they are staged to disk
      // once — production batches arrive as their own files)
      corpus.filter(col("doc_id") >= 1000000L)
        .coalesce(1).write.parquet(s"$work/batch")
      corpus.unpersist()
      val stream = spark.readStream
        .schema("doc_id BIGINT, text STRING").parquet(s"$work/batch")
      // analysis-only output-schema probe (no job)
      val outSchema = Similarity.dedupVsSigStore(
        emptyFrame(spark, stream.schema), store0).schema
      drainAndClean(spark, stream, "q209", outputMode = "append",
        shuffleParts = parts,
        perBatch = sigIngestTrigger(spark, s"$work/store"),
        outSchema = Some(outSchema))(
        _.orderBy("new_id"))
    } finally graft.FsUtil.deleteRecursively(work)
  }

  // ---------------------------------------------------------------- q210
  /** Per-trigger hook for the q210 SemDeDup ingest (the q209 shape on
    * the cells+reps store): probe the micro-batch with the SHIPPED
    * [[SemStoreOps.semIngest]] — ONE probe pass feeds the audit (the
    * sink row) AND the admitted fold — against the versioned reps
    * store, under the FROZEN driver-held quantizer (the stored-model
    * contract: retrain is [[SemStoreOps.semMaintain]]'s batch-side
    * decision, not a per-trigger one). Replay-idempotent via the two
    * [[VersionedStore]] invariants; the merge policy folds committed
    * segments past maxSegments into one cid-laid-out generation.
    * One replay caveat (code review r16): on a FLOODED batch (a cell
    * past maxCell) semIngest's refineBatchCells re-runs a float
    * k-means sub-fit whose distributed sums are not merge-order
    * deterministic, so a replayed batch's admit decisions can differ
    * bitwise from the crashed attempt's at sub-cell boundaries. This
    * is unobservable: the crashed attempt committed nothing (no WAL
    * commit), and the replay OVERWRITES both its sink subdir and
    * b<id>, so the surviving sink/store pair is mutually consistent —
    * the overwrite invariant, not bit-determinism, is what replay
    * safety actually rests on (see [[VersionedStore]]). Non-flooded
    * batches (the refinement no-op) replay bit-identically.
    * semIngest's internal stage checkpoints are anonymous, so hygiene
    * here is the mark/freeSince scope instead of named frees. */
  private[graft] def semIngestTrigger(spark: SparkSession, root: String,
      model: SemStoreOps.SemModel, maxSegments: Int = 8)
      : (DataFrame, Long) => DataFrame = {
    var lastOut: Option[DataFrame] = None
    (b: DataFrame, id: Long) => {
      lastOut.foreach(ScaleOps.freeLocalCheckpoint)
      lastOut = None
      VersionedStore.maintain(spark, root, id, Seq("cid"), maxSegments)
      val mark = ScaleOps.rddMark(spark)
      val bc = b.localCheckpoint(true)
      val (audit, admitted) = SemStoreOps.semIngest(bc, model,
        VersionedStore.before(spark, root, id))
      val out = audit.localCheckpoint(true)
      VersionedStore.write(admitted, root, id)
      // every intermediate (bc, the probe's internal checkpoints) is
      // consumed by out + the fold; keep only the sink frame's blocks
      ScaleOps.freeSince(spark, mark, out)
      lastOut = Some(out)
      out
    }
  }

  /** q210 — STREAMING SemDeDup ingest, completing the streaming column
    * (span q206, sig q209, semantic here): the q208 maintenance loop
    * as a real `readStream` — batch vectors (vec_id ≡ 0 mod 7, the
    * q208 split) arrive as a file stream, each micro-batch is
    * semantically deduped against the standing cells+reps store and
    * its admitted reps fold in. One staged batch file → one
    * AvailableNow trigger → the finished audit is EXACTLY q208's
    * (StreamingSpec pins it bit-for-bit), so the declared query is
    * rows-only like q208 itself (float k-means cells — the
    * q45/q108/q187/q200/q208 precedent); multi-trigger semantics are
    * the sequential contract StreamingSpec pins on planted cliques.
    * Store + batch staging in a throwaway temp dir (the q209
    * posture); production points the store root at shared storage
    * and reuses it with the checkpoint across restarts, loading the
    * frozen model from the stored P_model table. */
  def q210StreamingSemIngest(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.fanout(Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("e")))
    val (model, reps) = SemStoreOps.semStoreBuild(
      emb.filter(pmod(col("id"), lit(7L)) =!= 0L), dim = 64)
    val work = java.nio.file.Files.createTempDirectory("graft-semingest")
    // one adaptive partition count for store layout and drain state,
    // sized from the source table (the q209 convention)
    val parts = drainParts(spark, tableBytes(spark, dir, "embeddings"))
    try {
      VersionedStore.init(reps, s"$work/store", parts)
      emb.filter(pmod(col("id"), lit(7L)) === 0L)
        .coalesce(1).write.parquet(s"$work/batch")
      val stream = spark.readStream
        .schema(spark.read.parquet(s"$work/batch").schema)
        .parquet(s"$work/batch")
      // analysis-only output-schema probe (tiny empty-input jobs)
      val outSchema = SemStoreOps.semDedupVsStore(
        emptyFrame(spark, stream.schema), model, reps).schema
      drainAndClean(spark, stream, "q210", outputMode = "append",
        shuffleParts = parts,
        perBatch = semIngestTrigger(spark, s"$work/store", model),
        outSchema = Some(outSchema))(
        _.orderBy("cid"))
    } finally graft.FsUtil.deleteRecursively(work)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q210_streaming_sem_ingest" -> (q210StreamingSemIngest _),
    "q209_streaming_sig_ingest" -> (q209StreamingSigIngest _),
    "q206_streaming_span_ingest" -> (q206StreamingSpanIngest _),
    "q28_tumbling" -> (q28Tumbling _),
    "q29_sliding" -> (q29Sliding _),
    "q30_session" -> (q30Session _),
    "q172_streaming_availablenow" -> (q172StreamingAvailableNow _),
    "q192_streaming_kmv" -> (q192StreamingKmv _),
    "q194_streaming_session" -> (q194StreamingSession _),
    "q195_streaming_interval_join" -> (q195StreamingIntervalJoin _),
    "q196_streaming_enrich" -> (q196StreamingEnrich _),
    "q198_streaming_upsert" -> (q198StreamingUpsert _))

  val oracleSql: Map[String, String] = Map(
    // single AvailableNow trigger over the shipped single-file table →
    // the streaming ingest finishes with exactly the batch q203 answer
    // and shares its oracle verbatim (the q172/q28 precedent)
    "q206_streaming_span_ingest" ->
      SpanOps.oracleSql("q203_span_dedup_incr"),
    // same contract on the signature store: one staged batch file →
    // one trigger → exactly the batch q153 answer and its oracle
    "q209_streaming_sig_ingest" -> Similarity.q153OracleSql,
    // latest event per (user_id, event_type); the shipped data has no
    // max-ts tie on any key (verified at every sf), so the arrival-
    // order tie rule never fires and the argmax is the exact answer
    "q198_streaming_upsert" ->
      """SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
        |FROM (SELECT user_id, event_type, event_id, ts, row_number()
        |    OVER (PARTITION BY user_id, event_type
        |          ORDER BY ts DESC, event_id) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "q28_tumbling" ->
      """SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS ws_us,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY ws_us""".stripMargin,
    // unsaturated regime (vocab ≪ k=2048): the sketch IS the distinct
    // hash set, so the streaming sketch size equals the exact distinct
    // token count — collision probability over a 60-bit hash is
    // negligible at any testdata vocab
    "q192_streaming_kmv" ->
      """SELECT source, count(DISTINCT w)::BIGINT AS d
        |FROM (SELECT source, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS w
        |  FROM documents)
        |GROUP BY source ORDER BY source""".stripMargin,
    // the streaming run finishes with exactly the batch answer (Complete
    // mode, AvailableNow) — same oracle as q28
    "q172_streaming_availablenow" ->
      """SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS ws_us,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY ws_us""".stripMargin,
    "q29_sliding" ->
      """SELECT epoch_us(ws) AS ws_us, count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
        |                 time_bucket(INTERVAL '30 minutes', ts)
        |                   - INTERVAL '30 minutes']) AS ws,
        |         value
        |  FROM events)
        |GROUP BY ws ORDER BY ws_us""".stripMargin,
    // the streaming session drain finishes with exactly the batch
    // session answer (Complete mode, AvailableNow) — q30's oracle
    "q194_streaming_session" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id, epoch_us(min(ts)) AS start_us,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, start_us""".stripMargin,
    // inner interval-join matches emit as found — the drained sink is
    // the batch range join
    "q195_streaming_interval_join" ->
      """SELECT c.user_id, c.event_id AS c_id, p.event_id AS p_id,
        |       epoch_us(c.ts) AS c_ts_us, epoch_us(p.ts) AS p_ts_us
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '1 hour'
        |ORDER BY c_id, p_id""".stripMargin,
    "q196_streaming_enrich" ->
      """SELECT c_mktsegment, count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q30_session" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id, epoch_us(min(ts)) AS start_us,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, start_us""".stripMargin)
}
