package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: profile WHERE q195's stream-stream interval join spends
  * its time vs the identical batch range join, same session (the
  * QStreamProf discipline — cross-session streaming-vs-batch ratios
  * are host-drift artifacts). Runs the REAL q195 dataflow (the
  * StreamingOps builder over two event file streams), dumps every
  * microbatch progress JSON (addBatch/getBatch/queryPlanning/
  * walCommit, per-operator state rows/memory/commit times), then
  * times the batch twin. Usage:
  *   runMain graft.QJoinProf [sfDir] [shufflePartitions]
  */
object QJoinProf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val parts = if (args.length > 1) args(1) else
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // core count tracks SPARK_GRAFT_CPUS like QStreamProf/QBandCap —
    // a hardcoded local[32] with parts=8 would oversubscribe the host
    // and make the stream/batch ratio incomparable across the tools
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.streaming.Trigger

    // ---- streaming pass: the q195 dataflow, instrumented ----
    // the REAL loader, not a copy: eventStream is package-visible and
    // carries the glob-vs-directory branch + two-generation ts contract
    val joined = ops.StreamingOps.streamingIntervalJoin(
      ops.StreamingOps.eventStream(spark, dir)
        .filter(col("event_type") === "click"),
      ops.StreamingOps.eventStream(spark, dir)
        .filter(col("event_type") === "purchase"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-jprof")
    val t0 = System.nanoTime()
    val sq = joined.writeStream.format("memory").queryName("jprof_mem")
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    sq.awaitTermination()
    val streamSec = (System.nanoTime() - t0) / 1e9
    println(f"PROF stream_total $streamSec%.2f s, " +
      s"batches=${sq.recentProgress.length}, parts=$parts, " +
      s"rows=${spark.table("jprof_mem").count()}")
    sq.recentProgress.foreach(p => println("PROF progress " + p.json))
    spark.catalog.dropTempView("jprof_mem")

    // ---- batch twin (the StreamingSpec q195 pin's batch side) ----
    val ev = Tables.events(spark, dir)
    val t1 = System.nanoTime()
    ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"),
        col("ts").as("c_ts"))
      .join(ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
            col("ts").as("p_ts")),
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("c_id"), col("p_id"),
        unix_micros(col("c_ts")).as("c_ts_us"),
        unix_micros(col("p_ts")).as("p_ts_us"))
      .write.format("noop").mode("overwrite").save()
    println(f"PROF batch_total ${(System.nanoTime() - t1) / 1e9}%.2f s")

    val walked = java.nio.file.Files.walk(ckpt)
    try walked.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally walked.close()
    spark.stop()
  }
}
