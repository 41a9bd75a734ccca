package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: profile WHERE the streaming overhead of q192 goes vs the
  * batch q191 sketch on the same corpus (VERDICT r9 item 3). Runs the
  * q192 aggregation through a memory sink exactly like the declared
  * query, then dumps every microbatch's progress JSON (durationMs
  * breakdown: addBatch / getBatch / queryPlanning / walCommit, state
  * operator rows/memory), then times the SAME sketch as one batch
  * aggregation. Usage:
  *   runMain graft.QStreamProf [sfDir]
  */
object QStreamProf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.streaming.Trigger

    // ---- streaming pass (the q192 body, instrumented) ----
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val path = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val rdr = spark.readStream.schema(schema)
    val raw =
      if (fs.getFileStatus(path).isDirectory) rdr.parquet(path.toString)
      else rdr.option("pathGlobFilter", "documents.parquet").parquet(dir)
    val kmv = udaf(new graft.ops.KmvAgg(2048))
    val agg = raw
      .select(col("source"), explode(graft.ops.Extended10.toks(col("text"))).as("w"))
      .select(col("source"),
        graft.functions.Md5Bucket.md5Bucket(col("w"), 15, 0).as("h"))
      .groupBy("source").agg(kmv(col("h")).as("sk"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-prof")
    val t0 = System.nanoTime()
    val sq = agg.writeStream.format("memory").queryName("prof_mem")
      .outputMode("complete")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    sq.awaitTermination()
    val streamSec = (System.nanoTime() - t0) / 1e9
    println(f"PROF stream_total $streamSec%.2f s, batches=${sq.recentProgress.length}")
    sq.recentProgress.foreach(p => println("PROF progress " + p.json))
    spark.catalog.dropTempView("prof_mem")

    // ---- batch pass: identical sketch, one job ----
    val t1 = System.nanoTime()
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), explode(graft.ops.Extended10.toks(col("text"))).as("w"))
      .select(col("source"),
        graft.functions.Md5Bucket.md5Bucket(col("w"), 15, 0).as("h"))
      .groupBy("source").agg(kmv(col("h")).as("sk"))
      .write.format("noop").mode("overwrite").save()
    println(f"PROF batch_total ${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
