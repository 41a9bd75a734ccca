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

  /** `runMain graft.QStreamProf ingest [nTriggers] [batchRows]` — the
    * round-16 VersionedStore merge-policy stage: run the SHIPPED q209
    * sig-ingest trigger over nTriggers one-file batches twice — once
    * with compaction disabled (one live segment per trigger forever)
    * and once under the maintain policy (maxSegments=4) — and print
    * per-trigger live-segment counts + hook seconds. The claim under
    * measurement: per-trigger probe cost is FLAT in trigger count
    * under the policy, and grows with the accumulated segment count
    * without it (each blind append adds one tiny parquet segment whose
    * listing/footer/open cost every later probe pays). */
  private def runIngest(spark: SparkSession, nTriggers: Int,
      batchRows: Int): Unit = {
    import spark.implicits._
    def let(n: Long): String =
      n.toString.map(c => ('a' + (c - '0')).toChar).mkString
    def text(k: Long, sp: String): String =
      (0 until 30).map(j => s"$sp${let((k * 37 + j * 11) % 9973)}")
        .mkString(" ")
    val work = java.nio.file.Files.createTempDirectory("graft-streamprof")
    try {
      val store = spark.range(5000)
        .map(k => (k, text(k, "w"))).toDF("doc_id", "text")
      val store0 = graft.ops.Similarity.sigBands(store)
        .localCheckpoint(true)
      // one staged file per trigger: ~20% near-dups of the store, ~20%
      // near-dups of the PREVIOUS trigger's FRESH rows (so every
      // probe's answer genuinely depends on the folded segments —
      // code review r16: referencing the previous trigger's SAME slot
      // chased other beta rows, which only resolved for trigger 1;
      // slot r+1 is a case-`_` fresh row in every previous trigger),
      // 60% fresh
      graft.ops.StreamingOps.stageTriggerFiles(s"$work/stream",
        (0 until nTriggers).map { i =>
          (0 until batchRows).map { r =>
            val id = 1000000L + i.toLong * batchRows + r
            val t = r % 5 match {
              case 0 => text((i * 131 + r) % 5000L, "w") + " alpha"
              case 1 if i > 0 =>
                text(id - batchRows + 1, s"t${i - 1}x") + " beta"
              case _ => text(id, s"t${i}x")
            }
            (id, t)
          }.toDF("doc_id", "text")
        })
      def drain(tag: String, maxSegments: Int): Unit = {
        val root = s"$work/store-$tag"
        graft.ops.VersionedStore.init(store0, root)
        val stream = spark.readStream
          .schema("doc_id BIGINT, text STRING")
          .option("maxFilesPerTrigger", "1")
          .option("recursiveFileLookup", "true")
          .parquet(s"$work/stream")
        val inner = graft.ops.StreamingOps
          .sigIngestTrigger(spark, root, maxSegments)
        val rows = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Int, Double)]
        val outSchema = graft.ops.Similarity.dedupVsSigStore(
          spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](),
            stream.schema), store0).schema
        val t0 = System.nanoTime()
        graft.ops.StreamingOps.drainAndClean(spark, stream, s"prof-$tag",
          outputMode = "append",
          perBatch = (df, id) => {
            val s0 = System.nanoTime()
            val r = inner(df, id)
            val sec = (System.nanoTime() - s0) / 1e9
            // listed AFTER the hook (outside the timed region): the
            // hook's own maintain may have compacted, and b<id> is
            // excluded by the < id floor — so this is exactly the
            // layout the measured probe read (code review r16: the
            // pre-hook listing paired each time with the PRE-maintain
            // count, overstating segs on every firing trigger)
            val segs = graft.ops.VersionedStore
              .segmentsBefore(spark, root, id).size
            rows += ((id, segs, sec))
            r
          },
          outSchema = Some(outSchema))(identity).count()
        val total = (System.nanoTime() - t0) / 1e9
        rows.foreach { case (id, segs, sec) =>
          println(f"PROF ingest $tag trigger=$id segs=$segs sec=$sec%.3f")
        }
        val half = rows.length / 2
        if (half > 0) {
          val first = rows.take(half).map(_._3).sum / half
          val last = rows.drop(rows.length - half).map(_._3).sum / half
          println(f"PROF ingest $tag total=$total%.1f s, " +
            f"mean_first_half=$first%.3f s, mean_last_half=$last%.3f s, " +
            f"last/first=${last / first}%.2f")
        } else println(f"PROF ingest $tag total=$total%.1f s " +
          "(single trigger — no half split)")
      }
      drain("nocompact", maxSegments = Int.MaxValue)
      drain("maintain4", maxSegments = 4)
    } finally FsUtil.deleteRecursively(work)
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("ingest")) {
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      runIngest(spark,
        nTriggers = args.lift(1).map(_.toInt).getOrElse(30),
        batchRows = args.lift(2).map(_.toInt).getOrElse(300))
      spark.stop()
      return
    }
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
