package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: q201 PQ/ADC at tier scale (the distinct-vector corpora —
  * QScale replicas are identical vectors, fine for compute shape,
  * meaningless for recall). Stages, each timed:
  *   train      — 8 × ks-centroid codebooks, ONE shared bounded draw
  *   encode     — one in-row pass, codes written id-sorted-within-
  *                partitions (row-group stats serve the refinement's
  *                literal-isin point lookups)
  *   adc ×2     — 5 queries over the STORED 8-byte code column +
  *                exact top-32 refinement (the serving shape); run
  *                twice, min is the number (host throttle rule)
  *   encode.base/
  *   append/audit — the add-with-ids lifecycle: encode a 90% base,
  *                blind-append the 10% batch under the frozen model
  *                (∝ batch — must sit far under encode.base), run the
  *                2× reconstruction-MSE drift audit
  *   brute ×2   — 5 queries exact squared-L2 over the raw 512-byte
  *                e0 column, top-10 (the comparator q26 shape)
  * Also prints the stored-bytes ratio codes vs raw — the published
  * 64× memory claim, measured.
  * Usage: runMain graft.QPqProbe [dir] [ks]
  */
object QPqProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_distinct200k"
    val ks = if (args.length > 1) args(1).toInt else 256
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PQPROBE $label%-12s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    }
    def emb() = Tables.fanout(Tables.embeddings(spark, dir)
        .select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("e")))
      .filter(size(col("e")) === 64)
    // warmup (codegen) outside timings
    emb().limit(10).write.format("noop").mode("overwrite").save()
    var model: ops.PqOps.PqModel = null
    timed("train") {
      model = ops.PqOps.pqTrain(emb(), dim = 64, m = 8, ks = ks,
        maxIters = 4)
    }
    val codesDir = "/tmp/graft_pq_codes"
    timed("encode") {
      emb().select(col("id"),
          ops.PqOps.pqEncode(model)(col("e")).as("code"))
        .sortWithinPartitions("id")
        .write.mode("overwrite").parquet(codesDir)
    }
    def bytesOf(p: String): Long = {
      val d = new java.io.File(p)
      if (!d.exists) 0L
      else d.listFiles.filter(_.getName.endsWith(".parquet"))
        .map(_.length).sum
    }
    println(s"PQPROBE bytes codes=${bytesOf(codesDir)}" +
      s" raw=${bytesOf(dir)}" +
      f" ratio=${bytesOf(dir).toDouble / bytesOf(codesDir)}%.1f")
    val qvecs = emb().orderBy("id").limit(5)
      .select(col("id"), col("e")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    (1 to 2).foreach { i =>
      timed(s"adc_$i") {
        val codes = spark.read.parquet(codesDir)
        ops.PqOps.pqAdcQueryCodes(emb(), codes, model, qvecs,
          topR = 32, depth = 10)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // IVFADC: residual codes stored beside the coarse cells,
    // cell-partitioned — a partial probe (nProbe of nCells) prunes
    // the code read at the file listing (the q199 prebuilt lesson
    // applied to codes), and ADC tables are per-(query, probed cell)
    val ivfadcDir = "/tmp/graft_pq_ivfadc"
    var cents: Array[(Long, Array[Double])] = Array.empty
    var residModel: ops.PqOps.PqModel = null
    timed("ivfadc_build") {
      val (index, cs) = ops.Extended10.ivfIndex(
        emb().select(col("id").as("vec_id"), col("e").as("e0")),
        dim = 64, nCells = 16)
      cents = cs
      residModel = ops.PqOps.pqTrainResidual(index, cents, dim = 64,
        m = 8, ks = ks, maxIters = 4)
      ops.PqOps.ivfAdcIndex(index, cents, residModel)
        .repartition(col("cell")).sortWithinPartitions("vec_id")
        .write.partitionBy("cell")
        .mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(ivfadcDir)
    }
    (1 to 2).foreach { i =>
      timed(s"ivfadc_$i") {
        val idx = spark.read.parquet(ivfadcDir)
        ops.PqOps.ivfAdcQuery(idx, cents, residModel, qvecs,
          nProbe = 4, topR = 32, depth = 10, pruneCells = true)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // append lifecycle (add-with-ids): encode a 10% batch under the
    // FROZEN model and blind-append — must sit far under encode.base
    // (the corpus pass), since the stored codes are never read. The
    // audit is the q200 2× MSE trigger on reconstruction error. The
    // base/batch splits are MATERIALIZED outside the timed stages
    // (the QSparseProbe lesson from this same round: deriving a slice
    // by filtering the corpus charges every stage a full corpus scan;
    // production batches arrive as their own files).
    val lifeDir = "/tmp/graft_pq_codes_life"
    val lifeSrc = "/tmp/graft_pq_life_src"
    FsUtil.deleteRecursively(lifeDir)
    emb().filter(pmod(col("id"), lit(10L)) =!= 9)
      .write.mode("overwrite").parquet(s"$lifeSrc/base")
    emb().filter(pmod(col("id"), lit(10L)) === 9)
      .write.mode("overwrite").parquet(s"$lifeSrc/batch")
    val lifeBase = spark.read.parquet(s"$lifeSrc/base")
    val lifeBatch = spark.read.parquet(s"$lifeSrc/batch")
    timed("encode.base") {
      ops.PqOps.pqAppend(lifeBase, model, lifeDir)
    }
    timed("append") {
      ops.PqOps.pqAppend(lifeBatch, model, lifeDir)
    }
    timed("audit") {
      ops.PqOps.pqAppendAudit(lifeBase, lifeBatch, model)
        .write.format("noop").mode("overwrite").save()
    }
    (1 to 2).foreach { i =>
      timed(s"brute_$i") {
        val qmap = qvecs.toMap
        val exactUdf = udf { (qId: Long, e: Seq[Double]) =>
          ops.Clustering.l2sqLocal(qmap(qId), e.toArray)
        }.asNonNullable()
        import spark.implicits._
        val qDf = broadcast(qvecs.map(_._1).toSeq.toDF("q_id"))
        emb().crossJoin(qDf)
          .select(col("q_id"), col("id"),
            exactUdf(col("q_id"), col("e")).as("d2"))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("q_id").orderBy(col("d2"), col("id"))))
          .filter(col("rn") <= 10)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
