package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: synthesize a K× scale-probe dataset in /tmp from an sf dir
  * (the round-3 probe, reproducible this time). documents/events/
  * embeddings are replicated K times with shifted ids; documents get a
  * per-replica one-token suffix, so every original doc anchors a K-doc
  * near-dup cluster — the boilerplate-heavy worst case for the dedup
  * family, not a softball. Events shift user_id per replica (user count
  * ×K, per-user burst structure preserved — no cross-replica edges).
  * Dimension tables copy as-is. Usage:
  *   runMain graft.QScale [srcDir] [outDir] [K]
  */
object QScale {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_scale10"
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = explode(sequence(lit(0), lit(k - 1))).as("rep")

    // the replica shifts assume source ids fit below the strides; a
    // future sf dir that exceeds them would silently collide replicas
    // (duplicate doc_ids, cross-replica edges) and invalidate the probe
    // — fail loudly instead (ADVICE r7)
    def assertStride(table: String, idCol: String, stride: Long): Unit = {
      val mx = spark.read.parquet(s"$src/$table.parquet")
        .agg(max(col(idCol))).head.getLong(0)
      require(mx < stride,
        s"$table.$idCol max $mx >= replica stride $stride: raise the stride")
    }
    assertStride("documents", "doc_id", 10000000L)
    assertStride("events", "event_id", 100000000L)
    assertStride("events", "user_id", 1000000L)
    assertStride("embeddings", "vec_id", 10000000L)

    val docs = spark.read.parquet(s"$src/documents.parquet")
    docs.select(col("*"), reps)
      .withColumn("doc_id", col("doc_id") + col("rep") * 10000000L)
      .withColumn("text",
        when(col("rep") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" zz"), col("rep"))))
      .drop("rep")
      .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")

    val ev = spark.read.parquet(s"$src/events.parquet")
    ev.select(col("*"), reps)
      .withColumn("event_id", col("event_id") + col("rep") * 100000000L)
      .withColumn("user_id", col("user_id") + col("rep") * 1000000L)
      .drop("rep")
      .write.mode(SaveMode.Overwrite).parquet(s"$out/events.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    emb.select(col("*"), reps)
      .withColumn("vec_id", col("vec_id") + col("rep") * 10000000L)
      .drop("rep")
      .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")

    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
    }
    println(s"SCALE_DONE $out x$k")
    spark.stop()
  }
}
