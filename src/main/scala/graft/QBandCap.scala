package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: the q183 band-bucket-cap EXPERIMENT (VERDICT r9 item 6).
  * Hypothesis under test: inside a mega-cluster, bands 1..3's buckets
  * "add no discriminative grouping", so dropping band-buckets whose
  * population exceeds a cap (keeping band 0 so every mega-cluster
  * stays grouped) should cut q183's constant without changing groups.
  * This runs starCollapse's exact dataflow twice on a probe corpus —
  * uncapped vs capped (the population count rides the SAME window
  * that computes the bucket min, so the cap costs no extra exchange)
  * — prints stage timings + edge counts pre/post-distinct, and
  * compares the final (rep, cluster_size) outputs exactly.
  * Usage: runMain graft.QBandCap [sfDir] [cap]
  */
object QBandCap {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cap = if (args.length > 1) args(1).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Similarity

    val corpus = Similarity.plantedCorpus(spark, dir)
    val sigs = Similarity.portableSigs(corpus).persist()
    sigs.count() // materialize the shared frontend OUTSIDE both timings
    val bands = sigs.select(col("doc_id"),
      posexplode(Similarity.portableBandKeys(col("sig")))
        .as(Seq("band_idx", "band_key")))

    def collapse(capped: Boolean): (DataFrame, Long, Long, Double) = {
      val t0 = System.nanoTime()
      val w = Window.partitionBy("band_idx", "band_key")
      val withMin = bands
        .withColumn("bmin", min(col("doc_id")).over(w))
        .withColumn("cnt", count(lit(1)).over(w))
      val kept =
        if (capped) withMin.filter(col("band_idx") === 0 || col("cnt") <= cap)
        else withMin
      val pre = kept.filter(col("doc_id") =!= col("bmin"))
        .select(col("bmin").as("a_id"), col("doc_id").as("b_id"))
      val preN = pre.count()
      val edges = pre.distinct().persist()
      val postN = edges.count()
      val verified = edges
        .join(sigs.select(col("doc_id").as("a_id"), col("sig").as("sig_a")), "a_id")
        .join(sigs.select(col("doc_id").as("b_id"), col("sig").as("sig_b")), "b_id")
        .select(col("a_id"), col("b_id"),
          round(graft.functions.SigMatchCount.sigMatchCount(
            col("sig_a"), col("sig_b")).cast("double") / Similarity.K, 6)
            .as("est"))
        .filter(col("est") >= 0.5)
        .select("a_id", "b_id")
      val members = verified.select(explode(array(
        struct(col("a_id").as("doc_id"), col("b_id").as("peer")),
        struct(col("b_id").as("doc_id"), col("a_id").as("peer")),
        struct(col("a_id").as("doc_id"), col("a_id").as("peer")),
        struct(col("b_id").as("doc_id"), col("b_id").as("peer")))).as("m"))
        .select(col("m.doc_id").as("doc_id"), col("m.peer").as("peer"))
      val out = members.groupBy("doc_id").agg(min("peer").as("rep"))
        .groupBy("rep").agg(count(lit(1)).as("cluster_size"))
        .localCheckpoint()
      edges.unpersist()
      (out, preN, postN, (System.nanoTime() - t0) / 1e9)
    }

    val (base, basePre, basePost, baseSec) = collapse(capped = false)
    val (capd, capPre, capPost, capSec) = collapse(capped = true)
    println(f"CAPEXP uncapped pre=$basePre post=$basePost $baseSec%.2f s")
    println(f"CAPEXP capped($cap) pre=$capPre post=$capPost $capSec%.2f s")
    val diff = base.except(capd).count() + capd.except(base).count()
    println(s"CAPEXP groups_equal=${diff == 0} (symmetric except = $diff)")
    spark.stop()
  }
}
