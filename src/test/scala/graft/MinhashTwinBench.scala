package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (VERDICT r4 item 6): measure the portability price of q25's
  * declared md5 MinHash instance against the splitmix64 fast instance
  * ([[graft.ops.Similarity.nearDupPairs]] — the pipeline default), and
  * report the pair-set agreement on the planted corpus. The measured
  * numbers live in SCALING.md §near-dup.
  *
  * Test/runMain graft.MinhashTwinBench [sfDir]
  */
object MinhashTwinBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.documents(spark, dir).select("doc_id", "text")
    val corpus = base.unionByName(base.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" planted near duplicate suffix")).as("text")))
    def clean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // warm the JVM/codegen on the fast path, then time each twice
    ops.Similarity.nearDupPairs(corpus).count(); clean()
    def time(label: String)(f: => Long): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"TWIN $label run$i n=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
      clean()
    }
    time("fast-splitmix64")(ops.Similarity.nearDupPairs(corpus).count())
    time("portable-md5")(ops.Similarity.q25NearDup(spark, dir).count())
    val fast = ops.Similarity.nearDupPairs(corpus)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    clean()
    val port = ops.Similarity.q25NearDup(spark, dir)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    clean()
    println(s"TWIN pairs fastOnly=${(fast -- port).size} " +
      s"portOnly=${(port -- fast).size} common=${(fast & port).size}")
    spark.stop()
  }
}
