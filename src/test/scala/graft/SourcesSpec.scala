package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Non-parquet sources: CSV with an explicit schema (never inferred —
  * inference is a second full scan at 100 TB) must round-trip rows
  * exactly. The JSONL source is exercised end-to-end by
  * MoviePipelineSpec on the movie-shaped fixture. */
class SourcesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val dir: String = SparkTest.sfDir

  test("csv source: explicit-schema roundtrip preserves every row") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    cust.write.mode("overwrite").option("header", "true").csv(tmp)
    val back = spark.read.schema(cust.schema)
      .option("header", "true").csv(tmp)
    assert(back.schema == cust.schema)
    val a = back.orderBy("c_custkey").collect().map(_.toSeq).toSeq
    val b = cust.orderBy("c_custkey").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("orc source: roundtrip preserves rows and schema") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val sup = Tables.supplier(spark, dir)
    sup.write.mode("overwrite").orc(tmp)
    val back = spark.read.orc(tmp)
    assert(back.schema == sup.schema)
    assert(back.orderBy("s_suppkey").collect().map(_.toSeq).toSeq ==
      sup.orderBy("s_suppkey").collect().map(_.toSeq).toSeq)
  }

  test("xml source: explicit-schema roundtrip preserves every row") {
    // Spark 4.x ships the XML source natively (SPARK-44265). Same
    // explicit-schema rule as CSV: inference is a second full scan.
    val tmp = java.nio.file.Files.createTempDirectory("graft_xml").toString
    val nat = Tables.nation(spark, dir)
    nat.write.mode("overwrite").option("rootTag", "nations")
      .option("rowTag", "nation").format("xml").save(tmp)
    val back = spark.read.schema(nat.schema)
      .option("rowTag", "nation").format("xml").load(tmp)
    assert(back.schema == nat.schema)
    assert(back.orderBy("n_nationkey").collect().map(_.toSeq).toSeq ==
      nat.orderBy("n_nationkey").collect().map(_.toSeq).toSeq)
  }

  test("partitioned parquet write: a partition filter prunes the scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.orders(spark, dir)
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(tmp)
    // hive-style layout on disk: one directory per status value
    val dirs = new java.io.File(tmp).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.forall(_.startsWith("o_orderstatus=")) && dirs.length >= 2)
    val q = spark.read.parquet(tmp).filter(org.apache.spark.sql.functions
      .col("o_orderstatus") === "F")
    // the filter must land in the scan's partitionFilters (directory
    // pruning — at 100 TB this is reading 1/N of the data, not scanning
    // and discarding), not in a post-scan Filter over all partitions
    val scan = q.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.nonEmpty,
      "status filter should prune partitions at the scan")
    val expected = Tables.orders(spark, dir)
      .filter(org.apache.spark.sql.functions.col("o_orderstatus") === "F").count()
    assert(q.count() == expected)
  }
}
