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
}
