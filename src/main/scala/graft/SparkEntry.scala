package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the t2 correctness surface: each entry's result (written to
  * parquet by [[Verify]]) is hash-compared by the driver against DuckDB
  * executing the matching [[oracleSql]] on the same tables. Queries without
  * an oracle (approximate / not SQL-expressible) get a rows-only check and
  * are covered by ScalaTest instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference pipeline's shape end-to-end: dedup-latest per key then
    * regroup per user (SURVEY.md §2.1 R5–R10) over the events table.
    */
  def entry(spark: SparkSession): DataFrame =
    ops.CorePipeline.q06DedupLatest(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.CorePipeline.queries ++ ops.Relational.queries ++
      ops.TextOps.queries ++ ops.Similarity.queries ++
      ops.StreamingOps.queries ++ ops.MultimodalOps.queries ++
      pipeline.CorpusPipeline.queries ++ ops.Extended.queries ++
      ops.Extended2.queries ++ ops.Extended3.queries ++
      ops.GraphOps.queries ++ ops.Clustering.queries ++
      ops.TpchExtra.queries ++ ops.Extended4.queries ++
      ops.Extended5.queries ++ ops.Extended6.queries ++
      ops.Extended7.queries ++ ops.Extended8.queries ++
      ops.Extended9.queries ++ ops.BpeOps.queries ++ ops.LrOps.queries ++
      ops.Extended10.queries ++ ops.PqOps.queries ++
      ops.SpanOps.queries ++ ops.SemStoreOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.CorePipeline.oracleSql ++ ops.Relational.oracleSql ++
      ops.TextOps.oracleSql ++ ops.Similarity.oracleSql ++
      ops.StreamingOps.oracleSql ++ ops.MultimodalOps.oracleSql ++
      pipeline.CorpusPipeline.oracleSql ++ ops.Extended.oracleSql ++
      ops.Extended2.oracleSql ++ ops.Extended3.oracleSql ++
      ops.GraphOps.oracleSql ++ ops.Clustering.oracleSql ++
      ops.TpchExtra.oracleSql ++ ops.Extended4.oracleSql ++
      ops.Extended5.oracleSql ++ ops.Extended6.oracleSql ++
      ops.Extended7.oracleSql ++ ops.Extended8.oracleSql ++
      ops.Extended9.oracleSql ++ ops.BpeOps.oracleSql ++ ops.LrOps.oracleSql ++
      ops.Extended10.oracleSql ++ ops.PqOps.oracleSql ++
      ops.SpanOps.oracleSql ++ ops.SemStoreOps.oracleSql
}
