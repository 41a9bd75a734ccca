package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Global plan audit over EVERY declared query — the scale guardrails
  * that individual specs can't keep exhaustive as the surface grows:
  *
  *  1. No CartesianProductExec anywhere. Range/theta joins must keep an
  *     equi anchor; a cartesian that "works" at sf0.01 is a 10^12-pair
  *     explosion at 100 TB. (1-row broadcast cross joins plan as
  *     BroadcastNestedLoopJoin and are fine — only the shuffled
  *     cartesian is forbidden.)
  *  2. Unpartitioned windows only where the windowed frame is provably
  *     tiny — a whitelist each entry of which documents WHY it is
  *     bounded. A global window over fact-table rows funnels the whole
  *     dataset through one reducer.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val dir: String = SparkTest.sfDir

  // queries allowed an unpartitioned window, with the boundedness reason
  private val globalWindowWhitelist: Map[String, String] = Map(
    "q60_pack_sequences" ->
      "shardedCumSum offset window is O(nShards) rows, not O(docs)",
    "q46_corpus_prep" ->
      "shardedCumSum offset window is O(nShards) rows, not O(docs)",
    "q100_epoch_build" ->
      "shardedCumSum offset window is O(nShards) rows, not O(docs)",
    "q108_kmeans" ->
      "init row_number window runs on the k-row limit output, not the corpus",
    "q112_share_of_total" ->
      "total window runs on the per-nation AGGREGATE (25 rows), not customers",
    "q113_yoy_growth" ->
      "lag window runs on the per-year AGGREGATE (~7 rows), not orders",
    "q122_pps_sample" ->
      "shardedCumSum offset window is O(nShards) rows, not O(docs)",
    "q168_retrieval_eval" ->
      ("rank/count windows run on the bounded query-set eval table " +
        "(one row per planted query, ≤ 50 by construction)"),
    "q148_vocab_growth" ->
      ("cumulative window runs on the 50-doc BLOCK table (docs/50 rows, " +
        "stats-sized); first-seen is a plain aggregate, never windowed"),
    "q145_curriculum_stages" ->
      ("prefix-offset window runs on the DISTINCT token-length table " +
        "(stats-sized), not docs — the global rank itself is per-length " +
        "rank + broadcast offset"),
    "q83_pareto_cut" ->
      ("cumsum over the per-customer rollup, O(customers) not O(orders); " +
        "shard by rev range when customers outgrow a reducer"))

  test("no declared query plans a cartesian product") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val cartesians = fn(spark, dir).queryExecution.sparkPlan.collect {
        case c: CartesianProductExec => c
      }
      assert(cartesians.isEmpty, s"$name plans a cartesian product")
    }
  }

  test("unpartitioned windows appear only on the bounded-frame whitelist") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val globalWindows = fn(spark, dir).queryExecution.sparkPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      if (globalWindows.nonEmpty)
        assert(globalWindowWhitelist.contains(name),
          s"$name has an unpartitioned window not on the whitelist")
    }
  }
}
