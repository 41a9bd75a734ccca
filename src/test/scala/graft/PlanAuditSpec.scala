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
  *  3. No window partitioned ONLY by a low-cardinality key (≤10
  *     distinct values in this schema: return flags, event types,
  *     sources, …) unless the windowed TABLE is itself provably tiny —
  *     a ≤5-way partition over a fact table is a ≤5-reducer bottleneck
  *     at 100×, exactly as bad as a global window. The scale-safe
  *     idioms are per-(key, shard) windows plus a broadcast offset
  *     table (ScaleOps.groupedShardedCumSum, q141/q151/q162).
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

  // columns with ≤10 distinct values in this schema (TESTDATA.md); a
  // window partitioned by a subset of ONLY these keys caps parallelism
  // at the key cardinality regardless of cluster size
  private val lowCardCols = Set("l_returnflag", "l_linestatus",
    "event_type", "source", "lang", "o_orderstatus", "o_orderpriority",
    "l_shipmode", "variant", "split", "et", "flag")

  // queries allowed a low-card-partitioned window, with the reason the
  // windowed TABLE (not the partition count) is bounded
  private val lowCardWindowWhitelist: Map[String, String] = Map(
    "q141_weighted_median" ->
      ("groupedShardedCumSum offset window: O(nShards)=32 rows per " +
        "flag, not line items"),
    "q151_quantile_normalize" ->
      "per-bucket offset window: ≤64 rows per type, not events",
    "q124_equidepth_hist" ->
      ("sharded-rank offset window: ≤5×33 shard-count rows per " +
        "priority, not orders"),
    "q162_rolling_anomaly" ->
      "per-block offset window: ≤64 rows per type, not events",
    "q132_ks_drift" ->
      ("per-source CDF windows run on the densified stats grid " +
        "(sources × distinct n_chars values), never on documents"),
    "q136_stratified_sample" ->
      "shardedMd5Rank offset window: ≤ langs×32 shard-count rows, not documents",
    "q166_temperature_sample" ->
      "shardedMd5Rank offset window: ≤ sources×32 shard-count rows, not documents")

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

  test("windows partitioned only by a ≤10-distinct key are whitelisted") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val offenders = fn(spark, dir).queryExecution.sparkPlan.collect {
        case w: WindowExec if w.partitionSpec.nonEmpty &&
            w.partitionSpec.forall(
              _.references.iterator.forall(a => lowCardCols(a.name))) =>
          w.partitionSpec.flatMap(_.references.iterator.map(_.name))
      }
      if (offenders.nonEmpty)
        assert(lowCardWindowWhitelist.contains(name),
          s"$name windows on low-cardinality keys alone " +
            s"(${offenders.map(_.mkString(",")).mkString("; ")}) — " +
            "≤10 reducers at scale; shard it (q145/q162 idiom) or " +
            "whitelist with a boundedness reason")
    }
  }
}
