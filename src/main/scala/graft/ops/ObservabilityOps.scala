package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-cost pipeline health metrics via `Dataset.observe`.
  *
  * The reference's only "verification" is driver-side log counters
  * (SURVEY.md §5.1 — success/failure/update counts at
  * DataTransformationService.java:170–172). At 100 TB the equivalent
  * must not cost a second scan: `observe` attaches accumulator-backed
  * aggregates to a plan that compute DURING the action already running
  * — rows seen, null keys, out-of-range values — and surfaces them on
  * the driver when the action finishes. No shuffle, no extra pass, no
  * collect.
  *
  * Usage:
  * {{{
  *   val obs = ObservabilityOps.qualityObservation()
  *   val out = ObservabilityOps.withQualityMetrics(df, obs, "doc_id")
  *   out.write.parquet(...)            // the real action
  *   val m = obs.get                   // rows / null-keys / distinct-ish
  * }}}
  */
object ObservabilityOps {

  /** Fresh named observation handle (one per attached action). */
  def qualityObservation(name: String = "graft_quality"): Observation =
    Observation(name)

  /** Attach standard quality metrics for `keyCol` to the frame: total
    * rows, null/absent keys, and min/max key (range drift detection).
    * The returned frame is the SAME data — metrics ride the next
    * action's execution.
    */
  def withQualityMetrics(df: DataFrame, obs: Observation,
      keyCol: String): DataFrame =
    df.observe(obs,
      count(lit(1)).as("n_rows"),
      count(when(col(keyCol).isNull, 1)).as("n_null_key"),
      min(col(keyCol)).as("key_min"),
      max(col(keyCol)).as("key_max"))

  /** Attach a named set of custom metric expressions (each must be an
    * aggregate over the frame). */
  def withMetrics(df: DataFrame, obs: Observation,
      metrics: Map[String, Column]): DataFrame = {
    require(metrics.nonEmpty, "withMetrics needs at least one metric")
    val cols = metrics.toSeq.sortBy(_._1)
      .map { case (n, c) => c.as(n) }
    df.observe(obs, cols.head, cols.tail: _*)
  }
}
