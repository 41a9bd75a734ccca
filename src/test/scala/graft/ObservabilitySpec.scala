package graft

import graft.ops.ObservabilityOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `Dataset.observe` metrics: computed during the action (no second
  * scan), correct values, and composable with downstream transforms. */
class ObservabilitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val dir: String = SparkTest.sfDir

  test("quality metrics ride an existing action and report exact counts") {
    val docs = Tables.documents(spark, dir)
    val obs = ObservabilityOps.qualityObservation("q_docs")
    val observed = ObservabilityOps.withQualityMetrics(docs, obs, "doc_id")
    // the downstream pipeline continues past the observe node
    val kept = observed.filter(col("n_chars") > 0).count()
    val m = obs.get
    assert(m("n_rows") == docs.count())
    assert(m("n_null_key") == 0L)
    assert(m("key_min") == 0L)
    assert(kept > 0)
  }

  test("custom metric map: nulls and range drift surface by name") {
    import spark.implicits._
    val df = Seq((1L, 5.0), (2L, -3.0), (3L, Double.NaN))
      .toDF("id", "v")
    val obs = ObservabilityOps.qualityObservation("q_custom")
    val observed = ObservabilityOps.withMetrics(df, obs, Map(
      "n" -> count(lit(1)),
      "n_nan" -> count(when(isnan(col("v")), 1)),
      "n_neg" -> count(when(col("v") < 0, 1))))
    assert(observed.count() == 3)
    val m = obs.get
    assert(m("n") == 3L && m("n_nan") == 1L && m("n_neg") == 1L)
  }

  test("empty metric map is a contract error, not a late NoSuchElement") {
    import spark.implicits._
    val df = Seq((1L, 5.0)).toDF("id", "v")
    val obs = ObservabilityOps.qualityObservation("q_empty")
    val e = intercept[IllegalArgumentException] {
      ObservabilityOps.withMetrics(df, obs, Map.empty)
    }
    assert(e.getMessage.contains("at least one metric"))
  }
}
