package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distributed logistic regression — the cheap supervised quality filter
  * of production corpus pipelines (CCNet/fastText shape: distill an
  * expensive labeling rule — an LLM judge, a human rubric, here the q35
  * composite score — into a linear model that scores 100 TB for the cost
  * of one narrow pass).
  *
  * Training is full-batch gradient descent on the kmeansFit pattern
  * ([[Clustering]]): the weight vector lives on the DRIVER (d doubles —
  * model-sized), each epoch is ONE aggregate job whose map side computes
  * per-row gradients with the broadcast weights and whose reduce side is
  * the element-wise [[Clustering.VectorSumAgg]] (partial aggregation —
  * d doubles per task cross the wire, never per-row gradients). The
  * feature frame is persisted once; epochs touch only it. Deterministic:
  * zero init, fixed step, IEEE ops in one engine.
  */
object LrOps {

  /** σ(w·f) with the driver-held weights closed over. */
  private def sigmoidUdf(w: Array[Double]) = udf { (f: Seq[Double]) =>
    var z = 0.0
    var i = 0
    while (i < w.length && i < f.length) { z += w(i) * f(i); i += 1 }
    1.0 / (1.0 + math.exp(-z))
  }

  /** Fit `epochs` of full-batch GD on (label ∈ {0,1}, f: dim doubles
    * incl. bias). Returns the weight vector. One job per epoch. */
  def fit(data: DataFrame, dim: Int, epochs: Int = 40,
      step: Double = 2.0): Array[Double] = {
    val spark = data.sparkSession
    import spark.implicits._
    val df = if (data.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      data.persist() else data
    val vsum = udaf(new Clustering.VectorSumAgg(dim))
    val w = new Array[Double](dim)
    var e = 0
    while (e < epochs) {
      val wl = w.clone()
      val gradUdf = udf { (label: Double, f: Seq[Double]) =>
        var z = 0.0
        var i = 0
        while (i < wl.length && i < f.length) { z += wl(i) * f(i); i += 1 }
        val g = 1.0 / (1.0 + math.exp(-z)) - label
        val out = new Array[Double](wl.length)
        var j = 0
        while (j < out.length && j < f.length) { out(j) = g * f(j); j += 1 }
        out.toSeq
      }
      val upd = df.select(gradUdf(col("label"), col("f")).as("g"))
        .agg(vsum(col("g")).as("s"))
        .select(col("s.s").as("s"), col("s.n").as("n"))
        .as[(Seq[Double], Long)].head()
      val (s, n) = upd
      var i = 0
      while (i < dim) { w(i) -= step * s(i) / n.toDouble; i += 1 }
      e += 1
    }
    w
  }

  /** Score rows with a trained weight vector: adds `p` = σ(w·f). One
    * narrow map — the 100 TB inference pass. */
  def predict(data: DataFrame, w: Array[Double]): DataFrame =
    data.withColumn("p", sigmoidUdf(w)(col("f")))

  /** The q176 feature frame: (doc_id, label, f) where f =
    * [bias, capped_len/100, stopword_ratio, punct_ratio, upper_ratio,
    * n_chars/1000] and label = [q35 quality_score > 0.55] — the
    * distillation target is EXACTLY linear in f (score = f1 + f2 − f3),
    * so LR can recover it; boundary-adjacent docs bound the reachable
    * accuracy in finite epochs. */
  private[ops] def featureFrame(spark: SparkSession, dir: String): DataFrame = {
    val nPunct = length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", ""))
    val nUpper = length(regexp_replace(col("text"), "[^A-Z]", ""))
    val nTokens = greatest(regexp_count(col("text"), lit("[a-zA-Z]+")), lit(1))
    Tables.fanout(Tables.documents(spark, dir)
        .select("doc_id", "n_chars", "text"))
      .withColumn("padded", concat(lit(" "), lower(col("text")), lit(" ")))
      .select(col("doc_id"),
        when(TextOps.qualityScore > 0.55, 1.0).otherwise(0.0).as("label"),
        array(lit(1.0),
          least(nTokens, lit(100)).cast("double") / 100,
          TextOps.stopwordRatio,
          nPunct.cast("double") / col("n_chars"),
          nUpper.cast("double") / col("n_chars"),
          col("n_chars").cast("double") / 1000).as("f"))
  }

  /** q176 — quality-classifier distillation, end to end: build features,
    * fit LR (40 driver-held-model epochs), score the corpus with the
    * trained weights, emit the integer confusion matrix + rounded
    * accuracy. Rows-only in t2 (an iterative float fixpoint has no SQL
    * oracle); LrSpec pins convergence on planted separable data and an
    * accuracy floor here. */
  def q176LrDistill(spark: SparkSession, dir: String): DataFrame = {
    val feats = featureFrame(spark, dir).persist()
    val w = fit(feats, dim = 6)
    // the result is ONE row (a confusion matrix): run the scoring
    // aggregate eagerly while feats is still cached, then release the
    // cache deterministically before returning — no persist outlives
    // the call (ADVICE r7 cache-leak sweep), and the scoring pass still
    // reads features from cache instead of recomputing them
    val r = predict(feats, w)
      .select(col("label"), when(col("p") >= 0.5, 1.0).otherwise(0.0).as("yhat"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("label") === 1.0 && col("yhat") === 1.0, 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("label") === 0.0 && col("yhat") === 1.0, 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("label") === 0.0 && col("yhat") === 0.0, 1L)
          .otherwise(0L)).as("tn"),
        sum(when(col("label") === 1.0 && col("yhat") === 0.0, 1L)
          .otherwise(0L)).as("fn"))
      .withColumn("accuracy",
        round((col("tp") + col("tn")).cast("double") / col("n"), 6))
      .head()
    feats.unpersist()
    import spark.implicits._
    Seq((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getDouble(5)))
      .toDF("n", "tp", "fp", "tn", "fn", "accuracy")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q176_lr_distill" -> (q176LrDistill _))

  val oracleSql: Map[String, String] = Map.empty
}
