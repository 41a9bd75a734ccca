package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import scala.util.chaining._

/** Distributed k-means (Lloyd's algorithm) over an embedding column —
  * the training half of the IVF index (q45 probes cells; this fits
  * them). Deterministic end-to-end: init = the k lowest-id vectors,
  * assignment ties break toward the lower cell id, and the centroid
  * update is a map-side-combined vector-sum Aggregator.
  *
  * Scale analysis (the reason for each choice):
  *  - Assignment: centroids broadcast (k·d doubles), each vector finds
  *    its argmin cell in one narrow pass — the corpus never shuffles.
  *  - Update: [[VectorSumAgg]] partially aggregates per task, so each
  *    task ships k·(d doubles + 1 count) per round, independent of row
  *    count — the same partial/final contract as any hash aggregate.
  *  - Rounds: each iteration localCheckpoints the (tiny) centroid
  *    table, keeping plan depth constant across iterations (the
  *    lineage lesson measured in CorpusPipeline.epoch).
  *  - Convergence: within-cluster cost is monotone non-increasing
  *    under Lloyd; the loop stops on relative improvement ≤ tol using
  *    one scalar aggregate per round.
  */
object Clustering {

  /** Element-wise vector sum + count; associative and commutative →
    * Spark runs it partial+final (map-side combine). */
  case class VecSum(s: Seq[Double], n: Long)
  class VectorSumAgg(dim: Int)
      extends Aggregator[Seq[Double], VecSum, VecSum] {
    def zero: VecSum = VecSum(Vector.fill(dim)(0.0), 0L)
    def reduce(b: VecSum, a: Seq[Double]): VecSum = {
      val out = new Array[Double](dim)
      var i = 0
      while (i < dim) { out(i) = b.s(i) + a(i); i += 1 }
      VecSum(out.toIndexedSeq, b.n + 1L)
    }
    def merge(x: VecSum, y: VecSum): VecSum = {
      val out = new Array[Double](dim)
      var i = 0
      while (i < dim) { out(i) = x.s(i) + y.s(i); i += 1 }
      VecSum(out.toIndexedSeq, x.n + y.n)
    }
    def finish(r: VecSum): VecSum = r
    def bufferEncoder: Encoder[VecSum] = Encoders.product[VecSum]
    def outputEncoder: Encoder[VecSum] = Encoders.product[VecSum]
  }

  /** Squared L2 distance between two array columns, in-row (zip_with +
    * aggregate higher-order fns — no explode). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Nearest-centroid id per vector (tie → lower cid) against a
    * broadcast centroid table (cid, ce). */
  private def assign(emb: DataFrame, cents: DataFrame): DataFrame =
    emb.crossJoin(broadcast(cents))
      .groupBy("id")
      .agg(min_by(col("cid"), struct(l2sq(col("e"), col("ce")),
        col("cid"))).as("cid"),
        min(l2sq(col("e"), col("ce"))).as("d2"))

  /** Fit k centroids on `emb` (columns: id: long, e: array<double>).
    * Returns one row per surviving centroid: (cid, ce, n).
    *
    * `n` is the cell population under a FINAL assignment against the
    * returned centroids (audit semantics: "how many vectors would each
    * returned cell hold"). `ce` is the mean of the LAST UPDATE round's
    * assignment — at convergence the two assignments coincide, but when
    * the loop exits on maxIters (e.g. q108's maxIters = 6) a vector may
    * have crossed cells in the final half-step, so (ce, n) can be
    * mutually inconsistent by those boundary vectors (ADVICE r3,
    * documented rather than recomputed: folding the count into the
    * update aggregate would report the PREVIOUS round's populations —
    * inconsistent with the returned ce in exactly the same way). */
  def kmeansFit(emb: DataFrame, k: Int, dim: Int, maxIters: Int = 20,
      tol: Double = 1e-6): DataFrame = {
    var cents = emb.orderBy("id").limit(k)
      .select((row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("id")) - 1)
        .as("cid"), col("e").as("ce"))
      .pipe(graft.ops.ScaleOps.stageCheckpoint)
    val vsum = udaf(new VectorSumAgg(dim))
    var prevCost = Double.MaxValue
    var i = 0
    var done = false
    while (i < maxIters && !done) {
      // ONE blocking job per round: the update aggregate ALSO carries
      // the per-cell cost sum, so the convergence probe reads the
      // (checkpointed, k-row) update result instead of running its own
      // pass over the assignment — round 3 paid 2 jobs/round (assignment
      // checkpoint + cost action); the assignment now stays lazy and
      // evaluates exactly once, inside the update
      val a = assign(emb, cents)
      val upd = emb.join(a, "id")
        .groupBy("cid").agg(vsum(col("e")).as("sn"), sum("d2").as("cellCost"))
        .pipe(graft.ops.ScaleOps.stageCheckpoint)
      // empty input ⟺ zero update rows (k > rows exhausted, or no
      // vectors) — return the current centroids instead of NPEing
      val costRow = upd.agg(sum("cellCost")).head()
      if (costRow.isNullAt(0)) {
        done = true
      } else {
      val cost = costRow.getDouble(0)
      cents = upd.select(col("cid"),
        transform(col("sn.s"), x => x / col("sn.n")).as("ce"))
      done = prevCost != Double.MaxValue &&
        (prevCost - cost) <= tol * math.max(prevCost, 1e-12)
      prevCost = cost
      }
      i += 1
    }
    cents.join(assign(emb, cents).groupBy("cid")
      .agg(count(lit(1)).as("n")), Seq("cid"), "left")
      .select(col("cid"), col("ce"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("cid")
  }

  /** q108 — k-means cell audit over the embeddings table: fit 8 cells
    * (Lloyd, deterministic init/ties), emit per-cell size and centroid
    * norm. Rows-only in t2 (an iterative float fixpoint has no
    * practical SQL oracle); ClusteringSpec pins planted-cluster
    * recovery and the Aggregator's partial/final contract.
    */
  def q108Kmeans(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val emb = graft.Tables.fanout(graft.Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("e")))
    // 6 rounds converge this k/dim well inside the tol window; the
    // declared query bounds rounds so bench cost stays proportional
    kmeansFit(emb, k = 8, dim = 64, maxIters = 6)
      .select(col("cid"), col("n"),
        round(sqrt(aggregate(col("ce"), lit(0.0),
          (acc, x) => acc + x * x)), 6).as("centroid_norm"))
      .orderBy("cid")
  }

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("q108_kmeans" -> (q108Kmeans _))

  val oracleSql: Map[String, String] = Map.empty
}
