package graft

import graft.ops.Extended2
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the q67–q73 wave — properties the DuckDB oracle
  * can't see (plan shape, equivalence to unoptimized formulations) or
  * that pin intent on hand-built fixtures. */
class Extended2Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val dir: String = SparkTest.sfDir

  test("q67: merged spans are disjoint per customer and cover every order") {
    val spans = Extended2.q67IntervalMerge(spark, dir).collect()
      .groupBy(_.getLong(0))
    spans.foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.getLong(2))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // next span starts strictly after this one ends (else merged)
          assert(b.getLong(2) > a.getLong(3))
        case _ =>
      }
      // a span's end never precedes its start + at least one order inside
      assert(sorted.forall(r => r.getLong(3) > r.getLong(2) && r.getLong(4) >= 1))
    }
    val nOrders = Tables.orders(spark, dir).count()
    assert(spans.values.map(_.map(_.getLong(4)).sum).sum == nOrders)
  }

  test("q67: an early long interval swallows later short ones (cummax, not lag)") {
    import spark.implicits._
    // interval A [0, 100] overlaps B [10, 20] and C [90, 95]; D [200, 210]
    // is separate. A lag-based (gap) test would split after B since C's
    // start > B's end — the cumulative max must keep them in one span.
    val iv = Seq((1L, 1L, 0L, 100L), (1L, 2L, 10L, 20L),
      (1L, 3L, 90L, 95L), (1L, 4L, 200L, 210L))
      .toDF("k", "id", "s", "e")
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy("s", "id")
      .rowsBetween(Long.MinValue, -1)
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy("s", "id")
      .rowsBetween(Long.MinValue, 0)
    val spans = iv.withColumn("pmax", max(col("e")).over(w1))
      .withColumn("island",
        sum(when(col("pmax").isNull || col("s") > col("pmax"), 1L)
          .otherwise(0L)).over(w2))
      .groupBy("k", "island")
      .agg(min("s").as("lo"), max("e").as("hi"), count(lit(1)).as("n"))
      .orderBy("island").collect()
    assert(spans.map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      == Seq((0L, 100L, 3L), (200L, 210L, 1L)))
  }

  test("q68: scores rank a term higher when it is rarer across docs") {
    val out = Extended2.q68Tfidf(spark, dir).collect()
    assert(out.nonEmpty)
    // rnk within each doc is 1..k and scores are non-increasing in rnk
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRnk = rows.sortBy(_.getLong(1))
      assert(byRnk.map(_.getLong(1)).toSeq == (1L to byRnk.length))
      assert(byRnk.sliding(2).forall {
        case Array(a, b) => a.getDouble(5) >= b.getDouble(5)
        case _ => true
      })
    }
    // score = tf * N / df exactly
    val n = Tables.documents(spark, dir).count().toDouble
    assert(out.forall(r =>
      r.getDouble(5) == r.getLong(3).toDouble * n / r.getLong(4)))
  }

  test("q69: versions tile each user's timeline without overlap") {
    val out = Extended2.q69Scd2(spark, dir).collect().groupBy(_.getLong(0))
    out.foreach { case (_, vs) =>
      val sorted = vs.sortBy(_.getLong(3))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // each version closes exactly where the next opens
          assert(!a.isNullAt(4) && a.getLong(4) == b.getLong(3))
          // consecutive versions differ in type (else not a change)
          assert(a.getString(2) != b.getString(2))
        case _ =>
      }
      // only the last version is open
      assert(sorted.last.isNullAt(4))
    }
  }

  test("q70: bloom-pruned join result equals the plain join") {
    val pruned = Extended2.q70BloomJoin(spark, dir)
    val dim = Tables.part(spark, dir).filter(col("p_size") <= 5)
      .select("p_partkey", "p_brand")
    val plain = Tables.lineitem(spark, dir)
      .join(dim, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(18,2)"))
          .cast("double").as("sum_qty"))
      .orderBy("p_brand")
    assert(pruned.collect().toSeq == plain.collect().toSeq)
  }

  test("q71: flagged rows are exactly those beyond 2 sample stddevs") {
    val out = Extended2.q71ZscoreOutliers(spark, dir).collect()
    assert(out.forall(r => math.abs(r.getDouble(3)) > 2.0))
    // cross-check one group against naively computed stats
    val vals = Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("value").cast("decimal(18,6)").cast("double"))
      .collect().map(_.getDouble(0))
    if (vals.length > 1) {
      val mean = vals.sum / vals.length
      val sd = math.sqrt(
        vals.map(v => (v - mean) * (v - mean)).sum / (vals.length - 1))
      val expected = vals.count(v => math.abs((v - mean) / sd) > 2.0)
      val got = out.count(_.getString(1) == "click")
      // naive float summation differs from the exact-decimal path only
      // at ulp level; counts can differ by at most the boundary cases
      assert(math.abs(expected - got) <= 1)
    }
  }

  test("q72: the sample is stable across runs and capped at 2 per segment") {
    val a = Extended2.q72Md5Sample(spark, dir).collect().toSeq
    val b = Extended2.q72Md5Sample(spark, dir).collect().toSeq
    assert(a == b)
    assert(a.groupBy(_.getString(0)).values.forall(_.length <= 2))
  }

  test("q75: every rollup level totals to the grand total") {
    val rows = Extended2.q75TimeRollup(spark, dir).collect()
    val grand = rows.filter(r => r.getLong(0) == -1L).map(_.getLong(3))
    assert(grand.length == 1)
    val n = grand.head
    // per-year rows (m = -1, y != -1) sum to the grand total, and so on
    val perYear = rows.filter(r => r.getLong(0) != -1L && r.getLong(1) == -1L)
    val perDay = rows.filter(r => r.getLong(2) != -1L)
    assert(perYear.map(_.getLong(3)).sum == n)
    assert(perDay.map(_.getLong(3)).sum == n)
  }

  test("q76: reported pairs are within-block, ordered, and within distance") {
    val rows = Extended2.q76FuzzyDedup(spark, dir).collect()
    rows.foreach { r =>
      val (a, b, d) = (r.getString(0), r.getString(1), r.getInt(4))
      assert(a < b)
      assert(a.split(" ").head == b.split(" ").head)
      assert(d >= 1 && d <= 3)
    }
  }

  test("q77: keys whose last change is a delete are absent from the snapshot") {
    val snap = Extended2.q77CdcApply(spark, dir).collect()
      .map(_.getLong(0)).toSet
    // recompute the last change per user naively
    val last = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rs) =>
        val winner = rs.maxBy(r => (r.getLong(2), r.getLong(1)))
        u -> (winner.getLong(1) % 10 != 0)
      }
    last.foreach { case (u, kept) => assert(snap.contains(u) == kept, s"user $u") }
  }

  test("q78: date and region filters push down to the parquet scans") {
    val plan = Extended2.q78TpchQ5(spark, dir)
      .queryExecution.executedPlan.toString
    // the orders year filter must reach the orders scan, not sit in a
    // post-scan Filter only; same for the region name filter
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate)"),
      s"orders date filter not pushed:\n$plan")
    assert(plan.contains("EqualTo(r_name,ASIA)"),
      s"region filter not pushed:\n$plan")
    // lineitem scan reads only the 3 columns the query needs
    val liSchema = plan.linesIterator
      .filter(_.contains("lineitem.parquet"))
      .mkString("\n")
    assert(liSchema.contains("l_orderkey") && !liSchema.contains("l_comment")
      && !liSchema.contains("l_shipdate"),
      s"lineitem scan not pruned:\n$liSchema")
  }

  test("q78: plan broadcasts the dim sides and aggregates once") {
    val plan = Extended2.q78TpchQ5(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    // revenue decimal-exact before the final double
    val rows = Extended2.q78TpchQ5(spark, dir).collect()
    assert(rows.nonEmpty && rows.forall(_.getDouble(1) >= 0))
    // sorted by revenue desc
    assert(rows.sliding(2).forall {
      case Array(a, b) => a.getDouble(1) >= b.getDouble(1)
      case _ => true
    })
  }

  test("q79: mean norms are positive and labels are complete") {
    val rows = Extended2.q79EmbedStats(spark, dir).collect()
    val nLabels = Tables.embeddings(spark, dir)
      .select("label").distinct().count()
    assert(rows.length == nLabels)
    assert(rows.forall(_.getDouble(2) > 0))
  }

  test("q83: the cut is minimal and crosses 80% exactly once") {
    val rows = Extended2.q83ParetoCut(spark, dir).collect()
    assert(rows.nonEmpty)
    // every row except the last is below the threshold cumulatively;
    // the last row is the first to reach or pass it
    val shares = rows.map(_.getDouble(2))
    assert(shares.dropRight(1).forall(_ < 80.0))
    assert(shares.last >= 80.0)
    // ordered by revenue descending
    val revs = rows.map(_.getDouble(1))
    assert(revs.sliding(2).forall {
      case Array(a, b) => a >= b
      case _ => true
    })
  }

  test("q84: surplus counts agree with the exact-dedup query") {
    val report = Extended2.q84DupReport(spark, dir).collect()
    val totalDocs = report.map(_.getLong(1)).sum
    val totalSurplus = report.map(_.getLong(2)).sum
    assert(totalDocs == Tables.documents(spark, dir).count())
    // distinct (source, text) pairs = docs - surplus
    val distinctPairs = Tables.documents(spark, dir)
      .select("source", "text").distinct().count()
    assert(totalDocs - totalSurplus == distinctPairs)
  }

  test("q73: bigram counts and conditionals match a hand-built fixture") {
    import spark.implicits._
    val docs = Seq("the cat sat", "the cat ran", "a cat").toDF("text")
    val toks = expr("filter(split(lower(text), '[^a-z]+'), x -> x != '')")
    val bigrams = expr(
      """zip_with(slice(toks, 1, size(toks) - 1),
        |         slice(toks, 2, size(toks) - 1),
        |         (a, b) -> named_struct('w1', a, 'w2', b))""".stripMargin)
    val out = docs.select(toks.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(bigrams).as("bg"))
      .select(col("bg.w1"), col("bg.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(
      ("the", "cat") -> 2L, ("cat", "sat") -> 1L,
      ("cat", "ran") -> 1L, ("a", "cat") -> 1L))
  }
}
