package graft

import graft.ops.Relational
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for q10–q23 that the DuckDB oracle can't carry (approximate
  * results) plus plan-shape checks for the scale-critical queries. */
class RelationalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val dir: String = SparkTest.sfDir

  test("q17: approx_count_distinct within 5% of exact per group") {
    val approx = Relational.q17ApproxDistinct(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"group $k: approx=$a exact=$e")
    }
  }

  test("q12: broadcast hint survives into the physical plan") {
    val plan = Relational.q12JoinBroadcast(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected BroadcastHashJoin in:\n$plan")
  }

  test("q20: top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = Relational.q20TopK(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject in:\n$plan")
  }

  test("q10: both predicates push down to the parquet scan") {
    // plan.toString truncates PushedFilters; formatted explain prints it full
    val plan = Relational.q10Filter(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("GreaterThan(l_quantity,30.0)") &&
      plan.contains("EqualTo(l_returnflag,R)"), s"pushdown missing in:\n$plan")
  }

  test("q14: range join stays an equi join (no cartesian product)") {
    val plan = Relational.q14JoinRange(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to a product join:\n$plan")
  }

  test("q13: semi+anti partition the customer set exactly") {
    val out = Relational.q13JoinSemiAnti(spark, dir)
    val total = Tables.customer(spark, dir).count()
    assert(out.count() == total)
    assert(out.select("c_custkey").distinct().count() == total)
  }

  test("q15: sums are decimal-exact internally (sum_qty equals decimal-cast manual sum)") {
    val counts = Relational.q15AggTpch1(spark, dir)
      .agg(sum(col("count_order"))).collect().head.getLong(0)
    assert(counts == Tables.lineitem(spark, dir).count())
    // the output column is double (driver hash diverges on decimal
    // columns), derived per group from the exact decimal sum — so each
    // group's value must bit-match the manual exact sum's double
    val manual = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("m"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDecimal(2).doubleValue())
      .toMap
    Relational.q15AggTpch1(spark, dir).collect().foreach { r =>
      assert(r.getDouble(2) == manual((r.getString(0), r.getString(1))))
    }
  }

  test("q32: approx_percentile is a drop-in within 5% of exact quartiles") {
    // SURVEY §2.3 claims approx_percentile (t-digest) is the 100 TB
    // drop-in for exact percentile — pin that the swap stays close
    val exact = Relational.q32Percentiles(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val approx = Tables.customer(spark, dir)
      .groupBy("c_mktsegment")
      .agg(expr("approx_percentile(c_acctbal, array(0.25, 0.5, 0.75), 10000)")
        .as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val span = 11000.0 // acctbal range
    approx.foreach { case (seg, ps) =>
      val (p25, p50, p75) = exact(seg)
      assert(math.abs(ps(0) - p25) < 0.05 * span)
      assert(math.abs(ps(1) - p50) < 0.05 * span)
      assert(math.abs(ps(2) - p75) < 0.05 * span)
    }
  }

  test("join strategy hints are honored: merge and shuffle_hash") {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val smj = o.join(c.hint("merge"),
      col("o_custkey") === col("c_custkey")).queryExecution.sparkPlan
    assert(smj.toString.contains("SortMergeJoin"))
    val shj = o.join(c.hint("shuffle_hash"),
      col("o_custkey") === col("c_custkey")).queryExecution.sparkPlan
    assert(shj.toString.contains("ShuffledHashJoin"))
  }

  test("q31: pivot cells sum back to the orders rowcount") {
    val rows = Relational.q31Pivot(spark, dir).collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3)).sum
    assert(total == Tables.orders(spark, dir).count())
  }

  test("q32: quartiles are ordered and bounded by min/max") {
    Relational.q32Percentiles(spark, dir).collect().foreach { r =>
      val (p25, p50, p75) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      val (lo, hi) = (r.getDouble(4), r.getDouble(5))
      assert(lo <= p25 && p25 <= p50 && p50 <= p75 && p75 <= hi)
    }
  }

  test("q33: as-of match is the latest click at or before the purchase") {
    val rows = Relational.q33AsofJoin(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.filter(r => !r.isNullAt(4)).foreach { r =>
      assert(r.getLong(4) <= r.getLong(2),
        s"click ts ${r.getLong(4)} after purchase ts ${r.getLong(2)}")
    }
    // every purchase event appears exactly once (left-join cardinality)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("q43: cube grand total equals the orders rowcount") {
    val rows = Relational.q43Cube(spark, dir).collect()
    val grand = rows.find(r => r.getString(0) == "ALL" && r.getString(1) == "ALL").get
    assert(grand.getLong(2) == Tables.orders(spark, dir).count())
    // 4 grouping levels: (s,p), (s,ALL), (ALL,p), (ALL,ALL)
    assert(rows.count(r => r.getString(0) == "ALL") >= 1)
  }

  test("q12: dimension join plans as a broadcast hash join (no fact shuffle)") {
    val plan = Relational.q12JoinBroadcast(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"fact side shuffled:\n$plan")
  }

  test("q33: as-of join runs on ONE data shuffle (plus the final sort)") {
    val plan = Relational.q33AsofJoin(spark, dir)
      .queryExecution.executedPlan.toString
    // exchanges: 1 hash-partition on user_id for the window + 1 range
    // partition for the output ORDER BY — and nothing else (no join)
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 3, s"as-of join shuffles too much ($exchanges):\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"as-of should be a windowed merge, not a join:\n$plan")
  }

  test("q01: scan schema is pruned to the projected columns") {
    val plan = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    val scan = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scan.contains("l_orderkey") && scan.contains("l_quantity")
      && !scan.contains("l_comment") && !scan.contains("l_extendedprice"),
      s"scan not pruned: $scan")
  }

  test("q47: hash sample is deterministic and respects per-stratum rates") {
    val s1 = graft.ops.TextOps.q47HashSample(spark, dir).collect()
    val s2 = graft.ops.TextOps.q47HashSample(spark, dir).collect()
    assert(s1.map(_.getLong(0)).toSeq == s2.map(_.getLong(0)).toSeq)
    assert(s1.nonEmpty)
    // every sampled row's bucket is under its language's rate
    s1.foreach { r =>
      val cap = r.getString(1) match {
        case "en" => 50; case "es" | "fr" | "de" => 30; case _ => 10
      }
      assert(r.getInt(2) < cap)
    }
  }

  test("q184: collocation lift matches an independent count-based recompute") {
    val rows = graft.ops.TextOps.q184CollocationLift(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // integer key ordering: c_xy desc, then (w1, w2)
    val keys = rows.map(r => (-r.getLong(2), r.getString(0), r.getString(1)))
    assert(keys.sameElements(keys.sorted), "not ordered by (c_xy desc, w1, w2)")
    // recompute the top row's lift from scratch with plain aggregates
    val (w1, w2, cxy, lift) = (rows.head.getString(0), rows.head.getString(1),
      rows.head.getLong(2), rows.head.getDouble(3))
    val toks = Tables.documents(spark, dir)
      .select(filter(split(lower(col("text")), "[^a-z]+"), t => t =!= "").as("t"))
    val uniRows = toks.select(explode(col("t")).as("w"))
      .filter(col("w").isin(w1, w2)).groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val u = toks.select(explode(col("t")).as("w")).count()
    val b = toks.select((size(col("t")) - 1).as("nb"))
      .filter(col("nb") >= 1).agg(sum("nb")).collect()(0).getLong(0)
    val expect = BigDecimal(
      (cxy.toDouble * u * u) / (b.toDouble * uniRows(w1) * uniRows(w2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(lift - expect) < 1e-9, s"lift $lift != recomputed $expect")
  }

  test("q44: every segment lists at most 5 names") {
    Relational.q44StringAgg(spark, dir).collect().foreach { r =>
      assert(r.getString(1).split(",").length <= 5)
    }
  }

  test("nested-struct surgery: withField/dropFields rewrite in place") {
    // Nested ETL without explode/rebuild: Column.withField updates one
    // leaf inside a struct (any depth), dropFields removes one — the
    // plan stays a single projection (no shuffle, codegen'd), which is
    // the right shape for restructuring deeply nested 100 TB records.
    import spark.implicits._
    val df = Seq((1L, ("a", 10, 0.5)), (2L, ("b", 20, 1.5)))
      .toDF("id", "rec")
    val out = df.withColumn("rec",
        col("rec").withField("_2", col("rec._2") * 100)
          .withField("flag", col("rec._3") > 1.0)
          .dropFields("_3"))
      .select("id", "rec._1", "rec._2", "rec.flag")
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getInt(2),
      r.getBoolean(3))).toSeq ==
      Seq((1L, "a", 1000, false), (2L, "b", 2000, true)))
    // single-stage: no exchange in the plan
    val plan = df.withColumn("rec", col("rec").withField("_2", lit(0)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("parameterized SQL: named args bind without string interpolation") {
    Tables.orders(spark, dir).createOrReplaceTempView("psql_orders")
    val out = spark.sql(
      "SELECT count(*) AS n FROM psql_orders WHERE o_orderpriority = :p",
      Map("p" -> "1-URGENT")).head().getLong(0)
    val exact = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT").count()
    assert(out == exact && exact > 0)
  }
}
