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

  test("q15: decimal sums are exact (sum_qty equals decimal-cast manual sum)") {
    val row = Relational.q15AggTpch1(spark, dir)
      .agg(sum(col("sum_qty")).as("s"), sum(col("count_order")).as("n"))
      .collect().head
    val n = Tables.lineitem(spark, dir).count()
    assert(row.getLong(1) == n)
    val manual = Tables.lineitem(spark, dir)
      .agg(sum(col("l_quantity").cast("decimal(18,2)"))).collect().head.getDecimal(0)
    assert(row.getDecimal(0).compareTo(manual) == 0)
  }
}
