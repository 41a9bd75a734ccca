package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Typed Dataset[T] surface (SURVEY §1.3: case-class Encoders where
  * type safety helps, DataFrame interop everywhere else): encoder
  * roundtrip fidelity, typed transforms ≡ untyped equivalents, and the
  * catch — typed lambdas are OPAQUE to Catalyst (no pushdown through
  * a typed filter), which is why the library's declared queries stay
  * in the Column/SQL world. */
case class LineItemLite(l_orderkey: Long, l_quantity: Double,
    l_returnflag: String)

class DatasetApiSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val dir: String = SparkTest.sfDir

  private def typed: Dataset[LineItemLite] = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .as[LineItemLite]
  }

  test("encoder roundtrip: as[T] → case class → toDF preserves every row") {
    import spark.implicits._
    val ds = typed
    val back = ds.collect().toSeq.toDS().toDF()
      .orderBy("l_orderkey", "l_quantity", "l_returnflag")
      .collect().map(_.toSeq).toSeq
    val orig = ds.toDF()
      .orderBy("l_orderkey", "l_quantity", "l_returnflag")
      .collect().map(_.toSeq).toSeq
    assert(back == orig && orig.nonEmpty)
  }

  test("typed filter+groupByKey+mapGroups ≡ untyped groupBy") {
    import spark.implicits._
    val viaTyped = typed.filter(_.l_returnflag == "R")
      .groupByKey(_.l_orderkey)
      .mapGroups((k, rows) => (k, rows.map(_.l_quantity).sum))
      .collect().toMap
    val viaUntyped = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .groupBy("l_orderkey").agg(sum("l_quantity"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaTyped.keySet == viaUntyped.keySet)
    viaTyped.foreach { case (k, v) =>
      assert(math.abs(v - viaUntyped(k)) < 1e-9)
    }
  }

  test("typed lambdas block pushdown; Column filters reach the scan") {
    // the reason every declared query uses Column/SQL expressions:
    // a closure is a black box to the optimizer
    val typedPlan = typed.filter(_.l_returnflag == "R")
      .queryExecution.executedPlan.toString
    assert(!typedPlan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]"))
    val colPlan = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .filter(col("l_returnflag") === "R")
      .queryExecution.executedPlan.toString
    assert(colPlan.contains("EqualTo(l_returnflag,R)"),
      s"expected pushed filter in:\n$colPlan")
  }
}
