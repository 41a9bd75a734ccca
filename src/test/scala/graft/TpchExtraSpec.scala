package graft

import graft.ops.TpchExtra
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** q115–q120 plan-shape pins (values are DuckDB-oracle-checked; these
  * assert the SCALE properties the oracle can't see). */
class TpchExtraSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val dir: String = SparkTest.sfDir

  test("q115: all five dimension joins broadcast; share is a valid ratio") {
    val df = TpchExtra.q115TpchQ8(spark, dir)
    val bhj = df.queryExecution.sparkPlan.collect {
      case b: BroadcastHashJoinExec => b
    }
    // part, n2(region), supplier, n1 are explicit broadcasts; orders/
    // customer may or may not qualify by stats — the floor is 4
    assert(bhj.size >= 4, s"expected >=4 broadcast hash joins, got ${bhj.size}")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getDouble(1)
      assert(share >= 0.0 && share <= 1.0, s"mkt_share $share out of range")
    }
  }

  test("q117: high and low counts partition the late-line total") {
    import org.apache.spark.sql.functions._
    val rows = TpchExtra.q117TpchQ12(spark, dir).collect()
    val totalLate = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == totalLate)
  }

  test("q118: every kept line is under 20% of its part's average quantity") {
    import org.apache.spark.sql.functions._
    // independent re-derivation with double avg + strict margin: rows
    // within 1e-9 of the boundary would be ambiguous, so assert the
    // exact-decimal filter never keeps a clearly-over-threshold line
    val perPart = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey").as("pk"))
      .agg(avg("l_quantity").as("avg_q"))
    val over = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).filter(col("p_brand") === "Brand#3")
        .select("p_partkey"), col("l_partkey") === col("p_partkey"))
      .join(perPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("avg_q") * 0.2 - 1e-6)
      .count()
    val kept = TpchExtra.q118TpchQ17(spark, dir).collect()(0).getLong(2)
    // the exact-decimal keep-set must cover at least the clearly-under set
    assert(kept >= over, s"kept $kept < clearly-under-threshold $over")
  }

  test("q120: the semi/anti pair leaves only sole-late suppliers") {
    import org.apache.spark.sql.functions._
    val rows = TpchExtra.q120TpchQ21(spark, dir).collect()
    rows.foreach(r => assert(r.getLong(1) > 0))
    // suppliers are distinct and ranked by numwait desc
    val names = rows.map(_.getString(0))
    assert(names.distinct.length == names.length)
    val waits = rows.map(_.getLong(1))
    assert(waits.sameElements(waits.sortBy(-_)))
  }
}
