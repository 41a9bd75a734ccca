package graft

import graft.ops.ScaleOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale techniques are semantics-preserving: salting must not
  * change join results, and a bucketed state table must join without an
  * Exchange on the state side. */
class ScaleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val dir: String = SparkTest.sfDir

  test("salted join returns exactly the plain join's rows") {
    val fact = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val dim = Tables.customer(spark, dir)
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
    val cols = Seq("o_custkey", "o_orderkey", "o_totalprice", "c_name").map(col)
    val plain = fact.join(dim, "o_custkey").select(cols: _*)
      .orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    val salted = ScaleOps.saltedEquiJoin(fact, dim, "o_custkey")
      .select(cols: _*)
      .orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    assert(plain.nonEmpty && salted == plain)
  }

  test("bucketed state table joins without shuffling the state side") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    val state = Tables.events(spark, dir)
      .groupBy("user_id").agg(max("ts").as("last_ts"))
    ScaleOps.writeBucketedState(state, "state_bucketed", tmp, "user_id")
    try {
      val incoming = Tables.events(spark, dir)
        .select("user_id", "event_id", "ts")
      // hint forces the shuffle-family join (at test scale the state
      // table is broadcast-small, which would sidestep bucketing)
      val merged = spark.table("state_bucketed").hint("merge")
        .join(incoming, "user_id")
      val plan = merged.queryExecution.executedPlan.toString
      // the state scan branch must carry no Exchange: bucketing already
      // matches the join's required distribution
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle-family join:\n$plan")
      val exchangesTotal = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(exchangesTotal == 1,
        s"expected exactly one hash exchange (incoming side only), got $exchangesTotal:\n$plan")
      assert(merged.count() == incoming.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS state_bucketed")
    }
  }
}
