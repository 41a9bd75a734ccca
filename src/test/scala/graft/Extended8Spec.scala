package graft

import graft.ops.{Extended5, Extended8}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Extended8Spec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  val dir: String = SparkTest.sfDir

  test("q158: replicate means concentrate around the true mean") {
    val rows = Extended8.q158PoissonBootstrap(spark, dir).collect()
    assert(rows.length == 20)
    val o = Tables.orders(spark, dir)
    val n = o.count()
    val trueMean = o.agg(avg(col("o_totalprice").cast("decimal(18,2)"))
      .cast("double")).head.getDouble(0)
    rows.foreach { r =>
      val (nEff, m) = (r.getLong(1), r.getDouble(2))
      // Poisson(1) weights: n_eff ~ n ± 4*sqrt(n)
      assert(math.abs(nEff - n) <= 4 * math.sqrt(n.toDouble) + 1,
        s"replicate ${r.getLong(0)}: n_eff=$nEff vs n=$n")
      assert(math.abs(m - trueMean) / trueMean < 0.05,
        s"replicate ${r.getLong(0)}: mean $m vs $trueMean")
    }
    // replicates must actually differ (the whole point of the bootstrap)
    assert(rows.map(_.getDouble(2)).distinct.length > 1)
  }

  test("q159: each day's count equals a direct trailing-window query") {
    val rows = Extended8.q159RollingActiveUsers(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    val act = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    // spot-check three days, including the first (ramp-up) and last
    val days = rows.keys.toSeq.sorted
    Seq(days.head, days(days.length / 2), days.last).foreach { d =>
      val direct = act
        .filter(col("day") > date_sub(lit(d).cast("date"), 7) &&
          col("day") <= lit(d).cast("date"))
        .select(countDistinct("user_id")).head.getLong(0)
      assert(rows(d) == direct, s"$d: ${rows(d)} vs direct $direct")
    }
  }

  test("q160: blocks partition events and respect the duration cap") {
    val rows = Extended8.q160CappedSessions(spark, dir).collect()
    val total = Tables.events(spark, dir).count()
    assert(rows.map(_.getLong(3)).sum == total,
      "every event lands in exactly one session block")
    rows.foreach(r => assert(r.getLong(4) < 14400,
      s"block duration ${r.getLong(4)}s breaches the 4h cap"))
    // the 30-min gap rule must agree with q30's gap sessionization on
    // the number of gap-sessions
    val gapSessions = rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length
    val q30 = graft.ops.StreamingOps.queries("q30_session")(spark, dir).count()
    assert(gapSessions == q30,
      s"$gapSessions gap-sessions vs q30's $q30")
  }

  test("q161: percentiles are ordered and stages match the funnel") {
    val rows = Extended8.q161FunnelLatency(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSet ==
      Set("1_view_to_click", "2_click_to_purchase"))
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), "p50 <= p90")
      assert(r.getLong(2) >= 0 && r.getLong(3) <= 86400,
        "latencies live inside the 24h conversion window")
    }
    // stage populations must equal the q130 funnel's stage counts
    val funnel = Extended5.q130Funnel(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    val byStage = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStage("1_view_to_click") == funnel(2))
    assert(byStage("2_click_to_purchase") == funnel(3))
  }
}
