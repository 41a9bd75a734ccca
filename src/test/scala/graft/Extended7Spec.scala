package graft

import graft.ops.Extended7
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Extended7Spec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  val dir: String = SparkTest.sfDir

  test("q147: rows normalize to 1 and transitions count to n - users") {
    val rows = Extended7.q147SessionTransitions(spark, dir).collect()
    val byFrom = rows.groupBy(_.getString(0))
    byFrom.foreach { case (from, rs) =>
      val psum = rs.map(_.getDouble(3)).sum
      assert(math.abs(psum - 1.0) < 1e-4, s"$from: p sums to $psum")
    }
    // every event except each user's first is the target of exactly
    // one transition
    val nEvents = Tables.events(spark, dir).count()
    val nUsers = Tables.events(spark, dir)
      .select(countDistinct("user_id")).head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == nEvents - nUsers)
  }

  test("q148: growth curve is monotone and ends at the distinct-gram count") {
    val rows = Extended7.q148VocabGrowth(spark, dir)
      .orderBy("block").collect()
    assert(rows.length > 1, "curve must have more than one block")
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) < b.getLong(2))
      case _ =>
    }
    val toks = filter(split(lower(col("text")), "[^a-z]+"), x => x =!= "")
    val total = Tables.documents(spark, dir)
      .select(toks.as("t")).filter(size(col("t")) >= 3)
      .select(explode(array_distinct(
        transform(sequence(lit(1), size(col("t")) - 2), i =>
          concat_ws(" ", element_at(col("t"), i),
            element_at(col("t"), i + 1), element_at(col("t"), i + 2)))))
        .as("g"))
      .select(countDistinct("g")).head.getLong(0)
    assert(rows.last.getLong(2) == total)
    assert(rows.map(_.getLong(1)).sum == total)
  }

  test("q149: bucket bounds hold and gaps count to n - groups") {
    val rows = Extended7.q149InterEventGaps(spark, dir).collect()
    rows.foreach { r =>
      val (b, lo, hi) = (r.getInt(1), r.getLong(3), r.getLong(4))
      assert(lo <= hi)
      // bucket = bit length: every gap g in the bucket has
      // 2^(b-1) <= g < 2^b (b >= 1; gap 0 lands in bucket 1 via bin)
      assert(java.lang.Long.toBinaryString(math.max(lo, 1L)).length == b
        || lo == 0 && b == 1)
      assert(java.lang.Long.toBinaryString(math.max(hi, 1L)).length == b
        || hi == 0 && b == 1)
    }
    val nEvents = Tables.events(spark, dir).count()
    val nGroups = Tables.events(spark, dir)
      .select("user_id", "event_type").distinct().count()
    assert(rows.map(_.getLong(2)).sum == nEvents - nGroups)
  }

  test("q150: every declared rule reports; counts match direct checks") {
    val rows = Extended7.q150RuleAudit(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("r1_nonpositive_price", "r2_stuck_pending",
      "r3_future_dated", "r4_orphan_customer"))
    val o = Tables.orders(spark, dir)
    assert(rows("r1_nonpositive_price") ==
      o.filter(col("o_totalprice") <= 0).count())
    assert(rows("r2_stuck_pending") ==
      o.filter(col("o_orderstatus") === "P").count())
    assert(rows("r2_stuck_pending") > 0,
      "fixture has pending orders — a zero here means the rule is broken")
    assert(rows("r4_orphan_customer") == 0,
      "fixture referential integrity holds")
  }

  test("q151: q_norm spans [0,1] per type and preserves value order") {
    val df = Extended7.q151QuantileNormalize(spark, dir)
    val byType = df.groupBy("event_type")
      .agg(min("q_norm").as("lo"), max("q_norm").as("hi"),
        count(lit(1)).as("n"), countDistinct("q_norm").as("nd"))
      .collect()
    byType.foreach { r =>
      assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 1.0)
      // fully tiebroken ranks: every rank distinct
      assert(r.getLong(3) == r.getLong(4))
    }
    // order preservation: higher value never maps to lower q_norm
    val joined = df.join(Tables.events(spark, dir)
      .select("event_id", "value"), "event_id")
    val viol = joined.as("a").join(joined.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.value") > col("b.value") &&
          col("a.q_norm") < col("b.q_norm"))
      .limit(1).count()
    assert(viol == 0)
  }

  test("q154: keep-best policy prefers the longer planted variant") {
    val rows = Extended7.q154CanonicalDedup(spark, dir).collect()
    val nDocs = Tables.documents(spark, dir).count()
    // originals are mutually distinct → one group per original doc
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val (nv, kept) = (r.getLong(1), r.getLong(2))
      assert(nv == 1 || nv == 2)
      if (nv == 2)
        assert(kept >= 1000000L,
          s"group of 2 kept $kept — the longer suffixed copy must win")
    }
    assert(rows.count(_.getLong(1) == 2) > 0, "planted pairs must exist")
  }

  test("q155: diff counts match the planted edit schedule") {
    val m = Extended7.q155SnapshotDiff(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val d = Tables.documents(spark, dir)
    assert(m("removed") == d.filter(col("doc_id") % 10 === 0).count())
    assert(m("changed") == d.filter(col("doc_id") % 10 === 1).count())
    assert(m("added") == d.filter(col("doc_id") % 10 === 2).count())
    assert(m.values.sum ==
      d.count() + m("added"), "every v1 id + added ids classified once")
  }

  test("q156: salted join result is identical to the plain join") {
    val salted = Extended7.q156SaltedJoin(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("suppkey"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"))
      .join(Tables.supplier(spark, dir)
        .select(col("s_suppkey").as("suppkey"), col("s_nationkey")),
        "suppkey")
      .join(Tables.nation(spark, dir)
        .select(col("n_nationkey").as("s_nationkey"), col("n_name")),
        "s_nationkey")
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_lines"),
        sum("price").cast("double").as("revenue"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("q157: profile facts hold against direct queries") {
    val rows = Extended7.q157ColumnProfile(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    val o = Tables.orders(spark, dir)
    assert(rows.keySet.size == 5)
    rows.values.foreach { case (nulls, _, _, _) => assert(nulls == 0L) }
    assert(rows("o_orderkey")._2 == o.count(), "orderkey is unique")
    assert(Set("F", "O", "P").contains(rows("o_orderstatus")._3))
    assert(rows("o_totalprice")._3.matches("""\d+\.\d\d"""),
      s"price renders as a scale-2 decimal, got ${rows("o_totalprice")._3}")
  }

  test("q152: lift matches an independent recount for the top pair") {
    val rows = Extended7.q152CopurchaseLift(spark, dir).limit(1).collect()
    assert(rows.nonEmpty)
    val r = rows.head
    val (pa, pb, nab) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nab >= 2)
    val op = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val nOrders = Tables.lineitem(spark, dir)
      .select(countDistinct("l_orderkey")).head.getLong(0)
    val na = op.filter(col("pk") === pa).count()
    val nb = op.filter(col("pk") === pb).count()
    val nabDirect = op.filter(col("pk") === pa)
      .join(op.filter(col("pk") === pb).select("ok"), "ok").count()
    assert(nabDirect == nab)
    val expected = nab.toDouble * nOrders / (na.toDouble * nb)
    assert(math.abs(r.getDouble(3) - expected) <= 5e-7)
  }
}
