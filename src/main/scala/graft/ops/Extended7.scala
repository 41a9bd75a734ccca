package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.chaining._

/** q147–q152 — round-5 batch 2, every one DuckDB-oracle checked:
  *
  *  - q147 event-type transition matrix (first-order Markov)
  *  - q148 vocabulary growth curve (block-cumulative first-seen)
  *  - q149 inter-event gap histogram (bit-length buckets)
  *  - q150 data-quality rule audit (constraint violations per rule)
  *  - q151 quantile normalization (exact percent-rank feature)
  *  - q152 co-purchase lift (within-order part-pair association)
  */
object Extended7 {

  // ---------------------------------------------------------------- q147
  /** q147 — first-order Markov transition matrix over the event stream:
    * for each (from, to) pair of consecutive event types per user, the
    * count and the row-normalized transition probability. Ordering is
    * fully tiebroken (ts, event_id) so `lag` is deterministic on both
    * engines. Scale: one partitioned window over users (the natural
    * shuffle key), then all remaining work — row totals, normalization
    * — happens on the TYPE×TYPE aggregate (≤ |types|² rows, stats-
    * sized). Counts are exact; one final division. */
  def q147SessionTransitions(spark: SparkSession, dir: String): DataFrame = {
    val wU = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val trans = Tables.fanout(Tables.events(spark, dir)
        .select("user_id", "event_id", "event_type", "ts"))
      .withColumn("from_type", lag("event_type", 1).over(wU))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val wFrom = Window.partitionBy("from_type")
    trans
      .withColumn("row_total", sum("n").over(wFrom))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("row_total"), 6).as("p"))
      .orderBy("from_type", "to_type")
  }

  // ---------------------------------------------------------------- q148
  /** q148 — vocabulary growth curve: cumulative distinct word-3-GRAM
    * count as the corpus is ingested in doc_id order, reported per
    * 50-doc block — the "are we still seeing new content?" curation
    * curve (a flattening curve says additional data is redundant).
    * Grams, not words: this corpus's word vocabulary saturates in the
    * first docs (one block — a degenerate curve), while the gram space
    * keeps growing (q139's novelty signal, accumulated). first_seen =
    * min(doc_id) per gram is a plain partial+final aggregate; blocks
    * aggregate those, and the ONLY cumulative window runs over the
    * block table — stats-sized by construction (docs/50 rows), never
    * over docs or grams. */
  def q148VocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val toks = filter(split(lower(col("text")), "[^a-z]+"), x => x =!= "")
    val firstSeen = Tables.fanout(Tables.documents(spark, dir)
        .select("doc_id", "text"))
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("t")) - 2), i =>
          concat_ws(" ", element_at(col("t"), i),
            element_at(col("t"), i + 1), element_at(col("t"), i + 2)))))
        .as("g"))
      .groupBy("g").agg(min("doc_id").as("first_seen"))
    val wCum = Window.orderBy("block")
      .rowsBetween(Window.unboundedPreceding, 0)
    firstSeen
      .groupBy(expr("first_seen div 50").cast("int").as("block"))
      .agg(count(lit(1)).as("n_new"))
      .withColumn("cum_vocab", sum("n_new").over(wCum))
      .orderBy("block")
  }

  // ---------------------------------------------------------------- q149
  /** q149 — inter-event gap histogram: per event type, counts of
    * consecutive same-user gaps bucketed by the BIT LENGTH of the gap
    * in seconds (the q135 idiom — exact integer, no floor(log2) libm
    * wobble; bucket b holds gaps in [2^(b−1), 2^b) seconds). The lag
    * window partitions on (user, type) — the natural key; the
    * histogram is a stats-sized aggregate (types × ~40 buckets).
    * Integer micros throughout. */
  def q149InterEventGaps(spark: SparkSession, dir: String): DataFrame = {
    val wU = Window.partitionBy("user_id", "event_type")
      .orderBy("ts", "event_id")
    Tables.fanout(Tables.events(spark, dir)
        .select("user_id", "event_id", "event_type", "ts"))
      .withColumn("gap_s",
        expr("(unix_micros(ts) - unix_micros(lag(ts, 1) OVER " +
          "(PARTITION BY user_id, event_type ORDER BY ts, event_id))) " +
          "div 1000000"))
      .filter(col("gap_s").isNotNull)
      .withColumn("bucket", length(bin(col("gap_s"))))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"),
        min("gap_s").as("min_gap_s"), max("gap_s").as("max_gap_s"))
      .orderBy("event_type", "bucket")
  }

  // ---------------------------------------------------------------- q150
  /** q150 — data-quality rule audit (the dbt-test / Deequ shape): each
    * declared constraint over `orders` emits one row with its exact
    * violation count. Three in-row rules fold into ONE conditional
    * aggregate pass; the referential rule is a broadcast anti-join
    * count (customer keys are the dimension side). Zero-violation
    * rules still report — an audit that omits passing rules can't
    * prove it ran them. */
  def q150RuleAudit(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val inRow = o.agg(
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L))
        .as("r1_nonpositive_price"),
      sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L))
        .as("r2_stuck_pending"),
      sum(when(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"),
        1L).otherwise(0L)).as("r3_future_dated"))
    val orphans = o.join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey").as("o_custkey"))),
      Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("r4_orphan_customer"))
    inRow.crossJoin(orphans)
      .select(
        explode(map(
          lit("r1_nonpositive_price"), col("r1_nonpositive_price"),
          lit("r2_stuck_pending"), col("r2_stuck_pending"),
          lit("r3_future_dated"), col("r3_future_dated"),
          lit("r4_orphan_customer"), col("r4_orphan_customer")))
          .as(Seq("rule", "n_violations")))
      .orderBy("rule")
  }

  // ---------------------------------------------------------------- q151
  /** q151 — quantile normalization: each event's `value` mapped to its
    * exact within-type percent rank (rn−1)/(n−1) under a fully
    * tiebroken ordering — the rank-uniform feature transform (outlier-
    * immune where z-scoring is not). row_number over the unique
    * (value, event_id) order makes the rank engine-exact; the division
    * is the single IEEE op. Scale: one partitioned window on the type
    * key — the same shuffle any per-type normalization pays. */
  def q151QuantileNormalize(spark: SparkSession, dir: String): DataFrame = {
    val wR = Window.partitionBy("event_type")
      .orderBy(col("value").cast("decimal(18,6)"), col("event_id"))
    val wN = Window.partitionBy("event_type")
    Tables.fanout(Tables.events(spark, dir)
        .select("event_id", "event_type", "value"))
      .withColumn("rn", row_number().over(wR))
      .withColumn("n", count(lit(1)).over(wN))
      .select(col("event_id"), col("event_type"),
        round((col("rn") - 1).cast("double") / (col("n") - 1), 6)
          .as("q_norm"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------- q152
  /** q152 — co-purchase lift: for part pairs appearing in ≥ 2 common
    * orders, lift = P(a,b)/(P(a)·P(b)) over the order universe — the
    * association-mining primitive (market-basket analysis). The pair
    * join fans out WITHIN orders only (order size is bounded — ≤ 13
    * distinct parts here — so pairs/order is bounded, never corpus²);
    * part frequencies join back broadcast. Exact integer counts in
    * decimal cross-products; one final double division. */
  def q152CopurchaseLift(spark: SparkSession, dir: String): DataFrame = {
    val op = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
      .pipe(ScaleOps.stageCheckpoint)
    val nOrders = Tables.lineitem(spark, dir)
      .select(countDistinct("l_orderkey").as("n_orders"))
    val partFreq = op.groupBy("pk").agg(count(lit(1)).as("n_p"))
    val pairs = op.select(col("ok"), col("pk").as("pa"))
      .join(op.select(col("ok"), col("pk").as("pb")), "ok")
      .filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)
    pairs
      .join(broadcast(partFreq.select(col("pk").as("pa"),
        col("n_p").as("n_a"))), "pa")
      .join(broadcast(partFreq.select(col("pk").as("pb"),
        col("n_p").as("n_b"))), "pb")
      .crossJoin(broadcast(nOrders))
      .select(col("pa"), col("pb"), col("n_ab"),
        round((col("n_ab").cast("decimal(38,0)") * col("n_orders"))
            .cast("double") /
          (col("n_a").cast("decimal(38,0)") * col("n_b")).cast("double"),
          6).as("lift"))
      .orderBy("pa", "pb")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q147_session_transitions" -> (q147SessionTransitions _),
    "q148_vocab_growth" -> (q148VocabGrowth _),
    "q149_interevent_gaps" -> (q149InterEventGaps _),
    "q150_rule_audit" -> (q150RuleAudit _),
    "q151_quantile_normalize" -> (q151QuantileNormalize _),
    "q152_copurchase_lift" -> (q152CopurchaseLift _))

  val oracleSql: Map[String, String] = Map(
    "q147_session_transitions" ->
      """WITH t AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS from_type,
        |         event_type AS to_type
        |  FROM events),
        |c AS (
        |  SELECT from_type, to_type, count(*) AS n FROM t
        |  WHERE from_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(CAST(n AS DOUBLE) /
        |    sum(n) OVER (PARTITION BY from_type), 6) AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    "q148_vocab_growth" ->
      """WITH fs AS (
        |  SELECT g, min(doc_id) AS first_seen FROM (
        |    SELECT doc_id, unnest(list_distinct(
        |      list_transform(generate_series(1, len(t) - 2),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS g
        |    FROM (
        |      SELECT doc_id,
        |             list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                         x -> x <> '') AS t
        |      FROM documents)
        |    WHERE len(t) >= 3)
        |  GROUP BY g),
        |b AS (
        |  SELECT CAST(first_seen // 50 AS INT) AS block,
        |         count(*) AS n_new
        |  FROM fs GROUP BY 1)
        |SELECT block, n_new,
        |  CAST(sum(n_new) OVER (ORDER BY block
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_vocab
        |FROM b ORDER BY block""".stripMargin,
    "q149_interevent_gaps" ->
      """WITH g AS (
        |  SELECT event_type,
        |    (epoch_us(ts) - epoch_us(lag(ts) OVER (
        |       PARTITION BY user_id, event_type ORDER BY ts, event_id)))
        |      // 1000000 AS gap_s
        |  FROM events)
        |SELECT event_type, CAST(length(bin(gap_s)) AS INT) AS bucket,
        |  count(*) AS n, min(gap_s) AS min_gap_s, max(gap_s) AS max_gap_s
        |FROM g WHERE gap_s IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q150_rule_audit" ->
      """WITH m AS (
        |  SELECT
        |    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS r1,
        |    CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS r2,
        |    CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '2001-01-01'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS r3,
        |    CAST((SELECT count(*) FROM orders o
        |          WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                            WHERE c.c_custkey = o.o_custkey))
        |      AS BIGINT) AS r4
        |  FROM orders)
        |SELECT 'r1_nonpositive_price' AS rule, r1 AS n_violations FROM m
        |UNION ALL SELECT 'r2_stuck_pending', r2 FROM m
        |UNION ALL SELECT 'r3_future_dated', r3 FROM m
        |UNION ALL SELECT 'r4_orphan_customer', r4 FROM m
        |ORDER BY rule""".stripMargin,
    "q151_quantile_normalize" ->
      """SELECT event_id, event_type,
        |  round(CAST(rn - 1 AS DOUBLE) / (n - 1), 6) AS q_norm
        |FROM (
        |  SELECT event_id, event_type,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY CAST(value AS DECIMAL(18,6)), event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |ORDER BY event_id""".stripMargin,
    "q152_copurchase_lift" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |no AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem),
        |pf AS (SELECT pk, count(*) AS n_p FROM op GROUP BY 1),
        |pr AS (
        |  SELECT a.pk AS pa, b.pk AS pb, count(*) AS n_ab
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT pa, pb, n_ab,
        |  round(CAST(CAST(n_ab AS HUGEINT) * n_orders AS DOUBLE) /
        |        CAST(CAST(x.n_p AS HUGEINT) * y.n_p AS DOUBLE), 6) AS lift
        |FROM pr, no
        |JOIN pf x ON x.pk = pr.pa
        |JOIN pf y ON y.pk = pr.pb
        |ORDER BY pa, pb""".stripMargin)
}
