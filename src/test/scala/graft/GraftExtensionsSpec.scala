package graft

import graft.functions.CosineSim
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions route: a session built with
  * `withExtensions(new GraftExtensions)` gets `cosine_sim` in SQL. The
  * extension session shares the test SparkContext (never stopped);
  * active/default session state is restored afterwards so the shared
  * suite session is unaffected. */
class GraftExtensionsSpec extends AnyFunSuite {

  private def withExtensionSession[T](body: SparkSession => T): T = {
    val prev = SparkTest.session // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      body(s2)
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("injectFunction: cosine_sim is callable from SQL") {
    withExtensionSession { s2 =>
      val r = s2.sql(
        """SELECT cosine_sim(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c,
          |       cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS o
          |""".stripMargin).collect().head
      assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
    }
  }

  test("injectFunction: sig_match_count is callable from SQL") {
    withExtensionSession { s2 =>
      val r = s2.sql(
        """SELECT sig_match_count(array('aa','bb','cc'),
          |                       array('aa','xx','cc')) AS n
          |""".stripMargin).collect().head
      assert(r.getInt(0) == 2)
    }
  }

  test("injectFunction: zorder_key is callable from SQL and matches the Column API") {
    withExtensionSession { s2 =>
      val r = s2.sql(
        "SELECT zorder_key(12345, 54321) AS z, zorder_key(0, 1) AS lo")
        .collect().head
      // reference per-bit interleave (LayoutSpec's refMorton on these inputs)
      def ref(a: Long, b: Long): Long =
        (0 until 32).foldLeft(0L) { (z, i) =>
          z | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
        }
      assert(r.getLong(0) == ref(12345L, 54321L))
      assert(r.getLong(1) == 2L) // b's bit 0 lands at position 1
    }
  }

  test("SQL scalar UDF: CREATE FUNCTION ... RETURN participates in queries") {
    // Spark 4.x SQL-defined UDFs: declarative, catalog-registered, and
    // inlined into the plan as expressions (unlike JVM closures, the
    // optimizer sees through them — they fold and push down).
    val s = SparkTest.session
    s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_clamp01(x DOUBLE)
            |RETURNS DOUBLE RETURN greatest(0.0D, least(1.0D, x))
            |""".stripMargin)
    val out = s.sql(
      "SELECT graft_clamp01(1.7) AS hi, graft_clamp01(-0.2) AS lo, " +
        "graft_clamp01(0.5) AS mid").head()
    assert(out.getDouble(0) == 1.0 && out.getDouble(1) == 0.0 &&
      out.getDouble(2) == 0.5)
    // literal arguments constant-fold: no udf/invoke node survives
    val plan = s.sql("SELECT graft_clamp01(1.7)")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("1.0"), s"expected folded literal in:\n$plan")
  }

  test("literal cosine_sim constant-folds via the BinaryExpression foldable contract") {
    // no injected optimizer rule needed FOR FOLDING: CosineSim inherits
    // foldable = (left.foldable && right.foldable) from
    // BinaryExpression, so built-in ConstantFolding evaluates literal
    // calls at plan time — the one rule GraftExtensions does inject
    // (JaccardSizeGuard) exists for a different reason: a rewrite no
    // built-in can derive
    withExtensionSession { s2 =>
      val df = s2.sql(
        "SELECT cosine_sim(array(1.0d, 2.0d), array(2.0d, 4.0d)) AS c")
      val remaining = df.queryExecution.optimizedPlan.expressions
        .flatMap(_.collect { case c: CosineSim => c })
      assert(remaining.isEmpty,
        s"expected folded plan, got:\n${df.queryExecution.optimizedPlan}")
      assert(math.abs(df.collect().head.getDouble(0) - 1.0) < 1e-12)
    }
  }

  private def jaccardFixture(s2: SparkSession) = {
    import s2.implicits._
    // (id, small set, big set): row 1 passes J >= 0.5; row 2 is
    // size-contradicted (1 vs 8 elements → J <= 1/8 < 0.5); row 3
    // shares nothing but has compatible sizes. RDD-backed (LogicalRDD),
    // NOT a local Seq: ConvertToLocalRelation would otherwise evaluate
    // the whole filter at plan time and leave no Filter node to
    // inspect.
    s2.createDataFrame(s2.sparkContext.parallelize(Seq(
      (1L, Array(1L, 2L, 3L), Array(1L, 2L, 3L, 4L)),
      (2L, Array(9L), Array(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)),
      (3L, Array(7L, 8L, 9L), Array(10L, 11L, 12L))), 1))
      .toDF("id", "a", "b")
  }

  test("JaccardSizeGuard: guards appear in the plan and results are unchanged") {
    withExtensionSession { s2 =>
      val df = jaccardFixture(s2)
        .filter(functions.JaccardSorted.jaccardSorted(
          org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b")) >= 0.5)
      val sizes = df.queryExecution.optimizedPlan
        .flatMap(_.expressions)
        .flatMap(_.collect {
          case s: org.apache.spark.sql.catalyst.expressions.Size => s })
      assert(sizes.size >= 2,
        s"expected size guards in:\n${df.queryExecution.optimizedPlan}")
      assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L),
        "only the true >= 0.5 pair survives")
      // the round(j, 6) published form is guarded too
      val rounded = jaccardFixture(s2)
        .filter(org.apache.spark.sql.functions.round(
          functions.JaccardSorted.jaccardSorted(
            org.apache.spark.sql.functions.col("a"),
            org.apache.spark.sql.functions.col("b")), 6) >= 0.5)
      val sizes2 = rounded.queryExecution.optimizedPlan
        .flatMap(_.expressions)
        .flatMap(_.collect {
          case s: org.apache.spark.sql.catalyst.expressions.Size => s })
      assert(sizes2.size >= 2)
      assert(rounded.collect().map(_.getLong(0)).toSeq == Seq(1L))
    }
  }

  test("JaccardSizeGuard: rule-free session returns identical rows (rewrite is semantics-free)") {
    val plainRows = {
      val s = SparkTest.session
      import s.implicits._
      Seq(
        (1L, Array(1L, 2L, 3L), Array(1L, 2L, 3L, 4L)),
        (2L, Array(9L), Array(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)),
        (3L, Array(7L, 8L, 9L), Array(10L, 11L, 12L)))
        .toDF("id", "a", "b")
        .filter(functions.JaccardSorted.jaccardSorted(
          org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b")) >= 0.5)
        .collect().map(_.getLong(0)).toSeq
    }
    withExtensionSession { s2 =>
      val guarded = jaccardFixture(s2)
        .filter(functions.JaccardSorted.jaccardSorted(
          org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b")) >= 0.5)
        .collect().map(_.getLong(0)).toSeq
      assert(guarded == plainRows)
    }
  }

  test("JaccardSizeGuard: idempotent — applying twice adds no second guard") {
    withExtensionSession { s2 =>
      val df = jaccardFixture(s2)
        .filter(functions.JaccardSorted.jaccardSorted(
          org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b")) >= 0.5)
      val once = df.queryExecution.optimizedPlan
      val twice = graft.plans.JaccardSizeGuard(once)
      assert(once.toString == twice.toString,
        "a second rule application must be a no-op")
    }
  }
}
