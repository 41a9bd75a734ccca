package graft

import graft.functions.Md5Bucket
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The swap-safety contract for [[Md5Bucket]]: value-identical to the
  * hex-string chain it replaces, for every (digits, mod) pair the repo
  * uses, on randomized strings — so migrating a call site can never
  * move a hash (and therefore never an oracle). */
class Md5BucketSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private val cases = Seq((4, 100), (6, 10000), (15, 0), (1, 7), (8, 0))

  test("md5_bucket equals the md5/substring/conv/pmod chain on random strings") {
    val strs = (0 until 500).map(i => s"probe:$i:${"x" * (i % 37)}") ++
      Seq("", " ", "unicode-é-漢", "a:b:c", "0")
    val df = strs.toDF("s").persist()
    cases.foreach { case (digits, mod) =>
      val chain0 = conv(substring(md5(col("s").cast("binary")), 1, digits),
        16, 10).cast("long")
      val chain = if (mod > 0) pmod(chain0, lit(mod)) else chain0
      val bad = df.select(col("s"),
          Md5Bucket.md5Bucket(col("s"), digits, mod).as("native"),
          chain.as("chain"))
        .filter(col("native") =!= col("chain")).collect()
      assert(bad.isEmpty,
        s"(digits=$digits, mod=$mod): ${bad.take(3).mkString(",")}")
    }
    df.unpersist()
  }

  test("md5_bucket stays inside whole-stage codegen and folds literals") {
    val df = Seq("a", "b").toDF("s")
      .select(Md5Bucket.md5Bucket(col("s"), 6, 10000).as("b"))
    // interpreted and codegen paths agree (collect exercises codegen)
    assert(df.collect().map(_.getLong(0)).toSet.size == 2)
    // foldable: a fully-literal call folds away at optimization time
    // (TernaryExpression's foldable contract — no Md5Bucket node may
    // survive into the optimized plan)
    val survivors = Seq(1).toDF("i")
      .select(Md5Bucket.md5Bucket(lit("const"), 4, 100))
      .queryExecution.optimizedPlan
      .collectWithSubqueries { case p => p.expressions.flatMap(_.collect {
        case m: graft.functions.Md5Bucket => m
      }) }.flatten
    assert(survivors.isEmpty, "literal md5_bucket must constant-fold")
  }

  test("digits outside [1, 15] is rejected") {
    intercept[IllegalArgumentException] {
      graft.functions.Md5Bucket(
        org.apache.spark.sql.catalyst.expressions.Literal("x"),
        org.apache.spark.sql.catalyst.expressions.Literal(16),
        org.apache.spark.sql.catalyst.expressions.Literal(0)).eval()
    }
  }
}
