package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the repo's PORTABLE md5 draw:
  * `md5_bucket(s, digits, mod)` ≡
  * `pmod(conv(substring(md5(cast(s as binary)), 1, digits), 16, 10), mod)`
  * (and with mod = 0, ≡ the un-modded conv), value-identical by
  * construction: the first `digits` hex characters of the md5 string
  * are the digest's high-order nibbles, so the parse is one
  * big-endian shift — no hex string is ever materialized.
  *
  * Why an Expression: the chain it replaces allocates a 32-char hex
  * string, a substring, and a radix-parse PER DRAW, and the draws sit
  * in per-token / per-bigram hot paths (q185/q186 bigram buckets,
  * q189 one draw per token position, q191/q192 one 60-bit hash per
  * token). `doGenCode` emits one static call on the raw digest bytes
  * (thread-local MessageDigest, zero garbage beyond the 16-byte
  * digest array Java's MD5 returns).
  *
  * The DuckDB oracles are UNTOUCHED — they replay the hex-string
  * route, which is the point: Md5BucketSpec pins this expression
  * equal to the Spark hex-chain on randomized inputs for every
  * (digits, mod) the repo uses, so swapping call sites cannot move a
  * hash. digits ∈ [1, 15] keeps the value inside a positive long
  * (≤ 2^60); mod ≤ 0 means "no mod". Null string → null. */
case class Md5Bucket(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.GraftShims.AbstractDataType] =
    Seq(StringType, IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_bucket"

  override protected def nullSafeEval(s: Any, digits: Any, mod: Any): Any =
    Md5Bucket.hash(s.asInstanceOf[UTF8String],
      digits.asInstanceOf[Int], mod.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, d, m) => {
      s"${ev.value} = graft.functions.Md5Bucket$$.MODULE$$.hash($s, $d, $m);"
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object Md5Bucket {
  private val digestTL =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** First `digits` hex nibbles of md5(utf8 bytes) as a long, modded
    * when `mod` > 0. Called from generated code — keep the signature
    * primitive. */
  def hash(s: UTF8String, digits: Int, mod: Int): Long = {
    require(digits >= 1 && digits <= 15,
      s"md5_bucket digits must be in [1, 15], got $digits")
    val md = digestTL.get()
    md.reset()
    val b = md.digest(s.getBytes)
    var hi = 0L
    var i = 0
    while (i < 8) { hi = (hi << 8) | (b(i) & 0xffL); i += 1 }
    val v = hi >>> (64 - 4 * digits)
    if (mod > 0) v % mod else v
  }

  /** Column-API entry point: md5Bucket($"s", digits, mod). */
  def md5Bucket(s: Column, digits: Int, mod: Int): Column =
    org.apache.spark.sql.GraftShims.column(Md5Bucket(
      org.apache.spark.sql.GraftShims.expression(s),
      org.apache.spark.sql.catalyst.expressions.Literal(digits),
      org.apache.spark.sql.catalyst.expressions.Literal(mod)))
}
