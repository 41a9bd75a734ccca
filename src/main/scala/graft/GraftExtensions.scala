package graft

import graft.functions.CosineSim
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The engine's [[SparkSessionExtensions]] entry point — the PUBLIC
  * registration route for sessions the library owner builds
  * (`SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`):
  *
  *  - `injectFunction`: `cosine_sim` becomes callable from
  *    `spark.sql(...)` with a catalog ExpressionInfo entry.
  *
  * No optimizer rule is injected, deliberately: the one candidate —
  * constant-folding literal `cosine_sim` calls — is already covered by
  * Catalyst's built-in ConstantFolding, because [[CosineSim]] extends
  * BinaryExpression, whose `foldable` contract (both children foldable)
  * makes literal calls fold natively (pinned by GraftExtensionsSpec).
  * Injecting a redundant rule would add an optimizer-batch pass for
  * nothing.
  *
  * [[org.apache.spark.sql.GraftShims.registerBinaryFunction]] stays as
  * the runtime-registration fallback for sessions built by a host that
  * does not configure extensions (the t2 driver owns session creation
  * here). Both routes register the same expression. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"cosine_sim expects 2 arguments, got ${args.length}")
        CosineSim(args.head, args(1))
      }))
  }
}
