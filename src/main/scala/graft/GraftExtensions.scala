package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.expressions.TextExpressions

/** Cluster-deployment entry point for the engine's custom Catalyst
  * expressions: ship the jar and set
  *
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  *
  * and every session on the cluster gets `dot_product_d`, `l2_norm_d`,
  * `hashed_shingles` and `simhash60` in SQL — no per-session
  * `registerAll` call, which only covers sessions the caller creates
  * (JDBC/Thrift and notebook sessions are created by the platform). The
  * injected builders are the same ones `TextExpressions.registerAll`
  * installs; both paths resolve to the identical codegen'd expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    TextExpressions.sqlBuilders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.expressions", name), es => builder(es)))
    }
}
