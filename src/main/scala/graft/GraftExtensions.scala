package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{Builders, CosineSim, DotProduct, L2Sq}

/** Session-extensions entry point — the idiomatic way a cluster enables the
  * library's native expressions for every session (including pure-SQL
  * users) without code changes:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * Injects the three codegen'd vector expressions at session build time.
  * Inside the library's own query builders the per-session
  * `DotProduct.register(spark)` calls remain (the driver owns SparkSession
  * construction and sets no extensions) — both paths register the same
  * (identifier, builder) pairs, and re-registration is idempotent.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_native"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_native"),
      Builders.arity2("dot_native")(DotProduct(_, _))))
    ext.injectFunction((
      FunctionIdentifier("cosine_native"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_native"),
      Builders.arity2("cosine_native")(CosineSim(_, _))))
    ext.injectFunction((
      FunctionIdentifier("l2sq_native"),
      new ExpressionInfo(classOf[L2Sq].getName, "l2sq_native"),
      Builders.arity2("l2sq_native")(L2Sq(_, _))))
  }
}
