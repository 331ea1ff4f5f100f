package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Expression

/** Shared function-builder plumbing for the native expressions. */
object Builders {

  /** Unary-expression builder with the proper WRONG_NUM_ARGS analysis
    * error — see arity2's rationale. */
  def arity1(name: String)(mk: Expression => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a) => mk(a)
    case other => throw new AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> s"`$name`",
        "expectedNum" -> "1",
        "actualNum" -> other.size.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))
  }

  /** Wrap a binary-expression constructor as a registry builder that
    * rejects wrong arity with a proper analysis error — unchecked
    * `children(0)/children(1)` indexing would surface SQL like
    * `l2sq_native(a)` as an IndexOutOfBoundsException instead of the
    * standard WRONG_NUM_ARGS message. */
  def arity2(name: String)(mk: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a, b) => mk(a, b)
    case other => throw new AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> s"`$name`",
        "expectedNum" -> "2",
        "actualNum" -> other.size.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))
  }
}
