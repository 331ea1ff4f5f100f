package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.DotProduct

/** Optimizer rule (round-11): fuse the PORTABLE dot-product fold
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) }}}
  *
  * into the codegen'd `DotProduct` kernel. This is the extension ladder's
  * `Rule[LogicalPlan]` rung (SURVEY §2.13), doing real work: Spark's
  * higher-order lambdas evaluate INTERPRETED, outside whole-stage codegen
  * (per-element closure dispatch — see DotProduct's scaladoc), so a user
  * who writes the declarative, engine-portable fold (exactly `V.dot`'s
  * shape, the one the DuckDB oracles mirror) pays the interpreted price.
  * With `GraftExtensions` installed the optimizer rewrites it to the
  * native expression and the fold-shaped query runs on the tight
  * primitive loop — library acceleration with zero user code changes.
  *
  * Semantics preservation is exact, NOT assumed: on equal-length arrays
  * DotProduct folds left-to-right in the same order as the lambda chain
  * (bit-identical — NativeDotSpec), and a null ELEMENT nulls both forms;
  * but on LENGTH MISMATCH the fold is null (zip_with null-pads the short
  * side) while dot_native folds over the min length. The rewrite
  * therefore guards with a size-equality check —
  * `if(size(a) = size(b), dot_native(a, b), null)` — which also covers
  * null arrays (size(null) = null ⇒ predicate null ⇒ null branch, the
  * fold's answer). ExtensionsSpec pins all three regimes against the
  * unfused session.
  *
  * Matching is strict — the multiply and add lambdas must reference
  * exactly their own lambda variables (by exprId, either operand order —
  * IEEE `+`/`*` are commutative bit-for-bit), the zero must be literal
  * 0.0D, and the finish lambda must be the identity — so no other
  * aggregate/zip_with composition is touched. The rule is idempotent
  * (the rewritten tree contains no ArrayAggregate to re-match). */
object NativeDotFusion extends Rule[LogicalPlan] {

  private def isDoubleArray(t: org.apache.spark.sql.types.DataType): Boolean =
    t match {
      case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
      case _ => false
    }

  private def isVarPair(e1: Expression, e2: Expression,
      a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean =
    (e1.semanticEquals(a) && e2.semanticEquals(b)) ||
      (e1.semanticEquals(b) && e2.semanticEquals(a))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(Multiply(m1, m2, _),
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(a1, a2, _),
            Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
          // ADVICE-r11: (a) bit-exact +0.0 — Scala `== 0.0` also matches -0.0,
          // but a -0.0 seed folds to -0.0 on empty / all-negative-zero inputs
          // while DotProduct yields +0.0; require the raw bits of +0.0D.
          // (b) the rewrite duplicates l and r into Size(l)/Size(r) and
          // DotProduct(l,r): a non-deterministic child (shuffle()/rand()-
          // derived array) would be evaluated twice with different values, so
          // the size guard could test a different array than the dot computes
          // — only rewrite deterministic children (standard Catalyst
          // convention for rules that duplicate subtrees).
          if zero != null &&
            java.lang.Double.doubleToRawLongBits(
              zero.asInstanceOf[Double]) == 0L &&
            l.deterministic && r.deterministic &&
            isVarPair(m1, m2, x, y) &&
            isVarPair(a1, a2, acc, el) && fin.semanticEquals(fv) &&
            isDoubleArray(l.dataType) && isDoubleArray(r.dataType) =>
        If(EqualTo(Size(l, legacySizeOfNull = false),
            Size(r, legacySizeOfNull = false)),
          DotProduct(l, r), Literal(null, DoubleType))
    }
}
