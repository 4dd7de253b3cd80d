package graft.plans

import graft.functions.AsciiWordTokens
import org.apache.spark.sql.catalyst.expressions.{Literal, Lower, RegExpExtractAll}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}

/** Optimizer rule: rewrite the canonical regex tokenizer pattern
  * `regexp_extract_all(lower(x), '[a-z0-9]+', 0)` to the native
  * [[AsciiWordTokens]] byte scanner — same output (see the documented
  * fold-into-ASCII caveat on AsciiWordTokens, the ~3 code points web
  * text never exercises), ~10× less per-row cost than the regex NFA,
  * and the stage stays in whole-stage codegen.
  *
  * This is the `injectOptimizerRule` leg of the extension surface (the
  * expressions themselves ship via `injectFunction`): SQL written
  * against plain Spark built-ins — including the oracle-mirroring form
  * every graft text query uses — gets the native kernel when the
  * session enables `graft.GraftExtensions`. The match is exact (that
  * literal pattern, group 0, lowered child) so no other regex is
  * touched.
  *
  * Because the substitution is not bit-exact for the fold-into-ASCII
  * code points (U+212A KELVIN SIGN, U+0130 LATIN CAPITAL I WITH DOT:
  * `lower()` + regex keeps their folded forms as token characters, the
  * byte scanner treats the original multi-byte character as a
  * delimiter), the rule is gated behind
  * `spark.graft.tokenizeRewrite.enabled` (default true) — a session
  * whose corpus exercises those code points opts out per query or per
  * session and keeps exact built-in semantics.
  */
object TokenizeRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.tokenizeRewrite.enabled"

  private val TokenPattern = "[a-z0-9]+"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "true").toBoolean) plan
    else plan.transformAllExpressions {
      case RegExpExtractAll(Lower(child), Literal(p, StringType), Literal(0, IntegerType))
          if p != null && p.toString == TokenPattern =>
        AsciiWordTokens(child)
    }
}
