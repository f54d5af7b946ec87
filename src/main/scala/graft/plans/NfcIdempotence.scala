package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.NfcNormalize

/** Optimizer rule: collapse `graft_nfc(graft_nfc(x))` to
  * `graft_nfc(x)`. Unicode NFC is idempotent, and the nesting arises
  * naturally when a caller normalizes defensively over a view that
  * already normalized — e.g. [[graft.ops.TextAnalysis.normalizeText]]
  * applied to a clean-ingest corpus. Each collapse removes a full
  * per-row normalization pass from the physical plan.
  *
  * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule`;
  * for an existing session use
  * `spark.experimental.extraOptimizations :+= NfcIdempotence`.
  */
object NfcIdempotence extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case NfcNormalize(inner: NfcNormalize) => inner
    }
}
