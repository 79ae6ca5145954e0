package graft

import org.apache.spark.sql.DataFrame

/** The pair-join `hint("merge")` sites, behind one measurement-only
  * kill switch. The hints exist because Catalyst's size stats for
  * Generate (explode) pass through the un-exploded child, so
  * corpus-scale band/posting self-joins silently plan as
  * BroadcastHashJoin and die >8 GiB (SURVEY §6.1, gen-sf30;
  * ScaleGuardSpec pins the invariant). `SPARK_GRAFT_NO_MERGE_HINT=1`
  * neutralizes every pair-join hint for the calm-window A/B the r11/r12
  * verdicts asked for (is the hint costing anything at gate scale where
  * the broadcast would fit?) — it is NOT a deployment knob: with the
  * hints off, the gen-sf30+ pair joins re-enter the
  * broadcast-underestimate failure mode. Verdict of that A/B
  * (SURVEY §6.1 "Merge-hint calm-window A/B",
  * sweeps/sweep_merge_hint_ab.jsonl): +0.7 s mean across the ENTIRE
  * 157-query sf0.1 suite, within the arms' calibration overlap — the
  * hints stay unconditional.
  */
object Hints {
  private val disabled = sys.env.contains("SPARK_GRAFT_NO_MERGE_HINT")

  def merge(df: DataFrame): DataFrame =
    if (disabled) df else df.hint("merge")

  /** `df.mergeHint` — postfix form for join chains. */
  implicit class MergeHintOps(private val df: DataFrame) extends AnyVal {
    def mergeHint: DataFrame = merge(df)
  }
}
