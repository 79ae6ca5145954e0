package graft

/** Scalar function bundles (string/date/math/array/json) — filled in
  * build-plan step 5 (SURVEY.md §7).
  */
object FunctionQueries {
  def specs: Seq[QuerySpec] = Seq()
}
