package graft

/** Feature-store query surface (latest view, point-in-time, sessionize) —
  * build-plan step 6 (SURVEY.md §7).
  */
object FeatureQueries {
  def specs: Seq[QuerySpec] = Seq()
}
