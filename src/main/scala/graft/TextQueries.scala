package graft

/** Text/LLM-data operators (dedup, tokens, quality, similarity) —
  * build-plan step 7 (SURVEY.md §7).
  */
object TextQueries {
  def specs: Seq[QuerySpec] = Seq()
}
