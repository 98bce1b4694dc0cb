package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the benchmark's headline query set. `SparkEntry.headline` is an
  * EXCLUSION list, so an unclassified new QueryDef would silently join the
  * bench and break cross-round total comparability — this spec fails loudly
  * until the new query is classified (added to the exclusion set in
  * SparkEntry, or deliberately added to the pinned set here).
  */
class HeadlineSpec extends AnyFunSuite {

  /** The exact headline set benched since round 1 (BENCH_r01..r03 totals are
    * comparable because these 38 and only these 38 run). */
  private val pinned = Set(
    "q_agg_minmax", "q_agg_product", "q_agg_sum", "q_and_intersect",
    "q_centroid_topk", "q_context_join", "q_cosine_topk", "q_dedup_exact",
    "q_dedup_minhash", "q_dedup_simhash", "q_delete_anti", "q_dot_topk",
    "q_engine_search", "q_engine_search_binarized", "q_events_window",
    "q_except", "q_fingerprint", "q_ivf_assign", "q_ivf_search",
    "q_json_extract", "q_lang_id", "q_maxsim", "q_merge_union", "q_meta_join",
    "q_multimodal_features", "q_multimodal_meta", "q_neardup_cosine",
    "q_neardup_jaccard", "q_neardup_lsh", "q_or_union", "q_quality_score",
    "q_sessionize", "q_term_eq", "q_term_range", "q_token_bpe",
    "q_token_count", "q_topk", "q_window_rank")

  test("the headline bench set is exactly the 38 pinned queries") {
    val actual = SparkEntry.allDefs.map(_.name).filter(SparkEntry.headline).toSet
    val joined = actual -- pinned
    val dropped = pinned -- actual
    assert(joined.isEmpty,
      s"NEW queries would silently join the headline bench (breaking " +
        s"cross-round total comparability): ${joined.mkString(", ")}. " +
        "Classify each one: add it to SparkEntry.headline's exclusion set " +
        "(verify-only query), or deliberately re-pin the set in HeadlineSpec.")
    assert(dropped.isEmpty,
      s"queries missing from the headline bench: ${dropped.mkString(", ")} — " +
        "was a QueryDef renamed or removed, or wrongly excluded?")
  }

  test("every QueryDef name is unique") {
    val names = SparkEntry.allDefs.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate QueryDef names: ${dups.mkString(", ")}")
  }
}
