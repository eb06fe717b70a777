package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke contract: every SparkEntry query runs on sf0.001 and returns a
  * sane frame; every oracleSql key exists in queries; flagship entry
  * returns rows. (Value-level parity with DuckDB is the driver's gate; the
  * oracle SQL strings are validated there.) */
class EntrySpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  // expected minimum row counts on sf0.001 (500 docs, 6k lineitem, 1k events)
  private val minRows = Map(
    "q_dup_states" -> 500L, "q_token_count" -> 500L, "q_token_count_bpe" -> 500L,
    "q_doc_fingerprint" -> 500L, "q_quality" -> 500L, "q_langid" -> 500L,
    "q_lang_stats" -> 1L, "q1_agg" -> 1L, "q_orders_priority" -> 1L,
    "q_events_by_type" -> 1L, "q_events_top_per_user" -> 1L,
    "q_natural_sort_topk" -> 50L, "q_minhash_sigs" -> 500L,
    "q_lsh_buckets" -> 500L, "q_dedup_decisions" -> 500L, "q_dedup_stats" -> 1L,
    "q_ann_topk" -> 50L, "q_ann_ivf" -> 1L, "q_ann_lsh_buckets" -> 500L,
    "q_media_features" -> 500L, "q_state_stats" -> 1L,
    "q_scope_same_source_singletons" -> 1L, "q_scope_different_source_unique" -> 1L,
    "q_length_filter" -> 1L, "q_tri_state" -> 1L, "q_visibility" -> 400L,
    "q_human_bytes" -> 500L,
    "q_curation_chain" -> 100L, "q_curation_funnel" -> 1L, "q_lsh_plan" -> 8L)

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs on sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= minRows.getOrElse(name, 0L), s"$name rows=$n")
    }
  }

  test("flagship entry returns decisions rows") {
    assert(SparkEntry.entry(spark).count() == 500)
  }
}
