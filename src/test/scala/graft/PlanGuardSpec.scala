package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** Scale guard over EVERY registered query's physical plan: no accidental
  * CartesianProduct / BroadcastNestedLoopJoin — at 100 TB those are the
  * queries that never finish. Intentional exceptions are named and justified
  * below. */
class PlanGuardSpec extends AnyFunSuite {
  import SharedSpark._

  /** Queries allowed to contain a nested-loop join, with the reason. */
  private val bnljAllowed: Map[String, String] = Map(
    "q_disjunctive_join" -> "OR-join over a BROADCAST dim (nation, 25 rows) — the disjunction itself is the operator under test",
    "q_embed_knn" -> "brute-force KNN broadcasts the tiny query set; corpus side never shuffles",
    "q_embed_knn_int8" -> "int8 KNN: same broadcast-query-side shape as q_embed_knn, integer scoring kernel",
    "q_like_computed" -> "r17: the literal-prefix family count is an equi-join; only the residual branch (prefix short or carrying a LIKE metacharacter — empty on this corpus, bounded by data shape) keeps the general computed-LIKE nested loop",
    "q_embed_ann_ivf" -> "IVF cell scoring broadcast-crosses the <=16 coarse centroids against each vector — constant-size broadcast side by construction; the hit-rate face additionally runs the broadcast-query-side exact baseline (q_embed_knn shape)",
    "q_embed_ann_lsh" -> "the hit-rate face scores LSH output against the broadcast-query-side exact KNN baseline (q_embed_knn shape) — evaluation kernel, not the ANN search path",
    "q_embed_ann_pq" -> "the hit-rate face scores PQ/ADC output against the broadcast-query-side exact L2 baseline (q_embed_knn shape) — evaluation kernel, not the ANN search path",
    "q_tfidf_keywords" -> "corpus-size N is a ONE-ROW aggregate broadcast-crossed into the scored table — the in-plan alternative to an eager driver count",
    "q_vocab_topk" -> "corpus token total is a ONE-ROW aggregate broadcast-crossed into the (post-aggregation) term table",
    "q_boilerplate_ngrams" -> "corpus doc count is a ONE-ROW aggregate broadcast-crossed into the shingle-frequency table",
    "q_corpus_mixture" -> "corpus token total is a ONE-ROW aggregate broadcast-crossed into the per-(source,lang) mixture table",
    "q_unigram_logprob" -> "corpus token total is a ONE-ROW aggregate broadcast-crossed into the token-score table",
    "q_inverted_index" -> "corpus doc count is a ONE-ROW aggregate broadcast-crossed into the term-frequency table to express the stopword df bound",
    "q_search_bm25" -> "corpus (N, avgdl) stats are a ONE-ROW aggregate broadcast-crossed into the per-(doc,term) tf table",
    "q_pmi_bigrams" -> "unigram/bigram totals are ONE-ROW aggregates broadcast-crossed into the (pre-filtered) bigram table",
    "q_rfm_segments" -> "the nine quartile thresholds are a ONE-ROW aggregate broadcast-crossed into the per-customer table",
    "q_mixture_sample_rates" -> "token total and weight normalizer are ONE-ROW aggregates broadcast-crossed into the tiny per-source table",
    "q_heavy_hitters" -> "corpus token total is a ONE-ROW aggregate broadcast-crossed into the <=32-row candidate-count table",
    "q_split_drift" -> "bucket-count/total normalizers are a ONE-ROW aggregate broadcast-crossed into the <=64-row bucket table",
    "q_bigram_logprob" -> "vocabulary size is a ONE-ROW aggregate broadcast-crossed into the bigram-score table",
    "q_events_gapfill" -> "calendar spine (exploded from a ONE-ROW min/max aggregate) crossed with the |types|-row dimension — the fill target is their bounded product by definition",
    "q_events_pagerank" -> "node count is a ONE-ROW aggregate broadcast-crossed into the |types|-bounded rank table each superstep",
    "q_value_histogram" -> "global (min,max) bounds are a ONE-ROW aggregate broadcast-crossed into the scan before binning",
    "q_funnel_window_72h" -> "two ONE-ROW funnel-stage counts crossed into the single summary row",
    "q_events_churn" -> "max observed week is a ONE-ROW aggregate broadcast-crossed into the <=weeks-sized activity table",
    "q_pareto_concentration" -> "P90 threshold and totals are a ONE-ROW aggregate broadcast-crossed into the per-user count table",
    "q_graph_triangles" -> "three ONE-ROW census aggregates (wedges, edges, triangles) crossed into the single summary row",
    "q_weighted_median_len" -> "token total is a ONE-ROW aggregate broadcast-crossed into the length-domain-bounded cumulative table",
    "q_chisq_source_lang" -> "grand total is a ONE-ROW aggregate broadcast-crossed into the |sources|x|langs|-bounded contingency table",
    "q_relational_division" -> "the priority-universe size is a ONE-ROW aggregate broadcast-crossed into the per-customer coverage table",
    "q_dsir_weights" -> "(target,raw) token totals and vocab size are a ONE-ROW aggregate broadcast-crossed into the vocabulary-bounded score table",
    "q_hard_negatives" -> "broadcast-query-side KNN (q_embed_knn shape); the label inequality rides the broadcast join condition",
    "q_ks_test" -> "group totals are a ONE-ROW aggregate broadcast-crossed into the ~bounded value-grid table",
    "q_survival_km" -> "observation end and cohort size are ONE-ROW aggregates broadcast-crossed into the duration-domain-bounded table",
    "q_benford_digits" -> "order count is a ONE-ROW aggregate broadcast-crossed into the 9-row digit table",
    "q_ndcg_eval" -> "judges the broadcast-query-side KNN kernel (q_embed_knn shape)",
    "q_entity_dup_names" -> "two ONE-ROW census aggregates (pair count, entity count) crossed into the single summary row",
    "q_gdpr_erasure" -> "ONE-ROW post-erase residual count crossed into the one-row audit evidence",
    "q_events_heatmap" -> "grand total is a ONE-ROW aggregate broadcast-crossed into the 168-cell grid",
    "q_embed_ann_ivfpq" -> "same intended centroid cross as q_embed_ann_ivf: <=16 coarse centroids broadcast against each query vector",
    "q_vocab_growth" -> "globalRunningSumAuto derives its bucket width from a ONE-ROW max aggregate broadcast-crossed into the data branch (the WindowGuard fix for the corpus/50-row cumulative curve)",
    "q_dedup_ngram_jaccard" -> "ONE-ROW corpus doc count broadcast-crossed as the sample-scale guard on the naive all-pairs face (fails fast above maxDocs; production routes are q_setsim_prefix / MinHash-LSH)",
    "q_semdedup" -> "ONE-ROW max-cluster-size broadcast-crossed as the sample-scale guard on the exact SemDeDup face (fails fast above maxExactClusterSize; production route is q_semdedup_bounded)",
    "q_dedup_embedding" -> "ONE-ROW vector count broadcast-crossed as the sample-scale guard, plus (r17) the all-pairs id_a<id_b scoring join itself — its broadcast side is bounded by that guard BY CONSTRUCTION (fails fast above 4096 vectors; production routes are embeddingNearDupsLsh / the ANN + SemDeDup-bounded pipeline)",
    "q_label_spread" -> "same ONE-ROW sample-scale guard + guarded all-pairs scoring join as q_dedup_embedding (the spread graph comes from the exact all-pairs kernel)",
    "q_ann_ivf_persist" -> "the IVF probe step crosses <=16 broadcast coarse centroids against each query vector (q_embed_ann_ivf shape), on both the in-memory and the stored-index side of the comparison",
    "q_ann_ivfpq_persist" -> "same <=16-centroid broadcast cross as q_embed_ann_ivfpq, on both sides of the persisted-vs-in-memory comparison",
    "q_ann_ivfpq_append" -> "same <=16-centroid broadcast cross (probe + frozen-artifact delta assignment) plus the ONE-ROW code/search summary rows crossed into the single audit row")

  test("no registered query plans a cartesian product") {
    for (q <- Registry.all) {
      val plan = q.build(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"${q.name} plans a CartesianProduct")
    }
  }

  test("nested-loop joins appear only where a broadcast side is intended") {
    for (q <- Registry.all) {
      val plan = q.build(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("BroadcastNestedLoop"))
        assert(bnljAllowed.contains(q.name),
          s"${q.name} plans an unexpected BroadcastNestedLoopJoin")
    }
  }
}
