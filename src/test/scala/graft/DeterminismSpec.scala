package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Partition-count independence — the SCALE.md "numeric determinism"
  * claim made executable: hash-compared queries must produce IDENTICAL
  * bytes whether the plan runs over 2 partitions or 9 (stand-ins for 32
  * locally vs 20k on a cluster). Covers one representative of each
  * determinism mechanism: decimal-exact money (q01), scaled-int cosine
  * (q27), quantized TF-IDF (q55), md5-derived sketch (q86), epoch-µs
  * windows (q88), and the closed-form ANN indexes (q43 pivot-IVF, q67
  * IVF-PQ) whose integer-dot ranking must not reorder across shuffles.
  */
class DeterminismSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rows(q: String, parts: Int): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      val df: DataFrame = SparkEntry.queries(q)(spark, sf)
      // canonical form: sorted column names, row values stringified, sorted
      val cols = df.columns.sorted.toIndexedSeq
      df.selectExpr(cols.map(c => s"`$c`"): _*)
        .collect().map(_.mkString("")).sorted.toSeq
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  for (q <- Seq("q01_pricing_summary", "q27_cosine_topk", "q43_cosine_ivf",
      "q67_ivfpq", "q103_int8_ann", "q105_hamming_ann", "q106_dsir_weights",
      "q107_perplexity_tiers", "q108_pmi_phrases", "q109_mixture_schedule",
      "q110_bigram_logprob", "q111_containment", "q113_source_caps",
      "q114_sparse_knn", "q115_epoch_shuffle", "q116_knn_label",
      "q118_incremental_dedup", "q119_cosine_pairs_lsh", "q55_tfidf", "q86_hll_sketch",
      "q88_funnel", "q97_rfm", "q120_self_repeats", "q121_bpe_merges",
      "q122_bpe_vocab", "q123_bpe_fertility", "q124_source_drift",
      "q125_jl_project", "q126_source_dup_matrix", "q128_tx_compact",
      "q129_chunk_dedup", "q130_hard_negatives", "q131_shadow_score",
      "q132_cluster_canonical", "q133_tx_evolve", "q134_stream_chunk_dedup",
      "q135_containment_pairs", "q136_fuzzy_join", "q137_novelty_curve",
      "q138_scd2_intervals", "q139_stream_scd2", "q140_kmeans_int",
      "q141_semdedup", "q142_ann_recall", "q143_classifier_score",
      "q144_media_pair_dup", "q145_mmr_select", "q146_stream_topk",
      "q147_cdc_dedup", "q148_leakage_audit", "q149_golden_record",
      "q150_contrastive_pairs", "q151_multiprobe_lsh", "q152_tx_expire",
      "q153_skyline", "q154_hist_quantiles", "q155_corr_pieces",
      "q156_silhouette", "q157_stream_mv", "q158_group_kfold",
      "q159_decay_value", "q160_quality_percentile", "q161_rolling_window",
      "q162_value_drift", "q163_embed_drift", "q164_ann_mrr",
      "q165_media_phash", "q166_auc_eval", "q167_minhash_eval",
      "q168_ab_lift", "q169_mad_outliers", "q170_dirichlet_ql",
      "q171_path_trigrams", "q172_stream_rate", "q173_trend_fit",
      "q174_kappa", "q175_blocking_eval", "q176_target_encoding",
      "q177_zipf_fit", "q178_char_entropy", "q179_ks_stat",
      "q180_media_energy", "q181_mutual_info", "q182_langid_eval",
      "q183_calibration", "q184_psi_drift", "q185_attribution",
      "q186_embed_health", "q187_ndcg", "q188_auc_by_group",
      "q189_best_threshold", "q190_stream_late", "q191_linear_attribution",
      "q192_session_stats", "q193_conversion_hazard", "q194_dup_histogram",
      "q195_source_f1", "q196_gains_table", "q197_weighted_sample",
      "q198_ref_integrity", "q199_degree_histogram", "q200_scorecard",
      "q201_repurchase_cadence", "q202_revenue_gini", "q203_corpus_gini")) {
    test(s"$q: identical bytes at 2 and 9 shuffle partitions") {
      assert(rows(q, 2) == rows(q, 9), s"$q result depends on partitioning")
    }
  }
}
