package graft
import org.apache.spark.sql.SparkSession
/** Dev utility: dump formatted physical plans for representative
  * queries (plan-quality review: pushdown, broadcast, codegen). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = Seq("q_catalog_worklist", "q_pricing_summary", "q_revenue_by_region",
      "q_topk_orders", "q_dedup_jaccard", "q_knn_exact", "q_events_sessions",
      "q_events_salted_agg", "q_media_features", "q_dedup_minhash", "q_dedup_simhash",
      "q_decontaminate", "q_hash_split", "q_chunk_docs", "q_profile_orders",
      "q_dedup_canonical", "q_embedding_outliers", "q_token_budget", "q_dup_spans",
      "q_dup_spans_apply", "q_corpus_mix", "q_dedup_incremental", "q_media_dedup",
      "q_dedup_embedding", "q_dedup_embedding_ann", "q_dedup_embedding_ann_rerank",
      "q_media_audio", "q_media_video", "q_knn_ivfpq_refined", "q_knn_ivf_sq8",
      "q_hard_negatives", "q_hard_negatives_ann", "q_embedding_drift",
      "q_training_triplets", "q_training_triplets_ann",
      "q_feature_drift", "q_padding_audit", "q_graph_lpa")
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, dir)
      println(s"===== $name =====")
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
