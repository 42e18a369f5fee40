package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Estimation, Multimodal, Relational, Similarity, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §2 + §7. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The engine's identity is the fit-small/predict-big kNN
    * imputation (the reference's canonical workload), so that's the
    * flagship.
    */
  def entry(spark: SparkSession): DataFrame =
    Estimation.qKnnReg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing"       -> (Relational.q1Pricing _),
    "q3_shipping"      -> (Relational.q3Shipping _),
    "q5_region"        -> (Relational.q5Region _),
    "q_window_running" -> (Relational.qWindowRunning _),
    "q_topn_group"     -> (Relational.qTopNGroup _),
    "q_rollup"         -> (Relational.qRollup _),
    "q_distinct"       -> (Relational.qDistinct _),
    "q_pivot"          -> (Relational.qPivot _),
    "q_asof"           -> (Relational.qAsOf _),
    "q_asof_exec"      -> (Relational.qAsOfExec _),
    "q_sessionize"     -> (Relational.qSessionize _),
    "q_tumbling"       -> (Relational.qTumbling _),
    "q_range_join"     -> (Relational.qRangeJoin _),
    "q_semi_anti"      -> (Relational.qSemiAnti _),
    "q_setops"         -> (Relational.qSetOps _),
    "q_cube"           -> (Relational.qCube _),
    "q_percentile"     -> (Relational.qPercentile _),
    "q_corr"           -> (Relational.qCorr _),
    "q7_nation_volume" -> (Relational.q7NationVolume _),
    "q_lead_lag"       -> (Relational.qLeadLag _),
    "q_asof_tolerance" -> (Relational.qAsOfTolerance _),
    "q_skew_agg"       -> (Relational.qSkewAgg _),
    "q_string_agg"     -> (Relational.qStringAgg _),
    "q_full_outer"     -> (Relational.qFullOuter _),
    "q_unpivot"        -> (Relational.qUnpivot _),
    "q_sample"         -> (Relational.qSample _),
    "q_histogram"      -> (Relational.qHistogram _),
    "q13_custdist"     -> (Relational.q13CustDist _),
    "q18_toporders"    -> (Relational.q18TopOrders _),
    "q_skew_distinct"  -> (Relational.qSkewDistinct _),
    "q_range_window"   -> (Relational.qRangeWindow _),
    "q_ohlc"           -> (Relational.qOhlc _),
    "q4_orderprio"     -> (Relational.q4OrderPrio _),
    "q12_priority"     -> (Relational.q12Priority _),
    "q15_topsupp"      -> (Relational.q15TopSupp _),
    "q17_smallqty"     -> (Relational.q17SmallQty _),
    "q21_waiting"      -> (Relational.q21Waiting _),
    "q22_balance"      -> (Relational.q22Balance _),
    "q8_share"         -> (Relational.q8Share _),
    "q_knn_reg"        -> (Estimation.qKnnReg _),
    "q_knn_weighted"   -> (Estimation.qKnnWeighted _),
    "q_radius_reg"     -> (Estimation.qRadiusReg _),
    "q_rank_norm"      -> (Estimation.qRankNorm _),
    "q_knn_reg_multi"  -> (Estimation.qKnnRegMulti _),
    "q_knn_cls"        -> (Estimation.qKnnCls _),
    "q_knn_cls_weighted" -> (Estimation.qKnnClsWeighted _),
    "q_knn_proba"      -> (Estimation.qKnnProba _),
    "q_kneighbors"     -> (Estimation.qKneighbors _),
    "q_std_scaler"     -> (Estimation.qStdScaler _),
    "q_maxabs"         -> (Estimation.qMaxAbs _),
    "q_winsorize"      -> (Estimation.qWinsorize _),
    "q_ridge"          -> (Estimation.qRidge _),
    "q_target_enc"     -> (Estimation.qTargetEnc _),
    "q_minmax_scaler"  -> (Estimation.qMinMaxScaler _),
    "q_robust_scaler"  -> (Estimation.qRobustScaler _),
    "q_l2norm"         -> (Estimation.qL2Norm _),
    "q_kbins"          -> (Estimation.qKbins _),
    "q_inverse_std"    -> (Estimation.qInverseStd _),
    "q_linreg"         -> (Estimation.qLinReg _),
    "q_linreg_multi"   -> (Estimation.qLinRegMulti _),
    "q_knn_nodata"     -> (Estimation.qKnnNoData _),
    "q_knn_missing"    -> (Estimation.qKnnMissing _),
    "q6_forecast"      -> (Relational.q6Forecast _),
    "q10_returns"      -> (Relational.q10Returns _),
    "q14_promo"        -> (Relational.q14Promo _),
    "q16_suppcnt"      -> (Relational.q16SuppCnt _),
    "q19_disjunct"     -> (Relational.q19Disjunct _),
    "q_ntile"          -> (Relational.qNtile _),
    "q_grouping_sets"  -> (Relational.qGroupingSets _),
    "q_ffill"          -> (Relational.qFfill _),
    "q_moving_avg"     -> (Relational.qMovingAvg _),
    "q_pca_inverse"    -> (Estimation.qPcaInverse _),
    "q_exact_dedup"    -> (TextOps.qExactDedup _),
    "q_token_count"    -> (TextOps.qTokenCount _),
    "q_quality"        -> (TextOps.qQuality _),
    "q_langid"         -> (TextOps.qLangId _),
    "q_minhash"        -> (TextOps.qMinHash _),
    "q_lsh_pairs"      -> (TextOps.qLshPairs _),
    "q_dedup_clusters" -> (TextOps.qDedupClusters _),
    "q_ngram_jaccard"  -> (TextOps.qNgramJaccard _),
    "q_curate"         -> (TextOps.qCurate _),
    "q_repetition"     -> (TextOps.qRepetition _),
    "q_charclass"      -> (TextOps.qCharClass _),
    "q_tfidf"          -> (TextOps.qTfidf _),
    "q_hash_embed"     -> (TextOps.qHashEmbed _),
    "q_gopher"         -> (TextOps.qGopher _),
    "q_decontam"       -> (TextOps.qDecontam _),
    "q_bloom"          -> (TextOps.qBloom _),
    "q_urlnorm"        -> (TextOps.qUrlNorm _),
    "q_semdedup"       -> (Similarity.qSemDedup _),
    "q_cosine_topk"    -> (Similarity.qCosineTopK _),
    "q_embed_neardup"  -> (Similarity.qEmbedNearDup _),
    "q_centroid_cls"   -> (Similarity.qCentroidCls _),
    "q_simhash"        -> (TextOps.qSimHash _),
    "q_simhash_pairs"  -> (TextOps.qSimHashPairs _),
    "q_fingerprint"    -> (TextOps.qFingerprint _),
    "q_ann_lsh"        -> (Similarity.qAnnLsh _),
    "q_ann_multiprobe" -> (Similarity.qAnnMultiprobe _),
    "q_ann_ivf"        -> (Similarity.qAnnIvf _),
    "q_ann_pq"         -> (Similarity.qAnnPq _),
    "q_kmeans"         -> (Similarity.qKmeans _),
    "q_binary_meta"    -> (Multimodal.qBinaryMeta _),
    "q_media_meta"     -> (Multimodal.qMediaMeta _),
    "q_media_frames"   -> (Multimodal.qMediaFrames _),
    "q_media_bytes"    -> (Multimodal.qMediaBytes _),
    "q_rf_reg"         -> (Estimation.qRfReg _),
    "q_gbt_reg"        -> (Estimation.qGbtReg _),
    "q_cart_reg"       -> (Estimation.qCartReg _),
    "q_pca"            -> (Estimation.qPca _),
    "q_pca_fit"        -> (Estimation.qPcaFit _),
    "q_pipeline"       -> (Estimation.qPipeline _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Estimation.oracles ++ TextOps.oracles ++
      Similarity.oracles ++ Multimodal.oracles
}
