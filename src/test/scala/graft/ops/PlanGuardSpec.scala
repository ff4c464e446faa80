package graft.ops

import graft.SparkTestBase

/** The "only the yardsticks are quadratic" contract, as a test instead of a
  * doc claim: every registered query's physical plan is checked for
  * CartesianProduct / BroadcastNestedLoopJoin.
  *
  * Two allowlists, by reason:
  *  - quadraticYardsticks — plans that ARE pairwise by contract: q55 (the
  *    all-pairs recall-1.0 baseline q74's banded twin is measured against)
  *    and q30 (few broadcast queries × corpus — the right plan for
  *    few-query exact kNN). q27, the other documented yardstick, is
  *    quadratic in WORK but not in plan shape (its pair scan rides a lang
  *    equi-join), so it is intentionally NOT exempted here.
  *  - scalarBroadcasts — a 1-row aggregate broadcast against a linear side
  *    (the scalar-subquery idiom: q34's liveness cutoff, q56's corpus-size
  *    N). BroadcastNestedLoopJoin with a single-row build side is linear.
  *
  * Anything else acquiring one of these join shapes is a scale regression
  * this suite catches at plan time, before any bench run.
  */
class PlanGuardSpec extends SparkTestBase {

  /** Declared build-side row bound per allowlist entry — the size claim
    * each exemption comment makes, asserted from the executed plan's
    * metrics instead of trusted. A 1-row scalar broadcast must broadcast
    * exactly ≤ its declared rows; an entry whose build side outgrows its
    * bound fails here before any bench run notices. Bounds are at the
    * test SF (sf0.001) but the *shape* claim (1-row aggregate, constant
    * pool, |types|-sized frame) is scale-free except where noted. */
  private val buildSideBounds: Map[String, Long] = Map(
    "q34_dead_heartbeats"      -> 1,
    "q56_tfidf"                -> 1,
    "q91_bm25"                 -> 1,
    "q92_vocab_coverage"       -> 1,   // 1-row token-mass total onto the 3 probe rows
    "q93_power_iteration_pca"  -> 1,
    "q94_bigram_perplexity"    -> 1,
    "q99_embedding_outliers"   -> 1,
    "q104_rrf_fusion"          -> 1,   // q91's 1-row stats, re-exposed r15-opt
    "q114_chi2_keyness"        -> 1,
    "q122_association_rules"   -> 1,
    "q127_hll_users"           -> 1,
    "q128_cms_frequency"       -> 1,
    "q133_source_divergence"   -> 1,
    "q149_decayed_popularity"  -> 1,
    "q152_equidepth_histogram" -> 1,
    "q153_hll_overlap"         -> 32,  // |event types| sketch rows
    "q159_rfm_segments"        -> 1,
    "q161_kaplan_meier"        -> 1,
    "q164_welch_ttest"         -> 1,
    "q172_negative_sampling"   -> 50,  // top-50 candidate pool, by contract
    "q181_token_pmi"           -> 1,
    "q184_cumulative_gains"    -> 1,
    "q202_lorenz_deciles"      -> 1,
    "q203_word_burstiness"     -> 1,
    "q213_ttl_projection"      -> 1,
    "q215_two_proportion_z"    -> 1,
    "q217_fk_integrity"        -> 1,
    "q219_freshness_audit"     -> 1,
    "q220_simpson_detector"    -> 1,
    "q229_ipf_raking"          -> 1,
    "q232_dsir_weights"        -> 1,
    "q233_band_tuning"         -> 1,
    "q235_ks_drift"            -> 32,  // |sources| indicator fan-out rows
    "q237_water_filling"       -> 1,
    "q238_group_dro_weights"   -> 1,
    "q243_conformal_interval"  -> 1,
    "q245_kneser_ney"          -> 1,
    "q246_hits"                -> 1,
    "q248_sinkhorn"            -> 32,  // |sources| grid side, model-sized
    "q249_sensitivity_coreset" -> 8,   // fixed seed pool
    "q269_curriculum_shards"   -> 1,
    "q278_ann_recall_sweep"    -> 8,   // fixed query pool (exact side)
    "q289_weight_diagnostics"  -> 1,
    "q293_littles_law"         -> 1,
    "q294_ewma_control"        -> 1,
    "q296_fellegi_sunter"      -> 1,
    "q297_nelson_aalen"        -> 1,
    "q298_good_turing"         -> 1,
    "q303_bloom_fpr_sweep"     -> 2,   // 2-row geometry sweep + 1-row counts
    "q306_cbo_cardinality"     -> 1,   // 1-row stats aggregates per edge
    "q307_histogram_selectivity" -> 16, // 16-bucket histogram × 5-threshold sweep
    "q311_paired_permutation"  -> 1,   // 1-row observed-statistic broadcast
    "q315_markov_removal"      -> 5,   // 5-row variant fan-out + 1-row base conv
    "q316_shapley_attribution" -> 16,  // 16-mask lattice × 4-channel fan-out
    "q319_wand_pruning"        -> 1,   // 1-row (stats, theta) broadcasts
    "q322_erlang_staffing"     -> 1,   // 1-row peak-rate broadcast
    "q324_safety_stock"        -> 3,   // 3-row service-level fan-out
    "q329_t_closeness"         -> 5,   // 5-row sensitive-marginal grid completion
    "q332_incremental_dedup"   -> 1,   // five 1-row count aggregates cross-joined
    "q338_capped_triangles"    -> 1,   // three 1-row edge-count/bound aggregates cross-joined
    "q342_kcenter_seeding"     -> 6,   // <=6-row seed frame broadcast per pass (Gonzalez contract)
    "q343_poisson_bootstrap"   -> 1,   // two 1-row report aggregates cross-joined
    "q345_kanon_lattice"       -> 27,  // 27-row lattice-level frame over the model-sized finest grid
    "q346_loso_ablation"       -> 1,   // 1-row totals broadcast (complement arithmetic)
    "q347_posting_compression" -> 1,   // 1-row corpus-doc-count broadcast
    "q348_threshold_audit"     -> 5,   // 5-row depth sweep over the depth-bounded candidate set
    "q350_hill_tail"           -> 3,   // 3-row k sweep over the 201-row ordered prefix
    "q352_sprt"                -> 1,   // 1-row (p0, p1) baseline broadcast over the daily frame
    "q353_blocking_quality"    -> 1,   // 1-row n_docs/n_truth/cand/covered aggregates cross-joined
    "q355_context_gain"        -> 1,   // 1-row corpus token total broadcast (the q56/q91 idiom)
    "q357_stopword_divergence" -> 10,  // 10-word grid completion + 1-row corpus-total broadcast
    "q360_brier_decomposition" -> 10,  // 10-row bin frame x 1-row decomposition report (build side is the bins)
    "q364_bcubed_dedup_eval"   -> 1,   // 1-row cluster-count x 1-row P/R-sum report join (the q215 idiom)
    "q366_data_knapsack"       -> 24,  // |sources| flagged frame is the build side vs the 1-row LP report
    "q367_pinball_eval"        -> 3,   // 3-row tau fan-out against the model-half ranks
    "q369_cka_redundancy"      -> 1,   // three 1-row Frobenius-mass reports cross-joined
    "q371_dp_exp_median"       -> 1,   // 1-row total + 1-row partition-function broadcasts
    "q374_isotonic_calibration" -> 10, // 10-bin frame self-paired into the bounded minimax grid
    "q375_james_stein"         -> 24,  // |sources| per-source frame is the build side vs the 1-row hyper report
    "q376_ucb_allocation"      -> 5,   // |arms| frame x 1-row (N, best) report (the q215 idiom)
    "q378_scaling_law"         -> 5,   // 5-row slice frame x 1-row fit/held-total/full-token reports
    "q381_llr_collocations"    -> 1,   // 1-row bigram-total broadcast (the q56 idiom)
    "q382_logrank_test"        -> 1,   // 1-row cohort-totals broadcast over the time spine
    "q383_ps_stratification"   -> 35,  // |strata| frame x 1-row ATE/ATT report (the q215 idiom)
    "q384_power_planner"       -> 10,  // 10-row lift grid x 1-row base-rate broadcast
    "q387_shard_quantile_merge" -> 128, // 4x32 boundary summary joined to the 5-probe frame
    "q334_textrank_keywords"   -> 1,   // 1-row |V| broadcast per iteration
    "q337_kendall_tau"         -> 30,  // |brands|² pairing — dimension-bounded by contract
    "q320_cascade_recall"      -> 3,   // 3-row budget sweep + q91's 1-row stats
    "q321_rocchio_prf"         -> 3,   // 3-term seed frame + q91's 1-row stats
    // quadratic yardsticks: the broadcast side is bounded by contract —
    // q30 by the fixed query set, q55 by "the whole corpus fits a
    // broadcast or the yardstick is not viable" (sf0.001 here).
    "q396_mondrian_conformal"  -> 1,   // 1-row pooled q-hat broadcast
    "q399_quantile_regression" -> 9,   // tau × multiplier certificate grid
    "q404_fold_leakage"        -> 1,   // 1-row fold-balance report
    "q406_quantile_effects"    -> 9,   // 9-row decile fan-out
    "q408_trend_breakpoint"    -> 100, // calendar-bounded candidate frame (~76 interior months, fixed by the 7-year calendar)
    "q414_species_richness"    -> 1,   // 1-row doc-count broadcast vs the 1-row census
    "q415_grid_dbscan"         -> 9,   // 9-row neighbourhood-offset fan-out (stat/noise are 1-row)
    "q417_theil_decomposition" -> 1,   // 1-row (mu, N) global broadcast
    "q418_huber_irls"          -> 1,   // 1-row fit/scale broadcasts over the calendar spine
    "q421_kruskal_wallis"      -> 1,   // 1-row (N, tie-mass) broadcast
    "q422_pettitt_changepoint" -> 1,   // 1-row argmax/means broadcasts
    "q423_gumbel_return_levels" -> 1,  // 1-row Gumbel-fit broadcast
    "q424_nb_overdispersion"   -> 1,   // 1-row moment broadcast
    "q426_periodogram"         -> 1,   // 1-row mean broadcast over the daily spine
    "q427_nn_matching"         -> 1,   // 1-row quantile broadcast onto the 1-row ATT report
    "q428_range_planner"       -> 1,   // 1-row skew broadcast onto the 16-row partition frame
    "q430_wilcoxon_signed_rank" -> 1,  // 1-row tie/zero broadcasts onto the 1-row moment report
    "q431_beta_binomial_shrink" -> 1,  // 1-row MoM-prior broadcast onto the 25-brand frame
    "q432_betweenness"         -> 1,   // 1-row node-count broadcast onto the |V|-row centrality frame
    "q433_sax_motifs"          -> 1,   // 1-row bounds/top-motif broadcasts onto the 64-segment frame
    "q434_friedman_test"       -> 1,   // 1-row tie/k broadcasts onto the k-treatment frame
    "q435_mcnemar_test"        -> 1,   // 1-row binomial-tail sum onto the 1-row cell report
    "q436_cochran_q"           -> 1,   // 1-row row-total moments onto the 3-era column frame
    "q437_fisher_exact"        -> 1,   // 1-row observed-pmf + tails onto the 1-row cell report
    "q438_ljung_box"           -> 1,   // 1-row series moments onto the 10-lag ACF frame
    "q439_runs_test"           -> 1,   // 1-row median broadcast onto the daily spine
    "q440_durbin_watson"       -> 1,   // 1-row OLS-fit broadcast onto the daily spine
    "q443_breusch_pagan"       -> 1,   // 1-row beta broadcast onto the design + 1-row u-moments
    "q444_hurst_rs"            -> 1,   // 1-row slope broadcast onto the 6-window frame
    "q445_pacf"                -> 1,   // 1-row series moments onto the 5-lag ACF frame
    "q448_spectral_bipartition" -> 80, // thinned-edge frame (<=3|V| rows) range-joined to the |V|-row sweep
    "q450_mood_median"         -> 1,   // 1-row median + 1-row margins onto the k-group cells
    "q451_kpss"                -> 1,   // 1-row moments onto the walk/lag frames
    "q452_cox_ph"              -> 1,   // 1-row beta/horizon broadcasts onto the event spine
    "q453_cochran_armitage"    -> 1,   // 1-row margins onto the 5-score cells
    "q454_jonckheere"          -> 1,   // 1-row moment/tie reports cross-joined
    "q455_ransac"              -> 32,  // 32-line candidate frame scored against the daily census
    "q456_bayesian_ab"         -> 1,   // 1-row posterior-sum broadcast onto the 2-arm frame
    "q457_page_hinkley"        -> 1,   // 1-row moment/top/alarm broadcasts onto the walk
    "q459_ansari_bradley"      -> 1,   // 1-row (N, m) broadcast onto the rank frame
    "q461_ordinal_concordance" -> 15,  // the 15-cell grid self-paired (model-sized at any SF)
    "q463_mantel_haenszel"     -> 1,   // 1-row MH/CMH report onto the 5-stratum cells
    "q465_cramers_v"           -> 1,   // 1-row totals onto the 25-cell grid
    "q462_theils_u"            -> 1,   // 1-row entropy reports cross-joined
    "q473_scc"                 -> 1,   // 1-row condensation-edge report onto the |V|-row label frame
    "q474_kmv_setops"          -> 5,   // |types|-row sketch-array frame paired (model-sized at any SF)
    "q479_qerror_audit"        -> 1,   // 1-row count/ndv/actual aggregates cross-joined per edge
    "q481_encoding_advisor"    -> 1,   // 1-row boundary-stitch report onto the 1-row in-bucket report
    "q480_design_effect"       -> 1,   // 1-row global-moments broadcast onto the |segments| frame
    "q483_ams_f2"              -> 1,   // 1-row sketch estimate x 1-row exact-truth report
    "q484_haar_synopsis"       -> 1,   // 1-row total/kept-energy broadcasts onto the 9-coefficient synopsis
    "q485_dtw_warp"            -> 1,   // 1-row reference-series broadcast onto the |nations| frame
    "q486_reuse_distance"      -> 1,   // 1-row class-totals broadcast onto the <=G-row distance histogram
    "q488_priority_sample"     -> 1,   // 1-row tau threshold onto the 64-row sample frame
    "q491_reservoir_coverage"  -> 1,   // 1-row grand-chars total onto the |sources| frame
    "q493_join_size_sketch"    -> 1,   // 1-row sketch estimate x 1-row exact-truth report
    "q494_seqpat_mining"       -> 1,   // 1-row n_events / n_tri totals onto the <=|types|^3 frame
    "q495_perm_test"           -> 1,   // 1-row observed-stat / size broadcasts onto the replicate frames
    "q496_markov_stationary"   -> 1,   // 1-row transition grand total onto the |states| frame
    "q498_universe_sample"     -> 3,   // 3-row rate dimension + 1-row exact truth onto the degree frame
    "q499_sliding_distinct"    -> 40,  // calendar-bounded day spine (<=31 days) + 1-row bounds
    "q500_curation_funnel"     -> 5,   // 5-row stage spine onto the <=5-row depth histogram
    "q502_datalog_ready"       -> 1,   // 1-row ready-count report onto the 1-row totals
    "q503_bitemporal_asof"     -> 4,   // 4-row (valid, tx) cutoff grid
    "q505_cdc_upsert"          -> 1,   // 1-row ledger pivot + 1-row final-state report
    "q506_rejection_resample"  -> 1,   // 1-row c_min / bin-count / accepted-total broadcasts
    "q507_matrix_profile"      -> 2500, // calendar-bounded window frame (~2.4k at every SF)
    "q508_morans_i"            -> 100, // fixed 10×10 lattice adjacency self-join + 1-row totals
    "q509_getis_ord"           -> 100, // fixed 10×10 lattice neighborhood self-join + 1-row totals
    "q510_cointegration"       -> 1,   // 1-row OLS-fit broadcast onto the daily spine
    "q511_naive_bayes"         -> 200, // vocab-cap model spine (5 langs × 200 tokens) + 1-row prior total
    "q515_lead_lag_ccf"        -> 25,  // 25-row lag dimension fanned over the calendar-bounded spine
    "q517_hmm_regimes"         -> 1,   // 1-row tercile-cut broadcast onto the daily spine
    "q520_dawid_skene"         -> 25,  // anns × langs model spine (3×5×5 after both fan-outs)
    "q523_rich_club"           -> 4,   // 4-row k-sweep dimension onto the |V|²-bounded edge census
    "q525_ridge_path"          -> 3,   // 3-row λ sweep onto the 1-row scatter matrix
    "q526_chow_test"           -> 1,   // 1-row pooled × 1-row split SSE reports
    "q527_qlm_dirichlet"       -> 4,   // 4-term query model + 1-row collection total onto the doc spine
    "q530_feature_hashing"     -> 3,   // 3-row k sweep onto the vocabulary census
    "q531_woe_iv"              -> 1,   // 1-row bounds + 1-row class totals onto the bin census
    "q537_western_electric"    -> 1,   // 1-row μ/σ limits onto the daily spine
    "q538_adstock_fit"         -> 3,   // 3-row θ sweep onto the 1-row packed series
    "q539_bowtie"              -> 1,   // 1-row core-id broadcast onto the |V|-row label frame
    "q541_fleiss_kappa"        -> 3,   // 3-row annotator fan-out + 1-row category totals
    "q542_mcc_ovr"             -> 1,   // 1-row grand-total broadcast onto the |langs| marginal frame
    "q543_rbo"                 -> 10,  // 10-row depth dimension onto the ≤20-row ranked pool
    "q548_garch_grid"          -> 9,   // 9-row (α,β) grid onto the 1-row packed return series, then a 1-row best-ll broadcast
    "q557_krippendorff_alpha"  -> 3,   // 3-row annotator fan-out (q541's fixture) + 1-row census reports
    "q558_markov_entropy_rate" -> 1,   // inherits q496's 1-row grand-total broadcast (the composition idiom)
    "q549_min_k_prob"          -> 1,   // 1-row corpus-total broadcast onto the token census
    "q562_good_turing"         -> 1,   // 1-row (n_tokens, n1) total onto the ≤10-row fof report
    "q563_heaps_law"           -> 10,  // 10-row decile-cut dimension onto the vocab first-occurrence frame, + the 1-row fit broadcast
    "q564_jm_perplexity"       -> 2,   // 2-row λ grid + 1-row model totals onto the held census
    "q565_viterbi_decode"      -> 1,   // 1-row (n, k) census total onto the |types|-row emission frame
    "q567_dgim_window"         -> 1,   // 1-row exact window count beside the 1-row folded sketch state
    "q570_keyness_g2"          -> 1,
    "q575_dsir_selection"      -> 1,   // 1-row (t_raw, t_tgt) totals onto the 64-row bucket census   // 1-row (na, nb) corpus totals onto the term census
    "q30_cosine_knn"           -> 8,
    "q55_embedding_dedup"      -> 4000)

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
  import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
  import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case q: QueryStageExec        => flatten(q.plan)
    case r: ReusedExchangeExec    => flatten(r.child)
    case other                    => other.children.flatMap(flatten)
  })

  private def rowsOut(p: SparkPlan): Long =
    flatten(p).flatMap(_.metrics.get("numOutputRows").map(_.value))
      .headOption.getOrElse(-1L)

  // q230_mmr_rerank pairs its 20-row candidate frame with itself (model-
  // sized by contract) but needs no exemption: the greedy loop's
  // localCheckpoints truncate the final plan, so the scan below sees no
  // join shape at all.
  private val quadraticYardsticks = Set(
    "q55_embedding_dedup",
    "q30_cosine_knn",
    "q507_matrix_profile") // all-pairs over the CALENDAR-BOUNDED day series
                           // (~2.4k windows at every SF) — exact matrix
                           // profile is pairwise by contract (q408's
                           // calendar-melt precedent)

  private val scalarBroadcasts = Set(
    "q34_dead_heartbeats",
    "q56_tfidf",
    "q91_bm25",  // 1-row (n_docs, avgdl) aggregate broadcast, as q56's N
    "q92_vocab_coverage",      // 1-row token-mass total onto the 3 probe rows (the q56 idiom; r15 top-k rewrite)
    "q93_power_iteration_pca", // 1-row norm scalar broadcast per iteration
    "q94_bigram_perplexity",   // 1-row vocabulary-size broadcast
    "q99_embedding_outliers",  // 1-row (n, Σd, Σd²) moments broadcast
    "q104_rrf_fusion",  // inherits q91's 1-row (n_docs, avgdl) broadcast
                        // again since the r15-opt pass dropped the score
                        // frames' localCheckpoints (they cost a
                        // materialization + count job per frame; the
                        // probe is now a metadata |documents| bound)
    "q114_chi2_keyness",       // 1-row corpus token count broadcast (was a driver-side count)
    "q122_association_rules",  // 1-row order count broadcast (was a driver-side count)
    "q127_hll_users",          // 1-row union-of-sketches estimate broadcast
    "q128_cms_frequency",      // 1-row (sketch, N) broadcast probed per key
    "q133_source_divergence",  // 1-row corpus token total broadcast
    "q149_decayed_popularity", // 1-row max-timestamp horizon broadcast
    "q152_equidepth_histogram", // 1-row decile-bounds array broadcast
    "q153_hll_overlap",        // |types|-row sketch table paired with itself (model-sized at any scale)
    "q159_rfm_segments",       // two 1-row percentile-cutoff broadcasts (the q145 idiom)
    "q161_kaplan_meier",       // 1-row censoring-horizon broadcast
    "q164_welch_ttest",        // 1-row baseline-moments broadcast
    "q172_negative_sampling",  // 50-row candidate pool broadcast (model-sized at any scale)
    "q181_token_pmi",          // 1-row corpus-size broadcast (the q56/q91 idiom)
    "q184_cumulative_gains",   // 1-row decile-bounds array broadcast (the q152 idiom)
    "q202_lorenz_deciles",     // 1-row decile-bounds array broadcast (the q152 idiom)
    "q203_word_burstiness",    // 1-row doc-count scalar broadcast (the q56/q91 idiom)
    "q213_ttl_projection",     // 1-row max-ts horizon broadcast (the q149 idiom)
    "q215_two_proportion_z",   // two 1-row arm aggregates cross-joined
    "q217_fk_integrity",       // 7 edges × 1-row count aggregates cross-joined
    "q219_freshness_audit",    // 1-row horizon broadcast (the q149 idiom)
    "q220_simpson_detector",   // 1-row pooled-slope broadcast
    "q229_ipf_raking",         // 1-row (total, n_langs) broadcast over the lang×source cell matrix
    "q232_dsir_weights",       // 1-row (nc, v, nt) LM-totals broadcast
    "q233_band_tuning",        // 1-row candidate/hit count aggregates per geometry
    "q235_ks_drift",           // |sources|-row indicator fan-out (model-sized at any scale)
    "q237_water_filling",      // 1-row water-level broadcast against the source frame
    "q238_group_dro_weights",  // inherits q94's 1-row vocabulary-size broadcast
    "q243_conformal_interval", // 1-row n_cal + 1-row q-hat broadcasts
    "q245_kneser_ney",         // 1-row bigram-type total broadcast (the q94 idiom)
    "q246_hits",               // 4 × 1-row L2-norm broadcasts (the q93 idiom)
    "q248_sinkhorn",           // langs × sources grid completion (model-sized both sides)
    "q249_sensitivity_coreset", // 8-seed pool + 1-row totals broadcast
    "q269_curriculum_shards",  // inherits q94's 1-row vocabulary-size broadcast (the q238 case)
    "q278_ann_recall_sweep",   // exact-side 5-query pool broadcast (the q30 idiom)
    "q289_weight_diagnostics", // 1-row p99-weight broadcast
    "q293_littles_law",        // two 1-row aggregates cross-joined (the q215 idiom)
    "q294_ewma_control",       // 1-row (center, limit) moments broadcast (the q164 idiom)
    "q296_fellegi_sunter",     // 1-row (u_seg, u_band) marginals broadcast
    "q297_nelson_aalen",       // 1-row censoring-horizon broadcast (the q161 idiom)
    "q298_good_turing",        // 1-row (N, N1) totals broadcast (the q56/q91 idiom)
    "q303_bloom_fpr_sweep",    // 2-row geometry fan-out + 1-row member/probe counts
    "q306_cbo_cardinality",    // 1-row (n, ndv) stats aggregates cross-joined per edge
    "q307_histogram_selectivity", // 16-row histogram × 5-row threshold sweep (model-sized)
    "q311_paired_permutation", // 1-row observed-statistic broadcast (the q164 idiom)
    "q315_markov_removal",     // 5-row variant fan-out over the ≤24-edge matrix
    "q316_shapley_attribution", // 16-mask × 4-channel lattice (constant-sized by construction)
    "q319_wand_pruning",       // 1-row corpus stats + 1-row theta broadcasts
    "q320_cascade_recall",     // 3-row candidate-budget sweep (the q213 idiom)
    "q321_rocchio_prf",        // inherits q91's 1-row (n_docs, avgdl) broadcast
    "q322_erlang_staffing",    // 1-row peak-λ broadcast feeding the c-sweep
    "q324_safety_stock",       // 3-row z-level fan-out (the q213 idiom)
    "q329_t_closeness",        // 5-row priority-marginal grid fan-out
    "q332_incremental_dedup",  // 1-row pair-count aggregates cross-joined (the q217 idiom)
    "q338_capped_triangles",   // 1-row edge-count/exclusion-bound aggregates cross-joined (the q217 idiom)
    "q342_kcenter_seeding",    // <=6-row seed-frame broadcast — k-center's whole design (the q172 model-pool idiom)
    "q343_poisson_bootstrap",  // 1-row point-estimate x 1-row replicate-stats report join (the q215 idiom)
    "q345_kanon_lattice",      // 27-row lattice frame x model-sized finest grid (the q316 lattice idiom)
    "q346_loso_ablation",      // 1-row totals broadcast — ablation by subtraction (the q56/q91 idiom)
    "q347_posting_compression",// 1-row n_docs broadcast (the q56/q91 idiom)
    "q348_threshold_audit",    // 5-row depth sweep x depth-bounded candidates (the q213 sweep idiom)
    "q350_hill_tail",          // 3-row k sweep x 201-row prefix (the q213 sweep idiom)
    "q352_sprt",               // 1-row baseline-rate broadcast (the q149 horizon idiom)
    "q353_blocking_quality",   // 1-row count aggregates cross-joined per scheme (the q217 idiom)
    "q355_context_gain",       // 1-row corpus-total broadcast (the q56/q91 idiom)
    "q357_stopword_divergence",// 10-row stopword grid + 1-row total (the q329 grid idiom)
    "q360_brier_decomposition",// 1-row totals x 1-row report join (the q215 idiom)
    "q364_bcubed_dedup_eval",  // 1-row totals x 1-row averages report join (the q215 idiom)
    "q366_data_knapsack",      // 1-row budget + 1-row LP report broadcasts (the q217 idiom)
    "q367_pinball_eval",       // 3-row tau sweep (the q213 sweep idiom)
    "q369_cka_redundancy",     // 1-row mass reports cross-joined (the q217 idiom)
    "q371_dp_exp_median",      // 1-row n / Z broadcasts over the 32-row candidate frame (the q56 idiom)
    "q374_isotonic_calibration",// 10-bin minimax grid (the q316 lattice idiom)
    "q375_james_stein",        // 1-row (m, grand, se2) hyper broadcast (the q56 idiom)
    "q376_ucb_allocation",     // 1-row (N, best-mean) broadcast over the |arms| frame (the q56 idiom)
    "q378_scaling_law",        // 1-row held-total/fit broadcasts over the 5-slice frame (the q217 idiom)
    "q381_llr_collocations",   // 1-row N broadcast into the G2 cells (the q56 idiom)
    "q382_logrank_test",       // 1-row (n1, n2) totals broadcast over the time spine (the q56 idiom)
    "q383_ps_stratification",  // 1-row ATE/ATT report over the |strata| frame (the q217 idiom)
    "q384_power_planner",      // 10-row lift fan-out x 1-row rates (the q213 sweep idiom)
    "q387_shard_quantile_merge",// 128-row merged summary x 5 probes (the q307 histogram idiom)
    "q334_textrank_keywords",  // 1-row node-count broadcast (the q93 idiom)
    "q337_kendall_tau",        // |brands|-row pairing frame (the q153 model-sized idiom)
    "q396_mondrian_conformal", // 1-row pooled-q̂ broadcast (the q243 idiom; segment q̂ rides a hash join)
    "q399_quantile_regression", // 3-row tau sweep + 9-row (tau × ±1%) certificate fan-out (the q367 idiom)
    "q404_fold_leakage",       // 1-row fold-balance (fmax, fmin) report join (the q215 idiom)
    "q406_quantile_effects",   // 9-row decile fan-out + 1-row median-sign broadcast (the q367 idiom)
    "q408_trend_breakpoint",   // calendar-bounded candidate×month melt (~84×76 at any SF) + 1-row fit report
    "q414_species_richness",   // 1-row doc-count broadcast (the q56 idiom)
    "q415_grid_dbscan",        // 9-row neighbourhood-offset fan-out + 1-row stat/noise reports
    "q417_theil_decomposition", // 1-row (mu, N) global broadcast (the q56 idiom)
    "q418_huber_irls",         // 1-row fit + 1-row median-scale broadcasts per round (the q340 idiom)
    "q421_kruskal_wallis",     // 1-row (N, tie-mass) broadcast over the |groups| frame (the q56 idiom)
    "q422_pettitt_changepoint", // 1-row argmax + 1-row means broadcasts over the calendar spine
    "q423_gumbel_return_levels", // 1-row Gumbel-fit broadcast over the ~84 monthly maxima
    "q424_nb_overdispersion",  // 1-row moment broadcast over the <=11-bin census
    "q426_periodogram",        // 1-row mean broadcast over the calendar-bounded daily spine
    "q427_nn_matching",        // 1-row quantile broadcast onto the 1-row ATT report (matching itself is the q118 as-of window shape)
    "q428_range_planner",      // 1-row skew broadcast onto the P=16 partition frame (boundaries ride a 15-element broadcast array)
    "q430_wilcoxon_signed_rank", // 1-row tie census + zero census onto the 1-row moment report
    "q431_beta_binomial_shrink", // 1-row MoM prior onto the 25-brand rate frame (the q375 James-Stein idiom)
    "q432_betweenness",        // 1-row node count onto the |V|-row frame; walks/triples ride equi-joins
    "q433_sax_motifs",         // 1-row series bounds + 1-row top-motif onto the 64-segment frame
    "q434_friedman_test",      // 1-row tie census + treatment count onto the k-row report
    "q435_mcnemar_test",       // 1-row exact-binomial tail onto the 1-row cell report (the q215 idiom)
    "q436_cochran_q",          // 1-row row-total moments onto the 3-era column frame (the q56 idiom)
    "q437_fisher_exact",       // 1-row lnp_obs + 1-row tails onto the 1-row cell report (the q215 idiom)
    "q438_ljung_box",          // 1-row (n, Σc, Σc²) moments onto the 10-lag frame (the q56 idiom)
    "q439_runs_test",          // 1-row median broadcast onto the calendar-bounded daily spine
    "q440_durbin_watson",      // 1-row OLS-fit broadcast onto the calendar-bounded daily spine (the q418 idiom)
    "q443_breusch_pagan",      // 1-row Cramer-beta broadcast onto the per-order design (the q418 idiom)
    "q444_hurst_rs",           // 1-row log-log slope onto the 6-window R/S frame (the q56 idiom)
    "q445_pacf",               // 1-row (n, Σc, Σc²) moments onto the 5-lag frame (the q438 idiom)
    "q448_spectral_bipartition", // 1-row array/cut broadcasts + the model-sized sweep range join
    "q450_mood_median",        // 1-row grand-median broadcast onto the order frame (the q439 idiom)
    "q451_kpss",               // 1-row moment broadcasts onto the daily spine (the q438 idiom)
    "q452_cox_ph",             // 1-row horizon + per-step beta broadcasts onto the event spine (the q418 idiom)
    "q453_cochran_armitage",   // 1-row margin broadcast onto the 5-score cells (the q56 idiom)
    "q454_jonckheere",         // 1-row JT/moment/tie reports cross-joined (the q217 idiom)
    "q455_ransac",             // 32-row md5-seeded line pool broadcast (the q172 model-pool idiom)
    "q456_bayesian_ab",        // 1-row exact posterior sum onto the 2-arm frame (the q215 idiom)
    "q457_page_hinkley",       // 1-row moments + 1-row top/alarm onto the walk (the q56 idiom)
    "q459_ansari_bradley",     // 1-row (N, m) census broadcast onto the rank frame (the q421 idiom)
    "q461_ordinal_concordance",// 15-cell grid self-pairing (the q153 model-sized idiom)
    "q462_theils_u",           // 1-row entropy reports cross-joined (the q217 idiom)
    "q463_mantel_haenszel",    // 1-row MH/CMH report onto the 5-stratum cells (the q215 idiom)
    "q465_cramers_v",          // 1-row (n, r, k) totals onto the 25-cell grid (the q56 idiom)
    "q473_scc",                // 1-row condensation-edge report onto the |V|-row label frame (the q338 idiom)
    "q474_kmv_setops",         // |types|-row sketch-array pairing (the q153 model-sized idiom)
    "q479_qerror_audit",       // 1-row count/ndv/actual reports cross-joined per edge (the q217 idiom)
    "q481_encoding_advisor",   // 1-row boundary-stitch report x 1-row in-bucket report (the q217 idiom)
    "q480_design_effect",      // 1-row global-moments broadcast onto the |segments| frame (the q56 idiom)
    "q483_ams_f2",             // 1-row sketch estimate x 1-row exact truth (the q215 idiom)
    "q484_haar_synopsis",      // 1-row Parseval totals onto the 9-row synopsis
    "q485_dtw_warp",           // 1-row reference series onto the |nations| frame (the q56 idiom)
    "q486_reuse_distance",     // 1-row class totals onto the distance histogram (the q56 idiom)
    "q488_priority_sample",    // 1-row tau onto the 64-row sample (the q215 idiom)
    "q491_reservoir_coverage", // 1-row grand-chars total onto the |sources| frame (the q56 idiom)
    "q493_join_size_sketch",   // 1-row sketch estimate x 1-row exact truth (the q215 idiom)
    "q494_seqpat_mining",      // 1-row n_events/n_tri totals onto the |types|³ frame (the q56 idiom)
    "q495_perm_test",          // 1-row observed/size broadcasts onto the R-replicate frame (the q311 idiom)
    "q496_markov_stationary",  // 1-row grand total onto the |states| frame (the q56 idiom)
    "q498_universe_sample",    // 3-row rate sweep + 1-row exact truth (the q213 sweep idiom)
    "q499_sliding_distinct",   // calendar-bounded day spine for the exact leg (the q426 idiom)
    "q500_curation_funnel",    // 5-row stage spine x ≤5-row depth histogram (the q316 lattice idiom)
    "q502_datalog_ready",      // 1-row ready-count report onto the 1-row totals (the q215 idiom)
    "q503_bitemporal_asof",    // 4-row (valid, tx) cutoff grid onto the fact log (the q213 sweep idiom)
    "q505_cdc_upsert",         // 1-row ledger pivot + 1-row final-state report (the q215 idiom)
    "q506_rejection_resample", // 1-row c_min / bin-count / accepted-total broadcasts (the q56 idiom)
    "q508_morans_i",           // fixed 10×10 lattice adjacency self-join + 1-row totals
    "q509_getis_ord",          // fixed 10×10 lattice neighborhood self-join + 1-row totals
    "q510_cointegration",      // 1-row OLS-fit broadcast onto the daily spine (the q56 idiom)
    "q511_naive_bayes",        // 5×200 model spine + 1-row prior total (the q316 lattice idiom)
    "q515_lead_lag_ccf",       // 25-row lag dimension over the calendar-bounded spine (the q213 sweep idiom)
    "q517_hmm_regimes",        // 1-row tercile-cut broadcast onto the daily spine (the q56 idiom)
    "q520_dawid_skene",        // 3×5×5 model-spine fan-outs (the q316 lattice idiom)
    "q523_rich_club",          // 4-row k sweep onto the edge census (the q213 sweep idiom)
    "q525_ridge_path",         // 3-row λ sweep onto the 1-row scatter (the q213 sweep idiom)
    "q526_chow_test",          // 1-row pooled × split SSE reports (the q215 idiom)
    "q527_qlm_dirichlet",      // 4-term model + 1-row total onto the doc spine (the q56 idiom)
    "q530_feature_hashing",    // 3-row k sweep onto the vocabulary census (the q213 sweep idiom)
    "q531_woe_iv",             // 1-row bounds/totals onto the bin census (the q56 idiom)
    "q537_western_electric",   // 1-row μ/σ limits onto the daily spine (the q56 idiom)
    "q538_adstock_fit",        // 3-row θ sweep onto the packed series (the q213 sweep idiom)
    "q539_bowtie",             // 1-row core-id broadcast onto the label frame (the q56 idiom)
    "q541_fleiss_kappa",       // 1-row category totals × 1-row subject report (the q215 idiom)
    "q542_mcc_ovr",            // 1-row grand total onto the |langs| marginals (the q56 idiom)
    "q543_rbo",                // 10-row depth dimension onto the ranked pool (the q213 sweep idiom)
    "q548_garch_grid",         // 9-row grid onto the 1-row packed series + 1-row best-ll (the q538 sweep idiom)
    "q557_krippendorff_alpha", // 1-row marginal × 1-row unit census (the q215 idiom)
    "q558_markov_entropy_rate",// rides q496's 1-row grand-total broadcast (the q157-reuses-q79 idiom)
    "q549_min_k_prob",         // 1-row corpus total onto the token census (the q56 idiom)
    "q562_good_turing",        // 1-row (n_tokens, n1) total onto the ≤10-row fof report (the q56 idiom)
    "q563_heaps_law",          // 10-row decile cuts onto the vocab first-occurrence frame + 1-row fit (the q213 sweep idiom)
    "q564_jm_perplexity",      // 2-row λ grid + 1-row model totals onto the held census (the q213 sweep idiom)
    "q565_viterbi_decode",     // 1-row (n, k) census total onto the emission frame (the q56 idiom)
    "q567_dgim_window",        // 1-row exact window count beside the 1-row sketch state (the q215 idiom)
    "q570_keyness_g2",         // 1-row (na, nb) totals onto the term census (the q56 idiom)
    "q575_dsir_selection")     // 1-row smoothing totals onto the 64-row bucket census (the q56 idiom)
  // q540_err_metric's 4-term dimension joins by EQUI key (term) — a plain
  // broadcast hash join, no exemption needed.
  // q512_single_linkage crossJoins a 1-row order-statistic cut, but needs no
  // exemption: label propagation's localCheckpoint truncates the final plan
  // before the threshold join (the q253/q372 case above).
  // q372_knn_shapley broadcasts its 16-point test pool (the q30 idiom) but
  // needs no exemption: the values frame is localCheckpoint'd before the
  // rank passes, so the final plan sees no join shape (q253's case below).
  // q253_matryoshka_recall broadcasts its 5-query pool (the q30 idiom) but
  // needs no exemption: its eager localCheckpoint truncates the final plan
  // before the overlap join, so the scan sees no join shape (q230's case).

  private def planOf(name: String): String =
    graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("no cartesian/nested-loop join outside the allowlists") {
    val exempt = quadraticYardsticks ++ scalarBroadcasts
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(exempt)
      .filter { name =>
        val plan = planOf(name)
        plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin")
      }
    assert(offenders.isEmpty,
      s"quadratic join shapes outside the allowlist: ${offenders.mkString(", ")}")
  }

  test("the exempted plans still carry the shape (allowlists are not dead)") {
    (quadraticYardsticks ++ scalarBroadcasts).foreach { name =>
      val plan = planOf(name)
      assert(plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin"),
        s"$name no longer plans a nested-loop join — remove it from the allowlist")
    }
  }

  test("every allowlisted nested-loop build side is within its declared bound") {
    val missing = (quadraticYardsticks ++ scalarBroadcasts) -- buildSideBounds.keySet
    assert(missing.isEmpty, s"allowlist entries without a declared bound: $missing")

    buildSideBounds.toSeq.sortBy(_._1).foreach { case (name, bound) =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.collect() // populate metrics on the final adaptive plan
      val joins = flatten(df.queryExecution.executedPlan).collect {
        case b: BroadcastNestedLoopJoinExec =>
          val side = b.buildSide match {
            case BuildLeft  => b.left
            case BuildRight => b.right
          }
          ("bnlj", rowsOut(side))
        case c: CartesianProductExec =>
          ("cartesian", math.min(rowsOut(c.left), rowsOut(c.right)))
      }
      // iterative queries truncate intermediate rounds behind
      // localCheckpoints — the shape may live only in an intermediate
      // plan (the shape test above covers presence; here we bound every
      // instance that IS in the final plan).
      joins.foreach { case (kind, rows) =>
        assert(rows >= 0, s"$name: $kind build side exposed no numOutputRows metric")
        assert(rows <= bound,
          s"$name: $kind build side materialized $rows rows — over its declared bound $bound")
      }
    }
  }
}
