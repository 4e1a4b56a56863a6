package graft

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Golden content hashes for flagship round-2 operators on the
  * immutable sf0.001 driver fixture — drift insurance that runs in
  * `sbt test`, independent of the driver's DuckDB oracle cycle. Same
  * canonicalization as `aqi.GoldenSpec` (sorted columns, sorted rows,
  * integral doubles printed as integers).
  *
  * If an intentional semantic change moves a hash, re-pin it in the
  * same commit and say why in the commit message.
  */
class GoldenQueriesSpec extends AnyFunSuite with SparkTest {

  private val sfDir = "/root/testdata/sf0.001"

  private def canonicalHash(df: DataFrame): String = {
    val cols = df.columns.sorted
    val lines = df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map {
        case null => "NULL"
        case d: java.lang.Double => if (d == d.longValue()) d.longValue().toString else d.toString
        case v => v.toString
      }.mkString("|"))
      .sorted
    val md = MessageDigest.getInstance("MD5")
    lines.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  private val pinned = Map(
    "asof_join" -> "d46f154514ca44380d1956436d37743d",
    "e5_gap_fill" -> "5eed039439c8f2acf01ee2f47e9d72c5",
    "sketch_kmv_distinct" -> "b8c33199828611e41531cd495501d946",
    "q_grid_quantiles" -> "578a248ef2d32e0c484be1e725bac233",
    "sample_hash_split" -> "4e8df2a846775b37f53466eab9e3f344",
    "sample_cap_group" -> "66799741457720a314dc064cd0e0a12b",
    "decontaminate_ngram" -> "7fd7f6b6fcf080dca715127d93a372e7")

  test("round-2 operator outputs hash-match their pinned golden values") {
    val got = pinned.keys.toSeq.sorted.map { q =>
      val h = canonicalHash(SparkEntry.queries(q)(spark, sfDir))
      info(s""""$q" -> "$h",""")
      q -> h
    }
    graft.operators.Caches.release()
    got.foreach { case (q, h) =>
      assert(h == pinned(q), s"$q output drifted (got $h)")
    }
  }

  private val pinnedR3 = Map(
    "pii_redact" -> "c7efcf321e859347675f8802fd8afe6b",
    "text_repetition" -> "0a32dbc9d3411716088fd5794dcbbed9",
    "sample_weighted" -> "df2e0875862e057aa0a65709eb687d84",
    "r_overlap_join" -> "a346833647e82657865cbdf5cd15f106",
    "u4_scd2_history" -> "53b56780b5663cd18d04c923c12009b1",
    "sketch_heavy_hitters" -> "79f52b4ca0741c6e3e47ea46f2d2db11",
    "decontaminate_bloom" -> "a53337a1bc6a3289fdf40ddea8109fc1",
    "emb_label_profile" -> "140db6ff83575462df9a64412953b0d4",
    "doc_chunks" -> "9798c1c9037fff82cadee62b6ec242d4",
    "text_tfidf_terms" -> "b25078117ecabcd939c0d121f8ecba47",
    "incr_agg_maintain" -> "205511508ca1db5f684c1754850a7cb7",
    "q_corr_subquery" -> "e4a3eb87198b4cae1bc2230b7738fbd2",
    "dedup_edit_distance" -> "d41255928c2669e9e882dc2e499aea11",
    "w5_ntile_prank" -> "4a4669d3286e4b0d59bcf8dc74644efa",
    "media_frame_stats" -> "7441e8849fad4087c98238aeb3237040",
    "pipeline_training_mix" -> "6a4e4c61db0659c4fe79e3b48a665375",
    "pack_token_budget" -> "4f7d9da0a35eca24ac0a3644f7cd3d99",
    "q_lateral_topn" -> "453cd5e7a710f17082efe93586b3e476",
    "q_grouping_sets" -> "98a4933d9c1495870521e961360b108a",
    "u5_table_diff" -> "d92c06c7d435a001bcfb2a40970fd6bf",
    "dq_constraints" -> "8e51da8526727a47c80ceacdb246dee0",
    // re-based in round 11: pqTopK's codebook moved from raw seed
    // slices to per-subspace Lloyd training (min-L2 encode) — the
    // trained tier is the new default and the oracle replays it
    "ann_pq_topk" -> "51fd70afe083bdfd5c8d394e7c1d301b")

  test("round-3 operator outputs hash-match their pinned golden values") {
    val got = pinnedR3.keys.toSeq.sorted.map { q =>
      val h = canonicalHash(SparkEntry.queries(q)(spark, sfDir))
      info(s""""$q" -> "$h",""")
      q -> h
    }
    graft.operators.Caches.release()
    got.foreach { case (q, h) =>
      assert(h == pinnedR3(q), s"$q output drifted (got $h)")
    }
  }

  private val pinnedR3b = Map(
    "dedup_span_excise" -> "b8747f66af5e87149986da3a00bf100a",
    "asof_join_fwd" -> "f2795cb7dcab4a12878dbaec9f4f1249",
    "asof_join_nearest" -> "1d1d137f8c73ba033923b7b3a089485e",
    "dedup_embed_cluster" -> "4ab3a25b43d4c2901d25730a9aea8e86",
    "relevance_sample" -> "5f65dcbb8023f1996c5e9c4b6c9f9628",
    "quality_adaptive_gate" -> "c93439fd45e6624c369f348c077a870c",
    "funnel_3step" -> "7cd3377612e0e7ea9e5473c7872d4999",
    "cohort_retention" -> "939716135802521353682fe905fc1024",
    "q_gaps_islands" -> "14a8d41f5b70fa836711377a1189f546",
    "pipeline_curation_v2" -> "deada623ca5095448e8e57252e78e391",
    "bpe_pair_stats" -> "60ddb665e6be6d4f51de129bb6b5462e",
    "skew_key_profile" -> "d4467758b7b65c36969637c883b86052",
    "skew_salted_join" -> "66fac0034898329c1a1ff64073eca7b7",
    "decontaminate_embed" -> "4906e9bf64025d1e538d9d3fe6e22029",
    "graph_pagerank" -> "cb4293a53604a8952e6d697ce89c5f2a",
    "link_best_match" -> "5f8c9b0b5a7224d543ad50313473465c",
    "seq_transitions" -> "484d57f55e534627426fceeb350e43c1",
    "dq_categorical_drift" -> "1af869748a90edc011cee7bde9e21d4d",
    "graph_label_prop" -> "f360fb2a69daf915efacaa521fd64201",
    "sample_temporal_split" -> "f17dc91b08dacb9cde9c1a6245f42777",
    "ann_ivf_pq_topk" -> "ff670f0b40f0aefc2b7832e7d9659d01")

  private val pinnedR3c = Map(
    "bpe_train_merges" -> "b89b97695364c06ea9657a9d73edf696",
    "graph_triangles" -> "34331186907647728bac2f4f5beabddc",
    "dedup_keep_list" -> "a952192263680dac1b4a51212f4605cb",
    "text_bigram_lm" -> "468443d3c850b93fbcbd7f5e26f54f14",
    "dedup_incremental" -> "56a6e20594b3c075efa50775756a81b2",
    "dq_profile" -> "41ec9d2b6440821e53919ac82bbf94ee",
    "emb_covariance" -> "9c02b3c25818501fff9cdff4c65e9364",
    "q_supplier_part" -> "81ab27031bb325822057232c9f686473",
    "text_normalize" -> "31b0264b4ef76bd2a3549a53f4c93a46",
    "dedup_source_matrix" -> "f96bbb8685baa51dfc9d46173373be0b",
    "q_equi_depth_bins" -> "82badea05171dae2358f96315e8ad842",
    "bpe_encode_counts" -> "c4fcdf9b35b3a4cc8d973d739f0494d7",
    "dq_numeric_ks" -> "9ac6b3f6e5e1a3b58d230018a745d348",
    "text_source_terms" -> "075e0a75b49e8085dcd77b4b535f3dc1",
    "text_lang_confusion" -> "efba5e1ac55f6dd0404f443a3a8ecb82",
    "sketch_count_min" -> "79f52b4ca0741c6e3e47ea46f2d2db11")

  test("round-3c operator outputs hash-match their pinned golden values") {
    val got = pinnedR3c.keys.toSeq.sorted.map { q =>
      val h = canonicalHash(SparkEntry.queries(q)(spark, sfDir))
      info(s""""$q" -> "$h",""")
      q -> h
    }
    graft.operators.Caches.release()
    got.foreach { case (q, h) =>
      assert(h == pinnedR3c(q), s"$q output drifted (got $h)")
    }
  }

  test("round-3b operator outputs hash-match their pinned golden values") {
    val got = pinnedR3b.keys.toSeq.sorted.map { q =>
      val h = canonicalHash(SparkEntry.queries(q)(spark, sfDir))
      info(s""""$q" -> "$h",""")
      q -> h
    }
    graft.operators.Caches.release()
    got.foreach { case (q, h) =>
      assert(h == pinnedR3b(q), s"$q output drifted (got $h)")
    }
  }

  private val pinnedR3d = Map(
    "dedup_ngram_prefix" -> "ea40ab7ad6347e463e38bc42cb47fdf6",
    "dedup_ngram_containment" -> "49e7eda0041bb5614df60f9114390492",
    "text_novelty" -> "8fea8df055dc03770832673c680ead91",
    "sample_cluster_split" -> "664a70227dce372281bab9e315cc2315",
    "text_collocations" -> "64d1679e67805b6516f2ffcbd2aad13e",
    "text_doc_lm_score" -> "8d4afb6fe5a4aff0fa3796c989da0d8b",
    "graph_bfs_dist" -> "e7ec621f265ce3a0457c6ddf2d26c1c5",
    "sketch_hll_registers" -> "436df92b12f235899334b91327295a1d",
    // re-pinned 2026-08-13: the driver regenerated testdata with
    // plain TIMESTAMP(MICROS) (previously a date-typed o_orderdate
    // era); values identical — the DuckDB oracle matches bit-for-bit —
    // but the canonical rendering of the ts column changed
    "u6_point_in_time" -> "44b4dac970c00dda644f86d71f7a9d4d",
    "pipeline_curation_v3" -> "182b01de8998a53c336557bef78dd90e",
    // at sf0.001 the 32-core is empty (part degrees cap at 10 there;
    // the sf0.01 gate run has a 290-node core) — the pin asserts that
    // emptiness is deterministic, not an accident of ordering
    "graph_kcore" -> "d41d8cd98f00b204e9800998ecf8427e",
    "dq_rate_spikes" -> "09d84e0b4873cc46361f4169a2939687",
    "dedup_sorted_neighborhood" -> "0790d996b5066b975a3a1a00ad2692ea",
    "sample_temperature_alloc" -> "877a62f7ca84acd8bb06e23cf53cee43",
    "sample_temperature_docs" -> "cfdbe636b8341ba1ca1da777c0a4eae6",
    "pipeline_curation_v4" -> "230ebecd3bcd3460bb382b80485f565f",
    "text_importance" -> "fb0c6b8d765ea4135558c73791bb21f0",
    "sample_importance" -> "4c0bc0470323420fd77247e3a4bfcc07",
    "sketch_hll_rollup" -> "d2ead2648490d65387a0f8de760215af",
    "text_oov_rate" -> "0e6dd20dc9e878a84c7c238bcfa530a9",
    "sample_negatives" -> "efd7a79f29619c2b782f4b1dd6ffeff9",
    "pack_length_buckets" -> "81ab464f78004685d6297f3904c65507",
    "shard_ring_move" -> "84d72e027158f12b9cc7b77faab44a6b",
    "sample_interleave" -> "b2329402f646ec8a98c7081b021d8dc3")

  test("round-3d operator outputs hash-match their pinned golden values") {
    val got = pinnedR3d.keys.toSeq.sorted.map { q =>
      val h = canonicalHash(SparkEntry.queries(q)(spark, sfDir))
      info(s""""$q" -> "$h",""")
      q -> h
    }
    graft.operators.Caches.release()
    got.foreach { case (q, h) =>
      assert(h == pinnedR3d(q), s"$q output drifted (got $h)")
    }
  }

  private val pinnedR4 = Map(
    "search_phrase" -> "df34db3501bedf4d01f40ee849a29da2",
    "search_bm25_topk" -> "aa2a3f9e3e842fdd61300e2a93d0b695",
    "text_winnow_fp" -> "01243ea798806e2b3bd93c61450d91d8",
    "dedup_winnow_pairs" -> "191ff5d7bd9d551b1fe5d4f01a540219",
    "search_hybrid_rrf" -> "73b4f62069b6a854d5d277307c3eb893",
    // identical to search_bm25_topk by construction (served off the index)
    "search_bm25_indexed" -> "aa2a3f9e3e842fdd61300e2a93d0b695")

  test("round-4 operator outputs hash-match their pinned golden values") {
    val got = pinnedR4.keys.toSeq.sorted.map { q =>
      val h = canonicalHash(SparkEntry.queries(q)(spark, sfDir))
      info(s""""$q" -> "$h",""")
      q -> h
    }
    graft.operators.Caches.release()
    got.foreach { case (q, h) =>
      assert(h == pinnedR4(q), s"$q output drifted (got $h)")
    }
  }

  private val pinnedR4b = Map(
    "incr_agg_retract" -> "2cb707548b31e27c5760b9efbd3fac9e",
    "incr_minmax_retract" -> "85cf6e9f4a0488786b5afce9a5928459",
    "stream_counts_replay" -> "620e5a04660d9a42d91c36dc40d05ea3",
    "stream_retract_replay" -> "1aa9fe28db3ddbc7811ff877ef307b2a",
    "stream_sessions_replay" -> "689c59a236a51701281dc2d566e500f6",
    "stream_join_replay" -> "3c99a2e2718f30608f5bd211813c46c2",
    "stream_attrib_replay" -> "9c496904730fd2aa9478579c6581c174",
    "q_max_concurrent" -> "ac92e6c40c85599ff88016ad0902176d",
    "seq_cusum_shift" -> "f00e6db445f46deeeb887a80404b70ed",
    "stat_bootstrap_ci" -> "bc1a38018f7c540124a3bffb82257ecd",
    "dq_fd_violations" -> "f172db51f9d24119ed3e573dcb4d4fc4",
    "q12_late_lines" -> "f9ff2b4958077b850d02d4c86fc3cbe0",
    "sketch_cm_collisions" -> "7d5d6fa6a1c556e7023907f3822ffbd3",
    "ann_range_search" -> "c657354a39aab8a116037f71b4d692bd",
    "graph_ppr" -> "6c6a83753773205bcfd0e8c7953ca1fe",
    "link_fuzzy_names" -> "552b8069e5e1f665bb115748ad4c02e8",
    "feat_loo_target_enc" -> "689034dd320f8523adc3597b88b6cdcb",
    "q_unpivot" -> "c7b4938a312b5208efd033014d2b6181",
    "seq_interpolate" -> "47b1bf5bb314795c7a66e0e188055656",
    "stat_group_ols" -> "95b9cf51bb7891e5f7146794de93144e",
    "stat_corr_matrix" -> "106dce20509fd37bece8cf0488b4493d",
    "layout_zvalue" -> "860f9e03124e13b820f7a9b1ef43e8c1",
    "layout_zone_prune" -> "67a654ca99d7cc17c7e61bf8549017ca",
    "dq_robust_mad" -> "adfa95789965b8c38edaa9c196087f94",
    "search_ndcg" -> "513040c239b79033594cb2d4dfeae10a",
    "media_scene_cuts" -> "4ef4c4fb37c1a60ec1bf543ed74b61b2",
    "dq_l_diversity" -> "e2d9c991033bc281b0a0ddad1fdcd280",
    "text_readability" -> "177d2c7362d0a7f001c6773ececb247e",
    "seq_ewma" -> "e79c3ec7c063123a57c02bc5c74d9a78",
    "pipeline_data_card" -> "139331d42fbab87fcd05a2323759f1d0",
    "feat_standardize" -> "fa529518bebc36b916785ccebb7c1538",
    "split_leakage_audit" -> "20121de54119c13f40ba931d722ed590",
    "dq_benford" -> "75bcd77fd449a331ac77a57733c26bd7",
    "q_dod_growth" -> "846758ee68e601137e33677e4f47d96e",
    "q_cumulative_users" -> "6e349bb2ce0c8fe263f634b727018e92",
    // identical to round-2's asof_join pin — the strategy-tier exec
    // reproduces the window form bit-for-bit
    "asof_join_bcast" -> "d46f154514ca44380d1956436d37743d",
    // identical to round-3's asof_join_fwd pin — forward direction too
    "asof_join_bcast_fwd" -> "f2795cb7dcab4a12878dbaec9f4f1249",
    "quality_winsorized" -> "c627fb69141ef8da36ffde4935bde435",
    "eval_cohens_kappa" -> "5a83701c3445af15ab300a49c68eeff6",
    "text_token_gini" -> "dc6a40449c95e7a17ab123ba191844b7")

  test("round-4 second-session operator outputs hash-match their pinned golden values") {
    val got = pinnedR4b.keys.toSeq.sorted.map { q =>
      val h = canonicalHash(SparkEntry.queries(q)(spark, sfDir))
      info(s""""$q" -> "$h",""")
      q -> h
    }
    graft.operators.Caches.release()
    got.foreach { case (q, h) =>
      assert(h == pinnedR4b(q), s"$q output drifted (got $h)")
    }
  }

  private val pinnedR5 = Map(
    "ann_sq8_ivf_topk" -> "d7b12dfe129cc68dd2bd28220b3505f7",
    "basket_pair_lift" -> "27ca3aee721b78e8e52c230da8b16e05",
    "emb_drift_report" -> "ce392268bf99bcf0122e7ebb269b1b37",
    "emb_sq8_codes" -> "221022213b152f734461b0475506f195",
    "events_attribution" -> "4795c250a1885e1a005da01c79dee98e",
    "events_funnel" -> "c282cabbd645331efba4a55f0df4f265",
    "events_props_sum" -> "29202a85084c4aabf77bde9e3ea9ff3a",
    "events_retention" -> "939716135802521353682fe905fc1024",
    "incr_agg_read_rewrite" -> "620e5a04660d9a42d91c36dc40d05ea3",
    "layout_compaction_plan" -> "9302ec44f1ce87650c69cf038f94382b",
    "q5_region_revenue" -> "bd2dfd647306117f60a70f2b32701d85",
    "q9_profit_nation_year" -> "f9f8b0c3c060b8d2e6f3855ce8b1eb9f",
    "search_mmr_exact_pool" -> "0356f7d680500c53e2befd6e397132e8",
    "seq_rolling_spikes" -> "0c2bf145de43ef67ac9805037395c635",
    "stat_chi2_cells" -> "3670ec2c86d82a27c1824f5b66f76daa",
    "text_token_fertility" -> "31ebdedbbd376f7251bdd069274d8952",
    "events_wau" -> "3eca7f1a732138876017dcce70fb4880",
    "seq_ohlc" -> "4bc13e1558531ad0db4e6ea35f3a7e2f",
    "seq_twap" -> "8b9cc1b903280ef207edf8e324fd37a1",
    "dq_scd2_intervals" -> "23dd95afae5574953ce989343b4d3d03",
    "ab_conversion_report" -> "af4279f35e919ad17ddc42a32ea0cb6f",
    "ab_ztest" -> "bce8294af85b674ba31932eeb272ab73",
    "funnel_latency" -> "ea6633ec75eb8a25cc739ee21c8b99a9",
    "events_top_paths" -> "55e3a1f76113d8f04d6834276e9f881f",
    "pareto_abc" -> "9d108efb0fddcdff9173165aca1de033",
    "seg_rfm" -> "341a40fdd0d0a7314a11b5c4a6c3d065",
    "dq_freshness" -> "6f8f2e96ad0d47370145270610cc6977",
    "events_stickiness" -> "900f9eff867740214f02d32ba941bae5",
    "ann_filtered_brute" -> "5fd733bb06af2d63c96685fbc58e2529",
    "ann_filtered_ivf" -> "78154e21250d46305294e75905fccca8",
    "q_yoy_growth" -> "791b2382748981721939ff8f324585eb",
    "events_error_rate" -> "a5923c44efd66e546bff4eb80472f1cd",
    "orders_cohort_ltv" -> "ffb3cb7cf270a4d83cbdaa6d6437706e",
    "q_market_share" -> "1de308bbb23ab6c8db354c3ce86a42f6",
    "dq_quarantine" -> "547dbc849742dd66f47d19b740ebb322",
    "dp_randomized_response" -> "2701889ee20e4ad11bd8159721d0a23f",
    "q_skyline_2d" -> "8898b6f23a803fc37796a9b08e0e92e9",
    "events_bounce_rate" -> "195b53726f0f93faa4f758d4555d0cb6",
    "orders_reorder_gap" -> "353a42b5d6b8cab415197d47f7b2b0cf",
    "ab_cuped" -> "c239babe4d6e88b790987165927f84b2",
    "seq_seasonal_naive" -> "96b905019ecc6dacc5574d235c19aa3f",
    "events_attribution_linear" -> "5bcd4def2c2b319544b29da4cdb907e5",
    "q7_nation_trade" -> "7434dc48b2dc5650c6e0ec4cfd33327e",
    "q_supplier_hhi" -> "0e07eb037a92f80dac6dbeb5e6d0dcbe",
    "events_session_duration" -> "2cde6dbcd84bed85f66b2d7d8fe3a250",
    "events_path_conversion" -> "f1752280e6625cda68c022619645cdda",
    "q13_custdist" -> "bfdb074cd77d5dae340c56020411ae2b",
    "q14_promo_share" -> "27a35ecdefc564fcae183221e3e5dde9",
    "q2_min_cost_supp" -> "e3f3b6a594eaf793c69e0573deb3f490",
    "q11_important_stock" -> "5da27b5464d0249e406bafcf918c7b35",
    "q20_excess_stock" -> "02772784ba0de6f966c21aa51f5cebae",
    "q15_top_supplier" -> "ad3afae04a8cfa5c2bccb7974562f772",
    "q17_small_qty" -> "4bcf35dd7ac6a9537772f9df4693bb3b",
    "q16_supplier_cnt" -> "18937df96536446289f157bed4a7d14f",
    "q18_large_orders" -> "7ddaad964b7fd4891337fc01b4b03cf7",
    "q19_disjunctive" -> "af08a6de1c7961d4635127f87f6fffc2",
    "q22_idle_rich" -> "e6ab248bdc5b76b6c7ebe2788c46fef6",
    "pipeline_kpi_daily" -> "82c6847a1fee21f1b375ad72088e2837",
    "graph_components" -> "bd837d169d499d73c47384190569f70d",
    // identical to events_wau's pin BY DESIGN: the seed+delta fold
    // reproduces the full recompute bit-for-bit
    "incr_wau_maintain" -> "3eca7f1a732138876017dcce70fb4880",
    "q4_priority_late" -> "34ecda476100daabd2bf7bf8bbd47422",
    "q21_sole_blame" -> "d3de5c86fe742aa31979ad0efb2a734a",
    "funnel_bounded" -> "cbab26af1eb06d182e7eb88ba0c55123",
    "q10_returned" -> "31be5f653802e957cbc279c26d4268e2",
    "events_heatmap" -> "378f6a926489f0f0e58a363fa15d8704",
    "orders_seasonality" -> "42669b9360e4ad411adc0dfbd0549c03",
    "user_ltv_percentiles" -> "aa6ea91eed87ae3c2cca63c0f19274f2",
    "events_new_vs_returning" -> "5c9e05158765bb872d0a2ec59f05ee06")

  test("round-5 operator outputs hash-match their pinned golden values") {
    val got = pinnedR5.keys.toSeq.sorted.map { q =>
      val h = canonicalHash(SparkEntry.queries(q)(spark, sfDir))
      info(s""""$q" -> "$h",""")
      q -> h
    }
    graft.operators.Caches.release()
    got.foreach { case (q, h) =>
      assert(h == pinnedR5(q), s"$q output drifted (got $h)")
    }
  }
}
