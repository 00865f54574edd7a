package graft

/** Golden-hash regression pins for every registered query the driver
  * can only rows-check (no DuckDB oracle). All 18 are deterministic by
  * construction — seeded LSH planes, fixed IVF/PQ sampling, FNV stub
  * decoders, content-hash sampling — so their exact output at sf0.001
  * is pinned here. A hash flip means a BEHAVIOR change: explain it,
  * then re-pin with `sbt 'Test/runMain graft.GoldenHashGen'`.
  */
class GoldenHashSpec extends SparkSpec {

  private val expected = Map(
    "agg_approx_distinct" -> "cbfd2bc22b0b1dff7524b80bb5580be3",
    "agg_hll_sketch" -> "525397935456c52f1c46a90eb6ea9d33",
    "dedup_incremental_batch" -> "d77b2c27c5d75e90ecc667645889569c",
    "emb_logreg_eval" -> "6853b1063ee39df1dfabf3ab6608ff0a",
    "emb_logreg_calibration" -> "483fc8d0e382858efe258d3c071751ab",
    "emb_mahalanobis_outliers" -> "e389c05f1add6ed0e7c9ddec3faf1749",
    "emb_kmeans_stats" -> "e8fb344a308aa32b1ee268f822d6cd38",
    "emb_pca_variance" -> "5a1f4bca8fef27d7defe34f71cf38095",
    "text_bpe_encode" -> "a6309a3d305f9717ebdd7563711d4a1f",
    "text_bpe_vocab" -> "bd4a2a3bcf8fcbb396d1e010b95afd05",
    "text_ulm_encode" -> "afa98d2bdb4d88ddc90758543230202f",
    "text_ulm_vocab" -> "f51349e0a16d43db2d4d313d8ee3675a",
    "text_wordpiece_encode" -> "f6bb3df64df1f420682d0c66b4340606",
    "text_wordpiece_vocab" -> "220d857d5c8a5ce9c098de19dcc65442",
    "dedup_minhash_lsh" -> "43b0854b6e50afe8ced0516d135f83e4",
    "dedup_lsh_quality" -> "86cdef9e1488c5f49c73dc9d90b72328",
    "dedup_semantic" -> "a60e4c40f2dae28e673b857707dcbde1",
    "dedup_simhash" -> "0e382879f002a691192647cfae2e5bf2",
    "multimodal_dhash_pairs" -> "12875c26c84f1ca9b47670ea49d96fce",
    "multimodal_phash_pairs" -> "cde470c1d1ec6643c68c15d38d2f05e3",
    "multimodal_audio_match" -> "addc0b91abca17e9663ef80cc1552b7b",
    "multimodal_features" -> "969a4d8ace527df432eafb21453c706f",
    "pipeline_corpus_funnel" -> "aa40b96bb3b11e51d1ea5dd879264548",
    "pipeline_keywords_v2_topk" -> "6b921c7d188b6c6c51175481cf05257f",
    "pipeline_pubmed_golden_v1" -> "04fb954481c2e40e6c7956d429608712",
    "sample_weighted" -> "9e7a9649cf54bb730cf5b20d136166b1",
    "sim_ann_recall" -> "5058dcccb093298c56b67839be9e00d3",
    "sim_ann_ivf_topk" -> "02e54421e21c2b3b5b88a2bd4836c225",
    "sim_ann_lsh_topk" -> "619f08f55d6d3d8122e642f1b23a9e63",
    "sim_ann_pq_topk" -> "bda96752fe46b512b19f0d86e8064f3e",
    "sim_ann_sq_topk" -> "2c1f8c65a58d594d46e81abca1fe0a2c",
    "sim_cosine_dup_pairs" -> "80e4f96d247041563d0f7a26bfeb07ae",
    "sim_mmr_topk" -> "9fd9c278ac7896919f4198731cf9a88d",
    "text_fingerprint_pairs" -> "c8c3294a5c21e4ce69cdce38e84aee10",
    "text_langid" -> "7f2e326d1bed50856ab3969e1f4bb37e")

  test("every no_oracle query is hash-pinned (and nothing stale)") {
    assert(GoldenHash.noOracleQueries.toSet == expected.keySet,
      s"unpinned: ${GoldenHash.noOracleQueries.toSet -- expected.keySet}; " +
        s"stale pins: ${expected.keySet -- GoldenHash.noOracleQueries.toSet}")
  }

  expected.toSeq.sortBy(_._1).foreach { case (name, want) =>
    test(s"golden hash: $name") {
      val got = GoldenHash.of(spark, name, sfDir)
      assert(got == want,
        s"$name output changed (got $got, pinned $want). A rows-only " +
          "driver check cannot catch this — if intentional, justify " +
          "and re-pin via GoldenHashGen.")
    }
  }
}
