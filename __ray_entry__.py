"""Driver contract for the graft builder (Ray Data target).

entry()      — flagship spatial-join pipeline at sf0.001 (smoke).
queries()    — engine pipelines, one per implemented operator
               (spapy_ray.pipelines.queries).
oracle_sql() — DuckDB twins (spapy_ray.oracle); every spatial input
               (pages, zones) is reconstructed arithmetically in SQL,
               so even the synthetic-input queries get full
               value-hash checks.

Ray is initialised by the driver BEFORE this module is imported; no
ray.init()/ray.shutdown() here or anywhere in spapy_ray.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from spapy_ray.pipelines.flagship import flagship_join

    return flagship_join("/root/testdata/sf0.001")


# the driver hashes only the first 50 queries() entries per round.
# Round-5 rotation (VERDICT r4 item 3, strict oldest-first): the
# round-5 NEW/changed-path queries lead (new registrations +
# the two join-mode graph pins + the four ADVICE-touched paths),
# then never-driver-verified rows in registry order — everything in
# this window is absent from the r1-r4 CORRECTNESS union except the
# changed-path promotions.
_FRONT = [
    # --- round-5 new or changed-path ---
    "pip_join_cells",      # NEW: co-partitioned spatial join (salt=4)
    "media_decode",        # NEW: real PNG decode under the hash
    "media_resize",        # NEW: decode->resize->encode->decode
    "audio_decode",        # NEW: real WAV PCM decode under the hash
    "audio_decimate",      # NEW: decode->decimate->encode->decode
    "video_frames",        # NEW: real APNG frame sampling
    "tif_rgb_roundtrip",   # NEW: chunky multi-sample TIFF
    "tif_big_roundtrip",   # NEW: BigTIFF container
    "gpkg_roundtrip",      # NEW: OGC GeoPackage container
    "gpkg_tiles_roundtrip",  # NEW: gpkg TILES pyramid
    "geoparquet_roundtrip",  # NEW: GeoParquet metadata
    "img_roundtrip",       # NEW: native Erdas HFA round-trip
    "graph_pagerank",      # CHANGED: mode="join" pinned (span-pinned)
    "cust_hits",           # CHANGED: scores-as-Dataset join mode
    "stay_points",         # CHANGED: dwell = reduceat max-min
    "lineitem_moments",    # CHANGED: sum-bound overflow tracker
    "best_split",          # CHANGED: bigint gini path gate
    "orders_gini",         # never-verified + gini-fold adjacent
    "priority_gini",       # never-verified + gini-fold adjacent
    # --- never driver-verified, registry order ---
    "price_qty_grid", "events_ohlc", "rolling_users",
    "nation_revenue_share", "source_mode_lang", "jsonl_roundtrip",
    "csv_roundtrip", "hive_partition_roundtrip", "embed_dim_stats",
    "lineitem_profile", "event_gap_hist", "weighted_price_quartiles",
    "revenue_total_128", "user_last_event", "events_trimmed_mean",
    "events_dow_hour", "shipping_delay_iqr", "text_freq_of_freqs",
    "user_type_hhi", "bounce_rate", "nation_year_flag_rollup",
    "events_centered", "value_drift", "jaccard_pairs",
    "embed_near_dup", "embed_near_dup_lsh", "voronoi_sites",
    "kde_heatmap", "flow_direction", "focal_majority",
    "dbscan_clusters", "idw_raster", "proximity_grid", "domain_caps",
    "shp_stream_roundtrip", "tif_lzw_roundtrip", "raster_moran",
    "seq_packing", "vocab_ids",
    # --- beyond the window: rotation queue, still oldest-first ---
    "docs_stop_strip", "lineitem_regr", "raster_variogram",
    "areal_interp", "events_interp", "resample_bilinear",
    "events_percent_rank", "cust_assortativity", "domain_cm",
    "price_wmedian", "orders_benford", "events_mwu",
]
# Session-8 additions (raster_moran .. events_mwu) register after the
# _FRONT list by construction and join the round-5 rotation queue —
# each was value-hash-verified at sf0.001 AND sf0.01 via
# tools/check_correctness.py in the session that added it.


def queries() -> dict[str, Callable[[str], Any]]:
    from spapy_ray.pipelines.queries import QUERIES

    q = dict(QUERIES)
    out = {k: q[k] for k in _FRONT if k in q}
    out.update((k, v) for k, v in q.items() if k not in out)
    return out


def oracle_sql() -> dict[str, str]:
    from spapy_ray import oracle as o

    return {
        "pages": o.q_pages(),
        "geocode": o.q_geocode(),
        "cell_index": o.q_cell_index(),
        "pip_join": o.q_pip_join(),
        "pip_join_cells": o.q_pip_join_cells(),
        "media_decode": o.q_media_decode(),
        "media_resize": o.q_media_resize(),
        "audio_decode": o.q_audio_decode(),
        "audio_decimate": o.q_audio_decimate(),
        "video_frames": o.q_video_frames(),
        "tif_rgb_roundtrip": o.q_tif_rgb_roundtrip(),
        # 64-bit container, same DEM pixel twin
        "tif_big_roundtrip": o.q_tif_roundtrip(),
        # gpkg blob wraps WKB byte-exactly: same twin as shp
        "gpkg_roundtrip": o.q_zone_bounds_area(),
        # PNG-decode of the container blobs re-derives the
        # render channel sums: same CASE twin
        "gpkg_tiles_roundtrip": o.q_render_tiles(),
        "geoparquet_roundtrip": o.q_zone_bounds_area(),
        "zone_page_counts": o.q_zone_page_counts(),
        "top_zones": o.q_top_zones(),
        "tile_counts": o.q_tile_counts(),
        "dedup_pages": o.q_dedup_pages(),
        "knn_zones": o.q_knn_zones(),
        "knn_zones_cells": o.q_knn_zones_cells(),
        "zone_bounds_area": o.q_zone_bounds_area(),
        "select_zones": o.q_select_zones(),
        "lineitem_pricing": o.q_lineitem_pricing(),
        "events_by_type": o.q_events_by_type(),
        "docs_token_stats": o.q_docs_token_stats(),
        "docs_dedup_text": o.q_docs_dedup_text(),
        "suppliers_per_nation": o.q_suppliers_per_nation(),
        "ann_topk": o.q_ann_topk(),
        "zonal_stats": o.q_zonal_stats(),
        "raster_histogram": o.q_raster_histogram(),
        "raster_minmax": o.q_raster_minmax(),
        "raster_diff_stats": o.q_raster_diff_stats(),
        "split_zones": o.q_split_zones(),
        "buffer_zone_bounds": o.q_buffer_zone_bounds(),
        "project_equirect": o.q_project_equirect(),
        "dedup_first_rows": o.q_dedup_first_rows(),
        "events_hourly": o.q_events_hourly(),
        "docs_lang_guess": o.q_docs_lang_guess(),
        "reclassify_hist": o.q_reclassify_hist(),
        "raster_crop_minmax": o.q_raster_crop_minmax(),
        "minhash_sigs": o.q_minhash_sigs(),
        "simhash_docs": o.q_simhash_docs(),
        "embed_top_pairs": o.q_embed_top_pairs(),
        "near_dup_docs": o.q_near_dup_docs(),
        "events_sessions": o.q_events_sessions(),
        "events_sliding": o.q_events_sliding(),
        "events_asof": o.q_events_asof(),
        "events_campaigns": o.q_events_campaigns(),
        "media_probe": o.q_media_probe(),
        "events_props": o.q_events_props(),
        "hull_areas": o.q_hull_areas(),
        "relate_flags": o.q_relate_flags(),
        "simplify_areas": o.q_simplify_areas(),
        "warp_equirect": o.q_warp_equirect(),
        "docs_rolling_fp": o.q_docs_rolling_fp(),
        "text_invariant": o.q_text_invariant(),
        "overlay_box_areas": o.q_overlay_box_areas(),
        "overlay_holes_areas": o.q_overlay_holes_areas(),
        "revenue_by_nation": o.q_revenue_by_nation(),
        "zone_centroids": o.q_zone_centroids(),
        "hillshade_stats": o.q_hillshade_stats(),
        "contour_lines": o.q_contour_lines(),
        "polygonize_components": o.q_polygonize_components(),
        "polygonize_polygons": o.q_polygonize_polygons(),
        "densify_counts": o.q_densify_counts(),
        "clip_zones": o.q_clip_zones(),
        "resample_nearest": o.q_resample_nearest(),
        "dataset_bounds": o.q_dataset_bounds(),
        "terrain_stats": o.q_terrain_stats(),
        "docs_quality": o.q_docs_quality(),
        # IVF with n_probe == n_clusters prunes nothing → must equal
        # the exact top-k; reusing the exact twin value-hashes the
        # whole IVF machinery
        "ann_topk_ivf": o.q_ann_topk(),
        # .shp/.dbf round-trip is lossless for float64 coords + typed
        # attrs; bounds/area of the reloaded layer == computing them
        # on the original zones, i.e. the zone_bounds_area twin
        "shp_roundtrip": o.q_zone_bounds_area(),
        "geojson_roundtrip": o.q_zone_bounds_area(),
        "render_tiles": o.q_render_tiles(),
        "tile_pyramid": o.q_tile_pyramid(),
        "raster_overviews": o.q_raster_overviews(),
        "sample_stratified": o.q_sample_stratified(),
        "rasterize_points": o.q_rasterize_points(),
        "raster_integral": o.q_raster_integral(),
        "raster_dt": o.q_raster_dt(),
        "raster_horizon": o.q_raster_horizon(),
        "line_of_sight": o.q_line_of_sight(),
        "events_ewma": o.q_events_ewma(),
        "promo_revenue_share": o.q_promo_revenue_share(),
        "large_orders": o.q_large_orders(),
        "docs_cosine_pairs": o.q_docs_cosine_pairs(),
        "docs_readability": o.q_docs_readability(),
        "cust_shortest_paths": o.q_cust_shortest_paths(),
        "events_autocorr": o.q_events_autocorr(),
        "media_chunk_dedup": o.q_media_chunk_dedup(),
        "zone_dispersion": o.q_zone_dispersion(),
        "raster_mosaic": o.q_raster_mosaic(),
        "rasterize_edges": o.q_rasterize_edges(),
        "importance_sample": o.q_importance_sample(),
        "raster_trend": o.q_raster_trend(),
        "events_dense_rank": o.q_events_dense_rank(),
        "raster_morphology": o.q_raster_morphology(),
        "cost_distance": o.q_cost_distance(),
        "zonal_argmax": o.q_zonal_argmax(),
        "raster_nodata_stats": o.q_raster_nodata_stats(),
        "user_overlap_sketch": o.q_user_overlap_sketch(),
        "corpus_prep": o.q_corpus_prep(),
        "embed_gram": o.q_embed_gram(),
        "frequent_triples": o.q_frequent_triples(),
        "domain_stats": o.q_domain_stats(),
        "bpe_tokens": o.q_bpe_tokens(),
        "docs_repetition": o.q_docs_repetition(),
        "resample_match_diff": o.q_resample_match_diff(),
        "orders_lineitem_join": o.q_orders_lineitem_join(),
        "customers_without_orders": o.q_customers_without_orders(),
        "events_windows": o.q_events_windows(),
        "order_priority_revenue": o.q_order_priority_revenue(),
        "customer_order_balance": o.q_customer_order_balance(),
        "hh_domains": o.q_hh_domains(),
        "label_centroids": o.q_label_centroids(),
        "cross_corpus_knn": o.q_cross_corpus_knn(),
        "contamination_pairs": o.q_contamination_pairs(),
        "price_quantile_sketch": o.q_price_quantile_sketch(),
        "docs_pii_scrub": o.q_docs_pii_scrub(),
        "dist_join_pairs": o.q_dist_join_pairs(),
        "events_rolling": o.q_events_rolling(),
        "domain_caps": o.q_domain_caps(),
        "raster_math_stats": o.q_raster_math_stats(),
        "asc_roundtrip": o.q_asc_roundtrip(),
        "tif_roundtrip": o.q_tif_roundtrip(),
        # same DEM/grid as tif_roundtrip — the .img container is the
        # engine-side difference, the pixel twin is identical
        "img_roundtrip": o.q_tif_roundtrip(),
        "dedup_clusters": o.q_dedup_clusters(),
        # the streaming .shx-indexed reader and the LZW codec are
        # lossless paths over the same payloads — they share the
        # originals' closed-form twins
        "shp_stream_roundtrip": o.q_zone_bounds_area(),
        "tif_lzw_roundtrip": o.q_tif_roundtrip(),
        "quality_filter": o.q_quality_filter(),
        "dist_join_counts": o.q_dist_join_counts(),
        "dbscan_clusters": o.q_dbscan_clusters(),
        "idw_raster": o.q_idw_raster(),
        "proximity_grid": o.q_proximity_grid(),
        "voronoi_sites": o.q_voronoi_sites(),
        "flow_direction": o.q_flow_direction(),
        "focal_majority": o.q_focal_majority(),
        "kde_heatmap": o.q_kde_heatmap(),
        "jaccard_pairs": o.q_jaccard_pairs(),
        "embed_near_dup": o.q_embed_near_dup(),
        "embed_near_dup_lsh": o.q_embed_near_dup_lsh(),
        "semi_pages": o.q_semi_pages(),
        "anti_pages": o.q_semi_pages(anti=True),
        "events_quantiles": o.q_events_quantiles(),
        "events_distinct_users": o.q_events_distinct_users(),
        "zone_top_pages": o.q_zone_top_pages(),
        "sample_pages": o.q_sample_pages(),
        "docs_bigrams": o.q_docs_bigrams(),
        "overlay_grid": o.q_overlay_grid(),
        "ngram_overlap": o.q_ngram_overlap(),
        "tfidf_terms": o.q_tfidf_terms(),
        "graph_pagerank": o.q_graph_pagerank(),
        "watershed": o.q_watershed(),
        "flow_accumulation": o.q_flow_accumulation(),
        "dissolve_area": o.q_dissolve_area(),
        "events_funnel": o.q_events_funnel(),
        "events_retention": o.q_events_retention(),
        "join_counts": o.q_join_counts(),
        "docs_surprisal": o.q_docs_surprisal(),
        "raster_equalize": o.q_raster_equalize(),
        "zonal_majority": o.q_zonal_majority(),
        "embed_projection": o.q_embed_projection(),
        "customers_bloom_anti": o.q_customers_without_orders(),
        "dataset_split": o.q_dataset_split(),
        "events_median": o.q_events_median(),
        "raster_stretch": o.q_raster_stretch(),
        "events_outliers": o.q_events_outliers(),
        "events_asof_fwd": o.q_events_asof_fwd(),
        "bigram_pmi": o.q_bigram_pmi(),
        "flow_length": o.q_flow_length(),
        "events_transitions": o.q_events_transitions(),
        "late_shipments": o.q_late_shipments(),
        "returned_customers": o.q_returned_customers(),
        "nation_year_rollup": o.q_nation_year_rollup(),
        "table_checksum": o.q_table_checksum(),
        "nation_year_cube": o.q_nation_year_cube(),
        "events_pivot": o.q_events_pivot(),
        "part_flag_balance": o.q_part_flag_balance(),
        "lineitem_corr": o.q_lineitem_corr(),
        "events_iqr": o.q_events_iqr(),
        "fuzzy_names": o.q_fuzzy_names(),
        "cust_triangles": o.q_cust_triangles(),
        "embed_quantize": o.q_embed_quantize(),
        "view_purchase_overlap": o.q_view_purchase_overlap(),
        "user_last_event": o.q_user_last_event(),
        "priority_flag_chi2": o.q_priority_flag_chi2(),
        "part_skyline": o.q_part_skyline(),
        "price_deciles": o.q_price_deciles(),
        "price_qty_grid": o.q_price_qty_grid(),
        "events_ohlc": o.q_events_ohlc(),
        "rolling_users": o.q_rolling_users(),
        "purchase_attribution": o.q_purchase_attribution(),
        "nation_revenue_share": o.q_nation_revenue_share(),
        "source_mode_lang": o.q_source_mode_lang(),
        # JSONL round-trip is lossless -> same fingerprint as the
        # parquet-side checksum twin
        "jsonl_roundtrip": o.q_table_checksum(),
        "embed_dim_stats": o.q_embed_dim_stats(),
        "lineitem_profile": o.q_lineitem_profile(),
        "orderkey_islands": o.q_orderkey_islands(),
        "user_twap": o.q_user_twap(),
        "event_gap_hist": o.q_event_gap_hist(),
        "copurchase_pairs": o.q_copurchase_pairs(),
        "weighted_price_quartiles": o.q_weighted_price_quartiles(),
        "snapshot_diff": o.q_snapshot_diff(),
        "top_paths": o.q_top_paths(),
        "revenue_total_128": o.q_revenue_total_128(),
        "events_trimmed_mean": o.q_events_trimmed_mean(),
        "events_dow_hour": o.q_events_dow_hour(),
        "shipping_delay_iqr": o.q_shipping_delay_iqr(),
        "text_freq_of_freqs": o.q_text_freq_of_freqs(),
        "user_type_hhi": o.q_user_type_hhi(),
        "bounce_rate": o.q_bounce_rate(),
        "nation_year_flag_rollup": o.q_nation_year_flag_rollup(),
        "events_centered": o.q_events_centered(),
        "value_drift": o.q_value_drift(),
        "csv_roundtrip": o.q_table_checksum(),
        "hive_partition_roundtrip": o.q_hive_partition_roundtrip(),
        "raster_moran": o.q_raster_moran(),
        "seq_packing": o.q_seq_packing(),
        "vocab_ids": o.q_vocab_ids(),
        "docs_stop_strip": o.q_docs_stop_strip(),
        "lineitem_regr": o.q_lineitem_regr(),
        "raster_variogram": o.q_raster_variogram(),
        "areal_interp": o.q_areal_interp(),
        "events_interp": o.q_events_interp(),
        "resample_bilinear": o.q_resample_bilinear(),
        "events_percent_rank": o.q_events_percent_rank(),
        "cust_assortativity": o.q_cust_assortativity(),
        "domain_cm": o.q_domain_cm(),
        "orders_gini": o.q_orders_gini(),
        "price_wmedian": o.q_price_wmedian(),
        "orders_benford": o.q_orders_benford(),
        "events_mwu": o.q_events_mwu(),
        "docs_merge": o.q_docs_merge(),
        "raster_lisa": o.q_raster_lisa(),
        "geohash_index": o.q_geohash_index(),
        "corpus_overlap": o.q_corpus_overlap(),
        "events_spearman": o.q_events_spearman(),
        "docs_shuffle_order": o.q_docs_shuffle_order(),
        "priority_gini": o.q_priority_gini(),
        "zonal_percentiles": o.q_zonal_percentiles(),
        "events_late": o.q_events_late(),
        "quality_gate": o.q_quality_gate(),
        "k_anonymity": o.q_k_anonymity(),
        "lang_confusion": o.q_lang_confusion(),
        "trending_domains": o.q_trending_domains(),
        "stream_order": o.q_stream_order(),
        "events_rolling_slope": o.q_events_rolling_slope(),
        "label_separation": o.q_label_separation(),
        "cell_smoothing": o.q_cell_smoothing(),
        "orders_mom_growth": o.q_orders_mom_growth(),
        "user_survival": o.q_user_survival(),
        "cust_components": o.q_cust_components(),
        "cust_kcore": o.q_cust_kcore(),
        "raster_geary": o.q_raster_geary(),
        "events_hll": o.q_events_hll(),
        "local_supplier_revenue": o.q_local_supplier_revenue(),
        "ripley_pairs": o.q_ripley_pairs(),
        "focal_median": o.q_focal_median(),
        "media_chunks": o.q_media_chunks(),
        "zone_compactness": o.q_zone_compactness(),
        "open_orders": o.q_open_orders(),
        "events_ntile": o.q_events_ntile(),
        "hilbert_index": o.q_hilbert_index(),
        "quadtree_leaves": o.q_quadtree_leaves(),
        "value_emd": o.q_value_emd(),
        "cross_ripley": o.q_cross_ripley(),
        "forecast_revenue": o.q_forecast_revenue(),
        "events_cusum": o.q_events_cusum(),
        "url_bloom": o.q_url_bloom(),
        "orders_rfm": o.q_orders_rfm(),
        "orders_pareto": o.q_orders_pareto(),
        "docs_winnow": o.q_docs_winnow(),
        "embed_kmeans": o.q_embed_kmeans(),
        "cust_ktruss": o.q_cust_ktruss(),
        "zone_coocc": o.q_zone_coocc(),
        "events_pctl": o.q_events_pctl(),
        "cust_eccentricity": o.q_cust_eccentricity(),
        "decontam_audit": o.q_decontam_audit(),
        "point_pyramid": o.q_point_pyramid(),
        "weekend_drift": o.q_weekend_drift(),
        "cust_reach": o.q_cust_reach(),
        "events_zscore_outliers": o.q_events_zscore_outliers(),
        "vector_tiles": o.q_vector_tiles(),
        "cust_order_histogram": o.q_cust_order_histogram(),
        "small_qty_revenue": o.q_small_qty_revenue(),
        "large_orders": o.q_large_orders(),
        "idle_customers": o.q_idle_customers(),
        "top_supplier": o.q_top_supplier(),
        "promo_share": o.q_promo_share(),
        "late_sole_suppliers": o.q_late_sole_suppliers(),
        "bpe_merges": o.q_bpe_merges(),
        "cust_hits": o.q_cust_hits(),
        "session_overlap_pairs": o.q_session_overlap_pairs(),
        "domain_trajectories": o.q_domain_trajectories(),
        "shipping_priority": o.q_shipping_priority(),
        "late_order_priority": o.q_late_order_priority(),
        "nation_pair_trade": o.q_nation_pair_trade(),
        "market_share": o.q_market_share(),
        "product_profit": o.q_product_profit(),
        "brand_discount_revenue": o.q_brand_discount_revenue(),
        "min_cost_supplier": o.q_min_cost_supplier(),
        "important_parts": o.q_important_parts(),
        "supplier_part_counts": o.q_supplier_part_counts(),
        "promo_suppliers": o.q_promo_suppliers(),
        "best_split": o.q_best_split(),
        "lineitem_moments": o.q_lineitem_moments(),
        "index_search": o.q_index_search(),
        "stay_points": o.q_stay_points(),
        "raster_blur5": o.q_raster_blur5(),
        "l_diversity": o.q_l_diversity(),
        "price_exact_median": o.q_price_exact_median(),
        "domain_mix": o.q_domain_mix(),
        "ngram_diversity": o.q_ngram_diversity(),
        "cust_cohort_ltv": o.q_cust_cohort_ltv(),
        "raster_hist_match": o.q_raster_hist_match(),
        "events_sax": o.q_events_sax(),
        "hotspot_cube": o.q_hotspot_cube(),
        "best_feature": o.q_best_feature(),
        "heading_rose": o.q_heading_rose(),
        "zone_lang_mix": o.q_zone_lang_mix(),
        "events_cume_dist": o.q_events_cume_dist(),
        "cms_hosts": o.q_cms_hosts(),
        "knn_label_vote": o.q_knn_label_vote(),
        "vocab_drift": o.q_vocab_drift(),
        "duplicate_orders": o.q_duplicate_orders(),
        "raster_log5": o.q_raster_log5(),
        "raster_texture5": o.q_raster_texture5(),
        "geo_corpus_prep": o.q_geo_corpus_prep(),
        "events_seasonal_error": o.q_events_seasonal_error(),
        "source_distinct_hll": o.q_source_distinct_hll(),
        "top_hosts_rescore": o.q_top_hosts_rescore(),
        "weighted_doc_sample": o.q_weighted_doc_sample(),
        "events_seasonal_anomaly": o.q_events_seasonal_anomaly(),
        "crawl_politeness": o.q_crawl_politeness(),
        "host_zone_affinity": o.q_host_zone_affinity(),
        "events_runs_test": o.q_events_runs_test(),
        "zone_recency": o.q_zone_recency(),
        "delta_view_merge": o.q_delta_view_merge(),
        "value_qq_table": o.q_value_qq_table(),
        "terrain_rose": o.q_terrain_rose(),
        "events_hour_hhi": o.q_events_hour_hhi(),
        "zone_density": o.q_zone_density(),
    }
