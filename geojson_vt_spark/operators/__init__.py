from .dedup import (cosine_col, embedding_near_dup_pairs, exact_dedup,
                    minhash_dedup, minhash_lsh_pairs, near_dup_clusters,
                    ngram_jaccard_pairs, shingles_col, simhash_col,
                    simhash_pairs)
from .graph import host_edges_from_docs, pagerank_df
from .search import bm25_topk_df
from .sessions import session_stats_df, sessionize_df
from .similarity import (cosine_topk, ivf_assign, ivf_fit,
                         ivf_index, ivf_topk, lsh_topk, semdedup_df)
from .spatial_join import (knn_join, point_in_polygon_join, points_in_ring,
                           raster_vector_overlay)
from .temporal import asof_join_df, range_join_df
from .webgraph import (extract_links_df, extract_title_df,
                       host_link_graph_df, host_pagerank_df)
from .text import (bpe_ish_token_count_col, fingerprint_df, lang_id_df,
                   quality_score_df, token_count_col, winnow_fingerprints_df)
from .webtext import (canonicalize_url_col, decontaminate_df,
                      domain_cap_df, latest_capture_df,
                      mixture_sample_df,
                      pack_sequences_df, quality_classifier_df,
                      repetition_stats_df, split_df,
                      substring_dedup_df, tfidf_topk_df, url_dedup,
                      word_ngrams_col)

__all__ = [
    "bpe_ish_token_count_col", "cosine_col", "cosine_topk",
    "embedding_near_dup_pairs", "exact_dedup", "fingerprint_df",
    "ivf_assign", "ivf_fit", "ivf_index", "ivf_topk",
    "knn_join", "lang_id_df", "lsh_topk", "minhash_dedup",
    "minhash_lsh_pairs", "near_dup_clusters", "ngram_jaccard_pairs",
    "point_in_polygon_join",
    "points_in_ring", "quality_score_df", "raster_vector_overlay",
    "shingles_col", "simhash_col", "simhash_pairs", "token_count_col",
    "winnow_fingerprints_df",
    "bm25_topk_df", "session_stats_df", "sessionize_df",
    "canonicalize_url_col", "decontaminate_df", "domain_cap_df",
    "mixture_sample_df", "pack_sequences_df", "quality_classifier_df",
    "repetition_stats_df", "split_df", "substring_dedup_df",
    "latest_capture_df", "tfidf_topk_df", "url_dedup", "word_ngrams_col",
    "host_edges_from_docs", "pagerank_df", "semdedup_df",
    "asof_join_df", "range_join_df",
    "extract_links_df", "extract_title_df", "host_link_graph_df",
    "host_pagerank_df",
]
