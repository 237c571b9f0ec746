from .ann_shard import ann_topk_gemm
from .asof_join import asof_join
from .bloom import bloom_semi_join
from .bpe import encode_bpe, train_bpe
from .components import connected_components, dedup_by_components
from .contamination import contamination_matrix
from .dedup import (
    exact_dedup,
    minhash_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_containment_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
    with_shingles,
)
from .fuzzy_join import edit_distance_join
from .grouped import whiten_per_group
from .interval_join import interval_overlap_join
from .heavy import top_k_sketch
from .ivf import ivf_topk, kmeans_centroids
from .knn import knn_graph
from .pagerank import pagerank
from .pca import pca_fit, pca_project
from .pq import pq_topk, pq_train
from .ranking import global_running_sum, ntile_expr, with_global_rank
from .scd import scd2_build
from .scoped import storage_scope
from .sharding import assign_training_shards, compact_parquet, write_training_shards
from .similarity import cosine_pairs, cosine_topk, rp_lsh_topk, rp_signature
from .skew import salted_join
from .topk import top_k, top_k_per_group
from .upsert import cdc_apply, merge_upsert
from .zorder import zorder_write, zvalue, zvalue_sql

__all__ = [
    "ann_topk_gemm",
    "asof_join",
    "assign_training_shards",
    "compact_parquet",
    "write_training_shards",
    "bloom_semi_join",
    "cdc_apply",
    "connected_components",
    "contamination_matrix",
    "cosine_pairs",
    "cosine_topk",
    "dedup_by_components",
    "edit_distance_join",
    "encode_bpe",
    "exact_dedup",
    "global_running_sum",
    "interval_overlap_join",
    "ivf_topk",
    "knn_graph",
    "kmeans_centroids",
    "merge_upsert",
    "minhash_dedup",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_containment_pairs",
    "ngram_jaccard_pairs",
    "ntile_expr",
    "pagerank",
    "pca_fit",
    "pca_project",
    "pq_topk",
    "pq_train",
    "rp_lsh_topk",
    "rp_signature",
    "salted_join",
    "scd2_build",
    "simhash",
    "simhash_pairs",
    "storage_scope",
    "top_k",
    "top_k_per_group",
    "top_k_sketch",
    "train_bpe",
    "whiten_per_group",
    "with_global_rank",
    "with_shingles",
    "zorder_write",
    "zvalue",
    "zvalue_sql",
]
