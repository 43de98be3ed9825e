"""Large-scale training-data pipeline operators.

Beyond the reference's surface (which is pure time-series), these are the
operations a 100 TB corpus pipeline needs: deduplication (exact, MinHash/
LSH, SimHash, n-gram Jaccard), similarity search over embeddings, text
quality analysis, and multimodal column plumbing.
"""

from rrdtool_1_x_spark.datapipe.bpe import (  # noqa: F401
    bpe_encode,
    merges_frame,
    train_bpe,
)
from rrdtool_1_x_spark.datapipe.clean import (  # noqa: F401
    append_line_dedup,
    c4_line_filter,
    extract_html_text,
    line_dedup,
    write_line_index,
)
from rrdtool_1_x_spark.datapipe.dedup import (  # noqa: F401
    duplicated_ngram_spans,
    edit_near_duplicates,
    exact_dedup,
    remove_duplicate_spans,
    minhash_signatures,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash,
)
from rrdtool_1_x_spark.datapipe.layout import (  # noqa: F401
    rowgroup_hit_fraction,
    write_zorder_layout,
    zorder_bucket,
    zorder_expr,
)
from rrdtool_1_x_spark.datapipe.similarity import (  # noqa: F401
    brute_force_topk,
    cosine_similarity_col,
    hashed_embedding,
    lsh_bucketed_topk,
    quantize_embeddings,
    quantized_topk,
    semantic_deduplicate,
)
from rrdtool_1_x_spark.datapipe.textstats import (  # noqa: F401
    bpe_token_stats,
    language_scores,
    quality_metrics,
    token_stats,
)
