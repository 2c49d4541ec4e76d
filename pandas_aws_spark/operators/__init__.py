"""North-star extension operators (SURVEY.md §2.9): deduplication,
similarity search, text analysis, multimodal columns, sketches,
skew-mitigation, sampling, trained classifiers."""

from .dedup import (  # noqa: F401
    blocked_ngram_jaccard_pairs,
    connected_components,
    doc_shingle_hashes,
    exact_dedup,
    exact_dedup_survivors,
    minhash_near_dup_pairs,
    simhash_near_dup_pairs,
)
from .langmodel import classify_by_trigrams, train_trigram_model  # noqa: F401
from .multimodal import extract_byte_features, with_binary_payload  # noqa: F401
from .sampling import hash_split, stratified_hash_sample  # noqa: F401
from .similarity import (  # noqa: F401
    brute_force_topk,
    brute_force_topk_arrow,
    ivf_topk,
    lsh_topk,
    lsh_topk_multiprobe,
)
from .sketch import cms_build, cms_estimate  # noqa: F401
from .skew import salted_join, two_phase_count_distinct  # noqa: F401
from .text import (  # noqa: F401
    fingerprint,
    lang_id,
    pack_documents,
    quality_score,
    quality_score_udf,
    token_stats,
)
