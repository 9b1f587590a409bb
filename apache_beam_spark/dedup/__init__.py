from apache_beam_spark.dedup.exact import exact_dedup, fingerprint_dedup
from apache_beam_spark.dedup.minhash import minhash_signature, minhash_lsh_dedup, minhash_lsh_pairs
from apache_beam_spark.dedup.simhash import simhash, simhash_dedup
from apache_beam_spark.dedup.ngram import ngram_containment_pairs, ngram_jaccard_pairs
from apache_beam_spark.dedup.decontaminate import decontaminate
from apache_beam_spark.dedup.components import (
    connected_components,
    connected_components_auto,
    connected_components_two_phase,
    dup_clusters,
)

__all__ = [
    "exact_dedup", "fingerprint_dedup",
    "minhash_signature", "minhash_lsh_dedup", "minhash_lsh_pairs",
    "simhash", "simhash_dedup", "ngram_jaccard_pairs",
    "ngram_containment_pairs", "decontaminate",
    "connected_components", "connected_components_auto",
    "connected_components_two_phase", "dup_clusters",
]
