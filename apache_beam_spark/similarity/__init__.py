from apache_beam_spark.similarity.knn import brute_force_topk, lsh_topk, embedding_near_dup_pairs

__all__ = ["brute_force_topk", "lsh_topk", "embedding_near_dup_pairs"]
