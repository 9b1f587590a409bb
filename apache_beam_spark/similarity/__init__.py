from apache_beam_spark.similarity.knn import brute_force_topk, lsh_topk, embedding_near_dup_pairs
from apache_beam_spark.similarity.kmeans import kmeans, kmeans_fit, kmeans_assign

__all__ = ["brute_force_topk", "lsh_topk", "embedding_near_dup_pairs",
           "kmeans", "kmeans_fit", "kmeans_assign"]
