from metevents_spark.similarity.knn import (  # noqa: F401
    embedding_norms,
    knn_cosine,
    knn_lsh,
)
