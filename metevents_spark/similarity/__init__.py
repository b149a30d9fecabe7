from metevents_spark.similarity.knn import (  # noqa: F401
    ann_recall_lsh_ivf,
    ann_recall_report,
    embedding_near_dup,
    embedding_norms,
    embedding_quantize,
    hard_negative_mining,
    knn_cosine,
    knn_ivf,
    knn_ivf_pq,
    knn_lsh,
    label_centroids,
    random_projection,
)
from metevents_spark.similarity.pca import (  # noqa: F401
    embedding_covariance,
    embedding_whitening,
    pca_embeddings,
)
from metevents_spark.similarity.semdedup import (  # noqa: F401
    kmeans_embeddings,
    semantic_dedup,
)
