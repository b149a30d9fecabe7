from metevents_spark.multimodal.media import (  # noqa: F401
    attach_fake_media,
    frame_sample,
    media_dedup,
    media_embed,
    media_embedding_near_dup,
    media_features,
    media_pipeline,
    media_resize,
)
