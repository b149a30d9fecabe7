from metevents_spark.multimodal.media import (  # noqa: F401
    attach_fake_media,
    frame_sample,
    media_dedup,
    media_features,
    media_pipeline,
    media_resize,
)
