from pyspark_graph_spark.multimodal.binary_ops import (
    MEDIA_SCHEMA,
    attach_fake_media,
    attach_pgm_media,
    decode_images,
    frame_sample,
    image_stats,
    resize_images,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_fake_media",
    "attach_pgm_media",
    "decode_images",
    "frame_sample",
    "image_stats",
    "resize_images",
]
