from pyspark_graph_spark.multimodal.audio_ops import (
    attach_wav_media,
    audio_stats,
    decode_audio,
)
from pyspark_graph_spark.multimodal.audio_ops import spectral_features
from pyspark_graph_spark.multimodal.gif_ops import (
    attach_gif_media,
    decode_gif,
    encode_gif,
)
from pyspark_graph_spark.multimodal.binary_ops import (
    MEDIA_SCHEMA,
    attach_fake_media,
    attach_pgm_media,
    attach_png_media,
    attach_pgm_video,
    decode_images,
    extract_frames,
    frame_sample,
    image_stats,
    resize_images,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_fake_media",
    "attach_pgm_media",
    "attach_png_media",
    "attach_gif_media",
    "spectral_features",
    "decode_gif",
    "encode_gif",
    "attach_pgm_video",
    "attach_wav_media",
    "audio_stats",
    "decode_audio",
    "decode_images",
    "extract_frames",
    "frame_sample",
    "image_stats",
    "resize_images",
]
