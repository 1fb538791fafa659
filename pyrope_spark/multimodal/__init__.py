from pyrope_spark.multimodal.columns import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_image_stub,
    extract_features,
    frame_sample_stub,
    media_stats,
    resize_image_stub,
    with_media_metadata,
)
from pyrope_spark.multimodal.gif import (  # noqa: F401
    encode_gif,
    gif_decoder,
)
from pyrope_spark.multimodal.jpeg import (  # noqa: F401
    auto_image_decoder,
    encode_jpeg,
    jpeg_decoder,
)
