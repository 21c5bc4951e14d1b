from thewhisperdb_spark.sources.multimodal import (  # noqa: F401
    MEDIA_SCHEMA,
    extract_image_features,
    extract_text,
    read_binary_files,
    sample_frames,
    with_media_metadata,
)
