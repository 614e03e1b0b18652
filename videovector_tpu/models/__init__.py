from videovector_tpu.models.embedding import (  # noqa: F401
    VideoEmbeddingConfig, VideoEmbeddingModel,
)
