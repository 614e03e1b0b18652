from videovector_tpu.metrics.retrieval import (  # noqa: F401
    IdToClassMap, retrieval_rank_stats, retrieval_stats, video_level_average,
)
from videovector_tpu.metrics.classification import classification_stats  # noqa: F401
