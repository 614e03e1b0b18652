from videovector_tpu.data.wire import (  # noqa: F401
    BlobProto, Datum, TestVideoShotWindows, TrackingWindow, TrackPositions,
    VideoShots, VideoShotWindow,
)
from videovector_tpu.data.records import RecordReader, RecordWriter  # noqa: F401
