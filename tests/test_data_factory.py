"""Data-source factory coverage: every data-layer type maps from its
LayerParameter message to a working source with tops renamed."""

import numpy as np
import pytest

from videovector_tpu.config.textformat import parse
from videovector_tpu.data.records import RecordWriter
from videovector_tpu.data.shots import ShotDataset, ShotVideo
from videovector_tpu.data.tracking import TrackingWindowDataset
from videovector_tpu.data.wire import Datum, TrackingWindow, TrackPositions
from videovector_tpu.graph.data_factory import MergedSource, make_data_source


def _layer(text):
    return parse(text).get_list("layers")[0]


def test_data_layer_factory(tmp_path, rng):
    path = str(tmp_path / "d.vvr")
    with RecordWriter(path) as w:
        for i in range(6):
            pix = rng.randint(0, 256, (1, 6, 6)).astype(np.uint8)
            w.append(str(i), Datum(channels=1, height=6, width=6,
                                   data=pix.tobytes(), label=i).encode())
    layer = _layer(f"""
    layers {{ name: "d" type: DATA top: "imgs" top: "lbls"
      data_param {{ source: "{path}" batch_size: 3 }}
      transform_param {{ crop_size: 4 }} }}
    """)
    src = make_data_source(layer, phase="TEST")
    b = src.next_batch()
    assert b["imgs"].shape == (3, 1, 4, 4)
    np.testing.assert_array_equal(b["lbls"], [0, 1, 2])


def test_hdf5_factory(tmp_path, rng):
    import h5py
    h5 = tmp_path / "a.h5"
    with h5py.File(h5, "w") as f:
        f.create_dataset("data", data=rng.randn(5, 3).astype(np.float32))
        f.create_dataset("label", data=np.arange(5.0))
    lst = tmp_path / "list.txt"
    lst.write_text(str(h5))
    layer = _layer(f"""
    layers {{ name: "h" type: HDF5_DATA top: "x" top: "y"
      hdf5_data_param {{ source: "{lst}" batch_size: 2 }} }}
    """)
    src = make_data_source(layer)
    b = src.next_batch()
    assert b["x"].shape == (2, 3)
    np.testing.assert_array_equal(b["y"], [0, 1])


def test_tracking_factory(tmp_path, rng):
    windows = []
    for s in range(2):
        tracks = [TrackPositions(id=i, x=list(map(float, rng.randn(12))),
                                 y=list(map(float, rng.randn(12))))
                  for i in range(3)]
        windows.append(TrackingWindow(scene_id=s, track_positions=tracks))
    path = str(tmp_path / "t.vvr")
    with RecordWriter(path) as w:
        for i, win in enumerate(windows):
            w.append(str(i), win.encode())
    layer = _layer(f"""
    layers {{ name: "t" type: TRACKING_WINDOWS_DATA
      top: "obs" top: "cont_o" top: "pred" top: "cont_p" top: "gt" top: "scene"
      tracking_windows_data_param {{ source: "{path}" batch_size: 4
        temporal_observed_size: 8 temporal_predicted_size: 4 }} }}
    """)
    src = make_data_source(layer)
    b = src.next_batch()
    assert b["obs"].shape == (8, 4, 3)
    assert b["gt"].shape == (4, 4, 2)
    assert b["scene"].shape == (4,)


def test_video_shots_exhaustive_factory(tmp_path, rng):
    videos = [ShotVideo(7, np.arange(4, dtype=np.int32),
                        rng.randn(4, 8).astype(np.float32))]
    path = str(tmp_path / "v.vvr")
    ShotDataset(videos).to_records(path)
    layer = _layer(f"""
    layers {{ name: "v" type: VIDEO_SHOTS_DATA top: "data" top: "vid"
      video_shots_data_param {{ source: "{path}" batch_size: 6
        context_type: PAIRWISE }} }}
    """)
    src = make_data_source(layer)
    b = src.next_batch()
    assert b["data"].shape == (6, 2, 8)
    assert np.all(b["vid"] == 7)


def test_merged_source(tmp_path, rng):
    import h5py
    h5 = tmp_path / "a.h5"
    with h5py.File(h5, "w") as f:
        f.create_dataset("data", data=rng.randn(4, 2).astype(np.float32))
        f.create_dataset("label", data=np.arange(4.0))
    lst = tmp_path / "l.txt"
    lst.write_text(str(h5))
    l1 = _layer(f"""
    layers {{ name: "a" type: HDF5_DATA top: "x1" top: "y1"
      hdf5_data_param {{ source: "{lst}" batch_size: 2 }} }}""")
    l2 = _layer(f"""
    layers {{ name: "b" type: HDF5_DATA top: "x2" top: "y2"
      hdf5_data_param {{ source: "{lst}" batch_size: 2 }} }}""")
    merged = MergedSource([make_data_source(l1), make_data_source(l2)])
    b = merged.next_batch()
    assert set(b) == {"x1", "y1", "x2", "y2"}


def test_unknown_type_raises():
    layer = _layer('layers { name: "z" type: MEMORY_DATA top: "x" }')
    with pytest.raises(NotImplementedError):
        make_data_source(layer)
