"""extract_features over IMAGE_DATA + the CaffeNet tower — the reference's
feature_extraction_pretrained_mednet.sh workflow (§3.2 call stack) end to
end: JPEG decode → resize → crop/mean → conv1..fc7 → record store + csv."""

import os

import numpy as np
import pytest

REF_EXTRACT = ("/root/reference/projects/videovec_embedding/"
               "videovec_extraction.prototxt")


@pytest.mark.skipif(not os.path.exists(REF_EXTRACT), reason="no reference")
def test_extraction_pipeline_with_images(tmp_path, rng):
    from PIL import Image
    from videovector_tpu.config.textformat import parse_file
    from videovector_tpu.data.records import RecordReader
    from videovector_tpu.data.wire import BlobProto, Datum
    from videovector_tpu.tools.extract_features import extract

    # images + list file
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    paths = []
    for i in range(2):
        img = Image.fromarray(rng.randint(0, 255, (300, 260, 3))
                              .astype(np.uint8))
        p = img_dir / f"f{i}.jpg"
        img.save(p)
        paths.append(str(p))
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(f"{p} 0" for p in paths))

    # mean file matching the resized image
    mean = np.full((1, 3, 256, 256), 110.0, np.float32)
    mean_path = tmp_path / "mean.blob"
    mean_path.write_bytes(BlobProto.from_array(mean[0][None]).encode())

    # rewrite the reference extraction prototxt's data layer to our files
    msg = parse_file(REF_EXTRACT)
    data_layer = next(l for l in msg.get_list("layers")
                      if l.get("type") == "IMAGE_DATA")
    idp = data_layer.get_msg("image_data_param")
    idp.fields["source"] = [str(lst)]
    idp.fields["batch_size"] = [2]
    tp = data_layer.get_msg("transform_param")
    tp.fields["mean_file"] = [str(mean_path)]
    net_path = tmp_path / "extract.prototxt"
    net_path.write_text(msg.dumps())

    out_prefix = str(tmp_path / "feats")
    counts = extract(str(net_path), [], ["ip2"], out_prefix, 1)
    assert counts["ip2"] == 2
    r = RecordReader(out_prefix + "_ip2.vvr")
    d = Datum.decode(bytes(r.value(0)))
    assert len(d.float_data) == 4096
    assert np.isfinite(np.asarray(d.float_data)).all()
    lines = open(out_prefix + "_ip2.txt").read().strip().split("\n")
    assert len(lines) == 2 and len(lines[0].split(",")) == 4096
