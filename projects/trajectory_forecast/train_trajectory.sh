#!/usr/bin/env bash
# End-to-end trajectory-forecast training (mirrors the reference's
# train_mednet_embedding.sh driver-script style).
set -e
cd "$(dirname "$0")"
python make_synthetic_data.py
python generate_net.py --train_source tracks_train.vvr \
    --test_source tracks_test.vvr > trajectory_train.prototxt
python -m videovector_tpu.tools.cli train --solver=trajectory_solver.prototxt
