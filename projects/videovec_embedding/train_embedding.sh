#!/bin/bash
# Flagship temporal-embedding training — the reference's
# train_mednet_embedding.sh workflow (ref:projects/videovec_embedding/
# train_mednet_embedding.sh) on this framework.
set -e
cd "$(dirname "$0")"

if [ ! -f train_shots.vvr ]; then
  echo "generating synthetic dataset (replace with your own VVR stores)"
  PYTHONPATH=../.. python make_synthetic_data.py
fi

PYTHONPATH=../.. python generate_net.py \
  --train_source=projects/videovec_embedding/train_shots.vvr \
  --test_source=projects/videovec_embedding/test_windows.vvr \
  > mednet_embedding_train.prototxt

cd ../..
python -m videovector_tpu.tools.cli train \
  --solver=projects/videovec_embedding/mednet_embedding_train_solver.prototxt
