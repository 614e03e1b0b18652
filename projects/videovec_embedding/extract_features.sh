#!/bin/bash
# Feature extraction from images through the MedNet tower — the reference's
# feature_extraction_pretrained_mednet.sh workflow
# (ref:projects/videovec_embedding/feature_extraction_pretrained_mednet.sh):
# load the extraction net, forward image batches, dump the ip2 embedding
# blob to a record store + text file.
#
# With no arguments this runs on generated synthetic images and random
# weights (a smoke-runnable demo). Pass your own to reproduce the
# reference workflow exactly:
#   extract_features.sh <list.txt> <mean.binaryproto> \
#       [weights1.caffemodel [weights2.caffemodel]]
# (the reference loads ImageNet weights then task weights, in that order)
set -e
cd "$(dirname "$0")"

LIST="${1:-}"
MEAN="${2:-}"
WEIGHTS_ARGS=()
[ -n "${3:-}" ] && WEIGHTS_ARGS+=("--weights=$3")
[ -n "${4:-}" ] && WEIGHTS_ARGS+=("--weights=$4")

if [ -z "$LIST" ]; then
  echo "no image list given — generating synthetic images + mean"
  PYTHONPATH=../.. python make_synthetic_images.py --out_dir=sample_images \
      --count=4
  LIST=projects/videovec_embedding/sample_images/list.txt
  MEAN=projects/videovec_embedding/sample_images/mean.blob
fi

PYTHONPATH=../.. python generate_extraction_net.py \
  --source="$LIST" --mean_file="$MEAN" --batch=2 \
  > videovec_extraction.prototxt

cd ../..
# VVTPU_EXTRACT_FLAGS: extra flags, e.g. --cpu (the reference binary's
# GPU/CPU arg) or --mesh=8 for data-parallel extraction
python -m videovector_tpu.tools.extract_features \
  --model=projects/videovec_embedding/videovec_extraction.prototxt \
  "${WEIGHTS_ARGS[@]}" \
  --blobs=ip2 \
  --out=projects/videovec_embedding/sample_features \
  --num_batches=2 --backend=leveldb ${VVTPU_EXTRACT_FLAGS:-}
echo "features written to projects/videovec_embedding/sample_features*"
