"""Generate the flagship embedding net prototxt.

Emits the same graph shape as the reference's hand-written
mednet_embedding_train.prototxt (ref:projects/videovec_embedding/
mednet_embedding_train.prototxt): VIDEO_SAMPLED_SHOTS_DATA → 15-way SLICE →
CONCAT → fc7 tower → role slicing → context average → normalize → dot scores
→ MAX_MARGIN_LOSS, plus the TEST branch with RETRIEVAL_STATS. Parameterized
so users generate variants (feature dim, negatives, margin) instead of
editing 690 lines by hand.

Usage: python generate_net.py --train_source=... --test_source=... \
           [--batch=128 --negatives=10 --embed=4096 --margin=2.0] > net.prototxt
"""

from __future__ import annotations

import argparse


def emit(train_source: str, test_source: str, *, batch: int = 128,
         test_batch: int = 673, context_size: int = 5, negatives: int = 10,
         embed: int = 4096, margin: float = 2.0, buffer_size: int = 5000,
         swap: int = 50, same_video_negs: int = 6,
         weight_std: float = 0.001, dropout: float = 0.9,
         id_to_class_file: str = "",
         device_negatives: bool = False) -> str:
    ctx = context_size - 1  # context shots (window minus target)
    lines = [f'name: "videovec_embedding_d{embed}"']
    if device_negatives:
        # the on-device sampler draws ALL negatives from the device
        # reservoir — same-video hard negatives are a host-path feature
        same_video_negs = 0

    # --- data layers ---
    lines.append(f"""
layers {{
  name: "shot_windows"
  type: VIDEO_SAMPLED_SHOTS_DATA
  top: "data"
  video_sampled_shots_data_param {{
    source: "{train_source}"
    batch_size: {batch}
    num_negative_samples: {negatives}
    max_buffer_size: {buffer_size}
    negative_swap_percentage: {swap}
    max_same_video_negs: {same_video_negs}
    context_type: WINDOW
    context_size: {context_size}{'''
    device_negatives: true''' if device_negatives else ''}
  }}
  include: {{ phase: TRAIN }}
}}
layers {{
  name: "shot_windows"
  type: VIDEO_SHOT_WINDOW_TEST_DATA
  top: "data"
  top: "video_ids"
  video_shot_window_test_data_param {{
    source: "{test_source}"
    batch_size: {test_batch}
  }}
  include: {{ phase: TEST }}
}}""")

    roles = (["t"] + [f"c{i+1}" for i in range(ctx)]
             + [f"n{i+1}" for i in range(negatives)])
    tops = "\n".join(f'  top: "{r}"' for r in roles)
    lines.append(f"""
layers {{
  name: "slice_input" type: SLICE bottom: "data"
{tops}
  slice_param {{ slice_dim: 1 }}
  include: {{ phase: TRAIN }}
}}""")
    test_tops = "\n".join(f'  top: "c{i+1}"' for i in range(ctx))
    lines.append(f"""
layers {{
  name: "slice_input" type: SLICE bottom: "data"
{test_tops}
  slice_param {{ slice_dim: 1 }}
  include: {{ phase: TEST }}
}}""")

    bottoms = "\n".join(f'  bottom: "{r}"' for r in roles)
    lines.append(f"""
layers {{
  name: "concat_all" type: CONCAT
{bottoms}
  top: "tower_in" concat_param {{ concat_dim: 0 }}
  include: {{ phase: TRAIN }}
}}""")
    # TEST: average the RAW context frames first (reference order —
    # slice_test → ELTWISE coeff .25 → fc7, mednet_embedding_train.prototxt)
    test_bottoms = "\n".join(f'  bottom: "c{i+1}"' for i in range(ctx))
    test_coeffs = "\n".join(f"  coeff: {1.0 / ctx}" for _ in range(ctx))
    lines.append(f"""
layers {{
  name: "average_for_test" type: ELTWISE
{test_bottoms}
  top: "tower_in"
  eltwise_param {{ operation: SUM
{test_coeffs}
  }}
  include: {{ phase: TEST }}
}}""")

    # --- tower (fc7 + relu + dropout .9, ref :190-230) ---
    lines.append(f"""
layers {{
  name: "fc7" type: INNER_PRODUCT bottom: "tower_in" top: "emb"
  blobs_lr: 1 blobs_lr: 2
  weight_decay: 1 weight_decay: 0
  inner_product_param {{
    num_output: {embed}
    weight_filler {{ type: "gaussian" std: {weight_std} }}
    bias_filler {{ type: "constant" }}
  }}
}}
layers {{ name: "relu7" type: RELU bottom: "emb" top: "emb" }}
layers {{
  name: "drop7" type: DROPOUT bottom: "emb" top: "emb"
  dropout_param {{ dropout_ratio: {dropout} }}
  include: {{ phase: TRAIN }}
}}""")

    etops = "\n".join(f'  top: "e{r}"' for r in roles)
    lines.append(f"""
layers {{
  name: "slice_emb" type: SLICE bottom: "emb"
{etops}
  slice_param {{ slice_dim: 0 }}
  include: {{ phase: TRAIN }}
}}""")


    coeff = 1.0 / ctx
    cbot = "\n".join(f'  bottom: "ec{i+1}"' for i in range(ctx))
    coeffs = "\n".join(f"  coeff: {coeff}" for _ in range(ctx))
    lines.append(f"""
layers {{
  name: "ctx_avg" type: ELTWISE
{cbot}
  top: "ctx"
  eltwise_param {{ operation: SUM
{coeffs}
  }}
  include: {{ phase: TRAIN }}
}}
layers {{ name: "ctx_norm" type: NORMALIZATION bottom: "ctx" top: "ctxn"
  include: {{ phase: TRAIN }} }}
layers {{ name: "test_norm" type: NORMALIZATION bottom: "emb" top: "ctxn"
  include: {{ phase: TEST }} }}
layers {{
  name: "tgt_norm" type: NORMALIZATION bottom: "et" top: "etn"
  include: {{ phase: TRAIN }}
}}
layers {{
  name: "true_prod" type: ELTWISE bottom: "ctxn" bottom: "etn" top: "tprod"
  eltwise_param {{ operation: PROD }} include: {{ phase: TRAIN }}
}}
layers {{
  name: "true_score" type: SUM bottom: "tprod" top: "ts"
  sum_param {{ num_output: {negatives} }} include: {{ phase: TRAIN }}
}}""")

    for i in range(negatives):
        lines.append(f"""
layers {{ name: "neg{i+1}_norm" type: NORMALIZATION bottom: "en{i+1}"
  top: "en{i+1}x" include: {{ phase: TRAIN }} }}
layers {{ name: "neg{i+1}_prod" type: ELTWISE bottom: "ctxn" bottom: "en{i+1}x"
  top: "np{i+1}" eltwise_param {{ operation: PROD }} include: {{ phase: TRAIN }} }}
layers {{ name: "neg{i+1}_score" type: SUM bottom: "np{i+1}" top: "ns{i+1}"
  include: {{ phase: TRAIN }} }}""")

    nbot = "\n".join(f'  bottom: "ns{i+1}"' for i in range(negatives))
    id2w = (f'    id_to_weight_file: "{id_to_class_file}"\n'
            if id_to_class_file else "")
    lines.append(f"""
layers {{
  name: "neg_concat" type: CONCAT
{nbot}
  top: "negative_scores" concat_param {{ concat_dim: 1 }}
  include: {{ phase: TRAIN }}
}}
layers {{
  name: "max_margin_loss" type: MAX_MARGIN_LOSS
  bottom: "ts" bottom: "negative_scores"
  top: "loss_output" top: "train_violations"
  loss_weight: 1.0 loss_weight: 0.0
  max_margin_loss_param {{ margin: {margin} norm: L2
{id2w}  }}
  include: {{ phase: TRAIN }}
}}
layers {{
  name: "retrieval_stats" type: RETRIEVAL_STATS
  bottom: "ctxn" bottom: "video_ids"
  top: "test_map" top: "test_hit1" top: "test_hit5"
  # synthetic project: no id_to_class_file, so class == video id and the
  # same-video shots ARE the positives — the proto default (true) assumes
  # a class map (the reference marks id_to_class_file `required`)
  retrieval_stats_param {{ exclude_same_video_shots: false }}
  include: {{ phase: TEST }}
}}""")
    return "\n".join(lines) + "\n"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train_source", required=True)
    p.add_argument("--test_source", required=True)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--test_batch", type=int, default=673)
    p.add_argument("--negatives", type=int, default=10)
    p.add_argument("--embed", type=int, default=4096)
    p.add_argument("--margin", type=float, default=2.0)
    p.add_argument("--buffer", type=int, default=0,
                   help="negative reservoir size; 0 = derive from the "
                        "dataset (min(5000, total_shots // 2) — the "
                        "reservoir must be fillable with distinct shots, "
                        "the reference CHECK-fails otherwise)")
    args = p.parse_args()
    buffer_size = args.buffer
    if buffer_size <= 0:
        import os
        import sys
        repo = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", "..")
        sys.path.insert(0, repo)
        from videovector_tpu.data.shots import ShotDataset
        # source paths are written for the training cwd (repo root); the
        # generator may run from the project dir — try both
        path = args.train_source
        if not os.path.exists(path):
            cand = os.path.join(repo, path)
            path = cand if os.path.exists(cand) else None
        if path is None:
            buffer_size = 5000  # reference default; dataset not visible here
        else:
            total = sum(v.num_shots for v in
                        ShotDataset.from_records(path).videos)
            buffer_size = max(1, min(5000, total // 2))
    print(emit(args.train_source, args.test_source, batch=args.batch,
               test_batch=args.test_batch, negatives=args.negatives,
               embed=args.embed, margin=args.margin,
               buffer_size=buffer_size), end="")


if __name__ == "__main__":
    main()
