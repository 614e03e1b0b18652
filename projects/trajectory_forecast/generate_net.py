"""Emit the trajectory-forecast train/test prototxt.

The graph is the reference's trajectory configuration style: an LSTM
encoder consumes the observed track, its final cell seeds an LSTM decoder
over the prediction window (LSTM_ENC_DEC, ref:src/caffe/layers/
lstm_enc_dec_layer.cpp:21-151), a linear readout maps decoder states to
(x, y), Euclidean loss against the ground-truth future
(ref:include/caffe/loss_layers.hpp EuclideanLossLayer). Data comes from
TrackingWindow protos via TRACKING_WINDOWS_DATA
(ref:src/caffe/layers/tracking_windows_data_layer.cpp:60-200).

Average displacement error is the Euclidean loss itself (mean squared
displacement /2 per Caffe's euclidean normalization) reported on the TEST
phase — `vvtpu test` averages it over test iterations.
"""

from __future__ import annotations

import argparse


def emit(train_source: str, test_source: str, *, batch: int = 16,
         test_batch: int = 16, hidden: int = 32, t_obs: int = 8,
         t_pred: int = 4) -> str:
    def data_layer(name, source, bsz, phase):
        return f"""
layers {{
  name: "{name}" type: TRACKING_WINDOWS_DATA
  top: "observed" top: "cont_obs" top: "predicted" top: "cont_pred" top: "gt"
  tracking_windows_data_param {{
    source: "{source}" batch_size: {bsz}
    temporal_observed_size: {t_obs} temporal_predicted_size: {t_pred}
    encoder_bit: true
  }}
  include {{ phase: {phase} }}
}}"""

    return f"""name: "trajectory_forecast"
{data_layer("tracks", train_source, batch, "TRAIN")}
{data_layer("tracks_test", test_source, test_batch, "TEST")}
layers {{
  name: "encdec" type: LSTM_ENC_DEC
  bottom: "observed" bottom: "cont_obs" bottom: "predicted" bottom: "cont_pred"
  top: "enc_h" top: "dec_h"
  inner_product_param {{ num_output: {hidden}
    weight_filler {{ type: "gaussian" std: 0.15 }} }}
  lstm_param {{ clipping_threshold: 5.0 }}
}}
layers {{ name: "silence_enc" type: SILENCE bottom: "enc_h" }}
layers {{ name: "fb" type: FLATTEN_BATCH bottom: "dec_h" top: "dec_flat" }}
layers {{
  name: "readout" type: INNER_PRODUCT bottom: "dec_flat" top: "pred"
  inner_product_param {{ num_output: 2 weight_filler {{ type: "xavier" }} }}
}}
layers {{ name: "gt_fb" type: FLATTEN_BATCH bottom: "gt" top: "gt_flat" }}
layers {{ name: "loss" type: EUCLIDEAN_LOSS bottom: "pred" bottom: "gt_flat"
  top: "displacement_loss" }}
"""


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train_source", required=True)
    p.add_argument("--test_source", required=True)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--test_batch", type=int, default=16)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--t_obs", type=int, default=8)
    p.add_argument("--t_pred", type=int, default=4)
    args = p.parse_args()
    print(emit(args.train_source, args.test_source, batch=args.batch,
               test_batch=args.test_batch, hidden=args.hidden,
               t_obs=args.t_obs, t_pred=args.t_pred), end="")


if __name__ == "__main__":
    main()
