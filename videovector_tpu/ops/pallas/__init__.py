"""EXPERIMENTAL — demoted from the supported surface (round 2).

Hand Pallas/Mosaic kernels (tiled MXU matmul with fused bias+ReLU epilogue,
conv-as-im2col+GEMM). They are validated ONLY in Pallas interpreter mode:
this environment reaches its TPU through the experimental axon tunnel,
where `pallas_call` does not execute (a minimal kernel wedges the remote
worker — verified 2026-08-16), so the kernels have never been compiled by
Mosaic or benchmarked against XLA on hardware.

The production compute path is XLA (`jnp.dot`, `lax.conv_general_dilated`),
which profiling shows already runs the flagship GEMMs at the MXU roofline
(PERF.md). Re-promotion criteria: on a standard TPU runtime, compile with
Mosaic, benchmark vs the XLA path, and keep only what measurably wins.
"""
