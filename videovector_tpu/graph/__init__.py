from videovector_tpu.graph.net import Net  # noqa: F401
