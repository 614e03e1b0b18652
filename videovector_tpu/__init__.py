"""videovector_tpu — TPU-native framework with the capabilities of
eevignesh/videovector (Caffe-era video temporal-embedding system,
arXiv:1505.00315), rebuilt on JAX/XLA/Pallas.

See DESIGN.md for the architecture and SURVEY.md for the reference inventory.
"""

__version__ = "0.1.0"

from videovector_tpu.utils.logging import get_logger  # noqa: F401
