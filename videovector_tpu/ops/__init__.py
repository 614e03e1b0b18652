"""Pure functional ops — the TPU-native equivalent of the reference layer zoo.

Each op is a pure function over jnp arrays; there are no CPU/GPU twin
implementations (XLA compiles one definition for every backend), no in-place
diff buffers (JAX autodiff), and no virtual dispatch (the graph engine binds
ops to configs in graph/layers.py).
"""

from videovector_tpu.ops.activations import (  # noqa: F401
    absval, bnll, dropout, power, relu, sigmoid, tanh, threshold,
)
from videovector_tpu.ops.linear import inner_product  # noqa: F401
from videovector_tpu.ops.normalization import l2_normalize_rows, mvn  # noqa: F401
from videovector_tpu.ops.reductions import eltwise_max, eltwise_prod, eltwise_sum, sum_reduce  # noqa: F401
from videovector_tpu.ops.embedding import id_to_weight_lookup  # noqa: F401
from videovector_tpu.ops.losses import (  # noqa: F401
    accuracy, contrastive_loss, euclidean_loss, hinge_loss, infogain_loss,
    max_margin_loss, multinomial_logistic_loss, sigmoid_cross_entropy_loss,
    softmax_loss,
)
