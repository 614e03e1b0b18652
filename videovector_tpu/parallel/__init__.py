from videovector_tpu.parallel.mesh import make_mesh  # noqa: F401
from videovector_tpu.parallel.train import make_train_step, make_eval_step  # noqa: F401
