from videovector_tpu.solver.solvers import (  # noqa: F401
    SolverConfig, init_solver_state, learning_rate, solver_update,
)
