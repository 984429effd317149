from moshpp_tpu.solver.gauss_newton import (
    DoglegOptions,
    SolveResult,
    dogleg_solve,
    batched_dogleg_solve,
)
