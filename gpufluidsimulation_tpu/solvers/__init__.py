from gpufluidsimulation_tpu.solvers.schemes import Scheme  # noqa: F401
