"""gpufluidsimulation_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the BiMocq
bidirectional-characteristic-mapping fluid engine (reference: Hyberge/GPUFluidSimulation).

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):
  core/     — MAC grids + staggered interpolation     (ref: include/fluid_buffer3D.h, array2.h)
  ops/      — advection / Poisson / forces kernels    (ref: bimocq3D/GPU_kernel.cu, utils/AlgebraicMultigrid.h)
  bimocq/   — bidirectional mapping engine            (ref: bimocq3D/Mapping.{h,cpp})
  solvers/  — 2D/3D time integrators, all schemes     (ref: bimocq2D/BimocqSolver2D.cpp, bimocq3D/Bimocq*Solver.cpp)
  scenes/   — canonical example setups                (ref: bimocq2D/main.cpp, bimocq3D/main.cpp)
  parallel/ — multi-chip sharding over jax Mesh       (new capability; ref had single-GPU staging only)
  io_utils/ — BMP/VDB/NPZ export + checkpointing      (ref: utils/writeBMP.*, utils/volumeMeshTools.h)

All simulation state lives in HBM inside one jitted step; the reference's
host<->device staging fabric (GPU_Advection.h:249-326) is deleted by design.
"""

__version__ = "0.1.0"

from gpufluidsimulation_tpu.solvers.schemes import Scheme  # noqa: F401
