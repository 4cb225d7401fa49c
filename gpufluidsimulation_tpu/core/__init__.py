from gpufluidsimulation_tpu.core.grids import Grid2D, Grid3D  # noqa: F401
