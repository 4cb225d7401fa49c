from gpufluidsimulation_tpu.bimocq.mapping import MappingState  # noqa: F401
