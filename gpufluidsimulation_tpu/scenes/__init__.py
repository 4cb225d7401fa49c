from gpufluidsimulation_tpu.scenes.scenes2d import SCENES_2D, make_scene_2d  # noqa: F401
from gpufluidsimulation_tpu.scenes.scenes3d import make_vortex_collision  # noqa: F401
