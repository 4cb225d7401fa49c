"""Global engine configuration knobs.

fast_interp: route full-lattice trilinear sampling through the windowed-DMA
Pallas kernel (ops/interp_fast.py) instead of XLA gather. Default: on for
TPU backends, off elsewhere (tests/oracles use the exact gather form).
Override with GFS_FAST_INTERP=0/1. GFS_INTERP_RR sets the residual reach
(default 3; raise for adaptive-reinit BiMocq configs with long remap gaps).
"""

from __future__ import annotations

import os

_FAST_ENV = os.environ.get("GFS_FAST_INTERP")
_RR = int(os.environ.get("GFS_INTERP_RR", "3"))
_RZ = int(os.environ.get("GFS_INTERP_RZ", "8"))
_FORCED: bool | None = None if _FAST_ENV is None else _FAST_ENV not in ("0", "false")


def use_fast_interp() -> bool:
    if _FORCED is not None:
        return _FORCED
    import jax

    return jax.default_backend() not in ("cpu",)


def set_fast_interp(value: bool | None) -> None:
    """Programmatic override (None = auto by backend)."""
    global _FORCED
    _FORCED = value


def interp_rr() -> int:
    return _RR


def interp_rz() -> int:
    return _RZ
