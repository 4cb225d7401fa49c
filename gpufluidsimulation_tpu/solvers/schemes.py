"""Advection scheme enums.

2D enum order matches bimocq2D/BimocqSolver2D.h:18
(SEMILAG, MACCORMACK, BFECC, MAC_REFLECTION, FLIP, APIC, POLYPIC, BIMOCQ);
the 3D reference re-orders them (bimocq3D/BimocqSolver.h:29) — we expose one
canonical enum plus the 3D argv mapping for CLI parity.
"""

import enum


class Scheme(enum.IntEnum):
    SEMILAG = 0
    MACCORMACK = 1
    BFECC = 2
    MAC_REFLECTION = 3
    FLIP = 4
    APIC = 5
    POLYPIC = 6
    BIMOCQ = 7

    def display_name(self) -> str:
        return {
            Scheme.SEMILAG: "Semilag",
            Scheme.MACCORMACK: "MacCormack",
            Scheme.BFECC: "BFECC",
            Scheme.MAC_REFLECTION: "Reflection",
            Scheme.FLIP: "FLIP",
            Scheme.APIC: "APIC",
            Scheme.POLYPIC: "PolyPIC",
            Scheme.BIMOCQ: "BiMocq",
        }[self]


# argv[1] mapping of the 3D driver (bimocq3D/BimocqSolver.h:29).
SCHEME_3D_ARGV = {
    0: Scheme.BIMOCQ,
    1: Scheme.SEMILAG,
    2: Scheme.MACCORMACK,
    3: Scheme.MAC_REFLECTION,
}
