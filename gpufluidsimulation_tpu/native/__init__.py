"""Native runtime components (C extensions).

The gfs_io extension is built on demand from native/gfs_io.c (no prebuilt
binary is committed): importing `gpufluidsimulation_tpu.native.gfs_io`
triggers a one-shot `cc` build into this package directory when the .so is
missing or older than its source. Falls back silently — callers
(io_utils/volume.py) treat an ImportError as "use the numpy path".
"""

from __future__ import annotations

import os
import subprocess
import sysconfig

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_PKG_DIR, "..", "..", "native", "gfs_io.c")
_SO = os.path.join(_PKG_DIR, "gfs_io.so")


def _ensure_built() -> None:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return  # installed without sources; rely on a shipped .so if any
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(src):
        return
    inc = sysconfig.get_paths()["include"]
    cmd = ["cc", "-O3", "-shared", "-fPIC", f"-I{inc}", src,
           "-o", _SO, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        pass  # import will fail -> numpy fallback


_ensure_built()
