"""Build-and-cache helper for the native (C ABI) kernels.

Shared by data/native_io.py and evaluation/fast_eval_api.py. Libraries are
compiled into a per-user cache directory keyed by a SHA-256 of the source
text (not filesystem mtimes, which git does not preserve), so a fresh
checkout always runs code built from the sources it contains, the package
directory is never written to at import time, and read-only installs work.
No prebuilt binaries are committed to the repo.
"""
from __future__ import annotations

import hashlib
import logging
import os
import subprocess
import tempfile
from typing import Optional, Sequence

logger = logging.getLogger(__name__)


def cache_dir() -> str:
    root = os.environ.get("LVC_TPU_CACHE_DIR")
    if not root:
        xdg = os.environ.get("XDG_CACHE_HOME", os.path.join(os.path.expanduser("~"), ".cache"))
        root = os.path.join(xdg, "lvc_tpu", "native")
    return root


def build_shared_lib(name: str, src_path: str, link_libs: Sequence[str] = ()) -> Optional[str]:
    """Compile ``src_path`` to a cached .so; return its path or None.

    The artifact name embeds a hash of (source bytes, link flags), so any
    source edit produces a distinct artifact and stale binaries are never
    picked up. Compilation into the final path goes through an atomic
    rename to stay safe under concurrent first-use from multiple processes.
    """
    try:
        with open(src_path, "rb") as f:
            src_bytes = f.read()
        import platform

        # key in the flag set AND the host CPU: -march=native artifacts are
        # ISA-specific, and cache_dir may live on a shared (NFS) home
        tag = f"march=native|{platform.machine()}|{platform.processor()}"
        key = hashlib.sha256(
            src_bytes + b"\0" + " ".join(link_libs).encode() + b"\0" + tag.encode()
        ).hexdigest()[:16]
        out_dir = cache_dir()
        os.makedirs(out_dir, exist_ok=True)
        lib_path = os.path.join(out_dir, f"{name}-{key}.so")
        if os.path.exists(lib_path):
            return lib_path
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=out_dir)
        os.close(fd)
        # -march=native: the .so is built per machine into a local cache
        # (never shipped), so host-specific SIMD is safe; retry portable if
        # the toolchain rejects it
        base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", tmp, src_path]
        libs = [f"-l{l}" for l in link_libs]
        try:
            subprocess.run(
                base[:2] + ["-march=native"] + base[2:] + libs,
                check=True, capture_output=True,
            )
        except subprocess.CalledProcessError:
            subprocess.run(base + libs, check=True, capture_output=True)
        os.replace(tmp, lib_path)
        return lib_path
    except Exception as e:  # pragma: no cover - build-environment dependent
        logger.warning("native build of %s failed (%s)", name, e)
        return None
