"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without real TPU hardware by forcing the
host platform to expose 8 CPU devices (the reference had no answer to
"multi-node without a cluster" — SURVEY.md §4; this is ours).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# jax may already be imported by sitecustomize before this conftest runs;
# the backend is not initialized yet though, so config.update still applies.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: model-level tests recompile near-identical
# R-50 graphs; cache them across invocations (VERDICT r1 next #5)
_cache_dir = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "lvc_tpu", "jax_test_cache",
)
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
