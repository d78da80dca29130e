import os
import sys

# Tests run on a deterministic virtual 8-device CPU mesh (real-TPU benches go
# through bench.py). The sandbox sitecustomize registers an 'axon' TPU PJRT
# plugin at interpreter boot and exports JAX_PLATFORMS=axon, but no backend
# has been *instantiated* yet when conftest loads — so overriding the env
# (hard, not setdefault) plus jax.config still wins.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache for the CPU test graphs (separate dir from
# the TPU cache): the suite's wall time is dominated by recompiling the
# same decode graphs every run.
from rtlsdr_ft8d_tpu.host.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.expanduser("~/.cache/tpu_ft8d_xla_cputest"))


def pytest_sessionstart(session):
    devs = jax.devices()
    assert devs[0].platform == "cpu" and len(devs) == 8, devs
