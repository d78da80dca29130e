"""Pallas-kernel selection knobs, resolved lazily per process.

Round-5 hardware A/B (scripts/profile_pallas.py, one v5e chip) measured
every Pallas kernel faster than its XLA formulation — waterfall 1.30 ->
1.26 ms, sync 1.15 -> 0.99 ms (bit-exact), LLR 1.17 -> 0.72 ms
(bit-exact), BP 1.78 -> 1.18 ms at N=1024 / 7.08 -> 4.28 ms at N=7680 —
so the kernels are the DEFAULT on TPU backends. On CPU, Pallas only
exists in interpret mode (slow, test-only), so the default there stays
the XLA formulation; tests that exercise the kernels set the env knob
explicitly.

Resolution order per knob (e.g. FT8_TPU_BP_PALLAS):
  "0"            -> XLA formulation, always
  "1"            -> Pallas kernel (interpret mode on CPU)
  unset          -> Pallas on TPU-class backends, XLA on CPU
  FT8_TPU_EXACT=1 wins over the non-bit-exact kernels (BP, waterfall):
                    the parity anchor is never silently replaced.

Resolution is lazy (first call, then cached) so importing the ops layer
does not force JAX backend initialization.
"""

import os
import warnings

_cache: dict[str, bool] = {}


def _backend_is_tpu() -> bool:
    import jax

    # the sandbox's remote TPU registers as "axon"; real pods as "tpu"
    return jax.devices()[0].platform != "cpu"


def pallas_selected(env_name: str, exact_wins: bool = False) -> bool:
    """True if the Pallas kernel behind `env_name` should be used."""
    hit = _cache.get(env_name)
    if hit is not None:
        return hit
    v = os.environ.get(env_name)
    if exact_wins and os.environ.get("FT8_TPU_EXACT") == "1":
        if v == "1":
            warnings.warn(f"{env_name} ignored: FT8_TPU_EXACT=1 keeps the "
                          "bit-exact XLA formulation")
        sel = False
    elif v == "1":
        sel = True
    elif v == "0":
        sel = False
    else:
        sel = _backend_is_tpu()
    _cache[env_name] = sel
    return sel
