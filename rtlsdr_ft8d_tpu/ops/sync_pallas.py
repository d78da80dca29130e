"""Costas sync scoring as a Pallas kernel (opt-in, FT8_TPU_SYNC_PALLAS=1).

Same algebra as ops/sync.py's difference-plane restructure (see its
docstring), with every intermediate plane VMEM-resident: the XLA path
writes ~100 MB of int32 difference/fold planes to HBM per 64-channel
window; here one (time_sub, freq_sub) plane of the uint8 waterfall
(94 KB) comes in and the (36, 249) int32 score grid (36 KB) goes out.

Grid: one instance per (batch, time_sub, freq_sub) plane — the caller
reshapes (B, 92, 2, 2, 256) to (B*4, 92, 256) and back. Integer math
identical to ops/sync.py (and therefore to the C loop semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..protocol.constants import COSTAS_PATTERN, NUM_BIN, NUM_BLOCKS
from .sync import _COUNT, NUM_FREQ_OFFSETS, NUM_TIME_OFFSETS


def _sync_kernel(wf_ref, count_ref, out_ref):
    w = wf_ref[0].astype(jnp.int32)                    # (92, 256)
    zrow = jnp.zeros((1, NUM_BIN), jnp.int32)
    zbin = jnp.zeros((NUM_BLOCKS, 1), jnp.int32)
    dl = jnp.concatenate([zbin, w[:, 1:] - w[:, :-1]], axis=1)
    dh = jnp.concatenate([w[:, :-1] - w[:, 1:], zbin], axis=1)
    dp = jnp.concatenate([zrow, w[1:, :] - w[:-1, :]], axis=0)
    dn = jnp.concatenate([w[:-1, :] - w[1:, :], zrow], axis=0)
    s4 = dl + dh + dp + dn
    variants = {"all": s4, "no_dp": s4 - dp, "no_dl": s4 - dl,
                "no_dn": s4 - dn}

    def fold(e):
        ep = jnp.pad(e, ((12, 10), (0, 0)))
        return ep[0:42, :] + ep[36:78, :] + ep[72:114, :]

    folded = {v: fold(e) for v, e in variants.items()}
    score = None
    for k in range(7):
        sm = int(COSTAS_PATTERN[k])
        v = {0: "no_dp", 3: "no_dl", 6: "no_dn"}.get(k, "all")
        term = folded[v][k:k + NUM_TIME_OFFSETS,
                         sm:sm + NUM_FREQ_OFFSETS]
        score = term if score is None else score + term

    count = count_ref[:]                               # (36, 1)
    q = jnp.abs(score) // count
    out_ref[0] = jnp.sign(score) * q


def sync_scores_pallas(wf: jax.Array) -> jax.Array:
    """Drop-in ops/sync.sync_scores: (..., 92, 2, 2, 256) uint8 ->
    (..., 2, 2, 36, 249) int32."""
    from jax.experimental import pallas as pl

    interpret = jax.devices()[0].platform == "cpu"
    batch_shape = wf.shape[:-4]
    # (..., 92, 2, 2, 256) -> (N*4, 92, 256) with (ts, fs) fastest
    w = jnp.moveaxis(wf.reshape((-1,) + wf.shape[-4:]), -4, -2)
    n4 = w.shape[0] * 4
    w = w.reshape(n4, NUM_BLOCKS, NUM_BIN)
    count = jnp.asarray(_COUNT.astype(np.int32))[:, None]

    scores = pl.pallas_call(
        _sync_kernel,
        grid=(n4,),
        in_specs=[pl.BlockSpec((1, NUM_BLOCKS, NUM_BIN),
                               lambda i: (i, 0, 0)),
                  pl.BlockSpec(count.shape, lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1, NUM_TIME_OFFSETS, NUM_FREQ_OFFSETS),
                               lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (n4, NUM_TIME_OFFSETS, NUM_FREQ_OFFSETS), jnp.int32),
        interpret=interpret,
    )(w, count)

    return scores.reshape(
        batch_shape + (2, 2, NUM_TIME_OFFSETS, NUM_FREQ_OFFSETS))
