"""Pallas TPU kernel: int8 2.4 Msps ingest -> 3200 sps float32 baseband.

The hot streaming path (reference HOT LOOP #1, rtlsdr_ft8d.c:76-202) as a
hand-written TPU kernel: raw int8 IQ stays int8 all the way into VMEM (4x
less HBM traffic than float32), is converted on-chip, and contracts against
the resident 750x8 polyphase bank on the MXU. Each grid step produces
`tile_out` output samples from an overlapping (tile_out+7)-frame input span
fetched by explicit async DMA (overlapping windows cannot be expressed with
BlockSpec index maps, so the input stays in HBM and the kernel slices it
with pl.ds — the double-buffer-ready pattern from the Pallas guide).

Mosaic constraints shaped the layout: input frames are padded from 750 to
768 lanes (128-multiple), the DMA row count is 8-aligned, and each step's
output is written as an (8, tile_out/8) block (1-D outputs would have to
match XLA's whole-array T(N) tiling).

The jnp polyphase path (ops/decimate.py) remains the portable reference.
This kernel is VALIDATED ON REAL TPU HARDWARE (v5e via the sandbox relay:
Mosaic compile ~187 s, max error 1.4e-4 vs the jnp path); the int8 ingest
mode of StreamingDecimator selects it, cutting host->device bandwidth 4x
versus float32 upload.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decimate import HISTORY, PHASES, R, _polyphase_bank

TILE_OUT = 1024                      # default output samples per grid step
RPAD = 768                           # frame row padded to 6x128 lanes
OUT_ROWS = 8                         # output block sublanes


def _make_kernel(tile_out: int):
    nframes = tile_out + 8           # PHASES-1 overlap + 1 pad frame (8-aligned)
    out_cols = tile_out // OUT_ROWS

    def kernel(i_ref, q_ref, bank_ref, oi_ref, oq_ref):
        t = pl.program_id(0)

        def body(i8, q8, sem_i, sem_q):
            ci = pltpu.make_async_copy(
                i_ref.at[pl.ds(t * tile_out, nframes), :], i8, sem_i)
            cq = pltpu.make_async_copy(
                q_ref.at[pl.ds(t * tile_out, nframes), :], q8, sem_q)
            ci.start()
            cq.start()
            ci.wait()
            cq.wait()

            bank = bank_ref[:]                       # (768, 8) f32 in VMEM

            def filt(x8, out_ref):
                fr = x8[:].astype(jnp.float32)       # (nframes, 768)
                # (8, nframes) = bank^T . frames^T without materializing a
                # transpose
                y = jax.lax.dot_general(
                    bank, fr, (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                # out[j*out_cols + k] = sum_r y[r, j*out_cols + k + r]
                rows = []
                for j in range(OUT_ROWS):
                    acc = jnp.zeros((1, out_cols), jnp.float32)
                    for r in range(PHASES):
                        acc = acc + y[r:r + 1, j * out_cols + r:
                                      j * out_cols + r + out_cols]
                    rows.append(acc)
                out_ref[:] = jnp.concatenate(rows, axis=0) * (1.0 / 128.0)

            filt(i8, oi_ref)
            filt(q8, oq_ref)

        pl.run_scoped(
            body,
            pltpu.VMEM((nframes, RPAD), jnp.int8),
            pltpu.VMEM((nframes, RPAD), jnp.int8),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "tile_out"))
def decimate_int8(i8: jax.Array, q8: jax.Array, interpret: bool = False,
                  tile_out: int = TILE_OUT):
    """Decimate int8 I/Q by 750 with the Pallas kernel.

    Args:
      i8, q8: (n,) int8 with n = HISTORY + 750*M and M % tile_out == 0
        (prepend HISTORY carry samples; pad M up with zeros and drop).

    Returns:
      (M,) float32 I and Q at 3200 sps, scaled by 1/128.
    """
    n = i8.shape[-1]
    m = (n - HISTORY) // R
    assert n == HISTORY + m * R and m % tile_out == 0, (n, m)
    assert tile_out % OUT_ROWS == 0
    tiles = m // tile_out
    out_cols = tile_out // OUT_ROWS
    bank = jnp.zeros((RPAD, PHASES), jnp.float32).at[:R].set(
        jnp.asarray(_polyphase_bank()))

    def prep(x):
        fr = x.reshape(n // R, R)
        return jnp.pad(fr, ((0, 1), (0, RPAD - R)))

    oi, oq = pl.pallas_call(
        _make_kernel(tile_out),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((OUT_ROWS, out_cols), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((OUT_ROWS, out_cols), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tiles * OUT_ROWS, out_cols), jnp.float32),
            jax.ShapeDtypeStruct((tiles * OUT_ROWS, out_cols), jnp.float32),
        ],
        interpret=interpret,
    )(prep(i8), prep(q8), bank)
    return oi.reshape(m), oq.reshape(m)
