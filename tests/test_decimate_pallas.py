"""Pallas int8 ingest kernel vs the jnp polyphase reference (interpret mode).

Runs with a small tile so the Pallas interpreter finishes quickly; the
kernel body (DMA slicing, dot_general contraction, block assembly) is
identical at production tile size.
"""

import jax.numpy as jnp
import numpy as np

from rtlsdr_ft8d_tpu.ops.decimate import HISTORY, R, polyphase_decimate
from rtlsdr_ft8d_tpu.ops.decimate_pallas import decimate_int8


def test_pallas_matches_jnp_reference():
    tile = 16
    m = 3 * tile
    n = HISTORY + m * R
    rng = np.random.default_rng(0)
    i8 = rng.integers(-127, 128, n).astype(np.int8)
    q8 = rng.integers(-127, 128, n).astype(np.int8)
    oi, oq = decimate_int8(jnp.asarray(i8), jnp.asarray(q8),
                           interpret=True, tile_out=tile)
    ri, rq = polyphase_decimate(jnp.asarray(i8.astype(np.float32)),
                                jnp.asarray(q8.astype(np.float32)))
    np.testing.assert_allclose(np.asarray(oi), np.asarray(ri) / 128.0,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(oq), np.asarray(rq) / 128.0,
                               rtol=1e-4, atol=1e-5)


def test_streaming_int8_matches_float(monkeypatch):
    """StreamingDecimatorInt8 (interpret mode) vs float StreamingDecimator."""
    from rtlsdr_ft8d_tpu.ops.decimate import (StreamingDecimator,
                                              StreamingDecimatorInt8)
    rng = np.random.default_rng(3)
    n = 32 * R
    i8 = rng.integers(-127, 128, n).astype(np.int8)
    q8 = rng.integers(-127, 128, n).astype(np.int8)
    ref = StreamingDecimator()
    ri, rq = ref.process(i8.astype(np.float32) / 128.0,
                         q8.astype(np.float32) / 128.0)
    dec = StreamingDecimatorInt8(interpret=True)
    oi, oq = dec.process(i8, q8)
    assert oi.shape == ri.shape
    np.testing.assert_allclose(oi, ri, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(oq, rq, rtol=1e-4, atol=1e-5)
