"""FFV2 TPU compute path: batched block transforms and lapped filters.

The transform is a fixed-point matmul (dsp.py) — on TPU all superblocks of
a frame run as one batched dot per pass.  Bit-exact with the numpy
reference on all inputs: both sides use mod-2^32 (int32 wraparound)
accumulation semantics (dsp._wrap32).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import dsp


@functools.partial(jax.jit, static_argnames=("n", "tx_type", "inverse"))
def _tx_batch(blocks, n, tx_type, inverse):
    """blocks: int32 [B, n, n] -> transformed int32 [B, n, n].

    int32 accumulation: valid Q12 content keeps every pass's dot products
    within int32 (Parseval bound ~2^29 at B=11); hostile overflow wraps
    mod 2^32, matching the numpy reference's _wrap32 semantics exactly.
    """
    m = jnp.asarray(dsp._basis(n, tx_type), dtype=jnp.int32)
    r = dsp._ROUND
    b = dsp._FRAC_BITS
    ptype = jnp.int32
    if not inverse:
        # numpy ref: rows = (x @ m.T + R) >> B ; out = (m @ rows + R) >> B
        rows = (jnp.einsum("bij,kj->bik", blocks, m,
                           preferred_element_type=ptype) + r) >> b
        out = (jnp.einsum("ai,bik->bak", m, rows,
                          preferred_element_type=ptype) + r) >> b
        return out
    else:
        # numpy ref: cols = (m.T @ c + R) >> B ; out = (cols @ m + R) >> B
        cols = (jnp.einsum("ai,bak->bik", m, blocks,
                           preferred_element_type=ptype) + r) >> b
        out = (jnp.einsum("bik,kj->bij", cols, m,
                          preferred_element_type=ptype) + r) >> b
        return out


def fwd_tx_batch(blocks: np.ndarray, tx_type: int = dsp.TX_DCT) -> np.ndarray:
    """Batched forward transform, bit-identical to dsp.fwd_tx_2d."""
    n = blocks.shape[-1]
    return np.asarray(_tx_batch(jnp.asarray(blocks, dtype=jnp.int32), n,
                                tx_type, False))


def inv_tx_batch(coeffs: np.ndarray, tx_type: int = dsp.TX_DCT) -> np.ndarray:
    n = coeffs.shape[-1]
    return np.asarray(_tx_batch(jnp.asarray(coeffs, dtype=jnp.int32), n,
                                tx_type, True))
