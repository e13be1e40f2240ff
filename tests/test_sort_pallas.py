"""sort_rows_pallas vs jax.lax.sort (the kernel-vs-oracle pattern of
SURVEY §4's checkasm analogue)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ffmpeg_ffv2_tpu.ops.sort_pallas import sort_rows_pallas


def _ref(operands, num_keys):
    return jax.lax.sort(tuple(operands), num_keys=num_keys, dimension=1)


def _case(B, M, n_ops, num_keys, seed, interpret=True, chunk_log2=17,
          vmem_budget=10 << 20):
    rng = np.random.RandomState(seed)
    # unique keys: a permutation (+ INT_MAX padding tail per row)
    ops = []
    key = np.stack([rng.permutation(M).astype(np.int32) for _ in range(B)])
    npad = M // 5
    key[:, M - npad:] = np.iinfo(np.int32).max - np.arange(npad)
    ops.append(key)
    if num_keys == 2:
        # key0 has duplicates; (key0, key1) unique
        k0 = rng.randint(0, 7, (B, M)).astype(np.int32)
        k1 = np.stack([rng.permutation(M).astype(np.int32)
                       for _ in range(B)])
        ops = [k0, k1]
    for _ in range(n_ops - len(ops)):
        ops.append(rng.randint(-2**31, 2**31 - 1, (B, M), dtype=np.int32))
    ops = [jnp.asarray(o) for o in ops]
    got = sort_rows_pallas(ops, num_keys=num_keys, interpret=interpret,
                           chunk_log2=chunk_log2, vmem_budget=vmem_budget)
    want = _ref(ops, num_keys)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("B,M,n_ops,num_keys", [
    (1, 1024, 1, 1),
    (3, 1024, 2, 1),
    (2, 2048, 3, 2),
    (1, 4096, 9, 1),
    (2, 8192, 2, 1),
])
def test_sort_vmem_small(B, M, n_ops, num_keys):
    _case(B, M, n_ops, num_keys, seed=B * 100 + n_ops)


def test_sort_hier_small():
    # force the hierarchical path with a tiny vmem budget: chunk 1024,
    # M = 8192 -> 3 global merge stages with cross passes
    _case(1, 8192, 2, 1, seed=7, chunk_log2=10, vmem_budget=1024 * 2 * 4)


def test_sort_hier_multiword():
    _case(1, 16384, 4, 1, seed=11, chunk_log2=11,
          vmem_budget=2048 * 4 * 4)


def test_sort_duplicate_keys_payload_follows():
    # duplicate keys: order among equals is unspecified, but each
    # surviving (key, payload) pair must be an input pair
    rng = np.random.RandomState(3)
    B, M = 2, 2048
    key = rng.randint(0, 50, (B, M)).astype(np.int32)
    pay = rng.randint(0, 2**30, (B, M)).astype(np.int32)
    got_k, got_p = sort_rows_pallas(
        [jnp.asarray(key), jnp.asarray(pay)], num_keys=1, interpret=True)
    got_k, got_p = np.asarray(got_k), np.asarray(got_p)
    for b in range(B):
        assert (np.diff(got_k[b]) >= 0).all()
        want = sorted(zip(key[b], pay[b]))
        got = sorted(zip(got_k[b], got_p[b]))
        assert want == got
