#!/usr/bin/env python3
"""Candidate unsort formulations, measured at the 1080p/30 shape.

The cell unsort is a PERMUTATION (key = stream index, globally unique)
of ~3.5M records x (1 key + W payload words).  Candidates:

  A. global 1xN lax.sort            (round-2 baseline, ~213 ms @ 10 ops)
  B. global 1xN pallas bitonic      (ops/sort_pallas, ~112 ms @ 10 ops)
  C. per-slice BATCHED lax.sort     (needs the slice-segmented layout;
     (S, cap) rows, slice-local keys)
  D. per-slice pallas vmem rowsort  (same shape, _sort_vmem grid=S)

and payload widths W in {5, 8} (priority-packed sv words vs full).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    from ffmpeg_ffv2_tpu.ops.sort_pallas import sort_rows_pallas

    P = lambda *a: print(*a, flush=True)
    rng = np.random.RandomState(0)
    S, cap = 30, 1 << 17               # 131072 cells/slice (npix*9/8 pad)

    probe = jax.jit(lambda x: jnp.sum(x.ravel()[:128]))

    def timed(name, fn, *args):
        r = fn(*args)
        for x in jax.tree_util.tree_leaves(r):
            float(probe(x)); break
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            r = fn(*args)
            for x in jax.tree_util.tree_leaves(r):
                float(probe(x)); break
            ts.append(time.perf_counter() - t0)
        P(f"{name}: {min(ts) * 1e3:.1f} ms")

    for W in (5, 8):
        # batched per-slice: keys slice-local, ~12% empty (INT32MAX)
        keys = np.where(rng.rand(S, cap) < 0.88,
                        rng.randint(0, 1 << 17, (S, cap)),
                        np.iinfo(np.int32).max).astype(np.int32)
        pay = [jnp.asarray(rng.randint(-2**31, 2**31 - 1, (S, cap),
                                       dtype=np.int64).astype(np.int32))
               for _ in range(W)]
        keys_d = jnp.asarray(keys)

        f_lax = jax.jit(lambda k, *p: jax.lax.sort((k, *p), num_keys=1,
                                                   dimension=1))
        timed(f"C lax batched (S={S},cap={cap}) W={W}", f_lax, keys_d, *pay)

        f_pal = jax.jit(lambda k, *p: sort_rows_pallas((k, *p), num_keys=1))
        timed(f"D pallas rowsort (S={S},cap={cap}) W={W}", f_pal,
              keys_d, *pay)

        # global 1xN for comparison
        M = S * cap
        kg = jnp.asarray(keys.reshape(1, M))
        pg = [x.reshape(1, M) for x in pay]
        timed(f"A lax global (1x{M}) W={W}", f_lax, kg, *pg)
        timed(f"B pallas global (1x{M}) W={W}", f_pal, kg, *pg)


if __name__ == "__main__":
    main()
