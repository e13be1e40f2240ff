#!/usr/bin/env python3
"""sort_rows_pallas vs jax.lax.sort at the FFV1 device-pipeline shapes.

Shapes benchmarked (1080p / 30-slice):
  * layout sort: (30, 131072) x 2 operands, 1 key   (pixels+sentinels/slice)
  * class sort:  (1, 65536) x 4 operands, 1 key     (group domain)
  * unsort:      (1, 4194304) x {7, 10} operands, 1 key (flat cell domain)
Run on the real chip through the tunnel (RTT-corrected).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

from ffmpeg_ffv2_tpu.ops.sort_pallas import sort_rows_pallas


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    probe = jax.jit(lambda x: jnp.sum(x.ravel()[:128]))

    def sync(r):
        float(probe(jax.tree_util.tree_leaves(r)[0]))

    def timed(fn, args, n=5, rtt=0.0):
        r = fn(*args)
        sync(r)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            r = fn(*args)
            sync(r)
            ts.append(time.perf_counter() - t0)
        return max(min(ts) - rtt, 0.0)

    tiny = jax.jit(lambda x: x[:1] + 1)
    z = jnp.zeros((8, 128), jnp.int32)
    sync(tiny(z))
    t0 = time.perf_counter()
    for _ in range(3):
        sync(tiny(z))
    rtt = (time.perf_counter() - t0) / 3
    print(f"backend={jax.default_backend()} rtt={rtt*1e3:.2f} ms", flush=True)

    lax_sort = jax.jit(lambda ops: jax.lax.sort(ops, num_keys=1,
                                                dimension=1))
    pl_sort = jax.jit(lambda ops: sort_rows_pallas(ops, num_keys=1))

    import sys
    cases = [
        ("layout (30,131072)x2", 30, 1 << 17, 2),
        ("class  (1,65536)x4", 1, 1 << 16, 4),
        ("unsort (1,4194304)x7", 1, 1 << 22, 7),
        ("unsort (1,4194304)x10", 1, 1 << 22, 10),
    ]
    if len(sys.argv) > 1:
        sel = sys.argv[1]
        cases = [c for c in cases if sel in c[0]]
    for name, B, M, n_ops in cases:
        rng = np.random.RandomState(1)
        key = np.stack([rng.permutation(M).astype(np.int32)
                        for _ in range(B)])
        ops = [jnp.asarray(key)] + [
            jnp.asarray(rng.randint(0, 1 << 30, (B, M), dtype=np.int32))
            for _ in range(n_ops - 1)]
        try:
            tx = timed(lax_sort, (ops,), rtt=rtt)
        except Exception as e:
            tx = float("nan")
            print(f"lax.sort failed: {e}", flush=True)
        try:
            tp = timed(pl_sort, (ops,), rtt=rtt)
            g = pl_sort(ops)
            w = lax_sort(ops)
            ok = all(bool(jnp.all(a == b)) for a, b in zip(g, w))
        except Exception as e:
            import traceback
            traceback.print_exc()
            tp, ok = float("nan"), False
        el = B * M
        print(f"{name:24s} lax {tx*1e3:8.2f} ms ({el/max(tx,1e-9)/1e6:7.1f}"
              f" Mel/s)  pallas {tp*1e3:8.2f} ms "
              f"({el/max(tp,1e-9)/1e6:7.1f} Mel/s)  "
              f"speedup {tx/tp if tp else 0:5.1f}x  exact={ok}", flush=True)


if __name__ == "__main__":
    main()
