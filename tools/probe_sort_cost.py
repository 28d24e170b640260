#!/usr/bin/env python
"""Measure XLA argsort + permutation-gather cost at wavefront chunk sizes on
the current backend. r3 measured 28 ms sort + 27 ms per (N,3) gather at 1M
rays and rejected per-bounce reordering; the Pallas backend now runs 32k-ray
chunks, where these costs may be 30x smaller. In-dispatch repetition
(fori_loop with data-dependent carry) like tools/profile_stages.py — the
axon tunnel makes per-dispatch walls useless.
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps_lo=4, reps_hi=24):
    """Cost of one fn application via Δreps in-dispatch repetition."""

    @partial(jax.jit, static_argnames=("reps",))
    def loop(x0, reps):
        def body(_, x):
            return fn(x)

        return jax.lax.fori_loop(0, reps, body, x0)

    def run(reps):
        out = loop(args[0], reps)
        t0 = time.time()
        out = loop(args[0], reps)
        jax.tree.map(lambda a: np.asarray(a[..., :1]), out)
        return time.time() - t0

    run(reps_lo)  # compile both
    run(reps_hi)
    lo = min(run(reps_lo) for _ in range(3))
    hi = min(run(reps_hi) for _ in range(3))
    return (hi - lo) / (reps_hi - reps_lo)


def main():
    print("backend:", jax.default_backend())
    for n in (32768, 131072, 1 << 20):
        key = jax.random.PRNGKey(0)
        o = jax.random.uniform(key, (n, 3), jnp.float32)
        d = jax.random.normal(jax.random.PRNGKey(1), (n, 3), jnp.float32)
        keys = jax.random.randint(jax.random.PRNGKey(2), (n,), 0, 4096, jnp.uint32)

        # argsort: carry keys so each rep re-sorts a fresh permutation-ish
        t_sort = timed(lambda k: jnp.argsort(k).astype(jnp.uint32), keys)

        # (N,3) gather by a data-dependent permutation
        perm = jnp.argsort(keys)

        def gath(x):
            y = x[perm]
            return y + 1e-7  # keep carry dtype/shape

        t_gather3 = timed(gath, o)

        # (N,) scatter (inverse permutation apply)
        t1 = jnp.arange(n, dtype=jnp.float32)

        def scat(x):
            return jnp.zeros_like(x).at[perm].set(x) + 1e-7

        t_scatter1 = timed(scat, t1)

        # full bounce-reorder bundle: key compute + sort + permute o,d,tmax
        # + unsort (t, idx)
        tmax = jnp.full((n,), 1e9, jnp.float32)
        idx = jnp.arange(n, dtype=jnp.int32)

        def bundle(o):
            k = (
                (d[:, 0] < 0).astype(jnp.uint32) * 4
                + (d[:, 1] < 0).astype(jnp.uint32) * 2
                + (d[:, 2] < 0).astype(jnp.uint32)
            )
            cell = (
                jnp.clip((o[:, 0] * 8).astype(jnp.uint32), 0, 7) * 64
                + jnp.clip((o[:, 1] * 8).astype(jnp.uint32), 0, 7) * 8
                + jnp.clip((o[:, 2] * 8).astype(jnp.uint32), 0, 7)
            )
            p = jnp.argsort(cell * 8 + k)
            o_s, d_s, tm_s = o[p], d[p], tmax[p]
            # traversal stand-in: cheap reduce keeps deps honest
            t_res = o_s[:, 0] + d_s[:, 0] + tm_s
            i_res = idx
            inv = jnp.argsort(p)
            return o + (t_res[inv] + i_res[inv].astype(jnp.float32))[:, None] * 1e-9

        t_bundle = timed(bundle, o)

        print(
            f"n={n:>8}: argsort {t_sort*1e3:7.3f} ms   (N,3) gather "
            f"{t_gather3*1e3:7.3f} ms   (N,) scatter {t_scatter1*1e3:7.3f} ms   "
            f"full bundle {t_bundle*1e3:7.3f} ms"
        )


if __name__ == "__main__":
    main()
    sys.exit(0)
