"""Shared timing methodology for the bench scripts.

One canonical implementation of the N-vs-3N marginal scan (previously copied
into five scripts, drifting formats): time a jitted program of N chained
iterations and one of 3N, force a VALUE FETCH on each (``block_until_ready``
can return at enqueue time on the axon tunnel — see bench.py), and report
``(T_3N - T_N) / 2N`` so the dispatch/fetch constant cancels.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp


def marginal_ms(make_scan, label: str, n: int = 10, width: int = 38,
                img_per_step: float | None = None) -> float:
    """``make_scan(k)`` -> zero-arg jitted fn whose scalar result depends on k
    chained iterations. Prints (and returns) the marginal ms/iteration; with
    ``img_per_step`` also prints the implied images/sec."""
    fns = {k: make_scan(k) for k in (n, 3 * n)}
    for f in fns.values():  # compile + warm
        float(np.asarray(f()))
    times = {}
    for k, f in fns.items():
        t0 = time.time()
        float(np.asarray(f()))
        times[k] = time.time() - t0
    ms = (times[3 * n] - times[n]) / (2 * n) * 1e3
    extra = f" {img_per_step / ms * 1e3:7.2f} img/s  " if img_per_step else "  "
    print(f"{label:{width}s} {ms:9.2f} ms/iter{extra}"
          f"(T{n}={times[n]:.2f}s T{3 * n}={times[3 * n]:.2f}s)", flush=True)
    return ms


def scan_of(body, x0, n: int):
    """Jitted program: ``body`` chained ``n`` times from carry ``x0`` via
    lax.scan, reduced to one f32 scalar (so the fetch is tiny and nothing is
    dead-code-eliminated). ``body``'s carry may be any pytree."""

    @jax.jit
    def run():
        def step(c, _):
            return body(c), None

        out, _ = jax.lax.scan(step, x0, None, length=n)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(out))

    return run
