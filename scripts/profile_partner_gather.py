"""A/B the partner-attribute gather strategies in contact_t on the chip.

The contacts stage marginal is ~2.5 ms at N=10k, K=8 (profile_stress), and
its dominant cost is the partner gather: the current channel-major
``take([16, N], [K, N], axis=1)`` lowers to ~1.2M scalar-element reads
(16 channels x 80k indices, each slice a strided column of the table).

Candidates:
  chan   — current: take(packed_t [16,N], idx [K,N], axis=1) -> [16,K,N]
  row    — ONE row gather: take(packed [N,16], flat idx [K*N], axis=0)
           -> [K*N,16] (contiguous 64B rows at the gather unit's row rate),
           then ONE explicit transpose -> [16, K*N].  The round-2 failure
           mode was slicing channels straight out of the [K,N,16] gather
           (re-reads the padded tile per channel); the explicit transpose
           pays the relayout once.
  rowT   — row gather then per-channel dynamic-slice AFTER a reshape to
           [K, N, 16] (control: the known-bad layout).

Each variant sums its planes so XLA cannot DCE, and runs under a 50-iter
scan like the real step.

Usage: python scripts/profile_partner_gather.py [N] [K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

STEPS = 50


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    key = jax.random.PRNGKey(0)
    packed_t = jax.random.normal(key, (16, n), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (k, n), 0, n)

    def consume(planes):
        # touch every plane like the SAT front end does (cheap VPU math so
        # the gather dominates but nothing is DCE'd)
        acc = 0.0
        for i in range(16):
            acc = acc + planes[i] * (0.5 + 0.03125 * i)
        return acc

    # the table/indices must DEPEND on the scan carry or XLA hoists the
    # gather out of the loop entirely (first run measured 0.001 ms/step)
    def evolve(pt, acc):
        return pt + 1e-12 * acc

    def chan(pt, ix):
        def body(carry, _):
            acc, ptc = carry
            g = jax.lax.optimization_barrier(jnp.take(ptc, ix, axis=1))
            planes = [g[i] for i in range(16)]
            acc = acc + consume(planes).sum()
            return (acc, evolve(ptc, acc)), None

        out, _ = jax.lax.scan(body, (0.0, pt), None, length=STEPS)
        return out[0]

    def row(pt, ix):
        def body(carry, _):
            acc, ptc = carry
            p = jnp.stack([ptc[i] for i in range(16)], axis=1)  # [N,16]
            g = jnp.take(p, ix.reshape(-1), axis=0)             # [K*N,16]
            g = jax.lax.optimization_barrier(g)
            gt = g.T.reshape(16, k, n)                          # ONE relayout
            planes = [gt[i] for i in range(16)]
            acc = acc + consume(planes).sum()
            return (acc, evolve(ptc, acc)), None

        out, _ = jax.lax.scan(body, (0.0, pt), None, length=STEPS)
        return out[0]

    def rowT(pt, ix):
        def body(carry, _):
            acc, ptc = carry
            p = jnp.stack([ptc[i] for i in range(16)], axis=1)
            g = jnp.take(p, ix.reshape(-1), axis=0).reshape(k, n, 16)
            g = jax.lax.optimization_barrier(g)
            planes = [g[..., i] for i in range(16)]             # known bad
            acc = acc + consume(planes).sum()
            return (acc, evolve(ptc, acc)), None

        out, _ = jax.lax.scan(body, (0.0, pt), None, length=STEPS)
        return out[0]

    from banggameengine_tpu.utils.profiling import measure_throughput

    for name, fn in (("chan", chan), ("row", row), ("rowT", rowT)):
        jf = jax.jit(fn)
        t0 = time.perf_counter()
        jax.block_until_ready(jf(packed_t, idx))
        tc = time.perf_counter() - t0
        # queued dispatches + ONE readback: per-call block_until_ready does
        # not synchronize on the tunneled runtime
        sec = measure_throughput(jf, packed_t, idx, calls=5, warmup=1)
        ms = sec / STEPS * 1e3
        print(f"{name:6s} {ms:8.3f} ms/step  (compile {tc:.1f}s)")


if __name__ == "__main__":
    main()
