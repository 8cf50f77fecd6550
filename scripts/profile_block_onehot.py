"""A/B partner-velocity reads at flat-MW shapes on chip: gather vs block
one-hot (einsum form vs mul-reduce form).  N=16000, B=16, C=12 slots.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from banggameengine_tpu.utils.profiling import measure_throughput

STEPS = 50
N, B, C, CH = 16000, 16, 12, 6
W = N // B


def main():
    k0 = jax.random.PRNGKey(0)
    packed = jax.random.normal(k0, (CH, N), jnp.float32)
    base = (jnp.arange(N, dtype=jnp.int32) // B) * B
    prt = base[None, :] + jax.random.randint(
        jax.random.PRNGKey(1), (C, N), 0, B)
    is_static = jax.random.bernoulli(jax.random.PRNGKey(2), 0.3, (C, N))
    prt = jnp.where(is_static, -1, prt)
    safe = jnp.maximum(prt, 0)
    lp = jnp.clip(safe - base[None, :], 0, B - 1)
    ohf = jnp.where(
        is_static[:, None, :], 0.0,
        (jnp.arange(B, dtype=jnp.int32)[None, :, None]
         == lp[:, None, :]).astype(jnp.float32))            # [C, B, N]
    ohb = (~is_static[:, None, :]) & (
        jnp.arange(B, dtype=jnp.int32)[None, :, None] == lp[:, None, :])
    prec = (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST)

    def consume(g):
        return (g * (1.0 + jnp.arange(C, dtype=jnp.float32))[None, :, None]
                ).sum()

    def loop(read):
        def run(pt):
            def body(carry, _):
                acc, p = carry
                g = read(p)
                acc = acc + consume(g)
                return (acc, p + 1e-12 * acc), None
            out, _ = jax.lax.scan(body, (0.0, pt), None, length=STEPS)
            return out[0]
        return jax.jit(run)

    def read_gather(p):
        g = jax.lax.optimization_barrier(jnp.take(p, safe, axis=1))
        return jnp.where(is_static[None], 0.0, g)

    def v3_of(p):
        v2 = p.reshape(CH, W, B).transpose(0, 2, 1)
        return jnp.broadcast_to(
            v2[:, :, :, None], (CH, B, W, B)).reshape(CH, B, N)

    def read_einsum(p):
        return jnp.einsum("sbn,cbn->csn", ohf, v3_of(p), precision=prec)

    def read_mulreduce(p):
        v3 = v3_of(p)
        return jnp.sum(jnp.where(ohb[None], v3[:, None], 0.0), axis=2)

    def read_matmul(p):
        # [C*B, N] one-hot as a dense matmul against... not applicable
        return None

    for name, read in (("gather", read_gather), ("einsum", read_einsum),
                       ("mulreduce", read_mulreduce)):
        jf = loop(read)
        t0 = time.perf_counter()
        jax.block_until_ready(jf(packed))
        tc = time.perf_counter() - t0
        sec = measure_throughput(jf, packed, calls=5, warmup=1)
        print(f"{name:10s} {sec / STEPS * 1e3:8.3f} ms/step (compile {tc:.1f}s)")


if __name__ == "__main__":
    main()
