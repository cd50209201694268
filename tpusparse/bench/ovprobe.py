"""Isolate fixed overheads: per-dispatch, per-loop-iteration, per-op.

Run: python -m tpusparse.bench.ovprobe
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def bench(name, make_run, *args, reps):
    run = make_run(reps)
    jax.block_until_ready(run(*args))
    float(jnp.sum(run(*args)[0] if isinstance(run(*args), tuple) else run(*args)))
    t0 = time.perf_counter()
    out = run(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:52s} {dt * 1e3:8.3f} ms/unit")
    return dt


def main():
    mb = 143
    nrows = mb * 1024 * 1024 // (4 * 512)
    a = jnp.ones((nrows, 512), jnp.float32)
    c = a * 2.0

    # 1 axpy per loop iteration
    def one_per_iter(reps):
        @jax.jit
        def run(c, x):
            return jax.lax.fori_loop(0, reps, lambda i, v: c + 1.5 * v, x)
        return run

    # 4 chained axpys per loop iteration (unit = one axpy)
    def four_per_iter(reps):
        @jax.jit
        def run(c, x):
            def body(i, v):
                for _ in range(4):
                    v = c + 1.5 * v
                return v
            return jax.lax.fori_loop(0, reps // 4, body, x)
        return run

    # fully unrolled, no loop at all (unit = one axpy)
    def unrolled(reps):
        @jax.jit
        def run(c, x):
            for _ in range(reps):
                x = c + 1.5 * x
            return x
        return run

    # two INDEPENDENT axpy chains interleaved (can they overlap?)
    def two_chains(reps):
        @jax.jit
        def run(c, x):
            def body(i, vs):
                v1, v2 = vs
                return (c + 1.5 * v1, c + 1.25 * v2)
            return jax.lax.fori_loop(0, reps, body, (x, x * 1.1))
        return run

    bench("axpy x1/iter (fori_loop)", one_per_iter, c, a, reps=32)
    bench("axpy x4/iter (fori_loop)", four_per_iter, c, a, reps=32)
    bench("axpy unrolled x32 (no loop)", unrolled, c, a, reps=32)
    d = bench("2 indep axpys/iter (unit=iter)", two_chains, c, a, reps=32)
    print(f"  -> if overlapping, ~= x1/iter; if serial, ~2x")

    # per-dispatch cost: empty-ish program
    @jax.jit
    def tiny(x):
        return x + 1.0

    s = jnp.zeros((8, 128), jnp.float32)
    float(jnp.sum(tiny(s)))
    t0 = time.perf_counter()
    for _ in range(20):
        float(jnp.sum(tiny(s)))
    print(f"{'tiny dispatch+fetch round trip':52s} "
          f"{(time.perf_counter() - t0) / 20 * 1e3:8.3f} ms/unit")


if __name__ == "__main__":
    main()
