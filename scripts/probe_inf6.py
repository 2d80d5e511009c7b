"""Per-chunk dissection of the span-chunk inference body (round-4).

At span=512, edge_chunk=16384 the SAGE walk costs ~1.3 ms/chunk vs an
expected ~0.25 (gather 0.16 + onehot matmul 0.05).  Isolate:

  gather  — dynamic_slice src/rows + h[src] row gather
  matmul  — + one-hot [E, span+1] build + MXU contraction
  small   — full body folding into a SMALL [span+1, F] accumulator
  big     — full body folding into the real [N+span+1, F] accumulator
            (tests whether the loop carry update is in-place or a copy)
  big_x4  — big with 4 chunks per measured step (amortize measure floor)

Run: timeout 2400 python -u scripts/probe_inf6.py > /tmp/probe_inf6.log 2>&1
"""

import numpy as np

N, F, E_C, SPAN = 500_000, 100, 1 << 14, 512
NNZ = 15_000_000


def main():
    import jax
    import jax.numpy as jnp

    from dist_gnn_tpu.utils.platform import enable_compile_cache
    from dist_gnn_tpu.utils.timing import measure_op

    enable_compile_cache()
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((N, F)), jnp.bfloat16)
    indices_p = jnp.asarray(rng.integers(0, N, NNZ + E_C).astype(np.int32))
    # monotone rows ~deg 30
    rows_np = np.minimum(np.arange(NNZ + E_C) // 30, N - 1).astype(np.int32)
    erows_p = jnp.asarray(rows_np)
    iota = jnp.arange(E_C, dtype=jnp.int32)
    span_iota = jnp.arange(SPAN + 1, dtype=jnp.int32)

    def chunk_core(c, stop, acc=None):
        base = (c * E_C) % NNZ
        src = jax.lax.dynamic_slice(indices_p, (base,), (E_C,))
        rows = jax.lax.dynamic_slice(erows_p, (base,), (E_C,))
        lo = rows[0]
        valid = iota < E_C  # always true here
        local = jnp.clip(rows - lo, 0, SPAN)
        msg = h[src]
        if stop == "gather":
            return jnp.sum(msg.astype(jnp.float32))
        oh = (local[:, None] == span_iota[None, :]).astype(msg.dtype)
        part = jax.lax.dot_general(
            oh, msg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if stop == "matmul":
            return jnp.sum(part)
        cur = jax.lax.dynamic_slice(acc, (lo, 0), (SPAN + 1, F))
        return jax.lax.dynamic_update_slice(acc, cur + part, (lo, 0))

    for stop in ("gather", "matmul"):
        def step(cr, stop=stop):
            c = cr[0].astype(jnp.int32)
            v = chunk_core(c, stop)
            return (cr[0] * 0.5 + v * 1e-20 + 1,)

        t = measure_op(step, (jnp.zeros(()),), iters=16, n_lo=2, n_hi=5)
        print(f"{stop:7s}: {t*1e3:7.3f} ms/chunk", flush=True)

    for nm, nchunk, big in (("small", 1, False), ("big", 1, True), ("big_x4", 4, True)):
        rows_acc = (N + SPAN + 1) if big else (SPAN + 1)

        def step(carry, nchunk=nchunk, big=big):
            cnt, acc = carry
            c = cnt.astype(jnp.int32)
            for j in range(nchunk):
                if big:
                    acc = chunk_core(c + j, "full", acc)
                else:
                    # small acc: ignore lo, fold at 0
                    base = ((c + j) * E_C) % NNZ
                    src = jax.lax.dynamic_slice(indices_p, (base,), (E_C,))
                    rows = jax.lax.dynamic_slice(erows_p, (base,), (E_C,))
                    local = jnp.clip(rows - rows[0], 0, SPAN)
                    msg = h[src]
                    oh = (local[:, None] == span_iota[None, :]).astype(msg.dtype)
                    acc = acc + jax.lax.dot_general(
                        oh, msg, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            return (cnt * 0.5 + jnp.sum(acc[:2]) * 1e-20 + 1, acc)

        acc0 = jnp.zeros((rows_acc, F), jnp.float32)
        t = measure_op(step, (jnp.zeros(()), acc0), iters=8, n_lo=2, n_hi=5)
        print(f"{nm:7s}: {t/nchunk*1e3:7.3f} ms/chunk", flush=True)


if __name__ == "__main__":
    main()
