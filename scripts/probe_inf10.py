"""GAT serving pass-1/pass-2 per-chunk dissection (round-4 follow-up:
GAT full-graph serves at 8.6M e/s = ~0.95 ms per chunk-pass vs an op-sum
estimate of ~0.45; find the gap for the round-5 agenda).

Phases (single chunk, measure_op device loops; E_C=16384, span=512, H=4,
d=128, N=500k):
  p1_gather — slices + er[src] row gather
  p1_oh     — + one-hot band build + el one-hot matmul
  p1_max    — + per-head masked max reduces
  p1_full   — + exp/w one-hot sum + m/s slice fold (carry big m/s)
  p2_full   — pass-2 body (z[src] gather + alpha + msg + part matmul + fold)

Run: timeout 2400 python -u scripts/probe_inf10.py > /tmp/probe_inf10.log 2>&1
"""

import numpy as np

N, H, D, E_C, SPAN = 500_000, 4, 128, 1 << 14, 512
NNZ = 15_000_000


def main():
    import jax
    import jax.numpy as jnp

    from dist_gnn_tpu.utils.platform import enable_compile_cache
    from dist_gnn_tpu.utils.timing import measure_op

    enable_compile_cache()
    rng = np.random.default_rng(0)
    f32 = jnp.float32
    neg = f32(-1e30)
    indices_p = jnp.asarray(rng.integers(0, N, NNZ + E_C).astype(np.int32))
    erows_p = jnp.asarray(
        np.minimum(np.arange(NNZ + E_C) // 30, N - 1).astype(np.int32)
    )
    el = jnp.asarray(rng.standard_normal((N + SPAN + 1, H)), f32)
    er = jnp.asarray(rng.standard_normal((N, H)), f32)
    z = jnp.asarray(rng.standard_normal((N, H * D)), jnp.bfloat16)
    m_t = jnp.asarray(rng.standard_normal((N + SPAN + 1, H)), f32)
    rs_t = jnp.asarray(np.abs(rng.standard_normal((N + SPAN + 1, H))), f32)
    iota = jnp.arange(E_C, dtype=jnp.int32)
    span_iota = jnp.arange(SPAN + 1, dtype=jnp.int32)

    def body(c, stop, arrs, carry=None):
        indices_p, erows_p, el, er = arrs
        base = (c * E_C) % NNZ
        src = jax.lax.dynamic_slice(indices_p, (base,), (E_C,))
        rows = jax.lax.dynamic_slice(erows_p, (base,), (E_C,))
        lo = rows[0]
        local = jnp.clip(rows - lo, 0, SPAN)
        er_e = er[src]
        if stop == "p1_gather":
            return jnp.sum(er_e)
        oh_b = local[:, None] == span_iota[None, :]
        oh = oh_b.astype(f32)
        el_c = jax.lax.dynamic_slice(el, (lo, 0), (SPAN + 1, H))
        el_e = jax.lax.dot_general(
            oh, el_c, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )
        score = jax.nn.leaky_relu(el_e + er_e, 0.2)
        if stop == "p1_oh":
            return jnp.sum(score)
        part_m = jnp.stack(
            [
                jnp.max(jnp.where(oh_b, score[:, h : h + 1], neg), axis=0)
                for h in range(H)
            ],
            axis=1,
        )
        if stop == "p1_max":
            return jnp.sum(jnp.where(part_m > neg, part_m, 0.0))
        m, s = carry
        cur_m = jax.lax.dynamic_slice(m, (lo, 0), (SPAN + 1, H))
        cur_s = jax.lax.dynamic_slice(s, (lo, 0), (SPAN + 1, H))
        m_new = jnp.maximum(cur_m, part_m)
        m_e = jax.lax.dot_general(
            oh, m_new, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )
        w_ = jnp.exp(score - m_e)
        w_sum = jax.lax.dot_general(
            oh, w_, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )
        s_new = cur_s * jnp.exp(cur_m - m_new) + w_sum
        m = jax.lax.dynamic_update_slice(m, m_new, (lo, 0))
        s = jax.lax.dynamic_update_slice(s, s_new, (lo, 0))
        return m, s

    def body2(c, acc, arrs2):
        indices_p, erows_p, el, er, z, m_t, rs_t = arrs2
        base = (c * E_C) % NNZ
        src = jax.lax.dynamic_slice(indices_p, (base,), (E_C,))
        rows = jax.lax.dynamic_slice(erows_p, (base,), (E_C,))
        lo = rows[0]
        local = jnp.clip(rows - lo, 0, SPAN)
        oh_b = local[:, None] == span_iota[None, :]
        tbl = jnp.concatenate(
            [
                jax.lax.dynamic_slice(el, (lo, 0), (SPAN + 1, H)),
                jax.lax.dynamic_slice(m_t, (lo, 0), (SPAN + 1, H)),
                jax.lax.dynamic_slice(rs_t, (lo, 0), (SPAN + 1, H)),
            ],
            axis=1,
        )
        onto = jax.lax.dot_general(
            oh_b.astype(f32), tbl, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        el_e, m_e, rs_e = onto[:, :H], onto[:, H : 2 * H], onto[:, 2 * H :]
        score = jax.nn.leaky_relu(el_e + er[src], 0.2)
        alpha = jnp.exp(score - m_e) * rs_e
        msg = (alpha[:, :, None].astype(z.dtype) * z[src].reshape(E_C, H, D)).reshape(
            E_C, H * D
        )
        part = jax.lax.dot_general(
            oh_b.astype(msg.dtype), msg, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        cur = jax.lax.dynamic_slice(acc, (lo, 0), (SPAN + 1, H * D))
        return jax.lax.dynamic_update_slice(acc, cur + part, (lo, 0))

    arrs = (indices_p, erows_p, el, er)
    # arrays via args= (closure constants 413 the tunnel, NOTES #8); every
    # phase consumes its FULL result (NOTES #6)
    for stop in ("p1_gather", "p1_oh", "p1_max"):
        def step(cr, *arrs_, stop=stop):
            v = body(cr[0].astype(jnp.int32), stop, arrs_)
            return (cr[0] * 0.5 + v * 1e-20 + 1,)

        t = measure_op(step, (jnp.zeros(()),), iters=16, n_lo=2, n_hi=5,
                       args=arrs)
        print(f"{stop:10s}: {t*1e3:7.3f} ms/chunk", flush=True)

    def step_p1(carry, *arrs_):
        cnt, m, s = carry
        m, s = body(cnt.astype(jnp.int32), "full", arrs_, (m, s))
        return (cnt * 0.5 + (jnp.sum(m) + jnp.sum(s)) * 1e-20 + 1, m, s)

    m0 = jnp.full((N + SPAN + 1, H), -1e30, f32)
    s0 = jnp.zeros((N + SPAN + 1, H), f32)
    t = measure_op(step_p1, (jnp.zeros(()), m0, s0), iters=8, n_lo=2, n_hi=5,
                   args=arrs)
    print(f"p1_full   : {t*1e3:7.3f} ms/chunk", flush=True)

    def step_p2(carry, *arrs2):
        cnt, acc = carry
        acc = body2(cnt.astype(jnp.int32), acc, arrs2)
        return (cnt * 0.5 + jnp.sum(acc) * 1e-20 + 1, acc)

    acc0 = jnp.zeros((N + SPAN + 1, H * D), f32)
    t = measure_op(step_p2, (jnp.zeros(()), acc0), iters=8, n_lo=2, n_hi=5,
                   args=arrs + (z, m_t, rs_t))
    print(f"p2_full   : {t*1e3:7.3f} ms/chunk", flush=True)


if __name__ == "__main__":
    main()
