"""GAT layer-0 dissection at bench shapes (round-2 VERDICT #4).

BENCH_r02: GAT 20.5M edges/s vs SAGE 49M on identical blocks → ~2.4x
per-step cost beyond the gather.  This probe measures layer 0 (the
contiguous_first block: S=26624 dst, k=15, H=4, d=128, in=100 bf16)
forward AND value_and_grad under several aggregation formulations:

  cur   — shipped per-head slice loop (models/gat.py contiguous_first)
  rsh   — [S, k, H, d] reshape + alpha broadcast (the non-contig form)
  bmm   — head-batched dot_general: alpha [S,H,1,k] x z [S,H,k,d]
  a16   — cur with alpha cast to bf16 for the big multiply

Run on the real TPU: timeout 1200 python -u scripts/probe_gat1.py > /tmp/probe_gat1.log 2>&1
"""

import numpy as np

S, K, H, D_IN, D_OUT = 26624, 15, 4, 100, 128
NEG = 0.2


def main():
    import jax
    import jax.numpy as jnp

    from dist_gnn_tpu.utils.platform import enable_compile_cache
    from dist_gnn_tpu.utils.timing import measure_op

    enable_compile_cache()
    rng = np.random.default_rng(0)
    HD = H * D_OUT
    x = jnp.asarray(
        rng.standard_normal((S + S * K, D_IN)).astype(np.float32)
    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((D_IN, HD)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    a_l = jnp.asarray(rng.standard_normal((H, D_OUT)).astype(np.float32) * 0.1)
    a_r = jnp.asarray(rng.standard_normal((H, D_OUT)).astype(np.float32) * 0.1)
    mask = jnp.asarray(rng.random((S, K)) < 0.93)

    def project(w_, h):
        z = jnp.dot(h, w_, preferred_element_type=jnp.float32).astype(h.dtype)
        eye = jnp.eye(H, dtype=z.dtype)
        al = jnp.einsum("hd,hg->hdg", a_l.astype(z.dtype), eye)
        ar = jnp.einsum("hd,hg->hdg", a_r.astype(z.dtype), eye)
        A = jnp.concatenate(
            [al.reshape(HD, H), ar.reshape(HD, H)], axis=1
        )
        eler = jnp.dot(z, A, preferred_element_type=jnp.float32)
        return z, eler[:, :H], eler[:, H:]

    def softmax(scores):
        neg = jnp.float32(-1e30)
        s = jnp.where(mask[:, :, None], scores, neg)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.where(mask[:, :, None], jnp.exp(s - m), 0.0)
        return e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-12)

    def common(w_, x_=None):
        z, el_all, er = project(w_, x if x_ is None else x_)
        el = el_all[:S]
        er_n = er[S:].reshape(S, K, H)
        scores = jax.nn.leaky_relu(el[:, None, :] + er_n, NEG)
        alpha = softmax(scores)  # [S, K, H] f32
        return z, alpha

    def agg_cur(w_, x_=None):
        z, alpha = common(w_, x_)
        z_nb = z[S:]
        outs = [
            jnp.sum(
                z_nb[:, h * D_OUT : (h + 1) * D_OUT].reshape(S, K, D_OUT)
                * alpha[:, :, h, None].astype(z.dtype),
                axis=1,
            )
            for h in range(H)
        ]
        return jnp.concatenate(outs, axis=1)

    def agg_a16(w_, x_=None):
        z, alpha = common(w_, x_)
        al16 = alpha.astype(jnp.bfloat16)
        z_nb = z[S:]
        outs = [
            jnp.sum(
                z_nb[:, h * D_OUT : (h + 1) * D_OUT].reshape(S, K, D_OUT)
                * al16[:, :, h, None],
                axis=1,
            )
            for h in range(H)
        ]
        return jnp.concatenate(outs, axis=1)

    def agg_rsh(w_, x_=None):
        z, alpha = common(w_, x_)
        z_n = z[S:].reshape(S, K, H, D_OUT)
        out = jnp.sum(z_n * alpha[..., None].astype(z_n.dtype), axis=1)
        return out.reshape(S, HD)

    def agg_bmm(w_, x_=None):
        z, alpha = common(w_, x_)
        z_n = z[S:].reshape(S, K, H, D_OUT).transpose(0, 2, 1, 3)  # [S,H,K,D]
        al = alpha.transpose(0, 2, 1).astype(z_n.dtype)  # [S,H,K]
        out = jax.lax.dot_general(
            al[:, :, None, :], z_n,
            (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )  # [S,H,1,D]
        return out[:, :, 0, :].reshape(S, HD).astype(z.dtype)

    def common_noz(w_, x_):
        """Scores WITHOUT materializing z: el/er = z @ A = x @ (W @ A),
        a [D_IN, 2H] folded matrix — the [S*K, H*D] projection never
        happens for scoring."""
        eye = jnp.eye(H, dtype=jnp.float32)
        al = jnp.einsum("hd,hg->hdg", a_l, eye).reshape(HD, H)
        ar = jnp.einsum("hd,hg->hdg", a_r, eye).reshape(HD, H)
        A = jnp.concatenate([al, ar], axis=1)  # [HD, 2H]
        WA = jnp.dot(w_.astype(jnp.float32), A)  # [D_IN, 2H] — tiny
        eler = jnp.dot(
            x_, WA.astype(x_.dtype), preferred_element_type=jnp.float32
        )
        el = eler[:S, :H]
        er_n = eler[S:, H:].reshape(S, K, H)
        scores = jax.nn.leaky_relu(el[:, None, :] + er_n, NEG)
        return softmax(scores)  # [S, K, H]

    def agg_agp(w_, x_=None):
        """Aggregate-then-project (exact: attention commutes with the
        shared W): weighted-sum RAW x (E=100-dim) per head, then one
        [S, E] x [E, D] matmul per head — z is never materialized."""
        x_ = x if x_ is None else x_
        alpha = common_noz(w_, x_)
        x_n = x_[S:].reshape(S, K, D_IN)
        outs = []
        for h in range(H):
            agg = jnp.sum(x_n * alpha[:, :, h, None].astype(x_n.dtype), axis=1)
            outs.append(
                jnp.dot(
                    agg, w_[:, h * D_OUT : (h + 1) * D_OUT],
                    preferred_element_type=jnp.float32,
                ).astype(x_n.dtype)
            )
        return jnp.concatenate(outs, axis=1)

    def agg_agb(w_, x_=None):
        """Aggregate-then-project with a single batched einsum over heads
        (one pass over x_n instead of H)."""
        x_ = x if x_ is None else x_
        alpha = common_noz(w_, x_)
        x_n = x_[S:].reshape(S, K, D_IN)
        agg = jnp.einsum(
            "skh,ske->she", alpha.astype(x_n.dtype), x_n
        )  # [S, H, E]
        outs = [
            jnp.dot(
                agg[:, h, :], w_[:, h * D_OUT : (h + 1) * D_OUT],
                preferred_element_type=jnp.float32,
            ).astype(x_n.dtype)
            for h in range(H)
        ]
        return jnp.concatenate(outs, axis=1)

    variants = dict(
        cur=agg_cur, a16=agg_a16, rsh=agg_rsh, bmm=agg_bmm,
        agp=agg_agp, agb=agg_agb,
    )
    for name, fn in variants.items():
        def fwd_step(c, x_arg, fn=fn):
            # carry perturbation must be non-foldable (NOT *0) and the FULL
            # output must be consumed (NOTES #6)
            out = fn(w + c[0].astype(jnp.bfloat16) * jnp.bfloat16(1e-8), x_arg)
            return (c[0] * 0.5 + jnp.sum(out).astype(jnp.float32) * 1e-20 + 1,)

        t = measure_op(
            fwd_step, (jnp.zeros(()),), iters=16, n_lo=2, n_hi=5, args=(x,)
        )
        print(f"fwd  {name}: {t*1e3:7.3f} ms", flush=True)

    for name, fn in variants.items():
        def loss(w_, x_, fn=fn):
            return jnp.sum(fn(w_, x_).astype(jnp.float32) ** 2)

        g = jax.grad(loss)

        def gstep(c, x_arg, fn=fn, g=g):
            gr = g(w + c[0].astype(jnp.bfloat16) * jnp.bfloat16(1e-8), x_arg)
            return (c[0] * 0.5 + jnp.sum(gr).astype(jnp.float32) * 1e-20 + 1,)

        t = measure_op(
            gstep, (jnp.zeros(()),), iters=8, n_lo=2, n_hi=5, args=(x,)
        )
        print(f"grad {name}: {t*1e3:7.3f} ms", flush=True)

    # numerical agreement
    outs = {n: np.asarray(fn(w, x), np.float32) for n, fn in variants.items()}
    for n in ("a16", "rsh", "bmm", "agp", "agb"):
        d = np.abs(outs[n] - outs["cur"]).max()
        print(f"max|{n} - cur| = {d:.5f}")


if __name__ == "__main__":
    main()
