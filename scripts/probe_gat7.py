"""Round-5: isolate the upper-layer k-major gather h[safe.T] and its
scatter-add VJP at bench layer-1 shape (30720 rows of [26624, 512] bf16),
plus the layer-1 fused-kernel vag with the gather included — the
suspected non-kernel ~2 ms of the GAT model phase (probe_gat6).
"""
import jax
import jax.numpy as jnp
import numpy as np

from dist_gnn_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

from dist_gnn_tpu.utils.timing import measure_op

S_src, F = 26624, 512
S, K = 3072, 10
rng = np.random.default_rng(0)
h = jnp.asarray(rng.standard_normal((S_src, F)), jnp.bfloat16)
safeT = jnp.asarray(rng.integers(0, S_src, (K, S)).astype(np.int32))


def gather_fwd(c, h, safeT):
    idx = (safeT + c[0].astype(jnp.int32)) % S_src
    out = h[idx]
    return (c[0] + 1.0 + jnp.sum(out).astype(jnp.float32) * 1e-20,)


t = measure_op(gather_fwd, (jnp.zeros(()),), iters=16, args=(h, safeT))
print(f"gather fwd [K,S]={K}x{S} rows: {t * 1e3:.3f} ms", flush=True)


def gather_vjp(c, h, safeT):
    idx = (safeT + c[0].astype(jnp.int32)) % S_src

    def f(h_):
        return jnp.sum(h_[idx].astype(jnp.float32) * 1e-6)

    g = jax.grad(f)(h)  # scatter-add of [K, S, F] into [S_src, F]
    return (c[0] + 1.0 + jnp.sum(g).astype(jnp.float32) * 1e-20,)


t = measure_op(gather_vjp, (jnp.zeros(()),), iters=8, args=(h, safeT))
print(f"gather+scatter-add vjp: {t * 1e3:.3f} ms", flush=True)

# sort-based alternative: sort targets, segment-sum via sorted scatter
def scatter_sorted(c, dxn, safeT):
    idx = ((safeT + c[0].astype(jnp.int32)) % S_src).reshape(-1)
    order = jnp.argsort(idx)
    idx_s = idx[order]
    payload = dxn.reshape(-1, F)[order]
    out = jax.ops.segment_sum(
        payload, idx_s, num_segments=S_src, indices_are_sorted=True
    )
    return (c[0] + 1.0 + jnp.sum(out).astype(jnp.float32) * 1e-20,)


dxn = jnp.asarray(rng.standard_normal((K, S, F)), jnp.bfloat16)
t = measure_op(scatter_sorted, (jnp.zeros(()),), iters=8, args=(dxn, safeT))
print(f"sorted segment-sum alternative: {t * 1e3:.3f} ms", flush=True)


def scatter_plain(c, dxn, safeT):
    idx = (safeT + c[0].astype(jnp.int32)) % S_src
    out = jnp.zeros((S_src, F), jnp.float32).at[idx.reshape(-1)].add(
        dxn.reshape(-1, F).astype(jnp.float32)
    )
    return (c[0] + 1.0 + jnp.sum(out).astype(jnp.float32) * 1e-20,)


t = measure_op(scatter_plain, (jnp.zeros(()),), iters=8, args=(dxn, safeT))
print(f"plain scatter-add: {t * 1e3:.3f} ms", flush=True)
