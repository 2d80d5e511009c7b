"""Round-5: hoisted-SDDMM GAT kernel (gat_pallas v2) micro-measurement at
bench layer-0 shapes vs the round-4 numbers (fwd 0.70 ms / grads 1.94 ms
need_dx=False), plus the full GAT train step.
"""
import jax
import jax.numpy as jnp
import numpy as np

from dist_gnn_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

from dist_gnn_tpu.ops.gat_pallas import gat_attention
from dist_gnn_tpu.utils.timing import measure_op

S, K, E, H, D = 26624, 15, 100, 4, 128
rng = np.random.default_rng(0)
x_dst = jnp.asarray(rng.standard_normal((S, E)), jnp.bfloat16)
x_n = jnp.asarray(rng.standard_normal((K, S, E)), jnp.bfloat16)
mask_f = jnp.asarray((rng.random((S, K)) < 0.9).astype(np.float32))
wal = jnp.asarray(rng.standard_normal((E, H)) * 0.1, jnp.bfloat16)
war = jnp.asarray(rng.standard_normal((E, H)) * 0.1, jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((E, H * D)) * 0.1, jnp.bfloat16)


def fwd_step(c, x_dst, x_n, mask_f, wal, war, w):
    out = gat_attention(
        x_dst, x_n, mask_f, wal * (1 + c[0] * 1e-9), war, w, 0.2, False
    )
    return (c[0] * 0.5 + jnp.sum(out).astype(jnp.float32) * 1e-20 + 1,)


t_fwd = measure_op(fwd_step, (jnp.zeros(()),), iters=8,
                   args=(x_dst, x_n, mask_f, wal, war, w))
print(f"layer0 fwd: {t_fwd * 1e3:.3f} ms (round-4: 0.70)", flush=True)


def grad_step(c, x_dst, x_n, mask_f, wal, war, w):
    def loss(wal_, war_, w_):
        o = gat_attention(x_dst, x_n, mask_f, wal_, war_, w_, 0.2, False)
        return jnp.sum(o.astype(jnp.float32) * 1e-6)

    g = jax.grad(loss, argnums=(0, 1, 2))(wal * (1 + c[0] * 1e-9), war, w)
    leak = sum(jnp.sum(x).astype(jnp.float32) for x in g)
    return (c[0] * 0.5 + leak * 1e-20 + 1,)


t_g = measure_op(grad_step, (jnp.zeros(()),), iters=8,
                 args=(x_dst, x_n, mask_f, wal, war, w))
print(f"layer0 value_and_grad (need_dx=False): {t_g * 1e3:.3f} ms "
      f"(round-4: fwd+bwd 0.70+1.94)", flush=True)

# upper-layer shape (S=3072, K=10, E=512) with need_dx=True
S2, K2, E2 = 3072, 10, 512
x_dst2 = jnp.asarray(rng.standard_normal((S2, E2)), jnp.bfloat16)
x_n2 = jnp.asarray(rng.standard_normal((K2, S2, E2)), jnp.bfloat16)
mask2 = jnp.asarray((rng.random((S2, K2)) < 0.9).astype(np.float32))
wal2 = jnp.asarray(rng.standard_normal((E2, H)) * 0.1, jnp.bfloat16)
war2 = jnp.asarray(rng.standard_normal((E2, H)) * 0.1, jnp.bfloat16)
w2 = jnp.asarray(rng.standard_normal((E2, H * D)) * 0.1, jnp.bfloat16)


def grad_step2(c, x_dst, x_n, mask_f, wal, war, w):
    def loss(xd, xn, wal_, war_, w_):
        o = gat_attention(xd, xn, mask_f, wal_, war_, w_, 0.2, True)
        return jnp.sum(o.astype(jnp.float32) * 1e-6)

    g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        x_dst, x_n, wal * (1 + c[0] * 1e-9), war, w
    )
    leak = sum(jnp.sum(x).astype(jnp.float32) for x in g)
    return (c[0] * 0.5 + leak * 1e-20 + 1,)


t_g2 = measure_op(grad_step2, (jnp.zeros(()),), iters=8,
                  args=(x_dst2, x_n2, mask2, wal2, war2, w2))
print(f"layer1 value_and_grad (need_dx=True): {t_g2 * 1e3:.3f} ms "
      f"(round-4: 0.33 grads)", flush=True)
