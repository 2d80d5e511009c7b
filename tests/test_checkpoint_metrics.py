"""Checkpoint round-trip + metrics logger."""

import jax
import jax.numpy as jnp
import numpy as np

from dist_gnn_tpu.models import SAGE
from dist_gnn_tpu.training import Trainer
from dist_gnn_tpu.training.checkpoint import load_checkpoint, save_checkpoint


def test_checkpoint_roundtrip(tmp_path):
    model = SAGE(8, 16, 4, 2)
    trainer = Trainer(model=model, fan_out=(3, 3))
    state = trainer.init_state(jax.random.key(0))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    template = trainer.init_state(jax.random.key(99))  # different values
    restored = load_checkpoint(path, template)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_phase_timer_and_logger(tmp_path, capsys):
    from dist_gnn_tpu.utils.metrics import MetricsLogger, PhaseTimer

    t = PhaseTimer(warmup=1)
    for _ in range(3):
        t.start("sampling")
        x = jnp.ones(16).sum()
        t.stop("sampling", fence=x)
    rep = t.report()
    assert "sampling" in rep and rep["sampling"] >= 0

    log = MetricsLogger(path=str(tmp_path / "m.jsonl"), stdout=False)
    log.log("epoch", epoch=1, loss=0.5)
    log.close()
    import json

    rec = json.loads(open(tmp_path / "m.jsonl").read().strip())
    assert rec["event"] == "epoch" and rec["loss"] == 0.5


def test_checkpoint_shape_mismatch_raises(tmp_path):
    import pytest

    model = SAGE(8, 16, 4, 2)
    trainer = Trainer(model=model, fan_out=(3, 3))
    state = trainer.init_state(jax.random.key(0))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    # a template from a DIFFERENT model config (hidden 32) must be rejected
    # with a clear error naming the mismatched path, not load silently
    other = Trainer(model=SAGE(8, 32, 4, 2), fan_out=(3, 3))
    template = other.init_state(jax.random.key(1))
    with pytest.raises(ValueError, match="shape mismatch"):
        load_checkpoint(path, template)


def test_checkpoint_bf16_roundtrip_and_dtype_guard(tmp_path):
    """ml_dtypes params must round-trip exactly (np.savez degrades them to
    raw void fields without the byte-view sidecar — regression: saved
    fine, unrecoverable at resume), and a dtype-mismatched template must
    raise instead of silently casting weights."""
    import numpy as np

    from dist_gnn_tpu.models import SAGE
    from dist_gnn_tpu.training import Trainer
    from dist_gnn_tpu.training.checkpoint import load_checkpoint, save_checkpoint

    mb = SAGE(8, 16, 4, 2, param_dtype=jnp.bfloat16)
    trb = Trainer(model=mb, fan_out=(3, 3))
    st = trb.init_state(jax.random.key(0))
    save_checkpoint(str(tmp_path / "ck"), st)
    st2 = load_checkpoint(str(tmp_path / "ck"), trb.init_state(jax.random.key(1)))
    a = jax.tree.leaves(st.params)[1]
    b = jax.tree.leaves(st2.params)[1]
    assert a.dtype == b.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(a, np.float32), np.asarray(b, np.float32)
    )
    import pytest

    m32 = SAGE(8, 16, 4, 2, param_dtype=jnp.float32)
    tr32 = Trainer(model=m32, fan_out=(3, 3))
    with pytest.raises(ValueError, match="dtype mismatch"):
        load_checkpoint(str(tmp_path / "ck"), tr32.init_state(jax.random.key(0)))
