"""Optimizer/schedule parity vs torch + gradient-accumulation semantics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from llm_bci_tpu.config import DictConfig
from llm_bci_tpu.training.optim import build_optimizer, build_schedule


def test_onecycle_matches_torch():
    import torch

    total, lr, pct, div = 100, 1e-3, 0.3, 25.0
    sched, _ = build_schedule(
        DictConfig({"lr": lr, "scheduler": "cosine", "warmup_pct": pct, "div_factor": div}),
        steps_per_epoch=100,
        num_epochs=1,
    )
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr)
    t_sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=lr, total_steps=total, pct_start=pct, div_factor=div
    )
    torch_lrs = []
    for _ in range(total):
        torch_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        t_sched.step()
    ours = [float(sched(i)) for i in range(total)]
    # optax and torch normalize the step fraction slightly differently
    # (boundary vs step-count); require the curves to agree within 5% of the
    # peak LR at every step.
    np.testing.assert_allclose(ours, torch_lrs, atol=0.05 * lr)
    # and exactly at the anchor points: start, peak, end
    assert abs(ours[0] - torch_lrs[0]) < 1e-8
    peak_ours, peak_torch = int(np.argmax(ours)), int(np.argmax(torch_lrs))
    assert abs(peak_ours - peak_torch) <= 1
    assert abs(max(ours) - lr) < 1e-9 and abs(max(torch_lrs) - lr) < 1e-9


def test_linear_schedule_shape():
    sched, total = build_schedule(
        DictConfig({"lr": 1e-3, "scheduler": "linear", "warmup_pct": 0.1}),
        steps_per_epoch=50,
        num_epochs=2,
    )
    assert total == 100
    assert float(sched(0)) < float(sched(10))              # warming up
    assert abs(float(sched(10)) - 1e-3) < 1e-4             # peak at warmup end
    assert float(sched(99)) < 2e-5                         # decayed to ~0


def test_step_schedule_per_epoch():
    sched, _ = build_schedule(
        DictConfig({"lr": 1e-2, "scheduler": "step", "gamma": 0.5}),
        steps_per_epoch=10,
        num_epochs=3,
    )
    assert float(sched(0)) == pytest.approx(1e-2)
    assert float(sched(9)) == pytest.approx(1e-2)
    assert float(sched(10)) == pytest.approx(5e-3)
    assert float(sched(20)) == pytest.approx(2.5e-3)


def test_gradient_accumulation_equals_mean_of_micro_grads():
    """MultiSteps(gas) update == one update with the mean of the micro-batch
    gradients (the reference's backward(loss/gas) accumulation intent)."""
    tx, _ = build_optimizer(
        DictConfig({
            "lr": 1e-2, "wd": 0.0, "eps": 1e-8,
            "scheduler": "step", "gamma": 1.0,
            "gradient_accumulation_steps": 2,
        }),
        steps_per_epoch=10,
        num_epochs=1,
    )
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    g1 = {"w": jnp.asarray([1.0, 2.0, 3.0])}
    g2 = {"w": jnp.asarray([3.0, 2.0, 1.0])}
    u1, state = tx.update(g1, state, params)
    p_mid = optax.apply_updates(params, u1)
    # No real update applied until the window closes.
    np.testing.assert_allclose(np.asarray(p_mid["w"]), np.ones(3))
    u2, state = tx.update(g2, state, p_mid)
    p_final = optax.apply_updates(p_mid, u2)

    tx_ref, _ = build_optimizer(
        DictConfig({
            "lr": 1e-2, "wd": 0.0, "eps": 1e-8,
            "scheduler": "step", "gamma": 1.0,
            "gradient_accumulation_steps": 1,
        }),
        steps_per_epoch=10,
        num_epochs=1,
    )
    state_ref = tx_ref.init(params)
    g_mean = {"w": (g1["w"] + g2["w"]) / 2}
    u_ref, _ = tx_ref.update(g_mean, state_ref, params)
    p_ref = optax.apply_updates(params, u_ref)
    np.testing.assert_allclose(
        np.asarray(p_final["w"]), np.asarray(p_ref["w"]), rtol=1e-6
    )


def test_grad_clip_norm_knob():
    """optimizer.grad_clip_norm clips by GLOBAL norm before the Adam
    moments: with norm 50 gradients and clip 1.0, the update must equal
    the unclipped optimizer fed gradients/50."""
    base = {"lr": 1.0, "scheduler": "linear", "warmup_pct": 0.0}
    params = {"w": jnp.zeros(3), "b": jnp.zeros(1)}
    grads = {"w": jnp.asarray([30.0, 40.0, 0.0]), "b": jnp.asarray([0.0])}

    tx, _ = build_optimizer(DictConfig({**base, "grad_clip_norm": 1.0}), 10, 1)
    up, _ = tx.update(grads, tx.init(params), params)

    tx2, _ = build_optimizer(DictConfig(base), 10, 1)
    scaled = jax.tree_util.tree_map(lambda g: g / 50.0, grads)
    up2, _ = tx2.update(scaled, tx2.init(params), params)
    for k in up:
        np.testing.assert_allclose(np.asarray(up[k]), np.asarray(up2[k]), rtol=1e-6)


def test_grad_clip_trains_under_fsdp(tmp_path):
    """The clip transform changes the opt-state pytree structure; the
    trainer's explicit FSDP opt-state shardings must still apply."""
    from tests.test_trainer_ndt1 import base_config, synth_dataset
    from llm_bci_tpu.training import Trainer

    cfg = base_config(tmp_path)
    cfg["optimizer"]["grad_clip_norm"] = 1.0
    cfg["parallelism"] = {"data": 2, "fsdp": 4, "fsdp_min_size": 16}
    trainer = Trainer(cfg, dataset=synth_dataset())
    trainer.train()
    loss, _ = trainer.evaluate()
    assert np.isfinite(loss)
