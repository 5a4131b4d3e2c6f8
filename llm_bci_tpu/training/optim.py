"""Optimizer + LR schedule construction (optax).

Semantics match the reference ``build_optimizer_and_scheduler``
(``models/trainer.py:227-253``): AdamW with one of
* ``linear`` — HF linear-warmup-then-linear-decay,
* ``cosine`` — torch OneCycleLR (cos anneal, ``div_factor`` initial ratio),
* ``step``   — per-*epoch* gamma decay (StepLR stepped once per epoch).

Gradient accumulation uses ``optax.MultiSteps`` — conventional semantics
(accumulate gas micro-batches, then step). The reference's off-by-one
(optimizer steps on the *first* micro-batch of each window,
``models/trainer.py:335``) is a bug we deliberately do not replicate
(SURVEY.md §3.1 note).
"""
from __future__ import annotations

from typing import Tuple

import optax


def build_schedule(opt_cfg, steps_per_epoch: int, num_epochs: int):
    """Returns (schedule_fn, updates_per_epoch). ``steps_per_epoch`` counts
    dataloader iterations; optimizer updates divide by accumulation."""
    gas = int(opt_cfg.get("gradient_accumulation_steps", 1) or 1)
    total_updates = max(1, num_epochs * steps_per_epoch // gas)
    lr = float(opt_cfg["lr"])
    name = opt_cfg.get("scheduler", "step")

    if name == "linear":
        warmup = round(float(opt_cfg.get("warmup_pct", 0.0)) * total_updates)
        if warmup == 0:
            # HF get_linear_schedule_with_warmup with 0 warmup steps starts
            # at FULL lr; the joined 1-step ramp would waste the first
            # update at lr 0.
            return optax.linear_schedule(lr, 0.0, max(total_updates, 1)), total_updates
        return (
            optax.join_schedules(
                [
                    optax.linear_schedule(0.0, lr, warmup),
                    optax.linear_schedule(lr, 0.0, max(total_updates - warmup, 1)),
                ],
                boundaries=[warmup],
            ),
            total_updates,
        )
    if name == "cosine":
        # optax's onecycle divides by per-phase interval sizes; a phase that
        # rounds to zero steps yields NaN lr. Clamp so warmup and decay each
        # span >= 1 step (matters only for tiny smoke runs).
        total = max(total_updates, 2)
        pct = float(opt_cfg.get("warmup_pct", 0.3))
        pct = min(max(pct, 1.0 / total), 1.0 - 1.0 / total)
        return (
            optax.cosine_onecycle_schedule(
                transition_steps=total,
                peak_value=lr,
                pct_start=pct,
                div_factor=float(opt_cfg.get("div_factor", 25)),
                final_div_factor=1e4,  # torch OneCycleLR default
            ),
            total_updates,
        )
    if name == "step":
        updates_per_epoch = max(1, steps_per_epoch // gas)
        gamma = float(opt_cfg.get("gamma", 0.95))

        def sched(count):
            return lr * gamma ** (count // updates_per_epoch)

        return sched, total_updates
    raise ValueError(f"Scheduler {name!r} not implemented")


def build_optimizer(
    opt_cfg, steps_per_epoch: int, num_epochs: int
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    schedule, _ = build_schedule(opt_cfg, steps_per_epoch, num_epochs)
    tx = optax.adamw(
        learning_rate=schedule,
        weight_decay=float(opt_cfg.get("wd", 0.01)),
        eps=float(opt_cfg.get("eps", 1e-8)),
    )
    # Beyond-reference knob (off by default = reference parity): global-norm
    # gradient clipping BEFORE the Adam moments, the conventional placement.
    clip = opt_cfg.get("grad_clip_norm")
    if clip:
        tx = optax.chain(optax.clip_by_global_norm(float(clip)), tx)
    gas = int(opt_cfg.get("gradient_accumulation_steps", 1) or 1)
    if gas > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=gas)
    return tx, schedule
