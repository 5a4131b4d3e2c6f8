"""Behavior-decoding evaluation (choice classification / wheel regression).

Rebuilds reference ``utils/eval_behaviour_decoding.py:33-87``: run the test
set with maskers disabled, collect preds/targets, compute acc or r2/mse/mae.
Uses the same probe pattern — a capture metric fn through
``trainer.evaluate`` — so the trainer protocol stays the public API.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from llm_bci_tpu.eval.metrics import metrics_list


def behaviour_decoding_eval(
    trainer,
    is_cls: bool,
    regression_metrics: Optional[List[str]] = None,
) -> Dict[str, float]:
    regression_metrics = regression_metrics or ["r2"]
    all_batches = []

    def probe(model, model_inputs, unused_inputs, outputs, **kwargs):
        # outputs carry device arrays; pull the array leaves to host here.
        all_batches.append(
            {
                k: np.asarray(v)
                for k, v in outputs.items()
                if v is not None and hasattr(v, "shape") and getattr(v, "ndim", 0) > 0
            }
        )
        return 0.0

    saved = trainer.metric_fns
    trainer.metric_fns = {"probe": probe}
    try:
        trainer.evaluate(eval_train_set=False)
    finally:
        trainer.metric_fns = saved

    preds = np.concatenate([b["preds"] for b in all_batches], axis=0)
    targets = np.concatenate([b["targets"] for b in all_batches], axis=0)

    if is_cls:
        return metrics_list(
            targets=targets.squeeze(-1) if targets.ndim > 1 else targets,
            preds=np.argmax(preds, axis=-1),
            metrics=["acc"],
        )
    return metrics_list(targets=targets, preds=preds, metrics=regression_metrics)
