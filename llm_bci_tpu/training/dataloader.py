"""Host-side numpy dataloader with static-shape discipline.

Replaces ``torch.utils.data.DataLoader`` (reference ``models/trainer.py:
208-222``). Key TPU deviation: pad targets are fixed dataset-wide, not
per-batch — every batch of a given split has identical shapes so XLA
compiles the train step once (the reference pads to the per-batch max,
fine on GPUs, a recompile storm on TPU).
"""
from __future__ import annotations

import copy
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple

import numpy as np


def freeze_pad_lengths(dataset, pad_dict: Dict[str, Dict[str, Any]]) -> Dict[str, Dict[str, Any]]:
    """For every pad key whose ``truncate`` is null, scan the dataset once and
    pin ``truncate == min_length`` to the dataset-wide max along ``dim`` —
    static shapes for XLA. Explicit ``truncate`` values are respected."""
    pad_dict = copy.deepcopy(pad_dict)
    need = {k: v for k, v in pad_dict.items() if v.get("truncate") is None}
    if not need:
        return pad_dict
    maxes = {k: 0 for k in need}
    for i in range(len(dataset)):
        rows = dataset[i]
        if not isinstance(rows, list):
            rows = [rows]
        for row in rows:
            for k, spec in need.items():
                if k in row:
                    arr = np.asarray(row[k])
                    maxes[k] = max(maxes[k], arr.shape[spec.get("dim", 0)])
    for k, spec in need.items():
        spec["truncate"] = maxes[k]
        spec["min_length"] = maxes[k]
    return pad_dict


class HostDataLoader:
    """Shuffled batching over a map-style dataset; collate to numpy dicts."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn: Callable[[List], Tuple[Dict, Dict]],
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[Dict, Dict]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            idx = order[start : start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            yield self.collate_fn([self.dataset[int(i)] for i in idx])
