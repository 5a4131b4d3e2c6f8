import numpy as np
import pytest

from llm_bci_tpu.data import (
    DaySpecificSpikingDatasetForDecoding,
    SpikingDataset,
    SpikingDatasetForDecoding,
    pad_collate_fn,
    padded_array,
)


def _examples(n=6, seq=10, ch=4, with_targets=True, days=2):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        row = {
            "spikes": rng.poisson(1.0, size=(seq - (i % 3), ch)).astype(np.float32),
            "day_idx": np.asarray(i % days),
            "block_idx": np.asarray(i % 3),
            "sentence": f"hello {i}",
        }
        if with_targets:
            row["targets"] = rng.integers(0, 5, size=(3 + i % 2,)).astype(np.int64)
        rows.append(row)
    return rows


def test_base_dataset_columns():
    ds = SpikingDataset(_examples(with_targets=False))
    row = ds[0]
    assert row["spikes"].shape == (10, 4)
    assert row["spikes_mask"].tolist() == [1] * 10
    assert row["spikes_timestamp"].tolist() == list(range(10))
    assert row["spikes_spacestamp"].tolist() == list(range(4))
    assert int(row["spikes_lengths"]) == 10


def test_decoding_dataset_targets():
    ds = SpikingDatasetForDecoding(_examples(), targets_name="targets")
    row = ds[1]
    assert row["targets"].shape == (4,)
    assert int(row["targets_lengths"]) == 4
    assert row["targets_mask"].shape == (4,)


def test_day_dataset_homogeneous_batches():
    ds = DaySpecificSpikingDatasetForDecoding(_examples(n=8, days=2), batch_size=2)
    assert len(ds) == 8 // 2
    batch = ds[0]
    assert isinstance(batch, list)
    days = {int(r["day_idx"]) for r in batch}
    assert len(days) == 1


def test_padded_array_right_left():
    arrays = [np.ones((3, 2)), np.ones((5, 2))]
    out = padded_array(arrays, dim=0, side="right", value=0)
    assert out.shape == (2, 5, 2)
    assert out[0, 3:].sum() == 0
    out = padded_array(arrays, dim=0, side="left", value=-1)
    assert out[0, :2].sum() == -4


def test_padded_array_truncate_min_length():
    arrays = [np.ones((3,)), np.ones((7,))]
    out = padded_array(arrays, truncate=5, min_length=5)
    assert out.shape == (2, 5)
    with pytest.raises(ValueError):
        padded_array(arrays, truncate=2, min_length=5)


def test_collate_routes_model_vs_unused():
    ds = SpikingDatasetForDecoding(_examples(), targets_name="targets")
    batch = [ds[i] for i in range(4)]
    pad_dict = {
        "spikes": {"dim": 0, "side": "right", "value": 0, "truncate": 12, "min_length": 12},
        "spikes_mask": {"dim": 0, "side": "right", "value": 0, "truncate": 12, "min_length": 12},
        "spikes_timestamp": {"dim": 0, "side": "right", "value": 0, "truncate": 12, "min_length": 12},
        "targets": {"dim": 0, "side": "right", "value": 0, "truncate": 6, "min_length": 6},
        "targets_mask": {"dim": 0, "side": "right", "value": 0, "truncate": 6, "min_length": 6},
    }
    model_inputs = ["spikes", "spikes_mask", "spikes_timestamp", "spikes_lengths",
                    "targets", "targets_lengths"]
    inputs, unused = pad_collate_fn(batch, model_inputs, pad_dict)
    assert inputs["spikes"].shape == (4, 12, 4)          # static shape
    assert inputs["targets"].shape == (4, 6)
    assert inputs["spikes_lengths"].shape == (4,)
    assert "sentence" in unused and len(unused["sentence"]) == 4
    assert "targets_mask" in unused                      # array not in model_inputs
    # pad semantics: mask zero over padding
    lens = inputs["spikes_lengths"]
    for i, l in enumerate(lens):
        assert inputs["spikes_mask"][i, :l].all()
        assert not inputs["spikes_mask"][i, l:].any()


def test_collate_flattens_dataset_side_batches():
    ds = DaySpecificSpikingDatasetForDecoding(_examples(n=8, days=2), batch_size=2)
    batch = [ds[0], ds[1]]
    inputs, unused = pad_collate_fn(
        batch,
        ["spikes", "spikes_lengths"],
        {"spikes": {"dim": 0, "side": "right", "value": 0, "truncate": 10, "min_length": 10}},
    )
    assert inputs["spikes"].shape[0] == 4


def test_collate_rejects_nonarray_pad_key():
    ds = SpikingDataset(_examples(with_targets=False))
    with pytest.raises(ValueError):
        pad_collate_fn([ds[0]], ["spikes"], {"sentence": {"dim": 0}})
