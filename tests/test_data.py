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


def test_freeze_pad_lengths_spans_both_splits():
    """The frozen pad target is the max over ALL given datasets — a test
    example longer than every train example must widen the target, not be
    silently truncated (round-2 review finding)."""
    from llm_bci_tpu.data.datasets import SpikingDataset
    from llm_bci_tpu.training.dataloader import freeze_pad_lengths

    rng = np.random.default_rng(0)
    train = SpikingDataset([{"spikes": rng.poisson(1.0, size=(8, 3)).astype(np.float32)}])
    test = SpikingDataset([{"spikes": rng.poisson(1.0, size=(13, 3)).astype(np.float32)}])
    pad = {"spikes": {"dim": 0, "side": "right", "value": 0, "truncate": None, "min_length": None}}
    out = freeze_pad_lengths([train, test], pad)
    assert out["spikes"]["truncate"] == 13
    assert out["spikes"]["min_length"] == 13


def test_freeze_pad_lengths_does_not_consume_day_dataset_state():
    """Scanning shapes must not perturb the day dataset's sampling (the
    round-2 version went through __getitem__ and popped the then-stateful
    pools; sampling is now stateless in (seed, epoch), so the check is
    that batch composition is identical with and without a prior scan)."""
    from llm_bci_tpu.data.datasets import DaySpecificSpikingDatasetForDecoding
    from llm_bci_tpu.training.dataloader import freeze_pad_lengths

    rng = np.random.default_rng(0)
    rows = [
        {"spikes": rng.poisson(1.0, size=(6, 3)).astype(np.float32),
         "targets": rng.integers(0, 5, size=(4,)), "day_idx": i % 2}
        for i in range(6)
    ]
    ds = DaySpecificSpikingDatasetForDecoding(rows, batch_size=2)
    before = [[r["targets"].tolist() for r in ds[i]] for i in range(len(ds))]
    freeze_pad_lengths(ds, {"spikes": {"dim": 0, "side": "right", "value": 0,
                                       "truncate": None, "min_length": None},
                            "targets": {"dim": 0, "side": "right", "value": 0,
                                        "truncate": None, "min_length": None}})
    after = [[r["targets"].tolist() for r in ds[i]] for i in range(len(ds))]
    assert before == after


def test_day_dataset_stateless_epoch_composition():
    """Day-batch composition is a pure function of (seed, epoch, idx):
    re-reading a batch returns identical examples; different epochs
    reshuffle within each day; one epoch visits every example exactly
    once (the reference's pool semantics, data_utils/datasets.py:115-175,
    derived statelessly so resume reproduces composition — VERDICT r4 #4)."""
    rng = np.random.default_rng(1)
    rows = [
        {"spikes": rng.poisson(1.0, size=(6, 3)).astype(np.float32),
         "targets": np.asarray([i]), "day_idx": i % 3}
        for i in range(13)  # ragged: days have 5/4/4 examples
    ]
    ds = DaySpecificSpikingDatasetForDecoding(rows, batch_size=2, seed=3)

    def epoch_ids(epoch):
        ds.set_epoch(epoch)
        return [[int(r["targets"][0]) for r in ds[i]] for i in range(len(ds))]

    e0a, e0b, e1 = epoch_ids(0), epoch_ids(0), epoch_ids(1)
    assert e0a == e0b                       # pure in (seed, epoch, idx)
    assert e0a != e1                        # epochs reshuffle
    flat = sorted(x for b in e0a for x in b)
    assert flat == list(range(13))          # exactly-once coverage per epoch
    assert sorted(x for b in e1 for x in b) == list(range(13))
    for i in range(len(ds)):
        batch = ds[i]
        assert len({int(r["day_idx"]) for r in batch}) == 1


def test_freeze_pad_lengths_raises_on_unseen_key():
    """A needed pad key the raw-row scan never sees must fail loudly, not
    freeze to truncate=0 and silently cut every batch to zero length
    (round-2 advisor finding)."""
    import pytest

    from llm_bci_tpu.data.datasets import SpikingDataset
    from llm_bci_tpu.training.dataloader import freeze_pad_lengths

    rng = np.random.default_rng(0)
    ds = SpikingDataset([{"spikes": rng.poisson(1.0, size=(8, 3)).astype(np.float32)}])
    pad = {"nonexistent_column": {"dim": 0, "side": "right", "value": 0,
                                  "truncate": None, "min_length": None}}
    with pytest.raises(ValueError, match="nonexistent_column"):
        freeze_pad_lengths(ds, pad)


def test_padded_array_left_truncate_keeps_tail():
    """With side='left' truncation keeps the TAIL so truncated rows stay
    end-aligned with padded rows (documented deviation: the reference
    always keeps the head, data_utils/datasets.py:219)."""
    from llm_bci_tpu.data.datasets import padded_array

    out = padded_array(
        [np.arange(1, 4), np.arange(1, 13)],
        dim=0, side="left", value=0, truncate=10, min_length=10,
    )
    np.testing.assert_array_equal(out[0], [0, 0, 0, 0, 0, 0, 0, 1, 2, 3])
    np.testing.assert_array_equal(out[1], [3, 4, 5, 6, 7, 8, 9, 10, 11, 12])
