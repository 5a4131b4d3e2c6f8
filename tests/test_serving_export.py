"""AOT serving export: the decode program serializes via jax.export and
the deserialized artifact reproduces the in-process generate exactly
(llm_bci_tpu/serving.py). Beyond-reference surface — upstream serves by
running torch + HF generate in-process."""
import jax
import numpy as np
import pytest

from llm_bci_tpu.serving import export_decode, load_decode
from tests.test_bci import bci_config, synth_bci_dataset

GEN_KEYS = (
    "input_ids", "attention_mask", "input_split", "spikes", "spikes_mask",
    "spikes_timestamp", "spikes_lengths", "block_idx", "day_idx",
)


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    from llm_bci_tpu.ops import spmd
    from llm_bci_tpu.training import Trainer

    tmp = tmp_path_factory.mktemp("serve")
    trainer = Trainer(bci_config(tmp), dataset=synth_bci_dataset())
    spmd.set_op_mesh(None)          # single-program serving export
    batch, _ = next(iter(trainer.test_dataloader))
    inputs = {k: np.asarray(v) for k, v in batch.items() if k in GEN_KEYS}
    params = jax.device_get(trainer.state.params)
    return trainer.model, params, inputs, tmp


def test_export_greedy_roundtrip(served):
    model, params, inputs, tmp = served
    path = export_decode(
        model, params, inputs, str(tmp / "greedy.jaxexport"),
        max_new_tokens=4, platforms=("cpu",),
    )
    fn = load_decode(path)
    toks = fn(params, inputs)
    ref = model.apply(
        {"params": params}, **inputs, method="generate", max_new_tokens=4
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))


def test_export_beam_roundtrip(served):
    model, params, inputs, tmp = served
    path = export_decode(
        model, params, inputs, str(tmp / "beam.jaxexport"),
        max_new_tokens=4, num_beams=3, platforms=("cpu",),
    )
    fn = load_decode(path)
    toks = fn(params, inputs)
    ref = model.apply(
        {"params": params}, **inputs, method="generate",
        max_new_tokens=4, num_beams=3,
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))


def test_export_lowers_for_tpu_from_cpu_host(served):
    """Cross-platform: a ("tpu", "cpu") artifact serializes on the CPU dev
    host, loads back, reports both platforms, and still executes on cpu."""
    model, params, inputs, tmp = served
    path = export_decode(
        model, params, inputs, str(tmp / "xplat.jaxexport"),
        max_new_tokens=4, platforms=("tpu", "cpu"),
    )
    fn = load_decode(path)
    assert "tpu" in fn.platforms and "cpu" in fn.platforms
    toks = fn(params, inputs)
    ref = model.apply(
        {"params": params}, **inputs, method="generate", max_new_tokens=4
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))


def test_export_int8_base_roundtrip(tmp_path):
    """The int8-quantized frozen base exports too: the artifact embeds the
    dequant math and takes the int8 codes + scales as arguments — the 7B
    single-chip serving configuration."""
    from llm_bci_tpu.ops import spmd
    from llm_bci_tpu.training import Trainer

    cfg = bci_config(tmp_path)
    cfg["method"]["model_kwargs"]["quantize"] = "int8"
    trainer = Trainer(cfg, dataset=synth_bci_dataset())
    spmd.set_op_mesh(None)
    batch, _ = next(iter(trainer.test_dataloader))
    inputs = {k: np.asarray(v) for k, v in batch.items() if k in GEN_KEYS}
    # export the single-chip layout (Pallas dispatch with XLA fallback),
    # not the multi-device int8_xla rewrite the test mesh applied
    model = trainer.model.clone(quant="int8")
    params = jax.device_get(trainer.state.params)

    path = export_decode(
        model, params, inputs, str(tmp_path / "int8.jaxexport"),
        max_new_tokens=4, platforms=("cpu",),
    )
    fn = load_decode(path)
    toks = fn(params, inputs)
    ref = model.apply(
        {"params": params}, **inputs, method="generate", max_new_tokens=4
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))


def test_export_ndt1_ctc_forward(tmp_path):
    """Real-time BCI serving: the NDT1-CTC forward exports as a
    spikes -> per-frame log-probs artifact. Dummy targets are baked
    constants and the loss is dead-code-eliminated; the artifact's preds
    match the in-process forward."""
    from llm_bci_tpu.serving import export_forward
    import __graft_entry__ as g

    model = g._ndt1_ctc_model()
    full = g._ndt1_batch()
    params = model.init(jax.random.PRNGKey(0), **full, training=False)["params"]

    serve_inputs = {
        k: v for k, v in full.items() if not k.startswith("targets")
    }
    const = {k: v for k, v in full.items() if k.startswith("targets")}
    path = export_forward(
        model, params, serve_inputs, str(tmp_path / "ctc.jaxexport"),
        outputs=("preds",), const_inputs=const, platforms=("cpu",),
    )
    fn = load_decode(path)
    out = fn(params, serve_inputs)
    ref = model.apply({"params": params}, **full, training=False)
    np.testing.assert_allclose(
        np.asarray(out["preds"]), np.asarray(ref.preds), rtol=1e-6
    )


def test_export_itransformer_behaviour_decoder(tmp_path):
    """export_forward works for any registered model: an iTransformer
    choice-decoding artifact (spikes -> class log-probs) exports and
    matches the in-process forward."""
    from llm_bci_tpu.serving import export_forward
    from llm_bci_tpu.training import Trainer
    from tests.test_itransformer import REGIONS, _prep, it_config, synth_ibl_dataset

    cfg = it_config(tmp_path, "stat_behaviour", loss="xent", n_labels=2)
    cfg["data"]["dataset_class"] = "decoding"
    cfg["method"]["dataset_kwargs"] = {"targets_name": "choice"}
    # fp32 compute: the exported program and the in-process eager apply fuse
    # differently, and bf16 rounding under different fusion orders diverges
    # by ~5e-3 — fp32 keeps the equality check tight.
    cfg["precision"] = {"param_dtype": "float32", "compute_dtype": "float32"}
    trainer = Trainer(cfg, dataset=_prep(synth_ibl_dataset(), REGIONS))
    trainer.train()

    batch, _ = next(iter(trainer.test_dataloader))
    full = {
        k: np.asarray(v) for k, v in batch.items() if k in trainer.model_inputs
    }
    serve = {k: v for k, v in full.items() if not k.startswith("targets")}
    const = {k: v for k, v in full.items() if k.startswith("targets")}
    params = jax.device_get(trainer.state.params)

    rngs = {"mask": jax.random.PRNGKey(7)}  # force-active masker stream
    path = export_forward(
        trainer.model, params, serve, str(tmp_path / "it.jaxexport"),
        outputs=("preds",), const_inputs=const, rngs=rngs, platforms=("cpu",),
    )
    fn = load_decode(path)
    out = fn(params, serve)
    ref = trainer.model.apply(
        {"params": params}, **full, training=False, rngs=rngs
    )
    np.testing.assert_allclose(
        np.asarray(out["preds"]), np.asarray(ref.preds), rtol=2e-5, atol=1e-6
    )


def test_artifact_size_independent_of_values(served):
    """Weights are program ARGUMENTS, not baked constants: the artifact is
    MLIR of the program only (a few MB), so shipping new weights does not
    re-export."""
    import os

    model, params, inputs, tmp = served
    path = str(tmp / "size.jaxexport")
    export_decode(model, params, inputs, path, max_new_tokens=4,
                  platforms=("cpu",))
    n_param_bytes = sum(
        np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(params)
    )
    assert os.path.getsize(path) < max(n_param_bytes // 2, 1 << 20)
