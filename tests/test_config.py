import os

import pytest
import yaml

from llm_bci_tpu.config import (
    DictConfig,
    config_from_kwargs,
    convert_to_dtype,
    update_config,
)


def test_dot_access_nested():
    cfg = DictConfig({"a": {"b": {"c": 1}}})
    assert cfg.a.b.c == 1
    assert isinstance(cfg.a, DictConfig)
    cfg.a = {"x": 2}
    assert cfg["a"]["x"] == 2


def test_update_config_deep_merge():
    base = {"opt": {"lr": 1e-3, "wd": 0.1}, "seed": 1}
    override = {"opt": {"lr": 5e-4, "new_key": True}, "extra": {"k": 2}}
    merged = update_config(base, override)
    assert merged.opt.lr == 5e-4
    assert merged.opt.wd == 0.1
    assert merged.opt.new_key is True
    assert merged.extra.k == 2
    assert merged.seed == 1
    # base is not mutated
    assert base["opt"]["lr"] == 1e-3


def test_update_config_none_returns_default():
    merged = update_config({"a": 1}, None)
    assert merged.a == 1


def test_override_with_none_leaf():
    merged = update_config({"a": {"b": 1}}, {"a": {"b": None}})
    assert merged.a.b is None


def test_include_expansion(tmp_path):
    inner = tmp_path / "inner.yaml"
    inner.write_text(yaml.dump({"hidden": 64, "nested": {"p": 1}}))
    outer = tmp_path / "outer.yaml"
    outer.write_text(yaml.dump({"model": f"include:{inner}", "seed": 3}))
    cfg = update_config(str(outer), None)
    assert cfg.model.hidden == 64
    assert cfg.model.nested.p == 1
    assert cfg.seed == 3


def test_convert_to_dtype():
    assert convert_to_dtype("3") == 3
    assert convert_to_dtype("-3") == -3
    assert convert_to_dtype("3.5") == 3.5
    assert convert_to_dtype("1.e-4") == 1e-4
    assert convert_to_dtype("true") is True
    assert convert_to_dtype("False") is False
    assert convert_to_dtype("null") is None
    assert convert_to_dtype("none") is None
    assert convert_to_dtype("[1,2,3]") == [1, 2, 3]
    assert convert_to_dtype("[a, b]") == ["a", "b"]
    assert convert_to_dtype("hello") == "hello"


def test_config_from_kwargs():
    cfg = config_from_kwargs({"a.b.c": "1", "a.b.d": "true", "e": "[1,2]"})
    assert cfg.a.b.c == 1
    assert cfg.a.b.d is True
    assert cfg.e == [1, 2]


def test_config_from_kwargs_no_convert():
    cfg = config_from_kwargs({"a.b": 3}, convert=False)
    assert cfg.a.b == 3


def test_reference_config_schema_loads():
    """Our shipped configs load through include expansion."""
    root = os.path.join(os.path.dirname(__file__), "..")
    trainer_cfg = os.path.join(root, "configs", "trainer.yaml")
    cfg = update_config(trainer_cfg, None)
    assert "optimizer" in cfg and "training" in cfg and "data" in cfg
