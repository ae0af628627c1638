"""Config system parity tests (reference bin/utils.py:34-148 semantics)."""

import os

import pytest

from vilmedic_tpu.config import (
    Config,
    apply_dotlist,
    coerce_numeric_strings,
    executor_config,
    load_config,
    merge_dicts,
)


def test_coerce_numeric_strings():
    obj = {
        "a": "1e-8",
        "b": "42",
        "c": "3.5",
        "d": "not_a_number",
        "e": ["7", "x"],
        "f": {"g": "-2.5e3"},
        "h": "1.2.3",
    }
    out = coerce_numeric_strings(obj)
    assert out["a"] == pytest.approx(1e-8)
    assert out["b"] == 42 and isinstance(out["b"], int)
    assert out["c"] == 3.5
    assert out["d"] == "not_a_number"
    assert out["e"] == [7, "x"]
    assert out["f"]["g"] == -2500.0
    assert out["h"] == "1.2.3"


def test_merge_dicts_nested_override():
    base = {"model": {"lr": 1, "layers": 2}, "name": "a"}
    over = {"model": {"lr": 9}, "extra": True}
    merged = merge_dicts(base, over)
    assert merged["model"] == {"lr": 9, "layers": 2}
    assert merged["name"] == "a" and merged["extra"] is True


def test_apply_dotlist():
    override = apply_dotlist({}, ["model.lr=0.1", "name=run1", "flag", "list=[1,2]"])
    assert override["model"]["lr"] == 0.1
    assert override["name"] == "run1"
    assert override["flag"] is None
    assert override["list"] == [1, 2]


def test_load_config_includes_and_overrides(tmp_path):
    (tmp_path / "base.yml").write_text(
        "name: base\nmodel:\n  hidden: 64\n  layers: 2\ntrainor:\n  lr: '5e-5'\n"
    )
    (tmp_path / "child.yml").write_text(
        "includes:\n  - base.yml\nname: child\nmodel:\n  layers: 4\n"
    )
    config, override = load_config(
        str(tmp_path / "child.yml"), ["model.hidden=128"]
    )
    assert config.name == "child"  # file overrides include
    assert config.model.layers == 4
    assert config.model.hidden == 128  # dotlist overrides file
    assert config.trainor.lr == pytest.approx(5e-5)  # numeric coercion
    assert override.model.hidden == 128


def test_executor_config_inherits_top_level():
    cfg = Config(
        {
            "name": "x",
            "ckpt_dir": "ckpt",
            "dataset": {"proto": "ImSeq"},
            "trainor": {"batch_size": 8},
            "validator": {"batch_size": 4},
        }
    )
    tr = executor_config(cfg, "trainor")
    assert tr.batch_size == 8
    assert tr.dataset.proto == "ImSeq"
    assert tr.ckpt_dir == "ckpt"
    assert "validator" not in tr


def test_set_logger_rebinds_file_handler_on_new_ckpt_dir(tmp_path):
    """A second run in one process with the SAME seed but a NEW ckpt_dir must
    log (and dump metric refs/hyps via get_logger_directory) into the new
    directory — the per-seed logger used to pin the first run's FileHandler
    forever, sending later runs' dumps to the wrong tree."""
    from vilmedic_tpu.utils.logger import get_logger_directory, set_logger

    d1, d2 = tmp_path / "run1", tmp_path / "run2"
    lg = set_logger(str(d1), 999001)
    assert get_logger_directory(lg) == str(d1)
    # same dir: idempotent, no handler churn
    n = len(lg.handlers)
    assert set_logger(str(d1), 999001) is lg and len(lg.handlers) == n
    # new dir: file handler rebinds, console handler survives
    lg2 = set_logger(str(d2), 999001)
    assert lg2 is lg
    assert get_logger_directory(lg2) == str(d2)
    assert len(lg2.handlers) == n
    lg2.info("lands in run2")
    assert (d2 / "999001.log").exists()
