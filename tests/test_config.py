import os

import pytest

from dreammesh4d_tpu.config import (

    load_config,
    merge_dicts,
    parse_dotlist,
    parse_structured,
    resolve,
)

pytestmark = pytest.mark.quick  # core <5-min CPU tier


def test_merge_and_dotlist():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    over = parse_dotlist(["a.b=10", "e=[1,2]", "f=true", "g=hello"])
    out = merge_dicts(base, over)
    assert out["a"]["b"] == 10 and out["a"]["c"] == 2
    assert out["e"] == [1, 2] and out["f"] is True and out["g"] == "hello"


def test_interpolation_reference():
    cfg = resolve({"data": {"dist": 3.8}, "system": {"d": "${data.dist}"}})
    assert cfg["system"]["d"] == 3.8


def test_resolvers():
    cfg = resolve(
        {
            "a": 4,
            "sum": "${add:${a},2}",
            "half": "${idiv:${a},2}",
            "decay": "${calc_exp_lr_decay_rate:0.1,1000}",
            "gate": "${cmaxgt0:${w}}",
            "w": [0, 0.0, 1.0, 100],
            "neg": "${not:${gate}}",
            "pair": "${tuple2:7}",
        }
    )
    assert cfg["sum"] == 6
    assert cfg["half"] == 2
    assert abs(cfg["decay"] - 0.1 ** (1 / 1000)) < 1e-12
    assert cfg["gate"] is True and cfg["neg"] is False
    assert cfg["pair"] == [7, 7]


def test_experiment_config(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text(
        """
name: demo
tag: t1
use_timestamp: false
seed: 7
data_type: dummy
data: {width: 64}
system_type: dummy-system
system: {loss: {lambda_rgb: [0, 0.0, 1.0, 100]}}
"""
    )
    cfg = load_config(str(y), cli_args=["data.width=128"], exp_root_dir=None if False else None,
                      makedirs=False) if False else load_config(
        str(y), cli_args=["data.width=128", f"exp_root_dir={tmp_path}/out"], makedirs=True)
    assert cfg.name == "demo"
    assert cfg.data.width == 128
    assert cfg.trial_dir.endswith(os.path.join("demo", "t1"))
    assert os.path.isdir(cfg.trial_dir)


def test_parse_structured_unknown_key():
    from dataclasses import dataclass

    @dataclass
    class C:
        x: int = 1

    assert parse_structured(C, {"x": 5}).x == 5
    with pytest.raises(ValueError):
        parse_structured(C, {"y": 1})
