"""Logger backends (utils/loggers.py)."""

import pytest
import csv
import os
import warnings

from dreammesh4d_tpu.utils.loggers import (

    CSVLogger,
    LoggerCollection,
    TensorBoardLogger,
    WandbLogger,
    build_loggers,
)

pytestmark = pytest.mark.quick  # core <5-min CPU tier


def test_csv_logger_roundtrip(tmp_path):
    lg = CSVLogger(str(tmp_path))
    lg.log_metrics({"loss": 1.5, "psnr": 20.0}, step=0)
    lg.log_metrics({"loss": 1.0, "psnr": 22.0}, step=10)
    with open(os.path.join(tmp_path, "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert float(rows[1]["loss"]) == 1.0 and rows[1]["step"] == "10"


def test_unavailable_backends_degrade_to_noop(tmp_path):
    # neither tensorboard nor wandb is in this image: both warn, neither raises
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        tb = TensorBoardLogger(str(tmp_path))
        wb = WandbLogger(str(tmp_path))
    tb.log_metrics({"a": 1.0}, 0)
    wb.log_metrics({"a": 1.0}, 0)
    tb.finalize()
    wb.finalize()


def test_build_loggers_and_collection(tmp_path):
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        lgs = build_loggers(["csv", "tensorboard", "nonsense"], str(tmp_path))
        assert any("unknown logger backend" in str(x.message) for x in w)
    assert len(lgs) == 2  # nonsense skipped
    col = LoggerCollection(lgs)
    col.log_metrics({"loss": 0.5}, 3)
    col.finalize()
    assert os.path.exists(os.path.join(tmp_path, "metrics.csv"))
