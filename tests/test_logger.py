"""Logger dual-sink + config wiring tests.

The reference logs every scalar dict to TWO sinks (TensorBoard + wandb,
train_extractor.py:316-318); here the second sink is a machine-readable
metrics.jsonl stream. The trainers build the logger from the config's
`logger:` section (reference configs/defaults.yaml:5-8).
"""

import json
import os

from ei_nexus_tpu.utils import Logger, logger_from_config
from ei_nexus_tpu.utils.config import Config


def test_write_scalars_hits_jsonl_sink(tmp_path):
    lg = Logger("t", output_dir=str(tmp_path), use_tensorboard=False)
    lg.write_scalars({"loss": 1.5, "lr": 1e-3}, step=7)
    lg.write_scalars({"loss": 1.25}, step=8)
    lg.close()
    path = os.path.join(lg.run_dir, "metrics.jsonl")
    rows = [json.loads(l) for l in open(path)]
    assert rows == [{"step": 7, "loss": 1.5, "lr": 1e-3},
                    {"step": 8, "loss": 1.25}]


def test_extra_sink_still_called(tmp_path):
    seen = []
    lg = Logger("t", output_dir=str(tmp_path), use_tensorboard=False,
                extra_sink=lambda scalars, step: seen.append((step, scalars)))
    lg.write_scalars({"a": 2.0}, step=1)
    lg.close()
    assert seen == [(1, {"a": 2.0})]


def test_maybe_status_flushes_means_to_both_sinks(tmp_path):
    lg = Logger("t", output_dir=str(tmp_path), status_freq=2,
                use_tensorboard=False)
    lg.maybe_status(1, {"loss": 1.0})
    lg.maybe_status(2, {"loss": 3.0})  # flush: mean = 2.0
    lg.close()
    rows = [json.loads(l)
            for l in open(os.path.join(lg.run_dir, "metrics.jsonl"))]
    assert rows == [{"step": 2, "loss": 2.0}]


def test_logger_from_config(tmp_path):
    src = tmp_path / "present.py"
    src.write_text("x = 1\n")
    cfg = Config({"logger": {
        "status_freq": 13,
        "output_dir": str(tmp_path / "runs"),
        "files_to_backup": [str(src), str(tmp_path / "absent.py")],
        "dirs_to_backup": []}})
    lg = logger_from_config(cfg, "exp")
    lg.close()
    assert lg.status_freq == 13
    assert lg.run_dir.startswith(str(tmp_path / "runs"))
    # only the existing file was backed up; the absent one was skipped
    assert os.path.exists(os.path.join(lg.run_dir, "backup", "present.py"))


def test_logger_from_config_legacy_top_level_status_freq(tmp_path):
    cfg = Config({"status_freq": 5,
                  "logger": {"output_dir": str(tmp_path)}})
    lg = logger_from_config(cfg, "exp")
    lg.close()
    assert lg.status_freq == 5
