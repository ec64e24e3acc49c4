"""Optional TensorBoard scalar mirroring (SURVEY.md s5.5).

Gated behind LDM_TEST_TB=1: importing tensorflow costs ~40 s on the
1-core host, too heavy for the default suite. Run explicitly with
`LDM_TEST_TB=1 pytest tests/test_tensorboard_logging.py`.
"""

import os
import pathlib

import pytest

needs_tb = pytest.mark.skipif(
    os.environ.get("LDM_TEST_TB") != "1",
    reason="set LDM_TEST_TB=1 (tensorflow import is ~40s)")


@needs_tb
def test_metric_logger_mirrors_scalars(tmp_path):
    from latent_diffusion_models_for_shape_sdfs_tpu.utils.logging import (
        MetricLogger)
    log = MetricLogger(tmp_path / "m.jsonl", tensorboard=tmp_path / "tb")
    log.log("ad_epoch", epoch=0, loss_l1=0.5, lr=1e-3, note="text-ok")
    log.log("ad_epoch", epoch=1, loss_l1=0.25, lr=9e-4)
    log.log("no_step_event", value=1.0)  # no step/epoch -> JSONL only
    log.close()
    # JSONL intact
    lines = (tmp_path / "m.jsonl").read_text().strip().splitlines()
    assert len(lines) == 3
    # event files written and the scalars are readable back
    ev = list(pathlib.Path(tmp_path / "tb").glob("events.out.tfevents.*"))
    assert len(ev) == 1
    from tensorflow.python.summary.summary_iterator import (
        summary_iterator)
    seen = {}
    for e in summary_iterator(str(ev[0])):
        for v in e.summary.value:
            seen.setdefault(v.tag, []).append(e.step)
    assert sorted(seen["ad_epoch/loss_l1"]) == [0, 1]
    assert sorted(seen["ad_epoch/lr"]) == [0, 1]
    assert "no_step_event/value" not in seen
    assert "ad_epoch/note" not in seen  # non-numeric field skipped
