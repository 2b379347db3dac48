"""Log scalars must keep significant digits (VERDICT r4 weak #6).

The round-4 protocol log rounded floats to 6 *decimals*, so the
post-step-2 LR of 1e-7 logged as ``"lr": 0.0`` — 61 of 107 train_iter
lines were indistinguishable from a dead schedule.  json stats now use
significant-digit formatting (reference emits raw repr,
/root/reference/utils/logging.py:76-88).
"""

import json
import logging

from clip_fsar_tpu.utils.logging import log_json_stats


def _capture(stats):
    records = []

    class H(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    logger = logging.getLogger("test_logging_precision")
    logger.setLevel(logging.INFO)
    h = H()
    logger.addHandler(h)
    try:
        log_json_stats(stats, logger=logger)
    finally:
        logger.removeHandler(h)
    (msg,) = records
    return json.loads(msg.split("json_stats: ", 1)[1])


def test_tiny_lr_survives():
    out = _capture({"lr": 1e-7, "loss": 5.744319999, "iter": "2150/5000"})
    assert out["lr"] == 1e-7, "1e-7 must not round to 0.0"
    assert out["lr"] != 0.0
    assert out["loss"] == 5.74432  # 6 significant digits
    assert out["iter"] == "2150/5000"


def test_schedule_steps_distinguishable():
    # Every LR the HMDB schedule visits must round-trip distinctly.
    lrs = [2e-6, 1e-5, 1e-6, 1e-7]
    outs = [_capture({"lr": lr})["lr"] for lr in lrs]
    assert len(set(outs)) == len(lrs)
    assert 0.0 not in outs


def test_large_values_unchanged():
    out = _capture({"eps_per_sec": 57.4523, "top1_acc": 20.014000000000003})
    assert out["eps_per_sec"] == 57.4523
    assert out["top1_acc"] == 20.014
