"""Tests for the grouped optimizer (C34 parity) and metrics logger."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from rehrseg_tpu.train import (
    nesterov_sgd_grouped, sr_head_label_fn, poly_epoch_schedule,
)


def test_sr_head_label_fn():
    params = {"params": {"encoder": {"conv": {"kernel": 1}},
                         "sr_head_conv1": {"kernel": 2, "bias": 3}}}
    labels = sr_head_label_fn(params)
    assert labels["params"]["encoder"]["conv"]["kernel"] == "other"
    assert labels["params"]["sr_head_conv1"]["kernel"] == "sr_head"


def test_grouped_lr_ratio(rng):
    """sr_head trains at ~10x the LR of other params (one step, no momentum
    history → update = lr * grad [+ wd * param])."""
    params = {"params": {
        "body": {"kernel": jnp.ones((4,))},
        "sr_head_conv1": {"kernel": jnp.ones((4,))},
    }}
    sched = poly_epoch_schedule(1e-2, 10, 100)
    tx = nesterov_sgd_grouped(1e-2, sched, momentum=0.0, weight_decay=0.0)
    state = tx.init(params)
    grads = jax.tree.map(lambda x: jnp.ones_like(x), params)
    updates, _ = tx.update(grads, state, params)
    up_head = float(updates["params"]["sr_head_conv1"]["kernel"][0])
    up_body = float(updates["params"]["body"]["kernel"][0])
    assert up_head == pytest.approx(-1e-2, rel=1e-5)
    assert up_body == pytest.approx(-1e-3, rel=1e-5)


def test_metrics_logger(tmp_path):
    from rehrseg_tpu.utils.metrics import MetricsLogger
    log = MetricsLogger(str(tmp_path))
    log.log(0, loss=1.5, dice=0.8)
    log.log(1, loss=jnp.asarray(1.2))
    lines = [json.loads(x) for x in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert lines[0]["loss"] == 1.5
    assert lines[1]["loss"] == pytest.approx(1.2)
    assert log.last("dice") == 0.8


def test_metrics_max_on_disk(tmp_path):
    """Resume watermark recovery: max over the FILE (cross-run), tolerant
    of a torn final line from a killed writer."""
    from rehrseg_tpu.utils.metrics import MetricsLogger
    log = MetricsLogger(str(tmp_path))
    log.log(100, val_dice=0.61)
    log.log(200, val_dice=0.85, loss=1.0)
    log.log(300, val_dice=0.72)
    with open(log.path, "a") as f:
        f.write('{"step": 400, "val_dice": 0.9')  # torn: process killed
    fresh = MetricsLogger(str(tmp_path))  # a new run's logger
    assert fresh.max_on_disk("val_dice") == pytest.approx(0.85)
    assert fresh.max_on_disk("absent_key") == 0.0
    empty = MetricsLogger(str(tmp_path / "elsewhere"))
    assert empty.max_on_disk("val_dice", default=-1.0) == -1.0
