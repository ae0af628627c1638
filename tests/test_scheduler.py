"""TrainingScheduler semantics: step granularities, plateau, warmup, early stop."""

import pytest

from vilmedic_tpu.executors.scheduler import TrainingScheduler


def test_early_stopping_max_mode():
    s = TrainingScheduler(None, 1e-3, "BLEU", 3, {})
    assert s.mode == "max"
    assert s.eval_step(early_stop_score=0.1)["save_state"]
    assert s.eval_step(early_stop_score=0.2)["save_state"]
    r = s.eval_step(early_stop_score=0.15)
    assert not r["save_state"] and not r["done_training"]
    s.eval_step(early_stop_score=0.15)
    r = s.eval_step(early_stop_score=0.15)  # third non-improvement
    assert r["done_training"]


def test_early_stopping_min_mode_loss():
    s = TrainingScheduler(None, 1e-3, "validation_loss", 2, {})
    assert s.mode == "min"
    assert s.eval_step(early_stop_score=5.0)["save_state"]
    assert s.eval_step(early_stop_score=4.0)["save_state"]
    assert not s.eval_step(early_stop_score=4.5)["save_state"]


def test_reduce_lr_on_plateau():
    s = TrainingScheduler(
        "ReduceLROnPlateau", 1.0, "validation_loss", 10,
        {"factor": 0.5, "patience": 1, "threshold_mode": "abs", "threshold": 0.0},
    )
    s.eval_step(decay_metric=1.0)
    assert s.current_lr() == 1.0
    s.eval_step(decay_metric=1.0)  # bad epoch 1
    assert s.current_lr() == 1.0  # patience not exceeded
    s.eval_step(decay_metric=1.0)  # bad epoch 2 -> decay
    assert s.current_lr() == pytest.approx(0.5)


def test_warmup_then_cosine():
    s = TrainingScheduler(
        "CosineAnnealingLR", 1.0, "BLEU", 10,
        {"warmup_steps": 10, "T_max": 4, "eta_min": 0.0},
    )
    assert s.current_lr() == 0.0
    for _ in range(5):
        s.iteration_step()
    assert s.current_lr() == pytest.approx(0.5)
    for _ in range(5):
        s.iteration_step()
    # warmup complete; epoch stepping drives cosine
    import math

    s.epoch_step()  # epoch 1 of T_max=4
    assert s.current_lr() == pytest.approx((1 + math.cos(math.pi / 4)) / 2, rel=1e-6)


def test_step_lr_and_warm_restarts():
    s = TrainingScheduler("StepLR", 1.0, "BLEU", 10, {"step_size": 2, "gamma": 0.1})
    s.epoch_step()
    assert s.current_lr() == pytest.approx(1.0)
    s.epoch_step()
    assert s.current_lr() == pytest.approx(0.1)

    s2 = TrainingScheduler(
        "CosineAnnealingWarmRestarts", 1.0, "BLEU", 10, {"T_0": 1, "T_mult": 1}
    )
    s2.iteration_step(epoch_value=0.5)  # mid-cycle
    assert 0.4 < s2.current_lr() < 0.6


def test_state_dict_roundtrip():
    s = TrainingScheduler("ReduceLROnPlateau", 1.0, "BLEU", 5, {"factor": 0.5})
    s.eval_step(early_stop_score=0.4)
    s.iteration_step()
    s.epoch_step()
    state = s.state_dict()

    s2 = TrainingScheduler("ReduceLROnPlateau", 1.0, "BLEU", 5, {"factor": 0.5})
    s2.load_state_dict(state)
    assert s2.current_best_metric == pytest.approx(0.4)
    assert s2.epoch == 1 and s2.iteration_count == 1
    assert s2.metric_comp_func(0.5, 0.4)  # comp func restored (max mode)
