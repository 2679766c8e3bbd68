"""Optimizer schedule matches the reference recipe: ExponentialLR(0.8) per
epoch damped by ExponentialWarmup(period=3) (TEMPURA_train.py:113-114,
:353-358)."""

import numpy as np

from vidsgg.train.optim import reference_lr_schedule


def test_schedule_values():
    base, gamma, period, spe = 1e-5, 0.8, 3, 100
    sched = reference_lr_schedule(base, gamma, period, spe)
    for epoch in range(6):
        lr = float(sched(epoch * spe))
        warm = min(1.0, np.exp((epoch + 1) / period - 1.0))
        want = base * gamma**epoch * warm
        assert np.isclose(lr, want, rtol=1e-6), (epoch, lr, want)
    # constant within an epoch
    assert float(sched(0)) == float(sched(spe - 1))
    assert float(sched(spe)) != float(sched(spe - 1))


def test_warmup_reaches_one():
    sched = reference_lr_schedule(1.0, 1.0, 3, 1)
    # after >= period-1 epochs the damping saturates at 1
    assert np.isclose(float(sched(2)), 1.0)
    assert float(sched(0)) < float(sched(1)) < float(sched(2))
