"""Golden tests for the beta schedules (reference utils.py:124-136,
train_pm_vae.py:28-43)."""
import numpy as np

from posterior_matching_tpu.train.schedules import (
    cyclical_annealing_schedule,
    get_beta_schedule,
)


def test_cyclical_schedule_shape():
    sched = cyclical_annealing_schedule(
        low_value=0.0, high_value=1.0, period=100, delay=10
    )
    # before delay: exactly 0
    assert float(sched(0)) == 0.0
    assert float(sched(9)) == 0.0
    # ramps from low at delay to high at delay + period/2
    assert float(sched(10)) == 0.0
    np.testing.assert_allclose(float(sched(35)), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(sched(60)), 1.0, atol=1e-6)
    # stays high for the second half of the period
    np.testing.assert_allclose(float(sched(100)), 1.0, atol=1e-6)
    # next cycle restarts the ramp
    np.testing.assert_allclose(float(sched(110)), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(sched(135)), 0.5, atol=1e-6)


def test_get_beta_schedule_dispatch():
    assert get_beta_schedule({})(123) == 1.0
    mono = get_beta_schedule(
        {
            "schedule": "monotonic",
            "low_value": 0.0,
            "high_value": 1.0,
            "transition_steps": 10,
            "transition_begin": 5,
        }
    )
    assert float(mono(0)) == 0.0
    np.testing.assert_allclose(float(mono(10)), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(mono(15)), 1.0, atol=1e-6)
    cyc = get_beta_schedule(
        {
            "schedule": "cyclic",
            "low_value": 0.0,
            "high_value": 1.0,
            "period": 100,
            "delay": 0,
        }
    )
    np.testing.assert_allclose(float(cyc(50)), 1.0, atol=1e-6)
