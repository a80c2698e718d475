"""LR schedule semantics tests (per-iteration warmup + cosine/multistep)."""

import numpy as np

from unav_yolyolva_tpu.train.optim import make_schedule


def cfg(**kw):
    base = {
        "learning_rate": 1e-3, "epochs": 4, "warmup": True,
        "warmup_epochs": 2, "schedule_type": "cosine",
        "schedule_steps": [], "schedule_gamma": 0.1, "eta_min": 1e-8,
    }
    base.update(kw)
    return base


def test_warmup_cosine_endpoints():
    iters = 10
    sched = make_schedule(cfg(), iters)
    warmup_steps = 2 * iters
    max_steps = 6 * iters
    # first optimizer step at lr 0 (reference chainable scheduler semantics)
    assert float(sched(0)) == 0.0
    # linear ramp reaches base by end of warmup
    np.testing.assert_allclose(float(sched(warmup_steps)), 1e-3, rtol=1e-6)
    # strictly increasing during warmup
    vals = [float(sched(s)) for s in range(warmup_steps)]
    assert all(b > a for a, b in zip(vals, vals[1:]))
    # cosine midpoint = (base + eta_min) / 2
    mid = warmup_steps + (max_steps - warmup_steps) // 2
    np.testing.assert_allclose(float(sched(mid)), 5e-4, rtol=1e-3)
    # end of schedule = eta_min
    np.testing.assert_allclose(float(sched(max_steps)), 1e-8, atol=1e-9)
    # never exceeds base lr
    allv = [float(sched(s)) for s in range(max_steps + 5)]
    assert max(allv) <= 1e-3 + 1e-9


def test_warmup_multistep():
    iters = 10
    sched = make_schedule(
        cfg(schedule_type="multistep", schedule_steps=[1, 3]), iters
    )
    warmup_steps = 2 * iters
    np.testing.assert_allclose(float(sched(warmup_steps)), 1e-3, rtol=1e-6)
    # after milestone 1 (epoch 1 post-warmup): x0.1
    np.testing.assert_allclose(
        float(sched(warmup_steps + 1 * iters)), 1e-4, rtol=1e-5
    )
    # after milestone 2 (epoch 3 post-warmup): x0.01
    np.testing.assert_allclose(
        float(sched(warmup_steps + 3 * iters)), 1e-5, rtol=1e-5
    )
