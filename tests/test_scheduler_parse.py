"""Generic LR-scheduler parsing parity (VERDICT r4 #7).

The reference's parse_scheduler (threestudio/systems/utils.py:50-104) wraps
torch.optim.lr_scheduler classes plus the SequentialLR / ChainedScheduler
combinators; torch multiplies the optimizer's base LR by a step-indexed
factor.  These tests check the repo's factor closures — both the host
(scheduler_factor_fn) and traceable (jnp_factor_fn) forms — against torch's
actual lr_scheduler behavior stepped over a horizon, then check the optax
wiring scales updates exactly like a torch LR would.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

from dreammesh4d_tpu.systems.optim import (
    jnp_factor_fn,
    parse_scheduler,
    scheduler_factor_fn,
    with_scheduler,
)


def torch_factors(make_sched, horizon):
    """Base-LR-relative factor trace from a real torch scheduler."""
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    sched = make_sched(opt)
    out = []
    for _ in range(horizon):
        out.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return np.asarray(out)


def repo_factors(cfg, horizon):
    host = np.asarray([scheduler_factor_fn(cfg)(s) for s in range(horizon)])
    jnp_f = jnp_factor_fn(cfg)
    traced = np.asarray([float(jnp_f(s)) for s in range(horizon)])
    np.testing.assert_allclose(host, traced, rtol=1e-5, atol=1e-7)
    return host


@pytest.mark.parametrize(
    "cfg,make",
    [
        ({"name": "StepLR", "args": {"step_size": 7, "gamma": 0.5}},
         lambda o: __import__("torch").optim.lr_scheduler.StepLR(o, 7, 0.5)),
        ({"name": "MultiStepLR", "args": {"milestones": [5, 12, 20], "gamma": 0.3}},
         lambda o: __import__("torch").optim.lr_scheduler.MultiStepLR(o, [5, 12, 20], 0.3)),
        ({"name": "ExponentialLR", "args": {"gamma": 0.93}},
         lambda o: __import__("torch").optim.lr_scheduler.ExponentialLR(o, 0.93)),
        ({"name": "LinearLR",
          "args": {"start_factor": 0.1, "end_factor": 1.0, "total_iters": 10}},
         lambda o: __import__("torch").optim.lr_scheduler.LinearLR(o, 0.1, 1.0, 10)),
        ({"name": "ConstantLR", "args": {"factor": 0.25, "total_iters": 8}},
         lambda o: __import__("torch").optim.lr_scheduler.ConstantLR(o, 0.25, 8)),
    ],
)
def test_single_scheduler_matches_torch(cfg, make):
    horizon = 30
    np.testing.assert_allclose(repo_factors(cfg, horizon),
                               torch_factors(make, horizon), rtol=1e-5)


def test_cosine_annealing_matches_torch():
    import torch

    cfg = {"name": "CosineAnnealingLR", "args": {"T_max": 20, "eta_min": 0.05}}
    horizon = 21  # torch cosine uses a recursive form that drifts past T_max
    got = repo_factors(cfg, horizon)
    want = torch_factors(
        lambda o: torch.optim.lr_scheduler.CosineAnnealingLR(o, 20, 0.05), horizon)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_sequential_warmup_then_exp_matches_torch():
    """The VERDICT's 'chained warmup+exp' acceptance case: LinearLR warmup
    for 10 steps then ExponentialLR decay, via SequentialLR."""
    import torch

    cfg = {
        "name": "SequentialLR",
        "milestones": [10],
        "schedulers": [
            {"name": "LinearLR",
             "args": {"start_factor": 0.01, "end_factor": 1.0, "total_iters": 10}},
            {"name": "ExponentialLR", "args": {"gamma": 0.95}},
        ],
    }

    def make(o):
        return torch.optim.lr_scheduler.SequentialLR(
            o,
            [torch.optim.lr_scheduler.LinearLR(o, 0.01, 1.0, 10),
             torch.optim.lr_scheduler.ExponentialLR(o, 0.95)],
            milestones=[10])

    horizon = 40
    np.testing.assert_allclose(repo_factors(cfg, horizon),
                               torch_factors(make, horizon), rtol=1e-5)


def test_chained_product_matches_torch():
    import torch

    cfg = {
        "name": "ChainedScheduler",
        "schedulers": [
            {"name": "ConstantLR", "args": {"factor": 0.5, "total_iters": 6}},
            {"name": "ExponentialLR", "args": {"gamma": 0.9}},
        ],
    }

    def make(o):
        return torch.optim.lr_scheduler.ChainedScheduler(
            [torch.optim.lr_scheduler.ConstantLR(o, 0.5, 6),
             torch.optim.lr_scheduler.ExponentialLR(o, 0.9)])

    horizon = 25
    np.testing.assert_allclose(repo_factors(cfg, horizon),
                               torch_factors(make, horizon), rtol=1e-5)


def test_optax_wiring_scales_updates():
    """with_scheduler(adam, cfg) must scale step s updates by factor(s) —
    i.e. torch 'scheduler.step() after optimizer.step()' ordering."""
    import jax.numpy as jnp
    import optax

    cfg = {"name": "StepLR", "args": {"step_size": 3, "gamma": 0.1}}
    base = optax.sgd(1.0)
    opt = with_scheduler(base, cfg)
    params = {"w": jnp.zeros(3)}
    state = opt.init(params)
    g = {"w": jnp.ones(3)}
    seen = []
    for _ in range(7):
        up, state = opt.update(g, state, params)
        seen.append(float(-up["w"][0]))
    want = [scheduler_factor_fn(cfg)(s) for s in range(7)]
    np.testing.assert_allclose(seen, want, rtol=1e-6)

    # falsy cfg is a no-op
    assert with_scheduler(base, None) is base


def test_lambda_lr_c_schedule():
    cfg = {"name": "LambdaLR",
           "args": {"lr_lambda": [0, 1.0, 0.1, 100]}}  # C(): linear 1->0.1
    f = scheduler_factor_fn(cfg)
    assert abs(f(0) - 1.0) < 1e-6
    assert abs(f(100) - 0.1) < 1e-6
    assert abs(f(50) - 0.55) < 1e-6
    jf = jnp_factor_fn(cfg)
    np.testing.assert_allclose([float(jf(s)) for s in (0, 50, 100)],
                               [f(s) for s in (0, 50, 100)], rtol=1e-5)


def test_parse_scheduler_rejects_unknown_interval():
    with pytest.raises(AssertionError):
        parse_scheduler({"name": "ExponentialLR", "args": {"gamma": 0.9},
                         "interval": "banana"})


def test_zoo_optimizer_honors_scheduler_block():
    """assembly_zoo._build_optimizer must apply system.scheduler (the
    round-4 gap: configs carrying a scheduler block were silently ignored)."""
    import jax.numpy as jnp

    from dreammesh4d_tpu.systems.assembly_zoo import _build_optimizer

    system = {
        "optimizer": {"name": "Adam", "args": {"lr": 1.0, "eps": 1e-8}},
        "scheduler": {"name": "ConstantLR",
                      "args": {"factor": 0.5, "total_iters": 100}},
    }
    opt = _build_optimizer(system)
    params = {"w": jnp.zeros(4)}
    state = opt.init(params)
    up, _ = opt.update({"w": jnp.ones(4)}, state, params)
    # adam(lr=1) first-step magnitude ~1 per element; halved by the factor
    np.testing.assert_allclose(np.abs(np.asarray(up["w"])), 0.5, atol=1e-3)

    plain = _build_optimizer({"optimizer": {"args": {"lr": 1.0}}})
    st2 = plain.init(params)
    up2, _ = plain.update({"w": jnp.ones(4)}, st2, params)
    np.testing.assert_allclose(np.abs(np.asarray(up2["w"])), 1.0, atol=1e-3)
