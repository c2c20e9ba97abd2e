import pytest
import math

import jax.numpy as jnp

from dreammesh4d_tpu.utils.schedule import C, C_jax, C_max

pytestmark = pytest.mark.quick  # core <5-min CPU tier


def test_constant():
    assert C(0.5, 0, 100) == 0.5
    assert C(3, 0, 100) == 3


def test_linear_4elem():
    sched = [100, 0.0, 1.0, 200]
    assert C(sched, 0, 0) == 0.0
    assert C(sched, 0, 100) == 0.0
    assert abs(C(sched, 0, 150) - 0.5) < 1e-9
    assert C(sched, 0, 200) == 1.0
    assert C(sched, 0, 500) == 1.0


def test_3elem_prepends_zero():
    assert abs(C([0.0, 1.0, 10], 0, 5) - 0.5) < 1e-9


def test_multisegment():
    # [s0, v0, v1, e1, v2, e2]: 0->100 interp 0->1, 100->200 interp 1->5
    sched = [0, 0.0, 1.0, 100, 5.0, 200]
    assert C(sched, 0, 50) == 0.5
    assert C(sched, 0, 100) == 1.0
    assert abs(C(sched, 0, 150) - 3.0) < 1e-9
    assert C(sched, 0, 300) == 5.0


def test_exp_interp():
    sched = [0, 1.0, 0.01, 100]
    v = C(sched, 0, 50, interpolation="exp")
    assert abs(v - math.exp((math.log(1.0) + math.log(0.01)) / 2)) < 1e-9


def test_epoch_mode_float_end():
    sched = [0, 0.0, 1.0, 10.0]  # float end_step -> epoch based
    assert C(sched, 5, 99999) == 0.5


def test_c_max():
    assert C_max(0.7) == 0.7
    assert C_max([0, 0.0, 1.0, 100]) == 1.0
    assert C_max([0, 0.0, 1.0, 100, 5.0, 200]) == 5.0


def test_c_jax_matches_c():
    sched = [100, 0.0, 1.0, 200]
    for step in [0, 100, 150, 200, 400]:
        assert abs(float(C_jax(sched, jnp.asarray(step))) - C(sched, 0, step)) < 1e-6
    multi = [0, 0.0, 1.0, 100, 5.0, 200]
    for step in [0, 50, 100, 150, 200, 300]:
        assert abs(float(C_jax(multi, jnp.asarray(step))) - C(multi, 0, step)) < 1e-5
