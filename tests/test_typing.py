"""Runtime shape checking (--typecheck): jaxtyping + typeguard enforcement."""

import jax.numpy as jnp
import numpy as np
import pytest

from dreammesh4d_tpu.ops.quaternion import quat_apply, quat_multiply, quat_to_matrix
from dreammesh4d_tpu.utils import typing as dt

pytestmark = pytest.mark.quick  # core <5-min CPU tier


@pytest.fixture
def checked():
    dt.enable_typecheck(True)
    yield
    dt.enable_typecheck(False)


def test_disabled_by_default_accepts_anything():
    assert not dt.typecheck_enabled()
    # no error even for a bogus call path (function itself would still fail
    # on math, so use a valid one)
    q = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(np.asarray(quat_apply(q, jnp.ones(3))), 1.0)


def test_checked_accepts_valid_shapes(checked):
    q = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0, 0.0]), (5, 4))
    p = jnp.ones((5, 3))
    out = quat_apply(q, p)
    assert out.shape == (5, 3)
    m = quat_to_matrix(q)
    assert m.shape == (5, 3, 3)


def test_checked_rejects_wrong_last_dim(checked):
    with pytest.raises(Exception) as ei:
        quat_multiply(jnp.ones((5, 3)), jnp.ones((5, 3)))  # 3 != 4
    assert "Float" in str(ei.value) or "type" in str(ei.value).lower()


def test_checked_rejects_mismatched_batch(checked):
    with pytest.raises(Exception):
        quat_apply(jnp.ones((5, 4)), jnp.ones((6, 3)))


def test_launch_flag_wires_enable(monkeypatch):
    import dreammesh4d_tpu.utils.typing as t

    assert not t.typecheck_enabled()
    t.enable_typecheck(True)
    assert t.typecheck_enabled()
    t.enable_typecheck(False)
