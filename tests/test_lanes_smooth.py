"""Parity: lanes-layout smooth dynamics vs the per-env reference chain.

smooth_lanes (physics/lanes_smooth.py) must produce exactly the same
qM / cvel / bias / passive / actuation / qacc_smooth as vmapping the
per-env stage chain (physics/smooth.py), on contact-rich driven states of
both model families.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsr_mjx_tpu import envs
from rsr_mjx_tpu.physics import kinematics as K
from rsr_mjx_tpu.physics import lanes_smooth as LS
from rsr_mjx_tpu.physics import linalg_kernels as lk
from rsr_mjx_tpu.physics import smooth as S


def _batched_data(env, n=6, drive_steps=20):
  def drive(key):
    state = env.reset(key)

    def body(state, _):
      a = 0.3 * jnp.sin(jnp.arange(env.action_size, dtype=jnp.float32))
      return env.step(state, a), ()

    state, _ = jax.lax.scan(body, state, (), length=drive_steps)
    return state.data

  keys = jax.random.split(jax.random.PRNGKey(3), n)
  return jax.jit(jax.vmap(drive))(keys)


@pytest.mark.parametrize(
    'env_name', ['AirbotCubePush', 'Go2JoystickFlatTerrain']
)
def test_lanes_smooth_parity(env_name, monkeypatch):
  env = envs.load(env_name)
  m = env.model
  data = _batched_data(env)
  # exercise the xfrc path with a non-zero wrench
  data = data.replace(
      xfrc_applied=0.5 * jnp.ones_like(data.xfrc_applied)
  )

  def ref(d):
    with jax.default_matmul_precision('highest'):
      d = K.com_vel(m, d)
      d = S.crb(m, d)
      d = S.rne(m, d)
      d = S.passive(m, d)
      d = S.actuation(m, d)
      d = S.fwd_velocity(m, d)
    return (
        d.qM, d.cvel, d.qfrc_bias, d.qfrc_passive, d.actuator_force,
        d.qfrc_actuator, d.qfrc_smooth, d.qacc_smooth,
    )

  out_ref = jax.jit(jax.vmap(ref))(data)

  assert LS.lanes_supported(m)
  sl = jax.vmap(lambda d: LS.gather_smooth(m, d))(data)

  def lanes(sl):
    with jax.default_matmul_precision('highest'):
      lv = LS.SmoothLeaves(*(jnp.moveaxis(a, 0, -1) for a in sl))
      out = LS.smooth_lanes(m, lv)
    return tuple(jnp.moveaxis(o, -1, 0) for o in out)

  monkeypatch.setattr(lk, '_INTERPRET', True)
  out_l = jax.jit(lanes)(sl)

  names = ('qM', 'cvel', 'qfrc_bias', 'qfrc_passive', 'actuator_force',
           'qfrc_actuator', 'qfrc_smooth', 'qacc_smooth')
  for name, a, b in zip(names, out_l, out_ref):
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5,
        err_msg=name,
    )
