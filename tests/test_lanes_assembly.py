"""Parity: lanes-layout constraint assembly vs the per-env reference path.

The lanes assembly (physics/lanes_assembly.py) must produce exactly the
same constraint system — same row order, same values — as
vmap(constraint.assemble_from_leaves).  Checked on contact-rich states of
both model families: Airbot cube-push (condim-4 pyramids, equality
coupling, ncon_sel top-k selection) and Go2 flat (condim-3 feet + condim-1
self-collision groups, no selection).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsr_mjx_tpu import envs
from rsr_mjx_tpu.physics import constraint as C
from rsr_mjx_tpu.physics import lanes_assembly


def _batched_leaves(env, n=6, drive_steps=25):
  """Collect a batch of states driven into contact; returns stacked leaves."""
  m = env.model

  def drive(key):
    state = env.reset(key)

    def body(state, _):
      obs = state.obs['state'] if isinstance(state.obs, dict) else state.obs
      act = jnp.clip(obs[-3:] / 0.02, -1, 1) if obs.shape[-1] > 3 else None
      if act is None or env.action_size != 5:
        a = 0.2 * jnp.sin(jnp.arange(env.action_size, dtype=jnp.float32))
      else:
        a = jnp.concatenate([act, jnp.zeros(2)])
      return env.step(state, a), ()

    state, _ = jax.lax.scan(body, state, (), length=drive_steps)
    return state.data

  keys = jax.random.split(jax.random.PRNGKey(0), n)
  data = jax.jit(jax.vmap(drive))(keys)
  return jax.vmap(lambda d: C.gather_leaves(m, d))(data)


@pytest.mark.parametrize('env_name', ['AirbotCubePush', 'Go2JoystickFlatTerrain'])
def test_lanes_assembly_parity(env_name):
  env = envs.load(env_name)
  m = env.model
  lv = _batched_leaves(env)
  B = lv.qpos.shape[0]

  def ref(lv1):
    dist, pos, frame = C.narrowphase_leaves(m, lv1)
    efc = C.assemble_from_leaves(m, lv1, contact=(dist, pos, frame))
    return efc.J, efc.aref, efc.D, efc.floss, dist

  J_ref, aref_ref, D_ref, fl_ref, dist_ref = jax.jit(jax.vmap(ref))(lv)
  Jl, arefl, Dl, fll, dist_bm = jax.jit(
      lambda lv: lanes_assembly.assemble_lanes(m, lv)
  )(lv)
  np.testing.assert_allclose(np.asarray(dist_bm), np.asarray(dist_ref),
                             rtol=1e-6, atol=1e-6)

  # lanes (nv, R, B) → batch-major (B, R, nv)
  J_l2b = jnp.transpose(Jl, (2, 1, 0))
  np.testing.assert_allclose(np.asarray(J_l2b), np.asarray(J_ref),
                             rtol=1e-6, atol=1e-6)
  # rtol 1e-4: aref rows reach O(100); cross-machine XLA AOT float
  # reordering (this image loads an AOT cache compiled for a different
  # host CPU) shifts isolated elements by ~1e-4 relative
  np.testing.assert_allclose(np.asarray(jnp.transpose(arefl, (1, 0))),
                             np.asarray(aref_ref), rtol=1e-4, atol=1e-5)
  np.testing.assert_allclose(np.asarray(jnp.transpose(Dl, (1, 0))),
                             np.asarray(D_ref), rtol=1e-5, atol=1e-3)
  np.testing.assert_allclose(np.asarray(jnp.transpose(fll, (1, 0))),
                             np.asarray(fl_ref), rtol=1e-6, atol=1e-6)
  # sanity: contact actually happened in at least one env (non-vacuous)
  n_con_rows = C.layout_cached(m).n_con
  assert n_con_rows > 0
  assert float(jnp.max(D_ref[:, -n_con_rows:])) > 0, 'no active contact rows'
