"""Deterministic task-level evaluation for trained Go2 policies.

For joystick tasks this reports the quantity the 21-term reward actually
optimizes (reference joystick.py:417-433): command-tracking error —
  - lin_err  = ||cmd_xy - local_linvel_xy||       (m/s)
  - ang_err  = |cmd_yaw - gyro_z|                 (rad/s)
averaged over alive steps, plus episode reward/length.  For getup /
handstand / footstand it reports episode reward plus the task posture
metric (torso uprightness from the gravity sensor).

Optionally renders a rollout video with the commanded-velocity arrow
decoration (utils.gait.draw_joystick_command).

Usage:
  python scripts/eval_go2.py logs/go2_joystick_50M_r5/final_params.pkl \
      --env Go2JoystickFlatTerrain --video /tmp/go2.mp4
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rsr_mjx_tpu import envs
from rsr_mjx_tpu.envs import wrappers
from rsr_mjx_tpu.train import configs, ppo, running_statistics, sac
from rsr_mjx_tpu.train import networks as ppo_networks


def main():
  p = argparse.ArgumentParser()
  p.add_argument('params_path')
  p.add_argument('--env', default='Go2JoystickFlatTerrain')
  p.add_argument('--episodes', type=int, default=64)
  p.add_argument('--episode_length', type=int, default=500)
  p.add_argument('--seed', type=int, default=0)
  p.add_argument('--video', default=None, help='mp4 output path')
  p.add_argument('--video_steps', type=int, default=300)
  args = p.parse_args()

  params = sac.load_params(args.params_path)
  env0 = envs.load(args.env)
  cfg = configs.ppo_config(args.env)
  nf = cfg.network_factory
  network = ppo_networks.make_ppo_networks(
      env0.observation_size, env0.action_size,
      policy_hidden_layer_sizes=tuple(nf.policy_hidden_layer_sizes),
      value_hidden_layer_sizes=tuple(nf.value_hidden_layer_sizes),
      policy_obs_key=nf.get('policy_obs_key', 'state'),
      value_obs_key=nf.get('value_obs_key', 'state'),
  )
  make_policy = ppo._make_policy_factory(
      network, running_statistics.normalize
  )
  policy = make_policy(params, deterministic=True)

  is_joystick = 'Joystick' in args.env
  env = wrappers.wrap_for_training(env0, episode_length=args.episode_length)
  B = args.episodes

  @jax.jit
  def run(key):
    state = env.reset(jax.random.split(key, B))

    def body(carry, _):
      s, k = carry
      k, sk = jax.random.split(k)
      a, _ = policy(s.obs, sk)
      ns = env.step(s, a)
      if is_joystick:
        cmd = ns.info['command']  # (B, 3)
        linvel = jax.vmap(env0.get_local_linvel)(ns.data)
        gyro = jax.vmap(env0.get_gyro)(ns.data)
        lin_err = jnp.linalg.norm(cmd[:, :2] - linvel[:, :2], axis=-1)
        ang_err = jnp.abs(cmd[:, 2] - gyro[:, 2])
      else:
        grav = jax.vmap(env0.get_gravity)(ns.data)
        # torso uprightness: -g_z/|g| = 1 when upright
        lin_err = -grav[:, 2] / (jnp.linalg.norm(grav, axis=-1) + 1e-9)
        ang_err = jnp.zeros(B)
      return (ns, k), (ns.reward, ns.done, lin_err, ang_err)

    (_, _), out = jax.lax.scan(
        body, (state, key), (), length=args.episode_length
    )
    return out

  rews, dones, lin_err, ang_err = map(
      np.asarray, run(jax.random.PRNGKey(args.seed))
  )
  # alive mask: steps up to and including the first done
  first_done = np.argmax(dones > 0, axis=0)
  first_done[~(dones > 0).any(axis=0)] = args.episode_length - 1
  T = np.arange(args.episode_length)[:, None]
  alive = T <= first_done[None, :]

  ep_rew = np.where(alive, rews, 0.0).sum(axis=0)
  ep_len = first_done + 1
  m_lin = np.where(alive, lin_err, 0.0).sum() / alive.sum()
  m_ang = np.where(alive, ang_err, 0.0).sum() / alive.sum()

  print(f'{args.env} deterministic eval over {B} episodes '
        f'({args.episode_length} steps):')
  print(f'  episode reward:  mean {ep_rew.mean():.2f}  '
        f'median {np.median(ep_rew):.2f}')
  print(f'  episode length:  mean {ep_len.mean():.0f} / '
        f'{args.episode_length}')
  if is_joystick:
    print(f'  lin tracking err: {m_lin:.3f} m/s   '
          f'(cmd range ±1.5/±0.8 m/s)')
    print(f'  ang tracking err: {m_ang:.3f} rad/s (cmd range ±1.2 rad/s)')
  else:
    print(f'  mean uprightness (-g_z, 1=upright): {m_lin:.3f}')
  print(f'  all finite: {np.isfinite(rews).all() and bool(alive.any())}')

  if args.video:
    from rsr_mjx_tpu.utils import gait as gait_utils
    from rsr_mjx_tpu.utils import rendering

    rng = jax.random.PRNGKey(args.seed + 1)
    state = jax.jit(env0.reset)(rng)
    step = jax.jit(env0.step)
    qposes, cmds, yaws = [np.asarray(state.data.qpos)], [], []
    for _ in range(args.video_steps):
      rng, sk = jax.random.split(rng)
      a, _ = policy(state.obs, sk)
      state = step(state, a)
      qposes.append(np.asarray(state.data.qpos))
      if is_joystick:
        q = np.asarray(state.data.qpos[3:7])
        yaw = np.arctan2(
            2 * (q[0] * q[3] + q[1] * q[2]),
            1 - 2 * (q[2] ** 2 + q[3] ** 2),
        )
        cmds.append(np.asarray(state.info['command']))
        yaws.append(yaw)
    mjm = getattr(env0, '_mjm_render', None) or env0._mjm

    modify = None
    if is_joystick:
      def modify(scn, i):
        j = min(max(i - 1, 0), len(cmds) - 1)
        xyz = qposes[i][:3] + np.array([0.0, 0.0, 0.2])
        gait_utils.draw_joystick_command(
            scn, cmds[j], xyz, yaws[j], scl=abs(cmds[j][0]) + 0.3
        )

    frames = rendering.render_array(
        mjm, qposes, height=480, width=640, camera='track',
        modify_scene=modify,
    )
    rendering.save_video(frames, args.video, fps=1.0 / env0.dt)
    print(f'  video: {args.video}')


if __name__ == '__main__':
  main()
