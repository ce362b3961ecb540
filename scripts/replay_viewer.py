#!/usr/bin/env python
"""Offline visualizer: render logged TriFinger states to PNG frames / GIF.

The reference uses the IsaacGym OpenGL viewer (env_base.py:599-612); on TPU
the equivalent capability is host-side re-rendering from logged states —
run a rollout (optionally with a trained policy), record EnvState snapshots,
and draw them with matplotlib (top-down + side views: arena, fingertips,
cube, goal).

Usage:
    python scripts/replay_viewer.py --steps 100 --out /tmp/trifinger.gif
    python scripts/replay_viewer.py --checkpoint logs/<stamp>/nn/best --steps 300
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from leibnizgym_tpu.utils.platform import ensure_requested_platform

ensure_requested_platform()

import jax
import jax.numpy as jnp
import numpy as np

from leibnizgym_tpu.envs.trifinger.env import TrifingerEnv
from leibnizgym_tpu.models import trifinger as tf_model
from leibnizgym_tpu.ops.kinematics import all_tips_world
from leibnizgym_tpu.utils import print_info
from leibnizgym_tpu.utils.math import quat_to_matrix


def record_rollout(env: TrifingerEnv, num_steps: int, checkpoint: str | None,
                   env_index: int = 0, ppo_cfg=None):
    """Roll out and capture (tips, cube pose, goal pose) per step."""
    policy = None
    if checkpoint:
        from leibnizgym_tpu.learning.ppo import PPOConfig, make_networks
        import orbax.checkpoint as ocp

        cfg = ppo_cfg if ppo_cfg is not None else PPOConfig()
        actor_critic, _ = make_networks(cfg, env.static)
        ckptr = ocp.StandardCheckpointer()
        # restore via an abstract template from checkpoint metadata so a
        # TPU-saved checkpoint loads on any host (ignores saved shardings)
        path = os.path.abspath(checkpoint)
        meta = ckptr.metadata(path)
        if meta is None or meta.item_metadata is None:
            raise FileNotFoundError(f"no checkpoint at: {path}")
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        template = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
            meta.item_metadata.tree,
        )
        restored = ckptr.restore(path, template)
        ac_params = jax.tree.map(jnp.asarray, restored["ac_params"])

        # detect an obs-width mismatch up front (e.g. a checkpoint trained
        # with frame stacking replayed without --gym, so frames defaults
        # to 1) instead of failing deep inside flax apply with an opaque
        # kernel-shape error
        ckpt_in = int(ac_params["params"]["actor_0"]["kernel"].shape[0])
        frames_n = cfg.frames  # PPOConfig() default is frames=1
        feed_in = env.static.obs_dim * frames_n
        if ckpt_in != feed_in:
            if ckpt_in % env.static.obs_dim == 0:
                want = ckpt_in // env.static.obs_dim
                hint = (
                    f" The checkpoint expects frames={want} "
                    f"(rlg.params.config.frames) — pass --gym <preset> so the "
                    f"training preset's frame stacking (and obs layout) is "
                    f"reconstructed."
                )
            else:
                hint = (
                    " Pass --gym <preset> matching the training run so the "
                    "obs layout (e.g. keypoint obs) and frame stacking are "
                    "reconstructed."
                )
            raise SystemExit(
                f"checkpoint/network mismatch: the restored actor consumes "
                f"{ckpt_in}-dim observations but the env would feed "
                f"{feed_in} (obs_dim {env.static.obs_dim} x frames "
                f"{frames_n}).{hint}"
            )

        @jax.jit
        def policy_fn(obs):
            mu, _, _ = actor_critic.apply(ac_params, obs)
            return jnp.clip(mu, -1.0, 1.0)

        policy = policy_fn

    # frame stacking parity: a checkpoint trained with frames>1 expects
    # stacked obs — roll the same wrapper the play/eval paths use
    from leibnizgym_tpu.wrappers import stack_if_frames

    stacked_env = stack_if_frames(
        env, ppo_cfg.frames if (policy is not None and ppo_cfg) else 1
    )
    obs = stacked_env.reset()
    key = jax.random.PRNGKey(0)
    frames = []
    for _ in range(num_steps):
        if policy is not None:
            action = policy(jnp.clip(obs, -5.0, 5.0))
        else:
            key, k = jax.random.split(key)
            action = jax.random.uniform(
                k, (env.num_instances, env.get_action_dim()), minval=-1, maxval=1
            )
        obs, _, _, _ = stacked_env.step(action)
        st = env.state
        tips, _, _ = all_tips_world(st.physics.q[env_index])
        frames.append(
            dict(
                tips=np.asarray(tips),
                cube_pos=np.asarray(st.physics.cube_pos[env_index]),
                cube_rot=np.asarray(quat_to_matrix(st.physics.cube_quat[env_index])),
                goal=np.asarray(st.goal_pose[env_index]),
            )
        )
    return frames


from leibnizgym_tpu.utils.viewer import draw_frame  # shared with LiveViewer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--num-envs", type=int, default=4)
    ap.add_argument("--env-index", type=int, default=0)
    ap.add_argument("--difficulty", type=int, default=1)
    ap.add_argument("--gym", type=str, default=None,
                    help="gym preset name (e.g. trifinger_difficulty_4_"
                         "curriculum); builds the env AND the network dims "
                         "the checkpoint was trained with (keypoint obs, "
                         "substeps, reward config)")
    ap.add_argument("--level", type=float, default=1.0,
                    help="curriculum level for success-gated presets "
                         "(default 1.0 = full difficulty)")
    ap.add_argument("--checkpoint", type=str, default=None)
    ap.add_argument("--out", type=str, default="/tmp/trifinger_replay.gif")
    ap.add_argument("--stride", type=int, default=2, help="render every k-th step")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.animation as animation
    import matplotlib.pyplot as plt

    ppo_cfg = None
    if args.gym:
        from leibnizgym_tpu.config.presets import parse_cli, update_cfg
        from leibnizgym_tpu.learning.ppo import PPOConfig

        cfg = update_cfg(parse_cli(
            [f"gym={args.gym}", f"args.num_envs={args.num_envs}"]
        ))
        gym_cfg = cfg["gym"]
        env = TrifingerEnv(config=gym_cfg, verbose=False)
        ppo_cfg = PPOConfig.from_rlg_params(
            cfg["rlg"]["params"], num_actors=args.num_envs
        )
        if env.static.curriculum_success_gated:
            env.params = env.params.replace(
                curriculum_level=jnp.asarray(args.level, jnp.float32)
            )
            print_info(f"replay at curriculum level {args.level:.2f}")
    else:
        env = TrifingerEnv(
            config={"num_instances": args.num_envs, "command_mode": "torque",
                    "task_difficulty": args.difficulty, "sim": {"substeps": 2}},
            verbose=False,
        )
    frames = record_rollout(env, args.steps, args.checkpoint, args.env_index,
                            ppo_cfg=ppo_cfg)
    frames = frames[:: args.stride]
    half = float(tf_model.CUBE_SIZE / 2)

    fig, (ax_top, ax_side) = plt.subplots(1, 2, figsize=(8, 4))

    def update(i):
        draw_frame(ax_top, ax_side, frames[i], half)
        return []

    anim = animation.FuncAnimation(fig, update, frames=len(frames), interval=40)
    anim.save(args.out, writer="pillow", fps=25)
    print_info(f"wrote {args.out} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
