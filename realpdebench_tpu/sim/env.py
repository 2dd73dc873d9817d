"""Gym-style flow environment over the JAX NS solver.

Reference counterpart: the XML-RPC bridge + gym env that drives the Java
LilyPad solver (`data/sim_generation/cylinder/env/flow_field_env.py:1-57`) —
`reset()`/`step(action)` returning the flattened velocity field, the body
boundary, and the force coefficients (CD, CL). Here the solver runs in-process
on the accelerator; `action` sets the body's surface velocity (the rotation
control of controlled_cylinder, `controlled_cylinder/main.py:158-165`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from realpdebench_tpu.sim.ns2d import (
    SolverConfig,
    cylinder_fraction,
    initial_state,
    make_stepper,
)


class FlowEnv:
    def __init__(self, cfg: SolverConfig = SolverConfig(), substeps: int = 4,
                 seed: int = 0):
        self.cfg = cfg
        self.substeps = substeps
        self._seed = seed
        self._body = cylinder_fraction(cfg)
        step = make_stepper(cfg)

        def multi(state, body, action):
            # action = tangential surface speed (rotation control): translate
            # to a solid-body velocity field magnitude at the boundary; for
            # the uncontrolled env action == 0
            body_vel = (0.0, action)

            def sub(s, _):
                s, aux = step(s, body, body_vel)
                return s, aux

            state, auxs = jax.lax.scan(sub, state, None, length=substeps)
            p, cd, cl = jax.tree_util.tree_map(lambda a: a[-1], auxs)
            return state, (p, cd, cl)

        self._step = jax.jit(multi)
        self.state = None

    def reset(self):
        key = jax.random.PRNGKey(self._seed)
        self.state = initial_state(self.cfg, key)
        u, v = self.state
        obs = np.stack([np.asarray(u), np.asarray(v)], axis=-1)
        return obs.reshape(-1)

    def step(self, action: float = 0.0):
        self.state, (p, cd, cl) = self._step(
            self.state, self._body, jnp.float32(action)
        )
        u, v = self.state
        obs = np.stack([np.asarray(u), np.asarray(v)], axis=-1).reshape(-1)
        info = {
            "cd": float(cd),
            "cl": float(cl),
            "body_boundary": np.asarray(self._body),
            "pressure": np.asarray(p),
        }
        done = False
        reward = -abs(float(cd))
        return obs, reward, done, info
