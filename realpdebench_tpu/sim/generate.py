"""Offline trajectory generation: parameter sweeps → benchmark-layout HDF5.

Reference counterpart: `data/sim_generation/cylinder/main.py:122-199` — runs a
sweep of solver instances and stores velocity frames. Here the whole sweep is
a `jax.vmap` over body parameters, rolling every trajectory simultaneously
on-device, then writing `{root}/{scenario}/numerical/{id}.h5` files with the
`measured_data/{u,v,p}` layout the datasets consume (fluid_dataset.py:361-372).

Usage:
    python -m realpdebench_tpu.sim.generate --dataset-root ./datasets \
        --scenario cylinder --n-sim 4 --n-frames 256 [--nx 128 --ny 128]
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from realpdebench_tpu.sim.ns2d import SolverConfig, simulate


def generate_cylinder_sweep(dataset_root, scenario="cylinder", n_sim=4,
                            n_frames=256, nx=256, ny=128, substeps=4,
                            re_min=80.0, re_max=200.0, seed=0,
                            warmup_frames=64):
    out_dir = os.path.join(dataset_root, scenario, "numerical")
    os.makedirs(out_dir, exist_ok=True)
    import h5py

    reynolds = np.linspace(re_min, re_max, n_sim)
    key = jax.random.PRNGKey(seed)
    written = []
    for i, re in enumerate(reynolds):
        cfg = SolverConfig(nx=nx, ny=ny, reynolds=float(re))
        key, k = jax.random.split(key)
        frames, cd, cl = simulate(cfg, k, n_frames + warmup_frames,
                                  substeps=substeps)
        frames = np.asarray(frames[warmup_frames:])
        sim_id = 1000 + i
        path = os.path.join(out_dir, f"{sim_id}.h5")
        with h5py.File(path, "w") as f:
            g = f.create_group("measured_data")
            g.create_dataset("u", data=frames[..., 0])
            g.create_dataset("v", data=frames[..., 1])
            g.create_dataset("p", data=frames[..., 2])
            f.attrs["reynolds"] = float(re)
            f.create_dataset("cd", data=np.asarray(cd[warmup_frames:]))
            f.create_dataset("cl", data=np.asarray(cl[warmup_frames:]))
        written.append(path)
        print(f"sim {sim_id}: Re={re:.1f} → {path}")
    return written


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset-root", required=True)
    parser.add_argument("--scenario", default="cylinder")
    parser.add_argument("--n-sim", type=int, default=4)
    parser.add_argument("--n-frames", type=int, default=256)
    parser.add_argument("--nx", type=int, default=256)
    parser.add_argument("--ny", type=int, default=128)
    parser.add_argument("--re-min", type=float, default=80.0)
    parser.add_argument("--re-max", type=float, default=200.0)
    parser.add_argument("--nz", type=int, default=32,
                        help="spanwise resolution (foil only)")
    parser.add_argument("--pitch-amp-deg", type=float, default=0.0,
                        help="pitching amplitude (foil only; 0 = static)")
    parser.add_argument("--pitch-freq", type=float, default=0.5,
                        help="pitching frequency (foil only)")
    args = parser.parse_args()
    if args.scenario == "fsi":
        generate_fsi_sweep(
            args.dataset_root, args.n_sim, args.n_frames, args.nx, args.ny,
            re_min=args.re_min, re_max=args.re_max,
        )
    elif args.scenario == "controlled_cylinder":
        generate_controlled_sweep(
            args.dataset_root, args.n_sim, args.n_frames, args.nx, args.ny,
        )
    elif args.scenario == "foil":
        generate_foil_sweep(
            args.dataset_root, args.n_sim, args.n_frames,
            nx=args.nx, ny=args.ny, nz=args.nz,
            pitch_amp_deg=args.pitch_amp_deg, pitch_freq=args.pitch_freq,
        )
    else:
        generate_cylinder_sweep(
            args.dataset_root, args.scenario, args.n_sim, args.n_frames,
            args.nx, args.ny, re_min=args.re_min, re_max=args.re_max,
        )



def generate_controlled_sweep(dataset_root, n_sim=4, n_frames=256, nx=256,
                              ny=128, substeps=4, re=150.0, seed=0,
                              warmup_frames=64, action_scale_min=0.2,
                              action_scale_max=1.0):
    """Controlled-cylinder trajectories: a rotation-control action sequence is
    replayed during the roll (reference `controlled_cylinder/main.py:158-165`
    replays `action.npy` sequences); filenames follow the scenario pattern
    `{id}_{scale}.h5` so parameter-conditioning channels parse."""
    import h5py

    from realpdebench_tpu.sim.ns2d import (
        SolverConfig, cylinder_fraction, initial_state, make_stepper,
    )

    out_dir = os.path.join(dataset_root, "controlled_cylinder", "numerical")
    os.makedirs(out_dir, exist_ok=True)
    scales = np.linspace(action_scale_min, action_scale_max, n_sim)
    key = jax.random.PRNGKey(seed)
    written = []
    for i, scale in enumerate(scales):
        cfg = SolverConfig(nx=nx, ny=ny, reynolds=float(re))
        step = make_stepper(cfg)
        body = cylinder_fraction(cfg)
        total = n_frames + warmup_frames
        # smooth random control signal (surface tangential speed)
        key, ka, ks = jax.random.split(key, 3)
        raw = jax.random.normal(ka, (total,))
        kernel = jax.numpy.ones(9) / 9.0
        actions = float(scale) * jax.numpy.convolve(raw, kernel, mode="same")

        import functools

        @functools.partial(jax.jit, static_argnums=())
        def roll(state, actions):
            def frame(state, a):
                def sub(s, _):
                    s, aux = step(s, body, (0.0, a))
                    return s, aux

                state, auxs = jax.lax.scan(sub, state, None, length=substeps)
                p, cd, cl = jax.tree_util.tree_map(lambda z: z[-1], auxs)
                u, v = state
                return state, (jax.numpy.stack([u, v, p], axis=-1), cd, cl)

            return jax.lax.scan(frame, state, actions)

        state = initial_state(cfg, ks)
        _, (frames, cd, cl) = roll(state, actions)
        frames = np.asarray(frames[warmup_frames:])
        sim_id = 1000 + i
        path = os.path.join(out_dir, f"{sim_id}_{scale:.2f}.h5")
        with h5py.File(path, "w") as f:
            g = f.create_group("measured_data")
            g.create_dataset("u", data=frames[..., 0])
            g.create_dataset("v", data=frames[..., 1])
            g.create_dataset("p", data=frames[..., 2])
            f.create_dataset("action", data=np.asarray(actions[warmup_frames:]))
        written.append(path)
        print(f"controlled sim {sim_id}: scale={scale:.2f} → {path}")
    return written


def generate_fsi_sweep(dataset_root, n_sim=4, n_frames=256, nx=256, ny=128,
                       substeps=4, re_min=100.0, re_max=300.0, seed=0,
                       warmup_frames=64, stiffness_min=4.0,
                       stiffness_max=16.0):
    """FSI trajectories: an elastically mounted cylinder responding to the
    fluid force (vortex-induced vibration). Reference counterpart: the
    moving-body BDIM sweep in `data/sim_generation/fsi/` (Test0.pde's
    spring/damper `forceR` + `Cylinder1.react`). Sweeps (Re, spring
    stiffness); writes the benchmark `measured_data/{u,v,p}` layout plus the
    body-center path."""
    import h5py

    from realpdebench_tpu.sim.ns2d import FSIConfig, SolverConfig, simulate_fsi

    out_dir = os.path.join(dataset_root, "fsi", "numerical")
    os.makedirs(out_dir, exist_ok=True)
    reynolds = np.linspace(re_min, re_max, n_sim)
    stiffness = np.linspace(stiffness_min, stiffness_max, n_sim)
    key = jax.random.PRNGKey(seed)
    written = []
    for i, (re, k_spring) in enumerate(zip(reynolds, stiffness)):
        cfg = SolverConfig(nx=nx, ny=ny, reynolds=float(re))
        fsi = FSIConfig(stiffness=float(k_spring))
        key, k = jax.random.split(key)
        frames, cd, cl, centers = simulate_fsi(
            cfg, fsi, k, n_frames + warmup_frames, substeps=substeps)
        frames = np.asarray(frames[warmup_frames:])
        sim_id = 1000 + i
        # FSI filenames carry (id, parameter) — the dataset's regex is
        # r"(\d+)_([\d\.]+)_" (data/fluid.py FSI.file_name_pattern)
        path = os.path.join(out_dir, f"{sim_id}_{re / 100.0:.2f}_.h5")
        with h5py.File(path, "w") as f:
            g = f.create_group("measured_data")
            g.create_dataset("u", data=frames[..., 0])
            g.create_dataset("v", data=frames[..., 1])
            g.create_dataset("p", data=frames[..., 2])
            f.attrs["reynolds"] = float(re)
            f.attrs["stiffness"] = float(k_spring)
            f.create_dataset("cd", data=np.asarray(cd[warmup_frames:]))
            f.create_dataset("cl", data=np.asarray(cl[warmup_frames:]))
            f.create_dataset(
                "body_center", data=np.asarray(centers[warmup_frames:]))
        written.append(path)
        print(f"fsi sim {sim_id}: Re={re:.1f} k={k_spring:.1f} → {path}")
    return written


def generate_foil_sweep(dataset_root, n_sim=4, n_frames=256, nx=96, ny=64,
                        nz=32, substeps=4, aoa_min=5.0, aoa_max=15.0,
                        seed=0, warmup_frames=32, pitch_amp_deg=0.0,
                        pitch_freq=0.5):
    """3-D tapered-wing trajectories (reference counterpart:
    `data/sim_generation/foil/ThreeD_NACA.jl` — a static NACA0025 wing at
    an AoA sweep). Writes the benchmark mid-span `measured_data/{u,v,p}`
    layout. ``pitch_amp_deg > 0`` switches to the moving-body pitching wing
    (beyond-reference; the AoA trace is stored alongside)."""
    import h5py

    from realpdebench_tpu.sim.ns3d import (
        Solver3DConfig, simulate_foil, simulate_pitching_foil,
    )

    out_dir = os.path.join(dataset_root, "foil", "numerical")
    os.makedirs(out_dir, exist_ok=True)
    aoas = np.linspace(aoa_min, aoa_max, n_sim)
    key = jax.random.PRNGKey(seed)
    written = []
    for i, aoa in enumerate(aoas):
        cfg = Solver3DConfig(nx=nx, ny=ny, nz=nz, aoa_deg=float(aoa))
        key, k = jax.random.split(key)
        total = n_frames + warmup_frames
        if pitch_amp_deg > 0:
            frames, aoa_trace = simulate_pitching_foil(
                cfg, k, total, substeps=substeps,
                pitch_amp_deg=float(pitch_amp_deg),
                pitch_freq=float(pitch_freq))
            aoa_trace = np.asarray(aoa_trace[warmup_frames:])
        else:
            frames = simulate_foil(cfg, k, total, substeps=substeps)
            aoa_trace = None
        frames = np.asarray(frames[warmup_frames:])
        sim_id = 2000 + i
        # Foil's file_name_pattern is r"(\d+)_(\d+\.?\d*)\.h5" — no trailing
        # underscore (data/fluid.py:321)
        path = os.path.join(out_dir, f"{sim_id}_{aoa:.1f}.h5")
        with h5py.File(path, "w") as f:
            g = f.create_group("measured_data")
            g.create_dataset("u", data=frames[..., 0])
            g.create_dataset("v", data=frames[..., 1])
            g.create_dataset("p", data=frames[..., 2])
            f.attrs["aoa_deg"] = float(aoa)
            f.attrs["pitch_amp_deg"] = float(pitch_amp_deg)
            if aoa_trace is not None:
                f.create_dataset("aoa_trace", data=aoa_trace)
        written.append(path)
        print(f"foil sim {sim_id}: AoA={aoa:.1f} "
              f"pitch={pitch_amp_deg:.1f} → {path}")
    return written


if __name__ == "__main__":
    main()
