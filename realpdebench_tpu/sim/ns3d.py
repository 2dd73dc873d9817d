"""3-D incompressible Navier–Stokes with an immersed tapered-NACA wing.

Reference counterpart: the WaterLily.jl generator
(`data/sim_generation/foil/ThreeD_NACA.jl:1-171`) — a tapered NACA0025 wing
at an angle of attack, body given by a signed-distance function (AutoBody).
Same fractional-step scheme as `ns2d.py`, lifted to 3-D: semi-Lagrangian
advection (trilinear backtrace), explicit diffusion, tanh-smoothed SDF body
blending, fully spectral Helmholtz projection on the periodic box, and an
inflow sponge. The whole trajectory is one `lax.scan` on device; frames are
saved as the mid-span slice (the 2-D fields the benchmark's foil HDF5 files
carry).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Solver3DConfig:
    nx: int = 96
    ny: int = 64
    nz: int = 32
    lx: float = 3.0
    ly: float = 2.0
    lz: float = 1.0
    u_inf: float = 1.0
    reynolds: float = 200.0
    chord: float = 0.6          # root chord length
    thickness: float = 0.25     # NACA00xx thickness ratio (0025)
    taper: float = 0.5          # tip chord = (1 - taper) · root chord
    aoa_deg: float = 10.0       # angle of attack
    center: Tuple[float, float, float] = (0.8, 1.0, 0.5)
    dt: float = 0.008
    smoothing: float = 1.5
    sponge_width: float = 0.2

    @property
    def spacing(self):
        return self.lx / self.nx, self.ly / self.ny, self.lz / self.nz

    @property
    def viscosity(self):
        return self.u_inf * self.chord / self.reynolds


def _grids(cfg):
    dx, dy, dz = cfg.spacing
    x = (jnp.arange(cfg.nx) + 0.5) * dx
    y = (jnp.arange(cfg.ny) + 0.5) * dy
    z = (jnp.arange(cfg.nz) + 0.5) * dz
    return jnp.meshgrid(x, y, z, indexing="ij")


def naca_half_thickness(xc, t):
    """NACA 00xx half-thickness profile on chord coordinate xc ∈ [0, 1]."""
    xc = jnp.clip(xc, 0.0, 1.0)
    return 5 * t * (
        0.2969 * jnp.sqrt(xc) - 0.1260 * xc - 0.3516 * xc**2
        + 0.2843 * xc**3 - 0.1036 * xc**4
    )


def wing_fraction(cfg: Solver3DConfig, aoa_deg=None):
    """Smoothed body fraction of the tapered NACA wing at angle of attack.

    ``aoa_deg`` may be a traced scalar (time-varying pitch); defaults to the
    static ``cfg.aoa_deg``."""
    X, Y, Z = _grids(cfg)
    cx, cy, cz = cfg.center
    a = jnp.deg2rad(cfg.aoa_deg if aoa_deg is None else aoa_deg)
    # rotate into chord coordinates (pitch about the spanwise z axis)
    xl = (X - cx) * jnp.cos(a) + (Y - cy) * jnp.sin(a)
    yl = -(X - cx) * jnp.sin(a) + (Y - cy) * jnp.cos(a)
    zl = Z - cz
    half_span = cfg.lz * 0.35
    span_frac = jnp.clip(jnp.abs(zl) / half_span, 0.0, 1.0)
    chord = cfg.chord * (1.0 - cfg.taper * span_frac)
    xc = xl / jnp.maximum(chord, 1e-6)
    yt = naca_half_thickness(xc, cfg.thickness) * chord
    # approximate signed distance: outside in chordwise/spanwise bounds or
    # beyond the thickness envelope
    d_thick = jnp.abs(yl) - yt
    d_chord = jnp.maximum(-xl, xl - chord)
    d_span = jnp.abs(zl) - half_span
    sdf = jnp.maximum(jnp.maximum(d_thick, d_chord), d_span)
    eps = cfg.smoothing * cfg.spacing[0]
    return 0.5 * (1.0 - jnp.tanh(sdf / eps))


def _sponge(cfg):
    X, _, _ = _grids(cfg)
    w = cfg.sponge_width * cfg.lx
    left = jnp.clip(1.0 - X / w, 0.0, 1.0)
    right = jnp.clip(1.0 - (cfg.lx - X) / w, 0.0, 1.0)
    return jnp.maximum(left, right) ** 2


def _semi_lagrangian_3d(f, u, v, w, dt, spacing):
    dx, dy, dz = spacing
    nx, ny, nz = f.shape
    I, J, K = jnp.meshgrid(jnp.arange(nx), jnp.arange(ny), jnp.arange(nz),
                           indexing="ij")
    xi = I - u * dt / dx
    yj = J - v * dt / dy
    zk = K - w * dt / dz
    i0 = jnp.floor(xi).astype(jnp.int32)
    j0 = jnp.floor(yj).astype(jnp.int32)
    k0 = jnp.floor(zk).astype(jnp.int32)
    fx, fy, fz = xi - i0, yj - j0, zk - k0

    def g(ii, jj, kk):
        return f[jnp.mod(ii, nx), jnp.mod(jj, ny), jnp.mod(kk, nz)]

    out = 0.0
    for di, wx in ((0, 1 - fx), (1, fx)):
        for dj, wy in ((0, 1 - fy), (1, fy)):
            for dk, wz in ((0, 1 - fz), (1, fz)):
                out = out + g(i0 + di, j0 + dj, k0 + dk) * wx * wy * wz
    return out


def _laplacian_3d(f, spacing):
    dx, dy, dz = spacing
    return (
        (jnp.roll(f, -1, 0) - 2 * f + jnp.roll(f, 1, 0)) / dx**2
        + (jnp.roll(f, -1, 1) - 2 * f + jnp.roll(f, 1, 1)) / dy**2
        + (jnp.roll(f, -1, 2) - 2 * f + jnp.roll(f, 1, 2)) / dz**2
    )


def make_stepper_3d(cfg: Solver3DConfig):
    dx, dy, dz = cfg.spacing
    kx = 2 * jnp.pi * jnp.fft.fftfreq(cfg.nx, d=dx)[:, None, None]
    ky = 2 * jnp.pi * jnp.fft.fftfreq(cfg.ny, d=dy)[None, :, None]
    kz = 2 * jnp.pi * jnp.fft.rfftfreq(cfg.nz, d=dz)[None, None, :]
    k2 = kx**2 + ky**2 + kz**2
    inv_k2 = jnp.where(k2 > 0, 1.0 / jnp.maximum(k2, 1e-12), 0.0)
    sponge = _sponge(cfg)
    dt, nu = cfg.dt, cfg.viscosity
    spacing = cfg.spacing

    def project(u, v, w):
        uh = jnp.fft.rfftn(u)
        vh = jnp.fft.rfftn(v)
        wh = jnp.fft.rfftn(w)
        s = kx * uh + ky * vh + kz * wh
        uh = uh - kx * s * inv_k2
        vh = vh - ky * s * inv_k2
        wh = wh - kz * s * inv_k2
        shape = (cfg.nx, cfg.ny, cfg.nz)
        p = jnp.fft.irfftn(-1j * s * inv_k2 / dt, s=shape)
        return (jnp.fft.irfftn(uh, s=shape), jnp.fft.irfftn(vh, s=shape),
                jnp.fft.irfftn(wh, s=shape), p)

    def step(state, body, body_vel=None):
        u, v, w = state
        ua = _semi_lagrangian_3d(u, u, v, w, dt, spacing)
        va = _semi_lagrangian_3d(v, u, v, w, dt, spacing)
        wa = _semi_lagrangian_3d(w, u, v, w, dt, spacing)
        ud = ua + dt * nu * _laplacian_3d(ua, spacing)
        vd = va + dt * nu * _laplacian_3d(va, spacing)
        wd = wa + dt * nu * _laplacian_3d(wa, spacing)
        # BDIM blend: inside the body the flow takes the body's local
        # velocity (zero for the static wing)
        ub, vb, wb = (0.0, 0.0, 0.0) if body_vel is None else body_vel
        uf = (1 - body) * ud + body * ub
        vf = (1 - body) * vd + body * vb
        wf = (1 - body) * wd + body * wb
        us = (1 - sponge) * uf + sponge * cfg.u_inf
        vs = (1 - sponge) * vf
        ws = (1 - sponge) * wf
        u, v, w, p = project(us, vs, ws)
        return (u, v, w), p

    return step


@partial(jax.jit, static_argnums=(0, 2, 3, 4))
def simulate_foil(cfg: Solver3DConfig, key, n_frames: int, substeps: int = 4,
                  full_volume: bool = False):
    """Roll a 3-D wing trajectory.

    Returns mid-span-slice frames [n_frames, nx, ny, 3] with channels
    (u, v, p) — the 2-D fields the benchmark's foil dataset files store —
    or, with ``full_volume=True``, the complete volumetric fields
    [n_frames, nx, ny, nz, 4] with channels (u, v, w, p) (the reference's
    WaterLily generator keeps the full 3-D state; the shipped HDF5 only
    carries the mid-span plane)."""
    step = make_stepper_3d(cfg)
    body = wing_fraction(cfg)
    u = jnp.full((cfg.nx, cfg.ny, cfg.nz), cfg.u_inf, jnp.float32)
    v = jnp.zeros_like(u) + 1e-2 * jax.random.normal(key, u.shape)
    w = jnp.zeros_like(u)
    state = (u, v, w)
    mid = cfg.nz // 2

    def frame(state, _):
        def sub(s, _):
            s, p = step(s, body)
            return s, p

        state, ps = jax.lax.scan(sub, state, None, length=substeps)
        u, v, w = state
        p = ps[-1]
        if full_volume:
            return state, jnp.stack([u, v, w, p], axis=-1)
        return state, jnp.stack([u[:, :, mid], v[:, :, mid], p[:, :, mid]],
                                axis=-1)

    _, frames = jax.lax.scan(frame, state, None, length=n_frames)
    return frames


@partial(jax.jit, static_argnums=(0, 2, 3, 6))
def simulate_pitching_foil(cfg: Solver3DConfig, key, n_frames: int,
                           substeps: int = 4, pitch_amp_deg: float = 5.0,
                           pitch_freq: float = 0.5,
                           full_volume: bool = False):
    """Pitching-wing trajectory: AoA(t) = aoa + amp·sin(2πft), pitching
    about the spanwise axis through ``cfg.center``.

    Moving-body extension of the reference's static WaterLily foil
    (`ThreeD_NACA.jl` has a fixed AoA): the smoothed body fraction is
    re-evaluated each substep at the instantaneous angle (an analytic tanh
    field — no remeshing), and the BDIM blend drives the interior flow to
    the body's rigid-rotation velocity  (−ω·(y−cy), ω·(x−cx), 0).
    Same return layout as :func:`simulate_foil`, plus the per-frame AoA
    trace ``[n_frames]`` as a second output."""
    step = make_stepper_3d(cfg)
    X, Y, _ = _grids(cfg)
    cx, cy, _ = cfg.center
    u = jnp.full((cfg.nx, cfg.ny, cfg.nz), cfg.u_inf, jnp.float32)
    v = jnp.zeros_like(u) + 1e-2 * jax.random.normal(key, u.shape)
    w = jnp.zeros_like(u)
    mid = cfg.nz // 2
    two_pi_f = 2.0 * jnp.pi * pitch_freq
    amp_rad = jnp.deg2rad(pitch_amp_deg)

    ts = (jnp.arange(n_frames * substeps, dtype=jnp.float32)
          * cfg.dt).reshape(n_frames, substeps)

    def frame(state, tsub):
        def sub(s, t):
            aoa = cfg.aoa_deg + pitch_amp_deg * jnp.sin(two_pi_f * t)
            omega = amp_rad * two_pi_f * jnp.cos(two_pi_f * t)  # dθ/dt
            body = wing_fraction(cfg, aoa)
            bvel = (-omega * (Y - cy), omega * (X - cx), 0.0)
            s, p = step(s, body, body_vel=bvel)
            return s, (p, aoa)

        state, (ps, aoas) = jax.lax.scan(sub, state, tsub)
        u, v, w = state
        p = ps[-1]
        if full_volume:
            return state, (jnp.stack([u, v, w, p], axis=-1), aoas[-1])
        return state, (jnp.stack(
            [u[:, :, mid], v[:, :, mid], p[:, :, mid]], axis=-1), aoas[-1])

    _, (frames, aoa_trace) = jax.lax.scan(frame, (u, v, w), ts)
    return frames, aoa_trace
