"""MWT3d — Multiwavelet Transform operator.

Functional parity with the reference (`realpdebench/model/MWT_libs/models.py:
498-785`): input lifted to c·k² features, then nCZ multiwavelet CZ cells with
ReLU between. Each cell recursively decomposes the (H, W) plane with 2×2
kron-filter matmuls (ec_s/ec_d), applies a Fourier kernel A on the detail
coefficients plus conv kernels B/C, transforms the coarsest scale (T0), and
reconstructs by even/odd interleaving (rc_* matrices). Rectangular grids work
through the reference's broadcasting trick: the coarsest-level view collapses
the leftover W axis into channels (shape_multiplier = W/H,
models.py:663-672), and reconstruction broadcasts back.

TPU notes: the wavelet (de)composition matrices are tiny dense constants —
every step is a batched GEMM on the MXU; the per-level spectral kernel reuses
the shared FFT pattern with level-clamped mode truncation; all level shapes
are static under jit (the recursion depth is floor(log2(H))−L, a Python
constant).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from realpdebench_tpu.ops.multiwavelet import cz_matrices


def _xavier_normal_complex(key, shape):
    """torch nn.init.xavier_normal_ on a cfloat tensor treats the full complex
    tensor's fan-in/out; real/imag each get N(0, std²) with
    std = sqrt(2/(fan_in+fan_out)) / sqrt(2) (torch divides variance between
    the two components)."""
    fan_in, fan_out = shape[1], shape[0]
    std = math.sqrt(2.0 / (fan_in + fan_out))
    # torch xavier_normal_ on complex: samples complex with |std| overall;
    # real/imag each std/sqrt(2)
    k1, k2 = jax.random.split(key)
    comp_std = std / math.sqrt(2.0)
    return (
        comp_std * jax.random.normal(k1, shape),
        comp_std * jax.random.normal(k2, shape),
    )


class SparseKernelFT3d(nn.Module):
    """Fourier kernel on wavelet coefficients (models.py:535-585).

    Input [B, Nx, Ny, T, c, k²]; rfft over (Nx, Ny, T) with rfft axis = T;
    mode truncation clamped to the current level size (l1/l2)."""

    k: int
    alpha: int
    c: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, Nx, Ny, T, c, ich = x.shape
        ck2 = c * ich
        modes = self.alpha
        shape = (ck2, ck2, modes, modes, modes)

        # Draw in the torch fan order (xavier fan from shape[0:2]), then store
        # channels-minor [4, m, m, m, ck2, ck2] (see fno.py::_spectral_params)
        wr = self.param("w_real", lambda k_: jnp.stack(
            [_xavier_normal_complex(kk, shape)[0].transpose(2, 3, 4, 0, 1)
             for kk in jax.random.split(k_, 4)]))
        wi = self.param("w_imag", lambda k_: jnp.stack(
            [_xavier_normal_complex(kk, shape)[1].transpose(2, 3, 4, 0, 1)
             for kk in jax.random.split(k_, 4)]))

        xf = x.reshape(B, Nx, Ny, T, ck2).astype(jnp.float32)

        l1 = min(modes, Nx // 2 + 1)
        l2 = min(modes, Ny // 2 + 1)
        l3 = min(modes, T // 2 + 1)

        wrc = wr[:, :l1, :l2, :l3]
        wic = wi[:, :l1, :l2, :l3]

        if 2 * l1 <= Nx and 2 * l2 <= Ny:
            # No ± corner overlap → the shared truncated-DFT spectral conv is
            # exact here and skips the full-grid rfftn/irfftn round-trip (the
            # top levels of the wavelet pyramid dominate the cost; alpha=5
            # keeps only 5³ modes of a 64×128×20 grid). MWT's transform axes
            # (Nx, Ny, T=rfft) map onto spectral.py's (T, H, W=rfft) and the
            # corner order matches (models.py:559-571 vs fno.py:53-60).
            from realpdebench_tpu.ops.spectral import truncated_spectral_conv3d

            out = truncated_spectral_conv3d(
                xf, wrc, wic, compute_dtype=self.dtype)
            out = nn.relu(out)
            out = nn.Dense(ck2, name="Lo", dtype=self.dtype)(out)
            return out.reshape(B, Nx, Ny, T, c, ich)

        # Deep (tiny) levels where 2·l exceeds the axis: corner writes
        # overlap, and the reference's overwrite semantics (later corner
        # wins) require the explicit spectrum assembly below.
        from realpdebench_tpu.ops import spectral as SP

        if SP.use_dft_matmul():
            # dense-DFT planes on the tiny grid: dp-shardable (jnp.fft
            # all-gathers the batch — GSPMD cannot partition the FFT HLO)
            ftr_in, fti_in = SP.rfftn_planes(xf, axes=(1, 2, 3))
        else:
            x_ft = jnp.fft.rfftn(xf, axes=(1, 2, 3))
            ftr_in, fti_in = x_ft.real, x_ft.imag

        def _corners(z):
            return jnp.stack(
                [
                    z[:, :l1, :l2, :l3, :],
                    z[:, -l1:, :l2, :l3, :],
                    z[:, :l1, -l2:, :l3, :],
                    z[:, -l1:, -l2:, :l3, :],
                ],
                axis=1,
            )  # [B, 4, l1, l2, l3, ck2]

        # Complex contraction unrolled into real einsums: complex dots do not
        # lower on some TPU runtimes, and real GEMMs are the MXU-native form
        # anyway (same trick as ops/spectral.py's DFT path).
        xr, xi = _corners(ftr_in), _corners(fti_in)
        out_r = (jnp.einsum("bkxyzi,kxyzio->bkxyzo", xr, wrc)
                 - jnp.einsum("bkxyzi,kxyzio->bkxyzo", xi, wic))
        out_i = (jnp.einsum("bkxyzi,kxyzio->bkxyzo", xr, wic)
                 + jnp.einsum("bkxyzi,kxyzio->bkxyzo", xi, wrc))

        Tr = T // 2 + 1
        ftr = jnp.zeros((B, Nx, Ny, Tr, ck2), jnp.float32)
        fti = jnp.zeros((B, Nx, Ny, Tr, ck2), jnp.float32)
        for j, idx in enumerate((
            (slice(None), slice(None, l1), slice(None, l2), slice(None, l3)),
            (slice(None), slice(-l1, None), slice(None, l2), slice(None, l3)),
            (slice(None), slice(None, l1), slice(-l2, None), slice(None, l3)),
            (slice(None), slice(-l1, None), slice(-l2, None), slice(None, l3)),
        )):
            ftr = ftr.at[idx].set(out_r[:, j])
            fti = fti.at[idx].set(out_i[:, j])
        if SP.use_dft_matmul():
            out = SP.irfftn_planes(ftr, fti, s=(Nx, Ny, T), axes=(1, 2, 3))
        else:
            out = jnp.fft.irfftn(jax.lax.complex(ftr, fti), s=(Nx, Ny, T),
                                 axes=(1, 2, 3))
        out = nn.relu(out)
        out = nn.Dense(ck2, name="Lo")(out)
        return out.reshape(B, Nx, Ny, T, c, ich)


class SparseKernel3d(nn.Module):
    """Conv kernel on wavelet coefficients (models.py:498-527):
    Conv3d k3 'same' + ReLU + Linear."""

    k: int
    c: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, Nx, Ny, T, c, ich = x.shape
        ck2 = c * ich
        h = x.reshape(B, Nx, Ny, T, ck2)
        h = nn.Conv(ck2, kernel_size=(3, 3, 3), padding="SAME", name="conv",
                    dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Dense(ck2, name="Lo", dtype=self.dtype)(h)
        return h.reshape(B, Nx, Ny, T, c, ich)


class MWTCZ3d(nn.Module):
    k: int = 3
    alpha: int = 5
    L: int = 0
    c: int = 1
    shape_multiplier: int = 1
    base: str = "legendre"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, Nx, Ny, T, c, ich = x.shape
        ns = math.floor(np.log2(Nx))
        ec_s, ec_d, rc_ee, rc_eo, rc_oe, rc_oo = (
            jnp.asarray(m, x.dtype) for m in cz_matrices(self.base, self.k)
        )

        A = SparseKernelFT3d(self.k, self.alpha, self.c, dtype=self.dtype,
                             name="A")
        Bm = SparseKernel3d(self.k, self.c, dtype=self.dtype, name="B")
        Cm = SparseKernel3d(self.k, self.c, dtype=self.dtype, name="C")

        def wavelet_transform(z):
            # even/odd split via reshape + unit-axis slices. The strided
            # z[:, ::2, ::2] form lowered as a gather fusion whose scoped
            # vmem scales with the microbatch (28-56 MB vs the 16 MB stack
            # limit — compile OOM below accum=4) and fed the copy-dominated
            # profile (bench_results/r5/profile_mwt_r5.log).
            b, nx, ny = z.shape[:3]
            z2 = z.reshape(b, nx // 2, 2, ny // 2, 2, *z.shape[3:])
            za = jnp.concatenate(
                [z2[:, :, 0, :, 0], z2[:, :, 0, :, 1],
                 z2[:, :, 1, :, 0], z2[:, :, 1, :, 1]], axis=-1
            )
            return za @ ec_d, za @ ec_s  # (detail, smooth)

        Ud, Us = [], []
        for _ in range(ns - self.L):
            d, x = wavelet_transform(x)
            Ud.append(A(d) + Bm(x))
            Us.append(Cm(d))

        # coarsest-scale transform; rectangular leftovers fold into channels
        coarse = x.reshape(B, 2**self.L, 2**self.L, T, -1)
        x = nn.Dense(c * ich, name="T0", dtype=self.dtype)(coarse).reshape(
            B, 2**self.L, 2**self.L, T, c, ich
        )

        for i in range(ns - 1 - self.L, -1, -1):
            x = x + Us[i]  # broadcasts over the leftover Ny axis
            x = jnp.concatenate(
                [jnp.broadcast_to(x, Ud[i].shape[:-1] + (ich,)), Ud[i]],
                axis=-1,
            )
            # even/odd reconstruction; interleave via stack+reshape
            # (out[2i+p, 2j+q] = x_pq[i, j]) instead of 4 strided scatters —
            # XLA lowers this to transposes, not scatter loops
            x_ee = x @ rc_ee
            x_eo = x @ rc_eo
            x_oe = x @ rc_oe
            x_oo = x @ rc_oo
            Bz, nx, ny = x.shape[0], x.shape[1], x.shape[2]
            tail = x_ee.shape[3:]
            even = jnp.stack([x_ee, x_eo], axis=3).reshape(
                Bz, nx, ny * 2, *tail)
            odd = jnp.stack([x_oe, x_oo], axis=3).reshape(
                Bz, nx, ny * 2, *tail)
            x = jnp.stack([even, odd], axis=2).reshape(
                Bz, nx * 2, ny * 2, *tail)
        return x


class MWT3d(nn.Module):
    ich: int
    och: int
    shape_in: Sequence[int]
    shape_out: Sequence[int]
    k: int = 3
    alpha: int = 2
    c: int = 1
    nCZ: int = 3
    L: int = 0
    base: str = "legendre"
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # [B, T, H, W, C] → grid-major [B, H, W, T, C] (models.py:757-760)
        dt = self.compute_dtype
        x = jnp.transpose(x, (0, 2, 3, 1, 4))
        B, Nx, Ny, T, _ = x.shape
        t_in, t_out = self.shape_in[0], self.shape_out[0]
        c_out = self.shape_out[-1]
        mult = t_out // t_in
        shape_multiplier = self.shape_in[2] // self.shape_in[1]

        x = nn.Dense(self.c * self.k**2, name="Lk", dtype=dt)(x)
        x = x.reshape(B, Nx, Ny, T, self.c, self.k**2)
        for i in range(self.nCZ):
            x = MWTCZ3d(
                self.k, self.alpha, self.L, self.c, shape_multiplier,
                self.base, dtype=dt, name=f"cz_{i}",
            )(x)
            if i < self.nCZ - 1:
                x = nn.relu(x)

        x = x.reshape(B, Nx, Ny, T, -1)
        x = nn.Dense(128, name="Lc0", dtype=dt)(x)
        x = nn.relu(x)
        x = nn.Dense(c_out * mult, name="Lc1", dtype=dt)(x)
        x = x.astype(jnp.float32)

        # (B, Nx, Ny, T, C_out·mult) → (B, T_out, H, W, C_out)
        x = x.reshape(B, Nx, Ny, T, c_out, mult)
        x = jnp.transpose(x, (0, 3, 5, 1, 2, 4))
        return x.reshape(B, t_out, Nx, Ny, c_out)
