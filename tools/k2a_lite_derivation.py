"""Numerically derive + validate the K2A-lite identities (round-5 traffic cut).

K2A (ops/pallas/fno_layer.py::_k2a_kernel) reads TWO full streams (s, ds)
to compute dg = A(ds + ds1 + 2*ds2*s), where A is the adjoint of K2's
linear mode->space map V (per-channel, spatially shared). The s-read is
removable with three static identities, because s = V g + z @ Wp + bp and
A is channel-wise linear:

  A(s) = M g  +  D * (F z) @ Wp  +  bp * A1
       = M g  +  D * y @ Wp      +  bp * A1          (y = F z is a saved
                                                      residual of K1)
with
  M  = A V        [2Y x 2Y]  mode-space Gram operator (static)
  D               [2Y]       diagonal linking the adjoint to K1's forward
                             truncated DFT: A = diag(D) F  (static)
  A1 = A 1        [2Y]       adjoint of the all-ones field (static)

so  dg = A(ds) + ds1 * A1 + 2 ds2 * (M g + D * (y @ Wp) + bp * A1-ish)
and K2A only reads ds (one stream). This script builds V, F, A in numpy
by mirroring the kernel dot/packing code exactly (same _ct_consts
matrices), then:
  1. checks A == V.T            (the kernel adjoint is the true vjp)
  2. solves rowwise A = diag(D) F and checks the residual is ~0
  3. builds M = A V and A1 = A @ ones
  4. end-to-end: random (z, g, Wp, bp, ds, ds1, ds2) with garbage in the
     padded rows -> dg via the K2A formula vs via the lite identities.

Run: python tools/k2a_lite_derivation.py   (pure numpy, no TPU)
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from realpdebench_tpu.ops.pallas.fno_layer import _ct_consts  # noqa: E402


def mirrors(Hp, Wp, m2, m3):
    """Numpy mirrors of the kernel transforms, batched over a trailing
    channel axis c (the operators are channel-wise; c serves as the basis
    batch). Shapes: spatial [Hp8, J8, P=2, c], modes [Y=2*m2*m3, ri=2, c].
    """
    cst = _ct_consts(Hp, Wp, m2, m3)
    J = Wp // 2
    Hp8, J8 = -(-Hp // 8) * 8, -(-J // 8) * 8
    m2x2 = 2 * m2
    Y = m2x2 * m3

    E67X, EhP = cst["E67X"], cst["EhP"]
    IhP, IwE2, IwO2 = cst["IhP"], cst["IwE2"], cst["IwO2"]
    IhPT, IwET, IwOT = cst["IhPT"], cst["IwET"], cst["IwOT"]

    def F(z):  # K1 dots: z [Hp8, J8, 2, c] -> y [Y, 2, c]
        S = np.einsum("hjpc,jq->hpcq", z, E67X)
        Xr = S[:, 0, :, 0:m3] + S[:, 1, :, 2 * m3:3 * m3]   # [Hp8, c, m3]
        Xi = S[:, 0, :, m3:2 * m3] + S[:, 1, :, 3 * m3:]
        A_ = np.einsum("hcm,hq->cmq", Xr, EhP)              # [c, m3, 4m2]
        B_ = np.einsum("hcm,hq->cmq", Xi, EhP)
        yR = A_[..., :m2x2] - B_[..., m2x2:]                # [c, m3, 2m2]
        yI = A_[..., m2x2:] + B_[..., :m2x2]
        y = np.stack([yR.transpose(2, 1, 0), yI.transpose(2, 1, 0)],
                     axis=1)                                # [m2x2, ri, m3, c]
        # rows (j2, m): K1 packs reshape(m2x2, m3, c) row-major
        return y.transpose(0, 2, 1, 3).reshape(Y, 2, -1)

    def V(g):  # K2 dots (selfuse): g [Y, 2, c] -> y2 [Hp8, J8, 2, c]
        gR = g[:, 0].reshape(m2x2, m3, -1).transpose(1, 2, 0)  # [m3, c, 2m2]
        gI = g[:, 1].reshape(m2x2, m3, -1).transpose(1, 2, 0)
        A_ = np.einsum("mcq,qx->mcx", gR, IhP)              # [m3, c, 2Hp8]
        B_ = np.einsum("mcq,qx->mcx", gI, IhP)
        ihR = A_[..., :Hp8] - B_[..., Hp8:]                 # [m3, c, Hp8]
        ihI = B_[..., :Hp8] + A_[..., Hp8:]
        ihC = np.concatenate([ihR, ihI], axis=0)            # [2m3, c, Hp8]
        yE = np.einsum("mch,mj->hjc", ihC, IwE2)            # [Hp8, J8, c]
        yO = np.einsum("mch,mj->hjc", ihC, IwO2)
        return np.stack([yE, yO], axis=2)                   # [Hp8, J8, 2, c]

    def A(d):  # K2A dots (selfuse): d [Hp8, J8, 2, c] -> dg [Y, 2, c]
        QE = np.einsum("hjpc,jq->hpcq", d, IwET)            # [Hp8, 2, c, 2m3]
        QO = np.einsum("hjpc,jq->hpcq", d, IwOT)
        dihR = QE[:, 0, :, :m3] + QO[:, 1, :, :m3]          # [Hp8, c, m3]
        dihI = QE[:, 0, :, m3:] + QO[:, 1, :, m3:]
        A_ = np.einsum("hcm,hq->mcq", dihR, IhPT)           # [m3, c, 4m2]
        B_ = np.einsum("hcm,hq->mcq", dihI, IhPT)
        dgR = (A_[..., :m2x2] + B_[..., m2x2:])             # [m3, c, 2m2]
        dgI = (B_[..., :m2x2] - A_[..., m2x2:])
        dg = np.stack([dgR.transpose(2, 0, 1), dgI.transpose(2, 0, 1)],
                      axis=1)                               # [m2x2, ri, m3, c]
        return dg.transpose(0, 2, 1, 3).reshape(Y, 2, -1)

    return F, V, A, (Hp8, J8, Y)


def main():
    Hp, Wp, m2, m3 = 14, 20, 3, 4
    F, V, A, (Hp8, J8, Y) = mirrors(Hp, Wp, m2, m3)
    R2, Y2 = Hp8 * J8 * 2, Y * 2
    eyeR = np.eye(R2, dtype=np.float64).reshape(Hp8, J8, 2, R2)
    eyeY = np.eye(Y2, dtype=np.float64).reshape(Y, 2, Y2)

    F_mat = F(eyeR).reshape(Y2, R2)                        # [2Y, 2R]
    A_mat = A(eyeR).reshape(Y2, R2)
    V_mat = V(eyeY).reshape(R2, Y2)                        # [2R, 2Y]

    def rel(a, b):
        return np.abs(a - b).max() / (np.abs(b).max() + 1e-30)

    # 1. the kernel adjoint is V's transpose
    e1 = rel(A_mat, V_mat.T)
    print(f"A == V.T                 rel err {e1:.3e}")

    # 2. A = diag(D) F rowwise
    num = np.einsum("yr,yr->y", A_mat, F_mat)
    den = np.einsum("yr,yr->y", F_mat, F_mat)
    D = np.where(den > 1e-30, num / np.maximum(den, 1e-30), 0.0)
    e2 = rel(D[:, None] * F_mat, A_mat)
    print(f"A == diag(D) F           rel err {e2:.3e}")
    print(f"  D range [{D.min():.6f}, {D.max():.6f}], "
          f"n_unique ~ {len(np.unique(np.round(D, 9)))}")

    # 3. statics
    M = A_mat @ V_mat                                      # [2Y, 2Y]
    A1 = A_mat @ np.ones(R2)
    print(f"M nnz frac {np.mean(np.abs(M) > 1e-12):.3f}, "
          f"A1 nnz {np.sum(np.abs(A1) > 1e-12)}/{Y2}")

    # 4. end-to-end: dg via K2A formula vs lite identities, with garbage
    #    in padded rows (the kernels' zero matrix rows must annihilate it)
    rng = np.random.default_rng(0)
    C = 3
    z = rng.normal(size=(Hp8, J8, 2, C))
    g = rng.normal(size=(Y, 2, C))
    Wp_ = rng.normal(size=(C, C))
    bp = rng.normal(size=C)
    ds = rng.normal(size=(Hp8, J8, 2, C))
    ds1 = rng.normal(size=C)
    ds2 = rng.normal(size=C)

    y = F(z)                                               # saved residual
    zp = np.einsum("hjpc,cd->hjpd", z, Wp_)
    s = V(g) + zp + bp[None, None, None, :]
    # garbage in padded rows of s (pointwise branch writes there)
    J = Wp // 2
    pad_rows = np.zeros((Hp8, J8), bool)
    pad_rows[Hp:, :] = True
    pad_rows[:, J:] = True
    s = s + pad_rows[:, :, None, None] * rng.normal(size=s.shape)

    ds_eff = ds + ds1[None, None, None, :] + 2.0 * ds2 * s
    dg_ref = A(ds_eff)

    A1v = A1.reshape(Y, 2)
    Mg = (M @ g.reshape(Y2, C)).reshape(Y, 2, C)
    Dy = D.reshape(Y, 2)[:, :, None] * y
    As_lite = Mg + np.einsum("yrc,cd->yrd", Dy, Wp_) + \
        bp[None, None, :] * A1v[:, :, None]
    dg_lite = A(ds) + ds1[None, None, :] * A1v[:, :, None] + \
        2.0 * ds2[None, None, :] * As_lite
    e4 = rel(dg_lite, dg_ref)
    print(f"dg_lite == dg_K2A        rel err {e4:.3e}")

    # the _ct_consts matrices are float32: ~1e-7 relative is float rounding
    ok = max(e1, e2, e4) < 1e-6
    print("ALL OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
