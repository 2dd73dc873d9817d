"""FNO3d — 3-D Fourier Neural Operator, the flagship baseline.

Functional parity with the reference (`realpdebench/model/fno.py:66-143`):
grid-coordinate channels appended, Dense lift, ``n_layers`` × (truncated
spectral conv + pointwise 1×1 mixing + BatchNorm + GELU[not last]), +6
end-padding on (T, H, W) for non-periodic domains, Dense 128 head, and the
time-interleaved output reshape ``[B,T_in,H,W,C_out·mult] → [B,T_out,H,W,C_out]``.

TPU-first differences from the torch implementation:
  * channels-last layout everywhere (no permutes): the pointwise mixing is a
    Dense on the lane dimension → straight MXU matmuls;
  * the 4 spectral corner blocks run in one batched complex einsum
    (ops/spectral.py);
  * optional bf16 activations with f32 FFT/params (``compute_dtype``);
  * optional model-parallel sharding of the ``width`` axis via logical axis
    annotations (see parallel notes in train/train_step.py).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from realpdebench_tpu.ops.activations import gelu as act_gelu

from realpdebench_tpu.ops.spectral import grid_features, truncated_spectral_conv3d


def _spectral_params(module: nn.Module, in_channels: int, out_channels: int,
                     modes1: int, modes2: int, modes3: int):
    """Declare the 4-corner spectral weights on ``module``.

    torch.rand on cfloat draws U[0,1) for real and imag independently
    (fno.py:31-38); mirror that init (i.i.d. uniform — element order is
    irrelevant to the distribution).

    Storage order [4, m1, m2, m3, Cin, Cout]: channels minor, so the stored
    row-major layout IS the (sublane=Cin, lane=Cout) layout the corner GEMM
    wants — params, grads, and adam slots then share one layout and XLA
    inserts no per-step relayout copies (the channels-major order cost
    ~2.4 GB/step of `copy` in the round-4 HLO)."""
    scale = 1.0 / (in_channels * out_channels)
    shape = (4, modes1, modes2, modes3, in_channels, out_channels)
    w_real = module.param(
        "w_real", lambda k: scale * jnp.asarray(
            nn.initializers.uniform(scale=1.0)(k, shape, jnp.float32)
        )
    )
    w_imag = module.param(
        "w_imag", lambda k: scale * jnp.asarray(
            nn.initializers.uniform(scale=1.0)(k, shape, jnp.float32)
        )
    )
    return w_real, w_imag


class SpectralConv3d(nn.Module):
    in_channels: int
    out_channels: int
    modes1: int
    modes2: int
    modes3: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w_real, w_imag = _spectral_params(
            self, self.in_channels, self.out_channels,
            self.modes1, self.modes2, self.modes3,
        )
        return truncated_spectral_conv3d(
            x, w_real, w_imag, compute_dtype=self.compute_dtype
        )


class _SpectralParams(nn.Module):
    """Param-holder twin of SpectralConv3d for the fused path (identical
    param tree: <name>/w_real, <name>/w_imag)."""

    channels: int
    modes1: int
    modes2: int
    modes3: int

    @nn.compact
    def __call__(self):
        return _spectral_params(self, self.channels, self.channels,
                                self.modes1, self.modes2, self.modes3)


class _DenseParams(nn.Module):
    """Param-holder twin of nn.Dense (kernel/bias, same initializers)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _BNParams(nn.Module):
    """Param/state-holder twin of nn.BatchNorm: params scale/bias, running
    batch_stats mean/var — same tree as the unfused path's `bn` module."""

    features: int
    momentum: float = 0.9

    @nn.compact
    def __call__(self, batch_mean=None, batch_var=None, update: bool = False):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,)))
        if update and not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * jax.lax.stop_gradient(
                batch_mean)
            ra_var.value = m * ra_var.value + (1 - m) * jax.lax.stop_gradient(
                batch_var)
        return scale, bias, ra_mean.value, ra_var.value


class _FNOLayerParams(nn.Module):
    """Param tree for one fused layer, mirroring FNOLayer's names exactly:
    <layer>/spectral/{w_real,w_imag}, <layer>/pointwise/{kernel,bias},
    <layer>/bn/{scale,bias} (+ batch_stats <layer>/bn/{mean,var})."""

    width: int
    modes1: int
    modes2: int
    modes3: int

    @nn.compact
    def __call__(self):
        w_real, w_imag = _SpectralParams(
            self.width, self.modes1, self.modes2, self.modes3,
            name="spectral")()
        kernel, bias = _DenseParams(self.width, self.width,
                                    name="pointwise")()
        bn = _BNParams(self.width, name="bn")

        def bn_apply(batch_mean, batch_var, train):
            return bn(batch_mean=batch_mean, batch_var=batch_var,
                      update=train)

        return w_real, w_imag, kernel, bias, bn_apply


class FNOLayer(nn.Module):
    """One Fourier layer: spectral conv + pointwise mixing + BN (+GELU).

    Rematerialized by default: the rfftn/irfftn intermediates dominate
    activation memory (complex64 full spectra per layer); recomputing them in
    the backward pass keeps peak HBM ~one layer deep instead of n_layers."""

    width: int
    modes1: int
    modes2: int
    modes3: int
    apply_gelu: bool
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.compute_dtype
        x1 = SpectralConv3d(
            self.width, self.width, self.modes1, self.modes2, self.modes3,
            compute_dtype=dt, name="spectral",
        )(x)
        x2 = nn.Dense(self.width, name="pointwise", dtype=dt)(x)
        x = x1.astype(dt) + x2.astype(dt)
        # running stats stay f32; normalization math follows compute_dtype
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=dt, name="bn",
        )(x)
        if self.apply_gelu:
            x = act_gelu(x)
        return x


def _fused_supported(Wp: int) -> bool:
    """The packed-lane pallas path needs an even padded W and a TPU."""
    import jax as _jax

    if Wp % 2 != 0:
        return False
    try:
        return _jax.devices()[0].platform == "tpu"
    except Exception:
        return False


class FNO3d(nn.Module):
    """``use_pallas``: None → auto (fused Cooley–Tukey pallas kernels on TPU
    when shapes allow, reference XLA path otherwise); True/False forces.
    ``pallas_interpret`` runs the kernels in interpreter mode (CPU tests).
    Both paths share one parameter/batch_stats tree (checkpoint-compatible).
    """

    modes1: int
    modes2: int
    modes3: int
    n_layers: int
    width: int
    shape_in: Sequence[int]  # (T_in, H, W, C_in)
    shape_out: Sequence[int]  # (T_out, H, W, C_out)
    padding: int = 6
    compute_dtype: jnp.dtype = jnp.float32
    remat: bool = True
    use_pallas: bool | None = None
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, y=None):
        """``y``: optional target [B, t_out, H, W, c_out]. When given, the
        return value is the scalar MSE train loss instead of the prediction
        — on the fused path this engages the K3 tail+loss kernel
        (ops/pallas/fno_tail.py): the fc1 activation and the 21×-padded
        prediction tensor never exist in HBM. Parameter/batch_stats trees
        are identical in both modes."""
        B = x.shape[0]
        T, H, W = x.shape[1], x.shape[2], x.shape[3]
        t_in, c_out, t_out = self.shape_in[0], self.shape_out[-1], self.shape_out[0]
        mult = t_out // t_in

        gt, gy, gx = grid_features((T, H, W))
        grid = jnp.broadcast_to(
            jnp.concatenate([gt, gy, gx], axis=-1)[None], (B, T, H, W, 3)
        )
        x = jnp.concatenate([x.astype(jnp.float32), grid], axis=-1)

        dt = self.compute_dtype
        p = self.padding
        fused = self.use_pallas
        if fused is None:
            fused = (_fused_supported(W + p) and W % 2 == 0
                     and not self.is_initializing())
        if fused:
            # entirely in the packed-lane flat layout: the 5-D channels-last
            # tensors (64 lanes → 2x tile padding, pad/slice/flatten copies)
            # never materialize between fc0 and fc2
            x = self._fused_forward(x, train, c_out * mult, y=y)
            if x.ndim == 0:
                return x  # K3 engaged: x is already the scalar loss
        else:
            x = nn.Dense(self.width, name="fc0", dtype=dt)(x)
            # end-pad (T, H, W) for non-periodic domains (fno.py:111)
            x = jnp.pad(x, ((0, 0), (0, p), (0, p), (0, p), (0, 0)))
            layer_cls = (
                nn.remat(FNOLayer, static_argnums=(2,)) if self.remat
                else FNOLayer
            )
            for i in range(self.n_layers):
                x = layer_cls(
                    self.width, self.modes1, self.modes2, self.modes3,
                    apply_gelu=i < self.n_layers - 1, compute_dtype=dt,
                    name=f"layer_{i}",
                )(x, train)
            x = x[:, :-p, :-p, :-p, :]
            x = nn.Dense(128, name="fc1", dtype=dt)(x)
            x = act_gelu(x)
            x = nn.Dense(c_out * mult, name="fc2", dtype=dt)(x)
        x = x.astype(jnp.float32)

        # [B,T,H,W,c_out*mult] -> [B,T,H,W,c_out,mult] -> [B,T,mult,H,W,c_out]
        x = x.reshape(B, T, H, W, c_out, mult)
        x = jnp.transpose(x, (0, 1, 5, 2, 3, 4))
        pred = x.reshape(B, t_out, H, W, c_out)
        if y is not None:
            # loss-in-module fallback (unfused path / K3 opted out): same
            # value as ModelBundle's default mse(pred, y)
            return jnp.mean((pred - y.astype(jnp.float32)) ** 2)
        return pred

    def _fused_forward(self, xg, train: bool, out_features: int, y=None):
        """Head (fc0) → spectral stack → tail (fc1/fc2), all in the packed
        (w-parity, channel) flat layout.

        The pointwise Dense layers run as block-diagonal ``[[K,0],[0,K]]``
        einsums on the packed lanes, so the channels-last 5-D tensors with
        64-lane tile padding never exist; T/H/W end-padding happens on the
        flat tensor with 128 lanes minor (tile-aligned pad, no relayout).
        The stored inter-layer tensor is the pre-BN ``s``; each layer's
        kernels fold the previous layer's BN affine + GELU at their inputs
        (ops/pallas/fno_layer.py). Param/batch_stats tree matches the
        unfused path exactly (fc0/fc1/fc2 + layer_i/{spectral,pointwise,bn})."""
        from realpdebench_tpu.ops.pallas.fno_layer import fused_fno_layer
        from realpdebench_tpu.ops.activations import _use_approximate

        B, T, H, W, cin = xg.shape
        p, C = self.padding, self.width
        # The packed-lane layout pairs adjacent w columns; a forced
        # use_pallas=True with odd W or odd W+padding would silently skew
        # packing vs the BN site count — fail loudly instead (the
        # use_pallas=None auto path already routes such shapes unfused).
        if W % 2 or (W + p) % 2:
            raise ValueError(
                f"fused FNO path needs even W and even W+padding, got "
                f"W={W}, padding={p}; use use_pallas=False/None")
        Tp, Hp, Wp = T + p, H + p, W + p
        J0, Jp, C2 = W // 2, Wp // 2, 2 * C
        dt = self.compute_dtype

        def bdiag(k):
            ci, co = k.shape
            z = jnp.zeros((ci, co), k.dtype)
            return jnp.concatenate(
                [jnp.concatenate([k, z], axis=1),
                 jnp.concatenate([z, k], axis=1)], axis=0)

        def tile2(v):
            return jnp.concatenate([v, v], axis=0)

        # --- end-pad (T, H, W) in flat space: lanes stay minor. By default
        # (Strategy B) the (H, J) rows are additionally padded up to
        # multiples of 8 so every in-kernel reshape/reduce in the fused
        # layers is Mosaic tile-aligned (see the relayout-probe notes in
        # ops/pallas/fno_layer.py) at +10% activation HBM; measured on v5e
        # it takes the reference-scale train step 415 -> 278 ms (+49%
        # steps/s). REALPDEBENCH_FNO_ALIGNED=0 opts out.
        from realpdebench_tpu.utils.misc import env_flag
        aligned = env_flag("REALPDEBENCH_FNO_ALIGNED", default=True)
        pad_early = env_flag("REALPDEBENCH_FNO_PAD_EARLY", default=True)
        Hr = -(-Hp // 8) * 8 if aligned else Hp
        Jr = -(-Jp // 8) * 8 if aligned else Jp
        # --- head: fc0 on packed lanes. Default: pad the THIN (2*cin-lane)
        # tensor first and run fc0 on the padded grid — the round-4 trace
        # showed pad-after-fc0 streaming the fat 128-lane tensor (444 MB
        # accessed per microbatch). fc0's bias lands in the padded region
        # instead of zeros; layer 1's kernels zero those rows on read/write
        # (in_valid below), reproducing pad-after-fc0 exactly.
        # REALPDEBENCH_FNO_PAD_EARLY=0 opts out (A/B).
        k0, b0 = _DenseParams(C, cin, name="fc0")()
        if pad_early:
            x4i = xg.reshape(B, T, H, J0, 2 * cin)
            x4i = jnp.pad(
                x4i, ((0, 0), (0, p), (0, Hr - H), (0, Jr - J0), (0, 0)))
            xh = x4i.reshape(B * Tp, Hr * Jr, 2 * cin)
            xf = (jnp.einsum("rjc,cd->rjd", xh.astype(dt),
                             bdiag(k0).astype(dt)) + tile2(b0).astype(dt))
            in_valid0 = (T, H, J0)
        else:
            xh = xg.reshape(B * T, H * J0, 2 * cin)
            xf = (jnp.einsum("rjc,cd->rjd", xh.astype(dt),
                             bdiag(k0).astype(dt)) + tile2(b0).astype(dt))
            x4 = xf.reshape(B, T, H, J0, C2)
            x4 = jnp.pad(
                x4, ((0, 0), (0, p), (0, Hr - H), (0, Jr - J0), (0, 0)))
            xf = x4.reshape(B * Tp, Hr * Jr, C2)
            in_valid0 = None

        # --- spectral stack
        n_pos = B * Tp * Hp * Wp
        dims = (B, Tp, Hp, Wp, C)
        # GELU variant matches ops/activations.gelu's platform selection so
        # fused and unfused paths compute the same function
        act_variant = "tanh" if _use_approximate() else "exact"
        a = jnp.ones((1, C), jnp.float32)
        b = jnp.zeros((1, C), jnp.float32)
        act = "none"
        for i in range(self.n_layers):
            holder = _FNOLayerParams(
                C, self.modes1, self.modes2, self.modes3, name=f"layer_{i}")
            w_real, w_imag, wp_k, bp_k, bn_apply = holder()
            s, stats128 = fused_fno_layer(
                xf, a, b, w_real, w_imag, wp_k, bp_k[None],
                dims=dims, act=act, interpret=self.pallas_interpret,
                aligned=aligned, in_valid=in_valid0 if i == 0 else None,
            )
            ch = stats128[:, :C] + stats128[:, C:]
            batch_mean = ch[0] / n_pos
            batch_var = ch[1] / n_pos - batch_mean**2
            scale, bias, ra_mean, ra_var = bn_apply(batch_mean, batch_var,
                                                    train)
            mean, var = ((batch_mean, batch_var) if train
                         else (ra_mean, ra_var))
            a = (scale / jnp.sqrt(var + 1e-5))[None]
            b = (bias - mean * a[0])[None]
            xf = s
            act = act_variant
        # --- tail: un-pad + fc1 + gelu + fc2 on packed lanes.
        # The final BN affine (no GELU after the last layer, fno.py:121-129)
        # is FOLDED into fc1's weights: (z*a + b) @ K = z @ (a⊙K) + b@K, so
        # the 276 MB activation never takes a separate affine pass (the
        # round-4 trace showed that pass materializing in f32 — ~5 ms/step
        # of pure glue). The fold happens on the [C, 128] weight in f32.
        k1_, b1_ = _DenseParams(128, C, name="fc1")()
        k1f = k1_ * a[0][:, None]
        b1f = b1_ + b[0] @ k1_
        k2_, b2_ = _DenseParams(out_features, 128, name="fc2")()
        if (y is not None and aligned
                and env_flag("REALPDEBENCH_FNO_FUSED_LOSS", default=True)):
            # K3 fused tail+loss: crop+fc1+gelu+fc2+SSE in one kernel pair —
            # the fc1 activation (~1.3 GB bf16/step at headline scale) and
            # the 21×-lane-padded prediction never exist in HBM
            from realpdebench_tpu.ops.pallas.fno_tail import (
                fused_tail_loss, pack_target_lane_major)

            F = out_features
            mult_ = F // self.shape_out[-1]
            y_lm = pack_target_lane_major(
                y, B=B, T=T, H=H, W=W, c_out=self.shape_out[-1],
                mult=mult_, Tp=Tp, Hr=Hr, Jr=Jr)
            F2p = y_lm.shape[1]
            k2p = jnp.pad(bdiag(k2_), ((0, 0), (0, F2p - 2 * F)))
            b2p = jnp.pad(tile2(b2_)[None], ((0, 0), (0, F2p - 2 * F)))
            sse = fused_tail_loss(
                xf, y_lm, bdiag(k1f), tile2(b1f)[None], k2p, b2p,
                dims=(B, Tp, Hr, Jr, C), tail_dims=(T, H, J0),
                act=act_variant, interpret=self.pallas_interpret)
            return sse / (B * T * H * W * F)
        z4 = xf.reshape(B, Tp, Hr, Jr, C2)[:, :T, :H, :J0]
        zt = z4.reshape(B * T, H * J0, C2).astype(dt)
        h1 = act_gelu(jnp.einsum("rjc,cd->rjd", zt, bdiag(k1f).astype(dt))
                      + tile2(b1f).astype(dt))
        o2 = (jnp.einsum("rjc,cd->rjd", h1, bdiag(k2_).astype(dt))
              + tile2(b2_).astype(dt))
        # unpack (w-parity, c) lanes → [B, T, H, W, out_features]
        o6 = o2.reshape(B, T, H, J0, 2, out_features)
        return o6.reshape(B, T, H, W, out_features)
