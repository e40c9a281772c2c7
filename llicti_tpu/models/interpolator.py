"""Interpolator network: conditional-GMM parameter CNN for one (scale, band).

TPU-native re-design of the reference's ``LLICTIEntropyModel4``
(graphs/models/LLICTI_nets.py:585-952):

* NHWC layout, Flax modules, XLA grouped convs (feature_group_count).
* Layer 0 is band-geometry specific: small Ev/Od kernels with asymmetric
  replicate padding aligning receptive fields with polyphase sample
  positions (reference :650-682).
* Layers 1..L-1 are grouped 1x1 convs (batched matmuls on the MXU).
* Output: GMM parameters; channel layouts per clr_joint_mode documented in
  :meth:`self_informations` (reference :827-935).

Weight init matches torch Conv2d defaults (kaiming-uniform a=sqrt(5), i.e.
U(+-1/sqrt(fan_in)) for both kernel and bias) so training dynamics are
comparable.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..config import ModelConfig
from ..ops.gdn import GDN1
from ..ops.gmm import gmm_self_information

_torch_kernel_init = jax.nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def _torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(rng, shape, dtype=jnp.float32):
        return jax.random.uniform(rng, shape, dtype, -bound, bound)

    return init


def _pad_edge(x, pad_lrtb):
    l, r, t, b = pad_lrtb
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge")


def _box_mean(x_padded, kh: int, kw: int) -> jnp.ndarray:
    """Frozen box-filter local mean (reference's _get_mean_filters,
    LLICTI_nets.py:714-719) as a VALID reduce_window — no parameters."""
    s = lax.reduce_window(x_padded, 0.0, lax.add, (1, kh, kw, 1),
                          (1, 1, 1, 1), "VALID")
    return s / (kh * kw)


class _Conv(nn.Module):
    """VALID conv with torch-default init; kernel (kh, kw), NHWC."""

    features: int
    kernel: Tuple[int, int]
    groups: int = 1
    in_features: int = 0  # for bias fan_in

    @nn.compact
    def __call__(self, x):
        fan_in = (self.in_features // self.groups) * self.kernel[0] * self.kernel[1]
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel,
            padding="VALID",
            feature_group_count=self.groups,
            kernel_init=_torch_kernel_init,
            bias_init=_torch_bias_init(fan_in),
        )(x)


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C) equivalent)."""

    channels: int
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", lambda rng: jnp.full((self.channels,), self.init))
        return jnp.where(x >= 0, x, a * x)


class _Activation(nn.Module):
    kind: str
    channels: int

    @nn.compact
    def __call__(self, x):
        if self.kind == "ReLU":
            return nn.relu(x)
        if self.kind == "LeakyReLU":
            return nn.leaky_relu(x)  # default negative_slope 0.01, as torch
        if self.kind == "PReLU":
            return PReLU(channels=self.channels)(x)
        if self.kind == "GDN1":
            return GDN1(channels=self.channels)(x)
        return x


def interpolator_dims(cfg: ModelConfig, scale: int):
    """Compute (grps, Ch, Co, c, grp0) exactly as the reference
    (LLICTI_nets.py:622-649)."""
    M = cfg.num_mixtures
    ch = cfg.chs[scale]
    if cfg.clrchs == 3:
        if cfg.clr_joint_mode == 2:
            grps = 1 if cfg.mwsa_joint else 4
            Ch = grps * ch
            Co = 3 * M * 3 + 3 * M  # sigma/mu/w for 3 colors + (a,b,d)*M
        elif cfg.clr_joint_mode == 1:
            grps = 8
            Ch = grps * ch
            Co = M * 16
        elif cfg.clr_joint_mode == 0:
            grps = 3 if cfg.mwsa_joint else 9
            Ch = grps * ch
            Co = M * grps
        else:
            raise ValueError(cfg.clr_joint_mode)
    else:
        chs = [48, 32, 24, 24]
        if cfg.clrchs in (1, 2):
            chs = [int(i * 0.75) for i in chs]
        Ch = 3 * chs[scale]
        grps = 3
        Co = M * 3
    c = cfg.cond_channels
    grp0 = 1 if (cfg.clrchs < 3 or cfg.clr_joint_mode == 2) else (
        3 if cfg.clr_joint_mode == 0 else 2
    )
    return grps, Ch, Co, c, grp0


class Interpolator(nn.Module):
    """One conditional-GMM parameter network for a (scale, band).

    band in {0, 1, 2} or -1 (combine_layers1toL: one net serves all bands,
    dispatched on the conditioning channel count — reference :308-314).
    """

    cfg: ModelConfig
    scale: int
    band: int
    # Codec-path execution mode: run grouped convs as DENSE convs with
    # block-diagonal kernels (the Codec expands the trained grouped
    # kernels; zero-blocks contribute exact 0.0 terms).  Same math, but
    # the MXU gets full 128-lane contractions instead of 88-channel
    # groups (measured faster in the fused codec program).  Training
    # keeps feature_group_count (identical numerics to the reference).
    dense_groups: bool = False

    def setup(self):
        cfg = self.cfg
        grps, Ch, Co, c, grp0 = interpolator_dims(cfg, self.scale)
        self.grps, self.Ch, self.Co, self.c, self.grp0 = grps, Ch, Co, c, grp0
        if self.dense_groups:
            grps = grp0 = 1
        Ev = cfg.evens[self.scale]
        Od = cfg.odds[self.scale]
        band = self.band
        # layer-0 pad tuples are (left, right, top, bottom), reference :650-682
        if band in (0, -1):
            self.conv_00_11 = _Conv(Ch, (Ev, Ev), grp0, c)
            self.pad_00_11 = (Ev // 2 - 1, Ev // 2, Ev // 2 - 1, Ev // 2)
        if band in (1, -1):
            self.conv_00_01 = _Conv(Ch, (Od, Ev), grp0, c)
            self.pad_00_01 = (Ev // 2 - 1, Ev // 2, Od // 2, Od // 2)
            self.conv_11_01 = _Conv(Ch, (Ev, Od), grp0, c)
            self.pad_11_01 = (Od // 2, Od // 2, Ev // 2, Ev // 2 - 1)
        if band in (2, -1):
            self.conv_00_10 = _Conv(Ch, (Ev, Od), grp0, c)
            self.pad_00_10 = (Od // 2, Od // 2, Ev // 2 - 1, Ev // 2)
            self.conv_11_10 = _Conv(Ch, (Od, Ev), grp0, c)
            self.pad_11_10 = (Ev // 2, Ev // 2 - 1, Od // 2, Od // 2)
            self.conv_01_10 = _Conv(Ch, (Ev, Ev), grp0, c)
            self.pad_01_10 = (Ev // 2, Ev // 2 - 1, Ev // 2 - 1, Ev // 2)
        if cfg.clrchs == 3 and cfg.clr_joint_mode == 0 and cfg.clrjnt0seqmd:
            # sequential-color conditioning on the *current* pixel's earlier
            # colors (reference :655-657, 666-668, 680-682)
            self.seq_toCo = _Conv(Ch // 3, (1, 1), 1, 1)
            self.seq_toCg = _Conv(Ch // 3, (1, 1), 1, 1)
        self.act0 = _Activation(cfg.activfun, Ch)
        # trunk: (Ly-1)-1 grouped 1x1 conv+act blocks, then 1x1 to Co
        trunk = []
        for i in range(cfg.conv_layers - 2):
            trunk.append(_Conv(Ch, (1, 1), grps, Ch))
            trunk.append(_Activation(cfg.activfun, Ch))
        trunk.append(_Conv(Co, (1, 1), grps, Ch))
        self.trunk = trunk

    # --- layer 0 -----------------------------------------------------------
    def _quant(self, x):
        r = self.cfg.rndfactor
        return jnp.round(x * r) / r

    def _layer0_submean(self, y_cond):
        """DC-removal variant: subtract the quantized box-filter local mean
        of each conditioning band before its layer-0 conv, and return the
        (quantized) averaged mean to re-bias the predicted variable.

        The reference's subtract_mean branch (LLICTI_nets.py:755-800) is
        vestigial/dead there (it calls a method that no longer exists);
        this is a working re-design of the same idea.
        """
        c = self.c
        n_units = y_cond.shape[-1] // c
        band = self.band if self.band != -1 else (n_units - 1)
        if band == 0:
            specs = [((0, c), self.conv_00_11, self.pad_00_11)]
        elif band == 1:
            specs = [((0, c), self.conv_00_01, self.pad_00_01),
                     ((c, 2 * c), self.conv_11_01, self.pad_11_01)]
        else:
            specs = [((0, c), self.conv_00_10, self.pad_00_10),
                     ((c, 2 * c), self.conv_11_10, self.pad_11_10),
                     ((2 * c, 3 * c), self.conv_01_10, self.pad_01_10)]
        out = None
        mean_sum = None
        for (lo, hi), conv, pad in specs:
            xb = y_cond[..., lo:hi]
            kh, kw = conv.kernel
            mn = _box_mean(_pad_edge(xb, pad), kh, kw)
            mnq = self._quant(mn)
            o = conv(_pad_edge(xb - mnq, pad))
            out = o if out is None else out + o
            mean_sum = mn if mean_sum is None else mean_sum + mn
        mean = self._quant(mean_sum / len(specs))
        return out, mean

    def _layer0_convs(self, y_cond):
        """Band-geometry conv sum (pre-activation, pre-seq)."""
        c = self.c
        n_units = y_cond.shape[-1] // c
        band = self.band if self.band != -1 else (n_units - 1)
        if band == 0:
            out = self.conv_00_11(_pad_edge(y_cond[..., 0:c], self.pad_00_11))
        elif band == 1:
            out = self.conv_00_01(_pad_edge(y_cond[..., 0:c], self.pad_00_01))
            out = out + self.conv_11_01(_pad_edge(y_cond[..., c:2 * c], self.pad_11_01))
        elif band == 2:
            out = self.conv_00_10(_pad_edge(y_cond[..., 0:c], self.pad_00_10))
            out = out + self.conv_11_10(_pad_edge(y_cond[..., c:2 * c], self.pad_11_10))
            out = out + self.conv_01_10(_pad_edge(y_cond[..., 2 * c:3 * c], self.pad_01_10))
        else:
            raise ValueError(f"bad band {band}")
        return out

    def _layer0(self, y_cond, y_topred=None):
        out = self._layer0_convs(y_cond)
        if (
            self.cfg.clrchs == 3
            and self.cfg.clr_joint_mode == 0
            and self.cfg.clrjnt0seqmd
            and y_topred is not None
        ):
            out = self._apply_seq(out, y_topred, upto_clr=2)
        return self.act0(out)

    def _apply_seq(self, base, y_seq, upto_clr: int):
        """Sequential-color layer-0 additions (reference :655-657,
        666-668, 680-682): the *current* pixel's earlier colors feed the
        later colors' channel groups.  Group-local, so color i's trunk
        output depends only on colors < i (causal for the codec)."""
        K = base.shape[-1] // 9
        if upto_clr >= 1:
            base = base.at[..., 3 * K:6 * K].add(self.seq_toCo(y_seq[..., 0:1]))
        if upto_clr >= 2:
            base = base.at[..., 6 * K:9 * K].add(self.seq_toCg(y_seq[..., 0:2]))
        return base

    def _trunk(self, h):
        for layer in self.trunk:
            h = layer(h)
        return h

    # --- public API --------------------------------------------------------
    def get_params(self, y_cond, y_topred=None):
        """NN forward: conditioning bands -> GMM parameter map [B,H,W,Co].

        Codec path; assumes subtract_mean is off (as the reference's
        get_params does, LLICTI_nets.py:820-825)."""
        assert not self.cfg.subtract_mean
        return self._trunk(self._layer0(y_cond, y_topred))

    def band_base(self, y_cond):
        """Codec path for clrjnt0seqmd: pre-activation layer-0 sum."""
        return self._layer0_convs(y_cond)

    def params_from_base(self, base, y_seq, clr: int):
        """Codec path for clrjnt0seqmd: apply the seq additions causal up
        to color ``clr``, then activation + trunk.  Requires an
        elementwise activation (GDN1 couples channel groups and would
        break the per-color causality)."""
        assert self.cfg.activfun != "GDN1"
        return self._trunk(self.act0(self._apply_seq(base, y_seq, clr)))

    def __call__(self, y_cond, y_topred):
        """Training forward: self-information map [B,H,W,c]."""
        if self.cfg.subtract_mean:
            out, mean = self._layer0_submean(y_cond)
            params = self._trunk(self.act0(out))
            return self.self_informations(params, y_topred - mean)
        seq = (
            self.cfg.clrchs == 3
            and self.cfg.clr_joint_mode == 0
            and self.cfg.clrjnt0seqmd
        )
        params = self.get_params(y_cond, y_topred if seq else None)
        return self.self_informations(params, y_topred)

    def self_informations(self, params, y):
        """GMM likelihood -> -log2 p per pixel/color.

        Channel layouts per clr_joint_mode (reference :827-935):
          mode 2: [3M sigma | 3M mu | 3M w | M a | M b | M d]; cross-color
                  mean updates mu_Co += a*Y, mu_Cg += b*Y + d*Co.
          mode 0: per color i: [M sigma | M mu | M w] at offset 3iM.
          mode 1: Y uses 2M mixtures, CoCg M each; Cg mean updated from Co.
        """
        cfg = self.cfg
        M = cfg.num_mixtures
        logistic = cfg.distribution == "logistic"
        if cfg.clrchs == 3 and cfg.clr_joint_mode == 2:
            stdev = params[..., 0:3 * M]
            mean = params[..., 3 * M:6 * M]
            w = params[..., 6 * M:9 * M]
            a = params[..., 9 * M:10 * M]
            b = params[..., 10 * M:11 * M]
            d = params[..., 11 * M:12 * M]
            mean = mean.at[..., M:2 * M].add(a * y[..., 0:1])
            mean = mean.at[..., 2 * M:3 * M].add(b * y[..., 0:1] + d * y[..., 1:2])
            return gmm_self_information(y[..., 0:3], stdev, mean, w, M,
                                        logistic=logistic)
        if cfg.clrchs == 3 and cfg.clr_joint_mode == 0:
            stdev = jnp.concatenate(
                [params[..., 0:M], params[..., 3 * M:4 * M], params[..., 6 * M:7 * M]], -1)
            mean = jnp.concatenate(
                [params[..., M:2 * M], params[..., 4 * M:5 * M], params[..., 7 * M:8 * M]], -1)
            w = jnp.concatenate(
                [params[..., 2 * M:3 * M], params[..., 5 * M:6 * M], params[..., 8 * M:9 * M]], -1)
            return gmm_self_information(y[..., 0:3], stdev, mean, w, M,
                                        logistic=logistic)
        if cfg.clrchs == 3 and cfg.clr_joint_mode == 1:
            # channel order of y is (0, Y, Co, Cg); reference :892-915
            stdev_Y = params[..., 2 * M:4 * M]
            mean_Y = params[..., 4 * M:6 * M]
            w_Y = params[..., 6 * M:8 * M]
            stdev_C = params[..., 8 * M:10 * M]
            mean_C = params[..., 10 * M:12 * M]
            w_C = params[..., 12 * M:14 * M]
            a = params[..., 14 * M:15 * M]
            mean_C = mean_C.at[..., M:2 * M].add(a * y[..., 2:3])
            si_Y = gmm_self_information(y[..., 1:2], stdev_Y, mean_Y, w_Y, 2 * M,
                                        logistic=logistic)
            si_C = gmm_self_information(y[..., 2:4], stdev_C, mean_C, w_C, M,
                                        logistic=logistic)
            return jnp.concatenate([si_Y, si_C], axis=-1)
        # single channel (clrchs < 3)
        stdev = params[..., 0:M]
        mean = params[..., M:2 * M]
        w = params[..., 2 * M:3 * M]
        return gmm_self_information(y[..., 0:1], stdev, mean, w, M,
                                    logistic=logistic)
