"""TPU-native port of the vendored EquiFold l<=1 fast-path library.

Reference surface: `/root/reference/src/jamun/e3tools/contrib/equifold/`
(`_equiformer.py:13-274`, `_conv.py:11-98`, `_linear.py:7-44`,
`_layer_norm.py:7-37`, `_radial.py:36-145`). That code is a scalar+vector
(l∈{0,1}) structure-of-arrays formulation of Equiformer-style attention and a
two-stage gated tensor-product convolution, written as per-edge torch einsums
with `torch_scatter` reductions and `scatter_softmax`.

This port keeps the math (same TP decompositions ss/sv/vs/vv, same gating,
same head grouping, same xavier init) but is **dense and masked** like the
rest of this framework: nodes live in padded `[G, N, ...]` arrays and pair
quantities in dst-major `[G, N_dst, N_src, ...]` arrays with a boolean
`pair_mask` in place of an edge list. `scatter_softmax` over edges-by-dst
becomes a masked softmax over the src axis; `scatter`-sum becomes a masked
sum. Everything is jit/vmap/scan-safe with static shapes, and the big pair
einsums map onto the MXU.

Representation: scalars `s: [..., S]`, vectors `v: [..., V, 3]` (channel
axis before the component axis, matching the reference layout `[N, nc, 3]`).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from jamun_tpu.ops.precision import matmul_precision

__all__ = [
    "SVLinear",
    "SVLayerNorm",
    "BesselBasis",
    "SinusoidalBasis",
    "RadialNN",
    "DTPByHead",
    "Equiformer",
    "Convnet",
]

_NEG_INF = -1e9


def _xavier_uniform(gain: float = 1.0):
    """torch.nn.init.xavier_uniform_ on a [out, in] (or [..., out, in]) weight."""

    def init(key, shape, dtype=jnp.float32):
        fan_out, fan_in = shape[-2], shape[-1]
        bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class SVLinear(nn.Module):
    """Channel-mixing linear on (s, v) pairs.

    Mirrors `contrib/equifold/_linear.py:7-44`: independent `[out, in]`
    weights for the scalar and vector channels (vectors get no bias --
    equivariance), xavier-uniform init.
    """

    nc_s_in: int
    nc_s_out: int
    nc_v_in: int
    nc_v_out: int
    add_bias: bool = False

    @nn.compact
    def __call__(self, s, v):
        assert self.nc_s_out > 0 or self.nc_v_out > 0
        prec = None
        if self.nc_s_out > 0:
            w_s = self.param("w_s", _xavier_uniform(), (self.nc_s_out, self.nc_s_in))
            prec = matmul_precision(s.dtype)
            s_out = jnp.einsum("ij,...j->...i", w_s.astype(s.dtype), s, precision=prec)
            if self.add_bias:
                b_s = self.param("b_s", nn.initializers.zeros, (self.nc_s_out,))
                s_out = s_out + b_s.astype(s_out.dtype)
        else:
            s_out = None
        if self.nc_v_out > 0:
            w_v = self.param("w_v", _xavier_uniform(), (self.nc_v_out, self.nc_v_in))
            prec = matmul_precision(v.dtype)
            v_out = jnp.einsum("ij,...jk->...ik", w_v.astype(v.dtype), v, precision=prec)
        else:
            v_out = None
        return s_out, v_out


class SVLayerNorm(nn.Module):
    """Equiformer layer norm on (s, v): mean-subtract + RMS on scalars,
    channel-RMS on vectors (`contrib/equifold/_layer_norm.py:7-37`).

    Works on any leading batch shape; normalization is over the channel
    (and vector-component) axes only.
    """

    nc_s: int
    nc_v: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, s, v):
        gamma_s = self.param("gamma_s", nn.initializers.ones, (self.nc_s,))
        beta_s = self.param("beta_s", nn.initializers.zeros, (self.nc_s,))
        gamma_v = self.param("gamma_v", nn.initializers.ones, (self.nc_v,))

        mu = jnp.mean(s, axis=-1, keepdims=True)
        x = s - mu
        rms = jnp.sqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + self.eps)
        s = gamma_s.astype(s.dtype) * x / rms + beta_s.astype(s.dtype)

        # vector: rms over (channel, component), normalized by channel count
        sq = jnp.sum(jnp.square(v), axis=(-1, -2), keepdims=True) / self.nc_v
        v = gamma_v.astype(v.dtype)[..., :, None] * v / jnp.sqrt(sq + self.eps)
        return s, v


class BesselBasis(nn.Module):
    """Bessel radial basis with trainable frequencies
    (`contrib/equifold/_radial.py:36-56`; frequencies are a Parameter there too)."""

    rc: float
    radial_num_basis: int = 16

    @nn.compact
    def __call__(self, r):
        freqs = self.param(
            "bessel_weights",
            lambda key, shape, dtype=jnp.float32: jnp.linspace(
                1.0, float(self.radial_num_basis), self.radial_num_basis, dtype=dtype
            )
            * math.pi,
            (self.radial_num_basis,),
        )
        arg = freqs.astype(r.dtype) * r[..., None] / self.rc
        return (2.0 / self.rc) * jnp.sin(arg)


class SinusoidalBasis(nn.Module):
    """sin/cos positional basis on [0, xmax] (`_radial.py:58-80`; non-trainable)."""

    xmax: float
    d: int = 32

    def __call__(self, x):
        assert self.d % 2 == 0
        freqs = jnp.linspace(1.0, self.d // 2, self.d // 2, dtype=x.dtype) * math.pi
        arg = freqs * x[..., None] / self.xmax
        return (2.0 / self.xmax) * jnp.concatenate([jnp.sin(arg), jnp.cos(arg)], axis=-1)


class RadialNN(nn.Module):
    """Radial weight network: basis(r) (++ edge/time features) -> silu MLP
    (`contrib/equifold/_radial.py:83-145`)."""

    num_out_features: int
    rc: float
    radial_num_basis: int = 16
    radial_num_hidden: int = 16
    radial_num_layers: int = 2
    basis_type: str = "bessel"

    @nn.compact
    def __call__(self, r, edges=None, ts=None):
        if self.basis_type == "bessel":
            feats = BesselBasis(self.rc, self.radial_num_basis)(r)
        elif self.basis_type == "sinusoidal":
            feats = SinusoidalBasis(self.rc, self.radial_num_basis)(r)
        else:
            raise ValueError(f"unknown basis_type {self.basis_type!r}")
        parts = [feats]
        if edges is not None:
            parts.append(edges.astype(feats.dtype))
        if ts is not None:
            parts.append(ts.astype(feats.dtype))
        x = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else feats
        widths = [self.radial_num_hidden] * self.radial_num_layers + [self.num_out_features]
        for i, w in enumerate(widths):
            x = nn.Dense(
                w,
                kernel_init=_xavier_uniform(),
                bias_init=nn.initializers.zeros,
                dtype=x.dtype,
            )(x)
            if i < len(widths) - 1:
                x = jax.nn.silu(x)
        return x


class DTPByHead(nn.Module):
    """Per-head depthwise TP with the edge direction + per-head linear
    (`contrib/equifold/_equiformer.py:13-63`).

    Inputs are head-grouped pair tensors `s: [..., H, M]`, `v: [..., H, M, 3]`
    plus the unit edge vector `rvec: [..., 3]` and externally supplied radial
    weights `[..., 4*M*H]` (the four w_ss/w_sv/w_vs/w_vv gains).
    """

    nc_in: int  # M: channels per head after initial mixing (scalar == vector)
    nc_s_out: int
    nc_v_out: int
    num_heads: int

    @property
    def weight_numel(self) -> int:
        return 4 * self.nc_in * self.num_heads

    @nn.compact
    def __call__(self, s, v, rvec, weights):
        H, M = self.num_heads, self.nc_in
        prec = matmul_precision(s.dtype)
        w = weights.reshape(weights.shape[:-1] + (4, H, M))
        w = jnp.moveaxis(w, -3, 0)  # [4, ..., H, M]
        w_ss, w_sv, w_vs, w_vv = w[0], w[1], w[2], w[3]

        ss = w_ss * s
        sv = w_sv[..., None] * s[..., None] * rvec[..., None, None, :]
        vs = w_vs[..., None] * v
        vv = w_vv * jnp.sum(v * rvec[..., None, None, :], axis=-1)

        s_cat = jnp.concatenate([ss, vv], axis=-1)  # [..., H, 2M]
        v_cat = jnp.concatenate([sv, vs], axis=-2)  # [..., H, 2M, 3]

        w_s = self.param("w_s", _xavier_uniform(), (H, self.nc_s_out, 2 * M))
        b_s = self.param("b_s", nn.initializers.zeros, (H, self.nc_s_out))
        w_v = self.param("w_v", _xavier_uniform(), (H, self.nc_v_out, 2 * M))

        s_out = (
            jnp.einsum("hmn,...hn->...hm", w_s.astype(s_cat.dtype), s_cat, precision=prec)
            + b_s.astype(s_cat.dtype)
        )
        v_out = jnp.einsum("hmn,...hnk->...hmk", w_v.astype(v_cat.dtype), v_cat, precision=prec)
        return s_out, v_out


def _masked_softmax_over_src(z, pair_mask):
    """softmax over the src axis (axis -1) restricted to valid pairs.

    Dense equivalent of `scatter_softmax(z, dst)` over an edge list
    (`_equiformer.py:225`): each dst row normalizes over its own incoming
    edges. Rows with no valid src return all-zero weights.
    """
    z = jnp.where(pair_mask, z, _NEG_INF)
    z = z - jax.lax.stop_gradient(jnp.max(z, axis=-1, keepdims=True))
    ez = jnp.exp(z) * pair_mask.astype(z.dtype)
    denom = jnp.sum(ez, axis=-1, keepdims=True)
    return ez / jnp.maximum(denom, 1e-20)


class Equiformer(nn.Module):
    """Fig.1b Equiformer block on dense masked pairs
    (`contrib/equifold/_equiformer.py:66-274`).

    Call signature (dst-major pair layout, i = dst on axis 1, j = src on
    axis 2, matching `jamun_tpu/ops/conv.py`):

        s:  [G, N, S]      v: [G, N, V, 3]         (S == V required, as in ref)
        pair_mask:   [G, N, N] bool                (replaces the edge list)
        r:           [G, N, N] edge lengths
        rvec:        [G, N, N, 3] unit edge vectors (j -> i convention of caller)
        weight_cutoff: [G, N, N] smooth cutoff envelope for the attention logits
        edges:       [G, N, N, E] optional precomputed edge features
    """

    nc_s: int
    nc_v: int
    radial_nn: Callable[..., nn.Module]  # factory: radial_nn(num_out_features=...)
    num_heads: int = 1
    apply_layer_norm: bool = True
    apply_resnet: bool = True
    ff_mul: int = 3
    nc_s_out: Optional[int] = None
    nc_v_out: Optional[int] = None

    @nn.compact
    def __call__(self, s, v, pair_mask, r, rvec, weight_cutoff=None, edges=None, ts=None):
        assert self.nc_s == self.nc_v, "reference assumes nc_s == nc_v"
        S = self.nc_s
        H = self.num_heads
        M = S // H  # channels per head
        nc_middle = 2 * M
        nc_s_out = self.nc_s_out if self.nc_s_out is not None else S
        nc_v_out = self.nc_v_out if self.nc_v_out is not None else S
        prec = matmul_precision(s.dtype)
        # masked pairs may carry non-finite geometry (e.g. rvec = d/||d|| on
        # the self-pair diagonal with no epsilon); zero it here so the
        # multiply-by-mask reductions below cannot be poisoned (NaN * 0 = NaN)
        r = jnp.where(pair_mask, r, 0.0)
        rvec = jnp.where(pair_mask[..., None], rvec, 0.0)

        s0, v0 = s, v
        if self.apply_layer_norm:
            s, v = SVLayerNorm(S, S, name="layer_norm_attn")(s, v)

        # ---- initial mixing: separate dst/src linears, all-vs-all TP per head
        s_i, v_i = SVLinear(S, S, S, S, add_bias=True, name="linear_dst")(s, v)
        s_j, v_j = SVLinear(S, S, S, S, add_bias=True, name="linear_src")(s, v)
        G, N = s.shape[0], s.shape[1]
        s_i = s_i.reshape(G, N, H, M)
        v_i = v_i.reshape(G, N, H, M, 3)
        s_j = s_j.reshape(G, N, H, M)
        v_j = v_j.reshape(G, N, H, M, 3)

        # pair tensors [G, Ni, Nj, H, M*M] -- i broadcasts over axis 2, j over axis 1
        ss = jnp.einsum("gihm,gjhn->gijhmn", s_i, s_j, precision=prec)
        vv = jnp.einsum("gihmk,gjhnk->gijhmn", v_i, v_j, precision=prec)
        sv = jnp.einsum("gihm,gjhnk->gijhmnk", s_i, v_j, precision=prec)
        vs = jnp.einsum("gihmk,gjhn->gijhmnk", v_i, s_j, precision=prec)
        MM = M * M
        s_ij = jnp.concatenate(
            [ss.reshape(G, N, N, H, MM), vv.reshape(G, N, N, H, MM)], axis=-1
        )  # [G,N,N,H,2MM]
        v_ij = jnp.concatenate(
            [sv.reshape(G, N, N, H, MM, 3), vs.reshape(G, N, N, H, MM, 3)], axis=-2
        )

        w_s_init = self.param("w_s_init", _xavier_uniform(), (H, nc_middle, 2 * MM))
        b_s_init = self.param("b_s_init", nn.initializers.zeros, (H, nc_middle))
        w_v_init = self.param("w_v_init", _xavier_uniform(), (H, nc_middle, 2 * MM))
        s_ij = (
            jnp.einsum("hmn,gijhn->gijhm", w_s_init.astype(s_ij.dtype), s_ij, precision=prec)
            + b_s_init.astype(s_ij.dtype)
        )
        v_ij = jnp.einsum("hmn,gijhnk->gijhmk", w_v_init.astype(v_ij.dtype), v_ij, precision=prec)

        # ---- pre-attn DTP with the edge direction
        dtp = DTPByHead(nc_middle, 3 * M, M, H, name="pre_attn_dtp_linear")
        radial = self.radial_nn(num_out_features=dtp.weight_numel)
        weights = radial(r, edges, ts)  # [G, N, N, 4*nc_middle*H]
        s_ij, v_ij = dtp(s_ij, v_ij, rvec, weights)  # s: [G,N,N,H,3M], v: [G,N,N,H,M,3]

        s_ij0 = s_ij[..., :M]  # attention-logit features
        gate_v = s_ij[..., M : 2 * M]
        s_msg = s_ij[..., 2 * M :]

        # ---- messages
        s_msg = jax.nn.silu(s_msg)
        v_ij = jax.nn.sigmoid(gate_v)[..., None] * v_ij
        ss = s_msg
        sv = s_msg[..., None] * rvec[..., None, None, :]
        vs = v_ij
        vv = jnp.sum(v_ij * rvec[..., None, None, :], axis=-1)
        s_cat = jnp.concatenate([ss, vv], axis=-1)  # [G,N,N,H,2M]
        v_cat = jnp.concatenate([sv, vs], axis=-2)  # [G,N,N,H,2M,3]

        attn_msg_w_s = self.param("attn_msg_w_s", _xavier_uniform(), (H, M, 2 * M))
        attn_msg_b_s = self.param("attn_msg_b_s", nn.initializers.zeros, (H, M))
        attn_msg_w_v = self.param("attn_msg_w_v", _xavier_uniform(), (H, M, 2 * M))
        s_ij = (
            jnp.einsum("hmn,gijhn->gijhm", attn_msg_w_s.astype(s_cat.dtype), s_cat, precision=prec)
            + attn_msg_b_s.astype(s_cat.dtype)
        )
        v_ij = jnp.einsum("hmn,gijhnk->gijhmk", attn_msg_w_v.astype(v_cat.dtype), v_cat, precision=prec)

        # ---- attention over incoming edges of each dst
        gain = math.sqrt(2.0 / (1.0 + 0.1**2))  # leaky_relu(0.1) gain, as in ref init
        attn_w = self.param("attn_w", _xavier_uniform(gain), (H, M))
        z = jnp.einsum("hn,gijhn->gijh", attn_w.astype(s_ij0.dtype), s_ij0, precision=prec)
        z = jax.nn.softplus(z)
        if weight_cutoff is not None:
            z = weight_cutoff[..., None] * z
        a = _masked_softmax_over_src(
            jnp.moveaxis(z, -1, 2), pair_mask[:, :, None, :]
        )  # [G, N, H, N(src)]
        a = jnp.moveaxis(a, 2, -1)  # [G, Ni, Nj, H]

        s_agg = jnp.einsum("gijh,gijhm->gihm", a, s_ij, precision=prec).reshape(G, N, S)
        v_agg = jnp.einsum("gijh,gijhmk->gihmk", a, v_ij, precision=prec).reshape(G, N, S, 3)
        s, v = SVLinear(S, S, S, S, add_bias=True, name="linear_attn_final")(s_agg, v_agg)

        s = s0 + s
        v = v0 + v

        # ---- feed-forward
        if self.apply_resnet:
            s0, v0 = s, v
        if self.apply_layer_norm:
            s, v = SVLayerNorm(S, S, name="layer_norm_ff")(s, v)
        m = self.ff_mul
        s, v = SVLinear(S, m * nc_s_out + m * nc_v_out, S, m * nc_v_out, add_bias=True, name="ff1")(s, v)
        if nc_s_out > 0:
            off = m * nc_s_out
            gate_v = s[..., off:]
            s = jax.nn.silu(s[..., :off])
        else:
            gate_v = s
            s = None
        v = jax.nn.sigmoid(gate_v)[..., None] * v
        s, v = SVLinear(m * nc_s_out, nc_s_out, m * nc_v_out, nc_v_out, add_bias=True, name="ff2")(s, v)

        if self.apply_resnet:
            s = s0 + s if s is not None else None
            v = v0 + v
        return s, v


class Convnet(nn.Module):
    """Two-stage gated TP convolution on dense masked pairs
    (`contrib/equifold/_conv.py:11-98`).

    Same call signature as `Equiformer`. `div_factor` replaces the reference's
    scatter-sum / div_factor normalization (it must be > 0; the reference's
    0.0 default divides by zero).
    """

    nc_s: int
    nc_v: int
    radial_nn: Callable[..., nn.Module]
    div_factor: float = 1.0
    nc_s_out: Optional[int] = None
    nc_v_out: Optional[int] = None

    @nn.compact
    def __call__(self, s, v, pair_mask, r, rvec, weight_cutoff=None, edges=None, ts=None):
        assert self.nc_s == self.nc_v
        assert self.div_factor > 0.0
        S = self.nc_s
        nc_s_out = self.nc_s_out if self.nc_s_out is not None else S
        nc_v_out = self.nc_v_out if self.nc_v_out is not None else S
        s0, v0 = s, v
        maskf = pair_mask.astype(s.dtype)
        # zero non-finite masked-pair geometry (see Equiformer note above)
        r = jnp.where(pair_mask, r, 0.0)
        rvec = jnp.where(pair_mask[..., None], rvec, 0.0)

        # pair features: i = dst (axis 1), j = src (axis 2)
        s1 = s[:, :, None, :]  # dst
        v1 = v[:, :, None, :, :]
        s2 = s[:, None, :, :]  # src
        v2 = v[:, None, :, :, :]

        # ---- TP among node tensors
        ss = s1 * s2
        vv = jnp.sum(v1 * v2, axis=-1)
        sv = s1[..., None] * v2
        vs = v1 * s2[..., None]
        s_p = jnp.concatenate([ss, vv], axis=-1)  # [G,N,N,2S]
        v_p = jnp.concatenate([sv, vs], axis=-2)  # [G,N,N,2S,3]

        w1 = self.radial_nn(num_out_features=4 * S, name="radial_nn1")(r, edges, ts)
        w_s, w_v = w1[..., : 2 * S], w1[..., 2 * S :]
        s_p = w_s * s_p
        v_p = w_v[..., None] * v_p
        s_p, v_p = SVLinear(2 * S, 2 * S, 2 * S, S, add_bias=True, name="linear1")(s_p, v_p)
        s_gate = s_p[..., S:]
        s_p = jax.nn.silu(s_p[..., :S])
        v_p = jax.nn.sigmoid(s_gate)[..., None] * v_p

        # ---- TP with the edge direction
        ss = s_p
        vv = jnp.sum(v_p * rvec[..., None, :], axis=-1)
        sv = s_p[..., None] * rvec[..., None, :]
        vs = v_p
        s_p = jnp.concatenate([ss, vv], axis=-1)
        v_p = jnp.concatenate([sv, vs], axis=-2)

        w2 = self.radial_nn(num_out_features=4 * S, name="radial_nn2")(r, edges, ts)
        w_s, w_v = w2[..., : 2 * S], w2[..., 2 * S :]
        s_p = w_s * s_p
        v_p = w_v[..., None] * v_p
        s_p, v_p = SVLinear(2 * S, 2 * S, 2 * S, S, add_bias=True, name="linear2")(s_p, v_p)
        s_gate = s_p[..., S:]
        s_p = jax.nn.silu(s_p[..., :S])
        v_p = jax.nn.sigmoid(s_gate)[..., None] * v_p

        # ---- masked reduction over src
        s_r = jnp.sum(s_p * maskf[..., None], axis=2) / self.div_factor
        v_r = jnp.sum(v_p * maskf[..., None, None], axis=2) / self.div_factor
        s_r, v_r = SVLinear(S, nc_s_out, S, nc_v_out, add_bias=True, name="linear3")(s_r, v_r)

        # ---- self-interaction + resnet
        s0, v0 = SVLinear(S, nc_s_out, S, nc_v_out, add_bias=False, name="linear_self")(s0, v0)
        s = s0 + s_r if s0 is not None else None
        v = v0 + v_r if v0 is not None else None
        return s, v
