"""Whole-model fused E3Conv walk kernel ("stack kernel").

ONE `pallas_call` runs, per graph, the ENTIRE denoiser arch forward that the
walk-jump sampler executes every MCMC step:

    edge features (SH / adjacency / radial basis, dense pairs + bonds)
    -> initial projector ConvBlock (V = 0)
    -> L x [noise scale -> hidden ConvBlock -> noise-conditioned skip blend]
    -> EquivariantMLP head

replacing 7+ kernel launches + the XLA glue between them (per-layer
[G, C, N] f32 HBM round trips for scaling/skip, 6x re-reads of the [EFR, N^2]
edge features, per-call grid overhead). Edge features live only in VMEM — at
4AA scale the per-step HBM traffic drops by ~0.5 GB.

All math delegates to the bodies shared with the per-layer kernels
(`packed_conv._conv_block_body`, `_edge_features_body`), so numerical parity
with the layer-by-layer chained path is structural, not re-derived.

Sampling-only: the walk never differentiates the score network. Training uses
the per-layer kernels (hand-written backward) or the XLA path.

Reference scope: the whole of `E3Conv.forward`
(`/root/reference/src/jamun/model/arch/e3conv.py:12-138`) minus the atom
embedder, as executed per walk step by `sample.py`.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jamun_tpu.ops.precision import matmul_precision
from jamun_tpu.ops.pallas.packed_conv import (
    EF_GEOM,
    _conv_block_body,
    _default_k,
    _dense_onehots,
    _edge_features_body,
    _ef_rows,
    _pack_layer_weights,
    _pad16,
    pack_features_transposed,
)

__all__ = ["packed_e3conv_stack", "stack_supported"]


def stack_supported(N: int, S: int, V: int, S_emb: int, out_blocks_final) -> bool:
    """Same shape regime as the gen-3 fused-block kernel, plus an l<=1 head.

    Capped at N <= 64: the whole-model body is Python-unrolled (L layers x
    K graphs), and Mosaic compile time becomes pathological at larger N
    (measured >20 min at N=112 vs 1-9 min at N <= 48; a fori_loop body with
    dynamic weight indexing was slower still). Larger systems use the
    per-layer chained kernels, which pipeline their edge-feature HBM reads
    and compile per-block.

    JAMUN_STACK_NMAX (process-start only, like JAMUN_STACK_K) raises the cap
    for compile-time experiments — the round-3 o2-fold shrank the unrolled
    body ~25%, which may have moved the pathology threshold."""
    from jamun_tpu.ops.pallas.packed_conv import _env_k, packed_shape_bounds_ok

    return (
        N <= _env_k("JAMUN_STACK_NMAX", 64)
        and packed_shape_bounds_ok(N, S, V)
        and packed_shape_bounds_ok(N, S_emb, 0)
        and V >= 16
        # even parity required, matching E3Conv._chained_ok's head gate:
        # IrrepsLinear creates no params for parity-mismatched blocks, so an
        # odd-parity output (e.g. 1x1o) has no w_* subtree to collect
        and all(l <= 1 and p == 1 for _, l, p in out_blocks_final)
    )


def _stack_kernel(
    posm_ref,   # [K, 8, N]   f32 position rows (x, y, z, mask, 0...)
    nf0_ref,    # [K, Ep, N]  cdt noise-scaled atom embedding (0e only)
    ebsT_ref,   # [K, N, B]   f32 bond-src one-hot columns
    ebdT_ref,   # [K, N, B]   f32 bond-dst one-hot columns
    ebd_ref,    # [K, B, N]   f32 bond-dst scatter rows
    scal_ref,   # [1, 4]      f32: cutoff
    sc_ref,     # [L, Fp, 1]  f32 pre-layer noise scales (row-expanded)
    sw_ref,     # [L, Fp, 1]  f32 skip blend weights (row-expanded)
    # projector ConvBlock weights (S = S_emb, V = 0, fuse_block):
    pw1_ref, pb1d_ref, pb1b_ref, pw2_ref, pb2_ref, ppl0_ref, ppl1_ref,
    plin20_ref, plin21_ref, psk0_ref, psk1_ref,
    # hidden ConvBlock weights, stacked [L, ...]:
    lw1_ref, lb1d_ref, lb1b_ref, lw2_ref, lb2_ref, lpl0_ref, lpl1_ref,
    llin20_ref, llin21_ref, lsk0_ref, lsk1_ref,
    # head (EquivariantMLP) weights, transposed + fan-folded:
    hb00_ref,   # [Sp, Sp]
    hb01_ref,   # [Vp, Sp]  gate scalars
    hb12_ref,   # [Vp, Vp]
    hf0_ref,    # [C0op, Sp]   (zero-row dummy when no l=0 outputs)
    hf1_ref,    # [V1op, Vp]   (zero-row dummy when no l=1 outputs)
    out_ref,    # [K, C0op + 3*V1op, N] f32
    *,
    N: int,
    B: int,
    S: int,
    V: int,
    S_emb: int,
    n_radial: int,
    K: int,
    L: int,
    C0o: int,
    V1o: int,
):
    f32 = jnp.float32
    cdt = nf0_ref.dtype
    P = N * N
    Sp, Vp = _pad16(S), _pad16(V)
    C0op, V1op = _pad16(C0o), _pad16(V1o)
    cutoff = scal_ref[0, 0]
    _, eit_f, eye_row = _dense_onehots(N, P, f32)
    # dense aggregation one-hot (dst-major pairs)
    offt = jax.lax.broadcasted_iota(jnp.int32, (P, N), 0) - jax.lax.broadcasted_iota(
        jnp.int32, (P, N), 1
    ) * N
    ei = ((offt >= 0) & (offt < N)).astype(cdt)

    gate_shape = (S, V, V)

    for k in range(K):
        ef, bf = _edge_features_body(
            posm_ref[k][...], ebsT_ref[k][...], ebdT_ref[k][...], cutoff,
            N=N, n_radial=n_radial, cdt=cdt, eit_f=eit_f, eye_row=eye_row,
        )
        ebsT_k = ebsT_ref[k][...]
        ebd_k = ebd_ref[k][...]

        # initial projector: embedding (0e) -> hidden irreps, whole ConvBlock
        x = _conv_block_body(
            nf0_ref[k][...], ef, bf, ebsT_k, ebd_k,
            pw1_ref[...], pb1d_ref[...], pb1b_ref[...], pw2_ref[...], pb2_ref[...],
            ppl0_ref[...], ppl1_ref[...],
            plin20_ref[...], plin21_ref[...], psk0_ref[...], psk1_ref[...],
            N=N, B=B, S=S_emb, V=0, n_radial=n_radial, C0=0, V1=0,
            fuse_block=True, gate_shape=gate_shape, ei=ei,
        )  # [Sp + 3*Vp, N] f32

        # hidden layers: scale -> ConvBlock -> noise-conditioned skip blend.
        # Python-unrolled on purpose: a lax.fori_loop body with dynamic
        # leading-dim weight indexing compiled SLOWER than the full unroll
        # (13+ min vs 9 at N=44 — Mosaic's dynamic-slice analysis loses more
        # than the 3x-smaller program saves), so the stack kernel instead
        # stays gated to N <= 64 where unrolled compiles are sane.
        for l in range(L):
            xs = (x * sc_ref[l]).astype(cdt)
            y = _conv_block_body(
                xs, ef, bf, ebsT_k, ebd_k,
                lw1_ref[l], lb1d_ref[l], lb1b_ref[l], lw2_ref[l], lb2_ref[l],
                lpl0_ref[l], lpl1_ref[l],
                llin20_ref[l], llin21_ref[l], lsk0_ref[l], lsk1_ref[l],
                N=N, B=B, S=S, V=V, n_radial=n_radial, C0=0, V1=0,
                fuse_block=True, gate_shape=gate_shape, ei=ei,
            )
            w = sw_ref[l]
            x = x * w + y * (1.0 - w)

        # head: EquivariantMLP(hidden -> hidden -> irreps_out) in [C, N] form
        prec = matmul_precision(cdt)
        xs = x[0:Sp].astype(cdt)
        s_pre = jnp.dot(hb00_ref[...], xs, preferred_element_type=f32, precision=prec)
        gates = jax.nn.sigmoid(
            jnp.dot(hb01_ref[...], xs, preferred_element_type=f32, precision=prec)
        )
        s_act = jax.nn.leaky_relu(s_pre, 0.01).astype(cdt)
        parts = []
        if C0o > 0:
            parts.append(
                jnp.dot(hf0_ref[...], s_act, preferred_element_type=f32, precision=prec)
            )
        if V1o > 0:
            for c in range(3):
                xv = x[Sp + c * Vp : Sp + (c + 1) * Vp].astype(cdt)
                v_pre = jnp.dot(
                    hb12_ref[...], xv, preferred_element_type=f32, precision=prec
                )
                gated = (v_pre * gates).astype(cdt)
                parts.append(
                    jnp.dot(hf1_ref[...], gated, preferred_element_type=f32, precision=prec)
                )
        out_ref[k] = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _row_expand(vec, S, V):
    """[.., S + V] per-irrep-copy coefficients -> [.., Fp, 1] transposed rows
    (scalar channels then the shared scale for each of the 3 vector
    components), zeros at slot-padding rows."""
    Sp, Vp = _pad16(S), _pad16(V)
    lead = vec.shape[:-1]
    z = lambda n: jnp.zeros(lead + (n,), vec.dtype)
    s = vec[..., :S]
    parts = [s] if Sp == S else [s, z(Sp - S)]
    if V > 0:
        v = vec[..., S:]
        for _ in range(3):
            parts.append(v if Vp == V else jnp.concatenate([v, z(Vp - V)], axis=-1))
    return jnp.concatenate(parts, axis=-1)[..., None]


def _pack_head_weights(head_blk, head_fin, out_blocks_final, S, V, cdt):
    """EquivariantMLP params -> transposed, fan-folded kernel matrices."""
    Sp, Vp = _pad16(S), _pad16(V)

    def padT(w, fan, rows, cols):
        m = w.T.astype(cdt) / math.sqrt(max(fan, 1))
        if m.shape[0] != rows:
            m = jnp.concatenate([m, jnp.zeros((rows - m.shape[0], m.shape[1]), cdt)], axis=0)
        if m.shape[1] != cols:
            m = jnp.concatenate([m, jnp.zeros((m.shape[0], cols - m.shape[1]), cdt)], axis=1)
        return m

    hb00 = padT(head_blk["w_0_0"], S, Sp, Sp)
    hb01 = padT(head_blk["w_0_1"], S, Vp, Sp)
    hb12 = padT(head_blk["w_1_2"], V, Vp, Vp)
    rows0, rows1 = [], []
    for j, (mul, l) in enumerate(out_blocks_final):
        if l == 0:
            rows0.append(head_fin[f"w_0_{j}"].T.astype(cdt) / math.sqrt(max(S, 1)))
        else:
            rows1.append(head_fin[f"w_1_{j}"].T.astype(cdt) / math.sqrt(max(V, 1)))
    C0o = sum(mul for mul, l in out_blocks_final if l == 0)
    V1o = sum(mul for mul, l in out_blocks_final if l == 1)

    def stackpad(rows, Cp, cols):
        """Stack [mul, S-or-V] rows and zero-pad BOTH dims to (Cp, cols) —
        the column pad matters whenever S/V is not a 16-multiple."""
        if not rows:
            return jnp.zeros((_pad16(1), cols), cdt)
        m = jnp.concatenate(rows, axis=0)
        if m.shape[1] != cols:
            m = jnp.concatenate(
                [m, jnp.zeros((m.shape[0], cols - m.shape[1]), cdt)], axis=1
            )
        if m.shape[0] != Cp:
            m = jnp.concatenate([m, jnp.zeros((Cp - m.shape[0], cols), cdt)], axis=0)
        return m

    hf0 = stackpad(rows0, _pad16(C0o), Sp)
    hf1 = stackpad(rows1, _pad16(V1o), Vp)
    return hb00, hb01, hb12, hf0, hf1, C0o, V1o


def packed_e3conv_stack(
    pos: jnp.ndarray,         # [G, N, 3] f32
    node_mask: jnp.ndarray,   # [G, N] bool
    bond_src: jnp.ndarray,    # [G, B] int32
    bond_dst: jnp.ndarray,    # [G, B] int32
    bond_mask: jnp.ndarray,   # [G, B] bool
    cutoff: jnp.ndarray,      # scalar
    nf0: jnp.ndarray,         # [G, N, S_emb] noise-scaled embedding (0e only)
    proj_w: tuple,            # (w1, b1, w2, b2, pl dict, lin2 dict, skip dict)
    layers_w: tuple,          # same tuple, every leaf stacked [L, ...]
    scales: jnp.ndarray,      # [L, S + V] f32 pre-layer noise scales
    skipw: jnp.ndarray,       # [L, S + V] f32 sigmoid skip weights
    head_blk: dict,           # EquivariantMLPBlock IrrepsLinear params
    head_fin: dict,           # final IrrepsLinear params
    bond0: jnp.ndarray,
    bond1: jnp.ndarray,
    out_blocks_final: tuple,  # ((mul, l), ...) for irreps_out
    S: int,
    V: int,
    S_emb: int,
    n_radial: int = 32,
    interpret: bool = False,
    compute_dtype=None,
    graphs_per_program: int | None = None,
) -> jnp.ndarray:
    """Whole walk-step arch forward in one kernel. Returns [G, N, out_dim]
    (packed irreps, same layout as the layer-by-layer path)."""
    G, N, _ = pos.shape
    B = bond_src.shape[1]
    L = scales.shape[0]
    f32 = jnp.float32
    cdt = compute_dtype or jnp.float32
    Sp, Vp = _pad16(S), _pad16(V)
    Ep = _pad16(S_emb)
    EFR = _ef_rows(n_radial)

    out_blocks_hidden = ((S, 0), (V, 0), (V, 1))

    # --- geometry inputs (same construction as _packed_edge_features_impl) ---
    posm = jnp.concatenate(
        [
            jnp.swapaxes(pos, -1, -2).astype(f32),
            node_mask.astype(f32)[:, None, :],
            jnp.zeros((G, 4, N), f32),
        ],
        axis=1,
    )  # [G, 8, N]
    bm = bond_mask.astype(f32)
    ebsT = (jax.nn.one_hot(bond_src, N, dtype=f32) * bm[..., None]).swapaxes(-1, -2)
    ebdT = (jax.nn.one_hot(bond_dst, N, dtype=f32) * bm[..., None]).swapaxes(-1, -2)
    ebd = jnp.swapaxes(ebdT, -1, -2)

    nf0T = pack_features_transposed(nf0, S_emb, 0, cdt)  # [G, Ep, N]

    # --- weight packing (projector, stacked layers, head) ---
    def pack_one(w1, b1, w2, b2, plp, lin2p, skipp, S_, V_):
        return _pack_layer_weights(
            w1, b1, w2, b2, bond0, bond1, plp,
            S=S_, V=V_, out_blocks=out_blocks_hidden, n_radial=n_radial,
            fuse_block=True, lin2_params=lin2p, skip_params=skipp, cdt=cdt,
        )[1]

    proj_packed = pack_one(*proj_w, S_emb, 0)
    layers_packed = jax.vmap(
        lambda w1, b1, w2, b2, plp, lin2p, skipp: pack_one(
            w1, b1, w2, b2, plp, lin2p, skipp, S, V
        )
    )(*layers_w)

    hb00, hb01, hb12, hf0, hf1, C0o, V1o = _pack_head_weights(
        head_blk, head_fin, out_blocks_final, S, V, cdt
    )
    C0op, V1op = _pad16(C0o), _pad16(V1o)
    Cp_out = (C0op if C0o else 0) + 3 * (V1op if V1o else 0)

    scT = _row_expand(scales.astype(f32), S, V)  # [L, Fp, 1]
    swT = _row_expand(skipw.astype(f32), S, V)

    # --- grid setup ---
    if graphs_per_program is None:
        # the stack body is ~7x a single layer kernel's, so Mosaic compile
        # time scales hard with K; at large N the unrolled program becomes
        # pathological (observed: 20+ min at N=112, K=8). Per-program grid
        # overhead (~15 us) is negligible against the multi-ms body, so a
        # small K at large N trades nothing measurable at runtime.
        import os

        env = os.environ.get("JAMUN_STACK_K")
        if env:
            graphs_per_program = int(env)
        else:
            graphs_per_program = min(_default_k(), 2 if N > 64 else 8)
    K = max(1, min(graphs_per_program, G))
    Gp = ((G + K - 1) // K) * K
    padg = Gp - G
    if padg:
        def padg_fn(a):
            return jnp.concatenate([a, jnp.zeros((padg,) + a.shape[1:], a.dtype)], axis=0)

        posm, nf0T, ebsT, ebdT, ebd = map(padg_fn, (posm, nf0T, ebsT, ebdT, ebd))
    scalars = jnp.broadcast_to(jnp.asarray([cutoff, 0.0, 0.0, 0.0], f32)[None], (1, 4))

    kernel = functools.partial(
        _stack_kernel,
        N=N, B=B, S=S, V=V, S_emb=S_emb, n_radial=n_radial, K=K, L=L,
        C0o=C0o, V1o=V1o,
    )

    def gspec(shape):
        return pl.BlockSpec((K,) + shape, lambda g: (g,) + (0,) * len(shape), memory_space=pltpu.VMEM)

    def shared(shape):
        return pl.BlockSpec(shape, lambda g: (0,) * len(shape), memory_space=pltpu.VMEM)

    ws = list(proj_packed) + list(layers_packed) + [hb00, hb01, hb12, hf0, hf1]
    outT = pl.pallas_call(
        kernel,
        grid=(Gp // K,),
        in_specs=[
            gspec((8, N)),
            gspec((Ep, N)),
            gspec((N, B)),
            gspec((N, B)),
            gspec((B, N)),
            shared((1, 4)),
            shared(scT.shape),
            shared(swT.shape),
        ]
        + [shared(w.shape) for w in ws],
        out_specs=gspec((Cp_out, N)),
        out_shape=jax.ShapeDtypeStruct((Gp, Cp_out, N), f32),
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(posm, nf0T, ebsT, ebdT, ebd, scalars, scT, swT, *ws)
    if padg:
        outT = outT[:G]

    # --- reassemble packed irreps [G, N, out_dim] ---
    out_parts = []
    off0 = 0
    off1 = 0
    for mul, l in out_blocks_final:
        if l == 0:
            out_parts.append(jnp.swapaxes(outT[:, off0 : off0 + mul, :], -1, -2))
            off0 += mul
        else:
            base = (C0op if C0o else 0)
            comps = [
                jnp.swapaxes(
                    outT[:, base + c * V1op + off1 : base + c * V1op + off1 + mul, :],
                    -1, -2,
                )
                for c in range(3)
            ]
            out_parts.append(jnp.stack(comps, axis=-1).reshape(G, N, 3 * mul))
            off1 += mul
    return jnp.concatenate(out_parts, axis=-1)
