"""Fused NR-trip megakernel: one Pallas program per Newton iteration.

QUARANTINED (round 4): this kernel MISCOMPILES on this backend's Mosaic
(wrong results vs its own interpret mode) and its per-elimination-step
overhead measured ~30x the unfused lane-major trip (BENCH_NOTES
"fused-trip negative result") — so it lives here in validation/, not on
the shipped hpfx/ surface, with its interpret-mode oracle tests
(tests/test_fused_trip.py) still gating the trip semantics.  Re-test on
newer Mosaic runtimes by driving `fused_trip(..., interpret=False)`
directly; the former Settings.fused_trip dispatch in hpfx.lanes was
removed with the quarantine.

The lane-major sweep (hpfx.lanes) fixed the *tiling* of the batched trip
but still executes it as ~150 separate XLA ops, each paying HBM round
trips and fixed thunk overhead on tensors of a few MB — measured ~7 ms per
trip at net2/B=4096 against a ~12 us HBM-bandwidth floor (BENCH_NOTES
round-2 utilization accounting).  This kernel performs the ENTIRE trip —
arrow-structured Jacobian block assembly, the simultaneous per-harmonic
Gauss-Jordan factorizations, the Woodbury capacitance solve, the state
update and the new mismatch/residual — in one VMEM-resident Pallas program
per 128-scenario lane slab.

Design notes (all patterns compile-probed and hardware-validated first,
per the CLAUDE.md wedge protocol):

- The batch rides the lane (last) axis everywhere; per-scenario tensors
  are (H, n, B), (H, 2n, 2n, B), (dim, B) with B = 128 lanes.
- The Newton state is carried in the *grouped* (harmonic-block) ordering
  of hpfx.arrow — in that ordering the Woodbury coupling coordinates are
  contiguous static slices, so the kernel needs no gathers or permutations
  at all (the reference ordering is only a host-side view; voltages are
  returned as natural (H, n) tensors either way).
- All H harmonic blocks are eliminated SIMULTANEOUSLY as one rank-4
  masked Gauss-Jordan (2n steps over (H, 2n, 2n, B) slabs) — the same
  virtual-pivoting scheme as hpfx.ops.batched_solve, with the fundamental
  block identity-padded to 2n, and the same f32 row+column equilibration.
- Static index machinery (unit U-columns, one-hot embeddings) is
  synthesized in-kernel from iota comparisons; only numeric tensors are
  passed in (Mosaic rejects captured host constants).
- Known Mosaic landmines avoided: 128-lane blocks only, 0/1 f32 masks
  (no mixed-rank i1), no dynamic-index value reads, no in-place ref
  mutation inside fori_loop bodies.

Math parity: hcne_generalized.py:313-473 exactly as factored in
hpfx.arrow / hpfx.harmonic / hpfx.lanes; tested in interpret mode against
the unfused lane-major functions (tests/test_fused_trip.py).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pallas TPU backend is absent on pure-CPU installs
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

from hpfx.ops.batched_solve import VMEM_LIMIT

LANES = 128


# ---------------------------------------------------------------------------
# in-kernel helpers (pure jnp on values; batch = last axis)
# ---------------------------------------------------------------------------

def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _iota_eye(shape, ax1, ax2, dt):
    """Identity built at target rank via iota comparison — Mosaic cannot
    shape-cast a 2D eye into trailing singleton dims ((H,H) -> (H,H,1,1)
    is an unsupported tile change)."""
    i = jax.lax.broadcasted_iota(jnp.int32, shape, ax1)
    j = jax.lax.broadcasted_iota(jnp.int32, shape, ax2)
    return (i == j).astype(dt)


def _gj_eliminate(A, b, n_live: int):
    """Rank-4 simultaneous Gauss-Jordan with virtual partial pivoting.

    A (H, N, N, B), b (H, N, R, B): eliminates all H blocks at once over
    ``n_live`` steps (identity-padded rows self-eliminate with pivot 1).
    Same scheme as hpfx.ops.batched_solve._gj_kernel, one rank higher.
    Returns the solution (H, N, R, B).
    """
    Hb, N, _, B = A.shape
    R = b.shape[2]
    row_i = jax.lax.broadcasted_iota(jnp.int32, (Hb, N, B), 1)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (Hb, N, N, B), 2)

    def step(k, carry):
        A, b, used = carry
        colk = jnp.sum(jnp.where(col_i == k, A, 0.0), axis=2)      # (H,N,B)
        score = jnp.abs(colk) - 1e30 * used
        p = jnp.argmax(score, axis=1)                              # (H,B)
        on_p = (row_i == p[:, None, :]).astype(A.dtype)            # (H,N,B)
        rowp = jnp.sum(on_p[:, :, None, :] * A, axis=1)            # (H,N,B)
        bp = jnp.sum(on_p[:, :, None, :] * b, axis=1)              # (H,R,B)
        pivot = jnp.sum(on_p * colk, axis=1)                       # (H,B)
        inv_piv = 1.0 / pivot
        w = (1.0 - on_p) * colk * inv_piv[:, None, :] + \
            on_p * (1.0 - inv_piv[:, None, :])
        A = A - w[:, :, None, :] * rowp[:, None, :, :]
        b = b - w[:, :, None, :] * bp[:, None, :, :]
        return A, b, jnp.maximum(used, on_p)

    used0 = jnp.zeros_like(row_i, A.dtype)
    A, b, _ = jax.lax.fori_loop(0, n_live, step,
                                (A, b, used0.astype(A.dtype)))
    # A converged to a per-(block, system) permutation: x[k] = sum_r A[r,k]b[r]
    outs = [jnp.sum(A * b[:, :, r, :][:, :, None, :], axis=1)
            for r in range(R)]                                     # (H,N,B)
    return jnp.stack(outs, axis=2)                                 # (H,N,R,B)


def _gj_eliminate3(A, b, n_live: int):
    """Rank-3 single-system variant: A (N, N, B), b (N, R, B)."""
    sol = _gj_eliminate(A[None], b[None], n_live)
    return sol[0]


def _equilibrate4(A, b):
    """f32 row+column max-abs equilibration (hpfx.ops.batched_solve
    .equilibrated) on (H, N, N, B) blocks; returns (As, bs, c_scale)."""
    absA = jnp.abs(A)
    r = 1.0 / jnp.maximum(jnp.max(absA, axis=2), 1e-30)            # (H,N,B)
    As = A * r[:, :, None, :]
    c = 1.0 / jnp.maximum(jnp.max(jnp.abs(As), axis=1), 1e-30)     # (H,N,B)
    As = As * c[:, None, :, :]
    bs = b * r[:, :, None, :]
    return As, bs, c


def _solve_blocks(A, b, n_live: int):
    As, bs, c = _equilibrate4(A, b)
    sol = _gj_eliminate(As, bs, n_live)
    return sol * c[:, :, None, :]


def _solve_one(A, b, n_live: int):
    sol = _solve_blocks(A[None], b[None], n_live)
    return sol[0]


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

class TripDims(NamedTuple):
    H: int
    n: int
    m: int
    c: int
    L: int          # number of lines (stable mismatch); 0 = dense mismatch
    coupled: bool

    @property
    def n_nl(self) -> int:
        return self.n - self.m

    @property
    def d0(self) -> int:
        return 2 * self.n - 1 - self.c

    @property
    def r(self) -> int:
        return 2 * self.H * self.n_nl

    @property
    def r_blk(self) -> int:
        return 2 * self.n_nl

    @property
    def dim(self) -> int:
        return 2 * self.H * self.n - 1 - self.c


def _injections(dims: TripDims, Vcr, Vci, YNr, YNi, INr, INi, inj):
    """I_inj (n_nl, H, B) from (H, n, B) voltage phasors (kernel values)."""
    m = dims.m
    Vr, Vi = Vcr[:, m:], Vci[:, m:]                      # (H, n_nl, B)
    if dims.coupled:
        # sum_p Y_N[d,h,p] * V[p,d,b]
        tr, ti = _cmul(YNr[:, :, :, None], YNi[:, :, :, None],
                       Vr.transpose(1, 0, 2)[:, None, :, :],
                       Vi.transpose(1, 0, 2)[:, None, :, :])
        yr, yi = jnp.sum(tr, axis=2), jnp.sum(ti, axis=2)  # (n_nl, H, B)
    else:
        yr, yi = _cmul(YNr[:, :, None], YNi[:, :, None],
                       Vr.transpose(1, 0, 2), Vi.transpose(1, 0, 2))
    s = inj[None, :, :]                                   # (1, 1, B)
    return ((INr[:, :, None] - yr) * s, (INi[:, :, None] - yi) * s)


def _dense_matvec(Yr, Yi, Vr, Vi):
    """(H, n, n) x (H, n, B) complex matvec via broadcast-reduce."""
    tr, ti = _cmul(Yr[:, :, :, None], Yi[:, :, :, None],
                   Vr[:, None, :, :], Vi[:, None, :, :])
    return jnp.sum(tr, axis=2), jnp.sum(ti, axis=2)


def _stable_matvec(dims: TripDims, Vm, Va, Ysr, Ysi, dr, di, Mf, Mt,
                   lineP):
    """Cancellation-free Y·V (hpfx.ybus.stable_matvec) in kernel form.

    Endpoint voltages are selected with the 0/1 incidence masks Mf/Mt
    (n, L) instead of gathers; flows scatter back through the same masks.
    ``lineP`` (3, L): rows a_ff, inv_tau, shift.
    """
    # (L, 1) column vectors (rank-1 values are Mosaic-hostile)
    a_ff = lineP[0:1].transpose(1, 0)
    inv_tau = lineP[1:2].transpose(1, 0)
    shift = lineP[2:3].transpose(1, 0)
    # V at endpoints: (H, L, B) = sum_i M[i, l] * V[h, i, b]
    sel = lambda M, X: jnp.sum(M[None, :, :, None] * X[:, :, None, :],
                               axis=1)
    Vm_f, Va_f = sel(Mf, Vm), sel(Mf, Va)
    Vm_t, Va_t = sel(Mt, Vm), sel(Mt, Va)

    def polar_diff(mu_a, th_a, mu_b, th_b):
        dmu = mu_a - mu_b
        delta = th_b - th_a
        s_half = jnp.sin(0.5 * delta)
        re_l = dmu + 2.0 * mu_b * s_half * s_half
        im_l = -mu_b * jnp.sin(delta)
        return _cmul(jnp.cos(th_a), jnp.sin(th_a), re_l, im_l)

    fr, fi = polar_diff(Vm_f * a_ff, Va_f,
                        Vm_t * inv_tau, Va_t + shift)
    flow_f_r, flow_f_i = _cmul(Ysr[:, :, None], Ysi[:, :, None], fr, fi)
    tr_, ti_ = polar_diff(Vm_t, Va_t,
                          Vm_f * inv_tau, Va_f - shift)
    flow_t_r, flow_t_i = _cmul(Ysr[:, :, None], Ysi[:, :, None], tr_, ti_)

    # diagonal terms + scatter flows back: out[h,i,b] += M[i,l]*flow[h,l,b]
    Vcr, Vci = Vm * jnp.cos(Va), Vm * jnp.sin(Va)
    out_r, out_i = _cmul(dr[:, :, None], di[:, :, None], Vcr, Vci)
    scat = lambda M, F: jnp.sum(M[None, :, :, None] * F[:, None, :, :],
                                axis=2)
    out_r = out_r + scat(Mf, flow_f_r) + scat(Mt, flow_t_r)
    out_i = out_i + scat(Mf, flow_f_i) + scat(Mt, flow_t_i)
    return out_r, out_i


def _mismatch(dims: TripDims, Vm, Va, Yr, Yi, Sr, Si, YNr, YNi, INr, INi,
              inj, stable_args):
    """Grouped-order mismatch f (dim, B) and residual err (1, B)
    (hcne_generalized.py:360-390 via hpfx.lanes.mismatch_lanes, rows
    arranged per hpfx.arrow.make_arrow_index's f_perm)."""
    H, n, m, c = dims.H, dims.n, dims.m, dims.c
    Vcr, Vci = Vm * jnp.cos(Va), Vm * jnp.sin(Va)
    if stable_args is None:
        YVr, YVi = _dense_matvec(Yr, Yi, Vcr, Vci)
    else:
        YVr, YVi = _stable_matvec(dims, Vm, Va, *stable_args)

    # fundamental power mismatch at linear non-slack buses
    sr, si = _cmul(Vcr[0, 1:m], Vci[0, 1:m], YVr[0, 1:m], -YVi[0, 1:m])
    dS_r = Sr[1:m] + sr
    dS_i = Si[1:m] + si

    Ir, Ii = _injections(dims, Vcr, Vci, YNr, YNi, INr, INi, inj)
    dIf_r = YVr[0, m:] + Ir[:, 0]
    dIf_i = YVi[0, m:] + Ii[:, 0]
    # harmonic rows: Y·V plus injections at the nonlinear buses
    inj_h_r = Ir[:, 1:].transpose(1, 0, 2)                # (K, n_nl, B)
    inj_h_i = Ii[:, 1:].transpose(1, 0, 2)
    pad = ((0, 0), (m, 0), (0, 0))
    dIh_r = YVr[1:] + jnp.pad(inj_h_r, pad)
    dIh_i = YVi[1:] + jnp.pad(inj_h_i, pad)

    # grouped rows: block 0 = [P; ReI(0); Q; ImI(0)], then [ReI(h); ImI(h)]
    f0 = jnp.concatenate([dS_r, dIf_r, dS_i[c - 1:], dIf_i], axis=0)
    fh = jnp.concatenate([dIh_r, dIh_i], axis=1)          # (K, 2n, B)
    f = jnp.concatenate([f0, fh.reshape((H - 1) * 2 * n, -1)], axis=0)
    err = jnp.max(jnp.abs(f), axis=0, keepdims=True)      # (1, B)
    return f, err


def _power_blocks(dims: TripDims, Vcr, Vci, Vnr, Vni, Yr, Yi):
    """(n, n, B) dS/dA, dS/dV at the fundamental
    (hpfx.fundamental._power_jacobian_blocks, kernel values)."""
    n = dims.n
    Y1r, Y1i = Yr[0], Yi[0]                               # (n, n)
    Vr, Vi = Vcr[0], Vci[0]                               # (n, B)
    YVr, YVi = _cmul(Y1r[:, :, None], Y1i[:, :, None],
                     Vr[None, :, :], Vi[None, :, :])      # (n, n, B)
    Ir, Ii = jnp.sum(YVr, axis=1), jnp.sum(YVi, axis=1)   # (n, B)
    eye = _iota_eye((n, n, 1), 0, 1, Vr.dtype)
    dgI_r, dgI_i = eye * Ir[:, None, :], eye * Ii[:, None, :]
    tr, ti = dgI_r - YVr, dgI_i - YVi
    ar, ai = _cmul(Vr[:, None, :], Vi[:, None, :], tr, -ti)
    dSdA_r, dSdA_i = -ai, ar                              # j * (...)
    wr, wi = _cmul(Vnr[0], Vni[0], Ir, -Ii)
    dgw_r, dgw_i = eye * wr[:, None, :], eye * wi[:, None, :]
    YVnr, YVni = _cmul(Y1r[:, :, None], Y1i[:, :, None],
                       Vnr[0][None, :, :], Vni[0][None, :, :])
    br, bi = _cmul(Vr[:, None, :], Vi[:, None, :], YVnr, -YVni)
    dSdV_r, dSdV_i = dgw_r + br, dgw_i + bi
    return (dSdA_r, dSdA_i), (dSdV_r, dSdV_i)


def _coupling(dims: TripDims, Vm, Va, Vcr, Vci, Vnr, Vni, YNr, YNi, inj):
    """K_V, K_A (H, H, n_nl, B) split-re/im (hpfx.arrow._coupling_cx)."""
    H, m, n_nl = dims.H, dims.m, dims.n_nl
    Wnr, Wni = Vnr[:, m:], Vni[:, m:]                     # (H, n_nl, B)
    Wcr, Wci = Vcr[:, m:], Vci[:, m:]
    s = inj[None, None, :, :] if dims.coupled else inj[None, :, :]
    if dims.coupled:
        # Y_N (n_nl, H, H) -> (H, H, n_nl); K[h,p,d,b] = -Y_N[d,h,p]·W[p,d,b]
        Ar, Ai = YNr.transpose(1, 2, 0), YNi.transpose(1, 2, 0)
        kr, ki = _cmul(Ar[:, :, :, None], Ai[:, :, :, None],
                       Wnr[None], Wni[None])
        KV_r, KV_i = -kr * s, -ki * s
        kr, ki = _cmul(Ar[:, :, :, None], Ai[:, :, :, None],
                       Wcr[None], Wci[None])
        KA_r, KA_i = (ki * s), -(kr * s)                  # -j·(Y_N·V)·s
        return (KV_r, KV_i), (KA_r, KA_i)
    # uncoupled: diagonal blocks only; Y_N (n_nl, H) -> (H, n_nl)
    Ar, Ai = YNr.transpose(1, 0), YNi.transpose(1, 0)
    dV_r, dV_i = _cmul(Ar[:, :, None], Ai[:, :, None], Wnr, Wni)
    dA_r, dA_i = _cmul(Ar[:, :, None], Ai[:, :, None], Wcr, Wci)
    dV_r, dV_i = -dV_r * s, -dV_i * s
    dA_r, dA_i = (dA_i * s), -(dA_r * s)
    eyeH = _iota_eye((H, H, 1, 1), 0, 1, Vm.dtype)
    emb = lambda x: eyeH * x[:, None, :, :]
    return (emb(dV_r), emb(dV_i)), (emb(dA_r), emb(dA_i))


def _newton_step(dims: TripDims, Vm, Va, f, Yr, Yi, YNr, YNi, inj):
    """Grouped Newton step dx (H, 2n, B): block assembly + simultaneous
    per-harmonic GJ + Woodbury (hpfx.arrow, kernel values)."""
    H, n, m, c = dims.H, dims.n, dims.m, dims.c
    n_nl, d0, rb, r = dims.n_nl, dims.d0, dims.r_blk, dims.r
    k2 = 2 * n
    B = Vm.shape[-1]
    dt = Vm.dtype

    cV, sV = jnp.cos(Va), jnp.sin(Va)
    Vnr, Vni = cV, sV
    Vcr, Vci = Vm * cV, Vm * sV

    # diagonal blocks dI/dV = Y·diag(Vn), dI/dA = j·Y·diag(V)
    bVr, bVi = _cmul(Yr[:, :, :, None], Yi[:, :, :, None],
                     Vnr[:, None, :, :], Vni[:, None, :, :])
    tr, ti = _cmul(Yr[:, :, :, None], Yi[:, :, :, None],
                   Vcr[:, None, :, :], Vci[:, None, :, :])
    bAr, bAi = -ti, tr                                    # (H, n, n, B)

    (KV_r, KV_i), (KA_r, KA_i) = _coupling(dims, Vm, Va, Vcr, Vci,
                                           Vnr, Vni, YNr, YNi, inj)

    # fold h == p coupling into the diagonal blocks at nonlinear entries
    eyeH4 = _iota_eye((H, H, 1, 1), 0, 1, dt)
    dKV_r = jnp.sum(eyeH4 * KV_r, axis=1)                 # (H, n_nl, B)
    dKV_i = jnp.sum(eyeH4 * KV_i, axis=1)
    dKA_r = jnp.sum(eyeH4 * KA_r, axis=1)
    dKA_i = jnp.sum(eyeH4 * KA_i, axis=1)
    eye_nl = _iota_eye((1, n_nl, n_nl, 1), 1, 2, dt)
    embed = lambda d: eye_nl * d[:, :, None, :]           # (H,n_nl,n_nl,B)
    pad_nl = ((0, 0), (m, 0), (m, 0), (0, 0))
    MV_r = bVr + jnp.pad(embed(dKV_r), pad_nl)
    MV_i = bVi + jnp.pad(embed(dKV_i), pad_nl)
    MA_r = bAr + jnp.pad(embed(dKA_r), pad_nl)
    MA_i = bAi + jnp.pad(embed(dKA_i), pad_nl)

    # fundamental power rows
    (dSdA_r, dSdA_i), (dSdV_r, dSdV_i) = _power_blocks(
        dims, Vcr, Vci, Vnr, Vni, Yr, Yi)

    # ---- D_all (H, 2n, 2n, B): block 0 cropped + identity-padded ----
    D0 = jnp.concatenate([
        jnp.concatenate([dSdA_r[1:m, 1:], dSdV_r[1:m, c:]], axis=1),
        jnp.concatenate([MA_r[0, m:, 1:], MV_r[0, m:, c:]], axis=1),
        jnp.concatenate([dSdA_i[c:m, 1:], dSdV_i[c:m, c:]], axis=1),
        jnp.concatenate([MA_i[0, m:, 1:], MV_i[0, m:, c:]], axis=1),
    ], axis=0)                                            # (d0, d0, B)
    eye2n = _iota_eye((k2, k2, 1), 0, 1, dt)
    D0p = jnp.concatenate([
        jnp.concatenate(
            [D0, jnp.broadcast_to(eye2n[:d0, d0:], (d0, k2 - d0, B))],
            axis=1),
        jnp.broadcast_to(eye2n[d0:], (k2 - d0, k2, B)),
    ], axis=0)                                            # (2n, 2n, B)
    Dh = jnp.concatenate([
        jnp.concatenate([MA_r[1:], MV_r[1:]], axis=2),
        jnp.concatenate([MA_i[1:], MV_i[1:]], axis=2),
    ], axis=1)                                            # (K, 2n, 2n, B)
    D_all = jnp.concatenate([D0p[None], Dh], axis=0)

    # ---- RHS: grouped mismatch + unit U-columns (iota-synthesized) ----
    f0 = jnp.concatenate(
        [f[:d0], jnp.zeros((k2 - d0, B), dt)], axis=0)    # (2n, B)
    fh = f[d0:].reshape(H - 1, k2, B)
    row2 = jax.lax.broadcasted_iota(jnp.int32, (k2, rb), 0)
    s2 = jax.lax.broadcasted_iota(jnp.int32, (k2, rb), 1)
    tgt0 = jnp.where(s2 < n_nl, (m - 1) + s2,
                     (m - 1) + n_nl + (m - c) + (s2 - n_nl))
    tgth = jnp.where(s2 < n_nl, m + s2, n + m + (s2 - n_nl))
    E0 = (row2 == tgt0).astype(dt)[:, :, None]            # (2n, rb, 1)
    Eh = (row2 == tgth).astype(dt)[:, :, None]
    rhs0 = jnp.concatenate(
        [f0[:, None, :], jnp.broadcast_to(E0, (k2, rb, B))], axis=1)
    rhsh = jnp.concatenate(
        [fh[:, :, None, :],
         jnp.broadcast_to(Eh[None], (H - 1, k2, rb, B))], axis=2)
    rhs_all = jnp.concatenate([rhs0[None], rhsh], axis=0)  # (H, 2n, R, B)

    sol = _solve_blocks(D_all, rhs_all, k2)               # (H, 2n, R, B)
    z = sol[:, :, 0, :]                                   # (H, 2n, B)
    X = sol[:, :, 1:, :]                                  # (H, 2n, rb, B)

    # ---- Woodbury capacitance system S = I + C·G (coupled only) ----
    if not dims.coupled or r == 0:
        return z

    # coupling coordinates are contiguous slices in grouped ordering
    a0, b0 = m - 1, (n - 1) + (m - c)
    Vz0 = jnp.concatenate([z[0, a0:a0 + n_nl], z[0, b0:b0 + n_nl]], axis=0)
    Vzh = jnp.concatenate([z[1:, m:n], z[1:, n + m:]], axis=1)
    VzS = jnp.concatenate([Vz0[None], Vzh], axis=0)       # (H, rb, B)
    G0 = jnp.concatenate([X[0, a0:a0 + n_nl], X[0, b0:b0 + n_nl]], axis=0)
    Gh = jnp.concatenate([X[1:, m:n], X[1:, n + m:]], axis=1)
    G = jnp.concatenate([G0[None], Gh], axis=0)           # (H, rb, rb, B)

    # C's nonzero pattern: rows (h, t, d), cols (p, s, d) with h != p;
    # values K(t,s)[h,p,d].  Contract over (s, d)-pairs without building C.
    off = 1.0 - eyeH4                                     # (H, H, 1, 1)
    Kts = ((KA_r * off, KV_r * off), (KA_i * off, KV_i * off))
    Gs = G.reshape(H, 2, n_nl, rb, B)                     # (p, s, d, v, B)
    VzSs = VzS.reshape(H, 2, n_nl, B)

    CG_t = []
    CVz_t = []
    for t in range(2):
        acc = jnp.zeros((H, H, n_nl, rb, B), dt)
        accv = jnp.zeros((H, n_nl, B), dt)
        for s_ in range(2):
            K_ = Kts[t][s_]                               # (H, H, n_nl, B)
            # NOTE: int index mixed with None lowers to a (>2D) gather in
            # Mosaic — slice with an int first, expand separately
            G_s = Gs[:, s_]                               # (H, n_nl, rb, B)
            Vz_s = VzSs[:, s_]                            # (H, n_nl, B)
            acc = acc + K_[:, :, :, None, :] * G_s[None]
            accv = accv + jnp.sum(K_ * Vz_s[None], axis=1)
        # rows (h, t, d), cols (p, v): reorder (h,p,d,v,B) -> (h,d,p,v,B)
        CG_t.append(acc.transpose(0, 2, 1, 3, 4))
        CVz_t.append(accv)
    CG = jnp.stack(CG_t, axis=1)                  # (H, 2, n_nl, H, rb, B)
    CG = CG.reshape(r, r, B)
    CVz = jnp.stack(CVz_t, axis=1).reshape(r, B)

    S_w = _iota_eye((r, r, 1), 0, 1, dt) + CG
    y = _solve_one(S_w, CVz[:, None, :], r)[:, 0, :]      # (r, B)

    yb = y.reshape(H, rb, B)
    corr = jnp.sum(X * yb[:, None, :, :], axis=2)         # (H, 2n, B)
    return z - corr


def _apply_update(dims: TripDims, Vm, Va, dx):
    """State update (grouped dx -> voltage tensors), hpfx.harmonic
    .update_harmonic_voltages in block layout."""
    n, c = dims.n, dims.c
    d0 = dims.d0
    Va0 = jnp.concatenate(
        [Va[0:1, 0:1], Va[0:1, 1:] - dx[0:1, 0:n - 1]], axis=1)
    Vm0 = jnp.concatenate(
        [Vm[0:1, 0:c], Vm[0:1, c:] - dx[0:1, n - 1:d0]], axis=1)
    Vah = Va[1:] - dx[1:, :n]
    Vmh = Vm[1:] - dx[1:, n:2 * n]
    return (jnp.concatenate([Vm0, Vmh], axis=0),
            jnp.concatenate([Va0, Vah], axis=0))


def _trip_kernel(dims: TripDims,
                 Vm_ref, Va_ref, f_ref, err_ref, act_ref, Sr_ref, Si_ref,
                 inj_ref, Yr_ref, Yi_ref, YNr_ref, YNi_ref, INr_ref,
                 INi_ref, *stable_refs_and_outs):
    """One full Newton trip for a 128-lane scenario slab."""
    n_stable = 7 if dims.L else 0
    stable_refs = stable_refs_and_outs[:n_stable]
    (Vm_out, Va_out, f_out, err_out) = stable_refs_and_outs[n_stable:]

    Vm, Va = Vm_ref[:], Va_ref[:]
    f, err, act = f_ref[:], err_ref[:], act_ref[:]
    inj = inj_ref[:]
    Yr, Yi = Yr_ref[:], Yi_ref[:]
    YNr, YNi = YNr_ref[:], YNi_ref[:]
    INr, INi = INr_ref[:], INi_ref[:]
    stable_args = None
    if dims.L:
        (Ysr_ref, Ysi_ref, dr_ref, di_ref, Mf_ref, Mt_ref, lp_ref) = \
            stable_refs
        stable_args = (Ysr_ref[:], Ysi_ref[:], dr_ref[:], di_ref[:],
                       Mf_ref[:], Mt_ref[:], lp_ref[:])

    dx = _newton_step(dims, Vm, Va, f, Yr, Yi, YNr, YNi, inj)
    Vm_new, Va_new = _apply_update(dims, Vm, Va, dx)
    f_new, err_new = _mismatch(dims, Vm_new, Va_new, Yr, Yi,
                               Sr_ref[:], Si_ref[:], YNr, YNi, INr, INi,
                               inj, stable_args)

    # predicated carry: inactive scenarios keep their state (same
    # semantics as the batched while_loop / hpfx.lanes masking)
    a3 = act[None]                                        # (1, 1, B)
    Vm_out[:] = a3 * Vm_new + (1.0 - a3) * Vm
    Va_out[:] = a3 * Va_new + (1.0 - a3) * Va
    f_out[:] = act * f_new + (1.0 - act) * f
    err_out[:] = act * err_new + (1.0 - act) * err


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------

class TripConsts(NamedTuple):
    """Per-sweep constant operands of the fused trip (all f32)."""
    Yr: jnp.ndarray
    Yi: jnp.ndarray
    YNr: jnp.ndarray
    YNi: jnp.ndarray
    INr: jnp.ndarray
    INi: jnp.ndarray
    # stable-mismatch line structure (empty (…, 0) arrays when unused)
    Ysr: jnp.ndarray
    Ysi: jnp.ndarray
    dr: jnp.ndarray
    di: jnp.ndarray
    Mf: jnp.ndarray
    Mt: jnp.ndarray
    lineP: jnp.ndarray


def make_trip_consts(Y, lineY, devices, net, settings, dtype=jnp.float32):
    """Build (TripDims, TripConsts) from the sweep's constant operands.

    ``Y`` is the (H, n, n) split-complex admittance (hpfx.ybus.build_ybus);
    ``lineY`` the optional LineYbus (stable mismatch); ``devices`` a
    stacked DeviceSet.  Operands are cast to ``dtype`` (f32 on hardware;
    f64 only for interpret-mode oracle tests).
    """
    H = Y.shape[0]
    n, m, c = net.n, net.m, net.c
    L = 0 if lineY is None else int(lineY.f_idx.shape[0])
    dims = TripDims(H=H, n=n, m=m, c=c, L=L, coupled=bool(devices.coupled))
    f32 = lambda x: jnp.asarray(x, dtype)
    dummy = jnp.zeros((1, 1), dtype)
    if L:
        # 0/1 incidence (n, L) built from (possibly traced) endpoint indices
        bus = jnp.arange(n)[:, None]
        Mf = (bus == lineY.f_idx[None, :]).astype(dtype)
        Mt = (bus == lineY.t_idx[None, :]).astype(dtype)
        lineP = jnp.stack([
            jnp.broadcast_to(f32(lineY.a_ff), (L,)),
            jnp.broadcast_to(f32(lineY.inv_tau), (L,)),
            jnp.broadcast_to(f32(lineY.shift), (L,))], axis=0)
        stable = dict(Ysr=f32(lineY.Ys.re), Ysi=f32(lineY.Ys.im),
                      dr=f32(lineY.d.re), di=f32(lineY.d.im),
                      Mf=jnp.asarray(Mf), Mt=jnp.asarray(Mt), lineP=lineP)
    else:
        stable = dict(Ysr=dummy, Ysi=dummy, dr=dummy, di=dummy,
                      Mf=dummy, Mt=dummy, lineP=dummy)
    consts = TripConsts(
        Yr=f32(Y.re), Yi=f32(Y.im),
        YNr=f32(devices.Y_N.re), YNi=f32(devices.Y_N.im),
        INr=f32(devices.I_N.re), INi=f32(devices.I_N.im), **stable)
    return dims, consts


def _vmem_estimate(dims: TripDims, B: int = LANES) -> int:
    """Rough peak-VMEM bound (bytes) of the kernel at lane-block B."""
    H, n, r = dims.H, dims.n, dims.r
    k2, R = 2 * n, 1 + dims.r_blk
    blocks = H * k2 * k2 * B          # D_all and the GJ carry copy
    rhs = H * k2 * R * B
    wood = 2 * r * r * B              # S and its GJ carry
    cg5 = dims.H * dims.H * dims.n_nl * dims.r_blk * B
    misc = 8 * H * n * n * B + 4 * dims.dim * B
    return 4 * (3 * blocks + 3 * rhs + wood + cg5 + misc)


def supports_fused(dims: TripDims) -> bool:
    """VMEM feasibility of the fused trip for this problem size."""
    return _vmem_estimate(dims) <= int(0.85 * VMEM_LIMIT)


def fused_trip(dims: TripDims, consts: TripConsts, Vm, Va, f, err, act,
               Sr, Si, inj, interpret: bool = False):
    """Run one fused Newton trip on lane-minor state.

    Vm/Va (H, n, B); f (dim, B) in GROUPED order; err (1, B); act (1, B)
    0/1 f32; Sr/Si (n, B); inj (1, B).  B must be a multiple of 128.
    Returns (Vm', Va', f', err').
    """
    H, n = dims.H, dims.n
    B = Vm.shape[-1]
    assert B % LANES == 0, B
    G = B // LANES
    dt = Vm.dtype

    def bcast(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd)

    def sliced(shape):
        nd = len(shape)
        return pl.BlockSpec(tuple(shape[:-1]) + (LANES,),
                            lambda i, nd=nd: (0,) * (nd - 1) + (i,))

    in_specs = [
        sliced(Vm.shape), sliced(Va.shape), sliced(f.shape),
        sliced(err.shape), sliced(act.shape), sliced(Sr.shape),
        sliced(Si.shape), sliced(inj.shape),
        bcast(consts.Yr.shape), bcast(consts.Yi.shape),
        bcast(consts.YNr.shape), bcast(consts.YNi.shape),
        bcast(consts.INr.shape), bcast(consts.INi.shape),
    ]
    args = [Vm, Va, f, err, act, Sr, Si, inj,
            consts.Yr, consts.Yi, consts.YNr, consts.YNi,
            consts.INr, consts.INi]
    if dims.L:
        for a in (consts.Ysr, consts.Ysi, consts.dr, consts.di,
                  consts.Mf, consts.Mt, consts.lineP):
            in_specs.append(bcast(a.shape))
            args.append(a)

    out_shape = [
        jax.ShapeDtypeStruct((G,) + Vm.shape[:-1] + (LANES,), dt),
        jax.ShapeDtypeStruct((G,) + Va.shape[:-1] + (LANES,), dt),
        jax.ShapeDtypeStruct((G,) + f.shape[:-1] + (LANES,), dt),
        jax.ShapeDtypeStruct((G,) + err.shape[:-1] + (LANES,), dt),
    ]
    # inputs address their grid slab through the lane axis; outputs get a
    # leading grid axis (collapsed after the call) so every out block is a
    # full VMEM-resident array
    out_specs = [
        pl.BlockSpec((None,) + Vm.shape[:-1] + (LANES,),
                     lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((None,) + Va.shape[:-1] + (LANES,),
                     lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((None,) + f.shape[:-1] + (LANES,),
                     lambda i: (i, 0, 0)),
        pl.BlockSpec((None,) + err.shape[:-1] + (LANES,),
                     lambda i: (i, 0, 0)),
    ]
    kernel = functools.partial(_trip_kernel, dims)
    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=(None if pltpu is None else
                         pltpu.CompilerParams(
                             vmem_limit_bytes=VMEM_LIMIT)),
    )(*args)
    Vm2, Va2, f2, err2 = outs
    # (G, ..., LANES) -> (..., G·LANES)
    fix = lambda x: jnp.moveaxis(x, 0, -2).reshape(x.shape[1:-1] + (B,))
    return fix(Vm2), fix(Va2), fix(f2), fix(err2)
