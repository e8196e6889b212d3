"""Reduction-structure A/B bench for the fused NE sweep (round 4).

The round-3 fused one-sweep kernel (design/fusedne.py) measured ~313
GB/s effective on v5e vs ~725 GB/s for one composed MXU pass, so fusing
the CG quad operator (2 passes -> 1) lost. This script times candidate
reduction structures for BOTH phases of the sweep on synthetic
device-generated hybrid blocks (no host design build), against the
composed two-pass path, to find the structure that moves the sweep to
the HBM bound:

phase A (t = X v, lane reduction)
  v1   : per-chunk ``jnp.sum(xk * vk, axis=1)`` (round-3 shape)
  wide : (r, 128) accumulator, 128-lane FMA slices, collapse once/panel

phase B (out = X' u, sublane reduction)
  v1    : per-chunk ``jnp.sum(xk * u, axis=0)`` into a (1, p_pad) block
  fold8 : (8, p_pad) accumulator, one FMA per 8-row group, no
          cross-sublane ops in the loop; final collapse outside
  mxu2  : (2, r) @ (r, chunk) bf16 MXU dot per chunk, u split into
          bf16 hi/lo rows (f32-ish accuracy, f32 accumulate)
  mxu3  : 3-way bf16 split (full f32 accuracy)
  mxuf  : f32 MXU dot (no split; Mosaic f32 matmul)

f32-stored blocks never take the bf16 mxu modes (lossy); they fall back
to fold8 in those variants.

Usage: python -m baselines.dev_ne_variants [--n N] [--pe PE] [--pf PF]
           [--variants v1:v1,wide:fold8,...] [--reps R] [--chain K]
           [--budget MB]
"""

import argparse
import contextlib
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 1024
LANES = 128
_SUBLANE = {1: 32, 2: 16, 4: 8}


def _ceil_to(x, m):
    return -(-x // m) * m


def plan(n, widths_dtypes, budget):
    items = [jnp.dtype(dt).itemsize for _, dt in widths_dtypes]
    sub = max(_SUBLANE[it] for it in items)
    pads = [_ceil_to(max(p, 1), CHUNK) for p, _ in widths_dtypes]
    row_bytes = sum(p_pad * it for p_pad, it in zip(pads, items))
    r = max(sub, budget // row_bytes // sub * sub)
    r = min(r, _ceil_to(max(n, 1), sub))
    grid = -(-max(n, 1) // r)
    blocks = [(p_pad, p // CHUNK, p - (p // CHUNK) * CHUNK)
              for p_pad, (p, _) in zip(pads, widths_dtypes)]
    return r, grid, blocks


def _phase_a(x_ref, v_ref, n_full, rem, fp, r, a_mode, sc_ref=None):
    """Returns this block's (r, 1) contribution to t. With sc_ref, the
    converted f32 chunks are staged to VMEM scratch so phase B reads
    them back without re-converting."""
    f32 = jnp.float32
    if a_mode == 'v1':
        def body(k, acc):
            off = pl.multiple_of(k * CHUNK, CHUNK)
            xk = x_ref[:, pl.ds(off, CHUNK)].astype(f32)
            if sc_ref is not None:
                sc_ref[:, pl.ds(off, CHUNK)] = xk
            return acc + jnp.sum(xk * v_ref[:, pl.ds(off, CHUNK)],
                                 axis=1, keepdims=True)
        t = jax.lax.fori_loop(0, n_full, body, jnp.zeros((r, 1), f32))
        if rem:
            xk = x_ref[:, n_full * CHUNK:(n_full + 1) * CHUNK].astype(f32)
            if fp:
                lane = jax.lax.broadcasted_iota(jnp.int32, (r, CHUNK), 1)
                xk = jnp.where(lane < rem, xk, 0.0)
            if sc_ref is not None:
                sc_ref[:, n_full * CHUNK:(n_full + 1) * CHUNK] = xk
            t = t + jnp.sum(
                xk * v_ref[:, n_full * CHUNK:(n_full + 1) * CHUNK],
                axis=1, keepdims=True)
        return t
    if a_mode == 'chunkwide':
        # Per-chunk (r, LANES) temp (no wide loop carry), FMA slices,
        # one cross-lane collapse per CHUNK.
        def body(k, t):
            off = pl.multiple_of(k * CHUNK, CHUNK)
            xk = x_ref[:, pl.ds(off, CHUNK)].astype(f32)
            vk = v_ref[:, pl.ds(off, CHUNK)]
            acc = xk[:, :LANES] * vk[:, :LANES]
            for j in range(1, CHUNK // LANES):
                acc = acc + xk[:, j * LANES:(j + 1) * LANES] \
                    * vk[:, j * LANES:(j + 1) * LANES]
            return t + jnp.sum(acc, axis=1, keepdims=True)
        t = jax.lax.fori_loop(0, n_full, body, jnp.zeros((r, 1), f32))
        if rem:
            xk = x_ref[:, n_full * CHUNK:(n_full + 1) * CHUNK].astype(f32)
            if fp:
                lane = jax.lax.broadcasted_iota(jnp.int32, (r, CHUNK), 1)
                xk = jnp.where(lane < rem, xk, 0.0)
            t = t + jnp.sum(
                xk * v_ref[:, n_full * CHUNK:(n_full + 1) * CHUNK],
                axis=1, keepdims=True)
        return t
    if a_mode == 'reshape':
        # Per-chunk reshape (r, 8, LANES) -> sum middle axis.
        def body(k, t):
            off = pl.multiple_of(k * CHUNK, CHUNK)
            xk = x_ref[:, pl.ds(off, CHUNK)].astype(f32)
            prod = xk * v_ref[:, pl.ds(off, CHUNK)]
            folded = prod.reshape(r, CHUNK // LANES, LANES).sum(axis=1)
            return t + jnp.sum(folded, axis=1, keepdims=True)
        t = jax.lax.fori_loop(0, n_full, body, jnp.zeros((r, 1), f32))
        if rem:
            xk = x_ref[:, n_full * CHUNK:(n_full + 1) * CHUNK].astype(f32)
            if fp:
                lane = jax.lax.broadcasted_iota(jnp.int32, (r, CHUNK), 1)
                xk = jnp.where(lane < rem, xk, 0.0)
            t = t + jnp.sum(
                xk * v_ref[:, n_full * CHUNK:(n_full + 1) * CHUNK],
                axis=1, keepdims=True)
        return t
    if a_mode == 'mxd2a':
        # Direct s8 lhs into the MXU: no explicit astype — Mosaic may
        # lower the mixed s8 x bf16 contraction with the convert in the
        # MXU feed path (what XLA's fused convert-dot achieves).
        def split_v(vk):
            hi = vk.astype(jnp.bfloat16)
            lo = (vk - hi.astype(f32)).astype(jnp.bfloat16)
            return jnp.concatenate([hi, lo], axis=0)
        def body(k, acc):
            off = pl.multiple_of(k * CHUNK, CHUNK)
            xk = x_ref[:, pl.ds(off, CHUNK)]
            if fp:
                xk = xk.astype(jnp.bfloat16)
            vk = split_v(v_ref[:, pl.ds(off, CHUNK)])
            d = jax.lax.dot_general(
                xk, vk, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            return acc + jnp.sum(d, axis=1, keepdims=True)
        t = jax.lax.fori_loop(0, n_full, body, jnp.zeros((r, 1), f32))
        if rem:
            xk = x_ref[:, n_full * CHUNK:(n_full + 1) * CHUNK] \
                .astype(f32)
            if fp:
                lane = jax.lax.broadcasted_iota(jnp.int32, (r, CHUNK), 1)
                xk = jnp.where(lane < rem, xk, 0.0)
            t = t + jnp.sum(
                xk * v_ref[:, n_full * CHUNK:(n_full + 1) * CHUNK],
                axis=1, keepdims=True)
        return t
    if a_mode in ('mxu2a', 'mxu1a'):
        # MXU phase A: per chunk, dot_general contracting the lane dim
        # — (r, CHUNK) bf16 @ (k, CHUNK) bf16 -> (r, k) f32, where the
        # rhs rows are a bf16 hi/lo split of v (k=2, f32-level
        # accuracy) or plain bf16 (k=1, lossy bound check). The panel
        # is read from VMEM by the MXU, so the VPU only does the
        # int8->bf16 convert.
        nsplit = 2 if a_mode == 'mxu2a' else 1
        def split_v(vk):
            hi = vk.astype(jnp.bfloat16)
            if nsplit == 1:
                return hi.reshape(1, -1)
            lo = (vk - hi.astype(f32)).astype(jnp.bfloat16)
            return jnp.concatenate([hi, lo], axis=0)
        def body(k, acc):
            off = pl.multiple_of(k * CHUNK, CHUNK)
            xk = x_ref[:, pl.ds(off, CHUNK)].astype(jnp.bfloat16)
            vk = split_v(v_ref[:, pl.ds(off, CHUNK)])
            d = jax.lax.dot_general(
                xk, vk, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            return acc + jnp.sum(d, axis=1, keepdims=True)
        t = jax.lax.fori_loop(0, n_full, body, jnp.zeros((r, 1), f32))
        if rem:
            xk = x_ref[:, n_full * CHUNK:(n_full + 1) * CHUNK] \
                .astype(f32)
            if fp:
                lane = jax.lax.broadcasted_iota(jnp.int32, (r, CHUNK), 1)
                xk = jnp.where(lane < rem, xk, 0.0)
            vk = split_v(v_ref[:, n_full * CHUNK:(n_full + 1) * CHUNK])
            d = jax.lax.dot_general(
                xk.astype(jnp.bfloat16), vk, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            t = t + jnp.sum(d, axis=1, keepdims=True)
        return t
    # wide: (r, LANES) accumulator carried across chunks, FMA slices,
    # collapse once per panel.
    def body(k, acc):
        off = pl.multiple_of(k * CHUNK, CHUNK)
        xk = x_ref[:, pl.ds(off, CHUNK)].astype(f32)
        vk = v_ref[:, pl.ds(off, CHUNK)]
        for j in range(CHUNK // LANES):
            acc = acc + xk[:, j * LANES:(j + 1) * LANES] \
                * vk[:, j * LANES:(j + 1) * LANES]
        return acc
    acc = jax.lax.fori_loop(0, n_full, body,
                            jnp.zeros((r, LANES), f32))
    if rem:
        xk = x_ref[:, n_full * CHUNK:(n_full + 1) * CHUNK].astype(f32)
        if fp:
            lane = jax.lax.broadcasted_iota(jnp.int32, (r, CHUNK), 1)
            xk = jnp.where(lane < rem, xk, 0.0)
        vk = v_ref[:, n_full * CHUNK:(n_full + 1) * CHUNK]
        for j in range(CHUNK // LANES):
            acc = acc + xk[:, j * LANES:(j + 1) * LANES] \
                * vk[:, j * LANES:(j + 1) * LANES]
    return jnp.sum(acc, axis=1, keepdims=True)


def _phase_b(x_ref, out_ref, u, row, n_rows, n_full, rem, fp, r, b_mode,
             first, sc_ref=None):
    """out_ref += X' u for this panel; out_ref rows depend on b_mode.
    With sc_ref, chunks are read back from the f32 scratch staged by
    phase A instead of re-converting from the stored panel."""
    f32 = jnp.float32
    nc = n_full + (1 if rem else 0)

    def load(k_off):
        if sc_ref is not None:
            return sc_ref[:, k_off]
        return x_ref[:, k_off].astype(f32)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    if b_mode in ('mxu2', 'mxu3') and not fp:
        u_hi = u.astype(jnp.bfloat16)
        parts = [u_hi]
        resid = u - u_hi.astype(f32)
        if b_mode == 'mxu3':
            u_mid = resid.astype(jnp.bfloat16)
            parts.append(u_mid)
            resid = resid - u_mid.astype(f32)
        parts.append(resid.astype(jnp.bfloat16))
        ut = jnp.concatenate(parts, axis=1).T  # (k_splits, r) bf16

        def body(k, c):
            off = pl.multiple_of(k * CHUNK, CHUNK)
            xk = x_ref[:, pl.ds(off, CHUNK)].astype(jnp.bfloat16)
            d = jax.lax.dot_general(
                ut, xk, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            out_ref[:, pl.ds(off, CHUNK)] += d
            return c
        jax.lax.fori_loop(0, nc, body, 0)
        return

    if b_mode == 'mxuf':
        utf = u.T  # (1, r) f32

        def body(k, c):
            off = pl.multiple_of(k * CHUNK, CHUNK)
            xk = x_ref[:, pl.ds(off, CHUNK)].astype(f32)
            if fp:
                xk = jnp.where(row < n_rows, xk, 0.0)
            d = jax.lax.dot_general(
                utf, xk, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            out_ref[:, pl.ds(off, CHUNK)] += d
            return c
        jax.lax.fori_loop(0, nc, body, 0)
        return

    if b_mode == 'v1':
        def body(k, c):
            off = pl.multiple_of(k * CHUNK, CHUNK)
            xk = load(pl.ds(off, CHUNK))
            if fp:
                xk = jnp.where(row < n_rows, xk, 0.0)
            out_ref[:, pl.ds(off, CHUNK)] += jnp.sum(
                xk * u, axis=0, keepdims=True)
            return c
        jax.lax.fori_loop(0, nc, body, 0)
        return

    # fold8: (8, p_pad) accumulator, one FMA per 8-row group.
    def body(k, c):
        off = pl.multiple_of(k * CHUNK, CHUNK)
        xk = load(pl.ds(off, CHUNK))
        if fp:
            xk = jnp.where(row < n_rows, xk, 0.0)
        acc8 = out_ref[:, pl.ds(off, CHUNK)]
        for g in range(r // 8):
            acc8 = acc8 + xk[g * 8:(g + 1) * 8, :] * u[g * 8:(g + 1) * 8, :]
        out_ref[:, pl.ds(off, CHUNK)] = acc8
        return c
    jax.lax.fori_loop(0, nc, body, 0)


_B_ROWS = {'v1': 1, 'fold8': 8, 'mxu2': 2, 'mxu3': 3, 'mxuf': 1}


def make_fused(a_mode, b_mode, budget):
    """Returns fused(Xe, Xf, ve, vf, c, w) -> (out_e, out_f, u)."""

    @jax.jit
    def fused(Xe, Xf, ve, vf, c, w):
        blocks = [(Xe, ve), (Xf, vf)]
        n = Xe.shape[0]
        r, grid, plans = plan(
            n, [(X.shape[1], X.dtype) for X, _ in blocks], budget)
        f32 = jnp.float32
        n_pad = grid * r
        v_pads = [jnp.zeros((1, p_pad), f32).at[0, :X.shape[1]].set(
            v.astype(f32)) for (X, v), (p_pad, _, _) in zip(blocks, plans)]
        c_pad = jnp.zeros((n_pad, 1), f32).at[:n, 0].set(c)
        w_pad = jnp.zeros((n_pad, 1), f32).at[:n, 0].set(w)
        fps = [bool(jnp.issubdtype(X.dtype, jnp.floating))
               for X, _ in blocks]
        b_modes = [b_mode if (not fp or b_mode in ('v1', 'mxuf'))
                   else 'fold8' for fp in fps]
        use_scratch = a_mode.endswith('s')
        a_base = a_mode[:-1] if use_scratch else a_mode
        # bf16 MXU phase A is exact only for the int8 block; the f32
        # block keeps the VPU reduce.
        a_modes = [a_base if not (fp and a_base.startswith(('mxu', 'mxd')))
                   else 'v1' for fp in fps]

        def kernel(xe_ref, xf_ref, ve_ref, vf_ref, c_ref, w_ref,
                   oe_ref, of_ref, u_ref, *sc_refs):
            i = pl.program_id(0)
            row = i * r + jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
            x_refs = [xe_ref, xf_ref]
            v_refs = [ve_ref, vf_ref]
            o_refs = [oe_ref, of_ref]
            scs = list(sc_refs) if sc_refs else [None, None]
            t = c_ref[:]
            for b in range(2):
                p_pad, n_full, rem = plans[b]
                t = t + _phase_a(x_refs[b], v_refs[b], n_full, rem,
                                 fps[b], r, a_modes[b], sc_ref=scs[b])
            u = jnp.where(row < n, w_ref[:] * t, 0.0)
            u_ref[:] = u
            for b in range(2):
                p_pad, n_full, rem = plans[b]
                _phase_b(x_refs[b], o_refs[b], u, row, n, n_full, rem,
                         fps[b], r, b_modes[b], i == 0, sc_ref=scs[b])

        x_specs = [pl.BlockSpec((r, p_pad), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
                   for p_pad, _, _ in plans]
        v_specs = [pl.BlockSpec((1, p_pad), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
                   for p_pad, _, _ in plans]
        col_spec = pl.BlockSpec((r, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_specs, out_shapes = [], []
        for bm, (p_pad, _, _) in zip(b_modes, plans):
            rows = _B_ROWS[bm]
            out_specs.append(pl.BlockSpec((rows, p_pad),
                                          lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
            out_shapes.append(jax.ShapeDtypeStruct((rows, p_pad), f32))
        out_specs.append(col_spec)
        out_shapes.append(jax.ShapeDtypeStruct((n_pad, 1), f32))
        scratch_shapes = [pltpu.VMEM((r, p_pad), f32)
                          for p_pad, _, _ in plans] if use_scratch else []
        with jax.enable_x64(False):
            oe, of, u = pl.pallas_call(
                kernel,
                grid=(grid,),
                in_specs=x_specs + v_specs + [col_spec] * 2,
                out_specs=tuple(out_specs),
                out_shape=tuple(out_shapes),
                scratch_shapes=scratch_shapes,
                cost_estimate=pl.CostEstimate(
                    flops=4 * n * sum(X.shape[1] for X, _ in blocks),
                    bytes_accessed=sum(
                        X.size * X.dtype.itemsize for X, _ in blocks),
                    transcendentals=0),
                # The f32 scratch panel blows the 16M default scoped-vmem
                # budget (r=64 rows x 50k cols x 4B = 12.8M + panel +
                # outputs); v5e has 128M VMEM, so raise the cap.
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=(100 << 20) if use_scratch else None),
            )(Xe, Xf, *v_pads, c_pad, w_pad)
        out_e = oe.sum(axis=0)[:Xe.shape[1]]
        out_f = of.sum(axis=0)[:Xf.shape[1]]
        return out_e, out_f, u[:n, 0]

    return fused


def make_probe(kind, budget):
    """Bandwidth probe through the SAME grid/BlockSpec pipeline shape as
    the fused kernel, isolating where the 235 GB/s cap comes from:
      i32 : i32 panel, wide i32 adds (4 bytes per lane-op)  -> DMA bound
      cvt : s8 panel, astype(f32) + wide f32 adds (1 B/op)  -> convert
      mul : s8 panel, convert + multiply + wide adds        -> + FMA
    """

    @jax.jit
    def run(X, seed):
        # `seed` (a carried f32 scalar) initializes the accumulator, so
        # chained calls form a REAL dependency — without it the scan
        # body is loop-invariant and XLA hoists the pallas_call out of
        # the timing loop (the round-4 first-cut probes reported
        # 1.3+ TB/s on a 819 GB/s part this way).
        n, p = X.shape
        r, grid, plans = plan(n, [(p, X.dtype)], budget)
        p_pad, n_full, rem = plans[0]
        f32 = jnp.float32
        acc_dt = jnp.int32 if kind == 'i32' else f32
        seed_pad = jnp.full((1, 1), seed, f32)

        def kernel(s_ref, x_ref, v_ref, o_ref):
            def body(k, acc):
                off = pl.multiple_of(k * CHUNK, CHUNK)
                xk = x_ref[:, pl.ds(off, CHUNK)]
                if kind != 'i32':
                    xk = xk.astype(f32)
                if kind == 'mul':
                    xk = xk * v_ref[:, pl.ds(off, CHUNK)]
                for j in range(CHUNK // LANES):
                    acc = acc + xk[:, j * LANES:(j + 1) * LANES]
                return acc
            nc = n_full + (1 if rem else 0)
            init = jnp.full((r, LANES), s_ref[0, 0].astype(acc_dt))
            acc = jax.lax.fori_loop(0, nc, body, init)
            o_ref[:] = jnp.sum(acc, axis=1, keepdims=True).astype(f32)

        v_pad = jnp.zeros((1, p_pad), f32)
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((r, p_pad), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, p_pad), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((r, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid * r, 1), f32),
            cost_estimate=pl.CostEstimate(
                flops=n * p, bytes_accessed=X.size * X.dtype.itemsize,
                transcendentals=0),
        )(seed_pad, X, v_pad)
        return jnp.sum(out)

    return run


def probe_time(fn, X, chain, reps):
    @jax.jit
    def run(X):
        def body(s, _):
            return fn(X, s * 1e-30), 0.
        s, _ = jax.lax.scan(body, 0., None, length=chain)
        return s
    float(run(X))
    times = []
    for _ in range(reps):
        tic = time.time()
        float(run(X))
        times.append((time.time() - tic) / chain)
    return float(np.median(times))


def run_probes(args):
    n = args.n
    gb_target = 2.0
    p8 = _ceil_to(int(gb_target * 1e9 / n), CHUNK)
    key = jax.random.PRNGKey(0)
    X8 = jax.random.bernoulli(key, 0.5, (n, p8)).astype(jnp.int8)
    X32 = jax.lax.bitcast_convert_type(
        X8.reshape(n, p8 // 4, 4), jnp.int32)
    jax.block_until_ready((X8, X32))
    print(f"probes: n={n} p8={p8} bytes={n*p8/1e9:.2f} GB "
          f"budget={args.budget}MiB", flush=True)
    for kind, X in (('i32', X32), ('cvt', X8), ('mul', X8)):
        fn = make_probe(kind, args.budget << 20)
        try:
            t = probe_time(fn, X, args.chain, args.reps)
            print(f"  {kind:>4}: {t*1e3:7.2f} ms  "
                  f"{n*p8/1e9/t:6.0f} GB/s", flush=True)
        except Exception as e:
            print(f"  {kind:>4}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


def make_presolve(kind):
    """Presolve-reduction A/B: the Gibbs pre-solve needs, per block,
    X'u1, X'u2, X'u3 and (X.X)'u3 (Jacobi second moment). Candidates:
      fused    : the shipped one-sweep Pallas kernel (fused_tdots)
      mrhs     : ONE composed multi-RHS MXU dot per block — X' @ [u1
                 u2 u3] — plus (Xf.Xf)'u3 for the float block; the
                 binary exact block's second moment is its own first
                 moment (0/1 idempotence), i.e. column 3 reused.
      mrhs_sq  : mrhs with a PRESTORED f32 Xf^2 (isolates whether XLA
                 reads (Xf*Xf) fused into the dot or materializes a
                 2 GB transient)
      seq4     : the legacy composed layout — four separate matvecs
    Returns f(Xe, Xf, Xf2, u1, u2, u3) -> 8 p-vectors."""
    from bayesbridge_tpu.design import fusedne

    @jax.jit
    def run(Xe, Xf, Xf2, u1, u2, u3):
        if kind == 'fused':
            (e1, e2, e3, esq), (f1, f2, f3, fsq) = fusedne.fused_tdots(
                (Xe, Xf), u1, u2, u3)
            return e1, e2, e3, esq, f1, f2, f3, fsq
        Xb = Xe.astype(jnp.bfloat16)
        if kind == 'seq4':
            e1, f1 = Xb.T @ u1, Xf.T @ u1
            e2, f2 = Xb.T @ u2, Xf.T @ u2
            e3, f3 = Xb.T @ u3, Xf.T @ u3
            fsq = (Xf * Xf).T @ u3
            return e1, e2, e3, e3, f1, f2, f3, fsq
        U = jnp.stack([u1, u2, u3], axis=1)
        if kind in ('mrhs_hi', 'mrhs_high'):
            # Wide (rhs > 1) dots on the MXU chain their partial sums
            # through bf16 at any precision short of HIGHEST — measured
            # 1.9e-3 rel err that an explicit bf16 hi/lo RHS split with
            # preferred_element_type=f32 does NOT fix (the rounding is
            # in the accumulator, not the operands), while the width-1
            # matvec emitter is f32-accurate (1.3e-7). HIGHEST
            # (multi-pass decomposition, f32 combination) measures
            # 9.6e-7 at the same single HBM pass.
            prec = jax.lax.Precision.HIGHEST if kind == 'mrhs_hi' \
                else jax.lax.Precision.HIGH
            Re = jax.lax.dot_general(
                Xb, U, (((0,), (0,)), ((), ())), precision=prec,
                preferred_element_type=jnp.float32)
            Rf = jax.lax.dot_general(
                Xf, U, (((0,), (0,)), ((), ())), precision=prec,
                preferred_element_type=jnp.float32)
        else:
            Re = Xb.T @ U
            Rf = Xf.T @ U
        if kind == 'mrhs_sq':
            fsq = Xf2.T @ u3
        else:
            fsq = (Xf * Xf).T @ u3
        return (Re[:, 0], Re[:, 1], Re[:, 2], Re[:, 2],
                Rf[:, 0], Rf[:, 1], Rf[:, 2], fsq)

    return run


def presolve_time(fn, Xe, Xf, Xf2, u1, u2, u3, chain, reps):
    @jax.jit
    def run(Xe, Xf, Xf2, u1, u2, u3):
        def body(carry, _):
            a1, a2, a3 = carry
            outs = fn(Xe, Xf, Xf2, a1, a2, a3)
            s = sum(jnp.sum(o) for o in outs) * 1e-30
            return (a1 + s, a2 + s, a3 + s), 0.
        (a1, a2, a3), _ = jax.lax.scan(
            body, (u1, u2, u3), None, length=chain)
        return jnp.sum(a1) + jnp.sum(a2) + jnp.sum(a3)
    float(run(Xe, Xf, Xf2, u1, u2, u3))
    times = []
    for _ in range(reps):
        tic = time.time()
        float(run(Xe, Xf, Xf2, u1, u2, u3))
        times.append((time.time() - tic) / chain)
    return float(np.median(times))


def run_presolve(args):
    n, pe, pf = args.n, int(str(args.pe).split(',')[0]), \
        int(str(args.pf).split(',')[0])
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    Xe = jax.random.bernoulli(ks[0], 0.5, (n, pe)).astype(jnp.int8)
    Xf = jax.random.normal(ks[1], (n, pf), jnp.float32)
    Xf2 = Xf * Xf
    u1 = jax.random.normal(ks[2], (n,), jnp.float32)
    u2 = jax.random.normal(ks[3], (n,), jnp.float32)
    u3 = jax.random.uniform(ks[4], (n,), jnp.float32) + .1
    jax.block_until_ready((Xe, Xf, Xf2))
    gb = (Xe.size + Xf.size * 4) / 1e9
    print(f"presolve A/B: n={n} pe={pe} pf={pf} stored={gb:.2f} GB",
          flush=True)
    # Width-1 matvec oracle, one jit per column: the single-rhs TPU
    # matvec emitter is f32-accurate (1.3e-7, measured) and separate
    # programs cannot be dot-merged; pulling the multi-GB blocks to
    # host for a NumPy f64 oracle hangs on the tunnel.
    mv = jax.jit(lambda X, u: X.astype(jnp.bfloat16).T
                 @ u if X.dtype == jnp.int8 else X.T @ u)
    mv_sq = jax.jit(lambda X, u: (X * X).T @ u)
    ref = [np.asarray(mv(Xe, u), np.float64) for u in (u1, u2, u3)]
    ref.append(ref[2])  # binary block: squares == values
    ref += [np.asarray(mv(Xf, u), np.float64) for u in (u1, u2, u3)]
    ref.append(np.asarray(mv_sq(Xf, u3), np.float64))
    for kind in ('mrhs_high', 'mrhs_hi', 'mrhs', 'fused', 'seq4'):
        fn = make_presolve(kind)
        print(f"compiling {kind} ...", flush=True)
        try:
            got = fn(Xe, Xf, Xf2, u1, u2, u3)
            errs = [float(np.max(np.abs(np.asarray(g, np.float64) - rr))
                          / (np.max(np.abs(rr)) + 1e-30))
                    for g, rr in zip(got, ref)]
            err = max(errs)
            t = presolve_time(fn, Xe, Xf, Xf2, u1, u2, u3,
                              args.chain, args.reps)
            print(f"{kind:>9} {t*1e3:8.2f} ms  {gb/t:6.0f} GB/s_1sweep"
                  f"  rel_err {err:9.1e}  per-out "
                  + ' '.join(f'{e:.0e}' for e in errs), flush=True)
        except Exception as e:
            print(f"{kind:>9} FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


@jax.jit
def composed(Xe, Xf, ve, vf, c, w):
    # bf16 MXU operand for the int8 block, exactly like the hybrid
    # backend (`sparse.py _exact_block` + main_dot/main_Tdot): the
    # convert fuses into the dot, no widened copy of Xe materializes.
    # (An f32 astype here risks an 18 GB f32 copy — over HBM.)
    Xb = Xe.astype(jnp.bfloat16)
    t = Xb @ ve + Xf @ vf + c
    u = w * t
    return Xb.T @ u, Xf.T @ u, u


def chain_time(fn, Xe, Xf, ve, vf, c, w, chain, reps):
    # X/c/w enter as jit ARGUMENTS: closing over them embeds 6.5 GB of
    # constants in the HLO, which the axon remote-compile tunnel must
    # then upload per variant.
    @functools.partial(jax.jit, static_argnums=())
    def run(Xe, Xf, ve, vf, c, w):
        def body(carry, _):
            cve, cvf = carry
            oe, of, u = fn(Xe, Xf, cve, cvf, c, w)
            oe = oe / jnp.maximum(jnp.linalg.norm(oe), 1e-30)
            of = of / jnp.maximum(jnp.linalg.norm(of), 1e-30)
            return (oe, of), 0.
        (oe, of), _ = jax.lax.scan(body, (ve, vf), None, length=chain)
        return jnp.sum(oe) + jnp.sum(of)
    float(run(Xe, Xf, ve, vf, c, w))
    times = []
    for _ in range(reps):
        tic = time.time()
        float(run(Xe, Xf, ve, vf, c, w))
        times.append((time.time() - tic) / chain)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=100_000)
    ap.add_argument('--pe', default='45000',
                    help='comma list of exact-block widths')
    ap.add_argument('--pf', default='5000',
                    help='comma list of float-block widths (zipped)')
    ap.add_argument('--reps', type=int, default=5)
    ap.add_argument('--chain', type=int, default=20)
    ap.add_argument('--budget', type=int, default=4,
                    help='per-step X panel VMEM budget, MiB')
    ap.add_argument('--variants', default='v1:v1,wide:v1,wide:fold8,'
                    'wide:mxu2,wide:mxu3,wide:mxuf')
    ap.add_argument('--probe', action='store_true',
                    help='run stream/convert bandwidth probes only')
    ap.add_argument('--presolve', action='store_true',
                    help='A/B the presolve-reduction structures only')
    args = ap.parse_args()

    if args.probe:
        run_probes(args)
        return
    if args.presolve:
        run_presolve(args)
        return

    pes = [int(x) for x in str(args.pe).split(',')]
    pfs = [int(x) for x in str(args.pf).split(',')]
    for pe, pf in zip(pes, pfs):
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 6)
        # bernoulli->int8 cast on device: a direct int8 randint hangs
        # the experimental axon runtime (cf. its int4-transfer hang).
        Xe = jax.random.bernoulli(ks[0], 0.5, (args.n, pe)) \
            .astype(jnp.int8)
        Xf = jax.random.normal(ks[1], (args.n, pf), jnp.float32)
        ve = jax.random.normal(ks[2], (pe,), jnp.float32) / pe**.5
        vf = jax.random.normal(ks[3], (pf,), jnp.float32) / pf**.5
        c = jax.random.normal(ks[4], (args.n,), jnp.float32) * .1
        w = jax.random.uniform(ks[5], (args.n,), jnp.float32) + .1
        jax.block_until_ready((Xe, Xf))
        gb = (Xe.size + Xf.size * 4) / 1e9
        print(f"n={args.n} pe={pe} pf={pf} stored={gb:.2f} GB "
              f"budget={args.budget}MiB backend={jax.default_backend()}",
              flush=True)

        print("timing composed ...", flush=True)
        t_comp = chain_time(composed, Xe, Xf, ve, vf, c, w,
                            args.chain, args.reps)
        ref = composed(Xe, Xf, ve, vf, c, w)
        print(f"{'variant':>14} {'ms':>8} {'GB/s_1sweep':>11} "
              f"{'vs_2pass':>8} {'rel_err':>9}", flush=True)
        print(f"{'composed':>14} {t_comp*1e3:8.2f} {2*gb/t_comp:11.0f} "
              f"{'1.00x':>8} {'-':>9}", flush=True)

        for spec in args.variants.split(','):
            a_mode, b_mode = spec.split(':')
            fn = make_fused(a_mode, b_mode, args.budget << 20)
            print(f"compiling {spec} ...", flush=True)
            try:
                got = fn(Xe, Xf, ve, vf, c, w)
                err = max(float(jnp.max(jnp.abs(g - rr))
                                / (jnp.max(jnp.abs(rr)) + 1e-30))
                          for g, rr in zip(got, ref))
                t = chain_time(fn, Xe, Xf, ve, vf, c, w,
                               args.chain, args.reps)
                print(f"{spec:>14} {t*1e3:8.2f} {gb/t:11.0f} "
                      f"{t_comp/t:7.2f}x {err:9.1e}", flush=True)
            except Exception as e:
                import traceback
                with open(f"/tmp/dev_ne_err_{spec.replace(':', '_')}"
                          f"_{pe}.txt", 'w') as fh:
                    fh.write(traceback.format_exc())
                print(f"{spec:>14} FAILED: {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == '__main__':
    main()
