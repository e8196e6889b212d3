"""Fused normal-equations matvec over dense-stored design blocks.

Every CG iteration applies the conditional-precision operator
``Phi x = prior_prec * x + X' diag(w) (X x)``; the reference evaluates
the design part as two separate sparse matvecs (reference:
bayesbridge/reg_coef_sampler/cg_sampler.py:104-113, each dispatching to
the MKL CSR matvec, mkl_matvec.py:17-56). On TPU both passes are
HBM-bound streams over the same stored arrays, so this kernel computes

    t   = sum_b B_b v_b + c    (phase A: lane-reduce each panel)
    u   = w * t
    out_b = B_b' u             (phase B: sublane-reduce the SAME panels)

with every block read from HBM exactly once — each grid step holds one
(R, p_pad) row panel per block in VMEM and runs both phases on it,
accumulating each ``out_b`` in a VMEM-resident output block. For the
hybrid design (one narrow int8/bf16 exact block + one f32 float block)
the two-block form makes the whole operator application a single sweep
of the stored design, halving the dominant HBM stream that sets the
sampler's throughput at headline scale (BASELINE.md roofline).

Storage dtypes int8/bf16/f32 up-convert chunk-by-chunk on the VPU, so
HBM traffic stays at the stored width — the same fused-up-convert
contract as the unfused hybrid matmuls (`sparse.py _exact_block`). Both
reductions are plain multiply-adds on the VPU: a matvec has no MXU-sized
second operand, and at one pass per byte the kernel is bandwidth-bound,
not FLOP-bound.

Reduction shape (round-4 measured dead end): restructured reductions
were A/B-timed on the v5e against this kernel's shape
(``baselines/dev_ne_variants.py``): wide (r, 128) phase-A accumulators
with one lane collapse per panel, per-chunk 8-sublane phase-B folds,
bf16-split MXU dots for either phase, and a convert-once-to-VMEM
scratch. Every variant that compiled timed within noise of this shape
(8.3 ms for a 1.95 GB sweep, ~235 GB/s) or slower (MXU variants 11-12
ms: chunk-width dots with 1-3-wide outputs waste the systolic array);
the wide phase-A accumulator fails Mosaic layout verification and the
f32 scratch panel exceeds the terminal's fixed 16 MiB scoped-vmem cap.
The sweep is VPU-bound at ~5 ops/element (s8 unpack+convert, multiply,
reduce in each phase) — only an MXU feed path that converts s8 in the
dot (what XLA's convert-fused ``dot_general`` emits, ~755 GB/s) beats
it, and Pallas/Mosaic cannot express that today. Hence the dispatch
policy below: fusing pays only where one sweep replaces >= 3 composed
passes.

Padding contract: ``v_b``/``c``/``w`` are zero-padded by the wrapper;
block regions beyond the stored array hold UNDEFINED bits, so phase A
masks the ragged lane tail (NaN bit patterns would otherwise poison
``0 * x``) and ``u`` is masked past the true row count. Phase B needs no
lane mask: garbage lanes only accumulate into padded output lanes, which
are sliced off.
"""

import contextlib
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def dispatch_mode(kind='quad', policy=None):
    """Dispatch mode for the fused kernels: None = use the composed
    path; False = compiled Pallas kernel; True = interpreter.

    `kind` names the call site: 'presolve' (the 3-pass pre-solve
    reduction group), 'quad' (the CG operator X'(w*(Xv))), 'link' (the
    GLM loglik+gradient). The default policy fuses NOTHING — every
    group lost its fusion case to measurement on the v5e:

    - 'quad'/'link': one fused VPU sweep of the stored blocks costs
      ~2.3x one composed MXU pass (~235-313 vs ~725 GB/s effective;
      the sweep is VPU-ALU-bound, see the module docstring), so
      replacing a dot+Tdot pair (2 -> 1 passes) loses.
    - 'presolve' (fused in round 3, 3 -> 1 passes, ~18.9 ms/iter at
      flagship scale): superseded in round 4 by the composed
      multi-RHS layout — ONE HIGHEST-precision MXU dot ``X' @ [u1 u2
      u3]`` per stored block plus the float block's squared-moment
      matvec (SparseDesignMatrix._presolve_multirhs) — measured 5.09
      vs 7.20 ms on the 1.95 GB dev shape, 1.41x the fused sweep,
      at f32 accuracy (baselines/dev_ne_variants.py --presolve).

    `policy` (first-class, per design — the design classes thread
    their construction-time ``fused=`` option here, so two designs in
    one process can run different policies): 'auto' (default — the
    measured policy above: everything composed), 'full' (every kind
    compiled on TPU — the round-3 all-fused data path, for hardware
    where the sweep runs closer to memory bound), '1' (force all
    kinds on; interpreted off-TPU, for tests), '0' (force off). When
    None, the ``BB_FUSED_NE`` env var supplies the default."""
    mode = policy if policy is not None \
        else os.environ.get('BB_FUSED_NE', 'auto')
    on_tpu = jax.default_backend() == 'tpu'
    if mode == '0':
        return None
    if mode == '1':
        return not on_tpu
    if mode == 'full':
        return False if on_tpu else None
    return None

# Lanes reduced per inner step: bounds the f32 up-convert transient to
# R x _CHUNK x 4 bytes while keeping lane reductions wide.
_CHUNK = 1024
# Per-grid-step VMEM budget for the row panels, all blocks combined
# (double-buffered by the pipeline, so ~2x this resides in VMEM plus
# the v/out blocks).
_X_BUDGET = 4 * 1024 * 1024

_SUBLANE = {1: 32, 2: 16, 4: 8}  # min sublane tile per itemsize


def _ceil_to(x, m):
    return -(-x // m) * m


def plan(n, widths_dtypes):
    """Static kernel plan for row-aligned blocks of (p_b, dtype_b):
    (R, grid, per-block [(p_pad, n_full, rem)]) — panel rows, grid
    steps, and each block's padded lane width / full lane chunks /
    ragged-tail width."""
    items = [jnp.dtype(dt).itemsize for _, dt in widths_dtypes]
    sub = max(_SUBLANE[it] for it in items)
    pads = [_ceil_to(max(p, 1), _CHUNK) for p, _ in widths_dtypes]
    row_bytes = sum(p_pad * it for p_pad, it in zip(pads, items))
    r = max(sub, _X_BUDGET // row_bytes // sub * sub)
    r = min(r, _ceil_to(max(n, 1), sub))
    grid = -(-max(n, 1) // r)
    blocks = [(p_pad, p // _CHUNK, p - (p // _CHUNK) * _CHUNK)
              for p_pad, (p, _) in zip(pads, widths_dtypes)]
    return r, grid, blocks


def _ne_kernel(*refs, n_blocks, n_rows, meta, mid='ne', with_logp=False):
    """`meta[b] = (n_full, rem, float_pad)` (static): when the stored
    dtype is a float type, undefined block-padding bits can be NaN/Inf
    and `0 * garbage` does NOT vanish — ragged lane tails (phase A) and
    ragged row panels (phase B) must be masked. Integer-stored blocks
    skip both masks: any bit pattern is a finite integer and the
    zero-padded operands annihilate it.

    `mid` (static) picks the per-row map from t_eff = (X v + c) and the
    row operands (a, b) to the phase-B vector u:
      'ne'     : u = b * t_eff                (the CG operator; a unused)
      'logit'  : u = a - b * sigmoid(t_eff)   (logistic score)
      'linear' : u = b * (a - t_eff)          (Gaussian score)
    `with_logp` additionally accumulates the matching log-likelihood
    rows into a (1, 1) output — the GLM loglik+gradient in one sweep.
    """
    x_refs = refs[:n_blocks]
    v_refs = refs[n_blocks:2 * n_blocks]
    c_ref, a_ref, b_ref = refs[2 * n_blocks:2 * n_blocks + 3]
    out_refs = refs[2 * n_blocks + 3:3 * n_blocks + 3]
    u_ref = refs[3 * n_blocks + 3]
    lp_ref = refs[3 * n_blocks + 4] if with_logp else None
    i = pl.program_id(0)
    r = x_refs[0].shape[0]
    f32 = jnp.float32
    row = i * r + jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)

    t = jnp.zeros((r, 1), f32)
    for b in range(n_blocks):
        n_full, rem, float_pad = meta[b]
        x_ref, v_ref = x_refs[b], v_refs[b]

        def body_a(k, acc, x_ref=x_ref, v_ref=v_ref):
            off = pl.multiple_of(k * _CHUNK, _CHUNK)
            xk = x_ref[:, pl.ds(off, _CHUNK)].astype(f32)
            return acc + jnp.sum(xk * v_ref[:, pl.ds(off, _CHUNK)],
                                 axis=1, keepdims=True)

        t = jax.lax.fori_loop(0, n_full, body_a, t)
        if rem:
            # Static ragged tail: lanes >= rem hold undefined padding.
            xk = x_ref[:, n_full * _CHUNK:(n_full + 1) * _CHUNK] \
                .astype(f32)
            if float_pad:
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (r, _CHUNK), 1)
                xk = jnp.where(lane < rem, xk, 0.0)
            t = t + jnp.sum(
                xk * v_ref[:, n_full * _CHUNK:(n_full + 1) * _CHUNK],
                axis=1, keepdims=True)

    t_eff = t + c_ref[:]
    a, b = a_ref[:], b_ref[:]
    lp = None
    if mid == 'ne':
        u = b * t_eff
    elif mid == 'logit':
        u = a - b * jax.nn.sigmoid(t_eff)
        if with_logp:
            # y*t - n*log(1 + e^t), the softplus written stably.
            lp = a * t_eff - b * (jnp.maximum(t_eff, 0.0)
                                  + jnp.log1p(jnp.exp(-jnp.abs(t_eff))))
    elif mid == 'linear':
        resid = a - t_eff
        u = b * resid
        if with_logp:
            lp = -0.5 * b * resid * resid
    else:
        raise ValueError(mid)
    # Rows past n_rows carry garbage t; jnp.where SELECTS (discards the
    # garbage) where a multiply by the zero-padded operands would keep
    # NaN.
    u = jnp.where(row < n_rows, u, 0.0)
    u_ref[:] = u
    if with_logp:
        @pl.when(i == 0)
        def _():
            lp_ref[:] = jnp.zeros_like(lp_ref)
        # Accumulate as a (1, 1) block: Mosaic cannot store scalars to
        # VMEM (a bare lp_ref[0, 0] += passes only in interpret mode).
        lp_ref[:] += jnp.sum(
            jnp.where(row < n_rows, lp, 0.0)).reshape(1, 1)

    for b in range(n_blocks):
        n_full, rem, float_pad = meta[b]
        x_ref, out_ref = x_refs[b], out_refs[b]

        @pl.when(i == 0)
        def _(out_ref=out_ref):
            out_ref[:] = jnp.zeros_like(out_ref)

        def body_b(k, carry, x_ref=x_ref, out_ref=out_ref,
                   float_pad=float_pad):
            off = pl.multiple_of(k * _CHUNK, _CHUNK)
            xk = x_ref[:, pl.ds(off, _CHUNK)].astype(f32)
            if float_pad:
                # NaN bits in undefined padded ROWS would poison every
                # column sum through 0 * NaN; select them away.
                xk = jnp.where(row < n_rows, xk, 0.0)
            out_ref[:, pl.ds(off, _CHUNK)] += jnp.sum(
                xk * u, axis=0, keepdims=True)
            return carry

        jax.lax.fori_loop(0, n_full + (1 if rem else 0), body_b, 0)


def _run(blocks, c, a, b, interpret, mid='ne', with_logp=False):
    """Shared driver: blocks = [(X_b, v_b)], row-aligned. Returns
    ([out_b], u, logp) with u = mid(sum_b X_b v_b + c; a, b),
    out_b = X_b' u, and logp the accumulated log-likelihood rows (None
    unless with_logp). c/a/b may be None (zeros)."""
    n = blocks[0][0].shape[0]
    n_blocks = len(blocks)
    r, grid, plans = plan(n, [(X.shape[1], X.dtype) for X, _ in blocks])
    f32 = jnp.float32
    n_pad = grid * r
    v_pads = [jnp.zeros((1, p_pad), f32).at[0, :X.shape[1]].set(
        v.astype(f32)) for (X, v), (p_pad, _, _) in zip(blocks, plans)]

    def col_pad(x):
        if x is None:
            return jnp.zeros((n_pad, 1), f32)
        return jnp.zeros((n_pad, 1), f32).at[:n, 0].set(x.astype(f32))

    c_pad, a_pad, b_pad = col_pad(c), col_pad(a), col_pad(b)
    meta = tuple(
        (n_full, rem, bool(jnp.issubdtype(X.dtype, jnp.floating)))
        for (X, _), (_, n_full, rem) in zip(blocks, plans))
    kernel = functools.partial(_ne_kernel, n_blocks=n_blocks,
                               n_rows=n, meta=meta, mid=mid,
                               with_logp=with_logp)
    x_specs = [pl.BlockSpec((r, p_pad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
               for p_pad, _, _ in plans]
    v_specs = [pl.BlockSpec((1, p_pad), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
               for p_pad, _, _ in plans]
    col_spec = pl.BlockSpec((r, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec((1, p_pad), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
                 for p_pad, _, _ in plans]
    out_shapes = [jax.ShapeDtypeStruct((1, p_pad), f32)
                  for p_pad, _, _ in plans]
    extra_specs = [col_spec]
    extra_shapes = [jax.ShapeDtypeStruct((n_pad, 1), f32)]
    if with_logp:
        extra_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                        memory_space=pltpu.VMEM))
        extra_shapes.append(jax.ShapeDtypeStruct((1, 1), f32))
    stored_bytes = sum(X.size * X.dtype.itemsize for X, _ in blocks)
    # Index maps / iota canonicalize to 64-bit under jax_enable_x64,
    # which Mosaic cannot legalize; all operands here are <= 32-bit.
    x64_off = jax.enable_x64(False) if not interpret \
        else contextlib.nullcontext()
    with x64_off:
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=x_specs + v_specs + [col_spec] * 3,
            out_specs=tuple(out_specs) + tuple(extra_specs),
            out_shape=tuple(out_shapes) + tuple(extra_shapes),
            cost_estimate=pl.CostEstimate(
                flops=4 * n * sum(X.shape[1] for X, _ in blocks),
                bytes_accessed=stored_bytes + 4 * (
                    sum(p for p, _, _ in plans) + 4 * n_pad),
                transcendentals=n if mid == 'logit' else 0),
            interpret=interpret,
        )(*[X for X, _ in blocks], *v_pads, c_pad, a_pad, b_pad)
    n_b = len(blocks)
    u = outs[n_b][:n, 0]
    lp = outs[n_b + 1][0, 0] if with_logp else None
    return [o[0, :X.shape[1]]
            for o, (X, _) in zip(outs[:n_b], blocks)], u, lp


def _tdots_kernel(*refs, n_blocks, n_rows, meta):
    """Pre-solve reduction kernel: per block, four transpose reductions
    off ONE panel read — X'u1, X'u2, X'u3 and (X∘X)'u3. The square is
    a VPU multiply on the already-loaded chunk, so the Jacobi
    preconditioner's second column moment costs no extra HBM."""
    x_refs = refs[:n_blocks]
    u_refs = refs[n_blocks:n_blocks + 3]
    out_refs = refs[n_blocks + 3:]
    i = pl.program_id(0)
    r = x_refs[0].shape[0]
    f32 = jnp.float32
    row = i * r + jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    us = [u_ref[:] for u_ref in u_refs]

    for b in range(n_blocks):
        n_full, rem, float_pad = meta[b]
        x_ref = x_refs[b]
        outs = out_refs[4 * b:4 * b + 4]

        @pl.when(i == 0)
        def _(outs=outs):
            for o in outs:
                o[:] = jnp.zeros_like(o)

        def body(k, carry, x_ref=x_ref, outs=outs, float_pad=float_pad):
            off = pl.multiple_of(k * _CHUNK, _CHUNK)
            xk = x_ref[:, pl.ds(off, _CHUNK)].astype(f32)
            if float_pad:
                # NaN bits in undefined padded ROWS would poison every
                # column sum through 0 * NaN; select them away.
                xk = jnp.where(row < n_rows, xk, 0.0)
            for o, u in zip(outs[:3], us):
                o[:, pl.ds(off, _CHUNK)] += jnp.sum(xk * u, axis=0,
                                                    keepdims=True)
            outs[3][:, pl.ds(off, _CHUNK)] += jnp.sum(
                xk * xk * us[2], axis=0, keepdims=True)
            return carry

        jax.lax.fori_loop(0, n_full + (1 if rem else 0), body, 0)


@functools.partial(jax.jit, static_argnames=('interpret',))
def fused_tdots(Xs, u1, u2, u3, interpret=False):
    """One sweep of the stored blocks computing, per block,
    (X'u1, X'u2, X'u3, (X∘X)'u3) — the Gibbs step's pre-solve
    reductions: the collapsed-observation Tdot, the b-vector noise
    Tdot, the weighted column sums, and the Jacobi-preconditioner
    second moment (reference does these as separate CSR passes,
    cg_sampler.py:140-143 + reg_coef_sampler.py:60-103).

    Parameters
    ----------
    Xs : tuple of (n, p_b) blocks sharing the row axis
    u1, u2, u3 : (n,) vectors

    Returns a list of 4-tuples of (p_b,) f32 vectors, one per block.
    """
    n = Xs[0].shape[0]
    n_blocks = len(Xs)
    r, grid, plans = plan(n, [(X.shape[1], X.dtype) for X in Xs])
    f32 = jnp.float32
    n_pad = grid * r
    u_pads = [jnp.zeros((n_pad, 1), f32).at[:n, 0].set(u.astype(f32))
              for u in (u1, u2, u3)]
    meta = tuple(
        (n_full, rem, bool(jnp.issubdtype(X.dtype, jnp.floating)))
        for X, (_, n_full, rem) in zip(Xs, plans))
    kernel = functools.partial(_tdots_kernel, n_blocks=n_blocks,
                               n_rows=n, meta=meta)
    x_specs = [pl.BlockSpec((r, p_pad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
               for p_pad, _, _ in plans]
    col_spec = pl.BlockSpec((r, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_specs, out_shapes = [], []
    for p_pad, _, _ in plans:
        out_specs += [pl.BlockSpec((1, p_pad), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)] * 4
        out_shapes += [jax.ShapeDtypeStruct((1, p_pad), f32)] * 4
    stored_bytes = sum(X.size * X.dtype.itemsize for X in Xs)
    x64_off = jax.enable_x64(False) if not interpret \
        else contextlib.nullcontext()
    with x64_off:
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=x_specs + [col_spec] * 3,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shapes),
            cost_estimate=pl.CostEstimate(
                flops=10 * n * sum(X.shape[1] for X in Xs),
                bytes_accessed=stored_bytes + 4 * (
                    4 * sum(p for p, _, _ in plans) + 3 * n_pad),
                transcendentals=0),
            interpret=interpret,
        )(*Xs, *u_pads)
    return [tuple(o[0, :X.shape[1]] for o in outs[4 * b:4 * b + 4])
            for b, X in enumerate(Xs)]


@functools.partial(jax.jit, static_argnames=('interpret',))
def fused_ne_matvec(X, v, c, w, interpret=False):
    """(out, u) with u = w * (X v + c) and out = X' u, reading the
    stored block X from HBM once.

    Parameters
    ----------
    X : (n, pe) int8 | bfloat16 | float32 device array
    v : (pe,) vector;  c, w : (n,) per-row offset and weight
    """
    outs, u, _ = _run([(X, v)], c, None, w, interpret)
    return outs[0], u


@functools.partial(jax.jit, static_argnames=('interpret',))
def fused_ne_matvec2(Xe, Xf, ve, vf, c, w, interpret=False):
    """Two-block form for the hybrid design: (out_e, out_f, u) with
    u = w * (Xe ve + Xf vf + c), out_e = Xe' u, out_f = Xf' u — the
    whole operator application in ONE sweep of both stored blocks.

    Xe, Xf share the row (observation) axis; dtypes may differ (int8 /
    bf16 exact block next to the f32 float block).
    """
    outs, u, _ = _run([(Xe, ve), (Xf, vf)], c, None, w, interpret)
    return outs[0], outs[1], u


@functools.partial(jax.jit,
                   static_argnames=('mid', 'with_logp', 'interpret'))
def fused_link_matvec(Xs, vs, c, a, b, mid, with_logp=True,
                      interpret=False):
    """GLM score + log-likelihood in ONE sweep of the stored blocks:
    with t = sum_b X_b v_b + c, computes u = link-score(t; a, b)
    (see `_ne_kernel` for the 'logit' / 'linear' row maps), every
    block's gradient contribution X_b' u, and (optionally) the summed
    log-likelihood rows. The reference evaluates loglik+gradient as a
    dot THEN a Tdot (two design passes, model/logistic_model.py:...);
    HMC/NUTS leapfrog and the MAP search call this every step.

    Returns ([out_b], u, logp).
    """
    return _run(list(zip(Xs, vs)), c, a, b, interpret, mid=mid,
                with_logp=with_logp)
