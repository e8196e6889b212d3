"""Bitpacked binary matvec: the beyond-HBM sparse backend's Pallas core.

This is the TPU replacement for the regime the reference serves with the
MKL CSR matvec (reference: bayesbridge/design_matrix/mkl_matvec.py:17-56)
and the indices-only binary kernel (binary_matmul.pyx:11-38): designs too
large for the dense hybrid blocks (`design/sparse.py`) but whose columns
are overwhelmingly 0/1-valued (OHDSI-style EHR indicators).

Storage: one BIT per element, bytes grouping 8 INPUT-dimension positions,
laid out with the byte-group axis on sublanes and the OUTPUT dimension on
lanes:

    bits[g, m] = sum_b X[m, 8g + b] << b        (for the X @ v direction)

Compute: a matvec against a bit matrix never touches the bits directly.
For each byte-group g the 256 possible byte values index a lookup table

    lut[g, B] = sum_b bit_b(B) * v[8g + b]

built from ``v`` by one tiny (G, 8) x (8, 256) matmul per call, and the
kernel reduces to ONE table lookup per byte:

    out[m] = sum_g lut[g, bits[g, m]]

The lookup maps onto the TPU's within-register ``dynamic_gather``
(Mosaic lowers ``jnp.take_along_axis(table, idx, axis=1)`` with matching
(rows, 128) shapes to one VPU gather): the 256-entry table is split into
two 128-lane registers selected by the byte's top bit. Per byte that is
~6 VPU ops for 8 matrix elements — measured ~660 Gelem/s on a v5e chip,
~60x the XLA ELL-gather path at 1% density and 32x less HBM than f32
dense storage. Both matvec directions use this one kernel with the two
bitmap orientations (row-packed and column-packed), mirroring the
dual-ELL layout.

All padding is with zero bits (contributing lut[g, 0] = 0) and sliced
off the output, so the kernel only ever sees full tiles.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tuned on v5e: 32 byte-groups (sublanes) x 64 lane-chunks per block.
_JB = 32
_K = 64
_LANE = 128

# bit_matrix[B, b] = b-th bit of byte B; lut = v_bytes @ bit_matrix.T.
_BIT_MATRIX = ((np.arange(256)[:, None] >> np.arange(8)[None, :]) & 1)


def _ceil_to(x, m):
    return -(-x // m) * m


def pack_bits(dense_01, axis):
    """Pack a 0/1 array along `axis` into bytes, byte-group axis FIRST.

    pack_bits(X, axis=1) -> (ceil(p/8), n): bits[g, i] packs X[i, 8g:8g+8]
    pack_bits(X, axis=0) -> (ceil(n/8), p): bits[g, j] packs X[8g:8g+8, j]
    """
    packed = np.packbits(np.asarray(dense_01, dtype=np.uint8),
                         axis=axis, bitorder='little')
    return np.ascontiguousarray(packed.T if axis == 1 else packed)


def _gather_lanes(table, idx):
    """take_along_axis(table, idx, axis=1) with int32 indices preserved.

    Mosaic lowers this exact jnp pattern to one within-register
    ``dynamic_gather`` but rejects 64-bit index vectors; under
    jax_enable_x64 the jnp wrapper would promote the int32 indices to
    int64, so the promotion is locally disabled.
    """
    with jax.enable_x64(False):
        return jnp.take_along_axis(table, idx, axis=1)


def _lut_kernel(lut_lo_ref, lut_hi_ref, bits_ref, out_ref, *, n_chunk):
    """out[m] += sum_g lut[g, bits[g, m]] over this block's byte-groups."""
    group_idx = pl.program_id(1)

    @pl.when(group_idx == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    lo = lut_lo_ref[:]
    hi = lut_hi_ref[:]
    rows = []
    for k in range(n_chunk):
        idx = bits_ref[:, k * _LANE:(k + 1) * _LANE].astype(jnp.int32)
        # Gathers are within one 128-lane register; idx & 127 serves
        # both halves (the unused half's lanes are discarded by the
        # select on the byte's top bit).
        low7 = idx & (_LANE - 1)
        g_lo = _gather_lanes(lo, low7)
        g_hi = _gather_lanes(hi, low7)
        gathered = jnp.where(idx < _LANE, g_lo, g_hi)
        rows.append(jnp.sum(gathered, axis=0))
    out_ref[:] += jnp.stack(rows)


@functools.partial(jax.jit,
                   static_argnames=('n_out', 'n_chunk', 'interpret'))
def bitpacked_matvec(bits, v, n_out, n_chunk, interpret=False):
    """(unpacked bit matrix)' @ v restricted to the packed layout.

    Parameters
    ----------
    bits : (G_pad, M_pad) uint8
        Packed matrix: byte-groups of the INPUT dimension on axis 0
        (G_pad a multiple of the block height), OUTPUT dimension on
        axis 1 (M_pad a multiple of 128 * n_chunk).
    v : (8 * G_pad,) float
        Input vector, zero-padded to the byte-group grid.
    n_out : int
        True (unpadded) output length; the padded tail is dropped.
    n_chunk : int
        128-lane chunks per block (static; from `plan_blocks`).
    """
    import contextlib

    g_pad, m_pad = bits.shape
    dtype = v.dtype
    if not interpret and dtype == jnp.float64:
        raise NotImplementedError(
            "The compiled bitpack kernel is 32-bit (Mosaic TPU has no "
            "64-bit vectors); build the design with dtype=np.float32.")
    lut = jax.lax.dot_general(
        v.reshape(g_pad, 8), jnp.asarray(_BIT_MATRIX.T, dtype),
        (((1,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST)
    jb = _JB if g_pad % _JB == 0 else 8
    ni = n_chunk * _LANE
    grid = (m_pad // ni, g_pad // jb)
    # Under jax_enable_x64 the kernel's auxiliary values (index maps,
    # iota, loop carries) canonicalize to 64-bit, which Mosaic cannot
    # legalize; the operands here are uint8/f32 regardless, so trace the
    # compiled kernel with 32-bit canonicalization.
    x64_off = jax.enable_x64(False) if not interpret \
        else contextlib.nullcontext()
    with x64_off:
        out = pl.pallas_call(
            functools.partial(_lut_kernel, n_chunk=n_chunk),
            grid=grid,
            in_specs=[
                pl.BlockSpec((jb, _LANE), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((jb, _LANE), lambda i, j: (j, 1),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((jb, ni), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n_chunk, _LANE), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_pad // _LANE, _LANE), dtype),
            interpret=interpret,
        )(lut[:, :_LANE], lut[:, _LANE:], bits)
    return out.reshape(m_pad)[:n_out]


def plan_blocks(n_in, n_out):
    """Static padding plan for a (n_in -> n_out) bitpacked product.

    Returns (g_pad, m_pad, n_chunk): the padded byte-group count, padded
    output length, and lane-chunks per block.
    """
    n_groups = _ceil_to(n_in, 8) // 8
    g_pad = _ceil_to(n_groups, _JB) if n_groups >= _JB \
        else _ceil_to(n_groups, 8)
    n_chunk = max(1, min(_K, _ceil_to(n_out, _LANE) // _LANE))
    m_pad = _ceil_to(n_out, n_chunk * _LANE)
    return g_pad, m_pad, n_chunk


def pad_packed(bits, g_pad, m_pad):
    """Zero-pad a packed (G, M) bitmap to the planned (g_pad, m_pad)."""
    g, m = bits.shape
    if (g, m) == (g_pad, m_pad):
        return bits
    out = np.zeros((g_pad, m_pad), dtype=np.uint8)
    out[:g, :m] = bits
    return out
