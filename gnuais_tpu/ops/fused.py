"""Pallas TPU kernels: the throughput path.

The exact XLA `lax.scan` DPLL pays per-step dispatch overhead; this
kernel runs the same integer recurrence as an in-VMEM `fori_loop` over
``[8, 128]`` stream tiles (streams on VPU lanes, time sequential in
registers), streaming sample chunks HBM->VMEM via the grid.  Semantics
are bit-identical to ops.demod.dpll_scan.

Layout: filtered samples are transposed to ``[T, 8, 128]`` (time-major
tiles); S is padded to 1024 lanes.  Output is an int32 tile stream
encoding ``2*valid + bit``; the existing compaction + HDLC scan
consumes it unchanged.

See /opt/skills/guides/pallas_guide.md for the kernel idioms used here
(grid streaming, scratch persistence across grid steps, pl.when).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnuais_tpu import constants as C
from gnuais_tpu.ops.demod import DpllState

LANES = 128
SUBLANES = 8
TILE_STREAMS = LANES * SUBLANES     # 1024 streams per kernel call

# Python-float copies of the float32 taps: used as scalar constants in
# the kernel so Mosaic broadcasts them (values are already f32-rounded).
_TAPS_F32 = [float(v) for v in np.asarray(C.FIR_TAPS, dtype=np.float32)]


def _dpll_kernel(nvalid_ref, x_ref, pll_in, prev_in, last_in,
                 bits_ref, pll_out, prev_out, last_out, state,
                 unroll: int = 32):
    """One grid step: TC time-tiles of [8, 128] streams.

    state: VMEM scratch [3, 8, 128] int32 persisting across grid steps
    (TPU grid iterations run sequentially on the core).
    """
    tc = x_ref.shape[0]
    chunk = pl.program_id(0)

    @pl.when(chunk == 0)
    def _():
        state[0] = pll_in[:]
        state[1] = prev_in[:]
        state[2] = last_in[:]

    n_valid = nvalid_ref[0]

    # Process UNROLL time steps per loop iteration: one [UNROLL, 8, 128]
    # VMEM load and one store amortize the dynamic-index overhead that
    # dominates a step-at-a-time loop; the recurrence itself runs on
    # register tiles between them.

    def body(u, _):
        base = u * unroll
        x8 = x_ref[pl.ds(base, unroll)]            # [UNROLL, 8, 128]
        pll = state[0]
        prev = state[1]
        lastbit = state[2]
        outs = []
        for k in range(unroll):
            curr = (x8[k] > 0.0).astype(jnp.int32)
            trans = curr != prev
            nudge = jnp.where(pll < C.PLL_CENTER, C.PLL_NUDGE, -C.PLL_NUDGE)
            pll_adv = pll + jnp.where(trans, nudge, 0) + C.PLL_INC
            emit = pll_adv > 0xFFFF
            bit = 1 - (curr ^ lastbit)
            valid = (chunk * tc + base + k) < n_valid
            outs.append(jnp.where(emit & valid, 2 + bit, 0))
            pll_next = jnp.where(emit, pll_adv & 0xFFFF, pll_adv)
            last_next = jnp.where(emit, curr, lastbit)
            pll = jnp.where(valid, pll_next, pll)
            prev = jnp.where(valid, curr, prev)
            lastbit = jnp.where(valid, last_next, lastbit)
        bits_ref[pl.ds(base, unroll)] = jnp.stack(outs)
        state[0] = pll
        state[1] = prev
        state[2] = lastbit
        return 0

    jax.lax.fori_loop(0, tc // unroll, body, 0)

    @pl.when(chunk == pl.num_programs(0) - 1)
    def _():
        pll_out[:] = state[0]
        prev_out[:] = state[1]
        last_out[:] = state[2]


def dpll_pallas_tiles(filtered_tiles: jax.Array, n_valid: jax.Array,
                      pll: jax.Array, prev: jax.Array, lastbit: jax.Array,
                      time_chunk: int = 512, interpret: bool = False,
                      unroll: int = 32):
    """Run the DPLL kernel on pre-tiled input.

    filtered_tiles: float32 [T, 8, 128] with T a multiple of time_chunk.
    State tiles: int32 [8, 128].  Returns (bits [T, 8, 128] int32 coded
    2*valid+bit, new state tiles).
    """
    t = filtered_tiles.shape[0]
    assert t % time_chunk == 0, (t, time_chunk)
    assert time_chunk % unroll == 0, (time_chunk, unroll)
    grid = (t // time_chunk,)

    kernel = pl.pallas_call(
        functools.partial(_dpll_kernel, unroll=unroll),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((time_chunk, SUBLANES, LANES),
                             lambda i, nv: (i, 0, 0)),
                pl.BlockSpec((SUBLANES, LANES), lambda i, nv: (0, 0)),
                pl.BlockSpec((SUBLANES, LANES), lambda i, nv: (0, 0)),
                pl.BlockSpec((SUBLANES, LANES), lambda i, nv: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((time_chunk, SUBLANES, LANES),
                             lambda i, nv: (i, 0, 0)),
                pl.BlockSpec((SUBLANES, LANES), lambda i, nv: (0, 0)),
                pl.BlockSpec((SUBLANES, LANES), lambda i, nv: (0, 0)),
                pl.BlockSpec((SUBLANES, LANES), lambda i, nv: (0, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((3, SUBLANES, LANES), jnp.int32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((t, SUBLANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((SUBLANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((SUBLANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((SUBLANES, LANES), jnp.int32),
        ],
        interpret=interpret,
    )
    nv = jnp.asarray([n_valid], dtype=jnp.int32)
    bits, pll2, prev2, last2 = kernel(nv, filtered_tiles, pll, prev, lastbit)
    return bits, pll2, prev2, last2


def _to_tiles(x: jax.Array) -> Tuple[jax.Array, int]:
    """[S, T] -> [T, 8, 128] float32 tiles (S padded to 1024)."""
    s, t = x.shape
    assert s <= TILE_STREAMS, "grid over stream tiles handled by caller"
    pad = TILE_STREAMS - s
    xp = jnp.pad(x.astype(jnp.float32), ((0, pad), (0, 0)))
    return xp.T.reshape(t, SUBLANES, LANES), pad


def _state_to_tiles(v: jax.Array) -> jax.Array:
    s = v.shape[0]
    vp = jnp.pad(v, (0, TILE_STREAMS - s))
    return vp.reshape(SUBLANES, LANES)


def _tiles_to_state(tile: jax.Array, s: int) -> jax.Array:
    return tile.reshape(TILE_STREAMS)[:s]


def _frontend_kernel(nvalid_ref, x_ref, pll_in, prev_in, last_in, hist_in,
                     coded_ref, pll_out, prev_out, last_out,
                     state, hist, unroll: int = 32):
    """Fused FIR + DPLL + 4-sample group reduce, one grid step.

    x_ref: RAW sample tiles [TC, 8, 128] float32 (int16 values).  The
    36-tap FIR runs in-kernel with the reference's exact accumulation
    order (filter.c:43-52: sequential f32 multiply-adds, tap 0 first),
    so the filtered array never touches HBM.  DPLL semantics match
    ``_dpll_kernel``; emissions are reduced into aligned 4-sample groups
    (provably <= 1 emission/group, see demod.group_reduce_bits) and
    written as ``valid<<3 | bit<<2 | offset`` int32 codes — 1/4 the
    output traffic of the per-sample coded stream.

    hist: VMEM scratch [36, 8, 128] float32 — the last 36 raw samples
    before the current position (oldest first), persisting across grid
    steps.  out[n] covers x[n-36 .. n-1] (one-sample delay,
    filter.c:115-122).
    """
    tc = x_ref.shape[0]
    chunk = pl.program_id(0)

    @pl.when(chunk == 0)
    def _():
        state[0] = pll_in[:]
        state[1] = prev_in[:]
        state[2] = last_in[:]
        hist[:] = hist_in[:]

    n_valid = nvalid_ref[0]

    def body(u, _):
        base = u * unroll
        x8 = x_ref[pl.ds(base, unroll)]            # [UNROLL, 8, 128] raw
        # sliding window: 36 history tiles + the unroll chunk
        win = [hist[i] for i in range(C.FIR_LEN)]
        win += [x8[k] for k in range(unroll)]
        pll = state[0]
        prev = state[1]
        lastbit = state[2]
        groups = []
        acc = None
        for k in range(unroll):
            f = win[k] * _TAPS_F32[0]
            for i in range(1, C.FIR_LEN):
                f = f + win[k + i] * _TAPS_F32[i]
            curr = (f > 0.0).astype(jnp.int32)
            trans = curr != prev
            nudge = jnp.where(pll < C.PLL_CENTER, C.PLL_NUDGE, -C.PLL_NUDGE)
            pll_adv = pll + jnp.where(trans, nudge, 0) + C.PLL_INC
            emit = pll_adv > 0xFFFF
            bit = 1 - (curr ^ lastbit)
            valid = (chunk * tc + base + k) < n_valid
            code = jnp.where(emit & valid, 8 | (bit << 2) | (k & 3), 0)
            acc = code if acc is None else acc | code
            if (k & 3) == 3:
                groups.append(acc)
                acc = None
            pll_next = jnp.where(emit, pll_adv & 0xFFFF, pll_adv)
            last_next = jnp.where(emit, curr, lastbit)
            pll = jnp.where(valid, pll_next, pll)
            prev = jnp.where(valid, curr, prev)
            lastbit = jnp.where(valid, last_next, lastbit)
        coded_ref[pl.ds(base // 4, unroll // 4)] = jnp.stack(groups)
        state[0] = pll
        state[1] = prev
        state[2] = lastbit
        # roll the history: last 36 samples of the extended window
        for i in range(C.FIR_LEN):
            hist[i] = win[unroll + i]
        return 0

    jax.lax.fori_loop(0, tc // unroll, body, 0)

    @pl.when(chunk == pl.num_programs(0) - 1)
    def _():
        pll_out[:] = state[0]
        prev_out[:] = state[1]
        last_out[:] = state[2]


def frontend_fused(samples: jax.Array, n_valid: jax.Array,
                   history: jax.Array, state: DpllState,
                   block_base: jax.Array | int = 0,
                   time_chunk: int = 512, interpret: bool | None = None,
                   unroll: int = 32
                   ) -> Tuple[jax.Array, jax.Array, jax.Array,
                              jax.Array, DpllState]:
    """Fused replacement for fir_exact + dpll + group_reduce_bits.

    samples: int16/float32 [S, T] RAW samples, S <= 1024, T a multiple
    of time_chunk; history: float32 [S, 36]; state: DpllState.
    Returns (gbits [S, T/4] int32, gvalid [S, T/4] bool,
    gpos [S, T/4] int32 absolute sample indices, new_history, new state)
    — bit-identical to the unfused exact chain.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s, t = samples.shape
    assert t % time_chunk == 0 and time_chunk % unroll == 0 \
        and unroll % 4 == 0, (t, time_chunk, unroll)
    xf = samples.astype(jnp.float32)
    tiles, _pad = _to_tiles(xf)
    hist_t = jnp.pad(history, ((0, TILE_STREAMS - s), (0, 0))) \
        .T.reshape(C.FIR_LEN, SUBLANES, LANES)
    grid = (t // time_chunk,)

    kernel = pl.pallas_call(
        functools.partial(_frontend_kernel, unroll=unroll),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((time_chunk, SUBLANES, LANES),
                             lambda i, nv: (i, 0, 0)),
                pl.BlockSpec((SUBLANES, LANES), lambda i, nv: (0, 0)),
                pl.BlockSpec((SUBLANES, LANES), lambda i, nv: (0, 0)),
                pl.BlockSpec((SUBLANES, LANES), lambda i, nv: (0, 0)),
                pl.BlockSpec((C.FIR_LEN, SUBLANES, LANES),
                             lambda i, nv: (0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((time_chunk // 4, SUBLANES, LANES),
                             lambda i, nv: (i, 0, 0)),
                pl.BlockSpec((SUBLANES, LANES), lambda i, nv: (0, 0)),
                pl.BlockSpec((SUBLANES, LANES), lambda i, nv: (0, 0)),
                pl.BlockSpec((SUBLANES, LANES), lambda i, nv: (0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((3, SUBLANES, LANES), jnp.int32),
                pltpu.VMEM((C.FIR_LEN, SUBLANES, LANES), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((t // 4, SUBLANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((SUBLANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((SUBLANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((SUBLANES, LANES), jnp.int32),
        ],
        interpret=interpret,
    )
    nv = jnp.asarray([n_valid], dtype=jnp.int32)
    coded_t, pll2, prev2, last2 = kernel(
        nv, tiles,
        _state_to_tiles(state.pll),
        _state_to_tiles(state.prev),
        _state_to_tiles(state.lastbit),
        hist_t)

    g = t // 4
    coded = coded_t.reshape(g, TILE_STREAMS)[:, :s].T       # [S, T/4]
    gvalid = coded >= 8
    gbits = (coded >> 2) & 1
    gpos = jnp.where(
        gvalid,
        (block_base + 4 * jnp.arange(g, dtype=jnp.int32))[None, :]
        + (coded & 3), 0).astype(jnp.int32)

    # carried history: last 36 valid raw samples (computed in XLA — the
    # kernel's in-flight history sees pad zeros past n_valid)
    x = jnp.concatenate([history, xf], axis=1)
    new_history = jax.lax.dynamic_slice_in_dim(
        x, jnp.asarray(n_valid, dtype=jnp.int32), C.FIR_LEN, axis=1)

    new_state = DpllState(
        pll=_tiles_to_state(pll2, s),
        prev=_tiles_to_state(prev2, s),
        lastbit=_tiles_to_state(last2, s),
    )
    return gbits, gvalid, gpos, new_history, new_state


def dpll_fused(filtered: jax.Array, n_valid: jax.Array, state: DpllState,
               time_chunk: int = 512, interpret: bool | None = None,
               unroll: int = 32) -> Tuple[jax.Array, jax.Array, DpllState]:
    """Drop-in fast replacement for ops.demod.dpll_scan.

    filtered: [S, T] float32 with S <= 1024 and T a multiple of
    time_chunk.  Returns (bit_valid [S, T] bool, bits [S, T] int32,
    new state).
    """
    if interpret is None:
        # Mosaic kernels need a TPU; anywhere else (CPU tests, virtual
        # meshes) the interpreter provides identical semantics.
        interpret = jax.default_backend() != "tpu"
    s, t = filtered.shape
    tiles, _pad = _to_tiles(filtered)
    bits_t, pll2, prev2, last2 = dpll_pallas_tiles(
        tiles, n_valid,
        _state_to_tiles(state.pll),
        _state_to_tiles(state.prev),
        _state_to_tiles(state.lastbit),
        time_chunk=time_chunk, interpret=interpret, unroll=unroll)
    coded = bits_t.reshape(t, TILE_STREAMS)[:, :s].T    # [S, T]
    bit_valid = coded >= 2
    bits = coded & 1
    new_state = DpllState(
        pll=_tiles_to_state(pll2, s),
        prev=_tiles_to_state(prev2, s),
        lastbit=_tiles_to_state(last2, s),
    )
    return bit_valid, bits, new_state
