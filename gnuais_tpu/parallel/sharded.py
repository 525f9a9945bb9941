"""Sharded decode steps.

``make_sharded_decode``: the production scaling path — independent
streams sharded over chips with ``shard_map`` (every op stays local;
zero collectives in steady state, which is the whole point: AIS streams
are embarrassingly parallel and the mesh should only pay ICI for
control/stats).

``make_multichip_step``: the full 2-D (streams x time) step — FIR is
time-sharded with ppermute halo exchange (exact overlap-save), then the
sequential decoder runs stream-sharded on the gathered filtered block.
This is the shape the multi-chip dryrun compiles and the template for
true time-parallel decode.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnuais_tpu.ops import demod
from gnuais_tpu.parallel.halo import fir_time_sharded
from gnuais_tpu.runtime import pipeline as pl


def make_sharded_decode(mesh: Mesh, frame_slots: int = 32,
                        exact_fir: bool = True) -> Callable:
    """Returns jitted (samples [S,T], n_valid, carry) -> (carry', frames,
    peak) with S sharded over the ``streams`` mesh axis."""

    def body(samples, n_valid, carry):
        return pl.decode_block(samples, n_valid, carry,
                               frame_slots=frame_slots, exact_fir=exact_fir)

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("streams", None), P(), P("streams")),
        out_specs=(P("streams"), P("streams"), P("streams")),
    )
    return jax.jit(sharded)


def make_multichip_step(mesh: Mesh, frame_slots: int = 32,
                        exact_fir: bool = True) -> Callable:
    """2-D mesh step: FIR halo-exchanged along ``time``, decoder sharded
    along ``streams`` (filtered block gathered across the time axis)."""

    def demod_body(filtered, n_valid, dpll, hdlc):
        t = filtered.shape[1]
        sample_valid = jnp.arange(t) < n_valid
        bit_valid, bits, dpll2 = demod.dpll_scan(filtered, sample_valid, dpll)
        bitrows, slot_valid, pos_rows = demod.group_reduce_bits(
            bit_valid, bits)
        frames0 = demod.init_frames(filtered.shape[0], frame_slots)
        hdlc2, frames = demod.hdlc_scan(bitrows, slot_valid, hdlc, frames0,
                                        pos_rows)
        return dpll2, hdlc2, frames

    demod_sharded = jax.shard_map(
        demod_body, mesh=mesh,
        in_specs=(P("streams", None), P(), P("streams"), P("streams")),
        out_specs=(P("streams"), P("streams"), P("streams")),
        check_vma=False,
    )

    def step(samples, n_valid, carry: pl.PipelineCarry):
        filtered, new_hist = fir_time_sharded(samples, carry.history, mesh,
                                              exact=exact_fir)
        dpll2, hdlc2, frames = demod_sharded(filtered, n_valid,
                                             carry.dpll, carry.hdlc)
        return pl.PipelineCarry(new_hist, dpll2, hdlc2), frames

    return jax.jit(step)
