"""Sharded decode correctness on the virtual 8-device CPU mesh.

The streams axis is pure data parallelism (results must be identical to
unsharded), and the time axis exercises the ppermute overlap-save halo
(filtered output must equal the sequential FIR exactly).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnuais_tpu.golden import encoder as E
from gnuais_tpu.ops import fir as fir_ops
from gnuais_tpu.parallel import mesh as M
from gnuais_tpu.parallel.halo import fir_time_sharded
from gnuais_tpu.parallel.sharded import make_multichip_step, make_sharded_decode
from gnuais_tpu.runtime import pipeline as pl


needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _batch(n_streams, t=8192):
    audio = E.synthesize_capture(
        [E.make_type123(1, 257012345, 59.9, 10.7), E.make_type5(257099999)],
        gap_bits=48)
    batch = np.zeros((n_streams, t), dtype=np.int16)
    for s in range(n_streams):
        batch[s, : min(len(audio), t)] = audio[:t]
    return batch


@needs_mesh
def test_stream_sharded_matches_unsharded():
    s, t = 8, 8192
    batch = _batch(s, t)
    mesh = M.make_stream_mesh()
    fn = make_sharded_decode(mesh, frame_slots=16)
    c1, f1, p1 = fn(jnp.asarray(batch), jnp.int32(t), pl.init_carry(s))
    c2, f2, p2 = pl.decode_block(jnp.asarray(batch), jnp.int32(t),
                                 pl.init_carry(s), frame_slots=16)
    assert np.array_equal(np.asarray(f1.count), np.asarray(f2.count))
    assert np.array_equal(np.asarray(f1.words), np.asarray(f2.words))
    assert np.array_equal(np.asarray(f1.length), np.asarray(f2.length))
    for a, b in zip(jax.tree.leaves(c1), jax.tree.leaves(c2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


@needs_mesh
def test_fir_halo_exchange_exact():
    rng = np.random.default_rng(0)
    s, t = 4, 4096
    x = rng.integers(-30000, 30000, (s, t), dtype=np.int16)
    hist = rng.normal(0, 1000, (s, 36)).astype(np.float32)
    mesh = M.make_grid_mesh(1, 8)
    got, new_hist = fir_time_sharded(jnp.asarray(x), jnp.asarray(hist),
                                     mesh, stream_axis=None)
    want, want_hist = fir_ops.fir_exact(jnp.asarray(x), jnp.asarray(hist))
    assert np.array_equal(np.asarray(got), np.asarray(want))
    assert np.array_equal(np.asarray(new_hist), np.asarray(want_hist))


@needs_mesh
def test_fir_halo_2d_mesh():
    rng = np.random.default_rng(1)
    s, t = 8, 4096
    x = rng.integers(-30000, 30000, (s, t), dtype=np.int16)
    hist = np.zeros((s, 36), dtype=np.float32)
    mesh = M.make_grid_mesh(2, 4)
    got, _ = fir_time_sharded(jnp.asarray(x), jnp.asarray(hist), mesh)
    want, _ = fir_ops.fir_exact(jnp.asarray(x), jnp.asarray(hist))
    assert np.array_equal(np.asarray(got), np.asarray(want))


@needs_mesh
def test_multichip_step_matches_unsharded():
    s, t = 4, 8192
    batch = _batch(s, t)
    mesh = M.make_grid_mesh(2, 4)
    fn = make_multichip_step(mesh, frame_slots=16)
    c1, f1 = fn(jnp.asarray(batch), jnp.int32(t), pl.init_carry(s))
    c2, f2, _ = pl.decode_block(jnp.asarray(batch), jnp.int32(t),
                                pl.init_carry(s), frame_slots=16)
    assert np.array_equal(np.asarray(f1.count), np.asarray(f2.count))
    assert np.array_equal(np.asarray(f1.words), np.asarray(f2.words))


@needs_mesh
def test_graft_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn).lower(*args).compile()(*args)
    carry, frames, peak = out
    assert int(np.asarray(frames.count)[0]) == 1
