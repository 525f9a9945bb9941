"""On-silicon kernel parity: every pallas_call entry point in
ops/fused.py runs COMPILED on the real TPU and is compared bit-for-bit
against the exact XLA chain running on the host CPU backend.

Why this tier exists: all other tests run the Pallas INTERPRETER on
CPU, and interpreter-green is not TPU-correct — round 2 shipped a real
corruption (16-bit integer operands silently rounded by the default
single-pass bf16 matmul lowering) that only real hardware exposed.

Run with:  GNUAIS_TEST_TPU=1 python -m pytest -m tpu tests/test_on_tpu.py
(the driver-facing recipe; shapes are small so the pass takes minutes,
dominated by first-time compiles — the persistent cache in .jax_cache
makes reruns fast).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        not os.environ.get("GNUAIS_TEST_TPU"),
        reason="on-silicon tier: set GNUAIS_TEST_TPU=1 and run -m tpu"),
]

from gnuais_tpu.golden import encoder as E
from gnuais_tpu.runtime import pipeline as pl


def _require_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend available")


def _cpu():
    return jax.devices("cpu")[0]


def _tpu():
    return jax.devices()[0]


def _noisy_batch(s, t, seed=0, n_payloads=3, gap_bits=48):
    rng = np.random.default_rng(seed)
    audio = E.synthesize_capture(
        [E.random_payload(rng) for _ in range(n_payloads)],
        gap_bits=gap_bits)
    x = np.zeros((s, t), dtype=np.int16)
    for i in range(s):
        n = min(len(audio), t)
        x[i, :n] = np.roll(audio[:n], i * 13)
    noise = rng.normal(0, 300, x.shape)
    return np.clip(x + noise, -32768, 32767).astype(np.int16)


def _decode_on(device, x, t, n_valid=None, frame_slots=16, **flags):
    """Run decode_block with inputs placed on ``device`` (the jit
    follows its inputs' platform)."""
    s = x.shape[0]
    xd = jax.device_put(jnp.asarray(x), device)
    carry = jax.device_put(pl.init_carry(s), device)
    nv = jax.device_put(jnp.int32(t if n_valid is None else n_valid),
                        device)
    c, fr, pk = pl.decode_block(xd, nv, carry, frame_slots=frame_slots,
                                **flags)
    return jax.tree.map(np.asarray, (c, fr, pk))


def _assert_equal_tree(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        assert np.array_equal(np.asarray(x), np.asarray(y)), (x, y)


# ---------------------------------------------------------------------
# pallas_call entry points (ops/fused.py): dpll_pallas_tiles (via
# fast_dpll), frontend_fused (via fused_frontend), _pipeline_kernel in
# vpu and mxu modes (via fused_pipeline / mxu_fir)
# ---------------------------------------------------------------------

def test_tpu_dpll_kernel_bitexact_vs_cpu_exact():
    _require_tpu()
    x = _noisy_batch(8, 4096, seed=1)
    want = _decode_on(_cpu(), x, 4096)
    got = _decode_on(_tpu(), x, 4096, fast_dpll=True)
    _assert_equal_tree(want, got)


def test_tpu_frontend_kernel_bitexact_vs_cpu_exact():
    _require_tpu()
    x = _noisy_batch(8, 4096, seed=2)
    want = _decode_on(_cpu(), x, 4096)
    got = _decode_on(_tpu(), x, 4096, fused_frontend=True)
    _assert_equal_tree(want, got)


def test_tpu_pipeline_kernel_bitexact_vs_cpu_exact():
    _require_tpu()
    x = _noisy_batch(8, 4096, seed=3)
    want = _decode_on(_cpu(), x, 4096)
    got = _decode_on(_tpu(), x, 4096, fused_pipeline=True)
    _assert_equal_tree(want, got)


def test_tpu_pipeline_short_block_masking():
    _require_tpu()
    x = _noisy_batch(4, 4096, seed=4)
    want = _decode_on(_cpu(), x, 4096, n_valid=3000)
    got = _decode_on(_tpu(), x, 4096, n_valid=3000, fused_pipeline=True)
    _assert_equal_tree(want, got)


def test_tpu_device_crc_filter_matches_host_crc():
    """The MXU linear CRC + matmul compaction on real silicon: every
    slot field (8-bit-split einsum) must survive the bf16 lowering —
    the round-2 corruption class."""
    _require_tpu()
    rng = np.random.default_rng(17)
    payloads = [E.random_payload(rng) for _ in range(6)]
    audio = E.synthesize_capture(payloads, gap_bits=48)
    # corrupt one mid-frame bit cell: a deframed-but-CRC-failing frame
    third = 2 * (len(audio) // len(payloads)) + 700
    audio = audio.copy()
    audio[third:third + 5] = -audio[third:third + 5]
    t = -(-len(audio) // 512) * 512
    x = np.zeros((2, t), np.int16)
    x[:, :len(audio)] = audio

    _c, host, _ = _decode_on(_tpu(), x, len(audio), fused_pipeline=True)
    _c, dev, _ = _decode_on(_tpu(), x, len(audio), fused_pipeline=True,
                            device_crc=True)
    from gnuais_tpu.ops import demod  # noqa: F401  (API reference)
    # device path keeps only CRC-passing frames; host path keeps all.
    ok_frames = [[f for f in lst if f.crc_ok]
                 for lst in pl.extract_frames(
                     jax.tree.map(jnp.asarray, host))]
    dev_frames = pl.extract_frames(jax.tree.map(jnp.asarray, dev))
    assert (dev.crcfail > 0).all()
    for a, b in zip(ok_frames, dev_frames):
        assert len(a) == len(b) == len(payloads) - 1
        for fa, fb in zip(a, b):
            assert fb.crc_ok
            assert np.array_equal(fa.payload_bits[:fa.bufferlen],
                                  fb.payload_bits[:fb.bufferlen])


def test_tpu_dense_frames_drain():
    _require_tpu()
    from gnuais_tpu.ops import demod
    x = _noisy_batch(4, 4096, seed=5)
    xd = jax.device_put(jnp.asarray(x), _tpu())
    carry = jax.device_put(pl.init_carry(4), _tpu())
    _c, fr, _ = pl.decode_block(xd, jnp.int32(4096), carry,
                                frame_slots=16, fused_pipeline=True)
    dense = demod.dense_frames(fr, 64)
    want = pl.extract_frames(fr)
    got = pl.extract_dense(jax.tree.map(jnp.asarray, dense), 4)
    for i in range(4):
        assert len(got[i]) == len(want[i])
        for (st, en, f), wf in zip(got[i], want[i]):
            assert en > st
            assert np.array_equal(f.payload_bits[:f.bufferlen],
                                  wf.payload_bits[:wf.bufferlen])


def test_tpu_stream_grid_multi_tile():
    """S > 1024 rides extra kernel grid tiles on real silicon."""
    _require_tpu()
    x = _noisy_batch(1100, 512, seed=6, n_payloads=1, gap_bits=8)
    want = _decode_on(_cpu(), x, 512)
    got = _decode_on(_tpu(), x, 512, fused_pipeline=True)
    _assert_equal_tree(want, got)


def test_tpu_superblock_scan():
    _require_tpu()
    s, t, k = 4, 1024, 3
    x = _noisy_batch(s, k * t, seed=7, n_payloads=4, gap_bits=24)
    xd = jax.device_put(jnp.asarray(x), _tpu())
    carry = jax.device_put(pl.init_carry(s), _tpu())
    c_sup, fr_k, _ = pl.decode_superblock(xd, jnp.int32(k * t), carry, k,
                                          frame_slots=16,
                                          fused_pipeline=True)
    want_c, want_f, _ = _decode_on(_cpu(), x, k * t)
    # superblock frame batches per block must union to the one-shot
    # exact decode's frames; carry must match bit-exactly
    _assert_equal_tree(want_c, jax.tree.map(np.asarray, c_sup))
    total = np.asarray(fr_k.count).sum(axis=0)
    assert np.array_equal(total, want_f.count)


def test_tpu_superblock_pretiled_bitexact():
    """The pretiled input path (decode_superblock(pretiled_streams=S)
    on tile_superblock'd layout — the flagship throughput format) must
    be bit-identical to the row-major superblock on real silicon:
    frames AND carry, with the same kernel flags."""
    from gnuais_tpu.ops.fused import tile_superblock

    _require_tpu()
    s, t, k = 8, 2048, 3
    x = _noisy_batch(s, k * t, seed=23, n_payloads=4, gap_bits=24)
    flags = dict(frame_slots=16, fused_pipeline=True, assume_full=True,
                 kernel_guarded=False)
    xd = jax.device_put(jnp.asarray(x), _tpu())
    carry = jax.device_put(pl.init_carry(s), _tpu())
    c1, f1, _ = pl.decode_superblock(xd, jnp.int32(k * t), carry, k,
                                     **flags)
    xt = jax.jit(lambda a: tile_superblock(a, k, 8))(xd)
    c2, f2, _ = pl.decode_superblock(xt, jnp.int32(k * t), carry, k,
                                     with_peak=False,
                                     pretiled_streams=s, **flags)
    _assert_equal_tree(jax.tree.map(np.asarray, f1),
                       jax.tree.map(np.asarray, f2))
    _assert_equal_tree(jax.tree.map(np.asarray, c1),
                       jax.tree.map(np.asarray, c2))

    # single-grid long call (the flagship bench mode): one decode_block
    # walks the whole time axis — frames merge per stream, carry exact
    xf = jax.jit(lambda a: tile_superblock(a, 1, 8)[0])(xd)
    c3, f3, _ = pl.decode_block(xf, jnp.int32(k * t), carry,
                                frame_slots=48, fused_pipeline=True,
                                assume_full=True, kernel_guarded=False,
                                with_peak=False, pretiled_streams=s)
    f1h = jax.tree.map(np.asarray, f1)
    f3h = jax.tree.map(np.asarray, f3)
    for si in range(s):
        ref = [(int(f1h.start[b, si, j]), int(f1h.end[b, si, j]),
                int(f1h.length[b, si, j]), tuple(f1h.words[b, si, j]))
               for b in range(k) for j in range(int(f1h.count[b, si]))]
        got = [(int(f3h.start[si, j]), int(f3h.end[si, j]),
                int(f3h.length[si, j]), tuple(f3h.words[si, j]))
               for j in range(int(f3h.count[si]))]
        assert ref == got, si
    _assert_equal_tree(jax.tree.map(np.asarray, c1),
                       jax.tree.map(np.asarray, c3))


def test_tpu_kernel_compact_bitexact():
    """In-kernel candidate compaction on real silicon: bit-exact vs the
    CPU exact chain, in both the plain and the flagship-flag variants
    (SL32 + mxu FIR is packet-parity-gated like the other mxu modes, so
    that combination compares against the non-compact kernel with the
    SAME flags instead)."""
    _require_tpu()
    x = _noisy_batch(8, 4096, seed=41)
    want = _decode_on(_cpu(), x, 4096)
    got = _decode_on(_tpu(), x, 4096, fused_pipeline=True,
                     kernel_compact=True)
    _assert_equal_tree(want, got)
    # flagship flags: compact vs non-compact on-device, same flags
    base = dict(fused_pipeline=True, assume_full=True,
                kernel_guarded=False, kernel_sublanes=32, mxu_fir=True,
                kernel_unroll=64)
    _c1, f1, _ = _decode_on(_tpu(), x, 4096, **base)
    _c2, f2, _ = _decode_on(_tpu(), x, 4096, kernel_compact=True, **base)
    for name in f1._fields:
        assert np.array_equal(np.asarray(getattr(f1, name)),
                              np.asarray(getattr(f2, name))), name
    # frame_slots=24 (not a PG=16 multiple): the paged merge's clamped
    # final page must lower cleanly on Mosaic and stay bit-exact; with
    # device_crc composed on top
    _c3, f3, _ = _decode_on(_tpu(), x, 4096, frame_slots=24,
                            fused_pipeline=True, device_crc=True)
    _c4, f4, _ = _decode_on(_tpu(), x, 4096, frame_slots=24,
                            fused_pipeline=True, device_crc=True,
                            kernel_compact=True)
    for name in f3._fields:
        assert np.array_equal(np.asarray(getattr(f3, name)),
                              np.asarray(getattr(f4, name))), name


def test_tpu_wide_sublane_tiles_bitexact():
    """kernel_sublanes=16 (wider stream tiles: more independent lane
    chains pipelining the latency-bound recurrence) must stay
    bit-exact vs the CPU exact chain on real silicon.  (32-sublane
    tiles need the main-lobe FIR to fit VMEM, covered below.)"""
    _require_tpu()
    x = _noisy_batch(8, 4096, seed=31)
    want = _decode_on(_cpu(), x, 4096)
    got = _decode_on(_tpu(), x, 4096, fused_pipeline=True,
                     kernel_sublanes=16)
    _assert_equal_tree(want, got)


def test_tpu_flagship_lobe_sl32_packet_parity():
    """The flagship bench mode (kernel_sublanes=32 + main-lobe FIR) on
    real silicon: the lobe FIR pairs mirrored taps, which reorders the
    f32 accumulation — like mxu_fir it is packet-parity-gated, not
    bit-exact (signs can flip for sums within rounding noise of 0)."""
    _require_tpu()
    x = _noisy_batch(8, 4096, seed=37)
    _cv, v, _ = _decode_on(_tpu(), x, 4096, fused_pipeline=True)
    _cm, m, _ = _decode_on(_tpu(), x, 4096, fused_pipeline=True,
                           kernel_sublanes=32, lobe_fir=True)
    assert np.array_equal(v.count, m.count)
    for s in range(x.shape[0]):
        k = v.count[s]
        assert np.array_equal(v.words[s, :k], m.words[s, :k])
        assert np.array_equal(v.length[s, :k], m.length[s, :k])
        # a rounding-marginal sign flip can move a DPLL emission by a
        # sample, shifting recorded positions without touching payload
        # bits — the same +-2 jitter envelope the overlap-resync paths
        # tolerate (sharded.OWN_MARGIN)
        assert np.abs(v.start[s, :k] - m.start[s, :k]).max() <= 2
        assert np.abs(v.end[s, :k] - m.end[s, :k]).max() <= 2


def test_tpu_mxu_fir_packet_parity():
    """mxu_fir relaxes bit-exactness of the FIR but must keep packet
    decisions on captures (the documented gate).  Runs the REAL MXU
    lowering — the interpreter cannot represent its bf16 passes."""
    _require_tpu()
    x = _noisy_batch(8, 4096, seed=23)
    _cv, v, _ = _decode_on(_tpu(), x, 4096, fused_pipeline=True)
    _cm, m, _ = _decode_on(_tpu(), x, 4096, fused_pipeline=True,
                           mxu_fir=True)
    assert np.array_equal(v.count, m.count)
    for s in range(x.shape[0]):
        k = v.count[s]
        assert np.array_equal(v.words[s, :k], m.words[s, :k])
        assert np.array_equal(v.length[s, :k], m.length[s, :k])


def test_tpu_exact_fir_sl32_bitexact():
    """Exact-order FIR at kernel_sublanes=32 (fits VMEM since the
    Mosaic cap was raised to 100 MB): bit-exact vs the CPU exact chain
    — the round-4 bit-exact bench config."""
    _require_tpu()
    x = _noisy_batch(8, 4096, seed=41)
    want = _decode_on(_cpu(), x, 4096)
    got = _decode_on(_tpu(), x, 4096, fused_pipeline=True,
                     kernel_sublanes=32, kernel_guarded=False)
    _assert_equal_tree(want, got)


def test_tpu_assume_full_unguarded_bitexact():
    """assume_full (valid gates compiled out) + kernel_guarded=False
    (unconditional snapshot selects) on silicon: bit-exact vs the CPU
    exact chain for a full block."""
    _require_tpu()
    x = _noisy_batch(8, 4096, seed=43)
    want = _decode_on(_cpu(), x, 4096)
    got = _decode_on(_tpu(), x, 4096, fused_pipeline=True,
                     assume_full=True, kernel_guarded=False)
    _assert_equal_tree(want, got)


def test_tpu_flagship_mode_packet_parity():
    """The round-4 flagship bench mode (mxu FIR, 32 sublanes, unroll
    64, unguarded, assume_full) on real silicon: packet decisions equal
    the exact kernel's; positions within the +-2 rounding-jitter
    envelope."""
    _require_tpu()
    x = _noisy_batch(8, 4096, seed=47)
    _cv, v, _ = _decode_on(_tpu(), x, 4096, fused_pipeline=True)
    _cm, m, _ = _decode_on(_tpu(), x, 4096, fused_pipeline=True,
                           kernel_sublanes=32, mxu_fir=True,
                           kernel_unroll=64, kernel_guarded=False,
                           assume_full=True)
    assert np.array_equal(v.count, m.count)
    for s in range(x.shape[0]):
        k = v.count[s]
        assert np.array_equal(v.words[s, :k], m.words[s, :k])
        assert np.array_equal(v.length[s, :k], m.length[s, :k])
        assert np.abs(v.start[s, :k] - m.start[s, :k]).max(initial=0) <= 2
        assert np.abs(v.end[s, :k] - m.end[s, :k]).max(initial=0) <= 2


def test_tpu_iq_frontend_demodulates_on_silicon():
    """The split-rail IQ front-end (no complex64, no conv — this
    plugin implements neither) must demodulate on the real TPU and
    yield audio whose decoded frames equal the CPU front-end's.
    (Float atan2/multiply may differ by ulps between backends, so the
    contract is packet-level, not sample-level.)"""
    _require_tpu()
    from gnuais_tpu.ops.discriminator import (design_decim_fir, init_iq,
                                              iq_to_int16_audio)
    from gnuais_tpu.golden.model import GoldenReceiver

    decim = 4
    rng = np.random.default_rng(53)
    audio = E.synthesize_capture([E.random_payload(rng)
                                  for _ in range(3)], gap_bits=64)
    x = np.repeat(audio.astype(np.float64) / 32767.0, decim)
    phase = 2 * np.pi * np.cumsum(x * 2400.0) / (48000.0 * decim)
    ii = np.cos(phase).astype(np.float32)[None, :]
    qq = np.sin(phase).astype(np.float32)[None, :]
    taps = jnp.asarray(design_decim_fir(decim))

    outs = {}
    for name, dev in (("cpu", _cpu()), ("tpu", _tpu())):
        out, _ = iq_to_int16_audio(
            jax.device_put(jnp.asarray(ii), dev),
            jax.device_put(jnp.asarray(qq), dev),
            jax.device_put(init_iq(1), dev),
            jax.device_put(taps, dev), decim)
        outs[name] = np.asarray(out)[0]

    for name, out in outs.items():
        g = GoldenReceiver("A")
        frames = g.run_block(out)
        assert len(frames) == 3, (name, len(frames))
        assert all(f.crc_ok for f in frames), name


def test_tpu_cli_mesh_smoke():
    """The PRODUCT path on silicon: the CLI's meshshape streaming
    decode runs on the real TPU (fused kernel, TimeParSession, drains)
    and its stdout + counters are byte-identical to the CPU sequential
    session.  Pins the whole user-facing chain compiled-on-chip, not
    just the kernel entry points."""
    _require_tpu()
    import subprocess
    import sys as _sys
    import tempfile

    from gnuais_tpu.golden import encoder as _E

    rng = np.random.default_rng(1001)
    audio = _E.synthesize_capture([_E.random_payload(rng)
                                   for _ in range(12)], gap_bits=600)
    noisy = np.clip(audio + rng.normal(0, 200, len(audio)),
                    -32768, 32767).astype(np.int16)
    tmp = tempfile.mkdtemp()
    cap = os.path.join(tmp, "c.raw")
    noisy.tofile(cap)

    def run(conf_text, name, on_tpu):
        p = os.path.join(tmp, name)
        with open(p, "w") as f:
            f.write(conf_text)
        env = dict(os.environ, XDG_CONFIG_HOME=tmp,
                   JAX_COMPILATION_CACHE_DIR=os.path.join(
                       os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))), ".jax_cache"))
        if on_tpu:
            env.pop("JAX_PLATFORMS", None)
        else:
            env["JAX_PLATFORMS"] = "cpu"
        r = subprocess.run(
            [_sys.executable, "-m", "gnuais_tpu.cli", "-c", p],
            capture_output=True, text=True, timeout=900, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert r.returncode == 0, r.stderr[-500:]
        return r

    mesh = run(f"soundchannels mono\nmeshshape 1 1\ntimeparblock 4096\n"
               f"soundinfile {cap}\n", "m.conf", on_tpu=True)
    seq = run(f"soundchannels mono\nsoundinfile {cap}\n", "s.conf",
              on_tpu=False)
    assert seq.stdout.splitlines(), "fixture decoded nothing"
    assert mesh.stdout.splitlines() == seq.stdout.splitlines()
