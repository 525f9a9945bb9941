"""Streaming IQ front-end (VERDICT r3 #4): chunked on-device
demodulation with carry must equal the one-shot call bit-for-bit,
resume must reconstruct the carry exactly, and stereo IQ must decode
through the CLI paths identically to the equivalent audio capture."""

import os
import subprocess
import sys

import numpy as np

from gnuais_tpu.golden import encoder as E

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DECIM = 4


def _modulate(audio: np.ndarray, decim: int = DECIM) -> np.ndarray:
    """FM-modulate int16 audio into complex64 baseband IQ at
    48 kHz * decim (the inverse of the discriminator)."""
    x = np.repeat(audio.astype(np.float64) / 32767.0, decim)
    phase = 2 * np.pi * np.cumsum(x * 2400.0) / (48000.0 * decim)
    return np.exp(1j * phase).astype(np.complex64)


def _write_iq(path, chans):
    """chans: list of complex64 arrays (equal length) -> raw f32 file
    of interleaved per-frame [I0 Q0 I1 Q1 ...]."""
    n = min(len(c) for c in chans)
    out = np.empty((n, len(chans), 2), dtype="<f4")
    for i, c in enumerate(chans):
        out[:, i, 0] = c[:n].real
        out[:, i, 1] = c[:n].imag
    out.tofile(path)
    return n


def test_chunked_equals_oneshot_bitexact(tmp_path):
    import jax.numpy as jnp

    from gnuais_tpu.io.iq import IqStreamReader
    from gnuais_tpu.ops.discriminator import (design_decim_fir, init_iq,
                                              iq_to_int16_audio)

    rng = np.random.default_rng(5)
    a = E.synthesize_capture([E.random_payload(rng) for _ in range(3)])
    b = E.synthesize_capture([E.random_payload(rng) for _ in range(3)],
                             lead_in_bits=96)
    iq_a, iq_b = _modulate(a), _modulate(b)
    p = tmp_path / "st.iq"
    n = _write_iq(p, [iq_a, iq_b])

    reader = IqStreamReader(p, channels=2, decim=DECIM,
                            block_frames=1777)   # deliberately odd
    streamed = reader.read_all()

    m = (n // DECIM) * DECIM
    taps = jnp.asarray(design_decim_fir(DECIM, 64))
    stacked = np.stack([iq_a[:m], iq_b[:m]])
    oneshot, _ = iq_to_int16_audio(
        jnp.asarray(stacked.real.astype(np.float32)),
        jnp.asarray(stacked.imag.astype(np.float32)),
        init_iq(2, 64), taps, DECIM)
    oneshot = np.asarray(oneshot)
    inter = np.empty(oneshot.shape[1] * 2, np.int16)
    inter[0::2] = oneshot[0]
    inter[1::2] = oneshot[1]
    assert np.array_equal(streamed, inter)


def test_decimate_chunked_nondividing_decim():
    """Chunked decimation must stay on the decimation grid when decim
    does not divide the chunk length (ADVICE r4: decim 5/10/20/40 from
    common SDR rates never divide 2^14 — the old chunking shifted the
    grid at every chunk boundary and shortened the output)."""
    import jax.numpy as jnp

    from gnuais_tpu.ops.discriminator import decimate, design_decim_fir

    rng = np.random.default_rng(3)
    for decim in (5, 10, 3):
        t = decim * 8192                      # > chunk, decim-aligned
        x = rng.standard_normal((2, t)).astype(np.float32)
        hist = rng.standard_normal((2, 64)).astype(np.float32)
        taps = jnp.asarray(design_decim_fir(decim, 64))
        ref, href = decimate(jnp.asarray(x), jnp.asarray(hist), taps,
                             decim, chunk=t)          # one-shot
        out, hout = decimate(jnp.asarray(x), jnp.asarray(hist), taps,
                             decim, chunk=16384)      # chunked
        assert out.shape == (2, t // decim)
        assert np.array_equal(np.asarray(out), np.asarray(ref)), decim
        assert np.array_equal(np.asarray(hout), np.asarray(href)), decim


def test_chunked_equals_oneshot_decim5(tmp_path):
    """End-to-end reader parity at a non-power-of-two decim."""
    import jax.numpy as jnp

    from gnuais_tpu.io.iq import IqStreamReader
    from gnuais_tpu.ops.discriminator import (decimate, design_decim_fir,
                                              fm_discriminate, init_iq)

    decim = 5
    rng = np.random.default_rng(21)
    a = E.synthesize_capture([E.random_payload(rng) for _ in range(3)])
    iq = _modulate(a, decim=decim)
    p = tmp_path / "m5.iq"
    n = _write_iq(p, [iq])

    reader = IqStreamReader(p, channels=1, decim=decim,
                            block_frames=1777)
    streamed = reader.read_all()

    m = (n // decim) * decim
    taps = jnp.asarray(design_decim_fir(decim, 64))
    st = init_iq(1, 64)
    audio_hi, _, _ = fm_discriminate(
        jnp.asarray(iq[:m].real.astype(np.float32))[None],
        jnp.asarray(iq[:m].imag.astype(np.float32))[None],
        st.last_i, st.last_q)
    oneshot, _ = decimate(audio_hi, st.fir_history, taps, decim,
                          chunk=m)                    # truly unchunked
    oneshot = np.clip(np.round(np.asarray(oneshot)), -32768,
                      32767).astype(np.int16)[0]
    assert np.array_equal(streamed, oneshot)


def test_resume_reconstructs_carry_exactly(tmp_path):
    from gnuais_tpu.io.iq import IqStreamReader

    rng = np.random.default_rng(9)
    a = E.synthesize_capture([E.random_payload(rng) for _ in range(2)])
    p = tmp_path / "m.iq"
    _write_iq(p, [_modulate(a)])
    reader = IqStreamReader(p, channels=1, decim=DECIM,
                            block_frames=4096)
    full = reader.read_all()
    assert reader.n_frames > 4000
    for off in (1, 17, 63, 64, 65, 4000, reader.n_frames + 5):
        resumed = reader.read_all(skip_frames=off)
        assert np.array_equal(resumed, full[off:]), off


def _run_cli(conf_lines, tmp_path, name):
    conf = tmp_path / name
    conf.write_text(conf_lines)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XDG_CONFIG_HOME=str(tmp_path))
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags +
                            " --xla_force_host_platform_device_count=8")
    r = subprocess.run(
        [sys.executable, "-m", "gnuais_tpu.cli", "-c", str(conf)],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-800:]
    return r


def test_live_fifo_iq_matches_file_iq(tmp_path):
    """Live IQ input (VERDICT r4 #8): the same IQ bytes through a FIFO
    must decode byte-identically to the memmapped file reader — both
    via the mesh streaming path and stdout-compared."""
    import threading

    rng = np.random.default_rng(31)
    a = E.synthesize_capture([E.random_payload(rng) for _ in range(6)],
                             gap_bits=700)
    p = tmp_path / "live.iq"
    _write_iq(p, [_modulate(a)])

    base = (f"soundchannels mono\ninputformat iq\niqdecim {DECIM}\n"
            f"meshshape 1 4\ntimeparblock 6144\n")
    ref = _run_cli(base + f"soundinfile {p}\n", tmp_path, "file.conf")
    assert ref.stdout.splitlines(), "fixture decoded nothing"

    fifo = tmp_path / "live.fifo"
    os.mkfifo(fifo)
    raw = p.read_bytes()

    def feed():
        with open(fifo, "wb") as f:
            f.write(raw)

    t = threading.Thread(target=feed)
    t.start()
    try:
        live = _run_cli(base + f"soundinfile {fifo}\n", tmp_path,
                        "fifo.conf")
    finally:
        t.join(timeout=10)
    assert "Streaming IQ live" in live.stderr
    assert live.stdout.splitlines() == ref.stdout.splitlines()


def test_stereo_iq_through_mesh_and_lanes(tmp_path):
    """Stereo IQ through the sequential, lane and mesh CLI paths: all
    byte-identical to decoding the demodulated audio capture."""
    from gnuais_tpu.io.iq import IqStreamReader

    rng = np.random.default_rng(11)
    a = E.synthesize_capture([E.random_payload(rng) for _ in range(6)],
                             gap_bits=700)
    b = E.synthesize_capture([E.random_payload(rng) for _ in range(6)],
                             gap_bits=640, lead_in_bits=900)
    n = min(len(a), len(b))
    p = tmp_path / "st.iq"
    _write_iq(p, [_modulate(a[:n]), _modulate(b[:n])])

    # ground truth: demodulate once, decode as an audio capture
    audio = IqStreamReader(p, channels=2, decim=DECIM).read_all()
    cap = tmp_path / "demod.raw"
    audio.tofile(cap)
    ref = _run_cli(f"soundchannels both\nsoundinfile {cap}\n",
                   tmp_path, "ref.conf")
    assert ref.stdout.splitlines(), "fixture decoded nothing"

    base = (f"soundchannels both\ninputformat iq\niqdecim {DECIM}\n"
            f"soundinfile {p}\n")
    seq = _run_cli(base, tmp_path, "seq.conf")
    lanes = _run_cli(base + "streams 4\n", tmp_path, "lanes.conf")
    mesh = _run_cli(base + "meshshape 2 4\ntimeparblock 6144\n",
                    tmp_path, "mesh.conf")
    for name, r in (("seq", seq), ("lanes", lanes), ("mesh", mesh)):
        assert r.stdout.splitlines() == ref.stdout.splitlines(), name
        assert "Streaming IQ" in r.stderr, name
