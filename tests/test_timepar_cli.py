"""Time-parallel CLI paths vs the sequential session: stereo support,
reference emission ordering, and the full accounting counters
(received / wrong CRC / wrong size, ais.c:296-310)."""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

from gnuais_tpu.golden import encoder as E

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _stereo_capture(tmp_path, rng, n_a=6, n_b=6):
    """Stereo capture whose A/B frames interleave nontrivially: B is
    shifted so some B frames start after but STOP before concurrent A
    frames — the case that distinguishes stop-position emission
    ordering from start-position ordering."""
    pay_a = [E.random_payload(rng) for _ in range(n_a)]
    pay_b = [E.random_payload(rng) for _ in range(n_b)]
    a = E.synthesize_capture(pay_a, gap_bits=700, lead_in_bits=64)
    b = E.synthesize_capture(pay_b, gap_bits=640, lead_in_bits=900)
    n = max(len(a), len(b))
    a = np.pad(a, (0, n - len(a)))
    b = np.pad(b, (0, n - len(b)))
    noise_a = rng.normal(0, 200, n)
    noise_b = rng.normal(0, 200, n)
    a = np.clip(a + noise_a, -32768, 32767).astype(np.int16)
    b = np.clip(b + noise_b, -32768, 32767).astype(np.int16)
    cap = tmp_path / "stereo.raw"
    E.interleave_stereo(a, b).tofile(cap)
    return cap


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


def _counters(stderr):
    out = {}
    for m in re.finditer(
            r"(\w): Received correctly: (\d+) packets, wrong CRC: (\d+) "
            r"packets, wrong size: (\d+) packets", stderr):
        out[m.group(1)] = tuple(int(m.group(i)) for i in (2, 3, 4))
    return out


def test_stereo_lanes_stdout_and_counters_match_sequential(tmp_path):
    """`streams N` + soundchannels both: stdout byte-identical to the
    sequential session (A/B interleaving included) and the three
    counters equal per channel."""
    rng = np.random.default_rng(41)
    cap = _stereo_capture(tmp_path, rng)

    seq = _run_cli(f"soundchannels both\nsoundinfile {cap}\n",
                   tmp_path, "seq.conf")
    par = _run_cli(f"soundchannels both\nstreams 4\nsoundinfile {cap}\n",
                   tmp_path, "par.conf")
    assert seq.stdout.splitlines(), "fixture decoded nothing"
    assert par.stdout.splitlines() == seq.stdout.splitlines()
    assert _counters(par.stderr) == _counters(seq.stderr)


def test_stereo_mesh_streaming_stdout_and_counters(tmp_path):
    """`meshshape 2 4` + both: stereo rows ride the streams mesh axis,
    super-blocks stream through TimeParSession (three pushes here), and
    stdout + counters match the sequential session."""
    rng = np.random.default_rng(43)
    cap = _stereo_capture(tmp_path, rng, n_a=8, n_b=8)

    seq = _run_cli(f"soundchannels both\nsoundinfile {cap}\n",
                   tmp_path, "seq.conf")
    par = _run_cli(
        f"soundchannels both\nmeshshape 2 4\ntimeparblock 6144\n"
        f"soundinfile {cap}\n", tmp_path, "mesh.conf")
    assert "Mesh decode: 2x4 devices" in par.stderr
    assert seq.stdout.splitlines(), "fixture decoded nothing"
    assert par.stdout.splitlines() == seq.stdout.splitlines()
    assert _counters(par.stderr) == _counters(seq.stderr)


def test_mono_mesh_wrong_crc_and_size_counters(tmp_path):
    """Inject a mid-frame bit-cell inversion (wrong CRC on both sides)
    and check the mesh path's counters equal the sequential session's —
    including the position-gated wrong-size count."""
    rng = np.random.default_rng(47)
    payloads = [E.random_payload(rng) for _ in range(10)]
    audio = E.synthesize_capture(payloads, gap_bits=600)
    audio = audio.copy()
    # invert one 5-sample bit cell inside the fourth frame
    cell = 3 * (len(audio) // len(payloads)) + 800
    audio[cell:cell + 5] = -audio[cell:cell + 5]
    noisy = np.clip(audio + rng.normal(0, 200, len(audio)),
                    -32768, 32767).astype(np.int16)
    cap = tmp_path / "mono.raw"
    noisy.tofile(cap)

    seq = _run_cli(f"soundchannels mono\nsoundinfile {cap}\n",
                   tmp_path, "seq.conf")
    par = _run_cli(
        f"soundchannels mono\nmeshshape 1 8\ntimeparblock 6144\n"
        f"soundinfile {cap}\n", tmp_path, "mesh.conf")
    cs, cp = _counters(seq.stderr), _counters(par.stderr)
    assert cs["A"][1] >= 1, cs        # the injected wrong-CRC frame
    assert cp == cs, (cp, cs)
    assert par.stdout.splitlines() == seq.stdout.splitlines()


def test_mono_grouped_mesh_fills_idle_rows(tmp_path):
    """meshshape 4 2 with a MONO capture: the grouped session splits
    the channel's super-block into 4 row segments so every mesh row
    decodes real data (no idle rows, no warning); stdout and all three
    counters equal the sequential session — across multiple pushes AND
    the partial final block (the row-padded fallback flush)."""
    rng = np.random.default_rng(71)
    payloads = [E.random_payload(rng) for _ in range(36)]
    audio = E.synthesize_capture(payloads, gap_bits=500)
    # one injected wrong-CRC frame exercises the bad-frame dedup across
    # row seams too: compute frame 5's exact mid-payload sample from
    # the encoder's bit layout (lead_in + frames + gaps are contiguous)
    audio = audio.copy()
    bit = 64 + sum(len(E.frame_line_bits(p)) + 500 for p in payloads[:5])
    cell = (bit + 200) * 5
    audio[cell:cell + 5] = -audio[cell:cell + 5]
    noisy = np.clip(audio + rng.normal(0, 200, len(audio)),
                    -32768, 32767).astype(np.int16)
    # not a multiple of the 32768-sample grouped super-block -> the
    # final push takes the exact-valid_end fallback path
    assert len(noisy) % 32768 != 0
    cap = tmp_path / "mono.raw"
    noisy.tofile(cap)

    seq = _run_cli(f"soundchannels mono\nsoundinfile {cap}\n",
                   tmp_path, "seq.conf")
    par = _run_cli(
        f"soundchannels mono\nmeshshape 4 2\ntimeparblock 4096\n"
        f"soundinfile {cap}\n", tmp_path, "mesh.conf")
    assert "x 4 row segments" in par.stderr     # grouped layout engaged
    assert "idle" not in par.stderr             # warning gone
    assert seq.stdout.splitlines(), "fixture decoded nothing"
    assert par.stdout.splitlines() == seq.stdout.splitlines()
    cs, cp = _counters(seq.stderr), _counters(par.stderr)
    assert cs["A"][1] >= 1, cs                  # injected wrong-CRC seen
    assert cp == cs, (cp, cs)


def test_stereo_grouped_mesh_two_segments_per_channel(tmp_path):
    """meshshape 4 2 with a STEREO capture: two channels x two row
    segments each — the grouped path under multi-channel interleaving
    must keep stdout (A/B emission ordering) and counters exact."""
    rng = np.random.default_rng(73)
    cap = _stereo_capture(tmp_path, rng, n_a=10, n_b=10)

    seq = _run_cli(f"soundchannels both\nsoundinfile {cap}\n",
                   tmp_path, "seq.conf")
    par = _run_cli(
        f"soundchannels both\nmeshshape 4 2\ntimeparblock 4096\n"
        f"soundinfile {cap}\n", tmp_path, "mesh.conf")
    assert "x 2 row segments" in par.stderr
    assert seq.stdout.splitlines(), "fixture decoded nothing"
    assert par.stdout.splitlines() == seq.stdout.splitlines()
    assert _counters(par.stderr) == _counters(seq.stderr)


def test_low_latency_knob(tmp_path):
    """--low-latency pins the shard size to the 4096-sample resync
    floor (smallest super-block per mesh time axis) while staying
    byte-identical to the sequential session."""
    rng = np.random.default_rng(79)
    payloads = [E.random_payload(rng) for _ in range(12)]
    audio = E.synthesize_capture(payloads, gap_bits=600)
    noisy = np.clip(audio + rng.normal(0, 200, len(audio)),
                    -32768, 32767).astype(np.int16)
    cap = tmp_path / "cap.raw"
    noisy.tofile(cap)

    seq = _run_cli(f"soundchannels mono\nsoundinfile {cap}\n",
                   tmp_path, "seq.conf")
    conf = tmp_path / "ll.conf"
    conf.write_text(f"soundchannels mono\nmeshshape 1 2\n"
                    f"timeparblock 16384\nsoundinfile {cap}\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XDG_CONFIG_HOME=str(tmp_path))
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags +
                            " --xla_force_host_platform_device_count=8")
    r = subprocess.run(
        [sys.executable, "-m", "gnuais_tpu.cli", "-c", str(conf),
         "--low-latency"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-800:]
    # the knob overrides the configured 16384 down to the 4096 floor
    assert "4096-sample shards" in r.stderr
    assert r.stdout.splitlines() == seq.stdout.splitlines()
    assert _counters(r.stderr) == _counters(seq.stderr)


def test_live_fifo_mesh_streaming(tmp_path):
    """Live (FIFO) input through the meshshape streaming path: the CLI
    consumes `-l <fifo>` block-by-block, TimeParSession chains the
    super-blocks, and stdout + counters equal the sequential session's
    file decode of the same bytes — the live scale-out seam the mesh
    path was built for."""
    import threading

    rng = np.random.default_rng(53)
    payloads = [E.random_payload(rng) for _ in range(8)]
    audio = E.synthesize_capture(payloads, gap_bits=600)
    noisy = np.clip(audio + rng.normal(0, 200, len(audio)),
                    -32768, 32767).astype(np.int16)
    cap = tmp_path / "cap.raw"
    noisy.tofile(cap)

    seq = _run_cli(f"soundchannels mono\nsoundinfile {cap}\n",
                   tmp_path, "seq.conf")
    assert seq.stdout.splitlines(), "fixture decoded nothing"

    fifo = tmp_path / "live.fifo"
    os.mkfifo(fifo)

    def feed():
        # writer blocks until the CLI opens the FIFO for reading
        with open(fifo, "wb") as f:
            f.write(noisy.astype("<i2").tobytes())

    t = threading.Thread(target=feed)
    t.start()
    try:
        par = _run_cli(
            f"soundchannels mono\nmeshshape 1 8\ntimeparblock 6144\n"
            f"soundinfile {fifo}\n", tmp_path, "live.conf")
    finally:
        t.join(timeout=10)
    assert "Mesh decode: 1x8 devices" in par.stderr
    assert par.stdout.splitlines() == seq.stdout.splitlines()
    assert _counters(par.stderr) == _counters(seq.stderr)


def test_left_right_channel_modes_through_lanes(tmp_path):
    """`soundchannels left`/`right` select one channel of a stereo
    capture (ais.c:236-248 routing); the lane decode must reproduce
    the sequential session's stdout and counters for both modes."""
    rng = np.random.default_rng(59)
    cap = _stereo_capture(tmp_path, rng, n_a=5, n_b=5)
    for mode in ("left", "right"):
        seq = _run_cli(f"soundchannels {mode}\nsoundinfile {cap}\n",
                       tmp_path, f"seq_{mode}.conf")
        assert seq.stdout.splitlines(), (mode, "decoded nothing")
        par = _run_cli(
            f"soundchannels {mode}\nstreams 4\nsoundinfile {cap}\n",
            tmp_path, f"par_{mode}.conf")
        assert par.stdout.splitlines() == seq.stdout.splitlines(), mode
        assert _counters(par.stderr) == _counters(seq.stderr), mode


def test_wav_input_through_lanes(tmp_path):
    """WAV captures (the non-memmappable input form) decode through
    the lane path identically to the sequential session."""
    from gnuais_tpu.io.audio import write_wav

    rng = np.random.default_rng(67)
    audio = E.synthesize_capture([E.random_payload(rng) for _ in range(5)],
                                 gap_bits=500)
    noisy = np.clip(audio + rng.normal(0, 200, len(audio)),
                    -32768, 32767).astype(np.int16)
    cap = tmp_path / "cap.wav"
    write_wav(cap, noisy)

    seq = _run_cli(f"soundchannels mono\nsoundinfile {cap}\n",
                   tmp_path, "seq.conf")
    assert seq.stdout.splitlines(), "fixture decoded nothing"
    par = _run_cli(f"soundchannels mono\nstreams 4\nsoundinfile {cap}\n",
                   tmp_path, "par.conf")
    assert par.stdout.splitlines() == seq.stdout.splitlines()
    assert _counters(par.stderr) == _counters(seq.stderr)
