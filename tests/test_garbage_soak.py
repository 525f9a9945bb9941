"""Garbage-audio soak parity (VERDICT r4 #7): seeded frameless noise
and randomly corrupted frames through the oracle and ALL FOUR decode
paths (sequential, lanes, mesh, grouped mesh) must produce exactly
equal received / wrong-CRC / wrong-size counters (ais.c:296-310) and
identical stdout — the cheapest catch for false-positive preamble-hunt
divergence that clean fixtures can't see.

Default tier runs seconds of audio; ``-m slow`` soaks minutes."""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

from gnuais_tpu.golden import encoder as E
from tests.oracle_utils import run_oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-800:]
    return r


def _counters(stderr):
    out = {}
    for m in re.finditer(
            r"(\w): Received correctly: (\d+) packets, wrong CRC: (\d+) "
            r"packets, wrong size: (\d+) packets", stderr):
        out[m.group(1)] = tuple(int(m.group(i)) for i in (2, 3, 4))
    return out


def _noise_capture(rng, seconds):
    """Pure frameless gaussian noise at a level that keeps the slicer
    busy (transitions everywhere -> inside the resync envelope)."""
    n = seconds * 48_000
    return np.clip(rng.normal(0, 4000, n), -32768, 32767).astype(np.int16)


def _corrupted_capture(rng, n_frames, flips):
    """Real frames with random 5-sample bit-cell inversions sprinkled
    in: a mix of good frames, wrong-CRC frames and wrong-size stops."""
    payloads = [E.random_payload(rng) for _ in range(n_frames)]
    audio = E.synthesize_capture(payloads, gap_bits=500).copy()
    for _ in range(flips):
        pos = int(rng.integers(0, len(audio) - 5))
        audio[pos:pos + 5] = -audio[pos:pos + 5]
    return np.clip(audio + rng.normal(0, 200, len(audio)),
                   -32768, 32767).astype(np.int16)


def _soak(oracle_bin, tmp_path, capture, tag):
    cap = tmp_path / f"{tag}.raw"
    capture.tofile(cap)

    out_lines, _ipc, err = run_oracle(oracle_bin, capture, "mono",
                                      timeout=600)
    want = _counters(err)
    assert "A" in want, err[-500:]

    runs = {
        "seq": f"soundchannels mono\nsoundinfile {cap}\n",
        "lanes": f"soundchannels mono\nstreams 4\nsoundinfile {cap}\n",
        "mesh": (f"soundchannels mono\nmeshshape 1 8\ntimeparblock "
                 f"6144\nsoundinfile {cap}\n"),
        "grouped": (f"soundchannels mono\nmeshshape 4 2\ntimeparblock "
                    f"4096\nsoundinfile {cap}\n"),
    }
    for name, conf in runs.items():
        r = _run_cli(conf, tmp_path, f"{tag}_{name}.conf")
        assert _counters(r.stderr) == want, (tag, name, want,
                                             _counters(r.stderr))
        assert r.stdout.splitlines() == out_lines, (tag, name)


def test_noise_soak_counter_parity(oracle_bin, tmp_path):
    rng = np.random.default_rng(2026)
    _soak(oracle_bin, tmp_path, _noise_capture(rng, 12), "noise")


def test_corrupted_frames_counter_parity(oracle_bin, tmp_path):
    rng = np.random.default_rng(2027)
    _soak(oracle_bin, tmp_path, _corrupted_capture(rng, 20, 40), "flip")


@pytest.mark.slow
def test_noise_soak_minutes(oracle_bin, tmp_path):
    rng = np.random.default_rng(2028)
    _soak(oracle_bin, tmp_path, _noise_capture(rng, 180), "noise_long")


@pytest.mark.slow
def test_corrupted_soak_minutes(oracle_bin, tmp_path):
    rng = np.random.default_rng(2029)
    _soak(oracle_bin, tmp_path, _corrupted_capture(rng, 300, 600),
          "flip_long")
