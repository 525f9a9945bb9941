"""Checkpoint/resume for the streaming mesh decode (VERDICT r3 #5).

The scale path's cross-push state (held block, edge tails, dedup
chains, counters, pending emission queue, NMEA seqnr) is snapshotted
at push boundaries; a restored session must continue byte-identically.
"""

import os
import re
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from gnuais_tpu.golden import encoder as E

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _capture(rng, n_payloads=40, gap_bits=500):
    payloads = [E.random_payload(rng) for _ in range(n_payloads)]
    audio = E.synthesize_capture(payloads, gap_bits=gap_bits)
    return np.clip(audio + rng.normal(0, 200, len(audio)),
                   -32768, 32767).astype(np.int16)


def test_session_snapshot_restore_is_exact():
    """Push half the stream, snapshot, rebuild a FRESH session from the
    snapshot, push the rest: frames and counters equal the
    uninterrupted session's."""
    from gnuais_tpu.parallel import mesh as M
    from gnuais_tpu.parallel.timepar import TimeParSession

    rng = np.random.default_rng(83)
    stream = _capture(rng, n_payloads=24)
    sb = 4 * 6144
    n_push = len(stream) // sb
    assert n_push >= 3
    mesh = M.make_grid_mesh(1, 4)

    def collect(sess, pushes, tail):
        got = []
        for p in pushes:
            out = sess.push(p[None, :])
            if out:
                got += out[0]
        out = sess.flush(n_valid=len(tail) if len(tail) else None)
        got += out[0]
        return got

    pushes = [stream[i * sb:(i + 1) * sb] for i in range(n_push)]
    tail = stream[n_push * sb:]
    if len(tail):
        pushes.append(np.pad(tail, (0, sb - len(tail))))

    ref = TimeParSession(mesh, 1, sb, frame_slots=32)
    ref_frames = collect(ref, pushes, tail)
    assert len(ref_frames) >= 20

    half = len(pushes) // 2
    a = TimeParSession(mesh, 1, sb, frame_slots=32)
    for p in pushes[:half]:
        a.push(p[None, :])
    snap = a.snapshot()

    b = TimeParSession(mesh, 1, sb, frame_slots=32)
    b.restore(snap)
    got = []
    for p in pushes[half:]:
        out = b.push(p[None, :])
        if out:
            got += out[0]
    out = b.flush(n_valid=len(tail) if len(tail) else None)
    got += out[0]

    # the restored session must produce exactly the uninterrupted
    # session's frames from the snapshot point on
    ref_starts = [s for s, _e, _f in ref_frames]
    got_starts = [s for s, _e, _f in got]
    assert got_starts == ref_starts[len(ref_frames) - len(got):]
    assert (b.received, b.wrong_crc, b.wrong_size) == \
           (ref.received, ref.wrong_crc, ref.wrong_size)


@pytest.mark.parametrize("meshshape", ["1 8", "4 2"])
def test_cli_kill9_resume_byte_identical(tmp_path, meshshape):
    """kill -9 a mesh decode mid-run, resume from the checkpoint:
    spliced stdout (interrupted run up to the snapshot's emitted-line
    count + resumed run) is byte-identical to an uninterrupted run —
    for both the row-padded (1x8) and grouped (4x2) layouts."""
    rng = np.random.default_rng(89)
    stream = _capture(rng, n_payloads=60)
    cap = tmp_path / "cap.raw"
    stream.tofile(cap)

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XDG_CONFIG_HOME=str(tmp_path), PYTHONUNBUFFERED="1")
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags +
                            " --xla_force_host_platform_device_count=8")
    conf = tmp_path / "mesh.conf"
    conf.write_text(
        f"soundchannels mono\nmeshshape {meshshape}\n"
        f"timeparblock 4096\nsoundinfile {cap}\n")
    cmd = [sys.executable, "-m", "gnuais_tpu.cli", "-c", str(conf)]

    ref = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=600, env=env, cwd=REPO)
    assert ref.returncode == 0, ref.stderr[-500:]
    ref_lines = ref.stdout.splitlines()
    assert len(ref_lines) >= 40

    ckpt = tmp_path / "state"
    ckpt_file = tmp_path / "state.mesh.npz"

    # interrupted run: feed the capture SLOWLY through a FIFO so the
    # kill deterministically lands mid-decode (a file decode finishes
    # before a signal can be delivered)
    import threading
    fifo = tmp_path / "live.fifo"
    os.mkfifo(fifo)
    conf_fifo = tmp_path / "mesh_fifo.conf"
    conf_fifo.write_text(
        f"soundchannels mono\nmeshshape {meshshape}\n"
        f"timeparblock 4096\nsoundinfile {fifo}\n")
    stop_feed = threading.Event()

    def feed():
        try:
            with open(fifo, "wb") as f:
                raw = stream.astype("<i2").tobytes()
                for off in range(0, len(raw), 16384):
                    if stop_feed.is_set():
                        return
                    f.write(raw[off:off + 16384])
                    f.flush()
                    # slow enough that pushes (and their emissions)
                    # spread well past the initial jit compile, so the
                    # kill lands mid-decode deterministically
                    time.sleep(0.15)
        except BrokenPipeError:
            pass

    feeder = threading.Thread(target=feed)
    feeder.start()
    cmd_ck1 = [sys.executable, "-m", "gnuais_tpu.cli", "-c",
               str(conf_fifo), "--checkpoint", str(ckpt)]
    p = subprocess.Popen(cmd_ck1, stdout=subprocess.PIPE,
                         stderr=subprocess.DEVNULL, text=True,
                         env=env, cwd=REPO)
    lines1 = []
    t0 = time.time()
    killed = False
    try:
        while time.time() - t0 < 300:
            line = p.stdout.readline()
            if not line:
                break
            lines1.append(line.rstrip("\n"))
            # kill once a checkpoint exists and some output followed it
            if ckpt_file.exists() and len(lines1) >= 3:
                p.send_signal(signal.SIGKILL)
                killed = True
                break
        p.wait(timeout=60)
    finally:
        stop_feed.set()
        if p.poll() is None:
            p.kill()
        feeder.join(timeout=30)
    assert killed, (
        f"never saw checkpoint+output mid-run: {len(lines1)} lines, "
        f"ckpt={ckpt_file.exists()}")
    # drain whatever was already in the pipe at kill time
    rest = p.stdout.read()
    if rest:
        lines1 += rest.splitlines()

    data = np.load(ckpt_file, allow_pickle=True)
    emitted = int(data["meta"].item()["emitted_lines"])
    assert emitted <= len(lines1)

    # resume from the FILE (same bytes the FIFO carried): the snapshot
    # records the consumed sample count, so the source medium may differ
    res = subprocess.run(cmd + ["--checkpoint", str(ckpt)],
                         capture_output=True, text=True,
                         timeout=600, env=env, cwd=REPO)
    assert res.returncode == 0, res.stderr[-500:]
    assert "Resuming mesh decode" in res.stderr
    total = lines1[:emitted] + res.stdout.splitlines()
    assert total == ref_lines
    assert not ckpt_file.exists()        # removed on clean completion
    # counters continue across the resume
    m = re.search(r"A: Received correctly: (\d+) packets, wrong CRC: "
                  r"(\d+) packets, wrong size: (\d+)", res.stderr)
    mr = re.search(r"A: Received correctly: (\d+) packets, wrong CRC: "
                   r"(\d+) packets, wrong size: (\d+)", ref.stderr)
    assert m and mr and m.groups() == mr.groups()
