"""CLI checkpoint/resume: two invocations over a split capture must
produce exactly the lines of one uninterrupted run (clean-exit resume is
exactly-once; the final snapshot on close makes the seam exact)."""

import numpy as np

from gnuais_tpu import cli
from gnuais_tpu.golden import encoder as E


def _capture(seed=41, n=10):
    rng = np.random.default_rng(seed)
    return E.synthesize_capture(
        [E.random_payload(rng) for _ in range(n)], gap_bits=64)


def _run(conf, cap, capsys, extra=()):
    rc = cli.main(["-c", str(conf), "-l", str(cap), "-e", "err", *extra])
    out = capsys.readouterr().out
    assert rc == 0
    return out.splitlines()


def test_cli_checkpoint_resume_exactly_once(tmp_path, capsys):
    audio = _capture()
    conf = tmp_path / "c.conf"
    conf.write_text("backend exact\n")

    full_cap = tmp_path / "full.raw"
    np.asarray(audio, dtype="<i2").tofile(full_cap)
    want = _run(conf, full_cap, capsys)
    assert len(want) == 10

    # first run sees only a prefix (cut mid-capture, any offset), exits
    # cleanly, snapshots; second run sees the whole file and must skip
    # exactly the consumed prefix
    cut = (len(audio) // 2 // 1020) * 1020 + 500
    part_cap = tmp_path / "part.raw"
    np.asarray(audio[:cut], dtype="<i2").tofile(part_cap)

    ck = str(tmp_path / "state")
    got = _run(conf, part_cap, capsys, extra=["--checkpoint", ck])
    got += _run(conf, full_cap, capsys, extra=["--checkpoint", ck])
    assert got == want


def test_cli_checkpoint_fresh_then_noop_resume(tmp_path, capsys):
    """Resuming past EOF (everything already decoded) emits nothing."""
    audio = _capture(seed=7, n=3)
    conf = tmp_path / "c.conf"
    conf.write_text("backend exact\n")
    cap = tmp_path / "c.raw"
    np.asarray(audio, dtype="<i2").tofile(cap)

    ck = str(tmp_path / "state")
    first = _run(conf, cap, capsys, extra=["--checkpoint", ck])
    assert len(first) == 3
    again = _run(conf, cap, capsys, extra=["--checkpoint", ck])
    assert again == []
