"""Cluster topology planning (pure parts; multi-process runtime is
exercised by the driver's dryrun, not here)."""

import numpy as np
import pytest

import jax

from gnuais_tpu.parallel.cluster import (global_counter_sum,
                                         local_stream_rows,
                                         make_cluster_mesh, plan_mesh_axes)


def test_plan_mesh_axes():
    assert plan_mesh_axes(8, 4, 1) == (8, 1)
    assert plan_mesh_axes(8, 4, 2) == (4, 2)
    assert plan_mesh_axes(8, 4, 4) == (2, 4)
    with pytest.raises(ValueError):
        plan_mesh_axes(8, 4, 8)   # halos would cross DCN
    with pytest.raises(ValueError):
        plan_mesh_axes(6, 4, 4)   # not divisible


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_cluster_mesh_and_rows():
    mesh = make_cluster_mesh(time_shards=2)
    assert mesh.shape == {"streams": 4, "time": 2}
    rows = local_stream_rows(mesh, 64)
    assert rows == slice(0, 64)   # single process owns everything


def test_counter_sum_single_process():
    x = np.array([1, 2, 3])
    assert np.array_equal(global_counter_sum(x), x)


def test_cluster_cli_two_process(tmp_path):
    """Multi-host CLI surface (VERDICT r4 #4, BASELINE config 5): the
    SAME `gnuais-tpu --cluster coord N rank` command on every host
    brings up the multi-controller runtime and decodes a stereo capture
    over the global 2x4 mesh — rank 0's stdout and BOTH ranks' counters
    byte-identical to a single-process run."""
    import os
    import re
    import socket
    import subprocess
    import sys

    from gnuais_tpu.golden import encoder as E

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = np.random.default_rng(107)
    pay_a = [E.random_payload(rng) for _ in range(6)]
    pay_b = [E.random_payload(rng) for _ in range(6)]
    a = E.synthesize_capture(pay_a, gap_bits=700, lead_in_bits=64)
    b = E.synthesize_capture(pay_b, gap_bits=640, lead_in_bits=900)
    n = max(len(a), len(b))
    a = np.clip(np.pad(a, (0, n - len(a)))
                + rng.normal(0, 200, n), -32768, 32767).astype(np.int16)
    b = np.clip(np.pad(b, (0, n - len(b)))
                + rng.normal(0, 200, n), -32768, 32767).astype(np.int16)
    cap = tmp_path / "stereo.raw"
    E.interleave_stereo(a, b).tofile(cap)

    conf = tmp_path / "fleet.conf"
    conf.write_text(f"soundchannels both\nmeshshape 2 4\n"
                    f"timeparblock 6144\nsoundinfile {cap}\n")

    def counters(stderr):
        out = {}
        for m in re.finditer(
                r"(\w): Received correctly: (\d+) packets, wrong CRC: "
                r"(\d+) packets, wrong size: (\d+) packets", stderr):
            out[m.group(1)] = tuple(int(m.group(i)) for i in (2, 3, 4))
        return out

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XDG_CONFIG_HOME=str(tmp_path))

    # single-process reference: the plain sequential session
    env1 = dict(env)
    flags = env1.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env1["XLA_FLAGS"] = (flags +
                             " --xla_force_host_platform_device_count=8")
    seq_conf = tmp_path / "seq.conf"
    seq_conf.write_text(f"soundchannels both\nsoundinfile {cap}\n")
    seq = subprocess.run(
        [sys.executable, "-m", "gnuais_tpu.cli", "-c", str(seq_conf)],
        capture_output=True, text=True, timeout=600, env=env1, cwd=REPO)
    assert seq.returncode == 0, seq.stderr[-800:]
    assert seq.stdout.splitlines(), "fixture decoded nothing"

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    env2 = dict(env)
    env2["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                         + " --xla_force_host_platform_device_count=4")
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "gnuais_tpu.cli", "-c", str(conf),
             "--cluster", f"127.0.0.1:{port}", "2", str(rank)],
            env=env2, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=REPO)
        for rank in range(2)
    ]
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((out, err))
        assert p.returncode == 0, f"rank {rank}:\n{err[-2000:]}"
    assert "Cluster: process 0/2" in outs[0][1]

    # cluster mode shields fd 1 from native-library chatter (the CPU
    # collectives transport writes connection banners from C++), so the
    # captured stdout must be PURE AIS output — byte-identical to the
    # single-process run, no filtering
    assert outs[0][0].splitlines() == seq.stdout.splitlines()
    assert outs[1][0] == ""                      # quiet replica rank
    cs = counters(seq.stderr)
    assert counters(outs[0][1]) == cs
    assert counters(outs[1][1]) == cs
