"""Worker process for the multi-host (multi-controller) decode test.

Each process owns 4 virtual CPU devices and ingests its own stream
rows; the global mesh spans both processes (DCN = gRPC/Gloo here).
Run: python multihost_worker.py <rank> <coordinator>
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> int:
    rank = int(sys.argv[1])
    coord = sys.argv[2]
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=2, process_id=rank)
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gnuais_tpu.golden import encoder as E
    from gnuais_tpu.parallel.cluster import (global_counter_sum,
                                             local_stream_rows,
                                             make_cluster_mesh)
    from gnuais_tpu.parallel.sharded import make_sharded_decode
    from gnuais_tpu.runtime import pipeline as pl

    assert jax.device_count() == 8 and jax.local_device_count() == 4

    mesh = make_cluster_mesh(time_shards=1)
    n_streams, t = 8, 4096

    # every process can synthesize every stream deterministically, but
    # only feeds its own rows (host-local ingest contract)
    rows = local_stream_rows(mesh, n_streams)
    assert rows == slice(rank * 4, rank * 4 + 4), rows

    def stream_audio(i):
        return E.synthesize_capture(
            [E.make_type123(1, 200000000 + i, 10.0 + i, 20.0 + i),
             E.make_type18(300000000 + i, -10.0 - i, -20.0 - i)],
            gap_bits=48, lead_in_bits=64 + 8 * i)

    local = np.zeros((4, t), dtype=np.int16)
    for k, i in enumerate(range(rows.start, rows.stop)):
        a = stream_audio(i)
        local[k, : len(a)] = a

    sharding = NamedSharding(mesh, P("streams", None))
    batch = jax.make_array_from_process_local_data(sharding, local,
                                                   (n_streams, t))

    step = make_sharded_decode(mesh, frame_slots=8)
    carry = pl.init_carry(n_streams)
    carry, frames, _peak = step(batch, jnp.int32(t), carry)

    # host-local drain: only addressable rows come back to this process
    local_counts = []
    for shard in frames.count.addressable_shards:
        local_counts.append(np.asarray(shard.data))
    local_counts = np.concatenate(local_counts)
    assert (local_counts == 2).all(), local_counts

    # decode payloads of the local rows
    local_words = np.concatenate(
        [np.asarray(s.data) for s in frames.words.addressable_shards])
    local_lens = np.concatenate(
        [np.asarray(s.data) for s in frames.length.addressable_shards])
    from gnuais_tpu.golden.model import crc_check_and_extract
    from gnuais_tpu.runtime.pipeline import _reg_to_bits
    from gnuais_tpu.ais.bits import henten, pad_payload
    mmsis = []
    for r in range(local_words.shape[0]):
        for k in range(int(local_counts[r])):
            raw = _reg_to_bits(local_words[r, k], int(local_lens[r, k]) + 22)
            ok, payload = crc_check_and_extract(raw, int(local_lens[r, k]))
            assert ok
            mmsis.append(henten(8, 30, pad_payload(payload)))
    expected = []
    for i in range(rows.start, rows.stop):
        expected += [200000000 + i, 300000000 + i]
    assert mmsis == expected, (mmsis, expected)

    # cluster-wide stats reduction (one DCN collective)
    total = global_counter_sum(np.array([int(local_counts.sum())]))
    assert int(total[0]) == 16, total
    print(f"RANK{rank}_OK local={local_counts.tolist()} total={int(total[0])}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
