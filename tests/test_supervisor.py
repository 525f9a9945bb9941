"""SupervisedDecoder: exact mid-run recovery.

A failure injected at an arbitrary block must not change the decoded
output or the counters — the supervisor restores the last checkpoint
and replays, and the pipeline's determinism makes the result identical
to an uninterrupted run.  A process 'crash' (new SupervisedDecoder over
the same checkpoint file) must resume exactly as well."""

import numpy as np
import pytest

from gnuais_tpu.golden import encoder as E
from gnuais_tpu.runtime.pipeline import BatchPipeline
from gnuais_tpu.runtime.supervisor import DecodeFailure, SupervisedDecoder


BL = 1024


def _capture(n_payloads=8, seed=21):
    rng = np.random.default_rng(seed)
    audio = E.synthesize_capture(
        [E.random_payload(rng) for _ in range(n_payloads)], gap_bits=40)
    n_blocks = -(-len(audio) // BL)
    audio = np.pad(audio, (0, n_blocks * BL - len(audio)))
    return audio, n_blocks


def _payloads(frames):
    return [f.payload_bits[:f.bufferlen].tobytes() for f in frames]


class FlakyPipeline(BatchPipeline):
    """Raises once at a chosen absolute block index."""

    fail_at = None        # class attrs: shared across rebuilds,
    calls = 0             # like a real transient device fault

    def process(self, samples):
        FlakyPipeline.calls += 1
        if FlakyPipeline.calls - 1 == FlakyPipeline.fail_at:
            raise RuntimeError("injected device failure")
        return super().process(samples)


@pytest.mark.parametrize("fail_block", [0, 3, 5])
def test_recovery_is_exact(tmp_path, fail_block):
    audio, n_blocks = _capture()

    ref = BatchPipeline(1, block_len=BL, frame_slots=16)
    want = []
    for b in range(n_blocks):
        want += ref.process(audio[None, b * BL:(b + 1) * BL])[0]
    want_counters = (ref.counters[0].receivedframes,
                     ref.counters[0].lostframes,
                     ref.counters[0].lostframes2)

    FlakyPipeline.fail_at = fail_block
    FlakyPipeline.calls = 0
    events = []
    sup = SupervisedDecoder(
        lambda: FlakyPipeline(1, block_len=BL, frame_slots=16),
        tmp_path / "ckpt.npz", checkpoint_every=2, retry_backoff=0.0,
        on_event=lambda k, d: events.append(k))
    got = []
    for b in range(n_blocks):
        got += sup.process(audio[None, b * BL:(b + 1) * BL])[0]

    assert _payloads(got) == _payloads(want)
    c = sup.counters[0]
    assert (c.receivedframes, c.lostframes, c.lostframes2) == want_counters
    assert "failure" in events and "recovered" in events


def test_crash_restart_resumes_exactly(tmp_path):
    audio, n_blocks = _capture(seed=33)

    ref = BatchPipeline(1, block_len=BL, frame_slots=16)
    want = []
    for b in range(n_blocks):
        want += ref.process(audio[None, b * BL:(b + 1) * BL])[0]

    path = tmp_path / "ckpt.npz"
    mk = lambda: BatchPipeline(1, block_len=BL, frame_slots=16)  # noqa: E731
    sup1 = SupervisedDecoder(mk, path, checkpoint_every=2)
    got = []
    half = (n_blocks // 2) // 2 * 2        # stop ON a checkpoint boundary
    for b in range(half):
        got += sup1.process(audio[None, b * BL:(b + 1) * BL])[0]
    del sup1                                # simulated process death

    sup2 = SupervisedDecoder(mk, path, checkpoint_every=2)
    off = sup2.resume_offset()
    assert off == half * BL                 # seek point for the input
    for b in range(half, n_blocks):
        got += sup2.process(audio[None, b * BL:(b + 1) * BL])[0]

    assert _payloads(got) == _payloads(want)
    c, r = sup2.counters[0], ref.counters[0]
    assert (c.receivedframes, c.lostframes, c.lostframes2) == \
           (r.receivedframes, r.lostframes, r.lostframes2)


def test_unrecoverable_raises(tmp_path):
    audio, _ = _capture(n_payloads=2, seed=1)

    class AlwaysFails(BatchPipeline):
        def process(self, samples):
            raise RuntimeError("hard fault")

    sup = SupervisedDecoder(
        lambda: AlwaysFails(1, block_len=BL, frame_slots=16),
        tmp_path / "ckpt.npz", max_retries=2, retry_backoff=0.0)
    with pytest.raises(DecodeFailure):
        sup.process(audio[None, :BL])
