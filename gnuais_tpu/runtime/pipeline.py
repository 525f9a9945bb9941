"""Batched decode pipeline: the device program + host frame drain.

One jitted step consumes an ``[S, T]`` int16 block and the carry pytree
(FIR history + DPLL state + HDLC state), returning the new carry and the
block's frame snapshots.  The host unpacks the rare frame snapshots,
runs CRC-16 and hands CRC-passing payloads to the AIS layer.

This is the exact path (bit-identical to the reference per-sample
semantics).  The Pallas fused kernel in ops/fused.py accelerates the
same contract.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnuais_tpu import constants as C
from gnuais_tpu.golden.model import Frame, crc_check_and_extract
from gnuais_tpu.ops import demod, fir


class PipelineCarry(NamedTuple):
    history: jax.Array        # [S, 36] float32 FIR history
    dpll: demod.DpllState
    hdlc: demod.HdlcState


def init_carry(n_streams: int) -> PipelineCarry:
    return PipelineCarry(
        history=fir.init_history(n_streams),
        dpll=init_dpll(n_streams),
        hdlc=demod.init_hdlc(n_streams),
    )


def init_dpll(n_streams: int):
    return demod.init_dpll(n_streams)


def _device_crc_filter(frames: "demod.FrameBatch", s: int,
                       frame_slots: int) -> "demod.FrameBatch":
    """On-device CRC post-pass shared by every fused decode branch:
    compact first (candidate slots are ~12x the frame slots), then the
    gather-free linear CRC (ops/crc, protodec.c:120-167 semantics),
    then keep only passers — rejects land in the crcfail counter."""
    from gnuais_tpu.ops import crc as crc_ops
    ok = crc_ops.crc_check_frames_linear(
        frames.words.reshape(-1, frames.words.shape[-1]),
        frames.length.reshape(-1)).reshape(s, frame_slots)
    present = (jnp.arange(frame_slots)[None, :]
               < frames.count[:, None])
    crcfail = jnp.sum(present & jnp.logical_not(ok),
                      axis=1).astype(jnp.int32)
    kept = demod.compact_candidates(
        demod.init_frames(s, frame_slots), present & ok,
        frames.words, frames.length, frames.start, frames.end,
        lost2=frames.lost2, over=frames.dropped)
    return kept._replace(crcfail=crcfail)


@functools.partial(jax.jit,
                   static_argnames=("frame_slots", "exact_fir", "fast_dpll",
                                    "fused_frontend", "fused_pipeline",
                                    "device_crc", "mxu_fir", "lobe_fir",
                                    "kernel_sublanes", "kernel_unroll",
                                    "kernel_time_chunk", "with_peak",
                                    "assume_full", "kernel_guarded",
                                    "pretiled_streams", "kernel_compact"))
def decode_block(samples: jax.Array, n_valid: jax.Array,
                 carry: PipelineCarry, frame_slots: int = 32,
                 exact_fir: bool = True, fast_dpll: bool = False,
                 block_base: jax.Array | int = 0,
                 fused_frontend: bool = False,
                 fused_pipeline: bool = False,
                 device_crc: bool = False,
                 mxu_fir: bool = False,
                 lobe_fir: bool = False,
                 kernel_sublanes: int = 8,
                 kernel_unroll: int = 32,
                 kernel_time_chunk: int = 512,
                 with_peak: bool = True,
                 assume_full: bool = False,
                 kernel_guarded: bool = True,
                 lost2_lo: jax.Array | None = None,
                 lost2_hi: jax.Array | None = None,
                 pretiled_streams: int | None = None,
                 kernel_compact: bool = False
                 ) -> Tuple[PipelineCarry, demod.FrameBatch, jax.Array]:
    """samples: int16 [S, T]; n_valid: scalar int32 (samples actually
    present — short final blocks are padded to T).  Returns
    (carry', frames, peak [S]).

    fast_dpll selects the Pallas clock-recovery kernel (bit-identical
    semantics, no per-step scan overhead); requires T to be a multiple
    of 512 and S <= 1024 per call.  fused_frontend additionally folds
    the exact FIR and the 4-sample bit slotting into that kernel, so
    the filtered array and the per-sample bit stream never touch HBM
    (still bit-identical; same shape constraints; implies exact FIR).
    fused_pipeline folds the HDLC deframer in as well: raw samples ->
    frame snapshots in ONE kernel, no intermediate array in HBM at all.
    device_crc (fused_pipeline only) CRC-checks the candidates ON DEVICE
    (ops.crc, protodec.c:120-167 semantics) and compacts only passing
    frames into the slots; rejects are counted in frames.crcfail — the
    drain then reads back CRC-passing frames only.
    """
    if kernel_compact:
        # in-kernel candidate compaction: the kernel emits DENSE frame
        # slots per stream (arrival order, zeroed empties) — the
        # [S, K] candidate axis (~99% empty; its write+transpose+gather
        # dominated post-kernel glue in the r5 profile) never exists.
        # Bit-identical to pipeline_fused + demod.compact_candidates.
        assert fused_pipeline
        from gnuais_tpu.ops.fused import pipeline_fused_compact
        if pretiled_streams is not None:
            assert not with_peak and assume_full
            s = pretiled_streams
        else:
            s = samples.shape[0]
        (count_raw, words, length, start, end, lost2, over,
         history, dpll_state, hdlc_state) = pipeline_fused_compact(
            samples, n_valid, carry.history, carry.dpll, carry.hdlc,
            frame_slots=frame_slots, block_base=block_base,
            fir_mode=("mxu" if mxu_fir else
                      "lobe" if lobe_fir else "vpu"),
            lost2_lo=lost2_lo, lost2_hi=lost2_hi,
            sublanes=kernel_sublanes, unroll=kernel_unroll,
            time_chunk=kernel_time_chunk, assume_full=assume_full,
            guarded=kernel_guarded, pretiled_streams=pretiled_streams)
        frames = demod.FrameBatch(
            words=words, length=length, start=start, end=end,
            count=jnp.minimum(count_raw, frame_slots),
            lost2=lost2,
            dropped=over + jnp.maximum(count_raw - frame_slots, 0),
            crcfail=jnp.zeros((s,), jnp.int32))
        if device_crc:
            frames = _device_crc_filter(frames, s, frame_slots)
        peak = fir.block_peak(samples) \
            if (with_peak and pretiled_streams is None) \
            else jnp.zeros((s,), jnp.int32)
        return (PipelineCarry(history, dpll_state, hdlc_state),
                frames, peak)
    if pretiled_streams is not None:
        # samples is ALREADY stream-tile-major [nt*T, sb, LANES] (from
        # ops.fused.tile_superblock or an upload in that layout): the
        # three HBM relayout passes of the row-major path never happen.
        # Fused-kernel path only; the per-stream raw peak would need the
        # row-major view, so level monitoring stays on that path.
        # assume_full: the pretiled history carry reads the block's
        # tail rows, which is only the true FIR history when every
        # sample is valid (full blocks)
        assert fused_pipeline and not with_peak and assume_full
        from gnuais_tpu.ops.fused import n_stream_tiles, pipeline_fused
        s = pretiled_streams
        nt = n_stream_tiles(s, kernel_sublanes)
        t = samples.shape[0] // nt
        (cand_valid, cw, cl, cs, ce, lost2, over,
         history, dpll_state, hdlc_state) = pipeline_fused(
            samples, n_valid, carry.history, carry.dpll, carry.hdlc,
            block_base=block_base,
            fir_mode=("mxu" if mxu_fir else
                      "lobe" if lobe_fir else "vpu"),
            lost2_lo=lost2_lo, lost2_hi=lost2_hi,
            sublanes=kernel_sublanes, unroll=kernel_unroll,
            time_chunk=kernel_time_chunk, assume_full=assume_full,
            guarded=kernel_guarded, pretiled_streams=s)
        frames = demod.compact_candidates(
            demod.init_frames(s, frame_slots),
            cand_valid, cw, cl, cs, ce, lost2=lost2, over=over)
        if device_crc:
            frames = _device_crc_filter(frames, s, frame_slots)
        peak = jnp.zeros((s,), jnp.int32)
        return (PipelineCarry(history, dpll_state, hdlc_state),
                frames, peak)
    t = samples.shape[1]
    if fused_pipeline:
        from gnuais_tpu.ops.fused import pipeline_fused
        # mxu_fir: the 36-tap FIR runs as ONE banded matmul per unroll
        # chunk on the MXU *inside* the kernel (frees 36 of ~58 VPU
        # ops/sample).  NOT guaranteed bit-exact vs the C accumulation
        # order (MXU f32 is multi-pass bf16) — gate with parity on the
        # target capture (tests do; slicer signs flip only when
        # |filtered| is within rounding noise).
        (cand_valid, cw, cl, cs, ce, lost2, over,
         history, dpll_state, hdlc_state) = pipeline_fused(
            samples, n_valid, carry.history, carry.dpll, carry.hdlc,
            block_base=block_base,
            fir_mode=("mxu" if mxu_fir else
                      "lobe" if lobe_fir else "vpu"),
            lost2_lo=lost2_lo, lost2_hi=lost2_hi,
            sublanes=kernel_sublanes, unroll=kernel_unroll,
            time_chunk=kernel_time_chunk,
            # static promise n_valid == T (throughput callers only):
            # compiles the per-sample valid gates out of the hot loop
            assume_full=assume_full,
            # guarded=False replaces the per-slot any(emit)+branch
            # snapshot with unconditional selects — measured +14% at
            # [32,128] tiles (the cross-lane reduce + data-dependent
            # branch stalls the vector pipeline); the guarded form
            # stays the default for sparse real captures
            guarded=kernel_guarded)
        frames = demod.compact_candidates(
            demod.init_frames(samples.shape[0], frame_slots),
            cand_valid, cw, cl, cs, ce, lost2=lost2, over=over)
        if device_crc:
            frames = _device_crc_filter(frames, samples.shape[0],
                                        frame_slots)
        # block_peak re-reads the whole raw block from HBM; skip it for
        # throughput callers that do not feed a level monitor
        peak = fir.block_peak(samples) if with_peak else \
            jnp.zeros((samples.shape[0],), jnp.int32)
        return (PipelineCarry(history, dpll_state, hdlc_state),
                frames, peak)
    if fused_frontend:
        from gnuais_tpu.ops.fused import frontend_fused
        assert t % 4 == 0
        bitrows, slot_valid, pos_rows, history, dpll_state = frontend_fused(
            samples, n_valid, carry.history, carry.dpll,
            block_base=block_base)
    else:
        sample_valid = jnp.arange(t) < n_valid
        fir_fn = fir.fir_exact if exact_fir else fir.fir_conv
        filtered, history = fir_fn(samples, carry.history, n_valid=n_valid)
        if fast_dpll:
            from gnuais_tpu.ops.fused import dpll_fused
            bit_valid, bits, dpll_state = dpll_fused(filtered, n_valid,
                                                     carry.dpll)
        else:
            bit_valid, bits, dpll_state = demod.dpll_scan(
                filtered, sample_valid, carry.dpll)
        if t % 4:
            pad = 4 - t % 4
            bit_valid = jnp.pad(bit_valid, ((0, 0), (0, pad)))
            bits = jnp.pad(bits, ((0, 0), (0, pad)))
        bitrows, slot_valid, pos_rows = demod.group_reduce_bits(
            bit_valid, bits, block_base)
    frames0 = demod.init_frames(samples.shape[0], frame_slots)
    hdlc_state, frames = demod.hdlc_scan(bitrows, slot_valid,
                                         carry.hdlc, frames0, pos_rows,
                                         lost2_lo=lost2_lo,
                                         lost2_hi=lost2_hi)
    peak = fir.block_peak(samples)
    return PipelineCarry(history, dpll_state, hdlc_state), frames, peak


@functools.partial(jax.jit,
                   static_argnames=("n_blocks", "frame_slots", "exact_fir",
                                    "fast_dpll", "fused_frontend",
                                    "fused_pipeline", "device_crc",
                                    "mxu_fir", "lobe_fir", "kernel_sublanes",
                                    "kernel_unroll", "kernel_time_chunk",
                                    "with_peak", "assume_full",
                                    "kernel_guarded", "pretiled_streams",
                                    "kernel_compact"))
def decode_superblock(samples: jax.Array, n_valid: jax.Array,
                      carry: PipelineCarry, n_blocks: int,
                      frame_slots: int = 32,
                      block_base: jax.Array | int = 0,
                      **flags) -> Tuple[PipelineCarry, demod.FrameBatch,
                                        jax.Array]:
    """Decode ``n_blocks`` consecutive blocks in ONE device dispatch.

    samples: int16 [S, n_blocks*T]; n_valid: scalar int32 over the whole
    superblock.  A ``lax.scan`` chains the carry across the inner blocks
    on device, so the per-dispatch host/tunnel round trip is paid once
    per superblock instead of once per block (measured ~2x at K=8 on the
    tunnel-attached v5e).  Returns (carry', frames, peak) with the
    FrameBatch leaves stacked on a leading [n_blocks] axis (block k's
    ``start`` values are absolute, offset by ``block_base + k*T``) and
    peak [S] = max over the superblock.

    Semantics are identical to n_blocks sequential decode_block calls
    (same flags, same T); see tests/test_superblock.py.

    With ``pretiled_streams=S`` set, ``samples`` is ALREADY in the fused
    kernel's native layout [K, nt*T, sb, LANES] (from
    ops.fused.tile_superblock, or uploaded tile-major by the host) and
    NO relayout pass runs inside the dispatch — the row-major path's
    input layout copies cost ~37% of the whole step at the flagship
    config (profiled r5).  Requires assume_full (full blocks).
    """
    pretiled = flags.get("pretiled_streams") is not None
    if pretiled:
        s = flags["pretiled_streams"]
        assert samples.shape[0] == n_blocks, (samples.shape, n_blocks)
        from gnuais_tpu.ops.fused import n_stream_tiles
        nt = n_stream_tiles(s, flags.get("kernel_sublanes", 8))
        t = samples.shape[1] // nt
        xs = samples                      # [K, nt*T, sb, LANES]
    else:
        s, total = samples.shape
        assert total % n_blocks == 0, (total, n_blocks)
        t = total // n_blocks
        # the [K, S, T] transpose costs a read+write of the whole
        # superblock, but scan consuming pre-transposed slices measured
        # FASTER than dynamic-slicing blocks out of the flat buffer
        # inside the body (9.0 vs 10.0 Gsamp/s at S=4096) — the copy
        # pays for better-pipelined per-step input DMA
        xs = samples.reshape(s, n_blocks, t).transpose(1, 0, 2)
    base = jnp.asarray(block_base, dtype=jnp.int32)

    def body(c, xk):
        k, xb = xk
        nv = jnp.clip(n_valid - k * t, 0, t)
        c2, frames, peak = decode_block(
            xb, nv, c, frame_slots=frame_slots,
            block_base=base + k * t, **flags)
        return c2, (frames, peak)

    ks = jnp.arange(n_blocks, dtype=jnp.int32)
    carry2, (frames_k, peak_k) = jax.lax.scan(body, carry, (ks, xs))
    return carry2, frames_k, jnp.max(peak_k, axis=0)


def _reg_to_bits(words: np.ndarray, nbits: int) -> np.ndarray:
    """Unpack the last ``nbits`` appended bits from a register snapshot
    ([REG_WORDS] uint32, newest bit = LSB of the last word)."""
    allbits = np.zeros(demod.REG_BITS, dtype=np.uint8)
    for w in range(demod.REG_WORDS):
        v = int(words[w])
        for i in range(32):
            allbits[w * 32 + i] = (v >> (31 - i)) & 1
    return allbits[demod.REG_BITS - nbits:]


def extract_frames(frames: demod.FrameBatch) -> List[List[Frame]]:
    """Host drain: CRC-check each snapshot; returns per-stream lists of
    Frame (crc_ok False entries kept for the wrong-CRC counter).

    Uses the native C++ drain when available (the Python bit loops
    dominate wall time beyond a few thousand frames/block)."""
    words = np.asarray(frames.words)
    length = np.asarray(frames.length)
    count = np.asarray(frames.count)
    n_streams = words.shape[0]

    from gnuais_tpu import native
    if native.available():
        out: List[List[Frame]] = [[] for _ in range(n_streams)]
        for s_idx, payload, flen, ok in native.drain_frames(
                words, length, count):
            out[s_idx].append(Frame(payload, flen, ok))
        return out

    out = []
    for s in range(n_streams):
        lst: List[Frame] = []
        for k in range(int(count[s])):
            flen = int(length[s, k])
            # the register holds the full appended run: payload bits +
            # 16 FCS + 6 flag bits
            raw = _reg_to_bits(words[s, k], flen + C.FRAME_TAIL_BITS)
            ok, payload = crc_check_and_extract(raw, flen)
            # payload is the byte-truncated MSB-first expansion for
            # CRC-failed frames too, matching the native drain exactly
            lst.append(Frame(payload, flen, ok))
        out.append(lst)
    return out


@functools.partial(jax.jit, static_argnames=("bucket",))
def _pack_dense(dense, bucket: int):
    """One flat int32 buffer carrying the first ``bucket`` dense rows'
    words+length+start+end+stream — so the host drain costs ONE
    device->host transfer instead of five (each round trip through a
    slow link pays fixed latency; at a few hundred frames the bytes
    are trivial but five trips were the single-stream mode's wall)."""
    w = jax.lax.bitcast_convert_type(dense.words[:bucket],
                                     jnp.int32).reshape(-1)
    return jnp.concatenate([
        w, dense.length[:bucket], dense.start[:bucket],
        dense.end[:bucket], dense.stream[:bucket]])


def extract_dense(dense, n_streams: int,
                  total: Optional[int] = None
                  ) -> List[List[Tuple[int, int, Frame]]]:
    """Host drain of a demod.DenseFrames: per-stream lists of
    (absolute_start, absolute_end, Frame) in arrival order.

    Round-trip diet: ``total`` comes back first (the caller usually
    already synced ``over``), then ONE packed transfer of the occupied
    rows rounded up to a power-of-two bucket (static shapes, so at
    most log2(cap) jit specializations ever compile).

    Reuses the native C++ drain by treating each dense row as a 1-slot
    pseudo-stream."""
    if total is None:
        total = int(dense.total)
    out: List[List[Tuple[int, int, Frame]]] = [[] for _ in range(n_streams)]
    if total == 0:
        return out
    cap = dense.length.shape[0]
    bucket = 1
    while bucket < total:
        bucket *= 2
    bucket = min(bucket, cap)
    nw = dense.words.shape[1]
    flat = np.asarray(_pack_dense(dense, bucket))
    words = flat[:bucket * nw].reshape(bucket, nw).view(np.uint32)
    length = flat[bucket * nw + 0 * bucket: bucket * nw + 1 * bucket]
    start = flat[bucket * nw + 1 * bucket: bucket * nw + 2 * bucket]
    end = flat[bucket * nw + 2 * bucket: bucket * nw + 3 * bucket]
    stream = flat[bucket * nw + 3 * bucket: bucket * nw + 4 * bucket]
    from gnuais_tpu import native
    if native.available():
        counts = np.ones(total, dtype=np.int32)
        for row, payload, flen, ok in native.drain_frames(
                words[:total, None, :], length[:total, None], counts):
            out[int(stream[row])].append(
                (int(start[row]), int(end[row]), Frame(payload, flen, ok)))
    else:
        for j in range(total):
            flen = int(length[j])
            raw = _reg_to_bits(words[j], flen + C.FRAME_TAIL_BITS)
            ok, payload = crc_check_and_extract(raw, flen)
            out[int(stream[j])].append(
                (int(start[j]), int(end[j]), Frame(payload, flen, ok)))
    return out


@dataclass
class StreamCounters:
    receivedframes: int = 0
    lostframes: int = 0
    lostframes2: int = 0


class BatchPipeline:
    """Streaming decoder for S independent streams with carried state."""

    def __init__(self, n_streams: int, block_len: int = 49_152,
                 frame_slots: int = 32, exact_fir: bool = True,
                 fast_dpll: bool = False, fused_frontend: bool = False,
                 fused_pipeline: bool = False, device_crc: bool = False,
                 mxu_fir: bool = False, lobe_fir: bool = False,
                 **kernel_flags):
        if fast_dpll or fused_frontend or fused_pipeline:
            assert block_len % 512 == 0, "fast path: block_len % 512 == 0"
        assert not (device_crc and not fused_pipeline), \
            "device_crc requires fused_pipeline"
        assert not (mxu_fir and not fused_pipeline), \
            "mxu_fir requires fused_pipeline"
        assert not (lobe_fir and not fused_pipeline), \
            "lobe_fir requires fused_pipeline"
        self.n_streams = n_streams
        self.block_len = block_len
        self.frame_slots = frame_slots
        self.exact_fir = exact_fir
        self.fast_dpll = fast_dpll
        self.fused_frontend = fused_frontend
        self.fused_pipeline = fused_pipeline
        self.device_crc = device_crc
        self.mxu_fir = mxu_fir
        self.lobe_fir = lobe_fir
        # extra static kernel knobs (kernel_sublanes, kernel_unroll,
        # kernel_time_chunk, with_peak) pass straight to decode_block
        self.kernel_flags = kernel_flags
        self.carry = init_carry(n_streams)
        self.counters = [StreamCounters() for _ in range(n_streams)]

    def process(self, samples: np.ndarray) -> List[List[Frame]]:
        """samples: int16 [S, n] with n <= block_len (padded internally).
        Returns per-stream CRC-passing frames in arrival order."""
        s, n = samples.shape
        assert s == self.n_streams and n <= self.block_len
        if n < self.block_len:
            samples = np.pad(samples, ((0, 0), (0, self.block_len - n)))
        self.carry, frames, _peak = decode_block(
            jnp.asarray(samples), jnp.int32(n), self.carry,
            frame_slots=self.frame_slots, exact_fir=self.exact_fir,
            fast_dpll=self.fast_dpll, fused_frontend=self.fused_frontend,
            fused_pipeline=self.fused_pipeline, device_crc=self.device_crc,
            mxu_fir=self.mxu_fir, lobe_fir=self.lobe_fir,
            **self.kernel_flags)
        per_stream = extract_frames(frames)
        return self._account(per_stream, frames)

    def process_superblock(self, samples: np.ndarray
                           ) -> List[List[Frame]]:
        """samples: int16 [S, n], any n (padded to a block_len multiple).
        Decodes ceil(n/block_len) blocks in ONE device dispatch
        (decode_superblock) — the throughput mode for bulk/file decode.
        Returns per-stream CRC-passing frames in arrival order."""
        s, n = samples.shape
        assert s == self.n_streams
        k = max(1, -(-n // self.block_len))
        total = k * self.block_len
        if n < total:
            samples = np.pad(samples, ((0, 0), (0, total - n)))
        self.carry, frames_k, _peak = decode_superblock(
            jnp.asarray(samples), jnp.int32(n), self.carry, k,
            frame_slots=self.frame_slots, exact_fir=self.exact_fir,
            fast_dpll=self.fast_dpll, fused_frontend=self.fused_frontend,
            fused_pipeline=self.fused_pipeline, device_crc=self.device_crc,
            mxu_fir=self.mxu_fir, lobe_fir=self.lobe_fir,
            **self.kernel_flags)
        host = jax.tree.map(np.asarray, frames_k)      # one transfer
        merged: List[List[Frame]] = [[] for _ in range(s)]
        for b in range(k):
            fb = jax.tree.map(lambda a, b=b: a[b], host)
            for i, lst in enumerate(extract_frames(fb)):
                merged[i].extend(lst)
        agg = jax.tree.map(lambda a: a.sum(axis=0), host)
        return self._account(merged, agg)

    def _account(self, per_stream, frames) -> List[List[Frame]]:
        lost2 = np.asarray(frames.lost2)
        dropped = np.asarray(frames.dropped)
        crcfail = np.asarray(frames.crcfail)
        result: List[List[Frame]] = []
        for i, lst in enumerate(per_stream):
            ok = [f for f in lst if f.crc_ok]
            ctr = self.counters[i]
            ctr.receivedframes += len(ok)
            # host-CRC mode counts rejects in the drained list;
            # device_crc mode pre-filters and reports them in crcfail
            ctr.lostframes += len(lst) - len(ok) + int(crcfail[i])
            ctr.lostframes2 += int(lost2[i])
            if dropped[i]:
                raise RuntimeError(
                    f"frame slot overflow on stream {i}: raise frame_slots")
            result.append(ok)
        return result


class JaxReceiver:
    """Single-channel adapter with the golden-receiver interface
    (run_block/counters), for session-level use and parity testing."""

    def __init__(self, name: str = "A", block_len: int = 1020,
                 frame_slots: int = 16, fast_dpll: bool = False,
                 fused_pipeline: bool = False, device_crc: bool = False,
                 level_monitor=None, checkpoint_path=None,
                 checkpoint_every: int = 64):
        self.name = name
        if fused_pipeline and block_len % 512:
            block_len = -(-block_len // 512) * 512

        def make():
            return BatchPipeline(1, block_len=block_len,
                                 frame_slots=frame_slots,
                                 fast_dpll=fast_dpll,
                                 fused_pipeline=fused_pipeline,
                                 device_crc=device_crc)

        if checkpoint_path is not None:
            # supervised mode: exact checkpoint/resume + automatic
            # rebuild-restore-replay recovery on decode failure
            from gnuais_tpu.runtime.supervisor import SupervisedDecoder
            self.pipe = SupervisedDecoder(make, checkpoint_path,
                                          checkpoint_every=checkpoint_every)
        else:
            self.pipe = make()
        self.level_monitor = level_monitor

    def resume_offset(self) -> int:
        """Samples already consumed per a restored checkpoint (0 when
        unsupervised or fresh)."""
        return getattr(self.pipe, "resume_offset", lambda: 0)()

    def run_block(self, samples: np.ndarray) -> List[Frame]:
        if self.level_monitor is not None:
            # reference level meter: positive peak of the raw block
            # (filter.c:117-119, receiver.c:137-147)
            self.level_monitor.observe(max(0, int(samples.max(initial=0))))
        return self.pipe.process(samples[None, :])[0]

    @property
    def counters(self):
        c = self.pipe.counters[0]
        return (c.receivedframes, c.lostframes, c.lostframes2)
