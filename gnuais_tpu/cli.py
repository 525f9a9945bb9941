"""Command-line interface.

``gnuais-tpu`` mirrors the reference CLI surface (cfg.c:426-485):

    gnuais-tpu [-c cfgfile] [-l <inputsoundfile>] [-s <recordsoundfile>]
               [-e <loglevel>] [-n <logname>] [-h]

plus TPU-era conveniences: ``--streams``, ``--backend``, ``--bench``.
Decodes the capture through the configured backend, emitting message
lines to stdout, NMEA to the Unix socket (and serial/DB if configured),
and JSON-AIS uplink export on the configured interval.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time as time_mod
from typing import List, Optional

import numpy as np

from gnuais_tpu import constants as C
from gnuais_tpu.ais.dispatcher import DecodedMessage
from gnuais_tpu.config import Config, read_config
from gnuais_tpu.io import audio as audio_io
from gnuais_tpu.io.cache import JsonExporter, VesselCache
from gnuais_tpu.io.db import DbWriter
from gnuais_tpu.io.sinks import NmeaSocketServer, SerialSink, StdoutSink
from gnuais_tpu.runtime.metrics import LevelMonitor, RangeTracker
from gnuais_tpu.runtime.session import DecodeSession

log = logging.getLogger("gnuais")

LOG_LEVELS = {"emerg": logging.CRITICAL, "alert": logging.CRITICAL,
              "crit": logging.CRITICAL, "err": logging.ERROR,
              "warning": logging.WARNING, "notice": logging.INFO,
              "info": logging.INFO, "debug": logging.DEBUG}


def make_receiver_factory(cfg: Config):
    if cfg.backend == "golden":
        from gnuais_tpu.golden.model import GoldenReceiver
        return lambda name: GoldenReceiver(name)
    if cfg.backend in ("exact", "fast", "fused"):
        from gnuais_tpu.runtime.pipeline import JaxReceiver
        if cfg.backend in ("fast", "fused"):
            # Pallas kernels need 512-multiple blocks
            block = 1024
            fast = cfg.backend == "fast"
            fused = cfg.backend == "fused"
        else:
            block = audio_io.reference_block_frames()
            fast = fused = False
        def factory(name):
            lm = (LevelMonitor(name, cfg.sound_levellog)
                  if cfg.sound_levellog else None)
            ckpt = (f"{cfg.checkpoint}.{name}.npz"
                    if cfg.checkpoint else None)
            return JaxReceiver(name, block_len=block,
                               frame_slots=cfg.frameslots,
                               fast_dpll=fast, fused_pipeline=fused,
                               device_crc=fused, level_monitor=lm,
                               checkpoint_path=ckpt,
                               checkpoint_every=cfg.checkpoint_every)
        return factory
    raise SystemExit(f"unknown backend: {cfg.backend}")


def _load_iq_as_audio(path: str, decim: int) -> np.ndarray:
    """Raw interleaved float32 I,Q -> discriminated int16 audio at
    48 kHz (BASELINE config 3 front-end)."""
    import jax.numpy as jnp

    from gnuais_tpu.ops.discriminator import (design_decim_fir, init_iq,
                                              iq_to_int16_audio)
    raw = np.fromfile(path, dtype="<f4")
    n = (len(raw) // 2) * 2
    iq = (raw[0:n:2] + 1j * raw[1:n:2]).astype(np.complex64)
    m = (len(iq) // decim) * decim
    taps = jnp.asarray(design_decim_fir(decim))
    audio, _ = iq_to_int16_audio(jnp.asarray(iq[None, :m]),
                                 init_iq(1, 64), taps, decim)
    return np.asarray(audio)[0]


def _open_sound_device(cfg: Config, channels: int):
    """Live capture per the SoundDevice directive (ais.c:150-172):
    ``pulse`` selects PulseAudio, anything else is an ALSA PCM name."""
    if cfg.sound_device == "pulse":
        from gnuais_tpu.io.pulse import PulseInput
        live = PulseInput(channels=channels)
        log.info("Opened PulseAudio record stream")
    else:
        from gnuais_tpu.io.alsa import AlsaInput
        live = AlsaInput(cfg.sound_device, channels=channels)
        log.info("Opened ALSA capture device %s", cfg.sound_device)
    return live


def _timepar_decode(cfg: Config, stream: np.ndarray, on_message) -> int:
    """Whole-capture time-parallel decode (mono): the ``streams``
    directive selects host-side chunk lanes (parallel.timepar), the
    ``meshshape`` directive runs the capture across a streams x time
    device mesh (parallel.sharded.make_multichip_step).  Returns the
    number of decoded CRC-passing frames."""
    from gnuais_tpu.ais.dispatcher import ChannelDispatcher

    n = len(stream)
    disp = ChannelDispatcher("A", cfg.skip_type)
    if cfg.meshshape:
        import jax
        import jax.numpy as jnp

        from gnuais_tpu.parallel import mesh as M
        from gnuais_tpu.parallel.sharded import (DEFAULT_EXTENSION,
                                                 DEFAULT_OVERLAP,
                                                 drain_timepar_frames,
                                                 make_multichip_step)
        s_ax, t_ax = (tuple(cfg.meshshape) + (1, 1))[:2]
        o, e = DEFAULT_OVERLAP, DEFAULT_EXTENSION
        t_loc = -(-max(o, e, -(-n // t_ax)) // 512) * 512
        tg = t_ax * t_loc
        buf = np.zeros((s_ax, tg), np.int16)
        buf[:, :n] = stream
        step = make_multichip_step(M.make_grid_mesh(s_ax, t_ax),
                                   frame_slots=cfg.frameslots)
        tp = step(jnp.asarray(buf), jnp.int32(n), jnp.int32(0),
                  jnp.zeros((s_ax, o), jnp.int16),
                  jnp.zeros((s_ax, e), jnp.int16))
        frames = [f for _, f in drain_timepar_frames(tp, cfg.frameslots)[0]]
        log.info("Mesh decode: %dx%d devices, %d-sample shards",
                 s_ax, t_ax, t_loc)
    else:
        from gnuais_tpu.parallel.timepar import time_parallel_decode
        chunk = max(4096, -(-(-(-n // cfg.streams)) // 512) * 512)
        res = time_parallel_decode(stream, chunk_len=chunk,
                                   frame_slots=max(cfg.frameslots, 64))
        frames = res.frames
        log.info("Time-parallel decode: %d lanes of %d samples",
                 res.chunks, chunk)
    count = 0
    for f in frames:
        msg = disp.dispatch(f.payload_bits, f.bufferlen)
        if msg is not None:
            on_message(msg)
        count += 1
    return count


def run_decode(cfg: Config, out_stream=None) -> int:
    if not cfg.sound_in_file and not cfg.sound_device:
        log.critical("Neither sound device or sound file configured.")
        return 1

    nch_cfg = 1 if cfg.sound_channels == C.SOUND_CHANNELS_MONO else 2
    live = None
    interleaved = None
    import stat as stat_mod
    src = cfg.sound_in_file
    try:
        if not src:
            live = _open_sound_device(cfg, nch_cfg)
        elif cfg.input_format == "iq":
            # raw interleaved float32 I,Q at 48 kHz * iq_decim: run the
            # on-device FM discriminator + decimation front-end, then
            # decode the resulting audio (mono only)
            interleaved = _load_iq_as_audio(src, cfg.iq_decim)
            log.info("Demodulated IQ from file: %s (decim %d)",
                     src, cfg.iq_decim)
        else:
            is_stream = src == "-" or (
                os.path.exists(src)
                and not stat_mod.S_ISREG(os.stat(src).st_mode))
            if is_stream:
                from gnuais_tpu.io.live import LiveInput
                live = LiveInput(src, channels=nch_cfg)
                log.info("Reading live audio from stream: %s", src)
            else:
                interleaved, nch = audio_io.load_capture(src,
                                                         channels=nch_cfg)
                log.info("Reading audio from file: %s", src)
    except OSError as e:
        log.critical("Could not open sound file %s: %s",
                     cfg.sound_in_file, e.strerror or e)
        return 1
    except RuntimeError as e:
        log.critical("Could not open sound device %s: %s",
                     cfg.sound_device, e)
        return 1

    stdout_sink = StdoutSink(out_stream)
    socket_srv: Optional[NmeaSocketServer] = None
    try:
        socket_srv = NmeaSocketServer()
    except OSError as e:
        log.error("Could not open Unix Domain Socket: %s", e)
    serial_sink = SerialSink(cfg.serial_port) if cfg.serial_port else None
    db = None
    if cfg.mysql_db:
        # the reference's production sink (out_mysql.c): MySQL with
        # server-gone auto-reconnect
        from gnuais_tpu.io.mysql import MySqlWriter
        try:
            db = MySqlWriter(cfg.mysql_host or "localhost", cfg.mysql_db,
                             cfg.mysql_user or "gnuais",
                             cfg.mysql_password or "",
                             keepsmall=cfg.mysql_keepsmall,
                             oldlimit=cfg.mysql_oldlimit)
        except Exception as e:
            log.error("Could not connect to MySQL: %s", e)
    elif cfg.db_path:
        db = DbWriter(cfg.db_path, keepsmall=cfg.mysql_keepsmall,
                      oldlimit=cfg.mysql_oldlimit)

    cache = VesselCache() if cfg.uplinks else None
    exporter = None
    if cache:
        exporter = JsonExporter(cache, [u.url for u in cfg.uplinks],
                                cfg.mycall)
        exporter.start()

    ranges = {}
    mylat = cfg.mylat if cfg.have_my_loc else None
    mylng = cfg.mylng if cfg.have_my_loc else None

    def on_message(msg: DecodedMessage) -> None:
        now = int(time_mod.time())
        if msg.stdout_line:
            stdout_sink.write_line(msg.stdout_line)
        for s in msg.nmea_sentences:
            if socket_srv:
                socket_srv.write(s)
            if serial_sink:
                serial_sink.write(s)
            if db:
                db.nmea(now, s)
        for ev in msg.events:
            if cache:
                cache.apply_event(ev, now)
            if db:
                db.apply_event(ev, now)
            if ev.kind in ("position", "basestation"):
                rt = ranges.get(msg.chanid)
                if rt:
                    rt.update(ev.data["lat"], ev.data["lon"])

    for name in ("A", "B"):
        ranges[name] = RangeTracker(name, mylat, mylng)

    tee = open(cfg.sound_out_file, "wb") if cfg.sound_out_file else None
    t0 = time_mod.time()
    sess = None
    timepar_count = None
    if (live is None and nch_cfg == 1
            and (cfg.streams > 1 or cfg.meshshape)):
        # throughput mode: streams/meshshape directives engage the
        # time-parallel decode paths for whole-file mono captures
        if tee:
            tee.write(np.asarray(interleaved, dtype="<i2").tobytes())
        n_samples = len(interleaved)
        timepar_count = _timepar_decode(cfg, interleaved, on_message)
    else:
        sess = DecodeSession(make_receiver_factory(cfg),
                             sound_channels=cfg.sound_channels,
                             skip_type=cfg.skip_type,
                             message_callback=on_message)
        from gnuais_tpu.runtime.session import SessionResult
        result = SessionResult()
        last_stats = time_mod.time()
        nchs = sess.nch
        if live is not None:
            block_iter = live.blocks()
        else:
            # checkpoint resume: skip samples a previous (crashed) run
            # already consumed — the restored carry continues exactly
            off = 0
            if cfg.checkpoint and hasattr(sess.rx_a, "resume_offset"):
                off = sess.rx_a.resume_offset()
                if sess.rx_b is not None and hasattr(sess.rx_b,
                                                     "resume_offset"):
                    off_b = sess.rx_b.resume_offset()
                    if off_b != off:
                        # channel snapshots from different block counts
                        # (crash between the A and B saves): exact resume
                        # is impossible — restart both channels fresh
                        log.warning(
                            "Checkpoint offsets differ (A=%d B=%d): "
                            "restarting from 0", off, off_b)
                        off = 0
                        for rx in (sess.rx_a, sess.rx_b):
                            rx.pipe.reset()
                if off:
                    log.info("Resuming from checkpoint: skipping %d "
                             "samples/channel", off)
                # snapshot/restore the dispatcher's rolling NMEA seqnr
                # with the decoder carry — without it, resumed multipart
                # sentences would renumber from 0 (protodec.c:922-926)
                for rx, disp in ((sess.rx_a, sess.disp_a),
                                 (sess.rx_b, sess.disp_b)):
                    if rx is None or not hasattr(rx.pipe, "extra_meta"):
                        continue
                    rx.pipe.extra_meta = \
                        lambda d=disp: {"seqnr": d.seqnr}
                    if off and rx.pipe.restored_extra:
                        disp.seqnr = int(
                            rx.pipe.restored_extra.get("seqnr", 0))
            block_iter = audio_io.iter_blocks(interleaved[off * nchs:],
                                              nchs)
        n_samples = 0
        for block in block_iter:
            n_samples += len(block) // nchs
            if tee:
                tee.write(np.asarray(block, dtype="<i2").tobytes())
            sess.process_block(block, result)
            if cfg.stats_interval:
                now = time_mod.time()
                if now - last_stats >= cfg.stats_interval:
                    last_stats = now
                    for rt in ranges.values():
                        rt.log_and_reset()
        if cfg.checkpoint:
            # final snapshot: a clean exit resumes exactly-once (a crash
            # resumes from the last periodic snapshot, re-emitting the
            # tail blocks' frames — at-least-once)
            for rx in (sess.rx_a, sess.rx_b):
                if rx is not None and hasattr(rx, "pipe") \
                        and hasattr(rx.pipe, "checkpoint"):
                    rx.pipe.checkpoint()
    dt = time_mod.time() - t0
    if live is not None:
        live.close()

    if tee:
        tee.close()
    if exporter:
        exporter.export_once()
        exporter.stop()
    if socket_srv:
        socket_srv.close()
    if serial_sink:
        serial_sink.close()

    if sess is not None:
        for name, rx in (("A", sess.rx_a), ("B", sess.rx_b)):
            if rx is not None and hasattr(rx, "counters"):
                r, l, l2 = rx.counters
                log.info("%s: Received correctly: %d packets, "
                         "wrong CRC: %d packets, wrong size: %d packets",
                         name, r, l, l2)
    else:
        log.info("A: Received correctly: %d packets "
                 "(time-parallel mode reports CRC-passing frames only)",
                 timepar_count)
    log.info("Processed %d samples in %.2fs (%.0fx real time)",
             n_samples, dt, n_samples / 48000.0 / dt if dt else 0)
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    # the axon TPU plugin ignores JAX_PLATFORMS from the environment;
    # honor it explicitly so `JAX_PLATFORMS=cpu gnuais-tpu ...` works
    if os.environ.get("JAX_PLATFORMS"):
        try:
            import jax
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass

    p = argparse.ArgumentParser(
        prog="gnuais-tpu",
        description="TPU-native AIS receiver (gnuais capability surface)")
    p.add_argument("-c", dest="cfgfile", help="configuration file")
    p.add_argument("-l", dest="soundinfile", help="input capture (raw S16/WAV)")
    p.add_argument("-s", dest="soundoutfile", help="record input to file")
    p.add_argument("-n", dest="logname", default="gnuais")
    p.add_argument("-e", dest="loglevel", default="info",
                   choices=sorted(LOG_LEVELS))
    p.add_argument("-o", dest="logdest", default="stderr")
    p.add_argument("-r", dest="logdir")
    p.add_argument("-f", dest="fork", action="store_true",
                   help="fork to background (writes pidfile)")
    p.add_argument("--pidfile", default=None)
    p.add_argument("--streams", type=int, help="TPU: batch stream count")
    p.add_argument("--backend", choices=["exact", "fast", "fused", "golden"])
    p.add_argument("--monitor", action="store_true",
                   help="run the live ship monitor (NMEA socket consumer)")
    p.add_argument("--map", action="store_true",
                   help="with --monitor: serve the OSM web map view")
    p.add_argument("--port", type=int, default=8787,
                   help="web map HTTP port")
    p.add_argument("--checkpoint", metavar="PATH",
                   help="checkpoint decoder state (per channel) for "
                        "exact crash recovery / resume")
    p.add_argument("--checkpoint-every", type=int, default=None,
                   metavar="N", help="blocks between checkpoints")
    p.add_argument("--batch", nargs="+", metavar="CAPTURE",
                   help="batch-decode N independent capture files")
    p.add_argument("--replicate", type=int, default=1,
                   help="tile --batch inputs to this many copies")
    args = p.parse_args(argv)

    fmt = "%(asctime)s " + args.logname + "[%(process)d]: %(message)s"
    if args.logdest == "file" and args.logdir:
        logging.basicConfig(
            filename=os.path.join(args.logdir, args.logname + ".log"),
            level=LOG_LEVELS[args.loglevel], format=fmt)
    elif args.logdest == "syslog":
        from logging.handlers import SysLogHandler
        h = SysLogHandler(address="/dev/log") \
            if os.path.exists("/dev/log") else logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            args.logname + "[%(process)d]: %(message)s"))
        logging.basicConfig(level=LOG_LEVELS[args.loglevel], handlers=[h])
    else:
        logging.basicConfig(stream=sys.stderr,
                            level=LOG_LEVELS[args.loglevel], format=fmt)

    if args.monitor:
        if args.map:
            from gnuais_tpu.monitor.webmap import monitor_socket_with_map
            monitor_socket_with_map(port=args.port)
        else:
            from gnuais_tpu.monitor.ships import monitor_socket
            monitor_socket()
        return 0

    if args.batch:
        from gnuais_tpu.runtime.batch import decode_files
        res = decode_files(args.batch, replicate=args.replicate,
                           fast_dpll=(args.backend == "fast"))
        for line in res.lines:
            print(line)
        for name, (r, l, l2) in res.counters.items():
            log.info("%s: Received correctly: %d packets, wrong CRC: %d "
                     "packets, wrong size: %d packets", name, r, l, l2)
        log.info("Batch: %d streams, %.1f Msamples in %.2fs "
                 "(%.0fx real time)", len(res.counters),
                 res.samples / 1e6, res.seconds,
                 res.samples_per_sec / 48000.0)
        return 0

    if args.fork:
        from gnuais_tpu.io.live import daemonize
        daemonize(args.pidfile)

    from gnuais_tpu.config import resolve_config
    cfg = Config()
    if args.cfgfile:
        cfg = read_config(args.cfgfile, cfg)
    elif not args.soundinfile:
        # no -c and no -l: reference first-run behavior — auto-install
        # ~/.config/gnuais/config from the packaged example
        # (cfgfile.c:341-422) and read it
        cfg = resolve_config(None, cfg, log)
    if args.soundinfile:
        cfg.sound_in_file = args.soundinfile
        cfg.sound_device = None
    if args.soundoutfile:
        cfg.sound_out_file = args.soundoutfile
    if args.streams:
        cfg.streams = args.streams
    if args.backend:
        cfg.backend = args.backend
    if args.checkpoint:
        cfg.checkpoint = args.checkpoint
    if args.checkpoint_every is not None:
        cfg.checkpoint_every = args.checkpoint_every

    return run_decode(cfg)


if __name__ == "__main__":
    sys.exit(main())
