"""Helpers to run the reference gnuais binary as a parity oracle."""

from __future__ import annotations

import os
import socket
import subprocess
import tempfile
import threading
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

IPC_SOCKET = "/tmp/gnuais.socket"


def run_oracle(oracle_bin, interleaved: np.ndarray, channels_mode: str = "mono",
               capture_ipc: bool = False, extra_config: str = "",
               timeout: float = 120.0) -> Tuple[List[str], List[str], str]:
    """Feed an interleaved int16 capture to the oracle in file-input mode.

    Returns (stdout_lines, ipc_nmea_sentences, stderr).

    When capture_ipc is set, the capture is streamed through a FIFO so a
    socket client can connect to /tmp/gnuais.socket before any frame is
    decoded (the oracle broadcasts each NMEA sentence to connected
    clients, ipc.c:121-134).
    """
    with tempfile.TemporaryDirectory() as td:
        conf = Path(td) / "oracle.conf"
        conf.write_text(f"soundchannels {channels_mode}\n{extra_config}\n")

        ipc_lines: List[str] = []
        if not capture_ipc:
            cap = Path(td) / "capture.raw"
            np.asarray(interleaved, dtype="<i2").tofile(str(cap))
            r = subprocess.run(
                [str(oracle_bin), "-c", str(conf), "-l", str(cap)],
                capture_output=True, text=True, timeout=timeout, cwd=td,
            )
            return r.stdout.splitlines(), ipc_lines, r.stderr

        fifo = Path(td) / "capture.fifo"
        os.mkfifo(fifo)
        proc = subprocess.Popen(
            [str(oracle_bin), "-c", str(conf), "-l", str(fifo)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=td,
        )
        raw = np.asarray(interleaved, dtype="<i2").tobytes()

        reader_buf = bytearray()

        def _ipc_reader():
            # wait for the socket to exist, then drain broadcasts
            import time
            for _ in range(200):
                if os.path.exists(IPC_SOCKET):
                    break
                time.sleep(0.01)
            try:
                s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
                s.connect(IPC_SOCKET)
                s.settimeout(0.5)
                while True:
                    try:
                        chunk = s.recv(65536)
                    except socket.timeout:
                        if proc.poll() is not None:
                            break
                        continue
                    if not chunk:
                        break
                    reader_buf.extend(chunk)
            except OSError:
                pass

        t = threading.Thread(target=_ipc_reader)
        t.start()
        # Give the client a moment to connect before data flows.
        import time
        time.sleep(0.3)
        with open(fifo, "wb") as f:
            f.write(raw)
        out, err = proc.communicate(timeout=timeout)
        t.join(timeout=5)

        # sentences are sent back-to-back with no delimiter; they all
        # start with '!' and '!' cannot appear elsewhere
        text = reader_buf.decode("ascii", errors="replace")
        ipc_lines = ["!" + p for p in text.split("!") if p]
        return out.splitlines(), ipc_lines, err
