"""Receiver metrics: best-range tracking, audio level monitoring, and
frame counters — the reference's runtime self-diagnostics surface
(range.c, receiver.c:137-147, ais.c:250-262,296-310) plus TPU-side
throughput accounting.
"""

from __future__ import annotations

import logging
import math
import time as time_mod
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np

log = logging.getLogger("gnuais")


def _f32(x: float) -> np.float32:
    return np.float32(x)


def maidenhead_km_distance(lat1: float, lon1: float, lat2: float,
                           lon2: float) -> float:
    """Great-circle km, float32 arithmetic like the reference
    (range.c:18-30).  Inputs in radians."""
    sindlat2 = np.sin(_f32(_f32(lat1 - lat2) * _f32(0.5)), dtype=np.float32)
    sindlon2 = np.sin(_f32(_f32(lon1 - lon2) * _f32(0.5)), dtype=np.float32)
    coslat1 = np.cos(_f32(lat1), dtype=np.float32)
    coslat2 = np.cos(_f32(lat2), dtype=np.float32)
    a = _f32(_f32(sindlat2 * sindlat2)
             + _f32(_f32(coslat1 * coslat2) * _f32(sindlon2 * sindlon2)))
    c = _f32(2.0) * np.arctan2(np.sqrt(a, dtype=np.float32),
                               np.sqrt(_f32(1.0) - a, dtype=np.float32),
                               dtype=np.float32)
    return float(_f32(_f32(111.2 * 180.0 / math.pi) * c))


class RangeTracker:
    """Per-channel best-range with the reference's bad-fix filters
    (range.c:32-45) and StatsInterval logging+reset (range.c:47-53)."""

    def __init__(self, chanid: str, mylat_deg: Optional[float] = None,
                 mylng_deg: Optional[float] = None):
        self.chanid = chanid
        self.best_range = 0.0
        self.enabled = (mylat_deg is not None and mylng_deg is not None
                        and -90 < mylat_deg < 90 and -180 < mylng_deg < 180)
        if self.enabled:
            self.mylat = math.radians(mylat_deg)
            self.mylng = math.radians(mylng_deg)

    def update(self, lat_deg: float, lon_deg: float) -> None:
        if not self.enabled:
            return
        if lat_deg > 89.0 or lat_deg < -89.0 or lon_deg > 180.01 or lon_deg < -180.01:
            return
        if -0.001 < lat_deg < 0.001 and -0.001 < lon_deg < 0.001:
            return
        d = maidenhead_km_distance(self.mylat, self.mylng,
                                   math.radians(lat_deg),
                                   math.radians(lon_deg))
        if d > self.best_range:
            self.best_range = d

    def log_and_reset(self) -> Optional[str]:
        msg = None
        if self.best_range > 0.1:
            msg = f"Best range ch {self.chanid}: {self.best_range:.1f} km"
            log.info(msg)
        self.best_range = 0.0
        return msg


class LevelMonitor:
    """Input-level logging: warn above 95% at most every 30 s, info at
    the configured soundlevellog interval (receiver.c:137-147)."""

    def __init__(self, chanid: str, sound_levellog: int = 0):
        self.chanid = chanid
        self.sound_levellog = sound_levellog
        self.last_levellog = 0.0

    def observe(self, maxval: int, now: Optional[float] = None) -> Optional[str]:
        now = now if now is not None else time_mod.time()
        level = float(maxval) / 32768.0 * 100.0
        distance = now - self.last_levellog
        msg = None
        if level > 95.0 and (distance >= 30 or distance >= self.sound_levellog):
            msg = f"Level on ch {self.chanid} too high: {level:.0f} %"
            log.warning(msg)
            self.last_levellog = now
        elif self.sound_levellog != 0 and distance >= self.sound_levellog:
            msg = f"Level on ch {self.chanid}: {level:.0f} %"
            log.info(msg)
            self.last_levellog = now
        return msg


@dataclass
class ThroughputMeter:
    """samples/s accounting for the TPU pipeline."""
    samples: int = 0
    seconds: float = 0.0

    def add(self, n_samples: int, dt: float) -> None:
        self.samples += n_samples
        self.seconds += dt

    @property
    def samples_per_sec(self) -> float:
        return self.samples / self.seconds if self.seconds else 0.0

    @property
    def realtime_factor(self) -> float:
        return self.samples_per_sec / 48_000.0
