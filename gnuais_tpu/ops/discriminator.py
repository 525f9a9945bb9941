"""Raw-IQ front-end: on-device FM discriminator + decimation.

The reference consumes FM-discriminator *audio* from a radio's
soundcard output; this front-end replaces that radio: complex baseband
IQ (an AIS channel already mixed to 0 Hz) enters at an integer multiple
of 48 kHz, is FM-demodulated on device (phase-difference discriminator)
and decimated to the 48 kHz audio the decode chain expects
(BASELINE.json config 3).

All batched over [streams, time]; carry = last IQ sample (for the
phase difference) + decimation FIR history.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnuais_tpu.constants import SAMPLE_RATE


def design_decim_fir(decim: int, ntaps: int = 64) -> np.ndarray:
    """Hamming-windowed sinc low-pass at 0.45*(48 kHz/2) of the input
    rate, for anti-alias filtering ahead of ``decim``:1 decimation."""
    fs_in = SAMPLE_RATE * decim
    cutoff = 0.45 * (SAMPLE_RATE / 2)
    n = np.arange(ntaps) - (ntaps - 1) / 2.0
    fc = cutoff / fs_in
    h = 2 * fc * np.sinc(2 * fc * n)
    h *= np.hamming(ntaps)
    h /= h.sum()
    return h.astype(np.float32)


class IqState(NamedTuple):
    last_iq: jax.Array      # [S] complex64 — previous IQ sample
    fir_history: jax.Array  # [S, ntaps] float32 — decimator history


def init_iq(n_streams: int, ntaps: int = 64) -> IqState:
    return IqState(
        last_iq=jnp.ones((n_streams,), dtype=jnp.complex64),
        fir_history=jnp.zeros((n_streams, ntaps), dtype=jnp.float32),
    )


def fm_discriminate(iq: jax.Array, last_iq: jax.Array,
                    scale: Optional[float] = None) -> Tuple[jax.Array, jax.Array]:
    """Phase-difference FM discriminator.

    iq: complex64 [S, T].  Returns (audio-float [S, T], new last_iq).
    Output scaled so a pi rad/sample swing maps to int16 full scale,
    matching the soundcard-audio amplitude regime the FIR expects.
    """
    if scale is None:
        scale = 32767.0 / np.pi
    prev = jnp.concatenate([last_iq[:, None], iq[:, :-1]], axis=1)
    d = iq * jnp.conj(prev)
    audio = jnp.arctan2(jnp.imag(d), jnp.real(d)) * scale
    return audio.astype(jnp.float32), iq[:, -1]


def decimate(x: jax.Array, history: jax.Array, taps: jax.Array,
             decim: int) -> Tuple[jax.Array, jax.Array]:
    """Anti-alias FIR + decim:1 downsample.

    x: float32 [S, T] (T divisible by decim); history: [S, ntaps].
    Returns ([S, T//decim], new history).
    """
    ntaps = taps.shape[0]
    xx = jnp.concatenate([history, x], axis=1)
    t = x.shape[1]
    # filtered[n] = sum_k taps[k] * xx[n + ntaps - k] — standard causal
    # conv; then take every decim-th output
    lhs = xx[:, None, :]
    rhs = taps[::-1][None, None, :]
    y = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(decim,), padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
        precision=jax.lax.Precision.HIGHEST,
    )[:, 0, :]
    y = y[:, : t // decim]
    new_history = xx[:, t : t + ntaps]
    return y, new_history


def iq_frontend(iq: jax.Array, state: IqState, taps: jax.Array,
                decim: int) -> Tuple[jax.Array, IqState]:
    """Full front-end: IQ [S, T_iq] -> int16-range float audio
    [S, T_iq/decim] at 48 kHz + new state."""
    audio_hi, last_iq = fm_discriminate(iq, state.last_iq)
    audio, fir_hist = decimate(audio_hi, state.fir_history, taps, decim)
    return audio, IqState(last_iq, fir_hist)


def iq_to_int16_audio(iq: jax.Array, state: IqState, taps: jax.Array,
                      decim: int) -> Tuple[jax.Array, IqState]:
    """Convenience wrapper rounding to int16 so the audio path is
    byte-compatible with a recorded soundcard capture."""
    audio, st = iq_frontend(iq, state, taps, decim)
    return jnp.clip(jnp.round(audio), -32768, 32767).astype(jnp.int16), st
