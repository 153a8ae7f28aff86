"""Spectral audio fingerprints: per-window dominant-frequency bins
over REAL decoded PCM.

The audio face of near-dup/retrieval for a crawl corpus: re-encoded
copies of the same recording keep their spectral peak structure even
when container bytes differ, so the classic cheap fingerprint is the
constellation of dominant DFT bins per fixed-size window
(Shazam-style landmark hashing reduced to its first stage).  Shape at
scale: decode + window + rfft + argmax is ONE Arrow-batched narrow
``mapInPandas`` stage over the payload column — no shuffle, linear in
corpus payload bytes; downstream joins group on the bounded
fingerprint hash.

Determinism: windows are non-overlapping (tail dropped), DC is
excluded, ties take the LOWEST bin (numpy argmax first-occurrence),
and the chain hash is integer arithmetic mod 2^61-1 — every output is
exactly reproducible, and for bin-exact tones the peak bin is an
analytic function of the construction (what the census oracle uses).

Reference analogue: none (`/root/reference` has no media surface) —
extends the training-data-pipeline surface alongside
image_fingerprint.py and the text dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_WINDOW = 256
_FP_MOD = (1 << 61) - 1
_FP_MULT = 1000003


def spectral_peak_bins(samples, window: int = DEFAULT_WINDOW) -> list[int]:
    """Dominant DFT bin per non-overlapping ``window``-sample frame:
    ``argmax |rfft|`` over bins ``1..window//2`` (DC excluded; ties go
    to the lowest bin).  The tail shorter than one window is dropped."""
    import numpy as np

    if window < 4 or window % 2:
        raise ValueError(f"fingerprint window must be even and >= 4: {window}")
    n = len(samples) // window
    if n == 0:
        return []
    arr = np.asarray(samples[: n * window], dtype=np.float64).reshape(
        n, window
    )
    mag = np.abs(np.fft.rfft(arr, axis=1))
    mag[:, 0] = -1.0  # exclude DC from the argmax
    return [int(b) for b in np.argmax(mag, axis=1)]


def fingerprint_hash(bins) -> int:
    """Order-sensitive chain hash of a peak-bin sequence (integer
    Horner chain mod 2^61-1) — the joinable fingerprint token."""
    h = 0
    for b in bins:
        h = (h * _FP_MULT + int(b) + 1) % _FP_MOD
    return h


def _mono(samples, channels: int):
    """Interleaved PCM16 -> mono by per-frame floor-mean (integer).
    Returns the input unchanged for mono and an int64 ndarray for
    multichannel — :func:`spectral_peak_bins` consumes either."""
    if channels <= 1:
        return samples
    import numpy as np

    arr = np.asarray(samples, dtype=np.int64)
    n = len(arr) // channels
    return arr[: n * channels].reshape(n, channels).sum(axis=1) // channels


def audio_fingerprints(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    window: int = DEFAULT_WINDOW,
) -> DataFrame:
    """Per-payload spectral fingerprint: ``(id, sample_rate, n_windows,
    peak_bins, fp_hash)`` — decode (WAV/AU/AIFF/FLAC/Ogg-FLAC via the
    from-spec codecs), mono-mix, window, per-window peak bin, chain
    hash.  ONE Arrow-batched narrow stage; no shuffle."""

    def run(batches):
        import pandas as pd

        from parquet_converters_spark.functions.multimodal import (
            _decode_audio_payload,
        )

        for pdf in batches:
            ids, rates, nws, bins_col, hashes = [], [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                rate, channels, samples = _decode_audio_payload(bytes(payload))
                bins = spectral_peak_bins(_mono(samples, channels), window)
                ids.append(i)
                rates.append(rate)
                nws.append(len(bins))
                bins_col.append(bins)
                hashes.append(fingerprint_hash(bins))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "sample_rate": rates,
                    "n_windows": nws,
                    "peak_bins": bins_col,
                    "fp_hash": hashes,
                }
            )

    return df.mapInPandas(
        run,
        f"{id_col} long, sample_rate int, n_windows int, "
        "peak_bins array<int>, fp_hash long",
    )
