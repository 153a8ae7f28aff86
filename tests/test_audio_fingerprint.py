"""Spectral audio fingerprints: peak-bin extraction, tie-breaks,
container invariance, and the Spark stage."""

import math

import pytest

from parquet_converters_spark.functions.audio_codecs import encode_au
from parquet_converters_spark.functions.audio_fingerprint import (
    audio_fingerprints,
    fingerprint_hash,
    spectral_peak_bins,
)
from parquet_converters_spark.functions.media_codecs import encode_wav

W = 256


def _tone(k, n_windows, amp=9000, phase=0.0):
    return [
        int(round(amp * math.sin(2 * math.pi * k * n / W + phase)))
        for n in range(W * n_windows)
    ]


def test_pure_tone_peaks_at_its_bin():
    for k in (1, 5, 20, 100, 127):
        assert spectral_peak_bins(_tone(k, 3)) == [k, k, k]


def test_two_tone_mixture_picks_stronger():
    s = [a + b for a, b in zip(_tone(7, 2, amp=9000), _tone(19, 2, amp=3000))]
    assert spectral_peak_bins(s) == [7, 7]


def test_tie_breaks_to_lower_bin():
    # An impulse has exactly equal magnitude at EVERY bin: the
    # first-occurrence argmax must take the lowest non-DC bin.
    s = ([8000] + [0] * (W - 1)) * 2
    assert spectral_peak_bins(s) == [1, 1]


def test_dc_excluded_and_tail_dropped():
    # Constant signal has all energy at DC; with DC excluded the argmax
    # falls to bin 1 (all remaining magnitudes ~0, first wins).
    assert spectral_peak_bins([1000] * W) == [1]
    # 2.5 windows -> 2 fingerprinted frames
    assert len(spectral_peak_bins(_tone(4, 2) + [0] * (W // 2))) == 2
    assert spectral_peak_bins([]) == []


def test_changing_tone_changes_bins_per_window():
    s = _tone(6, 1) + _tone(11, 1)
    assert spectral_peak_bins(s) == [6, 11]


def test_fingerprint_hash_order_sensitive():
    assert fingerprint_hash([6, 11]) != fingerprint_hash([11, 6])
    assert fingerprint_hash([]) == 0


def test_window_validation():
    with pytest.raises(ValueError, match="window"):
        spectral_peak_bins([0] * 512, window=255)


def test_container_invariance_wav_vs_au():
    # The same PCM through two different REAL containers/codecs
    # fingerprints identically.
    pcm = _tone(9, 2)
    wav = encode_wav(8000, pcm)
    au = encode_au(8000, pcm)
    from parquet_converters_spark.functions.multimodal import (
        _decode_audio_payload,
    )

    r1, c1, s1 = _decode_audio_payload(wav)
    r2, c2, s2 = _decode_audio_payload(au)
    assert (r1, c1, s1) == (r2, c2, s2) == (8000, 1, pcm)
    assert spectral_peak_bins(s1) == spectral_peak_bins(s2) == [9, 9]


def test_stereo_mono_mix():
    # L = tone at 5, R = silence: the mono mix halves amplitude but
    # keeps the peak at bin 5.
    left = _tone(5, 2)
    inter = []
    for v in left:
        inter += [v, 0]
    wav = encode_wav(8000, inter, channels=2)
    from parquet_converters_spark.functions.multimodal import (
        _decode_audio_payload,
    )

    rate, channels, samples = _decode_audio_payload(wav)
    assert channels == 2
    from parquet_converters_spark.functions.audio_fingerprint import _mono

    assert spectral_peak_bins(_mono(samples, channels)) == [5, 5]


def test_spark_stage(spark):
    rows = [
        (1, encode_wav(8000, _tone(7, 3))),
        (2, encode_au(8000, _tone(7, 3))),
        (3, encode_wav(8000, _tone(12, 2))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in audio_fingerprints(df).collect()}
    assert got[1].peak_bins == [7, 7, 7] and got[1].n_windows == 3
    # container-invariant: same PCM, same fingerprint hash
    assert got[1].fp_hash == got[2].fp_hash
    assert got[3].peak_bins == [12, 12]
    assert got[3].fp_hash != got[1].fp_hash
    assert all(r.sample_rate == 8000 for r in got.values())
