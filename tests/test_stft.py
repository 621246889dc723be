"""Integer STFT band energies + spectral fingerprint (kernels/stft)."""

import numpy as np
import pytest

from ocr_spark.kernels.stft import (
    SFP_BINS,
    SFP_FRAMES,
    SFP_WINDOW,
    STFT_SHIFT,
    band_energies,
    sfp64,
    stft_twiddles,
)


def _pcm(n=512, seed=11, amp=1000):
    rng = np.random.RandomState(seed)
    return rng.randint(-amp, amp + 1, size=n).astype(np.int64)


def test_twiddle_values_fixed_point():
    C, S = stft_twiddles()
    assert C.shape == S.shape == (SFP_BINS, SFP_WINDOW)
    assert C[0, 0] == 1 << STFT_SHIFT and S[0, 0] == 0  # cos 0 / sin 0
    # quarter period of bin 1: cos -> 0, sin -> full scale
    assert C[0, SFP_WINDOW // 4] == 0
    assert S[0, SFP_WINDOW // 4] == 1 << STFT_SHIFT
    # rebuild is bit-identical (pure function of (window, bins))
    C2, S2 = stft_twiddles()
    assert np.array_equal(C, C2) and np.array_equal(S, S2)


def test_band_energies_match_naive_bigint_dft():
    s = _pcm()
    C, S = stft_twiddles()
    E = band_energies(s)
    for f in range(SFP_FRAMES):
        frame = s[f * SFP_WINDOW : (f + 1) * SFP_WINDOW]
        for j in range(SFP_BINS):
            re = sum(int(frame[n]) * int(C[j, n]) for n in range(SFP_WINDOW))
            im = sum(int(frame[n]) * int(S[j, n]) for n in range(SFP_WINDOW))
            assert E[f][j] == re * re + im * im


def test_full_scale_int16_is_exact():
    # the squares leave int64 at full 16-bit amplitude: the Python-int
    # path must stay exact where a numpy int64 square would wrap
    # full-scale square wave at the window fundamental: bin-1 energy is
    # ~(32767 * 2/pi * 64 * 8192 / 2)^2 — far beyond int64
    s = np.where(np.arange(512) % SFP_WINDOW < SFP_WINDOW // 2, 32767, -32768).astype(
        np.int64
    )
    C, S = stft_twiddles()
    E = band_energies(s)
    frame = s[:SFP_WINDOW]
    for j in (0, 8):
        re = sum(int(frame[n]) * int(C[j, n]) for n in range(SFP_WINDOW))
        im = sum(int(frame[n]) * int(S[j, n]) for n in range(SFP_WINDOW))
        assert E[0][j] == re * re + im * im
    assert max(max(row) for row in E) > (1 << 63)  # genuinely beyond int64


def test_sfp64_gain_invariant_and_signed():
    s = _pcm(amp=500)
    v = sfp64(s)
    assert -(1 << 63) <= v < (1 << 63)
    assert sfp64(3 * s) == v  # energies scale by 9 uniformly


def test_sfp64_channels_sum():
    s = _pcm(amp=400)
    stereo = np.stack([s, s], axis=1)
    assert sfp64(stereo) == sfp64(2 * s)


def test_too_short_raises():
    with pytest.raises(ValueError):
        band_energies(_pcm(n=511))


def test_spectral_neighbors_closer_than_strangers():
    base = _pcm(seed=5)
    pert = base.copy()
    pert[:5] += 500  # the corpus perturbation: frame 0 only
    near = bin((sfp64(base) ^ sfp64(pert)) & ((1 << 64) - 1)).count("1")
    far = bin((sfp64(base) ^ sfp64(_pcm(seed=6))) & ((1 << 64) - 1)).count("1")
    assert near <= 8 < far


def test_operator_nulls_on_undecodable(spark):
    from ocr_spark.kernels.wavcodec import wav_encode
    from ocr_spark.operators.multimodal import audio_spectral_fingerprint

    good = wav_encode(_pcm().astype(np.int32), 8000)
    rows = [(1, good), (2, b"not a wav"), (3, wav_encode(_pcm(n=100).astype(np.int32), 8000))]
    df = spark.createDataFrame(rows, "blob_id long, blob binary")
    out = {r["blob_id"]: r["sfp"] for r in audio_spectral_fingerprint(df).collect()}
    assert out[1] == sfp64(_pcm())
    assert out[2] is None and out[3] is None  # junk / too short


def test_spectral_gate_detects_injected_tone():
    """A strong bin-3 tone present only in the signal half must be kept
    in every signal frame; the pure-noise control keeps (almost) nothing
    extra — the reduce_noise mask semantics."""
    rng = np.random.RandomState(3)
    noise = rng.randint(-80, 81, 512).astype(np.int64)
    sig = noise.copy()
    t = np.arange(512)
    tone = (3000 * np.cos(2 * np.pi * 3 * (t % 64) / 64)).astype(np.int64)
    sig[256:] += tone[256:]
    from ocr_spark.kernels.stft import spectral_gate

    rows = spectral_gate(sig)
    kept = {(f, j) for f, j, e, k in rows if k}
    # bin k=3 -> index j=2, signal frames 4..7 all kept
    assert {(f, 2) for f in range(4, 8)} <= kept
    control = {(f, j) for f, j, e, k in spectral_gate(noise) if k}
    assert (4, 2) not in control


def test_spectral_gate_threshold_matches_float_reference():
    """The sqrt-free integer test must agree with the naive float
    mean + 1.5*std comparison wherever the float margin is clear."""
    from ocr_spark.kernels.stft import (
        GATE_NOISE_FRAMES,
        GATE_SHIFT,
        band_energies,
        spectral_gate,
    )

    s = _pcm(n=512, seed=9, amp=700)
    E = band_energies(s)
    Eq = [[e >> GATE_SHIFT for e in row] for row in E]
    got = {(f, j): k for f, j, e, k in spectral_gate(s)}
    n = GATE_NOISE_FRAMES
    for j in range(9):
        col = [Eq[f][j] for f in range(n)]
        mu = sum(col) / n
        sd = (sum((x - mu) ** 2 for x in col) / n) ** 0.5
        for f in range(n, 8):
            margin = Eq[f][j] - (mu + 1.5 * sd)
            if abs(margin) > 1e-6 * max(1.0, mu):
                assert got[(f, j)] == (margin > 0), (f, j)


def test_spectral_gate_shapes_and_validation():
    from ocr_spark.kernels.stft import spectral_gate

    rows = spectral_gate(_pcm())
    assert len(rows) == 4 * 9 and rows == sorted(rows)
    assert all(e >= 0 for _f, _j, e, _k in rows)
    with pytest.raises(ValueError):
        spectral_gate(_pcm(), noise_frames=8)


def test_gate_operator_accounts_only_decodable(spark):
    from ocr_spark.kernels.wavcodec import wav_encode
    from ocr_spark.operators.multimodal import audio_spectral_gate

    good = wav_encode(_pcm().astype(np.int32), 8000)
    df = spark.createDataFrame(
        [(1, good), (2, b"junk")], "blob_id long, blob binary"
    )
    out = audio_spectral_gate(df).collect()
    assert {r["blob_id"] for r in out} == {1} and len(out) == 36


def test_mel_filterbank_shape_and_locality():
    from ocr_spark.kernels.stft import MEL_BANDS, MEL_BINS, mel_filterbank

    W = np.array(mel_filterbank(8000))
    assert W.shape == (MEL_BANDS, MEL_BINS) and (W >= 0).all()
    # triangles: each filter has a contiguous support that moves upward
    supports = [np.flatnonzero(row) for row in W]
    assert all(len(s) > 0 for s in supports)
    centers = [s.mean() for s in supports]
    assert centers == sorted(centers)
    # deterministic rebuild
    assert np.array_equal(W, np.array(mel_filterbank(8000)))


def test_mel_energies_match_naive_and_localize_tone():
    from ocr_spark.kernels.stft import (
        GATE_SHIFT,
        MEL_BINS,
        MEL_WEIGHT_SHIFT,
        band_energies,
        mel_energies,
        mel_filterbank,
    )

    s = _pcm(n=512, seed=21)
    M = mel_energies(s, 8000)
    E = band_energies(s, n_bins=MEL_BINS)
    W = mel_filterbank(8000)
    for f in (0, 7):
        eq = [e >> GATE_SHIFT for e in E[f]]
        for m in (0, 4, 7):
            want = sum(W[m][k] * eq[k] for k in range(MEL_BINS)) >> MEL_WEIGHT_SHIFT
            assert M[f][m] == want
    # a pure tone at bin 20 (2500 Hz) must dominate in exactly one band
    t = np.arange(512)
    tone = (2000 * np.cos(2 * np.pi * 20 * (t % 64) / 64)).astype(np.int64)
    Mt = mel_energies(tone, 8000)
    dom = int(np.argmax(Mt[0]))
    # neighbors share the overlapping triangle edges, so dominance is
    # strong but not total — measured ~84x here
    assert Mt[0][dom] > 20 * max(x for i, x in enumerate(Mt[0]) if i != dom)


def test_mel_operator_rows(spark):
    from ocr_spark.kernels.stft import MEL_BANDS, SFP_FRAMES, mel_energies
    from ocr_spark.kernels.wavcodec import wav_encode
    from ocr_spark.operators.multimodal import audio_mel

    pcm = _pcm()
    df = spark.createDataFrame(
        [(1, wav_encode(pcm.astype(np.int32), 8000)), (2, b"junk")],
        "blob_id long, blob binary",
    )
    out = audio_mel(df).collect()
    assert {r["blob_id"] for r in out} == {1}
    assert len(out) == SFP_FRAMES * MEL_BANDS
    want = mel_energies(pcm, 8000)
    got = {(r["frame"], r["mel"]): r["energy_q"] for r in out}
    assert all(got[(f, m)] == want[f][m] for f in range(SFP_FRAMES) for m in range(MEL_BANDS))
