import os

from json import load as json_load
from pickle import load as pickle_load

import numpy as np
import pytest

import speech_tpu.filters as filters

from speech_tpu.config import EFFECTIVE_SUPPORT_THRESHOLD
from speech_tpu.alias import alias_factory_subclass_from_arg

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


@pytest.fixture(params=[1, 11], ids=["1 filt", "11 filts"], scope="module")
def num_filts(request):
    return request.param


@pytest.fixture(
    params=[
        lambda n: filters.TriangularOverlappingFilterBank(
            "mel", low_hz=5, num_filts=n, sampling_rate=8000, analytic=True
        ),
        lambda n: filters.TriangularOverlappingFilterBank(
            "mel", low_hz=0, num_filts=n, sampling_rate=8000, analytic=False
        ),
        lambda n: filters.Fbank(
            low_hz=0, num_filts=n, sampling_rate=8000, analytic=True
        ),
        lambda n: filters.Fbank(
            low_hz=0, num_filts=n, sampling_rate=8000, analytic=False
        ),
        lambda n: filters.GaborFilterBank(
            "mel", low_hz=0, num_filts=n, sampling_rate=8000, erb=True
        ),
        lambda n: filters.GaborFilterBank(
            "mel", low_hz=0, num_filts=n, sampling_rate=8000, erb=False
        ),
        lambda n: filters.ComplexGammatoneFilterBank(
            "mel", low_hz=0, num_filts=n, sampling_rate=8000,
            max_centered=True, erb=True,
        ),
        lambda n: filters.ComplexGammatoneFilterBank(
            "mel", low_hz=0, num_filts=n, sampling_rate=8000,
            max_centered=True, erb=False,
        ),
    ],
    ids=[
        "triangular_analytic",
        "triangular",
        "fbank_analytic",
        "fbank",
        "gabor_erb",
        "gabor",
        "gammatone_erb",
        "gammatone",
    ],
)
def bank(request, num_filts):
    return request.param(num_filts)


def test_truncated_matches_full(bank):
    for filt_idx in range(bank.num_filts):
        left_hz, right_hz = bank.supports_hz[filt_idx]
        left_samp, right_samp = bank.supports[filt_idx]
        dft_size = int(
            max(right_samp - left_samp, 2 * bank.sampling_rate / (right_hz - left_hz), 1)
        )
        full_response = bank.get_frequency_response(filt_idx, dft_size)
        bin_idx, truncated = bank.get_truncated_response(filt_idx, dft_size)
        challenge = np.zeros(dft_size, dtype=truncated.dtype)
        wrap = min(bin_idx + len(truncated), dft_size) - bin_idx
        challenge[bin_idx : bin_idx + wrap] = truncated[:wrap]
        challenge[: len(truncated) - wrap] = truncated[wrap:]
        if bank.is_real:
            challenge[
                len(challenge) - bin_idx - len(truncated) + 1 :
                len(challenge) - bin_idx + 1
            ] = truncated[: None if bin_idx else 0 : -1].conj()
        assert np.allclose(
            full_response, challenge, atol=EFFECTIVE_SUPPORT_THRESHOLD
        ), filt_idx


def test_frequency_matches_impulse(bank):
    for filt_idx in range(bank.num_filts):
        left_hz, right_hz = bank.supports_hz[filt_idx]
        left_samp, right_samp = bank.supports[filt_idx]
        if (right_samp - left_samp) < 5 or (
            2 * bank.sampling_rate / (right_hz - left_hz)
        ) < 5:
            # overly localized in one domain; attenuation swamps the isometry
            continue
        dft_size = int(
            max(right_samp - left_samp, 2 * bank.sampling_rate / (right_hz - left_hz))
        )
        X = bank.get_frequency_response(filt_idx, dft_size)
        x = bank.get_impulse_response(filt_idx, dft_size)
        assert np.allclose(np.fft.ifft(X), x, atol=1e-3), (len(x), filt_idx)


def test_half_response_matches_full(bank):
    for filt_idx in range(bank.num_filts):
        dft_size = bank.supports[filt_idx][1] - bank.supports[filt_idx][0]
        Xh = bank.get_frequency_response(filt_idx, dft_size, half=True)
        X = bank.get_frequency_response(filt_idx, dft_size, half=False)
        assert np.allclose(X[: len(Xh)], Xh)


def test_zero_outside_freq_support(bank):
    for filt_idx in range(bank.num_filts):
        left_hz, right_hz = bank.supports_hz[filt_idx]
        dft_size = int(max(1, 2 * bank.sampling_rate / (right_hz - left_hz)))
        left_period = int(np.floor(left_hz / bank.sampling_rate))
        right_period = int(np.ceil(right_hz / bank.sampling_rate))
        if right_period - left_period > 2:
            continue
        zero_mask = np.ones(dft_size, dtype=bool)
        idx = np.arange(dft_size)
        for period in range(left_period, right_period + 1):
            freq = (idx / dft_size + period) * bank.sampling_rate
            zero_mask &= (freq < left_hz) | (freq > right_hz)
        if bank.is_real:
            zero_mask[1:] &= zero_mask[-1:0:-1]
        if not np.any(zero_mask):
            continue
        X = bank.get_frequency_response(filt_idx, dft_size)
        assert np.allclose(
            X[zero_mask],
            0,
            atol=(right_period - left_period) * EFFECTIVE_SUPPORT_THRESHOLD,
        )


def test_zero_outside_temp_support(bank):
    for filt_idx in range(bank.num_filts):
        left_samp, right_samp = bank.supports[filt_idx]
        width = int(max(1, right_samp - left_samp))
        left_period = int(np.floor(left_samp / width))
        right_period = int(np.ceil(right_samp / width))
        if right_period - left_period > 2:
            continue
        zero_mask = np.ones(width, dtype=bool)
        idx = np.arange(width)
        for period in range(left_period, right_period + 1):
            t = idx + period * width
            zero_mask &= (t < left_samp) | (t > right_samp)
        if not np.any(zero_mask):
            continue
        x = bank.get_impulse_response(filt_idx, width)
        assert np.allclose(
            x[zero_mask],
            0,
            atol=(right_period - left_period) * EFFECTIVE_SUPPORT_THRESHOLD,
        )


@pytest.mark.parametrize("window_size", [10, 100, 1000])
@pytest.mark.parametrize("peak_ratio", [0.5, 0.75, 0.9])
@pytest.mark.parametrize("order", [2, 4])
def test_gamma_window_peak_matches(window_size, peak_ratio, order):
    expected_max_idx = window_size * peak_ratio
    window = filters.GammaWindow(order=order, peak=peak_ratio).get_impulse_response(
        window_size
    )
    max_idx = np.argmax(window)
    assert int(expected_max_idx) in (max_idx, max_idx + 1)


def test_window_normalization():
    for cls in (
        filters.BartlettWindow,
        filters.BlackmanWindow,
        filters.HammingWindow,
        filters.HannWindow,
    ):
        window = cls().get_impulse_response(257)
        assert np.isclose(np.sum(window), 1.0, rtol=1e-2), cls


def test_kaldi_filters_match_fbank_filters():
    # golden Kaldi-generated mel filters (tests/data/kaldi_filts.pkl),
    # squared because Fbank stores the square-rooted response
    with open(os.path.join(DATA_DIR, "kaldi_filts.pkl"), "rb") as pkl_file:
        kaldi_40 = pickle_load(pkl_file)
    bank = filters.Fbank(
        num_filts=40, low_hz=20, high_hz=8000, sampling_rate=16000, analytic=False
    )
    for filt_idx, (kaldi_offset, kaldi_filt) in enumerate(kaldi_40):
        bank_offset, bank_filt = bank.get_truncated_response(filt_idx, 2 ** 9)
        bank_filt = bank_filt ** 2
        assert bank_offset == kaldi_offset
        assert np.allclose(bank_filt[: len(kaldi_filt)], kaldi_filt, atol=1e-5)
        assert np.allclose(bank_filt[len(kaldi_filt) :], 0.0)


@pytest.mark.parametrize(
    "alias,cls",
    [
        ("tri", filters.TriangularOverlappingFilterBank),
        ("triangular", filters.TriangularOverlappingFilterBank),
        ("fbank", filters.Fbank),
        ("gabor", filters.GaborFilterBank),
        ("gammatone", filters.ComplexGammatoneFilterBank),
        ("tonebank", filters.ComplexGammatoneFilterBank),
    ],
)
def test_bank_aliases(alias, cls):
    cfg = {"name": alias}
    if alias != "fbank":
        cfg["scaling_function"] = "mel"
    bank = alias_factory_subclass_from_arg(filters.LinearFilterBank, cfg)
    assert isinstance(bank, cls)


def test_reference_bank_parity(reference_speech, num_filts):
    """Every bank's precompute outputs match the float64 reference exactly."""
    import pydrobert.speech.filters as ref_filters

    pairs = [
        (
            filters.TriangularOverlappingFilterBank(
                "mel", low_hz=5, num_filts=num_filts, sampling_rate=8000
            ),
            ref_filters.TriangularOverlappingFilterBank(
                "mel", low_hz=5, num_filts=num_filts, sampling_rate=8000
            ),
        ),
        (
            filters.Fbank(low_hz=20, num_filts=num_filts, sampling_rate=16000),
            ref_filters.Fbank(low_hz=20, num_filts=num_filts, sampling_rate=16000),
        ),
        (
            filters.GaborFilterBank(
                "mel", low_hz=0, num_filts=num_filts, sampling_rate=8000, erb=True
            ),
            ref_filters.GaborFilterBank(
                "mel", low_hz=0, num_filts=num_filts, sampling_rate=8000, erb=True
            ),
        ),
        (
            filters.ComplexGammatoneFilterBank(
                "mel", low_hz=0, num_filts=num_filts, sampling_rate=8000,
                max_centered=True,
            ),
            ref_filters.ComplexGammatoneFilterBank(
                "mel", low_hz=0, num_filts=num_filts, sampling_rate=8000,
                max_centered=True,
            ),
        ),
    ]
    for mine, ref in pairs:
        assert mine.num_filts == ref.num_filts
        assert np.allclose(mine.supports_hz, ref.supports_hz)
        assert tuple(map(tuple, mine.supports)) == tuple(map(tuple, ref.supports))
        for idx in range(mine.num_filts):
            width = max(mine.supports[idx][1] - mine.supports[idx][0], 4)
            assert np.allclose(
                mine.get_impulse_response(idx, width),
                ref.get_impulse_response(idx, width),
                atol=1e-10,
            ), type(mine)
            assert np.allclose(
                mine.get_frequency_response(idx, width),
                ref.get_frequency_response(idx, width),
                atol=1e-10,
            )
            my_off, my_trunc = mine.get_truncated_response(idx, width)
            ref_off, ref_trunc = ref.get_truncated_response(idx, width)
            assert my_off == ref_off
            assert np.allclose(my_trunc, ref_trunc, atol=1e-10)
