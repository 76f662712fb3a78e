"""Valid-bitstream differential fuzz for the shorten decoders.

tests/shorten_encoder.py generates structurally valid v1/v2 streams
(every predictor, blocksize/bitshift changes, AU1/AU2/ulaw/PCM types,
multi-channel) along with the exact samples they encode (independent
scalar forward simulation).  Here: pure-Python decoder == native C++
decoder == the simulator, bit-exact, across seeds.  (The pre-existing
fuzz in test_io.py proves no-crash on garbage; this proves
*correctness* on the full structural space.)
"""

import io

import numpy as np
import pytest

from speech_tpu.io.sphere import (
    _decode_shortened,
    _try_decode_shortened_native,
)

from shorten_encoder import generate


def _decode_python(payload, n_items):
    data = np.zeros(n_items, np.int16)
    bio = io.BytesIO(payload)
    preread = bio.read(16384)
    done = _decode_shortened(preread, bio, data)
    return data, done


def _decode_native(payload, n_items, nchan):
    data = np.zeros(n_items, np.int16)
    bio = io.BytesIO(payload)
    preread = bio.read(16384)
    done = _try_decode_shortened_native(preread, bio, data, nchan)
    return data, done


def _run_seed(seed):
    payload, expected, nchan = generate(seed)
    n = len(expected)
    got_py, done_py = _decode_python(payload, n)
    assert done_py * nchan == n, (seed, done_py, n)
    assert np.array_equal(got_py, expected.astype(np.int16)), (
        seed,
        np.nonzero(got_py != expected)[0][:5],
    )
    got_nat, done_nat = _decode_native(payload, n, nchan)
    if done_nat is None:
        pytest.skip("native shorten decoder unavailable in this build")
    assert done_nat == done_py, seed
    assert np.array_equal(got_nat, got_py), (
        seed,
        np.nonzero(got_nat != got_py)[0][:5],
    )


@pytest.mark.parametrize("seed", range(12))
def test_shorten_differential_smoke(seed):
    _run_seed(seed)


@pytest.mark.parametrize("block", range(12, 412, 50))
def test_shorten_differential_sweep(block):
    """Slow tier: hundreds of seeds across the structural space."""
    for seed in range(block, block + 50):
        _run_seed(seed)
