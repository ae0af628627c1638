"""Native C++ n-gram core: builds, loads, and matches the Python BLEU exactly."""

import numpy as np
import pytest

from vilmedic_tpu.scorers.nlg.bleu import Bleu
from vilmedic_tpu.scorers.nlg.native import bleu_native, get_lib

REFS = [
    "there is no evidence of pneumonia .",
    "heart size is normal .",
    "small left pleural effusion .",
    "a b c d e f g h i j",
    "",
]
HYPS = [
    "there is no pneumonia .",
    "the heart size is enlarged .",
    "no pleural effusion .",
    "a b c d",
    "something",
]


def test_native_builds():
    assert get_lib() is not None, "g++ build of ngram_scores failed"


def test_native_matches_python_bleu():
    py = Bleu(use_native=False)(REFS, HYPS)
    nat = bleu_native(REFS, HYPS)
    assert nat is not None
    np.testing.assert_allclose(nat[0], py[0], rtol=1e-9)
    np.testing.assert_allclose(nat[1], py[1], rtol=1e-9)


def test_bleu_dispatches_native():
    fast = Bleu()(REFS, HYPS)
    slow = Bleu(use_native=False)(REFS, HYPS)
    assert fast[0] == pytest.approx(slow[0], rel=1e-9)


def test_native_throughput_sane():
    import time

    refs = REFS * 200
    hyps = HYPS * 200
    t0 = time.perf_counter()
    bleu_native(refs, hyps)
    native_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    Bleu(use_native=False)(refs, hyps)
    python_t = time.perf_counter() - t0
    # the C++ core should never be slower than the Python implementation
    assert native_t <= python_t * 1.5, (native_t, python_t)
