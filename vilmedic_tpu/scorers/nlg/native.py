"""ctypes binding for the native n-gram scorer core (``native/ngram_scores.cpp``).

Builds the shared library on first use with g++ (cached under ``native/build``);
falls back cleanly when no compiler is available. The accelerated path is used
by ``Bleu`` for SCST reward computation — per-batch, per-sentence scoring is the
hot host loop during RL fine-tuning (reference blocks/rl/SCST.py:178-186).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
_SRC = os.path.join(_REPO_ROOT, "native", "ngram_scores.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libngram_scores.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC],
            check=True, capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO):
            src_mtime = os.path.getmtime(_SRC) if os.path.exists(_SRC) else 0
            if not os.path.exists(_SRC) or not _build():
                return None
        elif os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_SO):
            _build()
        try:
            lib = ctypes.CDLL(_SO)
            lib.bleu_score.restype = ctypes.c_double
            lib.bleu_score.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.rouge_l_batch.restype = None
            lib.rouge_l_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
            ]
            _lib = lib
        except (OSError, AttributeError):
            _lib = None
        return _lib


def bleu_native(
    refs: List[str], hyps: List[str], n: int = 4
) -> Optional[Tuple[float, List[float]]]:
    """Corpus + per-sentence BLEU via the C++ core; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    count = len(refs)
    refs_arr = (ctypes.c_char_p * count)(*[r.encode("utf-8") for r in refs])
    hyps_arr = (ctypes.c_char_p * count)(*[h.encode("utf-8") for h in hyps])
    per = (ctypes.c_double * count)()
    corpus = lib.bleu_score(refs_arr, hyps_arr, count, n, per)
    return float(corpus), [float(x) for x in per]


def rouge_l_native(
    ref_tokens: List[List[str]], hyp_tokens: List[List[str]]
) -> Optional[List[float]]:
    """Per-pair ROUGE-L F1 via the C++ LCS core over PRE-TOKENIZED (already
    rouge_score-tokenized + stemmed) token lists; None if unavailable.
    Replaces the pure-Python O(m*n) DP that dominates the SCST reward phase
    (measured 177.7 ms/iter of a 309 ms SCST iteration, BENCH r4)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "rouge_l_batch"):
        return None
    count = len(ref_tokens)
    refs_arr = (ctypes.c_char_p * count)(
        *[" ".join(t).encode("utf-8") for t in ref_tokens]
    )
    hyps_arr = (ctypes.c_char_p * count)(
        *[" ".join(t).encode("utf-8") for t in hyp_tokens]
    )
    f1 = (ctypes.c_double * count)()
    lib.rouge_l_batch(refs_arr, hyps_arr, count, f1)
    return [float(x) for x in f1]
