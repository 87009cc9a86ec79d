"""Evaluation metrics.

sklearn accuracy / weighted-F1 / classification_report, matching the
reference's metric stack (reference: whisper_finetune/evaluate_simple.py:167-169,
evaluate.py:334-351), plus a first-party WER implementation — the reference
README names WER as a metric but never computes one (BASELINE.md).
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence


def classification_metrics(y_true: Sequence[int], y_pred: Sequence[int],
                           idx_to_name: Dict[int, str]) -> dict:
    from sklearn.metrics import (accuracy_score, classification_report,
                                 f1_score)

    if not len(y_true):
        return {"samples": 0, "accuracy": 0.0, "weighted_f1": 0.0,
                "report": "No predictions available."}
    present = sorted(set(list(y_true) + list(y_pred)))
    report = classification_report(
        y_true, y_pred, labels=present,
        target_names=[idx_to_name.get(i, f"Unknown_{i}") for i in present],
        digits=3, zero_division=0)
    return {
        "samples": len(y_true),
        "accuracy": float(accuracy_score(y_true, y_pred)),
        "weighted_f1": float(f1_score(y_true, y_pred, average="weighted",
                                      zero_division=0)),
        "report": report,
    }


def compression_ratio(text) -> float:
    """zlib compression ratio of the text (str or raw bytes) — whisper's
    repetition-detection heuristic (the reference passes
    compression_ratio_threshold=2.4 to generate, evaluate.py:52; ratios
    above the threshold indicate the degenerate repetition visible in its
    predictions.txt)."""
    import zlib

    data = text.encode("utf-8") if isinstance(text, str) else bytes(text)
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


def _normalize_text(s: str) -> List[str]:
    s = s.lower()
    s = re.sub(r"[^\w\s']", " ", s)
    return s.split()


def word_error_rate(refs: Sequence[str], hyps: Sequence[str]) -> float:
    """Corpus WER: total edit distance / total reference words."""
    total_err = total_words = 0
    for ref, hyp in zip(refs, hyps):
        r, h = _normalize_text(ref), _normalize_text(hyp)
        total_words += len(r)
        total_err += _edit_distance(r, h)
    return total_err / max(total_words, 1)


def _edit_distance(a: List[str], b: List[str]) -> int:
    import numpy as np
    prev = np.arange(len(b) + 1)
    for i, wa in enumerate(a, 1):
        cur = np.empty_like(prev)
        cur[0] = i
        for j, wb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (wa != wb))
        prev = cur
    return int(prev[-1])
