"""Single-threaded ground-truth oracle.

Runs the same kernel as the Spark pipeline but one row at a time in plain
Python, then sorts by (conv_id, turn_idx) — the ground truth the parity
suite compares against (BASELINE.json:15 "per-turn text equality under
stable turn ordering").  Processing rows individually (batch size 1) also
proves the vectorized batch path has no cross-row state leakage; a second
mode runs the whole frame as one batch to pin batch-size invariance.
"""

from __future__ import annotations

import pandas as pd

from ocr_spark.kernel.extract import extract_batch


def oracle_extract(pdf: pd.DataFrame, row_at_a_time: bool = True) -> pd.DataFrame:
    """Extract every turn single-threaded; stable (conv_id, turn_idx) order."""
    if row_at_a_time:
        parts = [extract_batch(pdf.iloc[[i]]) for i in range(len(pdf))]
        out = pd.concat(parts, ignore_index=True) if parts else extract_batch(pdf)
    else:
        out = extract_batch(pdf)
    return out.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )
