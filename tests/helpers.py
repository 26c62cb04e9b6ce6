"""Test helpers: order-insensitive DataFrame comparison (the driver's check)."""

from __future__ import annotations

import pandas as pd


def normalize_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    out = pdf[cols].copy()
    for c in cols:
        out[c] = out[c].astype(str)
    return out.sort_values(cols).reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    a, b = normalize_pdf(spark_pdf), normalize_pdf(oracle_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    if not a.equals(b):
        diff = pd.concat([a, b]).drop_duplicates(keep=False)
        raise AssertionError(f"{name}: value mismatch; sample diff:\n{diff.head(10)}")
