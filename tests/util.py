"""Bit-for-bit state comparison (SURVEY.md §2.2 C9 verifier, test side)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def assert_state_equal(spark_df, expected: pd.DataFrame) -> None:
    """Engine state vs pandas oracle: same rows, same values, token arrays
    element-wise equal as int32."""
    got = spark_df.orderBy("doc_id").toPandas().reset_index(drop=True)
    exp = expected.sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), f"row count {len(got)} != {len(exp)}"
    for col in got.columns:
        if col == "tokens":
            for i, (g, e) in enumerate(zip(got[col], exp[col])):
                g_null = g is None or (isinstance(g, float) and np.isnan(g))
                e_null = e is None or (isinstance(e, float) and np.isnan(e))
                assert g_null == e_null, f"tokens null mismatch row {i}"
                if not g_null:
                    ga = np.asarray(g)
                    ea = np.asarray(e)
                    assert ga.dtype == np.int32 or ga.dtype == np.dtype("int32"), ga.dtype
                    assert np.array_equal(ga, ea), f"tokens differ at row {i} (doc {got['doc_id'][i]})"
        else:
            g = got[col]
            e = exp[col].astype(g.dtype) if g.dtype != object and not exp[col].isna().any() else exp[col]
            pd.testing.assert_series_equal(
                g, e, check_names=False, check_dtype=False, obj=f"column {col}"
            )
