"""Golden-drift guard for the flagship replay oracle: the committed
expected-state parquet (tests/golden/cdc10_expected.parquet) must equal a
fresh run of ``cdc10_engine_replay`` bit-for-bit.  A red here means the
engine's replay semantics changed — if intentional, regenerate with
``python tools/make_golden.py`` and review the data diff; if not, the
MERGE pipeline regressed."""

import pandas as pd

from cfe_39_spark.queries import REGISTRY
from cfe_39_spark.queries.cdcq import _GOLDEN_CDC10


def test_cdc10_replay_matches_committed_golden(spark):
    got = (
        REGISTRY["cdc10_engine_replay"]
        .fn(spark, "/root/testdata/sf0.001")
        .orderBy("doc_id")
        .toPandas()
        .reset_index(drop=True)
    )
    want = (
        pd.read_parquet(_GOLDEN_CDC10)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    for col in ("n_tok", "source", "token_checksum"):
        mism = (got[col] != want[col]).sum()
        assert mism == 0, f"{col}: {mism} rows differ from golden"
    # dtypes matter too: the driver's oracle compares schemas
    assert [str(t) for t in got.dtypes] == [str(t) for t in want.dtypes]
