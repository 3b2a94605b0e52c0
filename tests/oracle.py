"""Driver-side pandas oracle for CDC replay — independent of the engine.

Mirrors the reference test harness's order-insensitive golden compare
(``bigquery_etl/pytest_plugin/sql.py:214-233``): final state equality with
token-array equality per row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def replay_oracle(
    base: pa.Table, log: pa.Table, upto_epoch: int | None = None
) -> pd.DataFrame:
    """Sequential LWW replay in pandas: last (max-lsn) event per doc wins;
    op=D removes; absent-key deletes are no-ops."""
    b = base.to_pandas()
    l = log.to_pandas()
    if upto_epoch is not None:
        l = l[l["epoch"] <= upto_epoch]
    l = l.sort_values("lsn", kind="stable")
    last = l.drop_duplicates(subset=["doc_id"], keep="last")

    payload_cols = [c for c in b.columns]
    extra = [c for c in last.columns if c not in payload_cols + ["lsn", "epoch", "op", "event_ts"]]
    for c in extra:  # evolution columns absent from base -> null-backfill
        b[c] = None
        payload_cols.append(c)

    survivors = b[~b["doc_id"].isin(set(last["doc_id"]))]
    upserts = last[last["op"] != "D"][payload_cols]
    final = pd.concat([survivors[payload_cols], upserts], ignore_index=True)
    return final.sort_values("doc_id", kind="stable").reset_index(drop=True)


def normalize_state(df: pd.DataFrame) -> pd.DataFrame:
    out = df.sort_values("doc_id", kind="stable").reset_index(drop=True)
    return out


def assert_states_equal(actual: pd.DataFrame, expected: pd.DataFrame) -> None:
    actual = normalize_state(actual)
    expected = normalize_state(expected)
    assert list(actual["doc_id"]) == list(expected["doc_id"]), (
        f"doc_id sets differ: {len(actual)} vs {len(expected)} rows; "
        f"only-actual={set(actual['doc_id']) - set(expected['doc_id'])} "
        f"only-expected={set(expected['doc_id']) - set(actual['doc_id'])}"
    )
    for col in expected.columns:
        if col == "tokens":
            for i, (a, e) in enumerate(zip(actual["tokens"], expected["tokens"])):
                a_l = list(a) if a is not None else None
                e_l = list(e) if e is not None else None
                assert a_l == e_l, f"tokens mismatch at row {i} ({actual['doc_id'][i]})"
        else:
            a = actual[col].to_numpy(dtype=object)
            e = expected[col].to_numpy(dtype=object)
            neq = [
                i
                for i in range(len(e))
                if not (
                    (a[i] is None or (isinstance(a[i], float) and np.isnan(a[i])))
                    and (e[i] is None or (isinstance(e[i], float) and np.isnan(e[i])))
                )
                and a[i] != e[i]
            ]
            assert not neq, f"{col} mismatch at rows {neq[:5]}: {a[neq[0]]} != {e[neq[0]]}"
