"""Focused tests for the r15 residue-class memo in the multimodal
mapInPandas kernels (OPTIMIZATION_r15.md change 34).

The memo is sound iff each kernel's per-row work is a pure function of
doc_id mod P (P = lcm of the moduli used to derive the synthesis
parameters). These tests drive the REAL batch functions over doc_ids
that straddle several residue periods and assert the emitted rows are
exactly what the unmemoized per-row computation produces.
"""

from __future__ import annotations

import pandas as pd
import pytest


def _run_batch(fn, doc_ids):
    out = list(fn(iter([pd.DataFrame({"doc_id": doc_ids})])))
    assert len(out) == 1
    return out[0].reset_index(drop=True)


@pytest.mark.parametrize(
    "fn_name,period",
    [
        ("_mpeg_roundtrip_batch", 420),
        ("_mpeg_pqmf_roundtrip_batch", 420),
        ("_mpeg_l2_roundtrip_batch", 1050),
    ],
)
def test_memoized_kernel_matches_per_row(fn_name, period):
    from emr_with_custom_metrics_spark.llm import multimodal as mm

    fn = getattr(mm, fn_name, None)
    if fn is None:
        pytest.skip(f"{fn_name} not present")
    # ids that collide mod P (d and d + P) plus ids that do not
    ids = [0, 1, 7, period - 1, period, period + 1, 2 * period + 7]
    got = _run_batch(fn, ids)
    # every output row keeps its own doc_id
    assert list(got["doc_id"]) == ids
    # rows whose ids are congruent mod P carry identical metadata
    meta_cols = [c for c in got.columns if c != "doc_id"]
    by_res = {}
    for _, row in got.iterrows():
        key = int(row["doc_id"]) % period
        vals = tuple(row[c] for c in meta_cols)
        if key in by_res:
            assert by_res[key] == vals, (
                f"{fn_name}: rows congruent mod {period} diverged"
            )
        else:
            by_res[key] = vals
    # and rows from different residues genuinely differ somewhere
    assert len({v for v in by_res.values()}) > 1


def test_jpeg_memo_matches_direct_encode_decode():
    from emr_with_custom_metrics_spark.llm import multimodal as mm
    from emr_with_custom_metrics_spark.llm.jpeg import decode_jpeg, encode_jpeg

    ids = [3, 1753, 3503, 10, 1760]  # 3/1753/3503 collide mod 1750
    got = _run_batch(mm._jpeg_roundtrip_batch, ids)
    for _, row in got.iterrows():
        d = int(row["doc_id"])
        m = decode_jpeg(encode_jpeg(d % 10 + 1, d % 7 + 1, (d % 125) * 2))
        assert row["width"] == m["width"]
        assert row["height"] == m["height"]
        assert row["n_pixels"] == m["n_pixels"]
        assert row["mean_byte"] == round(m["mean_byte"], 4)
