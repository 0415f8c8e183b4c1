"""Reference-parity: the S1→A1→X1→P1→S2 pipeline end-to-end on a
synthesized amazon-reviews-shaped TSV (FIXTURES.md §11), asserting the
behaviors the reference job exhibits (all-string schema, group counts,
exactly 10 output files)."""

from __future__ import annotations

import csv
import glob
import os
import tempfile

import pytest

from emr_with_custom_metrics_spark.sources.reference_pipeline import (
    category_counts,
    convert,
    read_tsv,
)

CATEGORIES = ["Books", "Music", "Video_DVD", "Toys", "Wireless", "Home"]


@pytest.fixture(scope="module")
def reviews_tsv_dir():
    """Deterministic reviews-shaped TSV (seed-free: modular arithmetic)."""
    d = tempfile.mkdtemp(prefix="reviews_tsv_")
    cols = [
        "marketplace", "customer_id", "review_id", "product_id",
        "product_parent", "product_title", "product_category", "star_rating",
        "helpful_votes", "total_votes", "vine", "verified_purchase",
        "review_headline", "review_body", "review_date",
    ]
    with open(os.path.join(d, "part-0.tsv"), "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow(cols)
        for i in range(3000):
            w.writerow(
                [
                    "US", str(10000 + i), f"R{i:07d}", f"B{i % 700:06d}",
                    str(i % 997), f"Product {i % 700}",
                    CATEGORIES[i % len(CATEGORIES)], str(i % 5 + 1),
                    str(i % 17), str(i % 23), "N", "Y" if i % 3 else "N",
                    f"headline {i}", f"body text with tabs escaped {i}",
                    f"2015-0{i % 9 + 1}-15",
                ]
            )
    return d


def test_tsv_scan_is_all_string(spark, reviews_tsv_dir):
    df = read_tsv(spark, reviews_tsv_dir)
    assert all(dt == "string" for _, dt in df.dtypes), df.dtypes
    assert df.count() == 3000
    assert df.columns[6] == "product_category"


def test_group_counts_match_python_truth(spark, reviews_tsv_dir):
    got = {
        r["product_category"]: r["cnt"]
        for r in category_counts(read_tsv(spark, reviews_tsv_dir), "product_category").collect()
    }
    expect = {c: 3000 // len(CATEGORIES) for c in CATEGORIES}
    assert got == expect


def test_cli_entry_reference_invocation(reviews_tsv_dir):
    """The reference user's exact UX: `<script> <in> <out>` via
    `python -m emr_with_custom_metrics_spark` in a fresh process."""
    import subprocess
    import sys

    out = tempfile.mkdtemp(prefix="cli_out_") + "/pq"
    r = subprocess.run(
        [sys.executable, "-m", "emr_with_custom_metrics_spark", reviews_tsv_dir, out],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Books" in r.stdout  # X1: counts shown on stdout
    assert len(glob.glob(f"{out}/part-*.parquet")) == 10  # P1 parity

    # usage error path: exit 2 + usage text
    r2 = subprocess.run(
        [sys.executable, "-m", "emr_with_custom_metrics_spark"],
        capture_output=True,
        text=True,
        timeout=60,
        cwd="/root/repo",
    )
    assert r2.returncode == 2 and "usage:" in r2.stderr


def test_master_only_guard():
    from emr_with_custom_metrics_spark.sources.reference_pipeline import (
        should_run_on_master,
    )

    assert should_run_on_master({"isMaster": True})
    assert not should_run_on_master({"isMaster": False})
    assert not should_run_on_master({})  # absent key → not the master


def test_convert_writes_ten_parquet_files(spark, reviews_tsv_dir):
    out = tempfile.mkdtemp(prefix="reviews_out_") + "/parquet"
    counts = convert(spark, reviews_tsv_dir, out, "product_category", num_output_files=10)
    assert counts.count() == len(CATEGORIES)
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == 10, files  # reference parity: repartition(10) → 10 files
    assert spark.read.parquet(out).count() == 3000
