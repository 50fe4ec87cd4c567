"""Printed-line budget for bench.py (round-4 postmortem).

The driver captures only the LAST 2000 chars of bench output; round 4's
full-detail JSON line exceeded that and BENCH_r04.json recorded
``parsed: null`` — the most load-bearing artifact of the round was
unreadable.  This test pins the fix: the compact projection of a
FULLY-POPULATED result (every optional block present, worst-case rep
counts, rescue audit fields, complete history) must stay under 1800
chars, leaving ≥200 chars of slack inside the capture window.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _full_pair(lo: int, hi: int, reps: int) -> dict:
    def lvl(sec):
        return {
            "sec": sec,
            "turns_per_sec": round(311269 / sec, 1),
            "all_runs_sec": [round(sec * (1 + 0.37 * i), 2) for i in range(reps)],
        }

    return {
        "turns": 311269,
        "levels": [lo, hi],
        f"local[{lo}]": lvl(24.77),
        f"local[{hi}]": lvl(11.96),
        "scaling_efficiency": 0.518,
        "control": {
            f"mp[{lo}]": lvl(14.53),
            f"mp[{hi}]": lvl(4.42),
            "efficiency": 0.823,
        },
        "normalized_efficiency": 0.629,
        "convs": 60000,
        "collapsed": True,
        "rescue_reps": 1,
        "pre_rescue": {"scaling_efficiency": 0.119, "normalized_efficiency": 0.145},
    }


def _full_result() -> dict:
    queries = {q: 12.34 for q in bench.HEADLINE}
    return {
        "metric": (
            "headline ops wall-clock at sf + extraction turns/sec at two "
            "parallelism levels"
        ),
        "value": round(sum(queries.values()), 2),
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "ann_recall": {
            "k": 5,
            "n_queries": 64,
            "sf_dir": "/root/testdata/sf0.1",
            "lsh_radius0": 0.238,
            "lsh_radius1": 0.697,
            "lsh_radius2": 1.0,
            "ivf_nprobe1": 0.55,
            "ivf_nprobe2": 0.81,
            "ivf_nprobe4": 1.0,
            "ivf_kmeans_nprobe1": 0.58,
            "ivf_kmeans_nprobe2": 0.84,
            "ivf_kmeans_nprobe4": 1.0,
            "dedup_emb_pairs_exact": 123,
            "dedup_emb_pair_recall": 0.934,
            "dedup_minhash_pairs_exact": 456,
            "dedup_minhash_pair_recall": 0.987,
        },
        "lsh_guard": {
            "cap": 200,
            "minhash_bands": {
                "n_buckets": 2033,
                "max_bucket": 26,
                "n_dropped_buckets": 3,
                "n_dropped_rows": 712,
            },
            "embedding_bands": {
                "n_buckets": 1024,
                "max_bucket": 31,
                "n_dropped_buckets": 0,
                "n_dropped_rows": 0,
            },
            "ann_tables": {
                "n_buckets": 2048,
                "max_bucket": 19,
                "n_dropped_buckets": 0,
                "n_dropped_rows": 0,
            },
        },
        "extraction": {
            **_full_pair(8, 32, 5),
            "secondary": {**_full_pair(2, 8, 2), "convs": 20000},
            "peak": {"cores": 16, "sec": 4.48, "turns_per_sec": 69479.7},
        },
        "history": {
            "since": bench.FIX_CUTOFF,
            "note": "x" * 300,  # prose must NOT survive into the printed line
            "extraction": {
                "primary_raw": {"n": 30, "median": 0.51, "best": 0.65},
                "primary_norm": {"n": 30, "median": 0.727, "best": 0.903},
                "secondary_raw": {"n": 29, "median": 0.767, "best": 0.976},
                "secondary_norm": {"n": 29, "median": 0.844, "best": 1.076},
                "peak_turns_per_sec": {"n": 17, "median": 50448.8, "best": 69479.7},
            },
            "headline": {
                "n": 9,
                "total_median": 18.19,
                "total_best": 13.17,
                "per_query_best": {q: 1.77 for q in bench.HEADLINE},
            },
        },
    }


def test_compact_line_fits_driver_capture():
    line = json.dumps(bench._compact_result(_full_result()))
    assert len(line) < 1800, f"printed line {len(line)} chars; driver keeps 2000"


def test_compact_keeps_driver_contract_keys():
    out = bench._compact_result(_full_result())
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in out
    assert set(out["queries"]) == set(bench.HEADLINE)
    # scaling evidence survives: both pairs' efficiencies + audit flags
    ex = out["extraction"]
    assert ex["eff"] == 0.518 and ex["norm_eff"] == 0.629
    assert ex["collapsed"] is True and ex["pre_rescue_norm"] == 0.145
    assert ex["secondary"]["eff"] == 0.518
    assert ex["peak_tps"] == 69479
    # history numbers survive; prose and per-query maps do not
    hist = out["history"]
    assert hist["primary_norm"] == {"n": 30, "median": 0.727, "best": 0.903}
    assert "note" not in hist and "per_query_best" not in json.dumps(hist)
    # guard collapses to one audit scalar (nonzero drop stays visible)
    assert out["lsh_guard"] == {"dropped_rows": 712}


def test_compact_error_paths_still_fit():
    r = _full_result()
    r["extraction"] = {"error": "all scaling worker reps failed " * 20}
    r["ann_recall"] = {"error": "boom " * 100}
    r["lsh_guard"] = {"error": "boom " * 100}
    line = json.dumps(bench._compact_result(r))
    assert len(line) < 1800
