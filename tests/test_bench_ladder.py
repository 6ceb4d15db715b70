"""bench.py's one-JSON-line size ladder: the artifact must survive the
round driver's 2000-byte stdout tail, and the rungs must sacrifice the
bulkiest optional field (drift.ab's raw re-timings) BEFORE the
comparison fields the next round depends on (query mins,
round_over_round) — the BENCH_r11 parsed:null lesson plus its r12
ADVICE follow-up."""

from __future__ import annotations

import json

from bench import _bounded_line  # conftest puts the repo root on sys.path


def _payload(n_queries: int, with_ab: bool) -> dict:
    queries = {f"q_very_long_headline_name_{i:03d}": 1.234 for i in range(n_queries)}
    mins = {q: 1.111 for q in queries}
    drift: dict = {
        "floor_artifact": "BENCH_r12.json",
        "ratio_threshold": 1.25,
        "elevated": {},
    }
    if with_ab:
        names = list(queries)[:6]
        drift["elevated"] = {
            q: {"min": 2.5, "floor": 1.1, "ratio": 2.273} for q in names
        }
        drift["ab"] = {
            "pinned_commit": "f" * 40,
            "pinned_mins": {q: 2.401 for q in names},
            "head_mins": {q: 2.489 for q in names},
        }
    return {
        "metric": "headline_queries_total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "query_mins": mins,
        "index_build_costs": {},
        "sf": 0.1,
        "runs_per_query": 5,
        "round_over_round": {
            "floor_artifact": "BENCH_r12.json",
            "shared_total": 40.0,
            "prior_shared_total": 41.0,
            "new_lines": {"q_new_line_this_round": 9.79},
            "retired_lines": [],
        },
        "loadavg_before": [0.5, 0.6, 0.7],
        "loadavg_after": [8.0, 4.0, 2.0],
        "drift": drift,
    }


def test_small_payload_passes_through_unchanged():
    payload = _payload(4, with_ab=False)
    line = _bounded_line(dict(payload))
    parsed = json.loads(line)
    assert parsed["query_mins"] == payload["query_mins"]
    assert parsed["drift"]["elevated"] == {}


def test_ab_re_timings_fold_before_comparison_fields_drop():
    """A drift block carrying per-query A/B re-timing dicts is the
    bulkiest optional field: past the budget it must fold to one
    head/pinned ratio per query while query mins (as query_mins_v) and
    round_over_round SURVIVE."""
    # pick the budget to land exactly on the ab rung: just under the
    # line's size AFTER the two lossless-ish rungs (mins->parallel
    # array, new_lines->names) but with the raw ab dicts still present
    probe = _payload(30, with_ab=True)
    probe["query_mins_v"] = [
        probe["query_mins"][q] for q in probe["queries"]
    ]
    del probe["query_mins"]
    probe["round_over_round"]["new_lines"] = sorted(
        probe["round_over_round"]["new_lines"]
    )
    budget = len(json.dumps(probe, separators=(",", ":"))) - 1

    payload = _payload(30, with_ab=True)
    line = _bounded_line(payload, budget=budget)
    assert len(line) <= budget
    parsed = json.loads(line)
    ab = parsed["drift"]["ab"]
    assert "pinned_mins" not in ab and "head_mins" not in ab
    assert ab["pinned_commit"] == "f" * 40
    ratios = ab["head_over_pinned"]
    assert len(ratios) == 6
    assert all(abs(r - round(2.489 / 2.401, 3)) < 1e-9 for r in ratios.values())
    # the verdict survives AND the comparison fields were not sacrificed
    assert "query_mins_v" in parsed or "query_mins" in parsed
    assert isinstance(parsed.get("round_over_round"), dict)
    # elevation list (min/floor/ratio per query) is still present
    assert len(parsed["drift"]["elevated"]) == 6


def test_ladder_still_reaches_mins_drop_when_ab_fold_is_not_enough():
    """With an enormous headline set the later rungs still fire, in
    order: after the ab fold, mins drop before round_over_round."""
    payload = _payload(120, with_ab=True)
    line = _bounded_line(payload, budget=1950)
    parsed = json.loads(line)
    assert "query_mins" not in parsed and "query_mins_v" not in parsed
    assert parsed["query_mins_note"] == "dropped: line budget"
    ab = parsed["drift"]["ab"]
    assert "pinned_mins" not in ab  # the ab rung fired first


def test_elevated_block_folds_to_ratios_on_a_hot_machine():
    """A hot machine can elevate a dozen lines at once (the r13
    end-of-round run: 14 elevations exhausted the pre-rung ladder at
    2376 bytes). The elevated block must fold to ratios-only — mins
    live in query_mins_v, floors in the named artifact — and the line
    must fit with the comparison fields intact."""
    payload = _payload(28, with_ab=True)
    # widen the elevation list to a hot-machine shape
    payload["drift"]["elevated"] = {
        q: {"min": 2.5, "floor": 1.7, "ratio": 1.47}
        for q in list(payload["queries"])[:14]
    }
    payload["drift"]["ab"] = {
        "pinned_commit": "f" * 40,
        "pinned_mins": {q: 2.4 for q in list(payload["queries"])[:14]},
        "head_mins": {q: 2.45 for q in list(payload["queries"])[:14]},
    }
    # land the budget exactly on the elevated rung: just under the
    # line's size after every EARLIER rung (mins->array, new_lines
    # names, ab fold) has fired
    import copy

    probe = copy.deepcopy(payload)
    probe["query_mins_v"] = [probe["query_mins"][q] for q in probe["queries"]]
    del probe["query_mins"]
    probe["round_over_round"]["new_lines"] = sorted(
        probe["round_over_round"]["new_lines"]
    )
    ab = probe["drift"]["ab"]
    probe["drift"]["ab"] = {
        "pinned_commit": ab["pinned_commit"],
        "head_over_pinned": {
            q: round(ab["head_mins"][q] / ab["pinned_mins"][q], 3)
            for q in ab["head_mins"]
        },
        "note": "raw re-timings dropped: line budget",
    }
    budget = len(json.dumps(probe, separators=(",", ":"))) - 1

    line = _bounded_line(payload, budget=budget)
    assert len(line) <= budget
    parsed = json.loads(line)
    elevated = parsed["drift"]["elevated"]
    assert all(isinstance(v, float) for v in elevated.values())
    assert len(elevated) == 14
    assert parsed["drift"]["elevated_note"] == "ratios only: line budget"
    assert "query_mins_v" in parsed or "query_mins" in parsed


def test_drift_summarizes_before_comparison_fields_drop():
    """The r13 end-of-round shape: 18 lines elevated, both folds fired,
    and the old ladder then sacrificed query mins AND round_over_round
    while the folded drift still held ~1 KB. The summarization rung
    must fire first — per-query diagnostics reduce to aggregate
    verdicts (n/max/median elevation, n/max/median head-over-pinned)
    and the comparison fields SURVIVE."""
    payload = _payload(28, with_ab=True)
    names = list(payload["queries"])[:18]
    payload["drift"]["elevated"] = {
        q: {"min": 2.5, "floor": 1.7, "ratio": 1.4 + i / 100}
        for i, q in enumerate(names)
    }
    payload["drift"]["ab"] = {
        "pinned_commit": "f" * 40,
        "pinned_mins": {q: 2.4 for q in names},
        "head_mins": {q: 2.45 for q in names},
    }
    # the budget exactly fits the fully-summarized line WITH the
    # comparison fields intact — so reaching it proves the ladder
    # stopped at the summarize rung instead of dropping mins/rr
    import copy

    probe = copy.deepcopy(payload)
    probe["query_mins_v"] = [probe["query_mins"][q] for q in probe["queries"]]
    del probe["query_mins"]
    probe["round_over_round"]["new_lines"] = sorted(
        probe["round_over_round"]["new_lines"]
    )
    probe["drift"] = {
        "floor_artifact": "BENCH_r12.json",
        "ratio_threshold": 1.25,
        "elevated": {"n": 18, "max": 1.57, "median": 1.485},
        "note": "summarized: line budget",
        "ab": {
            "pinned_commit": "f" * 40,
            "head_over_pinned": {"n": 18, "max": 1.021, "median": 1.021},
        },
    }
    budget = len(json.dumps(probe, separators=(",", ":")))

    line = _bounded_line(payload, budget=budget)
    assert len(line) <= budget
    parsed = json.loads(line)
    drift = parsed["drift"]
    assert drift["note"] == "summarized: line budget"
    assert drift["elevated"]["n"] == 18
    assert abs(drift["elevated"]["max"] - 1.57) < 1e-9
    # statistics.median convention: even counts average the two middle
    # samples (1.48, 1.49) instead of reporting the upper one
    assert abs(drift["elevated"]["median"] - 1.485) < 1e-9
    hop = drift["ab"]["head_over_pinned"]
    assert hop["n"] == 18 and abs(hop["max"] - round(2.45 / 2.4, 3)) < 1e-9
    assert drift["ab"]["pinned_commit"] == "f" * 40
    # the whole point: comparison fields outlive the diagnostics
    assert "query_mins_v" in parsed or "query_mins" in parsed
    assert isinstance(parsed.get("round_over_round"), dict)
