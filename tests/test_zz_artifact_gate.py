"""Self-enforcing freshness gate for the committed verification
artifacts (the r9 verdict's demand #1, ending the r3/r4/r9
recurrence): a VERIFY_LOCAL/PLAN_AUDIT/DETERMINISM/STREAM_PLANS that
is stale relative to the live registry or the newest source commit
FAILS the default pytest suite, instead of relying on the builder
remembering to run tools/end_of_round.py.

Two independent checks per artifact:

1. COVERAGE — the artifact's recorded ``n_queries`` must equal the
   live registry size (``len(QUERIES)``; STREAM_PLANS covers the
   plan-audit SKIP set instead), and its failure/red-flag counters
   must be zero. A query added after the artifact was generated is
   invisible to it, so count mismatch == stale evidence.

2. MTIME — the artifact file's mtime must postdate the committer
   timestamp of the newest commit touching engine/tooling source
   (``mapreducego_spark/``, ``__spark_entry__.py``, ``bench.py``,
   ``tools/``). This catches the subtler staleness the count check
   cannot: an edit to an EXISTING query after the artifact ran.
   Tests and prose docs are excluded from the trigger set — they are
   evidence about the engine, not part of what the artifacts certify
   — so writing NOTES or adding a pytest does not demand a multi-
   hour regeneration. A fresh ``git checkout`` stamps every file
   with checkout time, so clean clones trivially pass; the gate
   bites exactly in the long-lived build workspace where the r3/r4/
   r9 staleness actually happened.

The file sorts last in collection (zz) so a red gate never masks
real test results under ``-x``.
"""

from __future__ import annotations

import json
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Paths whose newest commit defines "the last source change the
# artifacts must postdate". Positive list: engine, entrypoints, and
# the verification tooling itself (an oracle or audit edit changes
# what the artifacts mean just as much as an operator edit does).
_SOURCE_PATHS = ["mapreducego_spark", "__spark_entry__.py", "bench.py", "tools"]

_MTIME_GATED = [
    "VERIFY_LOCAL.json",
    "PLAN_AUDIT.json",
    "STREAM_PLANS.json",
    "DETERMINISM.json",
    # r11 (r10 verdict item 1): the two remaining regenerate-on-
    # demand artifacts join the gate — after this, NO committed
    # verification artifact can silently go stale.
    "VERIFY_SF1.json",
    "SCALE_PROFILE.json",
]


def _last_source_commit() -> tuple[str, int]:
    out = subprocess.run(
        ["git", "log", "-1", "--format=%H %ct", "--", *_SOURCE_PATHS],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    return out[0], int(out[1])


def _load(name: str) -> dict:
    with open(os.path.join(REPO, name)) as fh:
        return json.load(fh)


def test_artifact_coverage_matches_live_registry():
    from mapreducego_spark.registry import QUERIES

    n_live = len(QUERIES)
    problems = []
    for name in ("VERIFY_LOCAL.json", "PLAN_AUDIT.json", "DETERMINISM.json"):
        n_art = _load(name)["n_queries"]
        if n_art != n_live:
            problems.append(
                f"{name}: n_queries {n_art} != live registry {n_live}"
                " -> run tools/end_of_round.py"
            )
    assert not problems, "\n".join(problems)


def test_artifact_failure_counters_are_zero():
    assert _load("VERIFY_LOCAL.json")["n_failures"] == 0
    assert _load("PLAN_AUDIT.json")["n_with_red_flags"] == 0
    assert _load("DETERMINISM.json")["n_failures"] == 0
    sp = _load("STREAM_PLANS.json")
    assert sp["n_with_red_flags"] == 0 and sp.get("n_errors", 0) == 0


def test_stream_plans_covers_live_skip_set():
    from mapreducego_spark.registry import QUERIES
    from tools.plan_audit import SKIP

    sp = _load("STREAM_PLANS.json")
    n_skip_live = len(SKIP & set(QUERIES))
    # SKIP must not name queries the registry no longer has, and the
    # artifact must cover exactly the live SKIP set.
    assert n_skip_live == len(SKIP), sorted(SKIP - set(QUERIES))
    assert sp["n_queries"] == n_skip_live, (
        f"STREAM_PLANS covers {sp['n_queries']} of {n_skip_live} SKIP"
        " queries -> run tools/end_of_round.py"
    )


def test_artifacts_postdate_newest_source_commit():
    sha, commit_ts = _last_source_commit()
    stale = []
    for name in _MTIME_GATED:
        mtime = int(os.path.getmtime(os.path.join(REPO, name)))
        if mtime < commit_ts:
            stale.append(
                f"{name}: mtime {mtime} predates source commit"
                f" {sha[:9]} at {commit_ts}"
                f" ({commit_ts - mtime}s older)"
            )
    assert not stale, (
        "stale verification artifacts -> run tools/end_of_round.py"
        " AFTER the round's last source commit:\n" + "\n".join(stale)
    )


def test_scale_profile_covers_its_declared_set_with_no_open_flags():
    """SCALE_PROFILE is the three-point (sf0.1/sf1/sf3) exponent
    diagnosis for the declared quadratic-risk set — its gate is
    coverage of tools/scale_profile.PROFILED plus no UNRESOLVED
    superlinear diagnosis (a measured superlinear exponent must be
    resolved to workload-inherent by the mandatory-work volume, or
    it fails the suite and the round fixes the plan)."""
    from tools.scale_profile import PROFILED

    art = _load("SCALE_PROFILE.json")
    assert set(art["queries"]) == set(PROFILED), (
        f"SCALE_PROFILE covers {sorted(art['queries'])} but the live"
        f" declared set is {sorted(PROFILED)}"
        " -> run tools/scale_profile.py"
    )
    open_flags = {
        q: r["diagnosis"]
        for q, r in art["queries"].items()
        if r["diagnosis"].startswith("SUPERLINEAR")
    }
    assert not open_flags, open_flags


_OUTPUT_TYPE_WHITELIST = {"bigint", "int", "string", "double", "boolean", "date"}


def test_registry_output_types_are_whitelisted():
    """The repo-wide presentation convention, as a WHITELIST (r13
    verdict demand #1): every registry entry's OUTPUT schema may use
    only {bigint, int, string, double, boolean, date}. The r12 gate
    banned TimestampType — the symptom — and the very next exotic
    output type (the registry's single DECIMAL column, on
    avro_logical_types) hash-failed the driver the same way for two
    consecutive rounds even with bit-identical values: any harness
    that canonicalizes rendered/Arrow values treats Spark's and
    DuckDB's exotic types asymmetrically. The rule the driver
    evidence supports is the whitelist, so that is what's enforced:
    timestamps present as unix_micros longs, dates may stay DateType
    (proven safe across 13 rounds on the one date output) or present
    as epoch-day ints, decimals present as scaled-integer longs or
    formatted strings, binaries as hex. Enforced over the schemas
    VERIFY_LOCAL records for all entries (mtime freshness of that
    artifact is gated above); a nested array/map/struct output would
    also fail here — loudly, forcing a conscious presentation
    decision rather than a third driver-red round."""
    results = _load("VERIFY_LOCAL.json")["results"]
    missing = [n for n, r in results.items() if "out_schema" not in r]
    assert not missing, (
        "VERIFY_LOCAL.json predates output-schema recording -> run"
        f" tools/end_of_round.py (first missing: {missing[:5]})"
    )
    offenders = {}
    for n, r in results.items():
        s = r["out_schema"]
        assert s.startswith("struct<") and s.endswith(">"), (n, s)
        body = s[len("struct<"):-1]
        # All registry outputs are flat scalar rows; a '<' in the body
        # means a nested type crept in, which the whitelist rejects.
        bad = []
        fields, depth, cur = [], 0, ""
        for ch in body:
            if ch == "," and depth == 0:
                fields.append(cur)
                cur = ""
                continue
            depth += ch in "<("
            depth -= ch in ">)"
            cur += ch
        fields.append(cur)
        for field in fields:
            name, _, ftype = field.partition(":")
            if ftype not in _OUTPUT_TYPE_WHITELIST:
                bad.append(f"{name}:{ftype}")
        if bad:
            offenders[n] = bad
    assert not offenders, (
        "registry outputs with non-whitelisted column types (present"
        " longs/strings/doubles instead — see docstring): "
        + str(offenders)
    )


def test_sf1_verify_covers_its_declared_suite():
    """VERIFY_SF1 is a curated scale suite, not the full registry —
    its gate is internal consistency (n_pass == n_queries == the
    committed suite length) plus coverage of the semantic-tier
    entries the r9 round added to tools/verify_sf1.QUERIES."""
    from tools.verify_sf1 import ROTATED_SF01, QUERIES as SF1_QUERIES

    art = _load("VERIFY_SF1.json")
    declared = len(SF1_QUERIES) + len(ROTATED_SF01)
    if art["n_queries"] != declared:
        pytest.fail(
            f"VERIFY_SF1.json n_queries {art['n_queries']} != declared"
            f" suite {declared} (sf1 + rotated sf0.1 block)"
            " -> run tools/verify_sf1.py"
        )
    # the rotated 10x block must be the live declared list, so a
    # rotation without a rerun cannot keep a stale artifact green
    assert art.get("rotated_sf01") == ROTATED_SF01, (
        "VERIFY_SF1.json rotated_sf01 differs from the live list ->"
        " run tools/verify_sf1.py"
    )
    assert art["n_fail"] == 0 and art["n_pass"] == art["n_queries"], art
